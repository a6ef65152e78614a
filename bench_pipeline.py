"""Concurrent-pipeline benchmark: the SURVEY §7.3(4) question, measured.

The reference runs data/tracking/enhancement as processes CONCURRENT with
mapping on one device (/root/reference/nerf_vo/execute.py:91-109); our
redesign interleaves them in one JAX process behind async dispatch
(runtime/pipeline.py). Until now every benchmark measured one stage in
isolation — this one runs the REAL nerf_vo path end to end on synthetic
frames at the production replica geometry (360x640, 96 patches, DPT-hybrid
@384^2, nerfacto mapper, 4096-ray steps, pacing rule active) and reports,
from ONE shared wall clock:

  - pipeline_tracking_fps    frames tracked per second WHILE the DPT and
                             mapping steps share the chip (the number the
                             >=20 FPS target is actually about),
  - pipeline_mapping_steps_per_sec  (and rays/s) sustained during the stream,
  - enhancement_ms_per_keyframe     amortized DPT+alignment cost in-stream,
                             plus an isolated forced-sync DPT latency.

Prints one JSON line per metric (the driver contract takes the first line;
bench.py stays the headline). Stage objects are the real runtime classes
(TrackingStage/EnhancementStage/MappingStage) and the loop is the exact
interleaving of runtime/pipeline.execute — only DataStage is replaced by an
in-memory synthetic frame source, because disk decode is not what this
measures.
"""

from __future__ import annotations

import argparse
import json
import time
from types import SimpleNamespace

import numpy as np


def make_args(n_frames: int) -> SimpleNamespace:
    # configs/nerf_vo_replica.yaml, minus dataset paths
    return SimpleNamespace(
        dataset_name="replica",
        frame_height=360,
        frame_width=640,
        num_keyframes=192,
        mapping_iterations=8192,
        mapping_snapshot_iterations=8192,
        tracking_module="dpvo",
        enhancement_module="depth",
        mapping_module="nerfstudio",
        patches_per_frame=96,
        removal_window=28,
        optimization_window=13,
        patch_lifetime=15,
        keyframe_threshold=8.0,
        rays_per_batch=4096,
        mapping_steps_per_frame=4,
        performance_tracking=False,
        last_frame_index=n_frames,
    )


class SyntheticFrames:
    """Sliding crops of one textured mural: consistent apparent camera motion
    (the same trick bench_tracking.py uses), production frame geometry."""

    def __init__(self, H: int, W: int, n: int, seed: int = 0):
        rng = np.random.default_rng(seed)
        # smooth low-frequency texture + noise so DPVO's patch correlation
        # has real structure to lock onto
        base = rng.integers(0, 255, (H + 96, W + 256, 3)).astype(np.float32)
        import cv2

        smooth = cv2.GaussianBlur(base, (0, 0), 9)
        self.mural = np.clip(0.6 * smooth + 0.4 * base, 0, 255).astype(
            np.uint8
        )
        self.H, self.W, self.n = H, W, n

    def frame(self, i: int) -> np.ndarray:
        dx = (i * 4) % 256
        dy = (i * 2) % 96
        return np.ascontiguousarray(
            self.mural[dy: dy + self.H, dx: dx + self.W]
        )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=150,
                    help="total frames fed (warmup + measured window)")
    ap.add_argument("--warmup", type=int, default=60)
    ap.add_argument("--steps-per-frame", type=int, default=4)
    args_cli = ap.parse_args()

    from nerf_vo_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    from nerf_vo_tpu.runtime.stages import (
        EnhancementStage,
        MappingStage,
        TrackingStage,
    )

    args = make_args(args_cli.frames)
    args.mapping_steps_per_frame = args_cli.steps_per_frame
    H, W = args.frame_height, args.frame_width

    t_setup = time.perf_counter()
    tracking = TrackingStage(args)
    enhancement = EnhancementStage(args)
    mapping = MappingStage(args)
    src = SyntheticFrames(H, W, args_cli.frames)
    intr = {"fx": 320.0, "fy": 320.0, "cx": W / 2, "cy": H / 2}
    print(f"# stages built in {time.perf_counter() - t_setup:.1f}s",
          flush=True)

    # ---- isolated DPT latency (forced sync), before the pipeline loop ----
    # two DPT-hybrid forwards per keyframe at 384^2 is the reference's
    # enhancement cost (/root/reference/nerf_vo/enhancement/
    # omnidata_estimator.py:73-111); measure it alone so the concurrent
    # number below has an attribution anchor. Bucket sizes 1 and 2 are what
    # DPVO actually retires per frame.
    est = enhancement.estimator
    dpt_ms = {}
    for B in (1, 2):
        x = jnp.asarray(
            np.repeat(
                src.frame(0)[None].astype(np.float32) / 255.0, B, axis=0
            )
        )
        for rep in range(14):  # past the backend's slow first executions
            t0 = time.perf_counter()
            d, n = est(x)
            float(jnp.sum(d))
            if n is not None:
                float(jnp.sum(n))
            dt = time.perf_counter() - t0
        dpt_ms[B] = dt * 1e3
    print(f"# isolated DPT (depth+normal nets) forced-sync: "
          f"{dpt_ms[1]:.1f} ms @K=1, {dpt_ms[2]:.1f} ms @K=2", flush=True)

    # ---- the real interleaved loop (runtime/pipeline.execute body) -------
    def feed(i: int, frame_dev) -> dict:
        frame = {
            "frame_index": i,
            "camera_intrinsics": intr,
            "frame_color": src.frame(i),
            "last_frame": False,
            "frame_color_device": frame_dev,
        }
        return frame

    stats = {"frames": 0, "kf": 0, "map_steps": 0, "enh_ms": 0.0}

    def run_span(i0: int, i1: int, collect: bool):
        dev = jax.device_put(src.frame(i0))
        for i in range(i0, i1):
            frame = feed(i, dev)
            dev = jax.device_put(src.frame(i + 1))  # prefetch next H2D
            packet = tracking.step(frame)
            if packet is not None and packet["camera_extrinsics"].shape[0]:
                t0 = time.perf_counter()
                enhanced = enhancement.step(packet)
                mapping.update(enhanced)
                if collect:
                    stats["enh_ms"] += (time.perf_counter() - t0) * 1e3
                    stats["kf"] += packet["camera_extrinsics"].shape[0]
            for _ in range(args.mapping_steps_per_frame):
                if mapping.train_step() is None:
                    break
                if collect:
                    stats["map_steps"] += 1
            if collect:
                stats["frames"] += 1

    run_span(0, args_cli.warmup, collect=False)
    # drain the async queue so the window starts clean
    if mapping.num_inserted:
        jax.block_until_ready(mapping.state.params)
        m = mapping.train_step()
        if m is not None:
            float(m["loss"])
    print(f"# warmup done: {len(tracking.tracker.retired)} keyframes, "
          f"{mapping.step_count} mapping steps", flush=True)

    t0 = time.perf_counter()
    run_span(args_cli.warmup, args_cli.frames, collect=True)
    # force full drain: the window must include every dispatched device step
    m = mapping.train_step()
    if m is not None:
        float(m["loss"])
    jax.block_until_ready(mapping.state.params)
    wall = time.perf_counter() - t0

    fps = stats["frames"] / wall
    steps_s = stats["map_steps"] / wall
    rays_s = steps_s * args.rays_per_batch
    enh_per_kf = stats["enh_ms"] / max(stats["kf"], 1)
    print(json.dumps({
        "metric": "pipeline_tracking_fps", "value": round(fps, 2),
        "unit": "frames/s", "vs_baseline": round(fps / 20.0, 4),
        "detail": {
            "frames": stats["frames"], "wall_s": round(wall, 2),
            "keyframes": stats["kf"],
            "mapping_steps_per_frame_cap": args.mapping_steps_per_frame,
        },
    }), flush=True)
    print(json.dumps({
        "metric": "pipeline_mapping_steps_per_sec",
        "value": round(steps_s, 2), "unit": "steps/s",
        "vs_baseline": round(rays_s / 1e6, 4),
        "detail": {"rays_per_sec": round(rays_s, 0),
                   "steps": stats["map_steps"]},
    }), flush=True)
    print(json.dumps({
        "metric": "enhancement_ms_per_keyframe",
        "value": round(enh_per_kf, 1), "unit": "ms",
        "vs_baseline": None,
        "detail": {"isolated_dpt_ms_k1": round(dpt_ms[1], 1),
                   "isolated_dpt_ms_k2": round(dpt_ms[2], 1)},
    }), flush=True)


if __name__ == "__main__":
    main()
