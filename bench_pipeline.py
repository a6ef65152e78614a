"""Concurrent-pipeline benchmark: the SURVEY §7.3(4) question, measured.

The reference runs data/tracking/enhancement as processes CONCURRENT with
mapping on one device (/root/reference/nerf_vo/execute.py:91-109); our
redesign interleaves them in one JAX process behind async dispatch
(runtime/pipeline.py). This benchmark runs the REAL nerf_vo stage objects
end to end on synthetic frames at the production replica geometry
(360x640, 96 patches, DPT-hybrid @384^2, nerfacto mapper, 4096-ray steps)
and reports, from ONE shared wall clock per arm:

  arm "full spf=4"  tracking + DPT enhancement + 4 mapping steps/frame
                    (the production pipeline.execute interleaving)
  arm "full spf=1"  same with 1 mapping step/frame (the pacing knob)
  arm "no-dpt spf=4"  tracking + mapping only (enhancement cost isolated
                    by difference against the full arm)
  arm "full spf=4 kf/5"  only every 5th retired keyframe is enhanced +
                    inserted — the REALISTIC keyframe rate (random weights
                    retire ~1:1; real checkpoints ~1/5)

Each arm prints pipeline_tracking_fps (frames tracked per second WHILE
everything else shares the chip — the number the >=20 FPS target is about)
and the sustained mapping steps/s. An isolated forced-sync DPT latency is
measured once as the attribution anchor. One chip serializes device work,
so tracking FPS here is the real concurrency answer, not a per-stage
number. Note: with random weights the DPVO flow-distance keyframe test
retires essentially every frame (keyframes == frames below), making these
numbers the keyframe-rate WORST CASE; real checkpoints retire ~1/5.

Stage objects are the real runtime classes; only DataStage is replaced by
an in-memory synthetic frame source (disk decode is not what this
measures).
"""

from __future__ import annotations

import argparse
import json
import time
from types import SimpleNamespace

import numpy as np


def make_args(n_frames: int, enhancement: str, **extra) -> SimpleNamespace:
    # configs/nerf_vo_replica.yaml, minus dataset paths
    if extra:
        ns = make_args(n_frames, enhancement)
        for k, v in extra.items():
            setattr(ns, k, v)
        return ns
    return SimpleNamespace(
        dataset_name="replica",
        frame_height=360,
        frame_width=640,
        num_keyframes=192,
        mapping_iterations=8192,
        mapping_snapshot_iterations=8192,
        tracking_module="dpvo",
        enhancement_module=enhancement,
        mapping_module="nerfstudio",
        patches_per_frame=96,
        removal_window=28,
        optimization_window=13,
        patch_lifetime=15,
        keyframe_threshold=8.0,
        rays_per_batch=4096,
        performance_tracking=False,
        last_frame_index=n_frames,
    )


class SyntheticFrames:
    """Sliding crops of one textured mural: consistent apparent camera motion
    (the same trick bench_tracking.py uses), production frame geometry."""

    def __init__(self, H: int, W: int, n: int, seed: int = 0):
        rng = np.random.default_rng(seed)
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


def run_arm(label: str, src, steps_per_frame: float, enhancement: str,
            warmup: int, frames: int, kf_stride: int = 1,
            arg_extra: dict | None = None):
    import jax

    from nerf_vo_tpu.runtime.stages import (
        EnhancementStage,
        MappingStage,
        TrackingStage,
    )

    args = make_args(frames, enhancement, **(arg_extra or {}))
    H, W = args.frame_height, args.frame_width
    intr = {"fx": 320.0, "fy": 320.0, "cx": W / 2, "cy": H / 2}
    t0 = time.perf_counter()
    tracking = TrackingStage(args)
    enhance = EnhancementStage(args)
    mapping = MappingStage(args)
    print(f"# [{label}] stages built in {time.perf_counter() - t0:.1f}s",
          flush=True)

    stats = {"frames": 0, "kf": 0, "map_steps": 0, "retired": 0}
    spf_acc = [0.0]  # fractional steps_per_frame accumulator (spf<1 = one
    # mapping step every 1/spf frames — the pacing-knob sweep)

    def run_span(i0: int, i1: int, collect: bool):
        dev = jax.device_put(src.frame(i0))
        for i in range(i0, i1):
            frame = {
                "frame_index": i, "camera_intrinsics": intr,
                "frame_color": src.frame(i), "last_frame": False,
                "frame_color_device": dev,
            }
            dev = jax.device_put(src.frame(i + 1))  # prefetch next H2D
            packet = tracking.step(frame)
            if packet is not None and packet["camera_extrinsics"].shape[0]:
                # kf_stride > 1 models a real checkpoint's keyframe rate
                # (~1/5 frames retire); random weights retire ~every frame
                stats["retired"] += 1
                if (stats["retired"] - 1) % kf_stride:
                    packet = None
            if packet is not None and packet["camera_extrinsics"].shape[0]:
                mapping.update(enhance.step(packet))
                if collect:
                    stats["kf"] += packet["camera_extrinsics"].shape[0]
            spf_acc[0] += steps_per_frame
            while spf_acc[0] >= 1.0:
                spf_acc[0] -= 1.0
                if mapping.train_step() is None:
                    break
                if collect:
                    stats["map_steps"] += 1
            if collect:
                stats["frames"] += 1

    run_span(0, warmup, collect=False)
    if mapping.num_inserted:  # drain the async queue before the window
        jax.block_until_ready(mapping.state.params)
        m = mapping.train_step()
        if m is not None:
            float(m["loss"])
    t0 = time.perf_counter()
    run_span(warmup, frames, collect=True)
    m = mapping.train_step()  # force full drain into the window
    if m is not None:
        float(m["loss"])
    jax.block_until_ready(mapping.state.params)
    wall = time.perf_counter() - t0

    fps = stats["frames"] / wall
    steps_s = stats["map_steps"] / wall
    print(json.dumps({
        "metric": f"pipeline_tracking_fps[{label}]", "value": round(fps, 2),
        "unit": "frames/s", "vs_baseline": round(fps / 20.0, 4),
        "detail": {
            "frames": stats["frames"], "wall_s": round(wall, 2),
            "keyframes": stats["kf"], "mapping_steps": stats["map_steps"],
            "mapping_steps_per_sec": round(steps_s, 2),
            "mapping_rays_per_sec": round(steps_s * 4096, 0),
        },
    }), flush=True)
    return fps, steps_s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=150)
    ap.add_argument("--warmup", type=int, default=60)
    args_cli = ap.parse_args()

    from nerf_vo_tpu.utils.jax_setup import setup_jax

    setup_jax()
    import jax
    import jax.numpy as jnp

    from nerf_vo_tpu.runtime.stages import EnhancementStage

    src = SyntheticFrames(360, 640, args_cli.frames + 2)

    # isolated DPT latency (forced sync) — the attribution anchor for the
    # full-vs-no-dpt arm difference. Two DPT-hybrid forwards per keyframe
    # at 384^2 is the reference's enhancement cost
    # (/root/reference/nerf_vo/enhancement/omnidata_estimator.py:73-111).
    est = EnhancementStage(make_args(1, "depth")).estimator
    x = jnp.asarray(src.frame(0)[None].astype(np.float32) / 255.0)
    for _ in range(14):
        t0 = time.perf_counter()
        d, n = est(x)
        float(jnp.sum(d))
        if n is not None:
            float(jnp.sum(n))
        dpt_ms = (time.perf_counter() - t0) * 1e3
    print(json.dumps({
        "metric": "enhancement_dpt_ms_isolated", "value": round(dpt_ms, 1),
        "unit": "ms", "vs_baseline": None,
    }), flush=True)

    run_arm("full spf=4", src, 4, "depth", args_cli.warmup, args_cli.frames)
    run_arm("full spf=1", src, 1, "depth", args_cli.warmup, args_cli.frames)
    run_arm("no-dpt spf=4", src, 4, "none", args_cli.warmup,
            args_cli.frames)
    # realistic keyframe rate: real checkpoints retire ~1/5 frames, so
    # enhancement + buffer inserts amortize 5x (mapping steps still pace
    # per frame) — the non-worst-case §7.3(4) answer
    run_arm("full spf=4 kf/5", src, 4, "depth", args_cli.warmup,
            args_cli.frames, kf_stride=5)
    # pacing sweep at the realistic keyframe rate: the tracking-FPS vs
    # mapping-rate curve the §7.3(4) answer should be stated on (VERDICT
    # r4 item 4). spf=0.5 = one mapping step every 2 frames.
    for spf in (2, 1, 0.5):
        run_arm(f"full spf={spf} kf/5", src, spf, "depth",
                args_cli.warmup, args_cli.frames, kf_stride=5)
    # two-chip split arm (mapping + enhancement on device 1, tracking on
    # device 0): real overlap needs real chips; on the virtual CPU mesh
    # this still pins the split's full packet flow under bench load
    if len(jax.devices()) >= 2:
        run_arm("split dev0/dev1 spf=4 kf/5", src, 4, "depth",
                args_cli.warmup, args_cli.frames, kf_stride=5,
                arg_extra={"mapping_device": 1, "enhancement_device": 1})
    else:
        print(json.dumps({
            "metric": "pipeline_tracking_fps[split dev0/dev1]",
            "value": None, "unit": "frames/s",
            "skipped": "needs >= 2 devices (one tunneled chip here)",
        }), flush=True)


if __name__ == "__main__":
    main()
