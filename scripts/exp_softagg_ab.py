"""Same-session A/B: scatter-route vs gather-route SoftAgg tracking FPS.

Adjudicates the round-4 ungated flip (VERDICT r4 weak #2): pre-flip
bench_tracking_r4 = 24.13 FPS (scatter), post-flip bench_tracking_r5 =
21.41 FPS (gather) — but those are different tunnel sessions and the
tunnel's run-to-run variance is +-15%. This harness measures BOTH routes
in ONE process, interleaved A-B-A, so the comparison is paired. Rule
(TPU_QUEUE.md): the gather route becomes default only if it wins here
in-step; otherwise the scatter default stands.

Output: one line per arm "route=<r> pass=<k> fps=<v>", then a JSON
summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_route(route: str, n_windows: int = 3):
    import jax

    import nerf_vo_tpu.tracking.dpvo as dpvo_mod
    from nerf_vo_tpu.models.dpvo_net import init_dpvo_params
    from nerf_vo_tpu.tracking.dpvo import DPVOTracker, TrackingConfig

    dpvo_mod._SOFTAGG_ROUTE = route  # fresh tracker retraces with this

    H, W = 360, 640
    cfg = TrackingConfig()
    net, params = init_dpvo_params(jax.random.PRNGKey(0), H, W)
    tracker = DPVOTracker(cfg, net, params, H, W)
    intr = np.asarray([320.0, 320.0, W / 2, H / 2], np.float32)
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (H + 64, W + 64, 3), dtype=np.uint8)

    def frame(i):
        return base[16: 16 + H, i % 48: i % 48 + W]

    n_warm = cfg.init_frames + 24
    dev = jax.device_put(frame(0))
    for i in range(n_warm):
        tracker.track(i * 0.05, frame(i), intr, frame_index=i,
                      image_device=dev)
        dev = jax.device_put(frame(i + 1))

    n_bench = 25
    fps = []
    idx = n_warm
    for _ in range(n_windows):
        t0 = time.perf_counter()
        for _ in range(n_bench):
            tracker.track(idx * 0.05, frame(idx), intr, frame_index=idx,
                          image_device=dev)
            dev = jax.device_put(frame(idx + 1))
            idx += 1
        fps.append(n_bench / (time.perf_counter() - t0))
    return fps


def main():
    from nerf_vo_tpu.utils.jax_setup import setup_jax

    setup_jax()

    results = {"scatter": [], "gather": []}
    # A-B-A: scatter, gather, scatter again (tunnel-drift control)
    for k, route in enumerate(("scatter", "gather", "scatter")):
        fps = run_route(route)
        results[route].extend(fps)
        for v in fps:
            print(f"route={route} pass={k} fps={v:.2f}", flush=True)

    best = {r: round(max(v), 2) for r, v in results.items()}
    med = {r: round(float(np.median(v)), 2) for r, v in results.items()}
    winner = max(best, key=lambda r: best[r])
    print(json.dumps({
        "metric": "softagg_ab",
        "best_fps": best,
        "median_fps": med,
        "winner_best": winner,
        "rule": "flip default to gather only if gather best-of > scatter "
                "best-of by >5% in this same-session A-B-A",
    }))


if __name__ == "__main__":
    main()
