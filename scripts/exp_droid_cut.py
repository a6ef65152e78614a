"""Bisect the DROID frontend update step via profile_cut early returns.

VERDICT r4 weak #5: DROID sits at 16.45 FPS vs the self-imposed 20
(tpu_runs/bench_droid_r4.log) with no attribution. This is the
exp_vo_cut analog for the dense frontend: capture one realistic _update
call from a warmed tracker at 240x320 (the nerf_slam production
geometry), then time early-return cuts to attribute the step across
reprojection / corr lookup / update-net stages / BA assembly / BA solve.
Also times the per-frame satellites separately: feature+context encode,
motion filter, corr-pyramid build, cvx upsample, pair distance.

Reference hot path being attributed:
/root/reference/nerf_vo/tracking/droid_slam.py:271-316,340-492.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    for l in jax.tree_util.tree_leaves(x):
        if hasattr(l, "dtype"):
            float(jnp.sum(jnp.asarray(l, jnp.float32).ravel()[:1]))
            return


def bench(fn, *a, n=10, windows=3, **k):
    out = fn(*a, **k)
    sync(out)
    best = 1e9
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*a, **k)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3


def main():
    from nerf_vo_tpu.utils.jax_setup import setup_jax

    setup_jax()
    from nerf_vo_tpu.models.droid_net import init_droid_params
    from nerf_vo_tpu.tracking.droid_slam import DroidConfig, DROIDSLAMTracker

    smoke = "--smoke" in sys.argv  # CPU wiring check: tiny shapes
    H, W = (64, 96) if smoke else (240, 320)
    # motion_threshold=0 ALWAYS: with random weights the motion filter's
    # flow statistic is meaningless (first on-chip run admitted 0 of 30
    # frames at the reference 2.4 threshold -> E=0, nothing to bisect).
    # The bisect needs the real per-keyframe hot path to run; the
    # reference runs update() for every ADMITTED frame, which is what the
    # cuts attribute.
    cfg = DroidConfig(buffer_size=32 if smoke else 128,
                      motion_threshold=0.0,
                      perform_global_ba=False, compute_covariances=False)
    net, params = init_droid_params(jax.random.PRNGKey(0), H, W)
    tracker = DROIDSLAMTracker(cfg, net, params, H, W)
    intr = np.asarray([260.0, 260.0, W / 2, H / 2], np.float32)
    rng = np.random.default_rng(0)
    base = rng.integers(0, 255, (H + 64, W + 64, 3), dtype=np.uint8)

    def frame(i):
        return base[16: 16 + H, (5 * i) % 60: (5 * i) % 60 + W]

    for i in range(12 if smoke else 30):
        tracker.track(i * 0.1, frame(i), intr, frame_index=i)
    sync(tracker.poses)
    print(f"edges: E={int(tracker.e_valid.sum())} padded="
          f"{len(tracker.e_valid)} keyframes={len(tracker.alive)}",
          flush=True)

    # capture one realistic _update invocation
    real = tracker._update
    calls = {}

    def grab(*a, **k):
        calls["a"] = (list(a), dict(k))
        return (tracker.poses, tracker.disps, tracker.hidden,
                tracker.e_target, tracker.e_weight, tracker.eta,
                tracker.upmask, jnp.zeros((cfg.ba_iters,)),
                jnp.full(tracker.depth_cov.shape, 1e9))

    tracker._update = grab
    tracker._run_update()
    tracker._update = real
    a, k = calls["a"]

    fn = jax.jit(tracker._update_impl, static_argnames=("profile_cut",))
    for cut, label in [(1, "reprojection"),
                       (2, "  + corr lookup"),
                       (11, "  + net encoders"),
                       (12, "  + ConvGRU"),
                       (13, "  + delta/weight heads"),
                       (3, "  + agg head (full net)"),
                       (4, "  + BA assembly (no solve)"),
                       (0, "full (with BA solve)")]:
        ms = bench(fn, *a, **k, profile_cut=cut)
        print(f"cut {cut:2d} ({label}): {ms:7.2f} ms", flush=True)

    # per-frame satellites outside _update
    img = jnp.asarray(frame(0))
    ms = bench(tracker._encode, tracker.params, img)
    print(f"satellite encode (fmap+ctx):    {ms:7.2f} ms", flush=True)

    fm = tracker.fmaps[0]
    inp0 = tracker.inps[0]
    ms = bench(tracker._motion, tracker.params, fm, fm, inp0)
    print(f"satellite motion filter:        {ms:7.2f} ms", flush=True)

    ii = jnp.asarray(np.clip(tracker.e_ii, 0, None).astype(np.int32))
    jj = jnp.asarray(np.clip(tracker.e_jj, 0, None).astype(np.int32))
    ms = bench(tracker._pyramid, tracker.fmaps, ii, jj)
    print(f"satellite corr-pyramid build:   {ms:7.2f} ms", flush=True)

    ms = bench(tracker._upsample, tracker.disps[:1], tracker.upmask[:1])
    print(f"satellite cvx upsample (1 kf):  {ms:7.2f} ms", flush=True)

    ms = bench(tracker._pair_distance, tracker.poses, tracker.disps,
               tracker.intrinsics8, ii[:32], jj[:32])
    print(f"satellite pair distance (32):   {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
