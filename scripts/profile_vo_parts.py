"""vo_update internal breakdown via monkeypatched part-skipping (TPU).

Times the full fused update against variants with the correlation kernel or
the bundle adjustment stubbed out; the deltas attribute device time reliably
(everything stays inside the one fused program).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from nerf_vo_tpu.models.dpvo_net import init_dpvo_params
from nerf_vo_tpu.ops import ba as ba_mod
from nerf_vo_tpu.ops import correlation_pallas as cp_mod
from nerf_vo_tpu.tracking.dpvo import DPVOTracker, TrackingConfig


def sync(x):
    for l in jax.tree_util.tree_leaves(x):
        if hasattr(l, "dtype"):
            float(jnp.sum(jnp.asarray(l, jnp.float32).ravel()[:1]))
            return


def warm_tracker():
    H, W = 360, 640
    cfg = TrackingConfig()
    rng = np.random.RandomState(0)
    net, params = init_dpvo_params(jax.random.PRNGKey(0), H, W)
    tracker = DPVOTracker(cfg, net, params, H, W)
    intr = np.array([525.0, 525.0, W / 2, H / 2], np.float32)
    for i in range(40):
        tracker.track(
            i * 0.05, rng.randint(0, 255, (H, W, 3)).astype(np.uint8), intr,
            frame_index=i,
        )
    sync(tracker.poses)
    return tracker


def time_update(tracker, label, n=10):
    real = tracker._vo_update
    calls = {}

    def grab(*a, **k):
        calls["a"] = (list(a), k)
        return (tracker.poses, tracker.pt_invd, tracker.hidden,
                tracker.e_target, jnp.zeros(2), jnp.zeros(()))

    tracker._vo_update = grab
    tracker._run_update()
    tracker._vo_update = real
    a, k = calls["a"]

    fn = jax.jit(
        tracker._vo_update_impl, static_argnames=("ba_iters",),
    )  # NO donation: we reuse the same args every call

    out = fn(*a, **k)
    sync(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*a, **k)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"{label}: {best*1e3:.2f} ms", flush=True)
    return best


def main():
    tracker = warm_tracker()
    print("live edges:", int(tracker.e_valid.sum()), flush=True)

    time_update(tracker, "vo_update full")

    # stub the pallas correlation: zeros of the right shape
    real_corr = cp_mod.patch_correlation_pallas

    def corr_stub(pf_s, fmap1, fmap2, block_frame, center, radius, n_blocks):
        E2 = pf_s.shape[0]
        D = 2 * radius + 1
        return jnp.zeros((E2, 2 * 9 * D * D), jnp.float32)

    cp_mod.patch_correlation_pallas = corr_stub
    try:
        time_update(tracker, "vo_update, corr stubbed")
    finally:
        cp_mod.patch_correlation_pallas = real_corr

    # stub BA
    real_ba = ba_mod.bundle_adjust

    def ba_stub(problem, slot_map, num_iters, window):
        return problem.poses, problem.pt_invd, jnp.zeros((num_iters,))

    ba_mod.bundle_adjust = ba_stub
    try:
        time_update(tracker, "vo_update, BA stubbed")
    finally:
        ba_mod.bundle_adjust = real_ba

    # stub update net
    real_apply = type(tracker.net).apply

    def apply_stub(self, params, *args, method=None, **kw):
        if getattr(method, "__name__", "") == "update_step":
            h, im_e, corr, flow = args[0], args[1], args[2], args[3]
            E = h.shape[0]
            return h, jnp.zeros((E, 2)), jnp.ones((E, 2))
        return real_apply(self, params, *args, method=method, **kw)

    type(tracker.net).apply = apply_stub
    try:
        time_update(tracker, "vo_update, update-net stubbed")
    finally:
        type(tracker.net).apply = real_apply

    # corr + BA + net stubbed (reproject/scatter/frame-distance residual)
    cp_mod.patch_correlation_pallas = corr_stub
    ba_mod.bundle_adjust = ba_stub
    type(tracker.net).apply = apply_stub
    try:
        time_update(tracker, "vo_update, corr+BA+net stubbed")
    finally:
        cp_mod.patch_correlation_pallas = real_corr
        ba_mod.bundle_adjust = real_ba
        type(tracker.net).apply = real_apply


if __name__ == "__main__":
    main()
