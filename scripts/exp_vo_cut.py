"""Bisect vo_update device time via the profile_cut early returns."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from nerf_vo_tpu.models.dpvo_net import init_dpvo_params
from nerf_vo_tpu.tracking.dpvo import DPVOTracker, TrackingConfig


def sync(x):
    for l in jax.tree_util.tree_leaves(x):
        if hasattr(l, "dtype"):
            float(jnp.sum(jnp.asarray(l, jnp.float32).ravel()[:1]))
            return


def main():
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
        tracker._vo_update_impl,
        static_argnames=("ba_iters", "profile_cut"),
    )

    for cut, label in [(1, "through correlation"),
                       (11, "  + corr MLP"),
                       (12, "  + neighbor mixing"),
                       (13, "  + soft aggregation"),
                       (14, "  + GRU blocks"),
                       (2, "through update net"),
                       (3, "through BA"),
                       (0, "full")]:
        out = fn(*a, **k, profile_cut=cut)
        sync(out)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(10):
                out = fn(*a, **k, profile_cut=cut)
            sync(out)
            best = min(best, (time.perf_counter() - t0) / 10)
        print(f"cut {cut} ({label}): {best*1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
