"""Isolate the vo_update fixed-overhead floor: empty programs, same args."""

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


def bench(label, fn, args, kwargs, n=20):
    out = fn(*args, **kwargs)
    sync(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args, **kwargs)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"{label}: {best*1e3:.2f} ms", flush=True)


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

    # empty program, identical args
    def empty(*args, ba_iters=2):
        poses = args[1]
        return poses, args[3], args[9], args[10], jnp.zeros(2), jnp.zeros(())

    bench("empty jit, same args", jax.jit(empty, static_argnames=("ba_iters",)), a, k)

    # empty, only small args
    def empty2(poses):
        return poses * 1.0

    bench("empty jit, poses only", jax.jit(empty2), [a[1]], {})

    # sum-reduce every arg (forces real reads, no big outputs)
    def touch(*args, ba_iters=2):
        s = 0.0
        for x in args[1:]:
            s = s + jnp.sum(x.astype(jnp.float32))
        return s

    bench("reduce-all-args jit", jax.jit(touch, static_argnames=("ba_iters",)), a, k)

    # real update again for reference (no donation)
    fn = jax.jit(tracker._vo_update_impl, static_argnames=("ba_iters",))
    bench("real vo_update (no donate)", fn, a, k)

    # real update WITH donation (as production): need fresh copies each call
    # -> measure by reusing production path through _run_update
    t0 = time.perf_counter()
    n = 20
    for _ in range(n):
        tracker._run_update()
    sync(tracker.poses)
    print(f"production _run_update: {(time.perf_counter()-t0)/n*1e3:.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
