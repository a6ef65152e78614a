"""Per-stage timing breakdown of one tracking frame (TPU).

Times each jitted piece of DPVOTracker.track with forced device sync
(float fetch — block_until_ready does not block on this backend).
"""

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
    leaves = jax.tree_util.tree_leaves(x)
    for l in leaves:
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

    def frame(i):
        return rng.randint(0, 255, (H, W, 3)).astype(np.uint8)

    # warm to steady state
    n_warm = 40
    for i in range(n_warm):
        tracker.track(i * 0.05, frame(i), intr, frame_index=i)
    sync(tracker.poses)

    # live edge stats
    print("live edges:", int(tracker.e_valid.sum()), "of", cfg.max_edges)
    print("alive frames:", len(tracker.frame_gids))

    # time full frames
    idx = n_warm
    for trial in range(3):
        t0 = time.perf_counter()
        n = 15
        for _ in range(n):
            tracker.track(idx * 0.05, frame(idx), intr, frame_index=idx)
            idx += 1
        sync(tracker.poses)
        dt = (time.perf_counter() - t0) / n
        print(f"full frame: {dt*1e3:.1f} ms ({1/dt:.1f} FPS)")

    # piecewise: encode
    img = jnp.asarray(frame(idx), jnp.float32)
    key = jax.random.PRNGKey(5)
    med = jnp.asarray(1.0)
    enc = jax.jit(tracker._encode_impl)
    out = enc(tracker.params, img, key, med)
    sync(out)
    for trial in range(2):
        t0 = time.perf_counter()
        for _ in range(10):
            out = enc(tracker.params, img, key, med)
        sync(out)
        print(f"encode: {(time.perf_counter()-t0)/10*1e3:.1f} ms")

    # piecewise: _run_update (includes host prep + H2D + vo_update)
    for trial in range(3):
        t0 = time.perf_counter()
        for _ in range(10):
            tracker._run_update()
        sync(tracker.poses)
        print(f"_run_update: {(time.perf_counter()-t0)/10*1e3:.1f} ms")

    # host-only prep cost: run _run_update with device call stubbed
    real = tracker._vo_update
    calls = {}

    def stub(*a, **k):
        calls["a"] = (a, k)
        return (tracker.poses, tracker.pt_invd, tracker.hidden,
                tracker.e_target, jnp.zeros(2), jnp.zeros(()))

    tracker._vo_update = stub
    t0 = time.perf_counter()
    for _ in range(20):
        tracker._run_update()
    print(f"host prep + H2D: {(time.perf_counter()-t0)/20*1e3:.1f} ms")
    tracker._vo_update = real

    # vo_update alone; thread donated buffers back through
    a, k = calls["a"]
    a = list(a)

    def call_once():
        out = real(*a, **k)
        a[1], a[3], a[9], a[10] = out[0], out[1], out[2], out[3]
        return out

    out = call_once()
    sync(out)
    for trial in range(3):
        t0 = time.perf_counter()
        for _ in range(10):
            out = call_once()
        sync(out)
        print(f"vo_update (device): {(time.perf_counter()-t0)/10*1e3:.1f} ms")


if __name__ == "__main__":
    main()
