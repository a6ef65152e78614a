"""Ray-batch gather layout shootout (TPU).

exp_floor.py measured kb.sample_ray_batch at 5.3 ms — half the
everything-off step floor — for what is logically ~12K scalar gathers
(4096 rays x {rgb, depth, normal}). Suspect: the [K, H, W, 3] buffers'
tiny trailing dim forces a padded TPU layout and a slow multi-dim gather
path (the verify-skill gotcha). This times the candidate layouts:

  a. [K,H,W,3] fancy-index (current buffer layout)
  b. [3,K,H,W] channel-major: 3 scalar gathers from clean-tiled slabs
  c. flat [K*H*W*3] 1-D gather at idx*3 + {0,1,2}
  d. [K,H,W] per-channel scalar gather (depth-style) as the unit cost

Usage: python scripts/exp_raybatch.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu" or "--cpu-smoke" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, n=50):
    out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    for _ in range(12):
        out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"{name}: {best*1e3:.3f} ms", flush=True)
    return best


def main():
    smoke = "--cpu-smoke" in sys.argv
    K, H, W = (8, 48, 64) if smoke else (192, 360, 640)
    R = 256 if smoke else 4096
    rng = np.random.default_rng(0)

    color = jnp.asarray(rng.uniform(0, 1, (K, H, W, 3)), jnp.float32)
    color_cm = jnp.asarray(np.moveaxis(np.asarray(color), -1, 0))  # [3,K,H,W]
    color_flat = jnp.asarray(np.asarray(color).reshape(-1))
    depth = jnp.asarray(rng.uniform(0.5, 4.0, (K, H, W)), jnp.float32)

    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    frame = jax.random.randint(k1, (R,), 0, K)
    py = jax.random.randint(k2, (R,), 0, H)
    px = jax.random.randint(k3, (R,), 0, W)

    a = jax.jit(lambda c, f, y, x: c[f, y, x])
    timeit("a. [K,H,W,3] fancy-index rgb", a, color, frame, py, px)

    b = jax.jit(lambda c, f, y, x: c[:, f, y, x].T)
    timeit("b. [3,K,H,W] channel-major rgb", b, color_cm, frame, py, px)

    def c_fn(c, f, y, x):
        base = ((f * H + y) * W + x) * 3
        return jnp.take(c, base[:, None] + jnp.arange(3)[None, :], axis=0)

    timeit("c. flat 1-D rgb", jax.jit(c_fn), color_flat, frame, py, px)

    d = jax.jit(lambda dd, f, y, x: dd[f, y, x])
    timeit("d. [K,H,W] scalar depth", d, depth, frame, py, px)

    # d2: flat 1-D depth for comparison
    depth_flat = depth.reshape(-1)

    def d2(dd, f, y, x):
        return jnp.take(dd, (f * H + y) * W + x)

    timeit("d2. flat 1-D depth", jax.jit(d2), depth_flat, frame, py, px)


if __name__ == "__main__":
    main()
