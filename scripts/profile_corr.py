"""Microbenchmark: Pallas corr kernel vs post-processing split."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from nerf_vo_tpu.ops.correlation_pallas import (
    EB, corr_window_dot, patch_correlation_pallas, _level_pallas,
)


def timeit(name, fn, n=20):
    out = fn()
    jax.block_until_ready(out)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32).ravel()[:1]))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32).ravel()[:1]))
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"{name}: {best*1e3:.2f} ms")
    return out


def main():
    H4, W4, C = 90, 160, 128
    R = 32
    E = 32768
    E2 = E + R * EB
    n_blocks = E2 // EB
    rng = np.random.RandomState(0)

    fmap1 = jnp.asarray(rng.randn(R, H4, W4, C), jnp.bfloat16)
    fmap2 = jnp.asarray(rng.randn(R, H4 // 2, W4 // 2, C), jnp.bfloat16)
    pf = jnp.asarray(rng.randn(E2, 3, 3, C), jnp.bfloat16)
    center = jnp.asarray(
        np.stack([rng.uniform(0, W4, E2), rng.uniform(0, H4, E2)], -1),
        jnp.float32,
    )
    block_frame = jnp.asarray(
        np.sort(rng.randint(0, R, n_blocks)), jnp.int32
    )

    # full op
    full = jax.jit(lambda: patch_correlation_pallas(
        pf, fmap1, fmap2, block_frame, center, radius=3, n_blocks=n_blocks))
    timeit("full patch_correlation_pallas (2 levels)", full)

    # one level
    pf16 = jnp.zeros((E2, 16, C), jnp.bfloat16)
    pf16 = pf16.at[:, :9].set(pf.reshape(E2, 9, C).astype(jnp.bfloat16))
    lvl = jax.jit(lambda: _level_pallas(
        fmap1, block_frame, pf16, center, 3, n_blocks))
    timeit("level-1 (kernel+post)", lvl)

    # kernel only
    PAD_Y, PAD_X = 16, 32
    fpad = jnp.pad(fmap1, ((0, 0), (PAD_Y, PAD_Y), (PAD_X, PAD_X), (0, 0)))
    cx = jnp.clip(center[..., 0], 0.0, W4 - 1.0)
    cy = jnp.clip(center[..., 1], 0.0, H4 - 1.0)
    ix = jnp.floor(cx).astype(jnp.int32) - 4 + PAD_X
    iy = jnp.floor(cy).astype(jnp.int32) - 4 + PAD_Y
    ixiy = jnp.stack([iy, (ix // 8) * 8], -1).astype(jnp.int32)
    kern_j = jax.jit(
        lambda bf, xy, p, f: corr_window_dot(bf, xy, p, f, n_blocks))
    timeit("kernel only (level 1)",
           lambda: kern_j(block_frame, ixiy, pf16, fpad))

    # gather cost of un-permute
    cs = jnp.asarray(rng.randn(E2, 882), jnp.float32)
    inv = jnp.asarray(rng.permutation(E2)[:E], jnp.int32)
    timeit("inv_perm gather [E,882]", jax.jit(lambda: cs[inv]))

    # perm gather of pf + center
    perm = jnp.asarray(rng.permutation(E2), jnp.int32)
    timeit("pf[perm]+center[perm]", jax.jit(lambda: (pf[perm], center[perm])))


if __name__ == "__main__":
    main()
