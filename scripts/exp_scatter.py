"""Scatter-add descriptor-rate experiments (hash-grid backward)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, n_desc, n=10):
    out = fn()
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32).ravel()[:1]))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32).ravel()[:1]))
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"{name}: {best*1e3:.2f} ms  ({best/n_desc*1e9:.2f} ns/desc)", flush=True)
    return out


def main():
    rng = np.random.default_rng(0)
    L, NB = 16, 16384
    rows = 64
    N = 4096 * 48 * 16
    idx = jnp.asarray(rng.integers(0, L * NB, N), jnp.int32)
    g = jnp.asarray(rng.normal(size=(rows, N)), jnp.float32)
    gb = g.astype(jnp.bfloat16)

    scat = jax.jit(
        lambda gg, i: jnp.zeros((rows, L * NB), jnp.float32).at[:, i].add(gg)
    )
    timeit("scatter-add f32 col", lambda: scat(g, idx), N)

    idx_s = jnp.sort(idx)
    timeit("scatter-add f32 col SORTED", lambda: scat(g, idx_s), N)

    scat_bf = jax.jit(
        lambda gg, i: jnp.zeros((rows, L * NB), jnp.bfloat16).at[:, i].add(gg)
    )
    timeit("scatter-add bf16 col", lambda: scat_bf(gb, idx), N)

    def scat_par(gg, i, s):
        k = N // s
        outs = [
            jnp.zeros((rows, L * NB), jnp.float32).at[
                :, i[j * k: (j + 1) * k]
            ].add(gg[:, j * k: (j + 1) * k])
            for j in range(s)
        ]
        return sum(outs)

    for s in (2, 4):
        f = jax.jit(lambda gg, i, s=s: scat_par(gg, i, s))
        timeit(f"scatter-add f32 col, {s} parallel buffers",
               lambda: f(g, idx), N)

    # wide columns: half descriptors, 128 rows
    g128 = jnp.asarray(rng.normal(size=(128, N // 2)), jnp.float32)
    idx_h = idx[: N // 2]
    scat128 = jax.jit(
        lambda gg, i: jnp.zeros((128, L * NB), jnp.float32).at[:, i].add(gg)
    )
    timeit("scatter-add f32 128-row (N/2)", lambda: scat128(g128, idx_h), N // 2)

    # row-major scatter
    gr = jnp.asarray(rng.normal(size=(N, rows)), jnp.float32)
    scat_r = jax.jit(
        lambda gg, i: jnp.zeros((L * NB, rows), jnp.float32).at[i].add(gg)
    )
    timeit("scatter-add f32 ROW-major", lambda: scat_r(gr, idx), N)


if __name__ == "__main__":
    main()
