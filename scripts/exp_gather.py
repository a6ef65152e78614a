"""Gather/scatter descriptor-rate experiments for the hash-grid tables.

Measures ns/descriptor for column gathers and scatter-adds as a function of
split count (independent DMA streams), payload width, and index distribution.
"""

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
    print(f"{name}: {best*1e3:.2f} ms  ({best/n_desc*1e9:.2f} ns/desc)")
    return out


def split_take(tables, idx, splits):
    M = idx.shape[0]
    k = M // splits
    parts = [
        jnp.take(tables, idx[j * k: (j + 1) * k], axis=1)
        for j in range(splits)
    ]
    return jnp.concatenate(parts, axis=1)


def main():
    rng = np.random.default_rng(0)
    L, NB = 16, 16384
    rows = 64  # 32 * F2
    tables = jnp.asarray(rng.normal(size=(rows, L * NB)), jnp.float32)
    tables_bf = tables.astype(jnp.bfloat16)
    N = 4096 * 48 * 16  # field-encode descriptor count per step
    idx = jnp.asarray(rng.integers(0, L * NB, N), jnp.int32)

    for splits in (1, 2, 4, 8, 16, 32):
        f = jax.jit(lambda t, i, s=splits: split_take(t, i, s))
        timeit(f"gather bf16 64-row, splits={splits}", lambda: f(tables_bf, idx), N)

    # narrower columns (32 rows)
    t32 = tables_bf[:32]
    for splits in (4, 16):
        f = jax.jit(lambda t, i, s=splits: split_take(t, i, s))
        timeit(f"gather bf16 32-row, splits={splits}", lambda: f(t32, idx), N)

    # wider columns (128 rows = 32*F4), half the descriptors for same data
    t128 = jnp.concatenate([tables_bf, tables_bf], 0)
    idx_h = idx[: N // 2]
    for splits in (4, 16):
        f = jax.jit(lambda t, i, s=splits: split_take(t, i, s))
        timeit(f"gather bf16 128-row, splits={splits} (N/2)",
               lambda: f(t128, idx_h), N // 2)

    # sorted indices (locality)
    idx_s = jnp.sort(idx)
    f4 = jax.jit(lambda t, i: split_take(t, i, 4))
    timeit("gather bf16 64-row, splits=4, SORTED idx", lambda: f4(tables_bf, idx_s), N)

    # row-major table layout: gather rows instead of columns
    tr = tables_bf.T  # [L*NB, 64]
    for splits in (4, 16):
        f = jax.jit(
            lambda t, i, s=splits: jnp.concatenate(
                [jnp.take(t, i[j * (N // s): (j + 1) * (N // s)], axis=0)
                 for j in range(s)], axis=0)
        )
        timeit(f"gather bf16 ROW-major 64-col, splits={splits}", lambda: f(tr, idx), N)

    # scatter-add (backward): column scatter
    g = jnp.asarray(rng.normal(size=(rows, N)), jnp.float32)

    def scat(gg, i):
        return jnp.zeros((rows, L * NB), jnp.float32).at[:, i].add(gg)

    timeit("scatter-add f32 col", jax.jit(lambda: scat(g, idx)), N)

    def scat_split(gg, i, s):
        k = N // s
        out = jnp.zeros((rows, L * NB), jnp.float32)
        for j in range(s):
            out = out.at[:, i[j * k: (j + 1) * k]].add(gg[:, j * k: (j + 1) * k])
        return out

    for s in (4,):
        timeit(f"scatter-add f32 col, {s} seq chunks",
               jax.jit(lambda s=s: scat_split(g, idx, s)), N)

    # scatter to separate buffers then add (parallel DMA?)
    def scat_par(gg, i, s):
        k = N // s
        outs = [
            jnp.zeros((rows, L * NB), jnp.float32).at[:, i[j * k: (j + 1) * k]].add(
                gg[:, j * k: (j + 1) * k])
            for j in range(s)
        ]
        return sum(outs)

    for s in (2, 4):
        timeit(f"scatter-add f32 col, {s} parallel buffers",
               jax.jit(lambda s=s: scat_par(g, idx, s)), N)

    # sorted scatter
    timeit("scatter-add f32 col SORTED", jax.jit(lambda: scat(g, idx_s)), N)

    # bf16 scatter payload
    timeit("scatter-add bf16 col",
           jax.jit(lambda: jnp.zeros((rows, L * NB), jnp.bfloat16).at[:, idx].add(
               g.astype(jnp.bfloat16))), N)


if __name__ == "__main__":
    main()
