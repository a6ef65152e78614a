"""Scatter fast-path experiments at PRODUCTION field shapes (round 2).

The field backward scatters ~590K descriptor columns of 256 rows (4096 rays
x 48 samples x 3 hashed levels at 4x8 geometry) at ~17 ns/descriptor. This
probes whether XLA's TPU scatter emitter has a fast path worth reformulating
for: indices_are_sorted / unique_indices flags, in-graph sort + flagged
scatter, and a sort + run-head-segment-sum pipeline.
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
    print(f"{name}: {best*1e3:.2f} ms  ({best/n_desc*1e9:.2f} ns/desc)", flush=True)
    return out


def main():
    rng = np.random.default_rng(0)
    L, NB = 3, 16384  # three hashed levels at log2=19 brick capacity
    rows = 256  # 32 * F at F=8
    N = 4096 * 48 * L
    C = L * NB
    idx = jnp.asarray(rng.integers(0, C, N), jnp.int32)
    g = jnp.asarray(rng.normal(size=(rows, N)), jnp.float32)

    scat = jax.jit(
        lambda gg, i: jnp.zeros((rows, C), jnp.float32).at[:, i].add(gg)
    )
    timeit("baseline random idx", lambda: scat(g, idx), N)

    idx_s = jnp.sort(idx)
    timeit("pre-sorted idx, no flag", lambda: scat(g, idx_s), N)

    scat_flag = jax.jit(
        lambda gg, i: jnp.zeros((rows, C), jnp.float32)
        .at[:, i]
        .add(gg, indices_are_sorted=True)
    )
    timeit("pre-sorted idx + sorted flag", lambda: scat_flag(g, idx_s), N)

    # ceiling: sorted AND unique (descriptor count unchanged)
    idx_u = jnp.asarray(
        np.sort(rng.choice(max(C, N + 1), N, replace=False)).astype(np.int32)
    )
    scat_uf = jax.jit(
        lambda gg, i: jnp.zeros((rows, max(C, N + 1)), jnp.float32)
        .at[:, i]
        .add(gg, indices_are_sorted=True, unique_indices=True)
    )
    timeit("sorted+unique+flags (ceiling)", lambda: scat_uf(g, idx_u), N)

    # full pipeline: in-graph sort + permute cotangents + flagged scatter
    def sorted_scatter(gg, i):
        si, perm = jax.lax.sort_key_val(i, jnp.arange(N, dtype=jnp.int32))
        gp = jnp.take(gg, perm, axis=1)
        return jnp.zeros((rows, C), jnp.float32).at[:, si].add(
            gp, indices_are_sorted=True
        )

    timeit("sort+permute+flagged scatter", lambda: jax.jit(sorted_scatter)(g, idx), N)

    # sort + run-head segment sum (cumsum difference trick) + flagged scatter:
    # after sorting, sum each equal-id run via inclusive cumsum and scatter
    # only run TAILS (their cumsum minus the previous run's tail).
    def runsum_scatter(gg, i):
        si, perm = jax.lax.sort_key_val(i, jnp.arange(N, dtype=jnp.int32))
        gp = jnp.take(gg, perm, axis=1)
        cs = jnp.cumsum(gp, axis=1)
        is_tail = jnp.concatenate([si[1:] != si[:-1], jnp.ones((1,), bool)])
        # tail value = cs[tail] - cs[previous tail]; emulate by scattering
        # cs at tails with +, and cs at tails shifted with - onto next id
        tgt = jnp.where(is_tail, si, C)  # non-tails -> trash column
        out = jnp.zeros((rows, C + 1), jnp.float32).at[:, tgt].add(
            cs, indices_are_sorted=True
        )
        prev = jnp.concatenate(
            [jnp.zeros((rows, 1)), cs[:, :-1]], axis=1
        )
        head = jnp.concatenate([jnp.ones((1,), bool), si[1:] != si[:-1]])
        tgt2 = jnp.where(head, si, C)
        out = out.at[:, tgt2].add(-prev, indices_are_sorted=True)
        return out[:, :C]

    timeit("sort+cumsum run trick", lambda: jax.jit(runsum_scatter)(g, idx), N)

    # one-hot MXU grad for ONE level (is the matmul path competitive at 16K?)
    n1 = 4096 * 48
    g1 = g[:, :n1]
    i1 = idx[:n1] % NB
    def onehot_grad(gg, i):
        oh = (i[None, :] == jnp.arange(NB)[:, None]).astype(jnp.bfloat16)
        return jax.lax.dot_general(
            gg.astype(jnp.bfloat16), oh.T,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    timeit("one-hot matmul grad 16K bricks (1 level)",
           lambda: jax.jit(onehot_grad)(g1, i1), n1)


if __name__ == "__main__":
    main()
