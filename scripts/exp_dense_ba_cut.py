"""Isolated DROID dense-BA timing at production shapes.

exp_droid_cut's BA-solve delta wobbles across sessions (83.2 / 11.9 /
27.4 / 32 ms for identical code) — this times dense_bundle_adjust ALONE
at the exact production problem shape (B=128 buffer, 48 live + 48
inactive edges, 30x40 grid, 2 GN iters, eta damping) to pin whether the
in-step delta is real solver cost or scheduling noise. Also arms: 1 GN
iter, and no-eta.
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


def bench(fn, *a, n=10, windows=3):
    out = fn(*a)
    sync(out)
    best = 1e9
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*a)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3


def main():
    from nerf_vo_tpu.utils.jax_setup import setup_jax

    setup_jax()
    from nerf_vo_tpu.ops import dense_ba

    B, h, w = 128, 30, 40
    E = 96  # 48 live + 48 inactive, concatenated like _update_impl does
    rng = np.random.default_rng(0)
    poses = jnp.asarray(
        np.concatenate(
            [rng.normal(0, 0.1, (B, 3)),
             np.tile([0, 0, 0, 1.0], (B, 1))], axis=1
        ), jnp.float32,
    )
    disps = jnp.asarray(rng.uniform(0.3, 2.0, (B, h, w)), jnp.float32)
    intr8 = jnp.tile(jnp.asarray([32.0, 32.0, w / 2, h / 2]), (B, 1))
    ii = jnp.asarray(rng.integers(0, 25, E), jnp.int32)
    jj = jnp.asarray((np.asarray(ii) + 1 + rng.integers(0, 3, E)) % 25,
                     jnp.int32)
    targets = jnp.asarray(rng.uniform(0, [w - 1, h - 1], (E, h, w, 2)),
                          jnp.float32)
    weights = jnp.asarray(rng.uniform(0.1, 1.0, (E, h, w, 2)), jnp.float32)
    valid = jnp.ones((E,), bool)
    slot_map = np.full(B, -1, np.int32)
    slot_map[2:25] = np.arange(23)
    slot_map = jnp.asarray(slot_map)
    eta = jnp.asarray(rng.uniform(0.005, 0.02, (B, h, w)), jnp.float32)

    problem = dense_ba.DenseBAProblem(
        poses=poses, disps=disps, intrinsics=intr8, ii=ii, jj=jj,
        targets=targets, weights=weights, valid=valid,
    )

    for label, kw in (
        ("2 GN iters + eta (production)", dict(num_iters=2, eta=eta)),
        ("1 GN iter + eta", dict(num_iters=1, eta=eta)),
        ("2 GN iters, no eta", dict(num_iters=2, eta=None)),
    ):
        f = jax.jit(lambda p, sm, kw=kw: dense_ba.dense_bundle_adjust(
            p, sm, window=25, **kw
        ))
        ms = bench(f, problem, slot_map)
        print(f"{label:34s} {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
