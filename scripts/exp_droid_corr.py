"""Decompose the DROID corr-lookup's remaining cost (row-gather route).

exp_droid_cut (2026-08-21) attributed 57.8 ms of the 98.4 ms DROID
update to the reformulated corr lookup. This harness isolates, at the
production shape (E=48, h x w = 30 x 40, 4 levels, radius 3):

  a. full corr_lookup, rows route (the production path)
  b. full corr_lookup, scalar route (the replaced 700 ms formulation)
  c. row-take ONLY (the gather floor: 1.84M row descriptors)
  d. rows route with bf16 volumes (element-byte-bound check — the
     pixel-take was byte-bound, d8 1.65x)
  e. one-hot column einsum ONLY (fixed rows input)

Adjudication: if (a - c) >> einsum+combine cost, the overhead is in
XLA's scheduling of the mixed op chain; if d ~2x, flip the pyramid to
bf16 (corr values feed a conv net; a quality gate on the tracker output
would be needed before a default flip).
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
    from nerf_vo_tpu.ops import dense_corr as dc

    E, h, w, C = 48, 30, 40, 128
    radius = 3
    rng = np.random.default_rng(0)
    f_i = jnp.asarray(rng.normal(size=(E, h, w, C)), jnp.float32)
    f_j = jnp.asarray(rng.normal(size=(E, h, w, C)), jnp.float32)
    pyr = tuple(dc.build_corr_pyramid(f_i, f_j, num_levels=4))
    coords = jnp.asarray(
        rng.uniform(0, [w - 1, h - 1], size=(E, h, w, 2)), jnp.float32
    )
    P = h * w

    orig = dc._CORR_LOOKUP_ROUTE
    for route, label in (("rows", "a. full lookup rows route"),
                         ("blocks", "a2. full lookup blocks route"),
                         ("scalar", "b. full lookup scalar route")):
        dc._CORR_LOOKUP_ROUTE = route
        f = jax.jit(lambda p, c: dc.corr_lookup.__wrapped__(p, c,
                                                            radius=radius))
        ms = bench(f, pyr, coords)
        print(f"{label:34s} {ms:8.2f} ms", flush=True)
    dc._CORR_LOOKUP_ROUTE = orig

    # c. row-take floor: the G-row gathers of every level, nothing else
    G = 2 * radius + 2
    c0 = coords.reshape(E, P, 2)

    def rows_only(pyr, c0):
        outs = []
        for l, vol in enumerate(pyr):
            El, Pl, H, W = vol.shape
            c = c0 / (2.0 ** l)
            by = jnp.floor(c[..., 1]).astype(jnp.int32) - radius
            rows = by[..., None] + jnp.arange(G, dtype=jnp.int32)
            ep = jnp.arange(E * P, dtype=jnp.int32).reshape(E, P)
            ridx = ep[..., None] * H + jnp.clip(rows, 0, H - 1)
            outs.append(jnp.take(vol.reshape(E * P * H, W), ridx, axis=0))
        return outs

    ms = bench(jax.jit(rows_only), pyr, c0)
    print(f"{'c. row-take only (gather floor)':34s} {ms:8.2f} ms",
          flush=True)

    # d. rows route, bf16 volumes
    pyr_bf16 = tuple(v.astype(jnp.bfloat16) for v in pyr)
    dc._CORR_LOOKUP_ROUTE = "rows"
    f = jax.jit(lambda p, c: dc.corr_lookup.__wrapped__(p, c, radius=radius))
    ms = bench(f, pyr_bf16, coords)
    dc._CORR_LOOKUP_ROUTE = orig
    print(f"{'d. rows route, bf16 volumes':34s} {ms:8.2f} ms", flush=True)

    # e. one-hot einsum + bilinear combine only (fixed g rows)
    gs = [jnp.asarray(rng.normal(size=(E, P, G, v.shape[3])), jnp.float32)
          for v in pyr]
    bx = jnp.asarray(rng.integers(0, 32, size=(E, P)), jnp.int32)

    def einsum_only(gs, bx):
        outs = []
        for l, g in enumerate(gs):
            W = g.shape[3]
            cols = bx % max(W - G, 1)
            cols = cols[..., None] + jnp.arange(G, dtype=jnp.int32)
            sel = (cols[:, :, :, None]
                   == jnp.arange(W, dtype=jnp.int32)[None, None, None, :]
                   ).astype(g.dtype)
            B = jnp.einsum("epgw,epjw->epgj", g, sel)
            D = G - 1
            outs.append(
                0.25 * (B[:, :, :D, :D] + B[:, :, :D, 1:]
                        + B[:, :, 1:, :D] + B[:, :, 1:, 1:])
            )
        return outs

    ms = bench(jax.jit(einsum_only), gs, bx)
    print(f"{'e. col einsum + combine only':34s} {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
