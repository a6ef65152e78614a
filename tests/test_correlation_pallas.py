"""Pallas correlation kernel vs the XLA reference path (interpret mode on CPU)."""

import numpy as np
import pytest


def test_pallas_matches_xla(rng):
    import jax
    import jax.numpy as jnp

    from nerf_vo_tpu.ops.correlation import patch_correlation
    from nerf_vo_tpu.ops.correlation_pallas import (
        EB,
        patch_correlation_pallas,
    )

    R, H, W, C = 3, 32, 48, 128
    E = 24
    f1 = jnp.asarray(rng.normal(size=(R, H, W, C)), jnp.bfloat16)
    f2 = jnp.asarray(rng.normal(size=(R, H // 2, W // 2, C)), jnp.bfloat16)
    pf = jnp.asarray(rng.normal(size=(E, 3, 3, C)), jnp.bfloat16)
    ctr = np.asarray(
        rng.uniform([10, 10], [W - 10, H - 10], size=(E, 2)), np.float32
    )
    ctr[0] = [1.0, 1.0]       # near-border
    ctr[1] = [-20.0, 5.0]     # off-screen -> zeroed
    jjr = np.asarray(rng.integers(0, R, size=E), np.int64)

    # host-side sort by frame, pad to EB blocks (mirrors the tracker)
    order = np.argsort(jjr, kind="stable")
    idx_sorted, blocks = [], []
    pos = 0
    counts = np.bincount(jjr, minlength=R)
    for fidx in range(R):
        n = counts[fidx]
        sel = order[pos: pos + n]
        pos += n
        nb = -(-max(int(n), 0) // EB) if n else 0
        idx_sorted.extend(list(sel) + [sel[-1] if n else 0] * (nb * EB - n))
        blocks.extend([fidx] * nb)
    idx_sorted = np.asarray(idx_sorted)
    blocks = np.asarray(blocks, np.int32)

    out_s = patch_correlation_pallas(
        pf[jnp.asarray(idx_sorted)], f1, f2, jnp.asarray(blocks),
        jnp.asarray(ctr)[jnp.asarray(idx_sorted)], radius=3,
        n_blocks=len(blocks),
    )
    inv = np.full(E, -1)
    for s, o in enumerate(idx_sorted):
        if inv[o] < 0:
            inv[o] = s
    got = np.asarray(out_s)[inv]

    want = np.asarray(
        patch_correlation(pf, f1, f2, jnp.asarray(jjr, jnp.int32),
                          jnp.asarray(ctr), radius=3, chunk=E)
    )
    assert np.isfinite(got).all()
    # interior edges match to bf16 precision; un-normalized dot products
    # over C=128 bf16 channels carry ~sqrt(C) * 2^-8 relative error
    err = np.abs(got[2:] - want[2:])
    rel = err / (np.abs(want[2:]) + 1.0)
    assert rel.max() < 0.05, rel.max()
    # fully off-screen edge is zeroed
    assert np.abs(got[1]).max() == 0.0
