"""Descriptor-sharded all_to_all TP gather (ops/hash_grid.tp_gather_cols_a2a).

CPU-mesh correctness for the pod-scale prototype (VERDICT round-2 item 8):
the sample-sharded + column-sharded gather must match the single-device
brick gather exactly (f32 accumulation) in both forward columns and table
gradients, on the request-routing main path AND the overflow fallback.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from nerf_vo_tpu.ops import hash_grid as hg

D = 4
F = 2
ROWS = hg._BRICK_PAD * F
C = 64  # total table columns; C // D per shard


def _mesh():
    return Mesh(np.array(jax.devices()[:D]), ("m",))


def _sharded_loss_grad(tables, idx, loc, W):
    """loss + d(loss)/d(tables) via the a2a gather on a D-shard mesh,
    sample axis AND table columns sharded."""
    gfn = hg.tp_gather_cols_a2a("m", D)

    def lg(tbl, idx_s, loc_s, w_s):
        def f(t):
            out = gfn(t, idx_s, loc_s)
            return jnp.sum(out.astype(jnp.float32) * w_s)

        loss, grad = jax.value_and_grad(f)(tbl)
        return jax.lax.psum(loss, "m"), grad, gfn(tbl, idx_s, loc_s)

    sm = jax.shard_map(
        lg, mesh=_mesh(),
        in_specs=(P(None, "m"), P("m"), P(None, "m"), P(None, "m")),
        out_specs=(P(), P(None, "m"), P(None, "m")),
    )
    return jax.jit(sm)(tables, idx, loc, W)


def _reference_loss_grad(tables, idx, loc, W):
    """Single-device reference through the brick-scatter gather (one level
    spanning the whole table: n_bricks=C, base_col=0)."""
    gfn = hg._gather_scattered(C, 0)

    def f(t):
        return jnp.sum(gfn(t, idx, loc).astype(jnp.float32) * W)

    loss, grad = jax.value_and_grad(f)(tables)
    return loss, grad, gfn(tables, idx, loc)


def _case(rng, m_global, concentrate=False):
    tables = jnp.asarray(
        rng.standard_normal((ROWS, C)).astype(np.float32) * 0.1
    )
    if concentrate:
        # every descriptor owned by shard 0 -> per-pair capacity overflows
        idx = jnp.asarray(rng.integers(0, C // D, m_global, dtype=np.int32))
    else:
        idx = jnp.asarray(rng.integers(0, C, m_global, dtype=np.int32))
    loc_np = rng.integers(0, 2, (3, m_global), dtype=np.int32)
    loc = jnp.asarray(loc_np)
    # cotangents carry the REAL trilinear sparsity: nonzero only on the 8F
    # rows of the descriptor's own cell (W zero-weights every brick corner
    # outside it) — the a2a backward's cell compaction relies on this, and
    # genuine hash_encode cotangents always satisfy it
    W_np = np.zeros((ROWS, m_global), np.float32)
    for di in range(2):
        for dj in range(2):
            for dk in range(2):
                e = (
                    (loc_np[0] + di) * 3 + (loc_np[1] + dj)
                ) * 3 + (loc_np[2] + dk)
                rows = e[None, :] * F + np.arange(F)[:, None]
                W_np[rows, np.arange(m_global)[None, :]] = (
                    rng.standard_normal((F, m_global)).astype(np.float32)
                )
    W = jnp.asarray(W_np)
    return tables, idx, loc, W


@pytest.fixture()
def exact_accumulation(monkeypatch):
    """f32 scatter accumulation: both paths sum identical terms, so the
    comparison tolerance is pure summation-order noise."""
    monkeypatch.setattr(hg, "SCATTER_BF16", False)


def test_a2a_matches_reference(rng, exact_accumulation):
    tables, idx, loc, W = _case(rng, 512)
    loss_s, grad_s, out_s = _sharded_loss_grad(tables, idx, loc, W)
    loss_r, grad_r, out_r = _reference_loss_grad(tables, idx, loc, W)
    np.testing.assert_allclose(
        np.asarray(out_s, np.float32), np.asarray(out_r, np.float32)
    )
    np.testing.assert_allclose(float(loss_s), float(loss_r), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(grad_s), np.asarray(grad_r), rtol=1e-5, atol=1e-6
    )


def test_a2a_overflow_fallback_matches(rng, exact_accumulation):
    # 2048 descriptors all owned by shard 0: rank exceeds the per-pair cap
    # on every device, forcing the uniform exchange-everything fallback
    tables, idx, loc, W = _case(rng, 2048, concentrate=True)
    loss_s, grad_s, out_s = _sharded_loss_grad(tables, idx, loc, W)
    loss_r, grad_r, out_r = _reference_loss_grad(tables, idx, loc, W)
    np.testing.assert_allclose(
        np.asarray(out_s, np.float32), np.asarray(out_r, np.float32)
    )
    np.testing.assert_allclose(float(loss_s), float(loss_r), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(grad_s), np.asarray(grad_r), rtol=1e-5, atol=1e-6
    )


def test_a2a_default_bf16_payload(rng):
    """Production setting (bf16 payload accumulation): agreement within
    bf16 summation noise at ~8 adds/column."""
    tables, idx, loc, W = _case(rng, 512)
    loss_s, grad_s, _ = _sharded_loss_grad(tables, idx, loc, W)
    loss_r, grad_r, _ = _reference_loss_grad(tables, idx, loc, W)
    np.testing.assert_allclose(float(loss_s), float(loss_r), rtol=1e-4)
    # the a2a route accumulates 8F-row cell payloads, the single-chip
    # reference 27F-row brick payloads — both bf16, so the comparison is
    # between two different bf16 summation orders; tolerances target
    # routing/layout bugs (order-1), not rounding
    np.testing.assert_allclose(
        np.asarray(grad_s), np.asarray(grad_r), rtol=0.05, atol=0.02
    )
