"""Sorted-segment-sum Pallas kernel (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf_vo_tpu.ops import hash_grid
from nerf_vo_tpu.ops.scatter_pallas import sorted_segment_sum


def test_matches_dense_scatter(rng):
    F8, M, NC = 16, 3000, 2500  # NC not a TILE multiple (padding path)
    gc = jnp.asarray(
        rng.standard_normal((F8, M)).astype(np.float32), jnp.bfloat16
    )
    cid = jnp.asarray(rng.integers(0, NC, M), jnp.int32)
    got = sorted_segment_sum(gc, cid, NC, interpret=True)
    want = (
        jnp.zeros((F8, NC), jnp.float32)
        .at[:, cid]
        .add(gc.astype(jnp.float32))
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_empty_and_hot_cells(rng):
    """Tiles with zero descriptors and one cell receiving many both work."""
    F8, NC = 8, 4096
    cid = jnp.asarray(np.full(600, 7, np.int32))  # all into one cell
    gc = jnp.ones((F8, 600), jnp.bfloat16)
    out = np.asarray(sorted_segment_sum(gc, cid, NC, interpret=True))
    assert out[0, 7] == 600.0  # f32 MXU accumulation, exact at this scale
    assert np.abs(out).sum() == 600.0 * F8


def test_chunk_misaligned_starts(rng):
    """Tile descriptor ranges starting at arbitrary (non-CH-aligned)
    offsets accumulate exactly — the kernel aligns chunk starts DOWN and
    relies on the one-hot to drop the preceding tiles' descriptors."""
    F8, M, NC = 8, 5000, 2048  # two tiles
    gc = jnp.asarray(
        rng.standard_normal((F8, M)).astype(np.float32), jnp.bfloat16
    )
    # front-load tile 0 so tile 1's range starts at an odd offset (3001)
    cid = jnp.asarray(
        np.concatenate([
            rng.integers(0, 1024, 3001),
            rng.integers(1024, NC, M - 3001),
        ]).astype(np.int32)
    )
    got = sorted_segment_sum(gc, cid, NC, interpret=True)
    want = (
        jnp.zeros((F8, NC), jnp.float32)
        .at[:, cid]
        .add(gc.astype(jnp.float32))
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_hash_grid_segsum_route_matches(rng):
    """hash_encode table grads via SCATTER_ROUTE="segsum" == the brick-
    scatter route (same cotangents; f32 MXU accumulation vs bf16 scatter
    adds)."""
    cfg = hash_grid.HashGridConfig(
        n_levels=4, features_per_level=2, log2_table_size=10,
        base_resolution=4, max_resolution=32,
    )
    tables = hash_grid.init_tables(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.uniform(0, 1, size=(64, 3)), jnp.float32)
    co = jnp.asarray(rng.normal(size=(64, cfg.output_dim)), jnp.float32)

    def grad_with(route):
        old = hash_grid.SCATTER_ROUTE
        hash_grid.SCATTER_ROUTE = route
        try:
            f = lambda t: jnp.sum(hash_grid.hash_encode(t, x, cfg) * co)
            return np.asarray(jax.grad(f)(tables))
        finally:
            hash_grid.SCATTER_ROUTE = old

    g_scatter = grad_with("brick")
    g_segsum = grad_with("segsum")
    assert np.abs(g_segsum).sum() > 0
    # brick route accumulates in bf16 (SCATTER_BF16 default); segsum
    # accumulates the same bf16 payload in f32 on the MXU
    np.testing.assert_allclose(g_segsum, g_scatter, rtol=0.02, atol=1e-4)
