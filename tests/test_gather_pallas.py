"""Correctness pins for the Pallas VMEM-resident gather kernels
(ops/gather_pallas.py) in interpret mode — the on-chip speed gate is
scripts/exp_gather_pallas.py; these only pin semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_vo_tpu.ops import gather_pallas as gp


TILE = 128  # tiny tile: interpret mode walks tiles element-wise


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    B, R, M = 64, 256, 2 * TILE
    tab = jnp.asarray(rng.normal(size=(B, R)), jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, B, M), jnp.int32)
    return tab, idx, rng


@pytest.mark.slow
def test_gather_cols_matches_take(data):
    tab, idx, _ = data
    out = gp.gather_cols(tab, idx, interpret=True, tile=TILE)
    ref = jnp.take(tab, idx, axis=0)
    assert bool(jnp.all(out == ref))


@pytest.mark.slow
def test_gather_interp_matches_chain(data):
    tab, idx, rng = data
    M = idx.shape[0]
    w = jnp.asarray(rng.uniform(0, 1, (M, 32)), jnp.bfloat16)
    out = np.asarray(
        gp.gather_interp(tab, idx, w, features=8, interpret=True,
                         tile=TILE), np.float32
    )
    ref = np.take(np.asarray(tab, np.float32), np.asarray(idx), axis=0)
    want = np.sum(
        ref.reshape(M, 32, 8) * np.asarray(w, np.float32)[:, :, None], axis=1
    )
    # forward gathers a bf16 table and multiplies bf16 weights in f32:
    # tolerance is the bf16 product rounding over the 27-term reduce
    assert float(np.max(np.abs(out - want))) < 0.05


@pytest.mark.slow
def test_gather_interp_mm_matches_chain(data):
    """The reshape-free (one-hot matmul) fused variant must match the
    same reference chain — this is the formulation built to dodge the
    Mosaic shape-cast limit that stopped gather_interp from lowering."""
    tab, idx, rng = data
    M = idx.shape[0]
    w = jnp.asarray(rng.uniform(0, 1, (M, 32)), jnp.bfloat16)
    out = np.asarray(
        gp.gather_interp_mm(tab, idx, w, features=8, interpret=True,
                            tile=TILE), np.float32
    )
    ref = np.take(np.asarray(tab, np.float32), np.asarray(idx), axis=0)
    want = np.sum(
        ref.reshape(M, 32, 8) * np.asarray(w, np.float32)[:, :, None], axis=1
    )
    assert float(np.max(np.abs(out - want))) < 0.05


@pytest.mark.slow
def test_scatter_accum_matches_xla(data):
    tab, idx, rng = data
    M = idx.shape[0]
    NB = 64
    g = jnp.asarray(rng.normal(0, 0.1, (M, 256)), jnp.bfloat16)
    out = np.asarray(
        gp.scatter_cols_accum(g, idx, n_bricks=NB, interpret=True,
                              tile=TILE),
        np.float32,
    )
    ref = np.zeros((NB, 256), np.float32)
    np.add.at(ref, np.asarray(idx), np.asarray(g, np.float32))
    # bf16 accumulation over ~M/NB = 32 adds per brick
    assert float(np.max(np.abs(out - ref))) < 0.2
