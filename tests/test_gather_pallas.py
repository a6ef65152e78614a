"""Correctness pins for the Pallas VMEM-resident gather kernels
(ops/gather_pallas.py) in interpret mode — the on-chip speed gate is
scripts/exp_gather_pallas.py; these only pin semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_vo_tpu.ops import gather_pallas as gp


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    B, R, M = 64, 256, gp.TILE
    tab = jnp.asarray(rng.normal(size=(B, R)), jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, B, M), jnp.int32)
    return tab, idx, rng


@pytest.mark.slow  # interpret mode walks the tile element-wise (~1 min CPU)
def test_gather_cols_matches_take(data):
    tab, idx, _ = data
    out = gp.gather_cols(tab, idx, interpret=True)
    ref = jnp.take(tab, idx, axis=0)
    assert bool(jnp.all(out == ref))


@pytest.mark.slow
def test_gather_interp_matches_chain(data):
    tab, idx, rng = data
    M = idx.shape[0]
    w = jnp.asarray(rng.uniform(0, 1, (M, 32)), jnp.bfloat16)
    out = np.asarray(
        gp.gather_interp(tab, idx, w, features=8, interpret=True), np.float32
    )
    ref = np.take(np.asarray(tab, np.float32), np.asarray(idx), axis=0)
    want = np.sum(
        ref.reshape(M, 32, 8) * np.asarray(w, np.float32)[:, :, None], axis=1
    )
    # forward gathers a bf16 table and multiplies bf16 weights in f32:
    # tolerance is the bf16 product rounding over the 27-term reduce
    assert float(np.max(np.abs(out - want))) < 0.05
