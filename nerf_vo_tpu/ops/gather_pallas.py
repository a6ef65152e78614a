"""Pallas VMEM-resident brick-column gather (forward-path experiment).

VERDICT r3 item 4: the mapping step's forward floor is the per-descriptor
table gather (~4-5 ns/descriptor through XLA's take, best case with the
4-way `_split_take` DMA overlap). The hypothesis here: at production
geometry one scattered LEVEL's bf16 brick table is only 8 MB
(16384 bricks x 256 rows), which fits VMEM — so a Pallas kernel can pin
the whole level on-chip once and gather from VMEM at load-to-use latency
instead of paying HBM random access per descriptor, and optionally FUSE
the trilinear reduction so the [256, M] gathered block (100 MB/level at
production M) never round-trips HBM at all.

Layout: the kernel works on the BRICK-MAJOR transpose [bricks, 32*F] of
the training layout [32*F, bricks] — gathers index the SUBLANE axis
(Mosaic's dynamic-gather direction; lane-axis dynamic indexing does not
exist). The caller keeps tables in the training layout and transposes once
per step (8 MB of sequential traffic, ~10 us).

This module is an EXPERIMENT backend: scripts/exp_gather_pallas.py gates
it on the real chip against the XLA split-take before any default flip.
Correctness is pinned by tests/test_gather_pallas.py in interpret mode
(CPU) and on-chip when TPU is present.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# descriptors per grid step: the idx/out blocks stream through VMEM while
# the table block stays resident (constant index_map)
TILE = 2048


def _gather_kernel(idx_ref, tab_ref, out_ref):
    # idx block [1, TILE] int32, table resident [B, R], out [TILE, R]
    out_ref[:] = jnp.take(tab_ref[:], idx_ref[0, :], axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_cols(tab_bm: jnp.ndarray, idx: jnp.ndarray,
                interpret: bool = False) -> jnp.ndarray:
    """Gather brick rows from a VMEM-resident brick-major table.

    Args:
      tab_bm: [n_bricks, rows] bf16 — ONE level's table, brick-major.
      idx: [M] int32 brick ids, M % TILE == 0.
    Returns [M, rows] bf16.
    """
    B, R = tab_bm.shape
    M = idx.shape[0]
    assert M % TILE == 0, (M, TILE)
    idx2 = idx.reshape(-1, TILE)
    return pl.pallas_call(
        _gather_kernel,
        grid=(M // TILE,),
        in_specs=[
            pl.BlockSpec((1, TILE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, R), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, R), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, R), tab_bm.dtype),
        interpret=interpret,
    )(idx2, tab_bm)


def _gather_interp_kernel(idx_ref, w_ref, tab_ref, out_ref, *, F: int):
    # fused: gather [TILE, 32F] then contract the 27 corner entries with
    # the trilinear weights — the [TILE, 32F] block never leaves VMEM
    g = jnp.take(tab_ref[:], idx_ref[0, :], axis=0)  # [TILE, 32F]
    T = g.shape[0]
    g3 = g.reshape(T, 32, F).astype(jnp.float32)
    w = w_ref[:].astype(jnp.float32)  # [TILE, 32] (rows 27..31 zero)
    out_ref[:] = jnp.sum(g3 * w[:, :, None], axis=1).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("features", "interpret"))
def gather_interp(tab_bm: jnp.ndarray, idx: jnp.ndarray, w: jnp.ndarray,
                  features: int, interpret: bool = False) -> jnp.ndarray:
    """Fused gather + trilinear reduce: returns [M, F] bf16 features.

    Args:
      tab_bm: [n_bricks, 32*F] bf16 brick-major table (row = entry*F + f).
      idx: [M] int32 brick ids.
      w: [M, 32] bf16 per-entry trilinear weights (27 real + 5 zero pads).
    """
    B, R = tab_bm.shape
    F = features
    assert R == 32 * F, (R, F)
    M = idx.shape[0]
    assert M % TILE == 0, (M, TILE)
    kernel = functools.partial(_gather_interp_kernel, F=F)
    return pl.pallas_call(
        kernel,
        grid=(M // TILE,),
        in_specs=[
            pl.BlockSpec((1, TILE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, 32), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, R), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, F), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, F), jnp.bfloat16),
        interpret=interpret,
    )(idx.reshape(-1, TILE), w, tab_bm)


def _gather_kernel_i32(idx_ref, tab_ref, out_ref):
    # 32-bit fallback: the table's bf16 pairs are pre-bitcast to int32
    # lanes by the caller (some Mosaic versions only support dynamic
    # sublane gathers at 32-bit element width)
    out_ref[:] = jnp.take(tab_ref[:], idx_ref[0, :], axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_cols_i32(tab_bm_i32: jnp.ndarray, idx: jnp.ndarray,
                    interpret: bool = False) -> jnp.ndarray:
    """gather_cols over an int32 view [n_bricks, rows//2] of the bf16
    table; returns the int32 rows (caller bitcasts back)."""
    B, R2 = tab_bm_i32.shape
    M = idx.shape[0]
    assert M % TILE == 0, (M, TILE)
    return pl.pallas_call(
        _gather_kernel_i32,
        grid=(M // TILE,),
        in_specs=[
            pl.BlockSpec((1, TILE), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, R2), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE, R2), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, R2), tab_bm_i32.dtype),
        interpret=interpret,
    )(idx.reshape(-1, TILE), tab_bm_i32)
