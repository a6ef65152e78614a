"""Pallas VMEM-resident brick-column gather/scatter (forward-floor attack).

VERDICT r3 item 4: the mapping step's per-descriptor table ops are the
hard floor (~8-9 ns/desc XLA gather at one scattered level's shape,
~20 ns/desc XLA scatter-add — tpu_runs/exp_gather_pallas.log). At
production geometry one scattered LEVEL's bf16 brick table is only 8 MB
(16384 bricks x 256 rows) — it fits VMEM, so these kernels pin the whole
level on-chip and walk descriptors with dynamic-SUBLANE row ops at
load-to-use latency instead of paying HBM random access per descriptor.

Mosaic constraints discovered on-chip (2026-08-20 first attempt, banked
in tpu_runs/exp_gather_pallas.log):
  * `jnp.take` row-gather does NOT lower — Mosaic's dynamic_gather is
    shape-preserving (input, indices, output must match);
  * dynamic LANE indexing of a VMEM vector (idx_ref[0, 0, t]) does not
    lower ("cannot statically prove index ... multiple of 128") — per-
    descriptor indices must be SCALARS, i.e. live in SMEM.
  So every kernel here DMAs its index tile into SMEM scratch and loops
  descriptors with `tab_ref[idx_smem[t], :]` dynamic-sublane reads/writes.

This module is an EXPERIMENT backend: scripts/exp_gather_pallas.py gates
it on the real chip against the XLA split-take before any default flip.
Correctness is pinned by tests/test_gather_pallas.py in interpret mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# descriptors per grid step: idx/out blocks stream through SMEM/VMEM while
# the table block stays resident (constant index_map)
TILE = 2048


def _gather_rows_8(tab_ref, idx_smem, base):
    """Gather 8 arbitrary table rows into one [8, R] register block.

    Mosaic only allows dynamic SUBLANE slices at provable multiples of 8
    (second on-chip attempt: "cannot statically prove that index in
    dimension 0 is a multiple of 8"), so each row is fetched as its
    aligned 8-row block, rotated so the target row lands in its output
    slot (tpu.DynamicRotate supports traced shifts), and masked in.
    """
    R = tab_ref.shape[1]
    # rolls happen in f32 registers: tpu.DynamicRotate only supports
    # 32-bit data (third on-chip attempt: "Rotate with non-32-bit data")
    acc = jnp.zeros((8, R), jnp.float32)
    slot = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    for j in range(8):  # static unroll
        b = idx_smem[base + j]
        b8 = pl.multiple_of((b // 8) * 8, 8)
        blk = tab_ref[pl.ds(b8, 8), :].astype(jnp.float32)
        rolled = pltpu.roll(blk, j - (b % 8), axis=0)
        acc = jnp.where(slot == j, rolled, acc)
    return acc.astype(tab_ref.dtype)


def _gather_kernel(idx_hbm, tab_ref, out_ref, idx_smem, sem):
    i = pl.program_id(0)
    T = out_ref.shape[0]
    cp = pltpu.make_async_copy(idx_hbm.at[pl.ds(i * T, T)], idx_smem, sem)
    cp.start()
    cp.wait()

    def body(g, _):
        g8 = pl.multiple_of(g * 8, 8)
        out_ref[pl.ds(g8, 8), :] = _gather_rows_8(tab_ref, idx_smem, g8)
        return 0

    jax.lax.fori_loop(0, T // 8, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret", "tile"))
def gather_cols(tab_bm: jnp.ndarray, idx: jnp.ndarray,
                interpret: bool = False, tile: int = TILE) -> jnp.ndarray:
    """Gather brick rows from a VMEM-resident brick-major table.

    Args:
      tab_bm: [n_bricks, rows] bf16 — ONE level's table, brick-major.
      idx: [M] int32 brick ids, M % tile == 0.
    Returns [M, rows] bf16.
    """
    B, R = tab_bm.shape
    M = idx.shape[0]
    assert M % tile == 0, (M, tile)
    return pl.pallas_call(
        _gather_kernel,
        grid=(M // tile,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # idx stays off-VMEM
            pl.BlockSpec((B, R), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, R), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, R), tab_bm.dtype),
        scratch_shapes=[
            pltpu.SMEM((tile,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(idx, tab_bm)


def _gather_interp_kernel(idx_hbm, w_ref, tab_ref, out_ref, idx_smem,
                          g_vmem, sem, *, F: int):
    i = pl.program_id(0)
    T = out_ref.shape[0]
    cp = pltpu.make_async_copy(idx_hbm.at[pl.ds(i * T, T)], idx_smem, sem)
    cp.start()
    cp.wait()

    def body(g, _):
        g8 = pl.multiple_of(g * 8, 8)
        g_vmem[pl.ds(g8, 8), :] = _gather_rows_8(tab_ref, idx_smem, g8)
        return 0

    jax.lax.fori_loop(0, T // 8, body, 0)
    # trilinear 27-corner contraction, vectorized over the tile — the
    # [T, 32F] gathered block never leaves VMEM
    g3 = g_vmem[:].reshape(T, 32, F).astype(jnp.float32)
    w = w_ref[:].astype(jnp.float32)  # [T, 32] (rows 27..31 zero)
    out_ref[:] = jnp.sum(g3 * w[:, :, None], axis=1).astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("features", "interpret", "tile"))
def gather_interp(tab_bm: jnp.ndarray, idx: jnp.ndarray, w: jnp.ndarray,
                  features: int, interpret: bool = False,
                  tile: int = TILE) -> jnp.ndarray:
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
    assert M % tile == 0, (M, tile)
    kernel = functools.partial(_gather_interp_kernel, F=F)
    return pl.pallas_call(
        kernel,
        grid=(M // tile,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((tile, 32), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, R), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, F), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, F), jnp.bfloat16),
        scratch_shapes=[
            pltpu.SMEM((tile,), jnp.int32),
            pltpu.VMEM((tile, R), tab_bm.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(idx, w, tab_bm)


def _gather_interp_mm_kernel(idx_hbm, w_ref, tab_ref, out_ref, idx_smem,
                             g_vmem, sem, *, F: int):
    """Fused gather + trilinear reduce with the contraction as MXU
    matmuls against one-hot matrices — NO in-kernel reshape (the
    [T, 32F] -> [T, 32, F] shape cast is what Mosaic refused to lower in
    the first fused attempt, exp_gather_pallas.log:10,28 / VERDICT r4
    weak #6). Identity used:

        out[t, f] = sum_e w[t, e] * g[t, e*F + f]
                  = ((w @ E) * g) @ S
        E[e, r] = [r // F == e]   (32 x R expansion)
        S[r, f] = [r %  F == f]   (R x F selection)

    E and S are built in-registers from 2D iotas; both matmuls hit the
    MXU (the FLOPs are trivial — the question is whether this beats the
    ~9.2 ns/desc XLA fused gather+interp chain, which the bare-gather
    loss made unlikely but never measured)."""
    i = pl.program_id(0)
    T = out_ref.shape[0]
    R = tab_ref.shape[1]
    cp = pltpu.make_async_copy(idx_hbm.at[pl.ds(i * T, T)], idx_smem, sem)
    cp.start()
    cp.wait()

    def body(g, _):
        g8 = pl.multiple_of(g * 8, 8)
        g_vmem[pl.ds(g8, 8), :] = _gather_rows_8(tab_ref, idx_smem, g8)
        return 0

    jax.lax.fori_loop(0, T // 8, body, 0)

    r32 = jax.lax.broadcasted_iota(jnp.int32, (32, R), 1)
    e32 = jax.lax.broadcasted_iota(jnp.int32, (32, R), 0)
    E = (r32 // F == e32).astype(jnp.float32)  # [32, R]
    rf = jax.lax.broadcasted_iota(jnp.int32, (R, F), 0)
    ff = jax.lax.broadcasted_iota(jnp.int32, (R, F), 1)
    S = (rf % F == ff).astype(jnp.float32)  # [R, F]

    w = w_ref[:].astype(jnp.float32)  # [T, 32]
    wexp = jax.lax.dot(w, E, precision=jax.lax.Precision.DEFAULT)  # [T, R]
    prod = wexp * g_vmem[:].astype(jnp.float32)
    out_ref[:] = jax.lax.dot(
        prod, S, precision=jax.lax.Precision.DEFAULT
    ).astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("features", "interpret", "tile"))
def gather_interp_mm(tab_bm: jnp.ndarray, idx: jnp.ndarray, w: jnp.ndarray,
                     features: int, interpret: bool = False,
                     tile: int = TILE) -> jnp.ndarray:
    """Reshape-free fused gather + trilinear reduce (see the kernel
    docstring). Same contract as :func:`gather_interp`."""
    B, R = tab_bm.shape
    F = features
    assert R == 32 * F, (R, F)
    M = idx.shape[0]
    assert M % tile == 0, (M, tile)
    kernel = functools.partial(_gather_interp_mm_kernel, F=F)
    return pl.pallas_call(
        kernel,
        grid=(M // tile,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((tile, 32), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((B, R), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, F), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, F), jnp.bfloat16),
        scratch_shapes=[
            pltpu.SMEM((tile,), jnp.int32),
            pltpu.VMEM((tile, R), tab_bm.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(idx, w, tab_bm)


def _scatter_accum_kernel(idx_hbm, g_ref, out_ref, idx_smem, sem):
    # VMEM-resident scatter-add: the [NB, R] output block has a constant
    # index_map, so it stays in VMEM across grid steps and accumulates;
    # each step adds its tile of brick cotangents row-by-row (dynamic
    # sublane read-modify-write). The XLA scatter emitter is pinned at
    # ~20-27 ns/descriptor at ANY payload width (tpu_runs/
    # exp_scatter4.log); this tests whether VMEM residency escapes it.
    i = pl.program_id(0)
    T = g_ref.shape[0]

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    cp = pltpu.make_async_copy(idx_hbm.at[pl.ds(i * T, T)], idx_smem, sem)
    cp.start()
    cp.wait()

    slot = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)

    def body(g, _):
        # read each cotangent row from an aligned 8-row block of g_ref,
        # rotate it onto its target table row's position within the
        # target's aligned block, mask, and read-modify-write that block
        g8 = pl.multiple_of(g * 8, 8)
        rows = g_ref[pl.ds(g8, 8), :].astype(jnp.float32)

        def sub(j, _):
            b = idx_smem[g8 + j]
            b8 = pl.multiple_of((b // 8) * 8, 8)
            upd = pltpu.roll(rows, (b % 8) - j, axis=0)
            blk = out_ref[pl.ds(b8, 8), :].astype(jnp.float32)
            out_ref[pl.ds(b8, 8), :] = jnp.where(
                slot == b % 8, blk + upd, blk
            ).astype(out_ref.dtype)
            return 0

        jax.lax.fori_loop(0, 8, sub, 0)
        return 0

    jax.lax.fori_loop(0, T // 8, body, 0)


@functools.partial(jax.jit,
                   static_argnames=("n_bricks", "interpret", "tile"))
def scatter_cols_accum(g: jnp.ndarray, idx: jnp.ndarray, n_bricks: int,
                       interpret: bool = False,
                       tile: int = TILE) -> jnp.ndarray:
    """Accumulate brick-row cotangents into a VMEM-resident table.

    Args:
      g: [M, rows] bf16 per-descriptor cotangent rows (brick-major).
      idx: [M] int32 brick ids in [0, n_bricks).
    Returns [n_bricks, rows] bf16 accumulated gradients — bf16 so the
    8 MB resident table + streamed tiles fit the ~16 MB VMEM (and the
    production backward already accumulates bf16, SCATTER_BF16).
    """
    M, R = g.shape
    assert M % tile == 0, (M, tile)
    return pl.pallas_call(
        _scatter_accum_kernel,
        grid=(M // tile,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((tile, R), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_bricks, R), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_bricks, R), jnp.bfloat16),
        scratch_shapes=[
            pltpu.SMEM((tile,), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(idx, g)
