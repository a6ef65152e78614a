"""Pallas TPU kernel: sorted segment-sum table gradients with ZERO scatters.

The XLA scatter emitter moves table-gradient payload at ~45 GB/s and has a
per-descriptor cost floor (scripts/exp_scatter2/3/4). This path replaces the
scatter entirely:

  1. XLA pre-pass: sort descriptors by cell id (lax.sort_key_val), permute
     the cotangent rows into sorted order (a take — gathers are ~4x cheaper
     per descriptor than scatters), bucket-boundary search (searchsorted).
  2. Pallas kernel: grid over tiles of table cells. Each tile DMAs its
     descriptor range chunk-by-chunk from HBM, builds the chunk's one-hot
     membership matrix ON-CHIP (an iota compare — no HBM traffic), and
     accumulates `onehot^T @ cotangents` on the MXU into a VMEM-resident
     f32 tile. Descriptors of neighboring tiles inside a shared chunk fall
     out of the one-hot automatically, so chunk boundaries need no masking
     beyond a sentinel id for padding.

HBM traffic: cotangents read ~once (plus chunk-boundary overlap), output
written once — bytes at HBM speed instead of scatter-emitter speed. MXU
work is ~2 * 64 * NCELL * CHUNK-overlap FLOPs — noise.

Used by ops/hash_grid._segsum_bricks when SCATTER_ROUTE="segsum" — running
directly on the 27F-row brick columns, so no cell compaction or incidence
transform is needed (TPU only; tests run the kernel in interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 1024  # table cells per grid step (out block [TILE, 64] f32 = 256 KB)
CH = 512  # descriptors per DMA chunk


def _segsum_kernel(starts_ref, gp_hbm, id_hbm, out_ref, gp_buf, id_buf, sem):
    """One tile: accumulate its sorted-descriptor range into [TILE, R]."""
    t = pl.program_id(0)
    # chunk starts are aligned DOWN to CH multiples: Mosaic requires the DMA
    # slice start to be divisible by the sublane tiling, and descriptors
    # before this tile's true range fall out of the one-hot anyway (their
    # sorted ids are < base). Costs at most one CH-chunk of overlap per tile.
    s = (starts_ref[t] // CH) * CH
    e = starts_ref[t + 1]
    out_ref[:] = jnp.zeros_like(out_ref)
    base = t * TILE
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, TILE), 1) + base

    def body(c, _):
        off = s + c * CH
        d1 = pltpu.make_async_copy(
            gp_hbm.at[pl.ds(off, CH), :], gp_buf, sem.at[0]
        )
        d2 = pltpu.make_async_copy(
            id_hbm.at[pl.ds(off, CH), :], id_buf, sem.at[1]
        )
        d1.start()
        d2.start()
        d1.wait()
        d2.wait()
        oh = (id_buf[:, 0:1] == cols).astype(jnp.bfloat16)  # [CH, TILE]
        out_ref[:] += jax.lax.dot_general(
            oh, gp_buf[:], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return _

    jax.lax.fori_loop(0, pl.cdiv(e - s, CH), body, 0)


@functools.partial(jax.jit, static_argnames=("n_cells", "interpret"))
def sorted_segment_sum(gc, cid, n_cells: int, interpret: bool = False):
    """Segment-sum cotangent columns into table cells without a scatter.

    Args:
      gc: [R, M] bf16 cotangent columns — R is any row count (8F cell-
        compacted rows, or the full 27F brick rows: running directly on
        brick columns skips the cell compact + incidence transform).
      cid: [M] int32 segment ids in [0, n_cells) (cell or brick-column ids).
      n_cells: segment count; padded up to a TILE multiple internally.

    Returns: [R, n_cells] f32 accumulated gradients.
    """
    F8, M = gc.shape
    nc_pad = -(-n_cells // TILE) * TILE
    T = nc_pad // TILE

    sid, perm = jax.lax.sort_key_val(cid, jnp.arange(M, dtype=jnp.int32))
    gp = jnp.take(gc, perm, axis=1).T  # [M, F8] descriptor-major
    # sentinel-padded so every in-range DMA window is in-bounds and padding
    # descriptors match no tile
    gp = jnp.concatenate(
        [gp, jnp.zeros((CH, F8), gp.dtype)], axis=0
    )
    sid_p = jnp.concatenate(
        [sid, jnp.full((CH,), nc_pad, jnp.int32)], axis=0
    )[:, None]  # [M + CH, 1]

    starts = jnp.searchsorted(
        sid, jnp.arange(T + 1, dtype=jnp.int32) * TILE
    ).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # gp stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # sid stays in HBM
        ],
        out_specs=pl.BlockSpec((TILE, F8), lambda t, starts: (t, 0)),
        scratch_shapes=[
            pltpu.VMEM((CH, F8), jnp.bfloat16),
            pltpu.VMEM((CH, 1), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        _segsum_kernel,
        out_shape=jax.ShapeDtypeStruct((nc_pad, F8), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(starts, gp, sid_p)
    return out[:n_cells].T  # [F8, n_cells]
