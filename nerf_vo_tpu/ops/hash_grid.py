"""Multiresolution brick-hash-grid encoding (Instant-NGP capability, TPU-native).

TPU-native replacement for tiny-cuda-nn's HashGrid encoding (reference
submodule N6, consumed by pyngp and nerfstudio's nerfacto fields — SURVEY.md
§2.2). Capability per Müller et al., "Instant Neural Graphics Primitives with
a Multiresolution Hash Encoding" (https://arxiv.org/abs/2201.05989); the data
structure is REDESIGNED for TPU memory behavior rather than ported:

  * tiny-cuda-nn gathers 8 scalar corner entries per (sample, level) and
    relies on the GPU's L2 to coalesce them. TPU gathers cost ~6-15 ns per
    DESCRIPTOR regardless of width (measured on v5e: 25M-element gathers
    = 146 ms — 100x the HBM-bandwidth cost), so the unit of storage here is
    a BRICK: the 3x3x3 corner lattice of a 2x2x2-cell region, stored as one
    table column. All 8 trilinear corners of any cell live in its brick, so
    each (sample, level) needs exactly ONE gather — 8x fewer descriptors,
    and each descriptor moves a full [32*F] column.
  * bricks duplicate shared corner entries across brick boundaries (a 27/8
    storage apron, the classic texture-brick trade). Corner copies are
    trained independently, so the interpolated field may be C0-discontinuous
    at even cell boundaries — same order of artifact as NGP's hash
    collisions, and empirically absorbed by the MLP + multi-level averaging.
  * levels whose brick lattice fits the table are DENSE (collision-free);
    finer levels hash the brick coordinate with NGP's spatial primes.
  * the gather is SPLIT into 4 independent takes (measured 2x: the DMA
    engines overlap) over a table whose minor axis is the brick index
    (lane tiling pads nothing); trilinear interpolation is a separable
    weight outer-product + a 32-way reduction — pure VPU work, no
    take_along_axis.
  * the backward scatter-add lands on [32*F, bricks] COLUMNS (measured
    ~20 ns/descriptor vs ~14 ns/ELEMENT for flat scatters), again 8x fewer
    descriptors than per-corner accumulation. Autodiff handles it — the op
    stays twice-differentiable for gradient-normal losses.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

# Spatial hash primes from the Instant-NGP paper (π1=1 for coherent x-axis).
_PRIMES = (1, 2654435761, 805459861)

_BRICK = 27  # 3x3x3 corner lattice of a 2x2x2-cell region
_BRICK_PAD = 32  # padded column height per feature
# Independent takes per gather (DMA overlap): 4 measured 2x over 1 take at
# round-2 shapes; the round-4 isolated sweep at one scattered level's shape
# reads 1/2/4/8/16 = 3.48/4.04/4.00/3.14/3.09 ms (tpu_runs/
# exp_gather_pallas.log) — 16 beats 4 by ~25% in isolation. Env-overridable
# so bench.py can gate the flip IN-STEP (isolated takes don't see the
# fusion XLA applies when the gather feeds the interpolation directly).
import os as _os

_GATHER_SPLITS = int(_os.environ.get("NERF_VO_GATHER_SPLITS", "4"))
# Dense levels with at most this many bricks are encoded via a one-hot MXU
# matmul instead of gather/scatter: descriptors cost ~4-5 ns fwd / ~17 ns
# bwd EACH (scripts/exp_gather.py), so a [N, 512] one-hot product (~0.5 ms
# of MXU + operand traffic both ways) beats ~4.5 ms of descriptors at the
# field's production sample count. 512 covers the res-16 base level.
_ONEHOT_MAX_BRICKS = 512


@dataclasses.dataclass(frozen=True)
class HashGridConfig:
    n_levels: int = 16
    features_per_level: int = 2
    log2_table_size: int = 19  # per-level ENTRY capacity (bricks = T/32)
    base_resolution: int = 16
    max_resolution: int = 2048

    @property
    def table_size(self) -> int:
        return 1 << self.log2_table_size

    @property
    def bricks_per_level(self) -> int:
        return max(self.table_size // _BRICK_PAD, 1)

    @property
    def output_dim(self) -> int:
        return self.n_levels * self.features_per_level

    @property
    def resolutions(self) -> Sequence[int]:
        if self.n_levels == 1:
            return (self.base_resolution,)
        growth = math.exp(
            (math.log(self.max_resolution) - math.log(self.base_resolution))
            / (self.n_levels - 1)
        )
        return tuple(
            int(math.floor(self.base_resolution * growth**l))
            for l in range(self.n_levels)
        )


def init_tables(key, config: HashGridConfig, dtype=jnp.float32,
                shard: int = 1):
    """Table init U(-1e-4, 1e-4) as in Instant-NGP.

    Shape [32*F, L*NB]: column = one brick (27 corner entries + 5 pad rows,
    entry-major / feature-minor), minor axis = brick index (TPU lane tiling
    pads nothing on the huge axis). ``shard`` > 1 declares one tensor-
    parallel column shard of the table (1/shard of the columns) — used by
    the model view that runs inside a shard_map (_tp_gather_cols).
    """
    F = config.features_per_level
    cols = config.n_levels * config.bricks_per_level
    assert cols % shard == 0, (cols, shard)
    shape = (_BRICK_PAD * F, cols // shard)
    return jax.random.uniform(key, shape, dtype, minval=-1e-4, maxval=1e-4)


def _brick_ids(c_brick, res: int, n_bricks: int, level: int):
    """Brick index per sample for one level: dense when the brick lattice
    fits the table, NGP spatial hash otherwise. c_brick: [3, N] int32."""
    bpa = ((res - 1) >> 1) + 1  # bricks per axis
    if bpa ** 3 <= n_bricks:
        bid = (c_brick[0] * bpa + c_brick[1]) * bpa + c_brick[2]
    else:
        h = (
            c_brick[0].astype(jnp.uint32) * jnp.uint32(_PRIMES[0])
            ^ c_brick[1].astype(jnp.uint32) * jnp.uint32(_PRIMES[1])
            ^ c_brick[2].astype(jnp.uint32) * jnp.uint32(_PRIMES[2])
        )
        bid = (h % jnp.uint32(n_bricks)).astype(jnp.int32)
    return bid + level * n_bricks


def _split_take(tables, idx):
    """Gather table columns with the take split into independent chunks —
    the DMA engines overlap them (measured 2x vs one take)."""
    M = idx.shape[0]
    k = M // _GATHER_SPLITS
    if k * _GATHER_SPLITS != M:
        return jnp.take(tables, idx, axis=1)
    parts = [
        jnp.take(tables, idx[j * k: (j + 1) * k], axis=1)
        for j in range(_GATHER_SPLITS)
    ]
    return jnp.concatenate(parts, axis=1)


# Backward-scatter payload trimming. The XLA scatter emitter is BYTE-bound
# at production column widths (~45 GB/s of payload in every formulation,
# scripts/exp_scatter2.py / exp_scatter3.py), so the grad path shrinks the
# payload instead of reformulating the scatter:
#   * the last 5 of 32 brick rows (per feature) are structural zero padding
#     — slice them off before the scatter, pad the result after;
#   * the cotangent is ALREADY bf16-valued (the forward gathers a bf16
#     shadow of the table), so a bf16 scatter loses nothing in the payload;
#     only the accumulation narrows. The scattered levels are the hashed
#     FINE levels (coarse dense levels ride the one-hot MXU path with f32
#     MXU accumulation), where brick sharing is low (~10-25 adds/brick at
#     production shapes) — bf16 accumulation noise there is far below the
#     stochastic-ray gradient noise Adam already absorbs. Flip to False to
#     restore full-f32 accumulation (exact-parity debugging).
SCATTER_BF16 = True

# Backward route decision for the scattered (hashed) levels' table
# gradients — the dominant per-descriptor cost of the train step. Three
# candidates were built and measured in-step at the production config on
# v5e (tpu_runs/exp_step_cuts.log + exp_scatter4.log, 2026-08-19):
#   brick scatter (KEPT) — bf16 column scatter-add of the 27F-row brick
#     cotangents: 29.44 ms/step in-step; 10.73 ms / 27.3 ns/desc in
#     isolation at 393K descriptors.
#   cell-granular scatter (deleted) — compact to the 8F nonzero cell
#     rows, scatter 128-B columns, rebuild bricks with a [27,8,8]
#     incidence contraction: 3.4x fewer payload bytes but the emitter is
#     PER-DESCRIPTOR-floor-bound (~21-27 ns/desc at any width), so the
#     bare scatter only dropped to 8.3 ms and the compact+transform
#     overhead made it 32.25 ms/step — a 2.8 ms in-step LOSS. (The
#     compaction survives in tp_gather_cols_a2a, where it shrinks the
#     all_to_all ICI payload — a real byte-bound channel.)
#   Pallas sorted segsum (deleted) — sort by brick column + per-tile
#     one-hot MXU accumulation, zero scatters: the kernel itself cost
#     ~2.2 ms, but XLA's sort+permute pre-pass cost 10.2 ms (~26
#     ns/desc — the SAME per-descriptor floor; on this chip every
#     reordering primitive except plain gathers sits at it). 32.0
#     ms/step. The kernel lived at ops/scatter_pallas.py (deleted with
#     its tests, 2026-08-19) if ever needed for pre-sorted inputs.


def _cell_incidence():
    """[27, 8, 8] 0/1 tensor: brick entry e receives cell-corner q of the
    cell at pattern p iff e = (loc+d) axis-wise (q=(di,dj,dk), p=loc bits)."""
    R = [[[0.0] * 8 for _ in range(8)] for _ in range(27)]
    for p in range(8):
        lx, ly, lz = (p >> 2) & 1, (p >> 1) & 1, p & 1
        for q in range(8):
            di, dj, dk = (q >> 2) & 1, (q >> 1) & 1, q & 1
            e = ((lx + di) * 3 + (ly + dj)) * 3 + (lz + dk)
            R[e][p][q] = 1.0
    return jnp.asarray(R)


def _compact_to_cell(g, loc, F):
    """[>=27F, M] brick-column cotangent -> [8F, M] cell rows by three
    axis shift-selects on the base-corner bits (dropped rows are zero)."""
    M = g.shape[1]
    t = g[: _BRICK * F].reshape(3, 3, 3, F, M)
    bx = loc[0].astype(bool)[None, None, None, None]
    by = loc[1].astype(bool)[None, None, None, None]
    bz = loc[2].astype(bool)[None, None, None, None]
    t = jnp.where(bx, t[1:3], t[0:2])  # [2, 3, 3, F, M]
    t = jnp.where(by, t[:, 1:3], t[:, 0:2])  # [2, 2, 3, F, M]
    t = jnp.where(bz, t[:, :, 1:3], t[:, :, 0:2])  # [2, 2, 2, F, M]
    return t.reshape(8 * F, M)


@functools.lru_cache(maxsize=None)
def _gather_scattered(n_bricks: int, base_col: int):
    """Brick-column gather for the SCATTERED levels, with mixed-precision
    autodiff: the forward gathers a bf16 SHADOW of the f32 table (halves
    descriptor payloads — measured 2x); the backward is a plain bf16
    column scatter-add of the 27F-row brick cotangents over the
    scattered-level span (the measured winner — see the route-decision
    note above). idx must hold the scattered levels' global column ids
    (the suffix [base_col, total_cols) of the table, level-major); loc
    their [3, M] base-corner bits (non-differentiable, kept for interface
    stability with the TP gathers). Linear in ``tables``, so the custom
    VJP is exact up to the accumulation dtype."""

    @jax.custom_vjp
    def gather(tables, idx, loc):
        return _split_take(tables.astype(jnp.bfloat16), idx)

    def fwd(tables, idx, loc):
        return gather(tables, idx, loc), (idx, tables.shape)

    def bwd(res, g):
        idx, shape = res
        rows, total_cols = shape
        F = rows // _BRICK_PAD
        real = _BRICK * F
        acc = jnp.bfloat16 if SCATTER_BF16 else jnp.float32
        grad_s = jnp.zeros((real, total_cols - base_col), acc).at[
            :, idx - base_col
        ].add(g[:real].astype(acc)).astype(jnp.float32)
        grad_s = jnp.concatenate(
            [grad_s, jnp.zeros((rows - real, grad_s.shape[1]), jnp.float32)],
            axis=0,
        )
        if base_col:
            grad_s = jnp.concatenate(
                [jnp.zeros((rows, base_col), jnp.float32), grad_s], axis=1
            )
        return grad_s, None, None

    gather.defvjp(fwd, bwd)
    return gather


@functools.lru_cache(maxsize=None)
def _gather_scattered_phased(n_bricks: int, base_col: int, n_scat: int):
    """`_gather_scattered` with a PHASED backward: each step scatters only
    ONE scattered level's descriptor block (``phase % n_scat`` picks it;
    ``idx`` is level-major, so blocks are contiguous — hash_encode stacks
    ``ids[n_oh:]``). The off levels' table gradients are exactly zero that
    step, i.e. every level trains on exact full-batch gradients at
    1/n_scat rate (Adam's moments bridge the gaps, the same staleness bet
    the distilled proposals already make at refresh_every=16). The payoff:
    the backward scatter — the train step's dominant per-descriptor cost
    (~22-27 ns/descriptor at ANY payload width, tpu_runs/exp_scatter4.log)
    — shrinks 1/n_scat. Quality+speed gated on scripts/exp_gradphase.py
    before any default flip."""

    @jax.custom_vjp
    def gather(tables, idx, loc, phase):
        return _split_take(tables.astype(jnp.bfloat16), idx)

    def fwd(tables, idx, loc, phase):
        return gather(tables, idx, loc, phase), (idx, phase, tables.shape)

    def bwd(res, g):
        idx, phase, shape = res
        rows, total_cols = shape
        F = rows // _BRICK_PAD
        real = _BRICK * F
        acc = jnp.bfloat16 if SCATTER_BF16 else jnp.float32
        n = idx.shape[0] // n_scat
        start = (phase.astype(jnp.int32) % n_scat) * n
        idx_l = jax.lax.dynamic_slice_in_dim(idx, start, n)
        g_l = jax.lax.dynamic_slice_in_dim(
            g[:real].astype(acc), start, n, axis=1
        )
        grad_s = jnp.zeros((real, total_cols - base_col), acc).at[
            :, idx_l - base_col
        ].add(g_l).astype(jnp.float32)
        grad_s = jnp.concatenate(
            [grad_s, jnp.zeros((rows - real, grad_s.shape[1]), jnp.float32)],
            axis=0,
        )
        if base_col:
            grad_s = jnp.concatenate(
                [jnp.zeros((rows, base_col), jnp.float32), grad_s], axis=1
            )
        return grad_s, None, None, None

    gather.defvjp(fwd, bwd)
    return gather


# backward-compaction capacity: scatter slots per device = slack * N / D
# rounded up to a lane multiple. Hashed brick ids are uniform over the
# table, so per-shard descriptor counts concentrate tightly around N / D;
# 1.5x absorbs the statistical spread plus boundary-straddling dense
# levels. A (compiled-but-rarely-taken) lax.cond falls back to the full
# masked scatter if a shard ever owns more than cap descriptors.
_TP_BWD_SLACK = 1.5


@functools.lru_cache(maxsize=None)
def _tp_gather_cols(axis_name: str, n_shards: int):
    """Tensor-parallel brick gather for COLUMN-SHARDED tables.

    Inside a ``shard_map`` over mesh axis ``axis_name``, each device holds a
    contiguous column slice of the table; it gathers the indices it owns
    (others masked to zero) and the full feature columns are reassembled
    with one ``psum`` over ICI. The backward scatters cotangents into the
    local shard only — table gradients need NO cross-device traffic — and
    COMPACTS to the owned descriptors first (stable argsort of the
    ownership mask + a capped take), so each shard scatters ~N/D
    descriptors instead of walking all N: the backward scatter, the
    dominant per-descriptor cost (~17-26 ns each, scripts/exp_scatter2.py),
    scales with the model axis.

    Scaling analysis: the FORWARD still walks the full index list per
    device (features must be reassembled in ray order, and a descriptor
    unsort costs the same as the gather it would save), so fwd encode time
    does not shrink with the model axis — ray data-parallelism is what
    scales it. The model axis scales table MEMORY (hash tables + Adam
    state split 1/m) and now also the backward scatter.
    """

    @jax.custom_vjp
    def gather(local_tables, idx, loc):
        li = idx - jax.lax.axis_index(axis_name) * local_tables.shape[1]
        own = (li >= 0) & (li < local_tables.shape[1])
        cols = _split_take(
            local_tables.astype(jnp.bfloat16),
            jnp.clip(li, 0, local_tables.shape[1] - 1),
        )
        cols = cols * own.astype(cols.dtype)[None, :]
        return jax.lax.psum(cols, axis_name)

    def fwd(local_tables, idx, loc):
        return gather(local_tables, idx, loc), (idx, loc, local_tables.shape)

    def bwd(res, g):
        idx, loc, shape = res
        n = idx.shape[0]
        F = shape[0] // _BRICK_PAD
        li = idx - jax.lax.axis_index(axis_name) * shape[1]
        own = (li >= 0) & (li < shape[1])
        # same payload trimming as the single-chip path: the cotangent is
        # bf16-valued, pad rows are structural zeros. The local scatter is
        # the plain 27F-row brick scatter — the cell-granular compaction
        # measured as an in-step LOSS on the per-descriptor-floor-bound
        # emitter (see the route-decision note above); it survives only in
        # tp_gather_cols_a2a, whose all_to_all payload is byte-bound.
        acc = jnp.bfloat16 if SCATTER_BF16 else jnp.float32
        real = _BRICK * F
        pad = jnp.zeros((shape[0] - real, shape[1]), jnp.float32)
        cap = min(-(-int(n * _TP_BWD_SLACK / n_shards) // 128) * 128, n)

        gf = g[:real].astype(acc)
        tgt_all = jnp.clip(li, 0, shape[1] - 1)
        out_cols = shape[1]

        def compact(_):
            # stable argsort of the (negated) ownership mask lists owned
            # descriptor positions first, in original order
            order = jnp.argsort(~own, stable=True)
            sel = order[:cap]
            valid = own[sel]
            gl = jnp.take(gf, sel, axis=1) * valid.astype(acc)[None]
            tgt = jnp.take(tgt_all, sel)
            return jnp.zeros((gf.shape[0], out_cols), acc).at[:, tgt].add(gl)

        def full(_):
            gl = gf * own.astype(acc)[None, :]
            return jnp.zeros((gf.shape[0], out_cols), acc).at[
                :, tgt_all
            ].add(gl)

        if cap >= n:
            grad = full(None)
        else:
            grad = jax.lax.cond(jnp.sum(own) <= cap, compact, full, None)
        return jnp.concatenate(
            [grad.astype(jnp.float32), pad], axis=0
        ), None, None

    gather.defvjp(fwd, bwd)
    return gather


@functools.lru_cache(maxsize=None)
def _tp_onehot_slab(axis_name: str, g0: int, n_cols: int,
                    sharded_samples: bool = False):
    """Replicate the dense-level column range [g0, g0+n_cols) on the fly
    (for the one-hot MXU encode path under tensor parallelism).

    The coarse dense levels are tiny (<= _ONEHOT_MAX_BRICKS columns,
    ~0.5 MB) but their descriptors are SPATIALLY CLUSTERED — under
    contiguous column sharding they would all land on one shard and skew
    the masked gather/scatter. Materializing the slab with one small psum
    removes those descriptors from the sharded path entirely and keeps the
    one-hot matmul (zero gather/scatter descriptors) available under TP.

    Contract matches _tp_gather_cols: forward psum-replicates; backward
    takes the (model-axis-replicated) cotangent and writes only the owned
    columns into the local shard — no collective, no scaling.

    ``sharded_samples``: descriptor-sharded mode (tp_gather_cols_a2a) —
    each model-axis device encodes DIFFERENT samples, so the slab
    cotangents differ per device and the backward must psum them over the
    model axis before writing the owned columns (one [32F, n_cols] psum,
    ~0.5 MB).
    """

    @jax.custom_vjp
    def slab(local_tables):
        c_local = local_tables.shape[1]
        li = g0 + jnp.arange(n_cols) \
            - jax.lax.axis_index(axis_name) * c_local
        own = (li >= 0) & (li < c_local)
        cols = jnp.take(
            local_tables, jnp.clip(li, 0, c_local - 1), axis=1
        ) * own.astype(local_tables.dtype)[None, :]
        return jax.lax.psum(cols, axis_name)

    def fwd(local_tables):
        return slab(local_tables), local_tables.shape

    def bwd(shape, g):
        c_local = shape[1]
        ax = jax.lax.axis_index(axis_name)
        if sharded_samples:
            g = jax.lax.psum(g, axis_name)
        # local column j holds global id ax*c_local + j; it receives slab
        # entry rel = ax*c_local + j - g0 when that lies inside the slab
        j = jnp.arange(c_local)
        rel = ax * c_local + j - g0
        own = (rel >= 0) & (rel < n_cols)
        upd = jnp.take(
            g.astype(jnp.float32), jnp.clip(rel, 0, n_cols - 1), axis=1
        ) * own.astype(jnp.float32)[None, :]
        return (upd,)

    slab.defvjp(fwd, bwd)
    return slab


# Per-(source, owner) request-capacity slack for the all_to_all gather.
# Hashed brick ids are uniform over columns, so a device's M-descriptor
# slice sends ~M/D requests to each owner; 2.0x absorbs spread plus the
# dense-level spatial clustering that survives above _ONEHOT_MAX_BRICKS.
_TP_A2A_SLACK = 2.0


def a2a_route_stats(idx, n_cols_total: int, n_shards: int):
    """Host-side mirror of tp_gather_cols_a2a's routing capacity math.

    Returns ``{"cap", "max_rank", "overflow"}`` for one device's local
    descriptor slice ``idx`` against column count ``n_cols_total`` split
    over ``n_shards`` — the diagnostic the production-shape mesh test uses
    to verify whether the _TP_A2A_SLACK capacity actually binds (and hence
    whether the lax.cond fallback engages) at real table geometry.
    """
    import numpy as _np

    idx = _np.asarray(idx)
    c_local = n_cols_total // n_shards
    M = idx.shape[0]
    owner = idx // c_local
    cap = min(-(-int(M * _TP_A2A_SLACK / n_shards) // 128) * 128, M)
    counts = _np.bincount(owner, minlength=n_shards)
    max_rank = int(counts.max())
    return {"cap": int(cap), "max_rank": max_rank,
            "overflow": bool(max_rank > cap)}


@functools.lru_cache(maxsize=None)
def tp_gather_cols_a2a(axis_name: str, n_shards: int):
    """Descriptor-sharded tensor-parallel brick gather (all_to_all routing).

    PROTOTYPE for the pod-scale 2D sharding (VERDICT round-2 item 8): the
    contract differs from _tp_gather_cols in that the SAMPLE axis is
    sharded over the model axis too — inside the shard_map each device
    passes its LOCAL slice of descriptors (``idx``/``loc`` of length
    M = N_total/D) and receives that slice's columns [32F, M], instead of
    every device walking the full replicated index list.

    Forward: each device routes its index requests to the owning column
    shard with one int all_to_all (fixed per-pair capacity cap ≈
    slack·M/D), the owner gathers the requested columns from its local
    table (~slack·M per-device total requests received), and a second
    all_to_all returns them; a local take unsorts into slice order. Per-
    device TABLE gathers drop from N_total (replicated path) to
    ~slack·N/D, and ICI moves 2×[32F, slack·M] instead of a psum of
    [32F, N] — both scale with the model axis. The residual per-device
    cost is the M-descriptor unsort take from the compact response buffer.

    Backward: the cotangent routes to owners the same way (payload
    compacted to the 8F nonzero cell rows) and each owner
    scatters only what it received (~slack·N/D descriptors).

    Overflow of any per-pair capacity falls back (uniform lax.cond over a
    psum'd predicate) to the exchange-everything path: all_gather the
    indices, masked-gather + psum like _tp_gather_cols, slice. Exact
    either way.
    """
    D = n_shards

    def _route(idx, c_local):
        M = idx.shape[0]
        owner = (idx // c_local).astype(jnp.int32)
        li = idx - owner * c_local
        oh = owner[None, :] == jnp.arange(D, dtype=jnp.int32)[:, None]
        rank = jnp.sum(
            oh * (jnp.cumsum(oh, axis=1) - 1), axis=0, dtype=jnp.int32
        )
        cap = min(-(-int(M * _TP_A2A_SLACK / D) // 128) * 128, M)
        valid = rank < cap
        # invalid slots map out of bounds: scatters drop them
        slot = jnp.where(valid, owner * cap + rank, D * cap)
        return owner, li, rank, cap, valid, slot

    @jax.custom_vjp
    def gather(local_tables, idx, loc):
        c_local = local_tables.shape[1]
        M = idx.shape[0]
        rows = local_tables.shape[0]
        owner, li, rank, cap, valid, slot = _route(idx, c_local)
        overflow = jax.lax.psum(
            jnp.any(~valid).astype(jnp.int32), axis_name
        ) > 0

        def main(_):
            reqs = jnp.full((D * cap + 1,), -1, jnp.int32).at[slot].set(li)
            reqs = jax.lax.all_to_all(
                reqs[: D * cap].reshape(D, cap), axis_name, 0, 0
            ).reshape(D * cap)
            cols = _split_take(
                local_tables.astype(jnp.bfloat16),
                jnp.clip(reqs, 0, c_local - 1),
            ) * (reqs >= 0).astype(jnp.bfloat16)[None, :]
            resp = jax.lax.all_to_all(
                cols.reshape(rows, D, cap), axis_name, 1, 1
            ).reshape(rows, D * cap)
            return jnp.take(
                resp, jnp.where(valid, jnp.clip(slot, 0, D * cap - 1), 0),
                axis=1,
            ) * valid.astype(jnp.bfloat16)[None, :]

        def fallback(_):
            idx_all = jax.lax.all_gather(idx, axis_name, tiled=True)
            li_all = idx_all - jax.lax.axis_index(axis_name) * c_local
            own = (li_all >= 0) & (li_all < c_local)
            cols = _split_take(
                local_tables.astype(jnp.bfloat16),
                jnp.clip(li_all, 0, c_local - 1),
            ) * own.astype(jnp.bfloat16)[None, :]
            full = jax.lax.psum(cols, axis_name)
            return jax.lax.dynamic_slice_in_dim(
                full, jax.lax.axis_index(axis_name) * M, M, axis=1
            )

        return jax.lax.cond(overflow, fallback, main, None)

    def fwd(local_tables, idx, loc):
        return gather(local_tables, idx, loc), (idx, loc, local_tables.shape)

    def bwd(res, g):
        idx, loc, shape = res
        rows, c_local = shape
        M = idx.shape[0]
        F = rows // _BRICK_PAD
        real = _BRICK * F
        acc = jnp.bfloat16 if SCATTER_BF16 else jnp.float32
        owner, li, rank, cap, valid, slot = _route(idx, c_local)
        overflow = jax.lax.psum(
            jnp.any(~valid).astype(jnp.int32), axis_name
        ) > 0

        # cell-granular compaction: the routed cotangent moves over ICI
        # (the all_to_all), a genuinely BYTE-bound channel — compacting to
        # the 8F nonzero cell rows shrinks the payload 3.4x (128 B vs 432
        # at F=8). The brick layout is rebuilt locally per owned column.
        gc = _compact_to_cell(g, loc, F).astype(acc)
        p = (loc[0] * 2 + loc[1]) * 2 + loc[2]
        tcid = li * 8 + p
        out_cols = 8 * c_local

        def main(_):
            pay = jnp.zeros((gc.shape[0], D * cap + 1), acc).at[:, slot].set(
                gc
            )
            cid = jnp.full((D * cap + 1,), -1, jnp.int32).at[slot].set(tcid)
            pay = jax.lax.all_to_all(
                pay[:, : D * cap].reshape(gc.shape[0], D, cap),
                axis_name, 1, 1,
            ).reshape(gc.shape[0], D * cap)
            cid = jax.lax.all_to_all(
                cid[: D * cap].reshape(D, cap), axis_name, 0, 0
            ).reshape(D * cap)
            ok = (cid >= 0).astype(acc)
            return jnp.zeros((gc.shape[0], out_cols), acc).at[
                :, jnp.clip(cid, 0, out_cols - 1)
            ].add(pay * ok[None, :])

        def fallback(_):
            g_all = jax.lax.all_gather(gc, axis_name, axis=1, tiled=True)
            t_all = jax.lax.all_gather(tcid, axis_name, tiled=True)
            # li is OWNER-relative (always in [0, c_local)); ownership is
            # owner == this shard, not a range test on li
            own_all = jax.lax.all_gather(
                owner, axis_name, tiled=True
            ) == jax.lax.axis_index(axis_name)
            return jnp.zeros((gc.shape[0], out_cols), acc).at[
                :, jnp.clip(t_all, 0, out_cols - 1)
            ].add(g_all * own_all.astype(acc)[None, :])

        grad = jax.lax.cond(overflow, fallback, main, None)
        cellr = grad.astype(jnp.float32).reshape(8, F, c_local, 8)
        grad = jnp.einsum("qfcp,epq->efc", cellr, _cell_incidence())
        grad = grad.reshape(real, c_local)
        pad = jnp.zeros((rows - real, c_local), jnp.float32)
        return jnp.concatenate(
            [grad.astype(jnp.float32), pad], axis=0
        ), None, None

    gather.defvjp(fwd, bwd)
    return gather


def hash_encode(tables, x, config: HashGridConfig,
                model_axis: Optional[str] = None,
                descriptor_sharding: bool = False,
                grad_phase=None):
    """Encode points with the multiresolution brick grid.

    Args:
      tables: [32*F, L*NB] table (see init_tables); when ``model_axis`` is
        set, the LOCAL column shard of it inside a shard_map over that mesh
        axis (tensor-parallel tables — see _tp_gather_cols).
      x: [..., 3] positions in the unit cube [0, 1]^3 (values outside are
        clamped; callers apply scene contraction first).
      descriptor_sharding: with ``model_axis``, route table lookups through
        the all_to_all gather (tp_gather_cols_a2a) instead of the
        replicated-index masked gather: callers then pass each device ITS
        OWN samples (the sample axis is sharded over the model axis too)
        and per-device descriptor work scales ~1/D. One-hot dense levels
        psum their table cotangents over the model axis in this mode.
      grad_phase: optional traced int32 step counter. When set (single-chip
        path only, >1 scattered level), the backward scatters just the
        ``grad_phase % n_scattered``-th scattered level's descriptors —
        exact per-level table gradients at 1/n_scattered rate for
        1/n_scattered of the dominant scatter cost (_gather_scattered_phased).

    Returns:
      [..., L*F] encoded features (f32), feature-within-level minor
      (level l, feature f at output column l*F + f).
    """
    batch_shape = x.shape[:-1]
    n = math.prod(batch_shape) if batch_shape else 1
    L = config.n_levels
    F = config.features_per_level
    NB = config.bricks_per_level

    # [3, N] with the big axis minor-most from here on
    xt = jnp.clip(x.reshape(-1, 3).astype(jnp.float32), 0.0, 1.0).T
    res_list = config.resolutions

    ids = []  # L x [N]
    fr = []  # L x [3, N] fractional offsets
    loc = []  # L x [3, N] in-brick base corner (0 or 1 per axis)
    for l, res in enumerate(res_list):
        xs = xt * float(res)
        c = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, res - 1)
        fr.append(xs - jnp.floor(xs))
        loc.append(c & 1)
        ids.append(_brick_ids(c >> 1, res, NB, l))
    frac = jnp.stack(fr, 1)  # [3, L, N]
    local = jnp.stack(loc, 1)  # [3, L, N]

    # tiny dense levels (a prefix — resolutions ascend) go through a one-hot
    # MXU matmul: no gather/scatter descriptors fwd or bwd (see
    # _ONEHOT_MAX_BRICKS note). Everything else takes the brick gather.
    # Under TP, the dense level's columns are psum-replicated on the fly
    # (~0.5 MB — see _tp_onehot_slab): dense descriptors are spatially
    # clustered and would skew the sharded path, and the one-hot matmul is
    # free of gather/scatter descriptors either way.
    n_oh = 0
    for l, res in enumerate(res_list):
        bpa = ((res - 1) >> 1) + 1
        if bpa**3 <= min(NB, _ONEHOT_MAX_BRICKS):
            n_oh = l + 1
        else:
            break
    n_shards = 1
    if model_axis is not None:
        n_shards = (L * NB) // tables.shape[1]
    parts = []
    for l in range(n_oh):
        bpa = ((res_list[l] - 1) >> 1) + 1
        B_l = bpa**3
        if model_axis is not None:
            sub = _tp_onehot_slab(
                model_axis, l * NB, B_l, descriptor_sharding
            )(tables).astype(jnp.bfloat16)
        else:
            sub = tables[:, l * NB: l * NB + B_l].astype(jnp.bfloat16)
        oh = (
            (ids[l] - l * NB)[None, :] == jnp.arange(B_l)[:, None]
        ).astype(jnp.bfloat16)  # [B_l, N]
        parts.append(
            jax.lax.dot_general(
                sub, oh, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)
        )
    if n_oh < L:
        idx = jnp.stack(ids[n_oh:]).reshape(-1)  # [(L - n_oh) * N]
        loc_s = local[:, n_oh:, :].reshape(3, -1)
        if model_axis is not None and descriptor_sharding:
            parts.append(
                tp_gather_cols_a2a(model_axis, n_shards)(tables, idx, loc_s)
            )
        elif model_axis is not None:
            parts.append(
                _tp_gather_cols(model_axis, n_shards)(tables, idx, loc_s)
            )
        elif grad_phase is not None and (L - n_oh) > 1:
            parts.append(
                _gather_scattered_phased(NB, n_oh * NB, L - n_oh)(
                    tables, idx, loc_s, grad_phase
                )
            )
        else:
            parts.append(
                _gather_scattered(NB, n_oh * NB)(tables, idx, loc_s)
            )
    cols = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)
    # [32*F, L*N] bf16, level-major (one-hot levels are the prefix)
    g = cols.reshape(_BRICK_PAD, F, L * n).astype(jnp.float32)

    # separable trilinear weights on the 3x3x3 brick lattice:
    # w_axis[i] = (1-f)*d(i=lo) + f*d(i=lo+1), i in {0,1,2}
    i3 = jnp.arange(3, dtype=jnp.int32)
    w_ax = []
    for a in range(3):
        lo = local[a].reshape(1, -1)  # [1, L*N]
        f = frac[a].reshape(1, -1)
        w = (i3[:, None] == lo) * (1.0 - f) + (i3[:, None] == lo + 1) * f
        w_ax.append(w)  # [3, L*N]
    # W[(i*3+j)*3+k] = wx[i]*wy[j]*wz[k], padded to 32 rows
    W = (
        w_ax[0][:, None, None, :]
        * w_ax[1][None, :, None, :]
        * w_ax[2][None, None, :, :]
    ).reshape(_BRICK, -1)  # [27, L*N]
    W = jnp.concatenate(
        [W, jnp.zeros((_BRICK_PAD - _BRICK, W.shape[1]), W.dtype)], axis=0
    )

    out = jnp.sum(g * W[:, None, :], axis=0)  # [F, L*N]
    # -> [N, L*F] with feature minor within level
    out = out.reshape(F, L, n).transpose(2, 1, 0).reshape(
        batch_shape + (L * F,)
    )
    return out


def contract(x, order: float = jnp.inf):
    """MipNeRF-360 scene contraction: maps R^3 into the ball of radius 2.

    Used by the nerfacto-family fields for unbounded scenes (reference
    consumes it via nerfstudio's SceneContraction [upstream], SURVEY.md N7).
    """
    norm = jnp.linalg.norm(x, ord=order, axis=-1, keepdims=True) if order != jnp.inf else jnp.max(
        jnp.abs(x), axis=-1, keepdims=True
    )
    norm = jnp.clip(norm, 1e-7)
    return jnp.where(norm <= 1.0, x, (2.0 - 1.0 / norm) * x / norm)


def contract_to_unit_cube(x, order: float = jnp.inf):
    """Contraction composed with the affine map of [-2, 2]^3 onto [0, 1]^3."""
    return (contract(x, order) + 2.0) * 0.25


def normalize_to_unit_cube(x, aabb_min, aabb_max):
    """Affine map of an axis-aligned bounding box onto [0, 1]^3 (bounded scenes)."""
    return (x - aabb_min) / (aabb_max - aabb_min)
