"""Dense all-pairs correlation volumes + pyramid lookup (DROID-SLAM style).

TPU-native replacement for the NeRF-SLAM fork's ``CorrBlock`` /
``AltCorrBlock`` CUDA kernels (reference N3; built/consumed at
nerf_vo/tracking/droid_slam.py:20-23,360,503): for each factor-graph edge
(i, j), the full correlation volume between frame i's and frame j's 1/8-res
feature maps is computed ONCE as a single big matmul (MXU), pooled into a
4-level pyramid, and then per-update lookups gather (2r+1)^2 neighborhoods
around per-pixel correspondence estimates.

Layout notes: volumes are stored ``[E, h*w, hl, wl]`` per level — first the
source pixel (the gather never indexes it dynamically beyond batch), then the
target grid (bilinear neighborhood gathers on the two minor axes).
"""

from __future__ import annotations

import functools
import os as _os
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST

# Lookup formulation (see corr_lookup), in descending speed order — all
# three are exact-equality tested against each other:
#   "blocks" (default) — TWO aligned 8-row block gathers per window
#     (22.0 ms isolated / 19.0 in-step at production shapes,
#     tpu_runs/exp_droid_corr.log + exp_droid_cut_blocks.log);
#   "rows"   — G row gathers per window (42.5 ms isolated);
#   "scalar" — original per-tap scalar gathers (694 ms; the exactness
#     reference).
_CORR_LOOKUP_ROUTE = _os.environ.get("NERF_VO_DENSE_CORR_LOOKUP", "blocks")
if _CORR_LOOKUP_ROUTE not in ("rows", "scalar", "blocks"):
    raise ValueError(
        "NERF_VO_DENSE_CORR_LOOKUP must be 'rows', 'scalar' or 'blocks', "
        f"got {_CORR_LOOKUP_ROUTE!r}"
    )

# Volume storage dtype. DEFAULT bfloat16 (2026-08-21): the window lookup's
# row take is element-byte-bound — bf16 volumes measure 42.4 vs 65.0 ms
# (1.53x) at production DROID shapes (tpu_runs/exp_droid_corr.log) — and
# half-precision correlation is REFERENCE behavior: the upstream
# DROID-SLAM stores feature maps and computes its CorrBlock volumes under
# fp16 autocast (reference droid_slam.py:340,1075 autocast +
# half-precision keyframe feature buffers). The pyramid build einsum
# stays f32 (HIGHEST) and casts at the end; lookups cast back to f32.
_PYRAMID_DTYPE_NAME = _os.environ.get("NERF_VO_CORR_PYRAMID_DTYPE",
                                      "bfloat16")
if _PYRAMID_DTYPE_NAME not in ("float32", "bfloat16"):
    raise ValueError(
        "NERF_VO_CORR_PYRAMID_DTYPE must be 'float32' or 'bfloat16', got "
        f"{_PYRAMID_DTYPE_NAME!r}"
    )
_PYRAMID_DTYPE = jnp.dtype(_PYRAMID_DTYPE_NAME)


def build_corr_pyramid(fmap_i, fmap_j, num_levels: int = 4):
    """All-pairs correlation pyramid for a batch of edges.

    Args:
      fmap_i: [E, h, w, C] source features.
      fmap_j: [E, h, w, C] target features.

    Returns: list of [E, h*w, h/2^l, w/2^l] volumes (``_PYRAMID_DTYPE``),
    l = 0..num_levels-1.
    """
    E, h, w, C = fmap_i.shape
    fi = fmap_i.reshape(E, h * w, C).astype(jnp.float32)
    fj = fmap_j.reshape(E, h * w, C).astype(jnp.float32)
    corr = jnp.einsum("epc,eqc->epq", fi, fj) / jnp.sqrt(
        jnp.asarray(C, jnp.float32)
    )
    corr = corr.reshape(E, h * w, h, w)
    pyramid = [corr]
    for _ in range(num_levels - 1):
        c = pyramid[-1]
        ph = 2 if c.shape[-2] >= 2 else 1  # per-axis pool factor (tiny maps)
        pw = 2 if c.shape[-1] >= 2 else 1
        hl, wl = c.shape[-2] // ph, c.shape[-1] // pw
        c = c[..., : hl * ph, : wl * pw]
        c = c.reshape(E, h * w, hl, ph, wl, pw).mean(axis=(3, 5))
        pyramid.append(c)
    # pooling runs in f32; only the stored volumes are cast (see
    # _PYRAMID_DTYPE — element-byte-bound lookups, upstream fp16 parity)
    return [c.astype(_PYRAMID_DTYPE) for c in pyramid]


def _bilinear_volume_gather(vol, coords):
    """vol [E, P, hl, wl]; coords [E, P, S, 2] (x, y) -> [E, P, S]."""
    E, P, H, W = vol.shape
    x = coords[..., 0]
    y = coords[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    ei = jnp.arange(E)[:, None, None]
    pi = jnp.arange(P)[None, :, None]
    out = 0.0
    for dy in (0, 1):
        for dx in (0, 1):
            xi = x0 + dx
            yi = y0 + dy
            wgt = (fx if dx else 1 - fx) * (fy if dy else 1 - fy)
            inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
            xi = jnp.clip(xi, 0, W - 1)
            yi = jnp.clip(yi, 0, H - 1)
            out = out + vol[ei, pi, yi, xi] * (wgt * inb)
    return out


def _window_volume_gather(vol, coords, radius: int):
    """All (2r+1)^2 bilinear window taps around per-row centers, via row
    gathers instead of per-tap scalar gathers.

    The naive formulation (_bilinear_volume_gather over center+offset
    coords) issues E*P*(2r+1)^2*4 SCALAR gather descriptors — measured
    catastrophic on TPU: 700.9 ms of the DROID update's 790 ms at
    production shapes (tpu_runs/exp_droid_cut.log, 2026-08-21; ~45M
    descriptors at the chip's ~15 ns/desc scalar-gather rate). But every
    integer offset shares ONE fractional part per center, so the union of
    all taps is a (2r+2)^2 integer grid: gather its rows (E*P*(2r+2)
    row descriptors — 24x fewer, each a contiguous [wl] read), select the
    (2r+2) columns with an iota-one-hot einsum (no gather at all), and
    bilinear-combine with 4 shifted adds. Exact same math including the
    out-of-bounds zeroing (OOB rows are masked; OOB columns match no
    one-hot lane).

    vol [E, P, hl, wl]; coords [E, P, 2] (x, y) at this level.
    Returns [E, P, (2r+1)^2].
    """
    E, P, H, W = vol.shape
    D = 2 * radius + 1
    G = D + 1
    x = coords[..., 0]
    y = coords[..., 1]
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    fx = (x - x0f)[..., None, None]
    fy = (y - y0f)[..., None, None]
    bx = x0f.astype(jnp.int32) - radius
    by = y0f.astype(jnp.int32) - radius

    rows = by[..., None] + jnp.arange(G, dtype=jnp.int32)  # [E, P, G]
    rvalid = (rows >= 0) & (rows < H)
    ep = jnp.arange(E * P, dtype=jnp.int32).reshape(E, P)
    ridx = ep[..., None] * H + jnp.clip(rows, 0, H - 1)
    g = jnp.take(vol.reshape(E * P * H, W), ridx, axis=0)  # [E, P, G, W]
    g = g * rvalid[..., None]

    cols = bx[..., None] + jnp.arange(G, dtype=jnp.int32)  # [E, P, G]
    sel = (
        cols[:, :, :, None]
        == jnp.arange(W, dtype=jnp.int32)[None, None, None, :]
    ).astype(vol.dtype)  # [E, P, G, W] one-hot (OOB cols: all-zero row)
    B = jnp.einsum("epgw,epjw->epgj", g, sel)  # [E, P, G(rows), G(cols)]

    b00 = B[:, :, :D, :D]
    b01 = B[:, :, :D, 1:]
    b10 = B[:, :, 1:, :D]
    b11 = B[:, :, 1:, 1:]
    out = ((1 - fy) * (1 - fx) * b00 + (1 - fy) * fx * b01
           + fy * (1 - fx) * b10 + fy * fx * b11)  # [E, P, D(y), D(x)]
    return out.reshape(E, P, D * D)


def _window_volume_gather_blocks(vol, coords, radius: int):
    """Same contract as :func:`_window_volume_gather`, but the G row
    gathers per center collapse to TWO aligned 8-row BLOCK gathers
    (4x fewer descriptors at radius 3 — the rows route measured
    row-take-bound: 40.8 of 42.5 ms, tpu_runs/exp_droid_corr.log).

    The volume is zero-padded by 8 rows on top (so negative window
    starts index real padding, never clipped-wrong rows) and enough on
    the bottom that block0+1 always exists; the wanted G rows are then
    picked out of the 16 gathered rows with an iota-one-hot einsum and
    masked by true row validity.
    """
    E, P, H, W = vol.shape
    D = 2 * radius + 1
    G = D + 1
    # top pad 8; bottom pad so (clip(by)+8)//8 + 1 is always a valid block
    Hp = ((H + 8) // 8 + 2) * 8
    volp = jnp.pad(vol, ((0, 0), (0, 0), (8, Hp - H - 8), (0, 0)))

    x = coords[..., 0]
    y = coords[..., 1]
    x0f = jnp.floor(x)
    y0f = jnp.floor(y)
    fx = (x - x0f)[..., None, None]
    fy = (y - y0f)[..., None, None]
    bx = x0f.astype(jnp.int32) - radius
    by = y0f.astype(jnp.int32) - radius

    byc = jnp.clip(by, -8, H) + 8  # padded-row start, in [0, H+8]
    blk0 = byc // 8  # [E, P]
    ep = jnp.arange(E * P, dtype=jnp.int32).reshape(E, P)
    base = ep * (Hp // 8)
    # two descriptors per window. A one-descriptor variant (pre-pairing
    # adjacent blocks into a doubled buffer) measured WORSE — 25.8 vs
    # 22.0 ms — the per-call 2x pairing materialization costs more than
    # the halved descriptor count saves (2026-08-21).
    bidx = jnp.stack([base + blk0, base + blk0 + 1], axis=-1)  # [E, P, 2]
    g16 = jnp.take(
        volp.reshape(E * P * (Hp // 8), 8 * W), bidx, axis=0
    ).reshape(E, P, 16, W)

    # pick rows (byc % 8) + s, s = 0..G-1, out of the 16
    r0 = byc % 8
    want = r0[..., None] + jnp.arange(G, dtype=jnp.int32)  # [E, P, G]
    sel_r = (
        want[:, :, :, None]
        == jnp.arange(16, dtype=jnp.int32)[None, None, None, :]
    ).astype(vol.dtype)  # [E, P, G, 16]
    g = jnp.einsum("epsr,eprw->epsw", sel_r, g16)  # [E, P, G, W]
    rows = by[..., None] + jnp.arange(G, dtype=jnp.int32)
    g = g * ((rows >= 0) & (rows < H))[..., None]

    cols = bx[..., None] + jnp.arange(G, dtype=jnp.int32)
    sel_c = (
        cols[:, :, :, None]
        == jnp.arange(W, dtype=jnp.int32)[None, None, None, :]
    ).astype(vol.dtype)
    B = jnp.einsum("epgw,epjw->epgj", g, sel_c)

    b00 = B[:, :, :D, :D]
    b01 = B[:, :, :D, 1:]
    b10 = B[:, :, 1:, :D]
    b11 = B[:, :, 1:, 1:]
    out = ((1 - fy) * (1 - fx) * b00 + (1 - fy) * fx * b01
           + fy * (1 - fx) * b10 + fy * fx * b11)
    return out.reshape(E, P, D * D)


@functools.partial(jax.jit, static_argnames=("radius",))
def corr_lookup(pyramid: Sequence[jnp.ndarray], coords, radius: int = 3):
    """Pyramid neighborhood lookup at per-pixel correspondences.

    Args:
      pyramid: list of [E, h*w, hl, wl] volumes.
      coords: [E, h, w, 2] (x, y) correspondence estimates at level 0.

    Returns: [E, h, w, L * (2r+1)^2] correlation features.

    Uses the row-gather window formulation (_window_volume_gather) — the
    per-tap scalar-gather route it replaced cost 700.9 ms/update at
    production DROID shapes. NERF_VO_DENSE_CORR_LOOKUP=scalar restores it
    (exact-equality pinned by tests/test_dense_corr lookup tests).
    """
    E, h, w, _ = coords.shape
    P = h * w
    D = 2 * radius + 1
    c0 = coords.reshape(E, P, 2)
    out = []
    for l, vol in enumerate(pyramid):
        if _CORR_LOOKUP_ROUTE == "scalar":
            dx = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
            offs = jnp.stack(
                jnp.meshgrid(dx, dx, indexing="xy"), -1
            ).reshape(1, 1, D * D, 2)
            out.append(_bilinear_volume_gather(
                vol, c0[:, :, None, :] / (2.0**l) + offs
            ))
        elif _CORR_LOOKUP_ROUTE == "blocks":
            out.append(
                _window_volume_gather_blocks(vol, c0 / (2.0**l), radius)
            )
        else:
            out.append(_window_volume_gather(vol, c0 / (2.0**l), radius))
    return jnp.concatenate(out, axis=-1).reshape(E, h, w, -1)
