"""Patch correlation lookup over feature pyramids.

TPU-native replacement for DPVO's CUDA ``altcorr`` kernel (reference
submodule N1 [upstream]): for every patch-graph edge, correlate the patch's
3x3 feature grid with a (2r+1)^2 neighborhood of the target frame's feature
map around the reprojected patch coordinates, over a 2-level pyramid.

Design notes (TPU-first — the naive per-sample formulation gathers ~60 GB
per update at production edge counts and is a non-starter):
  * Correlation is LINEAR in the sampled features, so bilinear interpolation
    commutes with the dot product: we gather integer-grid features, contract
    to integer-grid correlation SCALARS on the MXU, and apply the bilinear
    blend to scalars (4 shifted static slices) — cutting gathered bytes by
    the channel width.
  * All 49 window samples of a patch pixel share one fractional offset (the
    window offsets are integers), and the 3x3 patch pixels' windows overlap:
    one shared (2r+4)^2 window per edge covers every (patch pixel, window
    offset, bilinear corner) combination as STATIC sub-slices. Gathered rows
    per edge: 100 instead of 3*3*49*4 = 1764.
  * Patch-grid approximation: the window is anchored at the reprojected patch
    CENTER; patch-pixel offsets are applied as integer pixel shifts in the
    target frame rather than individually reprojected (sub-pixel exact only
    for fronto-parallel motion; the learned update operator absorbs the
    residual — documented delta vs. the CUDA kernel, which reprojects each
    pixel).
  * Tracking is inference-only; edges are processed in fixed-size chunks via
    ``lax.map`` to bound the working set. Static shapes throughout.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def bilinear_gather(fmap, frame_idx, coords):
    """Bilinearly sample per-frame feature maps at fractional coords.

    Args:
      fmap: [N, H, W, C] feature maps.
      frame_idx: [...] int32 frame per sample (broadcastable to coords[...,0]).
      coords: [..., 2] (x, y) in feature-map pixels.

    Returns: [..., C] sampled features (zero outside bounds).
    """
    N, H, W, C = fmap.shape
    x = coords[..., 0]
    y = coords[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)

    out = 0.0
    for dy in (0, 1):
        for dx in (0, 1):
            xi = x0 + dx
            yi = y0 + dy
            w = (fx if dx else 1.0 - fx) * (fy if dy else 1.0 - fy)
            inb = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
            xi = jnp.clip(xi, 0, W - 1)
            yi = jnp.clip(yi, 0, H - 1)
            vals = fmap[frame_idx, yi, xi]
            out = out + vals * (w * inb)[..., None]
    return out


def _level_correlation(fmap, jj, pf, center, radius: int):
    """Integer-window correlation for one pyramid level.

    Args:
      fmap: [N, H, W, C].
      jj: [E] target frame ids.
      pf: [E, 9, C] patch features (3x3 flattened row-major: p = py*3+px).
      center: [E, 2] reprojected patch centers in THIS level's pixels.

    Returns: [E, 9, D, D] correlation, D = 2*radius+1.

    Gather strategy: per-pixel row gathers via jnp.take in the fmap's native
    dtype (bf16 halves traffic). A wide-slice lax.gather variant was
    measured 30x SLOWER on this backend (lowers to per-index dynamic
    slices); keep take.
    """
    N, H, W, C = fmap.shape
    E = pf.shape[0]
    r = radius
    D = 2 * r + 1
    WIN = 2 * r + 4  # covers patch offsets {-1,0,1} + corners {0,1}

    cx = center[..., 0]
    cy = center[..., 1]
    ix = jnp.floor(cx).astype(jnp.int32) - (r + 1)
    iy = jnp.floor(cy).astype(jnp.int32) - (r + 1)
    fx = cx - jnp.floor(cx)
    fy = cy - jnp.floor(cy)

    wy = jnp.arange(WIN, dtype=jnp.int32)
    wx = jnp.arange(WIN, dtype=jnp.int32)
    gy = iy[:, None, None] + wy[None, :, None]  # [E, WIN, 1]
    gx = ix[:, None, None] + wx[None, None, :]  # [E, 1, WIN]
    inb = (gy >= 0) & (gy < H) & (gx >= 0) & (gx < W)
    gy = jnp.clip(gy, 0, H - 1)
    gx = jnp.clip(gx, 0, W - 1)
    flat_idx = (jj[:, None, None] * H + gy) * W + gx  # [E, WIN, WIN]

    win = jnp.take(
        fmap.reshape(N * H * W, C), flat_idx.reshape(E, WIN * WIN), axis=0
    )  # [E, WIN*WIN, C]
    win = win * inb.reshape(E, WIN * WIN, 1).astype(win.dtype)

    # integer-grid correlation scalars: [E, WIN*WIN, 9]
    cwin = jnp.einsum(
        "ewc,epc->ewp", win, pf.astype(win.dtype),
        preferred_element_type=jnp.float32,
    ).reshape(E, WIN, WIN, 9)

    # bilinear blend on scalars with the center's fractional offset,
    # shifted per patch pixel (static slices)
    w00 = ((1 - fx) * (1 - fy))[:, None, None]
    w10 = (fx * (1 - fy))[:, None, None]
    w01 = ((1 - fx) * fy)[:, None, None]
    w11 = (fx * fy)[:, None, None]
    out = []
    for p in range(9):
        py, px = p // 3, p % 3
        # window index for (patch pixel, output offset o, corner c):
        # px + ox + cx in [0, WIN) with ox in [0, D)
        c00 = cwin[:, py: py + D, px: px + D, p]
        c10 = cwin[:, py: py + D, px + 1: px + 1 + D, p]
        c01 = cwin[:, py + 1: py + 1 + D, px: px + D, p]
        c11 = cwin[:, py + 1: py + 1 + D, px + 1: px + 1 + D, p]
        out.append(w00 * c00 + w10 * c10 + w01 * c01 + w11 * c11)
    return jnp.stack(out, axis=1)  # [E, 9, D, D]


@functools.partial(jax.jit, static_argnames=("radius", "chunk"))
def patch_correlation(
    patch_feats,
    fmap1,
    fmap2,
    jj,
    center,
    radius: int = 3,
    chunk: int = 4096,
):
    """Correlation volume lookup for patch-graph edges.

    Args:
      patch_feats: [E, 3, 3, C] per-edge patch feature grids.
      fmap1: [N, H, W, C] level-0 feature maps (1/4 input res).
      fmap2: [N, H/2, W/2, C] level-1 maps (1/8 input res).
      jj: [E] int32 target frame per edge.
      center: [E, 2] reprojected patch centers in fmap1 pixels.

    Returns: [E, 2 * 9 * (2r+1)^2] correlation features.
    """
    E, _, _, C = patch_feats.shape
    D = 2 * radius + 1
    pad = (-E) % chunk
    pf = jnp.pad(patch_feats, ((0, pad), (0, 0), (0, 0), (0, 0))).reshape(
        -1, chunk, 9, C
    )
    jj_p = jnp.pad(jj, (0, pad)).reshape(-1, chunk)
    ce = jnp.pad(center, ((0, pad), (0, 0))).reshape(-1, chunk, 2)

    def do_chunk(args):
        pf_c, jj_c, ce_c = args
        c1 = _level_correlation(fmap1, jj_c, pf_c, ce_c, radius)
        c2 = _level_correlation(fmap2, jj_c, pf_c, ce_c * 0.5, radius)
        out = jnp.stack([c1, c2], axis=1)  # [chunk, 2, 9, D, D]
        return out.reshape(out.shape[0], -1)

    out = jax.lax.map(do_chunk, (pf, jj_p, ce))
    out = out.reshape(-1, 2 * 9 * D * D)[:E]
    # raw dot products: upstream DPVO scales fmaps by 1/4 at encode instead
    # of normalizing the correlation (models/dpvo_net.py encode)
    return out
