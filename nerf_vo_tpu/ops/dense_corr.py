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
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def build_corr_pyramid(fmap_i, fmap_j, num_levels: int = 4):
    """All-pairs correlation pyramid for a batch of edges.

    Args:
      fmap_i: [E, h, w, C] source features.
      fmap_j: [E, h, w, C] target features.

    Returns: list of [E, h*w, h/2^l, w/2^l] volumes, l = 0..num_levels-1.
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
    return pyramid


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


@functools.partial(jax.jit, static_argnames=("radius",))
def corr_lookup(pyramid: Sequence[jnp.ndarray], coords, radius: int = 3):
    """Pyramid neighborhood lookup at per-pixel correspondences.

    Args:
      pyramid: list of [E, h*w, hl, wl] volumes.
      coords: [E, h, w, 2] (x, y) correspondence estimates at level 0.

    Returns: [E, h, w, L * (2r+1)^2] correlation features.
    """
    E, h, w, _ = coords.shape
    P = h * w
    D = 2 * radius + 1
    dx = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    offs = jnp.stack(jnp.meshgrid(dx, dx, indexing="xy"), -1).reshape(
        1, 1, D * D, 2
    )
    c0 = coords.reshape(E, P, 1, 2)
    out = []
    for l, vol in enumerate(pyramid):
        c = c0 / (2.0**l) + offs
        out.append(_bilinear_volume_gather(vol, c))  # [E, P, D*D]
    return jnp.concatenate(out, axis=-1).reshape(E, h, w, -1)
