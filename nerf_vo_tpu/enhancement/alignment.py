"""Scale/shift alignment of dense prior depth to sparse VO patch depths.

Behavior-parity rewrite of the reference's enhancement math
(nerf_vo/enhancement/enhancement_module.py:41-118):
  * patch outlier removal keeping the middle 10/12 inverse-depth quantiles
    (``dpvo_remove_outliers``, enhancement_module.py:130-146),
  * patch centers ``[:, :, 1, 1]`` x4 to full-res pixels, inverse -> depth,
    clip 0..5 (enhancement_module.py:68-71),
  * per-frame scale = std(patch depth) / std(sampled dense depth) and
    mean-matching shift (enhancement_module.py:82-96),
  * aligned dense depth clipped to 0..5 (enhancement_module.py:97-98),
  * normals decoded ``normalize(n * 2 - 1)`` (enhancement_module.py:102-104).

Pure jnp, vmapped over keyframes; masks replace boolean indexing so the whole
alignment jits with static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

MAX_DEPTH = 5.0


def patch_outlier_mask(patch_invd, low_q: float = 1.0 / 12.0,
                       high_q: float = 11.0 / 12.0):
    """[P] inverse depths -> bool mask keeping the middle quantiles."""
    lo = jnp.quantile(patch_invd, low_q)
    hi = jnp.quantile(patch_invd, high_q)
    return (patch_invd >= lo) & (patch_invd <= hi)


def _sample_bilinear(img, xy):
    """img [H, W], xy [P, 2] full-res pixel coords -> [P] values."""
    H, W = img.shape
    x = jnp.clip(xy[:, 0], 0.0, W - 1.001)
    y = jnp.clip(xy[:, 1], 0.0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    v = (
        img[y0, x0] * (1 - fx) * (1 - fy)
        + img[y0, x0 + 1] * fx * (1 - fy)
        + img[y0 + 1, x0] * (1 - fx) * fy
        + img[y0 + 1, x0 + 1] * fx * fy
    )
    return v


def align_frame(dense_depth, patch_xy4, patch_invd):
    """Align one frame's dense prior depth to its sparse patch depths.

    Args:
      dense_depth: [H, W] raw prior depth (arbitrary scale, e.g. [0, 1]).
      patch_xy4: [P, 2] patch centers at 1/4 feature resolution.
      patch_invd: [P] patch inverse depths.

    Returns: (aligned_depth [H, W] in [0, MAX_DEPTH], scale, shift).
    """
    mask = patch_outlier_mask(patch_invd)
    patch_depth = jnp.clip(1.0 / jnp.clip(patch_invd, 1e-6), 0.0, MAX_DEPTH)
    xy_full = patch_xy4 * 4.0
    sampled = _sample_bilinear(dense_depth, xy_full)

    def masked_stats(v, m):
        n = jnp.clip(jnp.sum(m), 1.0)
        mean = jnp.sum(v * m) / n
        var = jnp.sum((v - mean) ** 2 * m) / n
        return mean, jnp.sqrt(var)

    m = mask.astype(jnp.float32)
    mu_p, sd_p = masked_stats(patch_depth, m)
    mu_s, sd_s = masked_stats(sampled, m)
    scale = sd_p / jnp.clip(sd_s, 1e-6)
    shift = mu_p - scale * mu_s
    aligned = jnp.clip(dense_depth * scale + shift, 0.0, MAX_DEPTH)
    return aligned, scale, shift


align_frames = jax.jit(jax.vmap(align_frame))


def decode_normals(raw_normals):
    """[..., 3] in [0, 1] -> unit camera-frame normals
    (reference enhancement_module.py:102-104)."""
    n = raw_normals * 2.0 - 1.0
    return n / jnp.clip(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-6)
