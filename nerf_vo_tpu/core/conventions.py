"""Coordinate-convention transforms, centralized.

The reference scatters at least four interacting frame conventions across the
codebase (OpenCV camera frames from tracking/datasets, OpenGL frames for the
nerfstudio mapper, Instant-NGP's cycled axes, and a gauge-fixed world frame):
  * nerf_vo/enhancement/enhancement_module.py:117-118  (OpenCV->OpenGL flip)
  * evaluation/nerf_renderer.py:244-252,311-316        (NGP axis cycling)
  * nerf_vo/mapping/nerfstudio_utils.py:189-199        (gauge normalization)
SURVEY.md §7.3(6) calls for ONE property-tested module. This is it.

All transforms take/return camera-to-world 4x4 matrices unless noted.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Sign pattern turning an OpenCV camera frame (+y down, +z forward) into an
# OpenGL camera frame (+y up, -z forward) and vice versa.  Expressed as an
# elementwise column flip (exact — avoids matmul rounding on TPU).
_GL_COLS = jnp.asarray([1.0, -1.0, -1.0, 1.0])


def opencv_to_opengl(c2w):
    """cam2world with OpenCV camera axes -> OpenGL camera axes.

    Equivalent to the reference's in-place ``extrinsics[:, :3, 1:3] *= -1``.
    """
    return c2w * _GL_COLS


def opengl_to_opencv(c2w):
    return c2w * _GL_COLS  # involution: same flip both ways


def nerf_to_ngp(c2w, scale: float = 1.0, offset=(0.5, 0.5, 0.5)):
    """OpenGL-convention cam2world -> NGP's cycled, scaled, offset frame.

    Mirrors the pose cycling the reference applies when talking to pyngp
    (evaluation/nerf_renderer.py:244-252): rows are cycled ``[[1, 2, 0]]``
    (so world axes (x,y,z) -> (y,z,x), making +z "up") and positions mapped
    into the unit-cube-centred NGP world.
    """
    out = c2w[..., jnp.asarray([1, 2, 0, 3]), :]
    out = out.at[..., :3, 3].set(out[..., :3, 3] * scale + jnp.asarray(offset))
    return out


def ngp_to_nerf(c2w, scale: float = 1.0, offset=(0.5, 0.5, 0.5)):
    """Inverse of :func:`nerf_to_ngp` (reference row cycle ``[[2, 0, 1]]``)."""
    out = c2w.at[..., :3, 3].set((c2w[..., :3, 3] - jnp.asarray(offset)) / scale)
    return out[..., jnp.asarray([2, 0, 1, 3]), :]


def gauge_normalization_matrix(first_c2w, fixed_gauge=None):
    """World-frame anchor: matrix N with N @ first_c2w == fixed_gauge.

    The online mapper multiplies every incoming keyframe pose by N so the first
    keyframe sits at a canonical pose regardless of the tracker's arbitrary
    origin (reference: nerf_vo/mapping/nerfstudio_utils.py:189-199).
    """
    if fixed_gauge is None:
        fixed_gauge = jnp.eye(4, dtype=first_c2w.dtype)
    return apply_transform(fixed_gauge, jnp.linalg.inv(first_c2w))


def apply_transform(transform, c2w):
    """Left-apply a world-frame 4x4 transform to cam2world pose(s)."""
    return jnp.matmul(transform, c2w, precision=jax.lax.Precision.HIGHEST)
