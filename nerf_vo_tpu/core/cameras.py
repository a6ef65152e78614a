"""Pinhole camera model, distortion, and ray generation — pure JAX.

Centralizes the camera math that the reference scatters across
nerf_vo/data/data_utils.py:24-34 (intrinsics scaling), the nerfstudio
``Cameras``/``RayGenerator`` machinery (nerf_vo/mapping/nerfstudio_utils.py:90-107,
295-300), and DPVO's ``[fx, fy, cx, cy]`` tensors (nerf_vo/tracking/dpvo.py:50-55).

Intrinsics are 4-vectors ``[fx, fy, cx, cy]`` in pixels. Pixel coordinates are
``(x, y)`` with the origin at the top-left corner; a pixel center is at
``(x + 0.5, y + 0.5)``.

Two camera-frame conventions exist in the system (see core/conventions.py):
  * OpenCV: +x right, +y down, +z forward (tracking / datasets)
  * OpenGL: +x right, +y up,  -z forward (NeRF mapping)
Ray generation here takes an explicit ``convention`` argument instead of
implicitly flipping poses the way the reference does
(nerf_vo/enhancement/enhancement_module.py:117-118).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nerf_vo_tpu.core import lie


def scale_intrinsics(intrinsics, from_hw, to_hw):
    """Rescale [fx, fy, cx, cy] from resolution ``from_hw`` to ``to_hw``.

    Mirrors nerf_vo/data/data_utils.py:24-34.
    """
    fh, fw = from_hw
    th, tw = to_hw
    sx = tw / fw
    sy = th / fh
    scale = jnp.asarray([sx, sy, sx, sy], dtype=jnp.asarray(intrinsics).dtype)
    return jnp.asarray(intrinsics) * scale


def intrinsics_matrix(intrinsics):
    """[..., 4] -> [..., 3, 3] K matrix."""
    intrinsics = jnp.asarray(intrinsics)
    fx, fy, cx, cy = jnp.moveaxis(intrinsics, -1, 0)
    zero = jnp.zeros_like(fx)
    one = jnp.ones_like(fx)
    K = jnp.stack([fx, zero, cx, zero, fy, cy, zero, zero, one], axis=-1)
    return K.reshape(intrinsics.shape[:-1] + (3, 3))


def project(points_cam, intrinsics, convention: str = "opencv"):
    """Project camera-frame 3D points to pixels. Returns (xy[..., 2], depth[...])."""
    x, y, z = jnp.moveaxis(points_cam, -1, 0)
    if convention == "opengl":
        # looking down -z with +y up
        z = -z
        y = -y
    fx, fy, cx, cy = jnp.moveaxis(intrinsics, -1, 0)
    inv_z = 1.0 / jnp.clip(z, 1e-8)
    u = fx * x * inv_z + cx
    v = fy * y * inv_z + cy
    return jnp.stack([u, v], axis=-1), z


def unproject(xy, depth, intrinsics, convention: str = "opencv"):
    """Pixel coords + depth -> camera-frame 3D points."""
    fx, fy, cx, cy = jnp.moveaxis(intrinsics, -1, 0)
    u, v = jnp.moveaxis(xy, -1, 0)
    x = (u - cx) / fx * depth
    y = (v - cy) / fy * depth
    z = depth
    if convention == "opengl":
        y = -y
        z = -z
    return jnp.stack([x, y, z], axis=-1)


def pixel_directions(xy, intrinsics, convention: str = "opencv"):
    """Unit-z (or unit-(-z)) ray directions in the camera frame for pixel coords."""
    fx, fy, cx, cy = jnp.moveaxis(intrinsics, -1, 0)
    u, v = jnp.moveaxis(xy, -1, 0)
    x = (u - cx) / fx
    y = (v - cy) / fy
    one = jnp.ones_like(x)
    if convention == "opengl":
        return jnp.stack([x, -y, -one], axis=-1)
    return jnp.stack([x, y, one], axis=-1)


def generate_rays(cam2world, intrinsics, xy, convention: str = "opengl"):
    """World-frame rays for pixel coordinates.

    Args:
      cam2world: [..., 4, 4] camera-to-world matrices (or broadcastable).
      intrinsics: [..., 4].
      xy: [..., 2] pixel coordinates (add 0.5 yourself for pixel centers).

    Returns:
      (origins[..., 3], directions[..., 3], directions_norm[..., 1])
      ``directions`` are unit-normalized; ``directions_norm`` is the norm of the
      un-normalized (unit-z) direction, needed to convert between euclidean ray
      depth and z-depth (reference: evaluation/nerf_renderer.py:164-166).
    """
    d_cam = pixel_directions(xy, intrinsics, convention)
    R = cam2world[..., :3, :3]
    t = cam2world[..., :3, 3]
    d_world = jnp.einsum(
        "...ij,...j->...i", R, d_cam, precision=jax.lax.Precision.HIGHEST
    )
    norm = jnp.linalg.norm(d_world, axis=-1, keepdims=True)
    d_unit = d_world / jnp.clip(norm, 1e-8)
    origins = jnp.broadcast_to(t, d_unit.shape)
    return origins, d_unit, norm


def generate_rays_se3(pose_c2w, intrinsics, xy, convention: str = "opengl"):
    """Like :func:`generate_rays` but taking SE3 7-vectors instead of matrices."""
    d_cam = pixel_directions(xy, intrinsics, convention)
    d_world = lie.quat_rotate(lie.se3_q(pose_c2w), d_cam)
    norm = jnp.linalg.norm(d_world, axis=-1, keepdims=True)
    d_unit = d_world / jnp.clip(norm, 1e-8)
    origins = jnp.broadcast_to(lie.se3_t(pose_c2w), d_unit.shape)
    return origins, d_unit, norm


def distort_radtan(xy_norm, dist):
    """Apply radial-tangential distortion [k1, k2, p1, p2] to normalized coords."""
    k1, k2, p1, p2 = dist[..., 0], dist[..., 1], dist[..., 2], dist[..., 3]
    x, y = xy_norm[..., 0], xy_norm[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + k1 * r2 + k2 * r2 * r2
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort_radtan(xy_dist, dist, iterations: int = 8):
    """Invert rad-tan distortion by fixed-point iteration (static trip count)."""
    x = xy_dist
    for _ in range(iterations):
        d = distort_radtan(x, dist) - x
        x = xy_dist - d
    return x
