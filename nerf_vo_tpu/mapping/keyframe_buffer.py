"""Device-resident keyframe training buffer + in-jit pixel sampling.

TPU-native replacement for the reference's ``DynamicDataset`` /
``DynamicDataManager`` (nerf_vo/mapping/nerfstudio_utils.py:56-311):
preallocated ``[K, ...]`` arrays hold the keyframe stream (color, aligned
depth, normals, poses, intrinsics); tracking inserts keyframes in place; the
trainer samples random pixels over the active prefix each step.

Differences from the reference, by design:
  * No shared-memory torch tensors or CUDA-IPC — buffers are ordinary JAX
    arrays living in HBM, updated with donated ``.at[].set`` writes (XLA
    performs them in place).
  * The pixel sampler + ray generator run INSIDE the jitted train step (a
    couple of gathers), not as a host-side DataManager.
  * Gauge normalization (first keyframe pinned to a canonical pose,
    reference nerfstudio_utils.py:189-199) is applied at insert time.
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp

from nerf_vo_tpu.core import cameras, conventions


@flax.struct.dataclass
class KeyframeBuffer:
    """Pytree of preallocated keyframe arrays. K = max keyframes."""

    intrinsics: jnp.ndarray  # [K, 4] fx fy cx cy
    c2w: jnp.ndarray  # [K, 4, 4] OpenGL-convention camera-to-world
    color: jnp.ndarray  # [K, H, W, 3] f32 in [0, 1]
    depth: jnp.ndarray  # [K, H, W] f32 z-depth (0 = invalid)
    normal: jnp.ndarray  # [K, H, W, 3] f32 camera-frame unit normals
    depth_cov: jnp.ndarray  # [K, H, W] f32 depth variance (1 = unweighted)
    num_active: jnp.ndarray  # [] int32
    normalization: jnp.ndarray  # [4, 4] gauge-fixing world transform

    @property
    def capacity(self) -> int:
        return self.color.shape[0]

    @property
    def hw(self):
        return self.color.shape[1], self.color.shape[2]


def create(num_keyframes: int, height: int, width: int,
           use_normals: bool = True, use_depth_cov: bool = False) -> KeyframeBuffer:
    K, H, W = num_keyframes, height, width
    return KeyframeBuffer(
        intrinsics=jnp.ones((K, 4), jnp.float32),
        c2w=jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (K, 4, 4)),
        color=jnp.zeros((K, H, W, 3), jnp.float32),
        depth=jnp.zeros((K, H, W), jnp.float32),
        normal=jnp.zeros((K, H, W, 3), jnp.float32) if use_normals else jnp.zeros((K, 1, 1, 3), jnp.float32),
        depth_cov=jnp.ones((K, H, W), jnp.float32) if use_depth_cov else jnp.ones((K, 1, 1), jnp.float32),
        num_active=jnp.asarray(0, jnp.int32),
        normalization=jnp.eye(4, dtype=jnp.float32),
    )


def _insert_impl(buffer: KeyframeBuffer, indices, packet: Dict[str, jnp.ndarray]
                 ) -> KeyframeBuffer:
    """Insert/update keyframes at ``indices``.

    packet keys (all leading dim = len(indices)):
      intrinsics [N,4], c2w [N,4,4] (OpenGL cam2world, tracker world frame),
      color [N,H,W,3], optional depth [N,H,W], normal [N,H,W,3],
      depth_cov [N,H,W].

    The first-ever insert sets the gauge normalization from keyframe 0; all
    poses are stored pre-multiplied by it.
    """
    indices = jnp.asarray(indices, jnp.int32)
    first_insert = buffer.num_active == 0
    norm = jax.lax.cond(
        first_insert,
        lambda: conventions.gauge_normalization_matrix(packet["c2w"][0]),
        lambda: buffer.normalization,
    )
    c2w = conventions.apply_transform(norm, packet["c2w"])

    new = buffer.replace(
        intrinsics=buffer.intrinsics.at[indices].set(packet["intrinsics"]),
        c2w=buffer.c2w.at[indices].set(c2w),
        color=buffer.color.at[indices].set(packet["color"]),
        num_active=jnp.maximum(buffer.num_active, jnp.max(indices) + 1),
        normalization=norm,
    )
    if "depth" in packet:
        new = new.replace(depth=new.depth.at[indices].set(packet["depth"]))
    if "normal" in packet and new.normal.shape[1] > 1:
        new = new.replace(normal=new.normal.at[indices].set(packet["normal"]))
    if "depth_cov" in packet and new.depth_cov.shape[1] > 1:
        new = new.replace(depth_cov=new.depth_cov.at[indices].set(packet["depth_cov"]))
    return new


# donated jit: the scatter updates happen in place in HBM instead of copying
# every (potentially multi-hundred-MB) buffer per insert
insert = jax.jit(_insert_impl, donate_argnums=(0,))


def sample_ray_batch(buffer: KeyframeBuffer, pose_deltas, key, num_rays: int,
                     convention: str = "opengl") -> Dict[str, jnp.ndarray]:
    """Sample a training ray batch over the active keyframes (in-jit).

    Equivalent of nerfstudio's PixelSampler + RayGenerator with the
    CameraOptimizer's SE3 deltas composed in
    (reference nerfstudio_utils.py:295-300 + nerfstudio CameraOptimizer
    [upstream]).

    Args:
      pose_deltas: [K, 6] SE3 tangent corrections (the trainable camera-opt
        parameters), or None.

    Returns batch dict for NerfactoModel.loss: origins, directions, rgb,
    depth (euclidean), depth_cov, normal (world frame), camera_indices,
    depth_mask / normal_mask.
    """
    from nerf_vo_tpu.core import lie  # local import to avoid cycles

    H, W = buffer.hw
    k1, k2, k3 = jax.random.split(key, 3)
    n_active = jnp.maximum(buffer.num_active, 1)
    frame = jax.random.randint(k1, (num_rays,), 0, n_active)
    py = jax.random.randint(k2, (num_rays,), 0, H)
    px = jax.random.randint(k3, (num_rays,), 0, W)

    c2w = buffer.c2w[frame]
    if pose_deltas is not None:
        delta = lie.se3_matrix(lie.se3_exp(pose_deltas[frame]))
        c2w = conventions.apply_transform(delta, c2w)
    intr = buffer.intrinsics[frame]
    xy = jnp.stack([px, py], axis=-1).astype(jnp.float32) + 0.5
    origins, dirs, dirs_norm = cameras.generate_rays(c2w, intr, xy, convention)

    rgb = buffer.color[frame, py, px]
    depth_z = buffer.depth[frame, py, px]
    depth = depth_z * dirs_norm[..., 0]  # euclidean ray distance
    batch = {
        "origins": origins,
        "directions": dirs,
        "directions_norm": dirs_norm[..., 0],
        "rgb": rgb,
        "camera_indices": frame,
        "depth": depth,
        "depth_mask": depth_z > 0,
    }
    if buffer.normal.shape[1] > 1:
        n_cam = buffer.normal[frame, py, px]
        # rotate camera-frame normals to world (reference rotates with
        # solve(R, n): nerfstudio_utils.py:122-129)
        n_world = jnp.einsum("rij,rj->ri", c2w[:, :3, :3], n_cam,
                             precision=jax.lax.Precision.HIGHEST)
        batch["normal"] = n_world
        batch["normal_mask"] = jnp.sum(n_cam * n_cam, axis=-1) > 1e-6
    if buffer.depth_cov.shape[1] > 1:
        batch["depth_cov"] = buffer.depth_cov[frame, py, px]
    return batch
