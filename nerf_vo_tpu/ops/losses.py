"""Supervision losses for the NeRF mapper.

The loss set of the reference mapper (nerf_vo/mapping/nerfstudio.py:71-82,
nerf_vo/mapping/nerfstudio_utils.py:326-350): RGB MSE, sigma-weighted
DS-NeRF depth log-likelihood, monosdf normal loss, plus the NGP path's
(co)variance-weighted L2 depth loss (nerf_vo/mapping/instant_ngp.py:46-48).
Interlevel/distortion regularizers live in ops/rendering.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-7


def rgb_loss(pred, target):
    return jnp.mean((pred - target) ** 2)


def ds_nerf_depth_loss(weights, t_mid, deltas, target_depth, sigma: float,
                       mask=None):
    """DS-NeRF depth loss: -log likelihood of termination at the GT depth.

    L = -mean log( sum_i w_i * N(t_i; d, sigma^2) * delta_i ) over valid rays.
    Matches nerfstudio's ``ds_nerf_depth_loss`` used with
    ``depth_sigma=0.001``, no decay (reference nerf_vo/mapping/nerfstudio.py:75-80).

    Args:
      weights: [R, S] rendering weights.
      t_mid: [R, S] metric sample midpoints.
      deltas: [R, S] interval lengths.
      target_depth: [R] or [R, 1] supervision depth (euclidean ray distance).
      mask: optional [R] validity mask (depth > 0).
    """
    d = target_depth.reshape(-1, 1)
    ll = jnp.exp(-((t_mid - d) ** 2) / (2.0 * sigma**2)) * deltas
    loss = -jnp.log(jnp.sum(weights * ll, axis=-1) + EPS)
    if mask is None:
        mask = (d[:, 0] > 0).astype(loss.dtype)
    else:
        mask = mask.astype(loss.dtype) * (d[:, 0] > 0)
    return jnp.sum(loss * mask) / jnp.clip(jnp.sum(mask), 1.0)


def depth_l2_loss(pred_depth, target_depth, depth_cov=None, mask=None):
    """Instant-NGP / NeRF-SLAM style L2 depth loss with optional covariance
    weighting (reference nerf_vo/mapping/instant_ngp.py:46-48,87-100)."""
    err = (pred_depth - target_depth) ** 2
    if depth_cov is not None:
        err = err / jnp.clip(depth_cov, 1e-6)
    if mask is None:
        mask = (target_depth > 0).astype(err.dtype)
    else:
        mask = mask.astype(err.dtype) * (target_depth > 0)
    return jnp.sum(err * mask) / jnp.clip(jnp.sum(mask), 1.0)


def monosdf_normal_loss(pred_normal, target_normal, mask=None):
    """L1 + angular consistency between rendered and prior normals.

    monosdf-style: |n - n*|_1 + |1 - <n, n*>|, as added by the reference's
    ExtendedNerfactoModel (nerf_vo/mapping/nerfstudio_utils.py:337-350),
    weight 5e-6 (nerf_vo/mapping/nerfstudio.py:74).
    """
    pred = pred_normal / jnp.clip(jnp.linalg.norm(pred_normal, axis=-1, keepdims=True), EPS)
    tgt = target_normal / jnp.clip(jnp.linalg.norm(target_normal, axis=-1, keepdims=True), EPS)
    l1 = jnp.sum(jnp.abs(pred - tgt), axis=-1)
    cos = jnp.abs(1.0 - jnp.sum(pred * tgt, axis=-1))
    loss = l1 + cos
    if mask is not None:
        m = mask.astype(loss.dtype)
        return jnp.sum(loss * m) / jnp.clip(jnp.sum(m), 1.0)
    return jnp.mean(loss)


def orientation_loss(weights, sample_normals, view_dirs):
    """Ref-NeRF orientation loss: penalize normals facing away from the camera
    (used by nerfacto when predict_normals=True [upstream])."""
    n_dot_v = jnp.sum(sample_normals * view_dirs[..., None, :], axis=-1)
    return jnp.mean(jnp.sum(weights * jnp.clip(n_dot_v, min=0.0) ** 2, axis=-1))


def pred_normal_loss(weights, pred_normals, grad_normals):
    """Tie predicted normals to density-gradient normals (nerfacto [upstream])."""
    sim = 1.0 - jnp.sum(pred_normals * jax.lax.stop_gradient(grad_normals), axis=-1)
    return jnp.mean(jnp.sum(weights * sim, axis=-1))
