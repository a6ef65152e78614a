"""Sparse patch-graph bundle adjustment: damped Gauss-Newton with Schur trick.

TPU-native replacement for DPVO's fused CUDA ``fastba`` kernel (reference
submodule N1; call site nerf_vo/tracking/dpvo.py:62-64 [upstream internals])
— the solver jointly refining SE3 camera poses and per-patch inverse depths
against predicted flow targets.

Design (TPU-first, SURVEY.md §7.3(2)):
  * STATIC shapes: the dynamic patch graph is padded to a fixed edge budget
    and masked; pose window membership is a traced mask, not a shape.
  * Jacobians by forward-mode autodiff of the per-edge reprojection residual
    (vmapped jacfwd) — exactly fused by XLA, no hand-derived chain rule to
    get wrong.
  * The reduced camera system is assembled DENSELY over the (small, padded)
    optimization window: pose-pose blocks [P,P,6,6] via scatter-add, the
    depth Schur complement via a per-patch [K,P,6] accumulator and one
    einsum — every step lands on the MXU. P is <= ~16 poses; dense is both
    simpler and faster than mirroring the CUDA block-sparse layout.
  * Depth back-substitution is a masked segment reduction per patch.

Conventions: poses are world-to-camera SE3 7-vectors (lietorch layout,
matching DPVO's ``poses_`` buffer); patch state is (x, y) pixel center at
feature resolution plus inverse depth; intrinsics are per-frame
[fx, fy, cx, cy] at the same resolution.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from nerf_vo_tpu.core import lie

_HI = jax.lax.Precision.HIGHEST


def unproject(xy, inv_depth, intrinsics):
    """Pixel + inverse depth -> camera-frame 3D point (x, y, z=1/d)."""
    fx, fy, cx, cy = jnp.moveaxis(intrinsics, -1, 0)
    z = 1.0 / jnp.clip(inv_depth, 1e-6)
    x = (xy[..., 0] - cx) / fx * z
    y = (xy[..., 1] - cy) / fy * z
    return jnp.stack([x, y, z], axis=-1)


def project(points, intrinsics):
    """Camera-frame points -> pixel coords. Returns (xy, z)."""
    fx, fy, cx, cy = jnp.moveaxis(intrinsics, -1, 0)
    z = points[..., 2]
    inv_z = 1.0 / jnp.clip(jnp.abs(z), 1e-6) * jnp.sign(
        jnp.where(z == 0, 1.0, z)
    )
    u = fx * points[..., 0] * inv_z + cx
    v = fy * points[..., 1] * inv_z + cy
    return jnp.stack([u, v], axis=-1), z


def reproject_edges(poses, intrinsics, xy_e, invd_e, ii_e, jj_e):
    """Per-edge reprojection: patch center (host frame ii) -> target frame jj.

    All args per-edge: xy_e [NE, 2], invd_e [NE], ii_e/jj_e [NE] int32.
    Returns (xy_target [NE, 2], z_target [NE]).
    """
    g_i = poses[ii_e]
    g_j = poses[jj_e]
    k_i = intrinsics[ii_e]
    k_j = intrinsics[jj_e]
    p_cam_i = unproject(xy_e, invd_e, k_i)
    g_ji = lie.se3_mul(g_j, lie.se3_inv(g_i))  # cam_i -> cam_j
    p_cam_j = lie.se3_act(g_ji, p_cam_i)
    return project(p_cam_j, k_j)


def _edge_residual(xi_i, xi_j, d_delta, g_i, g_j, k_i, k_j, xy, invd, target):
    """Residual for one edge at a retraction point.

    xi_i/xi_j: 6-vector pose perturbations (exp(xi) * g), d_delta: scalar
    inverse-depth perturbation. Returns 2-vector (target - reprojection).
    """
    g_i2 = lie.se3_mul(lie.se3_exp(xi_i), g_i)
    g_j2 = lie.se3_mul(lie.se3_exp(xi_j), g_j)
    p_cam_i = unproject(xy, invd + d_delta, k_i)
    g_ji = lie.se3_mul(g_j2, lie.se3_inv(g_i2))
    xy_j, z = project(lie.se3_act(g_ji, p_cam_i), k_j)
    return target - xy_j, z


class BAProblem(NamedTuple):
    """Static-shape BA inputs (see module docstring for conventions)."""

    poses: jnp.ndarray  # [NP, 7] w2c
    intrinsics: jnp.ndarray  # [NP, 4]
    pt_xy: jnp.ndarray  # [NK, 2]
    pt_invd: jnp.ndarray  # [NK]
    pt_host: jnp.ndarray  # [NK] int32 host frame
    kk: jnp.ndarray  # [NE] int32 patch index per edge
    jj: jnp.ndarray  # [NE] int32 target frame per edge
    targets: jnp.ndarray  # [NE, 2] predicted correspondence (pixels)
    weights: jnp.ndarray  # [NE, 2] confidence weights (>= 0)
    valid: jnp.ndarray  # [NE] bool edge mask


def window_slot_map(n_poses: int, t0, t1, window: int):
    """Contiguous-range slot map: poses in [t0, t1) -> slots 0..window-1."""
    g = jnp.arange(n_poses)
    s = g - t0
    in_win = (s >= 0) & (s < window) & (g < t1)
    return jnp.where(in_win, s, -1).astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("num_iters", "window")
)
def bundle_adjust(
    problem: BAProblem,
    slot_map,
    *,
    num_iters: int = 2,
    window: int = 16,
    lm_lambda: float = 1e-4,
    ep: float = 0.1,
    depth_clip: Tuple[float, float] = (1e-3, 10.0),
):
    """Run ``num_iters`` damped GN iterations.

    Args:
      slot_map: [NP] int32 window-local slot per pose (0..window-1), or -1
        for poses held fixed. Non-contiguous windows (holes from keyframe
        removal) are supported; use :func:`window_slot_map` for ranges.

    Patch inverse depths of all valid edges' patches are free.
    Returns (poses, pt_invd, per-iteration weighted costs).
    """
    NP = problem.poses.shape[0]
    NK = problem.pt_xy.shape[0]
    NE = problem.kk.shape[0]
    P = window

    ii = problem.pt_host[problem.kk]  # [NE] host frame per edge
    jj = problem.jj
    kk = problem.kk

    def local_slot(g):
        return slot_map[g]

    li = local_slot(ii)
    lj = local_slot(jj)
    edge_valid = problem.valid & (ii != jj)

    def gn_iteration(carry, _):
        poses, invd = carry

        g_i = poses[ii]
        g_j = poses[jj]
        k_i = problem.intrinsics[ii]
        k_j = problem.intrinsics[jj]
        xy = problem.pt_xy[kk]
        d = invd[kk]

        zeros6 = jnp.zeros((NE, 6))
        zeros1 = jnp.zeros((NE,))

        def res_fn(xi_i, xi_j, dd, g_i, g_j, k_i, k_j, xy, d, tgt):
            r, z = _edge_residual(xi_i, xi_j, dd, g_i, g_j, k_i, k_j, xy, d, tgt)
            return r, z

        # jacobians wrt (xi_i, xi_j, dd) at 0 + residual value
        jac = jax.vmap(
            jax.jacfwd(res_fn, argnums=(0, 1, 2), has_aux=True)
        )
        (J_i, J_j, J_d), z = jac(
            zeros6, zeros6, zeros1, g_i, g_j, k_i, k_j, xy, d, problem.targets
        )
        r, _ = jax.vmap(res_fn)(
            zeros6, zeros6, zeros1, g_i, g_j, k_i, k_j, xy, d, problem.targets
        )
        # J_i/J_j: [NE, 2, 6]; J_d: [NE, 2]; r: [NE, 2]

        # robust validity: in front of both cameras, finite, masked edges
        ok = (
            edge_valid
            & (z > 0.1)
            & jnp.all(jnp.isfinite(r), axis=-1)
            & (jnp.linalg.norm(r, axis=-1) < 250.0)
        )
        w = problem.weights * ok[:, None]  # [NE, 2]

        sl_i = jnp.clip(li, 0, P - 1)
        sl_j = jnp.clip(lj, 0, P - 1)
        wJ_d = w * J_d

        # Assembly via ONE-HOT MATMULS, not scatter-adds: TPU scatters
        # serialize (measured ~400 ms per BA call at 4k edges). Fixed poses
        # one-hot to a dropped column, so their jacobian blocks contribute
        # nothing anywhere.
        oh_i = jax.nn.one_hot(jnp.where(li >= 0, sl_i, P), P + 1)[:, :P]
        oh_j = jax.nn.one_hot(jnp.where(lj >= 0, sl_j, P), P + 1)[:, :P]
        oh_k = jax.nn.one_hot(kk, NK)  # [E, NK]

        # ---- window-row jacobian G[e, c, P*6] --------------------------
        # Both pose blocks of an edge land in ONE row vector, so the full
        # reduced camera Hessian is a single Gs^T Gs MXU product (Gs = the
        # sqrt-weighted rows) — the earlier 4-combination (i,j)x(i,j) block
        # loop materialized 4x [E, P*36] intermediates (measured 4.4 of the
        # 6.6 ms iteration). No small-batch einsums: E-batched 6-wide MXU
        # ops pad 6 -> 128 on both operand dims and dominate the iteration.
        sw = jnp.sqrt(w)  # [NE, 2]
        Gs = (
            (sw[..., None] * J_i)[:, :, None, :] * oh_i[:, None, :, None]
            + (sw[..., None] * J_j)[:, :, None, :] * oh_j[:, None, :, None]
        ).reshape(NE * 2, P * 6)

        # pose-pose Hessian (row-major [P*6, P*6], solver-ready) and rhs
        B = jnp.matmul(Gs.T, Gs, precision=_HI)
        v = jnp.matmul(Gs.T, (sw * -r).reshape(NE * 2), precision=_HI)

        # ---- depth terms ----------------------------------------------
        C = jnp.matmul(oh_k.T, jnp.sum(wJ_d * J_d, axis=-1), precision=_HI)
        w_d = jnp.matmul(oh_k.T, jnp.sum(wJ_d * (-r), axis=-1), precision=_HI)
        # per-patch pose-depth accumulator U[k, P*6] = sum_c sqrt(w)J_d * Gs
        # (w * J_d * G == (sw J_d) * (sw G)); explicit elementwise sum, NOT
        # an einsum (see note above)
        swJd = (sw * J_d).reshape(NE * 2, 1)
        Gs2 = Gs.reshape(NE, 2, P * 6)
        u_all = (
            Gs2[:, 0] * swJd.reshape(NE, 2)[:, 0:1]
            + Gs2[:, 1] * swJd.reshape(NE, 2)[:, 1:2]
        )
        U = jnp.matmul(oh_k.T, u_all, precision=_HI)  # [NK, P*6]

        C_damped = C * (1.0 + lm_lambda) + 1e-7
        Cinv = 1.0 / C_damped

        # ---- Schur complement -----------------------------------------
        H = B - jnp.matmul(U.T, Cinv[:, None] * U, precision=_HI)
        rhs_flat = v - jnp.matmul(U.T, Cinv * w_d, precision=_HI)

        diag = jnp.diagonal(H)
        H = H + jnp.diag(lm_lambda * diag + ep)

        # NOTE: jnp.linalg.solve, not scipy cholesky — the cholesky custom
        # call is pathologically slow on this TPU backend (measured seconds
        # vs 0.2 ms for LU solve at 96x96)
        dx = jnp.linalg.solve(H, rhs_flat).reshape(P, 6)
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0)

        # ---- depth back-substitution ----------------------------------
        dz = Cinv * (w_d - jnp.matmul(U, dx.reshape(P * 6), precision=_HI))
        # only patches touched by a valid edge move
        touched = jnp.matmul(oh_k.T, ok.astype(jnp.float32),
                             precision=_HI) > 0
        dz = jnp.where(touched & jnp.isfinite(dz), dz, 0.0)

        # ---- retract ---------------------------------------------------
        pose_slot = local_slot(jnp.arange(NP))  # [NP]
        xi_full = jnp.where(
            (pose_slot >= 0)[:, None], dx[jnp.clip(pose_slot, 0, P - 1)], 0.0
        )
        poses = lie.se3_retract(poses, xi_full)
        invd = jnp.clip(invd + dz, depth_clip[0], depth_clip[1])
        return (poses, invd), jnp.sum((w * r) * r)

    (poses, invd), costs = jax.lax.scan(
        gn_iteration, (problem.poses, problem.pt_invd), None, length=num_iters
    )
    return poses, invd, costs
