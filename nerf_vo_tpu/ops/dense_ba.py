"""Dense (per-pixel inverse depth) bundle adjustment — DROID-SLAM style.

TPU-native replacement for the NeRF-SLAM fork's CUDA/GTSAM BA stack
(reference N3/N4; call sites nerf_vo/tracking/droid_slam.py:573-674):
``droid_backends.reduced_camera_matrix`` (Schur-reduced camera system),
GTSAM ``optimizeDensely`` (dense solve), and ``droid_backends.solve_depth``
(depth back-substitution) collapse into one jitted program:

  * per-pixel reprojection residual jacobians by vmapped forward-mode AD,
  * dense pose blocks + a per-(frame, pixel) pose-depth accumulator
    ``U [N, hw, P, 6]`` assembled with scatter-adds,
  * Schur complement + damped Cholesky solve on the (small, padded) pose
    window — all MXU einsums,
  * depth back-substitution as elementwise ops.

The reference's GTSAM usage is exactly dense Hessian assembly + Cholesky
(SURVEY.md §7.1(9)); no factor-graph library is needed on TPU.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from nerf_vo_tpu.core import lie
from nerf_vo_tpu.ops.ba import _edge_residual, project, unproject

_HI = jax.lax.Precision.HIGHEST


def dense_reproject(poses, disps, intrinsics, ii, jj):
    """Reproject every pixel of frames ii into frames jj.

    Args:
      poses: [N, 7] w2c SE3; disps: [N, h, w] inverse depth (1/8 res);
      intrinsics: [N, 4] at the same resolution; ii/jj: [E] frame ids.

    Returns (coords [E, h, w, 2], z [E, h, w]).
    """
    N, h, w = disps.shape
    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    grid = jnp.stack([xs, ys], -1)  # [h, w, 2]

    g_ji = lie.se3_mul(poses[jj], lie.se3_inv(poses[ii]))  # [E, 7]
    k_i = intrinsics[ii]
    k_j = intrinsics[jj]
    d = disps[ii]  # [E, h, w]
    p_cam = unproject(
        grid[None], d, k_i[:, None, None, :]
    )  # [E, h, w, 3]
    p_j = lie.se3_act(g_ji[:, None, None, :], p_cam)
    return project(p_j, k_j[:, None, None, :])


class DenseBAProblem(NamedTuple):
    poses: jnp.ndarray  # [N, 7]
    disps: jnp.ndarray  # [N, h, w]
    intrinsics: jnp.ndarray  # [N, 4]
    ii: jnp.ndarray  # [E]
    jj: jnp.ndarray  # [E]
    targets: jnp.ndarray  # [E, h, w, 2]
    weights: jnp.ndarray  # [E, h, w, 2]
    valid: jnp.ndarray  # [E] bool


@functools.partial(jax.jit, static_argnames=("num_iters", "window"))
def dense_bundle_adjust(
    problem: DenseBAProblem,
    slot_map,
    *,
    num_iters: int = 2,
    window: int = 12,
    lm_lambda: float = 1e-4,
    ep: float = 0.1,
    eta=None,
    disp_clip: Tuple[float, float] = (1e-3, 10.0),
):
    """Damped GN over window poses + per-pixel inverse depths.

    Args:
      slot_map: [N] window-local pose slot or -1 (fixed).
      eta: optional [N, h, w] per-pixel depth damping (the update net's
        damping head, reference droid_slam.py update()).

    Returns (poses, disps, costs[num_iters]).
    """
    N, h, w = problem.disps.shape
    E = problem.ii.shape[0]
    hw = h * w
    P = window

    ii, jj = problem.ii, problem.jj
    li = slot_map[ii]
    lj = slot_map[jj]
    sl_i = jnp.clip(li, 0, P - 1)
    sl_j = jnp.clip(lj, 0, P - 1)
    edge_valid = problem.valid & (ii != jj)

    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    grid = jnp.stack([xs, ys], -1).reshape(hw, 2)

    tgt = problem.targets.reshape(E, hw, 2)
    wgt = problem.weights.reshape(E, hw, 2)

    def gn_iteration(carry, _):
        poses, disps = carry

        g_i = poses[ii]
        g_j = poses[jj]
        k_i = problem.intrinsics[ii]
        k_j = problem.intrinsics[jj]
        d = disps[ii].reshape(E, hw)

        zeros6 = jnp.zeros((6,))

        def res_fn(xi_i, xi_j, dd, g_i, g_j, k_i, k_j, xy, d0, t):
            return _edge_residual(xi_i, xi_j, dd, g_i, g_j, k_i, k_j, xy, d0, t)

        # vmap over pixels (inner) and edges (outer)
        jac_pix = jax.vmap(
            jax.jacfwd(res_fn, argnums=(0, 1, 2), has_aux=True),
            in_axes=(None, None, 0, None, None, None, None, 0, 0, 0),
        )
        jac = jax.vmap(jac_pix, in_axes=(None, None, None, 0, 0, 0, 0, None, 0, 0))
        (J_i, J_j, J_d), z = jac(
            zeros6, zeros6, jnp.zeros((hw,)), g_i, g_j, k_i, k_j, grid, d, tgt
        )
        res_pix = jax.vmap(res_fn, in_axes=(None, None, 0, None, None, None,
                                            None, 0, 0, 0))
        r, _ = jax.vmap(res_pix, in_axes=(None, None, None, 0, 0, 0, 0, None,
                                          0, 0))(
            zeros6, zeros6, jnp.zeros((hw,)), g_i, g_j, k_i, k_j, grid, d, tgt
        )
        # J_i/J_j: [E, hw, 2, 6]; J_d: [E, hw, 2]; r/z: [E, hw, 2]/[E, hw]

        ok = (
            edge_valid[:, None]
            & (z > 0.1)
            & jnp.all(jnp.isfinite(r), -1)
            & (jnp.linalg.norm(r, axis=-1) < 100.0)
        )
        wm = wgt * ok[..., None]

        wJ_d = wm * J_d

        # ---- window-row jacobian Gs[e, h, c, P*6] ---------------------
        # sqrt-weighted rows with both pose blocks scattered in, so the
        # reduced camera Hessian is ONE Gs^T Gs MXU product — the
        # 4-combination loop this replaces ran (E*hw)-batched 6-wide
        # einsums that pad to 128 on both MXU operand dims (same fix as
        # ops/ba.py; measured 4.4 of 6.6 ms there).
        oh_i = jax.nn.one_hot(jnp.where(li >= 0, sl_i, P), P + 1)[:, :P]
        oh_j = jax.nn.one_hot(jnp.where(lj >= 0, sl_j, P), P + 1)[:, :P]
        # Precondition: confidence weights must be >= 0 (they are sigmoid
        # outputs today) — the sqrt factorization is not sign-agnostic, so
        # clamp to keep a future signed-weight net from emitting NaNs that
        # the isfinite guard would silently mask into zero updates.
        sw = jnp.sqrt(jnp.maximum(wm, 0.0))  # [E, hw, 2]
        Gs = (
            (sw[..., None] * J_i)[..., None, :] * oh_i[:, None, None, :, None]
            + (sw[..., None] * J_j)[..., None, :] * oh_j[:, None, None, :, None]
        ).reshape(E, hw, 2, P * 6)

        Gs_flat = Gs.reshape(E * hw * 2, P * 6)
        B = jnp.matmul(Gs_flat.T, Gs_flat, precision=_HI)  # [P6, P6]
        v = jnp.matmul(Gs_flat.T, (sw * -r).reshape(-1), precision=_HI)

        # ---- depth terms ----------------------------------------------
        C = jnp.zeros((N, hw)).at[ii].add(jnp.sum(wJ_d * J_d, -1))
        w_d = jnp.zeros((N, hw)).at[ii].add(jnp.sum(wJ_d * (-r), -1))
        swJd = sw * J_d  # [E, hw, 2]
        u_all = (
            Gs[:, :, 0] * swJd[:, :, 0:1]
            + Gs[:, :, 1] * swJd[:, :, 1:2]
        )  # [E, hw, P*6]
        U = jnp.zeros((N, hw, P * 6)).at[ii].add(u_all)

        damp = lm_lambda * C + 1e-7
        if eta is not None:
            damp = damp + eta.reshape(N, hw)
        Cinv = 1.0 / (C + damp)

        # ---- Schur + solve --------------------------------------------
        Uf = U.reshape(N * hw, P * 6)
        cf = Cinv.reshape(N * hw)
        H = B - jnp.matmul(Uf.T, cf[:, None] * Uf, precision=_HI)
        rhs = v - jnp.matmul(Uf.T, cf * w_d.reshape(-1), precision=_HI)
        H = H + jnp.diag(lm_lambda * jnp.diagonal(H) + ep)
        # LU solve: scipy cholesky is pathologically slow on this backend
        dx = jnp.linalg.solve(H, rhs).reshape(P, 6)
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0)

        dz = Cinv * (
            w_d - jnp.matmul(Uf, dx.reshape(P * 6),
                             precision=_HI).reshape(N, hw)
        )
        touched = jnp.zeros((N,), bool).at[ii].max(edge_valid)
        dz = jnp.where(touched[:, None] & jnp.isfinite(dz), dz, 0.0)

        # marginal depth covariance from THIS linearization (reference
        # droid_slam.py:676-725 computes the same quantity via a dense
        # Cholesky of the reduced camera matrix):
        #   Sigma_d = C^-1 + C^-1 U S^-1 U^T C^-1
        # with S the (damped) Schur pose Hessian already assembled above.
        Pcov = jnp.linalg.inv(H)  # [P*6, P*6] — small window system
        Uf = U.reshape(N, hw, P * 6)
        quad = jnp.einsum(
            "nha,ab,nhb->nh", Uf, Pcov, Uf, precision=_HI
        )
        cov = Cinv + Cinv * quad * Cinv
        cov = jnp.where(touched[:, None], cov, 1e6).reshape(N, h, w)

        pose_slot = slot_map
        xi_full = jnp.where(
            (pose_slot >= 0)[:, None],
            dx[jnp.clip(pose_slot, 0, P - 1)], 0.0,
        )
        poses = lie.se3_retract(poses, xi_full)
        disps = jnp.clip(
            disps + dz.reshape(N, h, w), disp_clip[0], disp_clip[1]
        )
        return (poses, disps), (jnp.sum(wm * r * r), cov)

    (poses, disps), (costs, covs) = jax.lax.scan(
        gn_iteration, (problem.poses, problem.disps), None, length=num_iters
    )
    return poses, disps, costs, covs[-1]


def frame_distance(poses, disps, intrinsics, ii, jj, beta: float = 0.3):
    """Mean flow magnitude between frame pairs, mixing full reprojection and
    rotation-only flow (replaces droid_backends.frame_distance,
    reference droid_slam.py:1167-1178)."""
    coords, z = dense_reproject(poses, disps, intrinsics, ii, jj)
    N, h, w = disps.shape
    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    grid = jnp.stack([xs, ys], -1)
    full = jnp.linalg.norm(coords - grid[None], axis=-1)

    # rotation-only: zero out translation of the relative pose
    g_ji = lie.se3_mul(poses[jj], lie.se3_inv(poses[ii]))
    g_rot = g_ji.at[..., :3].set(0.0)
    k_i = intrinsics[ii]
    k_j = intrinsics[jj]
    p_cam = unproject(grid[None], disps[ii], k_i[:, None, None, :])
    coords_rot, _ = project(
        lie.se3_act(g_rot[:, None, None, :], p_cam), k_j[:, None, None, :]
    )
    rot = jnp.linalg.norm(coords_rot - grid[None], axis=-1)

    ok = (z > 0.1).astype(jnp.float32)
    mean = lambda x: jnp.sum(x * ok, axis=(1, 2)) / jnp.clip(
        jnp.sum(ok, axis=(1, 2)), 1.0
    )
    return beta * mean(full) + (1.0 - beta) * mean(rot)
