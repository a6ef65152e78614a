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
import os as _os
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from nerf_vo_tpu.core import lie
from nerf_vo_tpu.ops.ba import _edge_residual, project, unproject

_HI = jax.lax.Precision.HIGHEST

# Reduced-camera-system assembly route (see gn_iteration):
#   "gs"     — window-expanded sqrt-weighted rows Gs [E, hw, 2, P*6] and
#              one Gs^T Gs matmul (the ops/ba.py-style formulation);
#   "blocks" — per-edge 12x12 Hessian blocks + quadrant scatter; skips
#              the Gs materialization entirely. exp_dense_ba_stages
#              attributed 14.1 of the 17.5 ms GN iteration to the Gs
#              assembly+product at DROID shapes (E~100, hw=1200) — the
#              regime is the OPPOSITE of the sparse tracker BA's
#              (E=32768, hw=9), where blocks lost to Gs.
# DEFAULT "blocks" (2026-08-21): isolated 2-iter solve 34.9 -> 9.66 ms
# (tpu_runs/exp_dense_ba_cut.log gs vs blocks); trajectory-equivalence
# pinned by tests/test_dense_ba.py::test_dense_ba_assembly_routes_match.
_BA_ASSEMBLY = _os.environ.get("NERF_VO_DENSE_BA_ASSEMBLY", "blocks")
if _BA_ASSEMBLY not in ("gs", "blocks"):
    raise ValueError(
        "NERF_VO_DENSE_BA_ASSEMBLY must be 'gs' or 'blocks', got "
        f"{_BA_ASSEMBLY!r}"
    )


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


def _dense_ba_core(
    poses0,
    disps0,  # [N, hwl] — the local PIXEL BLOCK of inverse depths
    intrinsics,
    ii,
    jj,
    tgt,  # [E, hwl, 2]
    wgt,  # [E, hwl, 2]
    valid,
    grid,  # [hwl, 2] pixel coordinates of this block
    slot_map,
    eta,  # [N, hwl] or None
    *,
    num_iters: int,
    window: int,
    lm_lambda: float,
    ep: float,
    disp_clip: Tuple[float, float],
    axis_name=None,
):
    """GN core over a pixel BLOCK. With ``axis_name`` set (inside a
    shard_map that splits the pixel axis), the reduced camera system is
    psum-accumulated across shards — per-pixel work (jacobians, depth
    back-substitution, marginal covariance) stays shard-local, so the
    heavy [E, hw, 2, 6] jacobian tensors shrink 1/D per device."""
    N, hwl = disps0.shape
    E = ii.shape[0]
    P = window

    li = slot_map[ii]
    lj = slot_map[jj]
    sl_i = jnp.clip(li, 0, P - 1)
    sl_j = jnp.clip(lj, 0, P - 1)
    edge_valid = valid & (ii != jj)

    def _acc(x):
        return jax.lax.psum(x, axis_name) if axis_name is not None else x

    def gn_iteration(carry, _):
        poses, disps = carry

        g_i = poses[ii]
        g_j = poses[jj]
        k_i = intrinsics[ii]
        k_j = intrinsics[jj]
        d = disps[ii]

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
            zeros6, zeros6, jnp.zeros((hwl,)), g_i, g_j, k_i, k_j, grid, d, tgt
        )
        res_pix = jax.vmap(res_fn, in_axes=(None, None, 0, None, None, None,
                                            None, 0, 0, 0))
        r, _ = jax.vmap(res_pix, in_axes=(None, None, None, 0, 0, 0, 0, None,
                                          0, 0))(
            zeros6, zeros6, jnp.zeros((hwl,)), g_i, g_j, k_i, k_j, grid, d, tgt
        )
        # J_i/J_j: [E, hwl, 2, 6]; J_d: [E, hwl, 2]; r/z: [E, hwl, 2]/[E, hwl]

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
        # Precondition: confidence weights must be >= 0 (they are sigmoid
        # outputs today) — the sqrt factorization is not sign-agnostic, so
        # clamp to keep a future signed-weight net from emitting NaNs that
        # the isfinite guard would silently mask into zero updates.
        sw = jnp.sqrt(jnp.maximum(wm, 0.0))  # [E, hwl, 2]
        swJd = sw * J_d  # [E, hwl, 2]
        li_s = jnp.where(li >= 0, sl_i, P)  # trash slot P for fixed poses
        lj_s = jnp.where(lj >= 0, sl_j, P)

        if _BA_ASSEMBLY == "blocks":
            # per-edge 12x12 Hessian blocks + quadrant scatter-add: never
            # materializes the [E, hwl, 2, P*6] Gs rows (the measured
            # bulk of the GN iteration at dense shapes); sum order
            # changes, values are identical up to f32 reassociation
            Jcat = jnp.concatenate(
                [sw[..., None] * J_i, sw[..., None] * J_j], axis=-1
            )  # [E, hwl, 2, 12]
            Hb = jnp.einsum("ehck,ehcl->ekl", Jcat, Jcat,
                            precision=_HI)  # [E, 12, 12]
            vb = jnp.einsum("ehck,ehc->ek", Jcat, sw * -r,
                            precision=_HI)  # [E, 12]
            B4 = jnp.zeros((P + 1, P + 1, 6, 6))
            B4 = B4.at[li_s, li_s].add(Hb[:, :6, :6])
            B4 = B4.at[li_s, lj_s].add(Hb[:, :6, 6:])
            B4 = B4.at[lj_s, li_s].add(Hb[:, 6:, :6])
            B4 = B4.at[lj_s, lj_s].add(Hb[:, 6:, 6:])
            B = B4[:P, :P].transpose(0, 2, 1, 3).reshape(P * 6, P * 6)
            v = jnp.zeros((P + 1, 6)).at[li_s].add(vb[:, :6]).at[
                lj_s].add(vb[:, 6:])[:P].reshape(P * 6)

            u12 = jnp.einsum("ehck,ehc->ehk", Jcat, swJd)  # [E, hwl, 12]
            U4 = jnp.zeros((N, hwl, P + 1, 6))
            U4 = U4.at[ii, :, li_s].add(u12[..., :6])
            U4 = U4.at[ii, :, lj_s].add(u12[..., 6:])
            U = U4[:, :, :P].reshape(N, hwl, P * 6)
        else:
            oh_i = jax.nn.one_hot(li_s, P + 1)[:, :P]
            oh_j = jax.nn.one_hot(lj_s, P + 1)[:, :P]
            Gs = (
                (sw[..., None] * J_i)[..., None, :]
                * oh_i[:, None, None, :, None]
                + (sw[..., None] * J_j)[..., None, :]
                * oh_j[:, None, None, :, None]
            ).reshape(E, hwl, 2, P * 6)

            Gs_flat = Gs.reshape(E * hwl * 2, P * 6)
            B = jnp.matmul(Gs_flat.T, Gs_flat, precision=_HI)  # [P6, P6]
            v = jnp.matmul(Gs_flat.T, (sw * -r).reshape(-1), precision=_HI)
            u_all = (
                Gs[:, :, 0] * swJd[:, :, 0:1]
                + Gs[:, :, 1] * swJd[:, :, 1:2]
            )  # [E, hwl, P*6]
            U = jnp.zeros((N, hwl, P * 6)).at[ii].add(u_all)

        # ---- depth terms ----------------------------------------------
        C = jnp.zeros((N, hwl)).at[ii].add(jnp.sum(wJ_d * J_d, -1))
        w_d = jnp.zeros((N, hwl)).at[ii].add(jnp.sum(wJ_d * (-r), -1))

        damp = lm_lambda * C + 1e-7
        if eta is not None:
            damp = damp + eta
        Cinv = 1.0 / (C + damp)

        # ---- Schur + solve --------------------------------------------
        # B, v, and the Schur products all SUM over pixels, so the sharded
        # path psum-accumulates the (tiny) reduced system once per
        # iteration; the solve then replicates exactly on every shard.
        Uf = U.reshape(N * hwl, P * 6)
        cf = Cinv.reshape(N * hwl)
        H = _acc(B - jnp.matmul(Uf.T, cf[:, None] * Uf, precision=_HI))
        rhs = _acc(v - jnp.matmul(Uf.T, cf * w_d.reshape(-1), precision=_HI))
        H = H + jnp.diag(lm_lambda * jnp.diagonal(H) + ep)
        # LU solve: scipy cholesky is pathologically slow on this backend
        dx = jnp.linalg.solve(H, rhs).reshape(P, 6)
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0)

        dz = Cinv * (
            w_d - jnp.matmul(Uf, dx.reshape(P * 6),
                             precision=_HI).reshape(N, hwl)
        )
        touched = jnp.zeros((N,), bool).at[ii].max(edge_valid)
        dz = jnp.where(touched[:, None] & jnp.isfinite(dz), dz, 0.0)

        # marginal depth covariance from THIS linearization (reference
        # droid_slam.py:676-725 computes the same quantity via a dense
        # Cholesky of the reduced camera matrix):
        #   Sigma_d = C^-1 + C^-1 U S^-1 U^T C^-1
        # with S the (damped) Schur pose Hessian already assembled above.
        Pcov = jnp.linalg.inv(H)  # [P*6, P*6] — small window system
        Uf = U.reshape(N, hwl, P * 6)
        quad = jnp.einsum(
            "nha,ab,nhb->nh", Uf, Pcov, Uf, precision=_HI
        )
        cov = Cinv + Cinv * quad * Cinv
        cov = jnp.where(touched[:, None], cov, 1e6)

        pose_slot = slot_map
        xi_full = jnp.where(
            (pose_slot >= 0)[:, None],
            dx[jnp.clip(pose_slot, 0, P - 1)], 0.0,
        )
        poses = lie.se3_retract(poses, xi_full)
        disps = jnp.clip(disps + dz, disp_clip[0], disp_clip[1])
        return (poses, disps), (_acc(jnp.sum(wm * r * r)), cov)

    (poses, disps), (costs, covs) = jax.lax.scan(
        gn_iteration, (poses0, disps0), None, length=num_iters
    )
    return poses, disps, costs, covs[-1]


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

    Returns (poses, disps, costs[num_iters], depth covariance [N, h, w]).
    """
    N, h, w = problem.disps.shape
    E = problem.ii.shape[0]
    hw = h * w

    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    grid = jnp.stack([xs, ys], -1).reshape(hw, 2)

    poses, disps, costs, cov = _dense_ba_core(
        problem.poses,
        problem.disps.reshape(N, hw),
        problem.intrinsics,
        problem.ii,
        problem.jj,
        problem.targets.reshape(E, hw, 2),
        problem.weights.reshape(E, hw, 2),
        problem.valid,
        grid,
        slot_map,
        eta.reshape(N, hw) if eta is not None else None,
        num_iters=num_iters,
        window=window,
        lm_lambda=lm_lambda,
        ep=ep,
        disp_clip=disp_clip,
    )
    return (
        poses,
        disps.reshape(N, h, w),
        costs,
        cov.reshape(N, h, w),
    )


def make_sharded_dense_ba(mesh, axis: str = "data", *,
                          num_iters: int = 2, window: int = 12,
                          lm_lambda: float = 1e-4, ep: float = 0.1,
                          disp_clip: Tuple[float, float] = (1e-3, 10.0)):
    """Build a pixel-sharded dense BA over a device mesh.

    The reference (and the round-1 build) runs tracking BA replicated; the
    dense system is per-pixel embarrassingly parallel up to the reduced
    camera matrix, so the pixel axis shards over ``axis``: each device
    linearizes hw/D pixels (the [E, hw, 2, 6] jacobian tensors — the
    solver's memory and FLOP bulk — shrink 1/D), the (P*6)^2 reduced
    system psum-accumulates over ICI once per GN iteration, and depth
    back-substitution + marginal covariance stay shard-local.

    Returns step(problem, slot_map, eta=None) -> (poses, disps, costs, cov)
    with the same semantics as :func:`dense_bundle_adjust` (bit-equal up to
    f32 reduction order; see tests/test_parallel.py).
    """
    from jax.sharding import PartitionSpec as P_

    n_dev = mesh.shape[axis]

    @functools.lru_cache(maxsize=2)
    def build(has_eta: bool):
        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(
                P_(), P_(None, axis), P_(), P_(), P_(),
                P_(None, axis, None), P_(None, axis, None), P_(),
                P_(axis, None), P_(),
                P_(None, axis) if has_eta else P_(),
            ),
            out_specs=(P_(), P_(None, axis), P_(), P_(None, axis)),
            check_vma=False,
        )
        def sharded(poses, disps, intr, ii, jj, tgt, wgt, valid, g, slots,
                    eta_blk):
            return _dense_ba_core(
                poses, disps, intr, ii, jj, tgt, wgt, valid, g, slots,
                eta_blk if has_eta else None,
                num_iters=num_iters, window=window, lm_lambda=lm_lambda,
                ep=ep, disp_clip=disp_clip, axis_name=axis,
            )

        return jax.jit(sharded)

    def step(problem: DenseBAProblem, slot_map, eta=None):
        N, h, w = problem.disps.shape
        E = problem.ii.shape[0]
        hw = h * w
        assert hw % n_dev == 0, (hw, n_dev)

        ys, xs = jnp.meshgrid(
            jnp.arange(h, dtype=jnp.float32),
            jnp.arange(w, dtype=jnp.float32),
            indexing="ij",
        )
        grid = jnp.stack([xs, ys], -1).reshape(hw, 2)

        poses, disps, costs, cov = build(eta is not None)(
            problem.poses,
            problem.disps.reshape(N, hw),
            problem.intrinsics,
            problem.ii,
            problem.jj,
            problem.targets.reshape(E, hw, 2),
            problem.weights.reshape(E, hw, 2),
            problem.valid,
            grid,
            slot_map,
            eta.reshape(N, hw) if eta is not None
            else jnp.zeros((1, 1), jnp.float32),
        )
        return (
            poses, disps.reshape(N, h, w), costs, cov.reshape(N, h, w)
        )

    return step


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


# ---------------------------------------------------------------------------
# global (terminate-time) bundle adjustment
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("num_iters", "P"))
def global_dense_ba(
    poses,
    disps,
    intrinsics,
    host,      # [N] global buffer slot of each row's host frame
    jj_g,      # [N, ME] global target slots per row (pad -> any, masked)
    valid,     # [N, ME] bool
    targets,   # [N, ME, h, w, 2]
    weights,   # [N, ME, h, w, 2] (>= 0)
    slot_map,  # [B] window slot or -1 (fixed gauge poses)
    *,
    num_iters: int = 2,
    P: int,
    lm_lambda: float = 1e-5,
    ep: float = 1e-2,
    eta=None,  # [B, h, w] per-pixel depth damping
    disp_clip: Tuple[float, float] = (1e-3, 10.0),
):
    """Terminate-time global BA over ALL keyframes (reference backend /
    update_lowmem BA, droid_slam.py:554-571,727-768).

    The frontend solver (dense_bundle_adjust) materializes window-row
    jacobians [E, hw, 2, P*6] — fine for a 48-edge window, ~20 GB at global
    scale. Here edges are grouped BY HOST FRAME (each row = one host frame's
    <= ME edges, which also matches the reference's 8-keyframe streaming
    chunks) and a lax.scan accumulates the reduced camera system:

      * pose blocks land in H [P+1, P+1, 6, 6] via per-edge 6x6 block
        scatters (the +1 slot swallows fixed/padded poses),
      * the depth Schur complement uses each frame's COMPACT pose coupling
        U_i [hw, (ME+1)*6] (only the host + its targets couple to frame i's
        depths), so the per-frame correction is a tiny matmul scattered
        into H by slot list,
      * U, C^-1, w are stacked scan outputs, so depth back-substitution
        after the global solve needs no second jacobian pass.
    """
    B, h, w = disps.shape
    N, ME = jj_g.shape
    hw = h * w
    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32), jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    grid = jnp.stack([xs, ys], -1).reshape(hw, 2)
    tgt = targets.reshape(N, ME, hw, 2)
    wgt = weights.reshape(N, ME, hw, 2)
    eta_rows = (
        eta[host].reshape(N, hw) if eta is not None
        else jnp.zeros((N, hw))
    )

    def gn_iteration(carry, _):
        poses, disps = carry

        def frame_body(Hv, row):
            H, v, cost = Hv
            hs, jjr, valr, trow, wrow, eta_r = row
            g_i = poses[hs]
            k_i = intrinsics[hs]
            d = disps[hs].reshape(hw)
            g_j = poses[jjr]          # [ME, 7]
            k_j = intrinsics[jjr]

            zeros6 = jnp.zeros((6,))

            def res_fn(xi_i, xi_j, dd, g_j1, k_j1, xy, d0, t):
                return _edge_residual(
                    xi_i, xi_j, dd, g_i, g_j1, k_i, k_j1, xy, d0, t
                )

            jac_pix = jax.vmap(
                jax.jacfwd(res_fn, argnums=(0, 1, 2), has_aux=True),
                in_axes=(None, None, 0, None, None, 0, 0, 0),
            )
            jac = jax.vmap(jac_pix,
                           in_axes=(None, None, None, 0, 0, None, None, 0))
            (J_i, J_j, J_d), z = jac(
                zeros6, zeros6, jnp.zeros((hw,)), g_j, k_j, grid, d, trow
            )
            res_pix = jax.vmap(res_fn,
                               in_axes=(None, None, 0, None, None, 0, 0, 0))
            r, _ = jax.vmap(res_pix,
                            in_axes=(None, None, None, 0, 0, None, None, 0))(
                zeros6, zeros6, jnp.zeros((hw,)), g_j, k_j, grid, d, trow
            )
            # J_i/J_j: [ME, hw, 2, 6]; J_d/r/z: [ME, hw, 2]/[ME, hw]

            ok = (
                valr[:, None]
                & (z > 0.1)
                & jnp.all(jnp.isfinite(r), -1)
                & (jnp.linalg.norm(r, axis=-1) < 100.0)
            )
            wm = wrow * ok[..., None]
            sw = jnp.sqrt(jnp.maximum(wm, 0.0))
            Gc = jnp.concatenate(
                [sw[..., None] * J_i, sw[..., None] * J_j], -1
            )  # [ME, hw, 2, 12]
            Gf = Gc.reshape(ME, hw * 2, 12)
            Bblk = jnp.einsum("mra,mrb->mab", Gf, Gf, precision=_HI)
            rr = (sw * -r).reshape(ME, hw * 2)
            vblk = jnp.einsum("mra,mr->ma", Gf, rr, precision=_HI)

            sl_i = slot_map[hs]
            sl_j = slot_map[jjr]
            a = jnp.where(sl_i >= 0, sl_i, P)
            bm = jnp.where((sl_j >= 0) & valr, sl_j, P)
            H = H.at[a, a].add(jnp.sum(Bblk[:, :6, :6], 0))
            H = H.at[a, bm].add(Bblk[:, :6, 6:])
            H = H.at[bm, a].add(Bblk[:, 6:, :6])
            H = H.at[bm, bm].add(Bblk[:, 6:, 6:])
            v = v.at[a].add(jnp.sum(vblk[:, :6], 0))
            v = v.at[bm].add(vblk[:, 6:])

            # depth terms (all of this row's edges share host depth)
            wJd = wm * J_d
            C = jnp.sum(wJd * J_d, (0, 2))          # [hw]
            w_d = jnp.sum(wJd * (-r), (0, 2))
            swJd = sw * J_d                          # [ME, hw, 2]
            u_host = jnp.einsum(
                "mhca,mhc->ha", Gc[..., :6], swJd, precision=_HI
            )  # [hw, 6]
            u_tgt = jnp.einsum(
                "mhca,mhc->mha", Gc[..., 6:], swJd, precision=_HI
            )  # [ME, hw, 6]
            Ucomp = jnp.concatenate(
                [u_host[:, None, :], u_tgt.transpose(1, 0, 2)], 1
            ).reshape(hw, (ME + 1) * 6)

            damp = lm_lambda * C + 1e-7 + eta_r
            Cinv = 1.0 / (C + damp)
            S = jnp.matmul(Ucomp.T, Cinv[:, None] * Ucomp, precision=_HI)
            rhs_c = jnp.matmul(Ucomp.T, Cinv * w_d, precision=_HI)
            slots = jnp.concatenate([a[None], bm])  # [ME+1]
            Sblk = S.reshape(ME + 1, 6, ME + 1, 6).transpose(0, 2, 1, 3)
            H = H.at[slots[:, None], slots[None, :]].add(-Sblk)
            v = v.at[slots].add(-rhs_c.reshape(ME + 1, 6))
            cost = cost + jnp.sum(wm * r * r)
            return (H, v, cost), (Ucomp, Cinv, w_d, slots)

        H0 = jnp.zeros((P + 1, P + 1, 6, 6))
        v0 = jnp.zeros((P + 1, 6))
        (H, v, cost), (U_all, Cinv_all, wd_all, slots_all) = jax.lax.scan(
            frame_body, (H0, v0, 0.0),
            (host, jj_g, valid, tgt, wgt, eta_rows),
        )

        Hm = H[:P, :P].transpose(0, 2, 1, 3).reshape(P * 6, P * 6)
        vm = v[:P].reshape(P * 6)
        Hm = Hm + jnp.diag(lm_lambda * jnp.diagonal(Hm) + ep)
        dx = jnp.linalg.solve(Hm, vm).reshape(P, 6)
        dx = jnp.where(jnp.isfinite(dx), dx, 0.0)

        # depth back-substitution per host row
        dx_pad = jnp.concatenate([dx, jnp.zeros((1, 6))])  # trash slot
        dxr = dx_pad[slots_all].reshape(N, (ME + 1) * 6)
        dz = Cinv_all * (
            wd_all - jnp.einsum("nha,na->nh", U_all, dxr, precision=_HI)
        )
        touched = jnp.any(valid, 1)
        dz = jnp.where(touched[:, None] & jnp.isfinite(dz), dz, 0.0)
        disps = disps.at[host].add(dz.reshape(N, h, w))
        disps = jnp.clip(disps, disp_clip[0], disp_clip[1])

        xi_full = jnp.where(
            (slot_map >= 0)[:, None],
            dx[jnp.clip(slot_map, 0, P - 1)], 0.0,
        )
        poses = lie.se3_retract(poses, xi_full)
        return (poses, disps), cost

    (poses, disps), costs = jax.lax.scan(
        gn_iteration, (poses, disps), None, length=num_iters
    )
    return poses, disps, costs
