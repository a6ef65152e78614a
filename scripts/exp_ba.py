"""BA cost attribution at production shapes (TPU).

Times bundle_adjust variants: iteration count scaling, precision, and a
stage-ablated copy of the GN iteration to locate the per-iteration cost.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

import jax
import jax.numpy as jnp
import numpy as np

from nerf_vo_tpu.core import lie
from nerf_vo_tpu.ops import ba


def sync(x):
    for l in jax.tree_util.tree_leaves(x):
        if hasattr(l, "dtype"):
            float(jnp.sum(jnp.asarray(l, jnp.float32).ravel()[:1]))
            return


def bench(label, fn, *args, n=20):
    out = fn(*args)
    sync(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"{label}: {best*1e3:.2f} ms", flush=True)


def make_problem(rng):
    NP, P = 4096, 96
    E = 32768
    KL = 15 * P
    poses = jnp.asarray(
        np.concatenate(
            [rng.randn(NP, 3) * 0.1,
             np.tile([0, 0, 0, 1.0], (NP, 1))
             + np.concatenate([rng.randn(NP, 3) * 0.01, np.zeros((NP, 1))], 1)],
            1),
        jnp.float32)
    poses = poses / jnp.linalg.norm(poses[:, 3:], axis=-1, keepdims=True).clip(1e-6)
    intr = jnp.asarray(np.tile([130.0, 130.0, 80.0, 45.0], (NP, 1)), jnp.float32)
    pt_xy = jnp.asarray(rng.rand(KL, 2) * 80 + 10, jnp.float32)
    pt_invd = jnp.asarray(rng.rand(KL) * 0.5 + 0.5, jnp.float32)
    pt_host = jnp.asarray(rng.randint(0, 15, KL), jnp.int32)
    kk = jnp.asarray(rng.randint(0, KL, E), jnp.int32)
    jj = jnp.asarray(rng.randint(0, 28, E), jnp.int32)
    targets = jnp.asarray(rng.rand(E, 2) * 100, jnp.float32)
    weights = jnp.asarray(rng.rand(E, 2), jnp.float32)
    valid = jnp.asarray(rng.rand(E) < 0.92)
    slot_map = jnp.asarray(
        np.where(np.arange(4096) < 16, np.arange(4096), -1), jnp.int32)
    return ba.BAProblem(poses, intr, pt_xy, pt_invd, pt_host, kk, jj,
                        targets, weights, valid), slot_map


def main():
    rng = np.random.RandomState(0)
    problem, slot_map = make_problem(rng)

    for iters in (0, 1, 2, 4):
        f = jax.jit(functools.partial(
            ba.bundle_adjust, num_iters=iters, window=16))
        bench(f"bundle_adjust {iters} iters", f, problem, slot_map)

    # stage-ablated single iteration (mirrors ba.gn_iteration)
    NP = problem.poses.shape[0]
    NK = problem.pt_xy.shape[0]
    NE = problem.kk.shape[0]
    P = 16
    ii = problem.pt_host[problem.kk]
    jj = problem.kk * 0 + problem.jj
    kk = problem.kk
    li = slot_map[ii]
    lj = slot_map[jj]
    edge_valid = problem.valid & (ii != jj)
    _HI = jax.lax.Precision.HIGHEST

    def stage(until):
        def f(poses, invd):
            g_i = poses[ii]
            g_j = poses[jj]
            k_i = problem.intrinsics[ii]
            k_j = problem.intrinsics[jj]
            xy = problem.pt_xy[kk]
            d = invd[kk]
            zeros6 = jnp.zeros((NE, 6))
            zeros1 = jnp.zeros((NE,))

            def res_fn(xi_i, xi_j, dd, g_i, g_j, k_i, k_j, xy, d, tgt):
                return ba._edge_residual(
                    xi_i, xi_j, dd, g_i, g_j, k_i, k_j, xy, d, tgt)

            jac = jax.vmap(
                jax.jacfwd(res_fn, argnums=(0, 1, 2), has_aux=True))
            (J_i, J_j, J_d), z = jac(zeros6, zeros6, zeros1, g_i, g_j,
                                     k_i, k_j, xy, d, problem.targets)
            r, _ = jax.vmap(res_fn)(zeros6, zeros6, zeros1, g_i, g_j,
                                    k_i, k_j, xy, d, problem.targets)
            if until == "jac":
                return jnp.sum(J_i) + jnp.sum(J_j) + jnp.sum(J_d) + jnp.sum(r)
            ok = (edge_valid & (z > 0.1)
                  & jnp.all(jnp.isfinite(r), axis=-1)
                  & (jnp.linalg.norm(r, axis=-1) < 250.0))
            w = problem.weights * ok[:, None]
            J_i = jnp.where((li >= 0)[:, None, None], J_i, 0.0)
            J_j = jnp.where((lj >= 0)[:, None, None], J_j, 0.0)
            sl_i = jnp.clip(li, 0, P - 1)
            sl_j = jnp.clip(lj, 0, P - 1)
            wJ_i = w[..., None] * J_i
            wJ_j = w[..., None] * J_j
            wJ_d = w * J_d
            oh_i = jax.nn.one_hot(jnp.where(li >= 0, sl_i, P), P + 1)[:, :P]
            oh_j = jax.nn.one_hot(jnp.where(lj >= 0, sl_j, P), P + 1)[:, :P]
            B = jnp.zeros((P, P, 6, 6))
            for (Ja, oa) in ((J_i, oh_i), (J_j, oh_j)):
                for (Jb, ob) in ((wJ_i, oh_i), (wJ_j, oh_j)):
                    blk = jnp.einsum("eca,ecb->eab", Ja, Jb, precision=_HI)
                    tmp = (ob[:, :, None] * blk.reshape(-1, 1, 36)).reshape(
                        -1, P * 36)
                    B = B + jnp.matmul(oa.T, tmp, precision=_HI).reshape(
                        P, P, 6, 6)
            if until == "B":
                return jnp.sum(B)
            oh_k = jax.nn.one_hot(kk, NK)
            wr = -(w * r)
            v = jnp.matmul(
                oh_i.T, jnp.einsum("eca,ec->ea", J_i, wr, precision=_HI),
                precision=_HI)
            v = v + jnp.matmul(
                oh_j.T, jnp.einsum("eca,ec->ea", J_j, wr, precision=_HI),
                precision=_HI)
            C = jnp.matmul(oh_k.T, jnp.sum(wJ_d * J_d, -1), precision=_HI)
            w_d = jnp.matmul(oh_k.T, jnp.sum(wJ_d * (-r), -1), precision=_HI)
            u_i = jnp.einsum("eca,ec->ea", J_i, wJ_d, precision=_HI)
            u_j = jnp.einsum("eca,ec->ea", J_j, wJ_d, precision=_HI)
            zz = (oh_i[:, :, None] * u_i[:, None, :]).reshape(-1, P * 6)
            zz = zz + (oh_j[:, :, None] * u_j[:, None, :]).reshape(-1, P * 6)
            U = jnp.matmul(oh_k.T, zz, precision=_HI).reshape(NK, P, 6)
            if until == "depth":
                return jnp.sum(C) + jnp.sum(w_d) + jnp.sum(U) + jnp.sum(v)
            C_damped = C * 1.0001 + 1e-7
            Cinv = 1.0 / C_damped
            S = B - jnp.einsum("kpa,k,kqb->pqab", U, Cinv, U, precision=_HI)
            rhs = v - jnp.einsum("kpa,k,k->pa", U, Cinv, w_d, precision=_HI)
            H = S.transpose(0, 2, 1, 3).reshape(P * 6, P * 6)
            H = H + jnp.diag(1e-4 * jnp.diagonal(H) + 0.1)
            dx = jnp.linalg.solve(H, rhs.reshape(P * 6)).reshape(P, 6)
            dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
            dz = Cinv * (w_d - jnp.einsum("kpa,pa->k", U, dx, precision=_HI))
            oh_k2 = jax.nn.one_hot(kk, NK)
            touched = jnp.matmul(oh_k2.T, ok.astype(jnp.float32),
                                 precision=_HI) > 0
            dz = jnp.where(touched & jnp.isfinite(dz), dz, 0.0)
            pose_slot = slot_map[jnp.arange(NP)]
            xi_full = jnp.where(
                (pose_slot >= 0)[:, None],
                dx[jnp.clip(pose_slot, 0, P - 1)], 0.0)
            poses2 = lie.se3_retract(poses, xi_full)
            invd2 = jnp.clip(invd + dz, 1e-3, 10.0)
            return jnp.sum(poses2) + jnp.sum(invd2)
        return jax.jit(f)

    for until in ("jac", "B", "depth", "full"):
        bench(f"1 iter through {until}", stage(until),
              problem.poses, problem.pt_invd)


if __name__ == "__main__":
    main()
