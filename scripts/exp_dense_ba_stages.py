"""Stage decomposition of one dense-GN iteration (DROID BA).

exp_dense_ba_cut pinned the solver at 34.9 ms for 2 GN iters (17.5/iter,
buffer-size-independent). This times the iteration's pieces in isolation
at production shapes (E=96 edges incl. inactive, hw=1200, window 23):

  1. jacfwd chain (J_i, J_j, J_d + residual via forward-mode through
     the SE3 reprojection) — the suspected bulk
  2. residual only (no jacobians)
  3. Gs window-row assembly + B = Gs^T Gs + v (the reduced system)
  4. depth terms + scatter (C, w_d, U accumulation)

If (1) dominates, closed-form reprojection Jacobians are the round-6
lever; if (3), the one-hot window-row materialization is.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    for l in jax.tree_util.tree_leaves(x):
        if hasattr(l, "dtype"):
            float(jnp.sum(jnp.asarray(l, jnp.float32).ravel()[:1]))
            return


def bench(fn, *a, n=10, windows=3):
    out = fn(*a)
    sync(out)
    best = 1e9
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*a)
        sync(out)
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3


def main():
    from nerf_vo_tpu.utils.jax_setup import setup_jax

    setup_jax()
    from nerf_vo_tpu.ops.ba import _edge_residual

    B, h, w = 128, 30, 40
    hw = h * w
    E, P = 96, 23
    rng = np.random.default_rng(0)
    poses = jnp.asarray(
        np.concatenate([rng.normal(0, 0.1, (B, 3)),
                        np.tile([0, 0, 0, 1.0], (B, 1))], 1), jnp.float32)
    disps = jnp.asarray(rng.uniform(0.3, 2.0, (B, hw)), jnp.float32)
    intr = jnp.tile(jnp.asarray([32.0, 32.0, w / 2, h / 2]), (B, 1))
    ii = jnp.asarray(rng.integers(0, 25, E), jnp.int32)
    jj = jnp.asarray((np.asarray(ii) + 1 + rng.integers(0, 3, E)) % 25,
                     jnp.int32)
    tgt = jnp.asarray(rng.uniform(0, [w - 1, h - 1], (E, hw, 2)), jnp.float32)
    wgt = jnp.asarray(rng.uniform(0.1, 1.0, (E, hw, 2)), jnp.float32)
    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                          jnp.arange(w, dtype=jnp.float32), indexing="ij")
    grid = jnp.stack([xs, ys], -1).reshape(hw, 2)
    li = jnp.asarray(rng.integers(0, P, E), jnp.int32)
    lj = jnp.asarray(rng.integers(0, P, E), jnp.int32)

    zeros6 = jnp.zeros((6,))

    def res_fn(xi_i, xi_j, dd, g_i, g_j, k_i, k_j, xy, d0, t):
        return _edge_residual(xi_i, xi_j, dd, g_i, g_j, k_i, k_j, xy, d0, t)

    jac_pix = jax.vmap(jax.jacfwd(res_fn, argnums=(0, 1, 2), has_aux=True),
                       in_axes=(None, None, 0, None, None, None, None,
                                0, 0, 0))
    jac = jax.vmap(jac_pix, in_axes=(None, None, None, 0, 0, 0, 0, None,
                                     0, 0))

    def jac_only(poses, disps):
        g_i, g_j = poses[ii], poses[jj]
        k_i, k_j = intr[ii], intr[jj]
        d = disps[ii]
        return jac(zeros6, zeros6, jnp.zeros((hw,)), g_i, g_j, k_i, k_j,
                   grid, d, tgt)

    out = jax.jit(jac_only)(poses, disps)
    ms = bench(jax.jit(jac_only), poses, disps)
    print(f"1. jacfwd chain (J_i, J_j, J_d + z): {ms:8.2f} ms", flush=True)

    res_pix = jax.vmap(res_fn, in_axes=(None, None, 0, None, None, None,
                                        None, 0, 0, 0))
    res_all = jax.vmap(res_pix, in_axes=(None, None, None, 0, 0, 0, 0,
                                         None, 0, 0))

    def res_only(poses, disps):
        g_i, g_j = poses[ii], poses[jj]
        return res_all(zeros6, zeros6, jnp.zeros((hw,)), g_i, g_j,
                       intr[ii], intr[jj], grid, disps[ii], tgt)

    ms = bench(jax.jit(res_only), poses, disps)
    print(f"2. residual only:                    {ms:8.2f} ms", flush=True)

    (J_i, J_j, J_d), z = out
    r = jnp.asarray(rng.normal(0, 0.5, (E, hw, 2)), jnp.float32)

    def reduced_system(J_i, J_j, J_d, r):
        oh_i = jax.nn.one_hot(li, P)
        oh_j = jax.nn.one_hot(lj, P)
        sw = jnp.sqrt(wgt)
        Gs = ((sw[..., None] * J_i)[..., None, :]
              * oh_i[:, None, None, :, None]
              + (sw[..., None] * J_j)[..., None, :]
              * oh_j[:, None, None, :, None]).reshape(E, hw, 2, P * 6)
        Gf = Gs.reshape(E * hw * 2, P * 6)
        Bm = jnp.matmul(Gf.T, Gf, precision=jax.lax.Precision.HIGHEST)
        v = jnp.matmul(Gf.T, (sw * -r).reshape(-1),
                       precision=jax.lax.Precision.HIGHEST)
        return Bm, v, Gs

    ms = bench(jax.jit(reduced_system), J_i, J_j, J_d, r)
    print(f"3. Gs assembly + reduced system:     {ms:8.2f} ms", flush=True)

    def depth_terms(J_d, r):
        wJ_d = wgt * J_d
        C = jnp.zeros((B, hw)).at[ii].add(jnp.sum(wJ_d * J_d, -1))
        w_d = jnp.zeros((B, hw)).at[ii].add(jnp.sum(wJ_d * (-r), -1))
        return C, w_d

    ms = bench(jax.jit(depth_terms), J_d, r)
    print(f"4. depth C/w scatter terms:          {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
