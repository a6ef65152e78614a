"""Micro-time each non-stubbed op of vo_update at production shapes."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

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


def main():
    rng = np.random.RandomState(0)
    R, P, C, D = 32, 96, 128, 384
    E, E2 = 32768, 33792
    N = 4096
    KL = 15 * P
    H4, W4 = 90, 160

    gmap = jnp.asarray(rng.randn(R, P, 3, 3, C), jnp.bfloat16)
    imap = jnp.asarray(rng.randn(R, P, D), jnp.bfloat16)
    hidden = jnp.asarray(rng.randn(E, D), jnp.float32)
    e_target = jnp.asarray(rng.randn(E, 2), jnp.float32)
    poses = jnp.asarray(rng.randn(N, 7), jnp.float32)
    pt_xy = jnp.asarray(rng.rand(N, P, 2) * 80, jnp.float32)
    pt_invd = jnp.asarray(rng.rand(N, P) + 0.5, jnp.float32)
    intr = jnp.asarray(np.tile([130.0, 130.0, 80.0, 45.0], (N, 1)), jnp.float32)

    ridx = jnp.asarray(rng.randint(0, R, E2), jnp.int32)
    pidx = jnp.asarray(rng.randint(0, P, E2), jnp.int32)
    ridx_e = jnp.asarray(rng.randint(0, R, E), jnp.int32)
    pidx_e = jnp.asarray(rng.randint(0, P, E), jnp.int32)
    kk = jnp.asarray(rng.randint(0, KL, E), jnp.int32)
    ii = jnp.asarray(rng.randint(0, 15, E), jnp.int32)
    jj = jnp.asarray(rng.randint(0, 28, E), jnp.int32)
    pg = jnp.asarray(rng.randint(0, N * P, KL), jnp.int32)
    e_new = jnp.asarray(rng.rand(E) < 0.1)

    bench("pf_s gather gmap[r,p] -> [E2,3,3,C] bf16",
          jax.jit(lambda a, b: gmap[a, b]), ridx, pidx)
    bench("pf_s gather + reshape/astype",
          jax.jit(lambda a, b: gmap[a, b].reshape(E2, 9, C)), ridx, pidx)
    bench("im_e gather imap[r,p] -> [E,384] f32",
          jax.jit(lambda a, b: imap[a, b].astype(jnp.float32)),
          ridx_e, pidx_e)
    bench("hidden where x2 [E,384]",
          jax.jit(lambda h, m: (jnp.where(m[:, None], 0.0, h),
                                jnp.where(m[:, None], h, h * 0.5))),
          hidden, e_new)

    xy_k = pt_xy.reshape(-1, 2)[pg]
    invd_k = pt_invd.reshape(-1)[pg]

    def reproj(po, xk, dk):
        c, z = ba.reproject_edges(po, intr, xk[kk], dk[kk], ii[:] * 0 + ii,
                                  jj)
        return c, z

    bench("reproject_edges [E]", jax.jit(reproj), poses, xy_k, invd_k)

    bench("invd scatter back [KL]",
          jax.jit(lambda f, v: f.reshape(-1).at[pg].set(v).reshape(N, P)),
          pt_invd, invd_k * 1.1)

    # frame distance
    def fd(po, d):
        xy = pt_xy[5]
        tgt, z = ba.reproject_edges(
            po, intr, xy, d[5], jnp.full((P,), 5, jnp.int32),
            jnp.full((P,), 9, jnp.int32))
        disp = jnp.linalg.norm(tgt - xy, axis=-1)
        ok = (z > 0.1) & jnp.all(jnp.isfinite(tgt), -1)
        return jnp.sum(disp * ok) / jnp.clip(jnp.sum(ok), 1.0)

    bench("frame_distance", jax.jit(fd), poses, pt_invd)

    # meta unpack: bitcasts on uint8 buffer
    meta = jnp.asarray(rng.randint(0, 255, 340000), jnp.uint8)

    def unpack(m):
        a = jax.lax.bitcast_convert_type(
            m[: 2 * E].reshape(-1, 2), jnp.int16).astype(jnp.int32)
        b = jax.lax.bitcast_convert_type(
            m[2 * E: 4 * E].reshape(-1, 2), jnp.int16).astype(jnp.int32)
        c = jax.lax.bitcast_convert_type(
            m[4 * E: 4 * E + N], jnp.int8).astype(jnp.int32)
        return a, b, c

    bench("meta bitcast unpack", jax.jit(unpack), meta)

    # corr POST-processing at production size (the pallas wrapper's XLA tail)
    from nerf_vo_tpu.ops.correlation_pallas import EB, corr_window_dot

    n_blocks = E2 // EB
    fpad = jnp.asarray(
        rng.randn(R, H4 + 16, W4 + 48, C), jnp.bfloat16)
    pf9 = jnp.asarray(rng.randn(E2, 9, C), jnp.bfloat16)
    center = jnp.asarray(rng.rand(E2, 2) * 80, jnp.float32)
    bf = jnp.asarray(np.sort(rng.randint(0, R, n_blocks)), jnp.int32)

    bench("corr_window_dot kernel only",
          jax.jit(lambda b, p, f: corr_window_dot(
              b, jnp.zeros((E2, 2), jnp.int32).at[:, 0].add(8), p, f,
              n_blocks)), bf, pf9, fpad)

    from nerf_vo_tpu.ops.correlation_pallas import patch_correlation_pallas

    fmap2 = jnp.asarray(rng.randn(R, H4 // 2, W4 // 2, C), jnp.bfloat16)
    fmap1 = jnp.asarray(rng.randn(R, H4, W4, C), jnp.bfloat16)
    pf4 = jnp.asarray(rng.randn(E2, 3, 3, C), jnp.bfloat16)
    bench("patch_correlation_pallas full",
          jax.jit(lambda p, f1, f2, b, c: patch_correlation_pallas(
              p, f1, f2, b, c, 3, n_blocks)),
          pf4, fmap1, fmap2, bf, center)


if __name__ == "__main__":
    main()
