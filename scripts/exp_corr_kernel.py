"""Kernel variant experiments for the patch-correlation Pallas op."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nerf_vo_tpu.ops.correlation_pallas import EB, corr_window_dot

SY, SX = 16, 32


def kernel_v2(block_frame_ref, ixiy_ref, pf_ref, fmap_ref, out_ref):
    """Direct [16, 512] dot: pf [16,C] x win2 [512,C] contracted on C."""
    C = pf_ref.shape[-1]
    for e in range(EB):
        iy = ixiy_ref[e, 0]
        ix8 = pl.multiple_of(ixiy_ref[e, 1], 8)
        win = fmap_ref[0, pl.ds(iy, SY), pl.ds(ix8, SX), :]
        win2 = win.reshape(SY * SX, C)
        cw = jax.lax.dot_general(
            pf_ref[e], win2, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [16, 512]
        out_ref[e] = cw.astype(out_ref.dtype)


def kernel_v3(block_frame_ref, ixiy_ref, pf_ref, fmap_ref, out_ref):
    """SLICE_X=24: pf [16,C] x win2 [384,C] -> [16, 384]."""
    C = pf_ref.shape[-1]
    for e in range(EB):
        iy = ixiy_ref[e, 0]
        ix8 = pl.multiple_of(ixiy_ref[e, 1], 8)
        win = fmap_ref[0, pl.ds(iy, SY), pl.ds(ix8, 24), :]
        win2 = win.reshape(SY * 24, C)
        cw = jax.lax.dot_general(
            pf_ref[e], win2, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[e] = cw.astype(out_ref.dtype)


def make_call(kernel, out_w, n_blocks, H, W, C, R, sx):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((EB, 2), lambda i, bf: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((EB, 16, C), lambda i, bf: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, W, C), lambda i, bf: (bf[i], 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((EB, 16, out_w), lambda i, bf: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_blocks * EB, 16, out_w),
                                       jnp.bfloat16),
        grid_spec=grid_spec,
    )


def timeit(name, fn, n=20):
    out = fn()
    float(jnp.sum(out.astype(jnp.float32).ravel()[:1]))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        float(jnp.sum(out.astype(jnp.float32).ravel()[:1]))
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"{name}: {best*1e3:.2f} ms")
    return out


def main():
    H4, W4, C = 90, 160, 128
    R = 32
    E2 = 32768 + R * EB
    n_blocks = E2 // EB
    rng = np.random.RandomState(0)

    PAD_Y, PAD_X = 16, 32
    Hp, Wp = H4 + 2 * PAD_Y, W4 + 2 * PAD_X
    fpad = jnp.asarray(rng.randn(R, Hp, Wp, C), jnp.bfloat16)
    pf16 = jnp.asarray(rng.randn(E2, 16, C), jnp.bfloat16)
    iy = rng.randint(0, Hp - SY, E2)
    ix8 = (rng.randint(0, Wp - SX, E2) // 8) * 8
    ixiy = jnp.asarray(np.stack([iy, ix8], -1), jnp.int32)
    block_frame = jnp.asarray(np.sort(rng.randint(0, R, n_blocks)), jnp.int32)

    v1 = jax.jit(lambda bf, xy, p, f: corr_window_dot(bf, xy, p, f, n_blocks))
    o1 = timeit("v1 current ([512,16] dot + cw.T)",
                lambda: v1(block_frame, ixiy, pf16, fpad))

    c2 = make_call(kernel_v2, 512, n_blocks, Hp, Wp, C, R, SX)
    j2 = jax.jit(lambda bf, xy, p, f: c2(bf, xy, p, f))
    o2 = timeit("v2 direct [16,512] dot",
                lambda: j2(block_frame, ixiy, pf16, fpad))
    err = jnp.max(jnp.abs(o1.astype(jnp.float32) - o2.astype(jnp.float32)))
    print("v1 vs v2 max err:", float(err))

    c3 = make_call(kernel_v3, 384, n_blocks, Hp, Wp, C, R, 24)
    j3 = jax.jit(lambda bf, xy, p, f: c3(bf, xy, p, f))
    o3 = timeit("v3 [16,384] SLICE_X=24",
                lambda: j3(block_frame, ixiy, pf16, fpad))
    err = jnp.max(jnp.abs(
        o1.astype(jnp.float32).reshape(E2, 16, SY, SX)[..., :24]
        - o3.astype(jnp.float32).reshape(E2, 16, SY, 24)))
    print("v1 vs v3 max err:", float(err))


if __name__ == "__main__":
    main()


def kernel_v4(block_frame_ref, ixiy_ref, pf_ref, fmap_ref, out_ref):
    """SY=10, SX=24: win [10,24,C] -> [16, 240]."""
    C = pf_ref.shape[-1]
    for e in range(EB):
        iy = ixiy_ref[e, 0]
        ix8 = pl.multiple_of(ixiy_ref[e, 1], 8)
        win = fmap_ref[0, pl.ds(iy, 10), pl.ds(ix8, 24), :]
        win2 = win.reshape(240, C)
        cw = jax.lax.dot_general(
            pf_ref[e], win2, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[e] = cw.astype(out_ref.dtype)


def main_v4():
    H4, W4, C = 90, 160, 128
    R = 32
    E2 = 32768 + R * EB
    n_blocks = E2 // EB
    rng = np.random.RandomState(0)
    PAD_Y, PAD_X = 16, 32
    Hp, Wp = H4 + 2 * PAD_Y, W4 + 2 * PAD_X
    fpad = jnp.asarray(rng.randn(R, Hp, Wp, C), jnp.bfloat16)
    pf16 = jnp.asarray(rng.randn(E2, 16, C), jnp.bfloat16)
    iy = rng.randint(0, Hp - SY, E2)
    ix8 = (rng.randint(0, Wp - SX, E2) // 8) * 8
    ixiy = jnp.asarray(np.stack([iy, ix8], -1), jnp.int32)
    block_frame = jnp.asarray(np.sort(rng.randint(0, R, n_blocks)), jnp.int32)

    v1 = jax.jit(lambda bf, xy, p, f: corr_window_dot(bf, xy, p, f, n_blocks))
    o1 = timeit("v1 again", lambda: v1(block_frame, ixiy, pf16, fpad))

    c4 = make_call(kernel_v4, 240, n_blocks, Hp, Wp, C, R, 24)
    j4 = jax.jit(lambda bf, xy, p, f: c4(bf, xy, p, f))
    o4 = timeit("v4 [16,240] SY=10 SX=24",
                lambda: j4(block_frame, ixiy, pf16, fpad))
    err = jnp.max(jnp.abs(
        o1.astype(jnp.float32).reshape(E2, 16, SY, SX)[:, :, :10, :24]
        - o4.astype(jnp.float32).reshape(E2, 16, 10, 24)))
    print("v1 vs v4 max err:", float(err))


if __name__ == "__main__":
    main_v4()
