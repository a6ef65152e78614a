"""Corr kernel block-size (EB) sweep at current production shapes."""

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

SY, SX = 10, 24


def make_kernel(EB):
    def kern(block_frame_ref, ixiy_ref, pf_ref, fmap_ref, out_ref):
        C = pf_ref.shape[-1]
        for e in range(EB):
            iy = ixiy_ref[e, 0]
            ix8 = pl.multiple_of(ixiy_ref[e, 1], 8)
            win = fmap_ref[0, pl.ds(iy, SY), pl.ds(ix8, SX), :]
            win2 = win.reshape(SY * SX, C)
            cw = jax.lax.dot_general(
                pf_ref[e], win2, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            out_ref[e] = cw.astype(out_ref.dtype)
    return kern


def make_call(EB, n_blocks, H, W, C):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[
            pl.BlockSpec((EB, 2), lambda i, bf: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((EB, 9, C), lambda i, bf: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, W, C), lambda i, bf: (bf[i], 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((EB, 9, SY * SX), lambda i, bf: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        make_kernel(EB),
        out_shape=jax.ShapeDtypeStruct((n_blocks * EB, 9, SY * SX),
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
    print(f"{name}: {best*1e3:.2f} ms", flush=True)
    return out


def main():
    H4, W4, C = 90, 160, 128
    R = 32
    E2 = 33792
    rng = np.random.RandomState(0)
    PAD_Y, PAD_X = 8, 24
    Hp, Wp = H4 + 2 * PAD_Y, W4 + 2 * PAD_X
    fpad = jnp.asarray(rng.randn(R, Hp, Wp, C), jnp.bfloat16)
    pf = jnp.asarray(rng.randn(E2, 9, C), jnp.bfloat16)
    iy = rng.randint(0, Hp - SY, E2)
    ix8 = (rng.randint(0, Wp - SX, E2) // 8) * 8
    ixiy = jnp.asarray(np.stack([iy, ix8], -1), jnp.int32)

    for EB in (16, 32, 64, 128):
        n_blocks = E2 // EB
        bf = jnp.asarray(np.sort(rng.randint(0, R, n_blocks)), jnp.int32)
        call = make_call(EB, n_blocks, Hp, Wp, C)
        f = jax.jit(lambda b, xy, p, fm, c=call: c(b, xy, p, fm))
        timeit(f"EB={EB} ({n_blocks} blocks)", lambda: f(bf, ixiy, pf, fpad))


if __name__ == "__main__":
    main()
