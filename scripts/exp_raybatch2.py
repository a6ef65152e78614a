"""Bisect the ~5 ms ray-batch sampling stage (VERDICT r3 item 5 / weak #5).

exp_raybatch pinned the per-gather-op floor (~0.8 ms/flat take) and the
packed keyframe buffer cut the stage to TWO takes, predicting ~1.6 ms —
but exp_floor still measures the isolated stage at ~5.0 ms
(tpu_runs/exp_floor_r4.log). This script bisects sample_ray_batch into
its actual parts at production shape (K=192 @ 360x640, 4096 rays):

  a. full sample_ray_batch (the 5 ms under attribution)
  b. rng only: the three randints
  c. pose chain only: se3_exp + matrix + compose at K rows + the [R, 20]
     composed-pose/intrinsics row take + generate_rays
  d. pixel take only: the flat interleaved-pixel gather (fixed indices)
  e. full minus rng (fixed frame/py/px fed in)

Usage: python scripts/exp_raybatch2.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu" or "--cpu-smoke" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def bench(fn, *args, n=40, windows=3, warm=13):
    out = None
    for _ in range(warm):
        out = fn(*args)
    first = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(first[..., :1].astype(jnp.float32)))
    best = 1e9
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        first = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(first[..., :1].astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def main():
    from nerf_vo_tpu.utils.jax_setup import setup_jax

    setup_jax()
    from nerf_vo_tpu.core import cameras, conventions, lie
    from nerf_vo_tpu.mapping import keyframe_buffer as kb

    K, H, W, R = 192, 360, 640, 4096
    rng = np.random.default_rng(0)
    buf = kb.create(K, H, W)
    n_kf = 32
    c2w = np.tile(np.eye(4, dtype=np.float32), (n_kf, 1, 1))
    c2w[:, :3, 3] = rng.uniform(-0.5, 0.5, (n_kf, 3))
    packet = {
        "intrinsics": jnp.tile(
            jnp.asarray([320.0, 320.0, W / 2, H / 2]), (n_kf, 1)
        ),
        "c2w": jnp.asarray(c2w),
        "color": jnp.asarray(rng.uniform(0, 1, (n_kf, H, W, 3)), jnp.float32),
        "depth": jnp.asarray(rng.uniform(0.5, 4.0, (n_kf, H, W)), jnp.float32),
        "normal": jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (n_kf, H, W, 1)),
    }
    buf = kb.insert(buf, jnp.arange(n_kf), packet)
    deltas = jnp.zeros((K, 6), jnp.float32)
    key = jax.random.PRNGKey(0)

    # a. full stage
    f = jax.jit(lambda b, d, k: kb.sample_ray_batch(b, d, k, R))
    dt = bench(f, buf, deltas, key)
    print(f"a. full sample_ray_batch:          {dt*1e3:7.3f} ms", flush=True)

    # a'. full stage, pose deltas off
    f = jax.jit(lambda b, k: kb.sample_ray_batch(b, None, k, R))
    dt = bench(f, buf, key)
    print(f"a'. full, no pose chain:           {dt*1e3:7.3f} ms", flush=True)

    # b. rng only
    def rng_only(k):
        k1, k2, k3 = jax.random.split(k, 3)
        frame = jax.random.randint(k1, (R,), 0, n_kf)
        py = jax.random.randint(k2, (R,), 0, H)
        px = jax.random.randint(k3, (R,), 0, W)
        return frame + py + px

    f = jax.jit(rng_only)
    dt = bench(f, key)
    print(f"b. rng only (3x randint):          {dt*1e3:7.3f} ms", flush=True)

    # c. pose chain + row take + ray gen (fixed frame/pixels)
    frame = jnp.asarray(rng.integers(0, n_kf, R), jnp.int32)
    py = jnp.asarray(rng.integers(0, H, R), jnp.int32)
    px = jnp.asarray(rng.integers(0, W, R), jnp.int32)

    def pose_chain(b, d):
        delta = lie.se3_matrix(lie.se3_exp(d))
        c2w_all = conventions.apply_transform(delta, b.c2w)
        fr = jnp.take(
            jnp.concatenate([c2w_all.reshape(K, 16), b.intrinsics], axis=1),
            frame, axis=0,
        )
        c2w_r = fr[:, :16].reshape(R, 4, 4)
        intr = fr[:, 16:20]
        xy = jnp.stack([px, py], axis=-1).astype(jnp.float32) + 0.5
        return cameras.generate_rays(c2w_r, intr, xy, "opengl")

    f = jax.jit(pose_chain)
    dt = bench(f, buf, deltas)
    print(f"c. pose chain + row take + rays:   {dt*1e3:7.3f} ms", flush=True)

    # d. pixel take only (fixed indices)
    C = buf.channels

    def pixel_take(b):
        base = ((frame * H + py) * W + px) * C
        return jnp.take(
            b.pixels.reshape(-1),
            base[:, None] + jnp.arange(C, dtype=jnp.int32)[None, :],
            axis=0,
        )

    f = jax.jit(pixel_take)
    dt = bench(f, buf)
    print(f"d. pixel take only:                {dt*1e3:7.3f} ms", flush=True)

    # d2. pixel take as a FLAT 1-D index (R*C descriptors, one per element)
    def pixel_take_flat(b):
        base = ((frame * H + py) * W + px) * C
        flat = (base[:, None]
                + jnp.arange(C, dtype=jnp.int32)[None, :]).reshape(-1)
        return jnp.take(b.pixels.reshape(-1), flat, axis=0).reshape(R, C)

    f = jax.jit(pixel_take_flat)
    dt = bench(f, buf)
    print(f"d2. pixel take flat [R*C]:         {dt*1e3:7.3f} ms", flush=True)

    # d3. SPLIT pixel takes: the 4.78 ms measured for ONE take of 28K
    # descriptors is ~167 ns/descriptor — serial HBM latency, no DMA
    # pipelining. Independent takes overlap on the DMA engines (the table
    # gathers' _split_take measured 2x) — sweep the split factor.
    for s in (2, 4, 8, 16):
        def pixel_take_split(b, s=s):
            base = ((frame * H + py) * W + px) * C
            idx2 = base[:, None] + jnp.arange(C, dtype=jnp.int32)[None, :]
            k = R // s
            parts = [
                jnp.take(b.pixels.reshape(-1), idx2[j * k:(j + 1) * k],
                         axis=0)
                for j in range(s)
            ]
            return jnp.concatenate(parts, axis=0)

        f = jax.jit(pixel_take_split)
        dt = bench(f, buf)
        print(f"d3. pixel take split {s:2d}:           {dt*1e3:7.3f} ms",
              flush=True)

    # (a [K*H*W, C] row-take formulation OOMs: XLA materializes the
    # C=7-lane reshape padded to 128 lanes = 22.6 GB — the verify-skill
    # "tiny trailing dim" gotcha; keep pixel gathers on FLAT views.)

    # d6. OPERAND-SIZE scaling: gather the same 28K descriptors from the
    # first half of the buffer only. If the 4.78 ms is an operand-bytes
    # bound (the emitter effectively scanning the 1.24 GB buffer at
    # ~260 GB/s), this halves; if it is per-descriptor latency, it holds.
    halfK = 96

    def pixel_take_half(b):
        fr2 = jnp.minimum(frame, halfK - 1)
        base = ((fr2 * H + py) * W + px) * C
        # row-slice FIRST, then collapse: slicing the flat view instead made
        # XLA materialize a [K*H*W, C] reshape lane-padded to 128 = 22.6 GB
        # (HBM OOM, tpu_runs/exp_raybatch2.log 09:04)
        flat = b.pixels[:halfK].reshape(-1)
        return jnp.take(
            flat,
            base[:, None] + jnp.arange(C, dtype=jnp.int32)[None, :],
            axis=0,
        )

    f = jax.jit(pixel_take_half)
    dt = bench(f, buf)
    print(f"d6. pixel take, half operand:      {dt*1e3:7.3f} ms", flush=True)

    # d7. DESCRIPTOR-COUNT scaling: 2x rays from the full buffer.
    frame2 = jnp.concatenate([frame, frame])
    py2 = jnp.concatenate([py, py])
    px2 = jnp.concatenate([px, jnp.flip(px)])

    def pixel_take_2x(b):
        base = ((frame2 * H + py2) * W + px2) * C
        return jnp.take(
            b.pixels.reshape(-1),
            base[:, None] + jnp.arange(C, dtype=jnp.int32)[None, :],
            axis=0,
        )

    f = jax.jit(pixel_take_2x)
    dt = bench(f, buf)
    print(f"d7. pixel take, 2x descriptors:    {dt*1e3:7.3f} ms", flush=True)

    # d8. halve the operand BYTES: gather from a bf16 shadow of the pixel
    # buffer (color/depth/normal survive bf16 for training targets). If
    # operand-bytes-bound this buys ~2x on its own.
    pix_bf16 = jnp.asarray(buf.pixels, jnp.bfloat16)

    def pixel_take_bf16(p):
        base = ((frame * H + py) * W + px) * C
        return jnp.take(
            p.reshape(-1),
            base[:, None] + jnp.arange(C, dtype=jnp.int32)[None, :],
            axis=0,
        )

    f = jax.jit(pixel_take_bf16)
    dt = bench(f, pix_bf16)
    print(f"d8. pixel take, bf16 operand:      {dt*1e3:7.3f} ms", flush=True)

    # d10. SLICE-SIZED gather: each pixel's C channels are CONTIGUOUS in
    # the packed layout, so vmap(dynamic_slice (C,)) lowers to ONE gather
    # of R descriptors x C elements — 7x fewer descriptors than the [R, C]
    # scalar take. If the 167 ns is per-descriptor (d/d2/d3 all say so),
    # this is ~0.7 ms.
    def pixel_take_slice(b):
        base = ((frame * H + py) * W + px) * C
        flat = b.pixels.reshape(-1)
        return jax.vmap(
            lambda s: jax.lax.dynamic_slice(flat, (s,), (C,))
        )(base)

    f = jax.jit(pixel_take_slice)
    ref = jax.jit(pixel_take)(buf)
    got = f(buf)
    assert jnp.allclose(got, ref), "slice-gather mismatch"
    dt = bench(f, buf)
    print(f"d10. pixel take slice-size C:      {dt*1e3:7.3f} ms", flush=True)

    # d11. same, bf16 operand (stacks with d8 if both win)
    def pixel_take_slice_bf16(p):
        base = ((frame * H + py) * W + px) * C
        flat = p.reshape(-1)
        return jax.vmap(
            lambda s: jax.lax.dynamic_slice(flat, (s,), (C,))
        )(base)

    f = jax.jit(pixel_take_slice_bf16)
    dt = bench(f, pix_bf16)
    print(f"d11. slice-size C, bf16 operand:   {dt*1e3:7.3f} ms", flush=True)

    # d9. SORTED indices: if the gather is DRAM-page-locality-bound,
    # sorting the 28K flat indices (then unsorting the result) converts
    # random walks into ~sequential page visits. Sort costs ~26 ns/desc
    # (exp_scatter4) = ~0.75 ms at 28K — worth it if it unlocks 3 ms.
    def pixel_take_sorted(b):
        base = ((frame * H + py) * W + px) * C
        flat = (base[:, None]
                + jnp.arange(C, dtype=jnp.int32)[None, :]).reshape(-1)
        order = jnp.argsort(flat)
        got = jnp.take(b.pixels.reshape(-1), flat[order], axis=0)
        inv = jnp.zeros_like(order).at[order].set(
            jnp.arange(order.shape[0], dtype=order.dtype)
        )
        return jnp.take(got, inv, axis=0).reshape(R, C)

    f = jax.jit(pixel_take_sorted)
    dt = bench(f, buf)
    print(f"d9. pixel take, sorted+unsort:     {dt*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
