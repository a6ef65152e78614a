"""Forward gather floor attack: Pallas VMEM-resident gather vs XLA take.

VERDICT r3 item 4. Arms, all at production scattered-level shape
(per level: 16384 bricks x 256 bf16 rows = 8 MB; M = 4096 rays x 48
samples = 196608 descriptors per level, 2 levels):

  1. XLA `_split_take` at splits 1/2/4/8/16 over the training layout
     [256, 49152] (lane-major gather) — the incumbent (4 splits measured
     2x once; "wider splits" is the cheap part of the VERDICT ask).
  2. Pallas `gather_cols`: whole level table resident in VMEM
     (brick-major [16384, 256]), idx tiles DMA'd to SMEM, dynamic-sublane
     row reads in an unrolled fori_loop (Mosaic has no row-gather op —
     see ops/gather_pallas.py module docstring for the first attempt's
     negative results).
  4. Pallas `gather_interp`: gather FUSED with the trilinear 27-corner
     reduce — the [M, 256] gathered block never touches HBM; output is
     [M, 8] features. Compare against arm 5.
  5. XLA gather + interp chain (take -> reshape -> weighted sum), the
     apples-to-apples baseline for arm 4.

Every Pallas arm is wrapped in try/except: a Mosaic lowering failure is a
recorded negative result, not a crash. Timing per STATUS.md rules: forced
scalar fetches, skip the first ~12 executions, best of 3 windows.

Usage: python scripts/exp_gather_pallas.py
"""

import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, *args, n=30, windows=3, warm=12, label=""):
    for _ in range(warm):
        out = fn(*args)
    if isinstance(out, tuple):
        out = out[0]
    float(jnp.sum(out[..., :1].astype(jnp.float32)))
    best = 1e9
    for _ in range(windows):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
            if isinstance(out, tuple):
                out = out[0]
        float(jnp.sum(out[..., :1].astype(jnp.float32)))
        best = min(best, (time.perf_counter() - t0) / n)
    return best


def main():
    from nerf_vo_tpu.utils.jax_setup import setup_jax

    setup_jax()
    from nerf_vo_tpu.ops import gather_pallas as gp
    from nerf_vo_tpu.ops import hash_grid as hg

    NB = 16384          # bricks per level at log2_hashmap_size=19
    R = 256             # 32 * F rows
    L = 3               # levels (1 one-hot dense + 2 scattered)
    M_LEVEL = 4096 * 48  # descriptors per scattered level
    rng = np.random.default_rng(0)
    tab_train = jnp.asarray(          # training layout [R, L*NB] f32
        rng.normal(0, 1e-2, (R, L * NB)), jnp.float32
    )
    tab_level = jnp.asarray(          # one level, brick-major, bf16
        rng.normal(0, 1e-2, (NB, R)), jnp.bfloat16
    )
    idx2 = jnp.asarray(               # 2-level global ids (levels 1..2)
        rng.integers(NB, 3 * NB, 2 * M_LEVEL), jnp.int32
    )
    idx1 = jnp.asarray(rng.integers(0, NB, M_LEVEL), jnp.int32)
    w = jnp.asarray(rng.uniform(0, 1, (M_LEVEL, 32)), jnp.bfloat16)

    print(f"shapes: level table [{NB},{R}] bf16 "
          f"({NB * R * 2 / 2**20:.1f} MB), M/level={M_LEVEL}", flush=True)

    # --- arm 1: XLA split_take sweep (both scattered levels in one take,
    # like _gather_scattered does) --------------------------------------
    tab_bf16 = tab_train.astype(jnp.bfloat16)
    for splits in (1, 2, 4, 8, 16):
        def take_split(t, ix, s=splits):
            k = ix.shape[0] // s
            parts = [jnp.take(t, ix[j * k: (j + 1) * k], axis=1)
                     for j in range(s)]
            return jnp.concatenate(parts, axis=1)

        f = jax.jit(take_split)
        dt = bench(f, tab_bf16, idx2)
        print(f"xla take  splits={splits:2d}: {dt*1e3:7.3f} ms "
              f"({dt / (2 * M_LEVEL) * 1e9:5.2f} ns/desc)", flush=True)

    # --- arm 2/3: Pallas VMEM-resident gather ---------------------------
    try:
        dt = bench(lambda t, i: gp.gather_cols(t, i), tab_level, idx1)
        out = gp.gather_cols(tab_level, idx1)
        ref = jnp.take(tab_level, idx1, axis=0)
        ok = bool(jnp.all(out == ref))
        print(f"pallas gather_cols (1 level): {dt*1e3:7.3f} ms "
              f"({dt / M_LEVEL * 1e9:5.2f} ns/desc) exact={ok}", flush=True)
    except Exception:
        print("pallas gather_cols FAILED to lower/run:", flush=True)
        traceback.print_exc(limit=3)

    # --- arm 4/5: fused gather+interp vs XLA chain ----------------------
    def xla_chain(t, ix, ww):
        g = jnp.take(t, ix, axis=0).astype(jnp.float32)  # [M, 256]
        return jnp.sum(
            g.reshape(-1, 32, 8) * ww.astype(jnp.float32)[:, :, None], axis=1
        )

    f = jax.jit(xla_chain)
    dt = bench(f, tab_level, idx1, w)
    print(f"xla gather+interp chain:      {dt*1e3:7.3f} ms "
          f"({dt / M_LEVEL * 1e9:5.2f} ns/desc)", flush=True)

    try:
        dt = bench(
            lambda t, i, ww: gp.gather_interp(t, i, ww, features=8),
            tab_level, idx1, w,
        )
        o = gp.gather_interp(tab_level, idx1, w, features=8)
        r = xla_chain(tab_level, idx1, w)
        err = float(jnp.max(jnp.abs(o.astype(jnp.float32) - r)))
        print(f"pallas gather_interp fused:   {dt*1e3:7.3f} ms "
              f"({dt / M_LEVEL * 1e9:5.2f} ns/desc) maxerr={err:.2e}",
              flush=True)
    except Exception:
        print("pallas gather_interp FAILED to lower/run:", flush=True)
        traceback.print_exc(limit=3)

    # --- arm 5b: reshape-free fused variant (one-hot MXU contraction;
    # the bounded follow-up from VERDICT r4 weak #6 — first fused
    # formulation that can actually lower if Mosaic accepts the iota
    # matmuls) ----------------------------------------------------------
    try:
        dt = bench(
            lambda t, i, ww: gp.gather_interp_mm(t, i, ww, features=8),
            tab_level, idx1, w,
        )
        o = gp.gather_interp_mm(tab_level, idx1, w, features=8)
        r = xla_chain(tab_level, idx1, w)
        err = float(jnp.max(jnp.abs(o.astype(jnp.float32) - r)))
        print(f"pallas gather_interp_mm:      {dt*1e3:7.3f} ms "
              f"({dt / M_LEVEL * 1e9:5.2f} ns/desc) maxerr={err:.2e}",
              flush=True)
    except Exception:
        print("pallas gather_interp_mm FAILED to lower/run:", flush=True)
        traceback.print_exc(limit=3)

    # --- arm 6: VMEM-resident Pallas scatter-accumulate vs XLA scatter ---
    # the backward table gradient: XLA's column scatter-add is pinned at
    # ~22-27 ns/descriptor (tpu_runs/exp_scatter4.log); this accumulates
    # into an 8 MB bf16 VMEM-resident table instead.
    g_cot = jnp.asarray(rng.normal(0, 1e-2, (M_LEVEL, R)), jnp.bfloat16)

    def xla_scatter(gg, ix):
        return jnp.zeros((R, NB), jnp.bfloat16).at[:, ix].add(gg.T)

    f = jax.jit(xla_scatter)
    dt = bench(f, g_cot, idx1)
    print(f"xla column scatter-add:       {dt*1e3:7.3f} ms "
          f"({dt / M_LEVEL * 1e9:5.2f} ns/desc)", flush=True)
    try:
        dt = bench(
            lambda gg, ix: gp.scatter_cols_accum(gg, ix, n_bricks=NB),
            g_cot, idx1,
        )
        # correctness on a small slice (full-f32 reference too big to
        # compare at bf16 tolerance anyway — check structure)
        out = gp.scatter_cols_accum(g_cot, idx1, n_bricks=NB)
        ref = xla_scatter(g_cot, idx1).T
        err = float(jnp.mean(jnp.abs(out.astype(jnp.float32)
                                     - ref.astype(jnp.float32))))
        print(f"pallas scatter_cols_accum:    {dt*1e3:7.3f} ms "
              f"({dt / M_LEVEL * 1e9:5.2f} ns/desc) meanerr={err:.2e}",
              flush=True)
    except Exception:
        print("pallas scatter_cols_accum FAILED to lower/run:", flush=True)
        traceback.print_exc(limit=3)

    # --- context: the transpose cost the Pallas path pays per step ------
    f = jax.jit(lambda t: t[:, NB: 2 * NB].astype(jnp.bfloat16).T)
    dt = bench(f, tab_train)
    print(f"per-level transpose+cast:     {dt*1e3:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
