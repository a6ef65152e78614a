"""Cell-granular backward-scatter experiment (round 2, part 3).

The brick-column cotangent has only 8F nonzero rows of 27F: W zero-weights
every brick corner outside the sample's own 2x2x2 cell. exp_scatter3 showed
the scatter emitter is BYTE-bound (~45 GB/s of payload), so scattering only
the nonzero 8F rows (128 B/descriptor at F=8 bf16 vs 432 B today) should cut
the scatter ~3.4x — IF the emitter stays byte-bound at 64-row columns and
does not hit a per-descriptor floor.

Pipeline measured here (exact, no approximation):
  1. compact [256, M] -> [64, M]: per-axis shift-select by the base-corner
     bit (rows outside the cell are exactly zero, so selection == compaction)
  2. scatter [64, M] bf16 into a cell table [64, 8*C] (cell id = brick*8+p)
  3. constant transform back to brick layout [216, C]: each brick corner
     sums its incident (pattern, cell-corner) pairs — an einsum over a
     [27, 8, 8] 0/1 tensor.
Compared against the current 216-row bf16 brick scatter, and validated
numerically against the f32 reference.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu":
    # the env's sitecustomize force-selects the axon backend; honor the
    # shell override (CPU smoke mode)
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def timeit(name, fn, n_desc, n=10):
    out = fn()
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32).ravel()[:1]))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32).ravel()[:1]))
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"{name}: {best*1e3:.2f} ms  ({best/n_desc*1e9:.2f} ns/desc)", flush=True)
    return out


# entry e = (ex*3+ey)*3+ez on the 3x3x3 lattice; cell corner q = (di,dj,dk);
# pattern p = (lx*2+ly)*2+lz. row(p, q) axis-wise: e_a = l_a + d_a.
def _transform_tensor():
    R = np.zeros((27, 8, 8), np.float32)  # [entry, pattern, cell-corner]
    for lx in range(2):
        for ly in range(2):
            for lz in range(2):
                p = (lx * 2 + ly) * 2 + lz
                for di in range(2):
                    for dj in range(2):
                        for dk in range(2):
                            q = (di * 2 + dj) * 2 + dk
                            e = ((lx + di) * 3 + (ly + dj)) * 3 + (lz + dk)
                            R[e, p, q] = 1.0
    return jnp.asarray(R)


def main():
    rng = np.random.default_rng(0)
    small = bool(int(os.environ.get("EXP_SMALL", "0")))  # CPU smoke mode
    L, NB = 2, (512 if small else 16384)
    F = 8
    rows = 32 * F
    N = (4096 if small else 4096 * 48) * L
    C = L * NB
    idx = jnp.asarray(rng.integers(0, C, N), jnp.int32)
    loc = jnp.asarray(rng.integers(0, 2, (3, N)), jnp.int32)  # base-corner bits

    # build a cotangent with the true sparsity: g = W (8 nonzero of 27) x feat
    w8 = rng.random((8, N)).astype(np.float32)
    feat = rng.standard_normal((F, N)).astype(np.float32)
    loc_np = np.asarray(loc)
    g_np = np.zeros((rows, N), np.float32)
    for di in range(2):
        for dj in range(2):
            for dk in range(2):
                q = (di * 2 + dj) * 2 + dk
                e = ((loc_np[0] + di) * 3 + (loc_np[1] + dj)) * 3 + (loc_np[2] + dk)
                g_np[:, :] += 0  # keep shape
                np.add.at(
                    g_np,
                    (e[None, :] * F + np.arange(F)[:, None], np.arange(N)[None, :]),
                    w8[q][None, :] * feat,
                )
    g = jnp.asarray(g_np)
    g16 = g.astype(jnp.bfloat16)

    # current production path: 216-row bf16 brick scatter
    scat216 = jax.jit(
        lambda gg, i: jnp.zeros((216, C), jnp.bfloat16).at[:, i].add(gg[:216])
    )
    ref = timeit("bf16 216-row brick scatter (current)", lambda: scat216(g16, idx), N)

    # bare 64-row bf16 scatter (is it byte-bound or descriptor-floor-bound?)
    cell_id = idx * 8 + ((loc[0] * 2 + loc[1]) * 2 + loc[2])
    g64 = g16[:64]
    scat64 = jax.jit(
        lambda gg, i: jnp.zeros((64, 8 * C), jnp.bfloat16).at[:, i].add(gg)
    )
    timeit("bf16 64-row cell scatter (bare)", lambda: scat64(g64, cell_id), N)

    # full pipeline: compact -> cell scatter -> brick transform
    R = _transform_tensor()

    def pipeline(gg, i, lc):
        # 1. compact 27 -> 8 rows by three axis shifts (rows outside the
        #    cell are exactly zero, so select == compact)
        t = gg[: 27 * F].reshape(3, 3, 3, F, N)
        lx, ly, lz = lc[0], lc[1], lc[2]
        t = jnp.where(lx[None, None, None, None], t[1:3], t[0:2])  # [2,3,3,F,N]
        t = jnp.where(ly[None, None, None, None], t[:, 1:3], t[:, 0:2])
        t = jnp.where(lz[None, None, None, None], t[:, :, 1:3], t[:, :, 0:2])
        gc = t.reshape(8 * F, N)  # [(di,dj,dk),F x N]
        # 2. cell scatter
        p = (lx * 2 + ly) * 2 + lz
        cid = i * 8 + p
        cell = jnp.zeros((8 * F, 8 * C), jnp.bfloat16).at[:, cid].add(gc)
        # 3. constant transform back to brick layout
        cellr = cell.astype(jnp.float32).reshape(8, F, C, 8)  # [q, F, C, p]
        brick = jnp.einsum("qfcp,epq->efc", cellr, R)
        return brick.reshape(27 * F, C)

    got = timeit(
        "compact + cell scatter + transform",
        lambda: jax.jit(pipeline)(g16, idx, loc.astype(bool)),
        N,
    )

    want = np.asarray(ref, np.float32)
    errn = float(
        jnp.max(jnp.abs(got - want)) / (jnp.max(jnp.abs(want)) + 1e-30)
    )
    print(f"pipeline vs brick-scatter max rel err: {errn:.2e}")

    # The Pallas zero-scatter sorted-segsum route was measured here
    # 2026-08-19 (tpu_runs/exp_scatter4.log): kernel ~2.2 ms but the XLA
    # sort+permute pre-pass 10.21 ms (~26 ns/desc — the same
    # per-descriptor floor as the scatter emitter); 12.37 ms total vs
    # 10.73 ms for the plain brick scatter. Route deleted (see
    # ops/hash_grid.py route-decision note). Stage cost kept measurable:
    sortperm = jax.jit(
        lambda gg, i: jnp.take(
            gg, jax.lax.sort_key_val(i, jnp.arange(N, dtype=jnp.int32))[1],
            axis=1
        ).T
    )
    timeit("  sort + permute-take bf16 216-row (stage)",
           lambda: sortperm(g16[:216], idx), N)


if __name__ == "__main__":
    main()
