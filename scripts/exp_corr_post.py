"""Post-processing breakdown for corr: transpose / select / blend."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np

E2 = 33024
SY, SX = 16, 32
WIN, D = 10, 7
rng = np.random.RandomState(0)
cw_raw = jnp.asarray(rng.randn(E2, 16, 512), jnp.bfloat16)
rem = jnp.asarray(rng.randint(0, 8, E2), jnp.int32)
fx = jnp.asarray(rng.rand(E2), jnp.float32)
fy = jnp.asarray(rng.rand(E2), jnp.float32)
usable = jnp.ones(E2, bool)

def timeit(name, fn, n=20):
    out = fn(); float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32).ravel()[:1]))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n): out = fn()
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32).ravel()[:1]))
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"{name}: {best*1e3:.2f} ms")
    return out

# stage B: transpose to edge-minor
def stage_b(cw):
    return cw.reshape(E2, 16, SY, SX).transpose(1, 2, 3, 0)
jb = jax.jit(stage_b)
cw_t = timeit("B transpose -> [16,16,32,E]", lambda: jb(cw_raw))

# stage C: 8-way select
def stage_c(cw, rem):
    cwin = jnp.zeros((16, WIN, WIN, E2), jnp.bfloat16)
    for s in range(8):
        sel = (rem == s)[None, None, None, :]
        cwin = cwin + sel.astype(jnp.bfloat16) * cw[:, :WIN, s:s+WIN, :]
    return cwin
jc = jax.jit(stage_c)
cwin = timeit("C 8-way select -> [16,10,10,E]", lambda: jc(cw_t, rem))

# stage D: bilinear blend
def stage_d(cwin, fx, fy, usable):
    cwin = cwin.astype(jnp.float32)
    u = usable.astype(jnp.float32)
    w00 = (u * (1-fx) * (1-fy))[None, None, :]
    w10 = (u * fx * (1-fy))[None, None, :]
    w01 = (u * (1-fx) * fy)[None, None, :]
    w11 = (u * fx * fy)[None, None, :]
    out = []
    for p in range(9):
        py, px = p // 3, p % 3
        c00 = cwin[p, py:py+D, px:px+D, :]
        c10 = cwin[p, py:py+D, px+1:px+1+D, :]
        c01 = cwin[p, py+1:py+1+D, px:px+D, :]
        c11 = cwin[p, py+1:py+1+D, px+1:px+1+D, :]
        out.append(w00*c00 + w10*c10 + w01*c01 + w11*c11)
    return jnp.stack(out, 0)
jd = jax.jit(stage_d)
blended = timeit("D blend -> [9,7,7,E]", lambda: jd(cwin, fx, fy, usable))

# B+C+D fused in one jit
def full(cw, rem, fx, fy, usable):
    return stage_d(stage_c(stage_b(cw), rem), fx, fy, usable)
jf = jax.jit(full)
timeit("B+C+D fused", lambda: jf(cw_raw, rem, fx, fy, usable))

# alternative: skip stage B — keep [E2,16,16,32]; select+blend via batched
# one-hot matmul over the x axis, then y-blend via slices, edge-major
def alt(cw, rem, fx, fy, usable):
    cw4 = cw.reshape(E2, 16, SY, SX)  # [E,p,y,x]
    # x select+blend: out kx in 0..9+6: build [E, SX, 16] one-hot-ish
    kx = jnp.arange(16)
    xsel = (jnp.arange(SX)[None, :, None] == (kx[None, None, :] + rem[:, None, None]))
    Xf = xsel * (1 - fx)[:, None, None] + jnp.roll(xsel, 1, 1) * fx[:, None, None]
    A = jnp.einsum('epyx,exk->epyk', cw4.astype(jnp.bfloat16), Xf.astype(jnp.bfloat16),
                   preferred_element_type=jnp.float32)  # [E,16,16,16]
    # y blend
    wy0 = (1 - fy)[:, None, None, None]
    B = A[:, :, :WIN, :] * wy0 + A[:, :, 1:WIN+1, :] * (1 - wy0[:, :, 0:1])  # hmm shapes
    return B
# (skip alt correctness; just measure shape feasibility)
