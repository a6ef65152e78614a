"""Micro-timing + variants for the interlevel (proposal) loss on TPU."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from nerf_vo_tpu.ops import rendering as R


def timeit(name, fn, n=30):
    out = fn()
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32).ravel()[:1]))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32).ravel()[:1]))
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"{name}: {best*1e3:.2f} ms", flush=True)
    return out


def main():
    rng = np.random.default_rng(0)
    Rr = 4096
    pe0 = jnp.asarray(np.sort(rng.uniform(0, 1, (Rr, 129)), -1), jnp.float32)
    pw0 = jnp.asarray(rng.uniform(0, 1, (Rr, 128)), jnp.float32)
    pe1 = jnp.asarray(np.sort(rng.uniform(0, 1, (Rr, 65)), -1), jnp.float32)
    pw1 = jnp.asarray(rng.uniform(0, 1, (Rr, 64)), jnp.float32)
    fe = jnp.asarray(np.sort(rng.uniform(0, 1, (Rr, 49)), -1), jnp.float32)
    fw = jnp.asarray(rng.uniform(0, 1, (Rr, 48)), jnp.float32)

    f_fwd = jax.jit(lambda a, b: R.interlevel_loss(a, b, fe, fw))
    timeit("interlevel 128-bin fwd", lambda: f_fwd(pe0, pw0))
    timeit("interlevel 64-bin fwd", lambda: f_fwd(pe1, pw1))

    g0 = jax.jit(lambda a, b: jax.grad(
        lambda w: R.interlevel_loss(a, w, fe, fw))(b))
    timeit("interlevel 128-bin fwd+bwd", lambda: g0(pe0, pw0))
    timeit("interlevel 64-bin fwd+bwd", lambda: g0(pe1, pw1))

    both = jax.jit(lambda w0, w1: jax.grad(
        lambda ws: R.interlevel_loss(pe0, ws[0], fe, fw)
        + R.interlevel_loss(pe1, ws[1], fe, fw))((w0, w1)))
    timeit("both levels fwd+bwd", lambda: both(pw0, pw1))


if __name__ == "__main__":
    main()
