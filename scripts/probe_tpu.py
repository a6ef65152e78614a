"""Probe the tunneled TPU backend health (bounded; exit 0 = healthy).

The axon tunnel has full outages where even a tiny matmul hangs forever at
~0% CPU with no error (see STATUS.md measurement notes). Run this under
`timeout 60` before launching any TPU work; rc!=0 means stay on CPU.
"""

import sys
import time

t0 = time.time()
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

d = jax.devices()
x = jnp.ones((128, 128), jnp.bfloat16)
s = float(jnp.sum(jnp.dot(x, x).astype(jnp.float32)))
assert s == 128.0 * 128 * 128, s
print(f"TPU OK: {d} matmul={s:.0f} in {time.time()-t0:.1f}s")
sys.exit(0)
