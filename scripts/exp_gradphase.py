"""Phased table-gradient backward: quality + speed gate (TPU).

The backward brick scatter of the field's scattered hash levels is the
train step's dominant per-descriptor cost (~8.5 ms of a ~29 ms step at
production config, tpu_runs/exp_step_cuts.log; the emitter floor is
~22-27 ns/descriptor at ANY payload width, tpu_runs/exp_scatter4.log).
`table_grad_phase` scatters only ONE scattered level per step (exact
full-batch per-level gradients at 1/n_scattered rate) — descriptor-count
is the only remaining lever, and this halves it without touching the
forward or any sample budget.

This fits the production-geometry mapper on the synthetic textured-box
scene with the flag off/on and reports train-batch PSNR, median relative
depth error, and ms/step. Flip rule: phased within ~0.5 dB and ~0.1
med-rel-depth of baseline AND >=1.15x faster -> flip the default.

Usage: python scripts/exp_gradphase.py [steps] [--cpu-smoke]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS") == "cpu" or "--cpu-smoke" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from exp_distill import make_scene  # noqa: E402
from exp_samples import run  # noqa: E402


def main():
    smoke = "--cpu-smoke" in sys.argv
    steps = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() \
        else (30 if smoke else 400)
    if smoke:
        K, H, W, rays = 8, 48, 64, 512
    else:
        K, H, W, rays = 32, 120, 160, 4096
    rng = np.random.default_rng(0)
    buf = make_scene(rng, K, H, W)

    sweeps = [
        ("full table grads (prod, 96+48)", {}),
        ("phased table grads (1 level/step)", {"table_grad_phase": True}),
        # distilled proposal tables stored bf16: halves the random-gather
        # bytes of the res-160 table (65 MB f32, ~17 ns/desc vs the ~4-5 ns
        # cache-resident gather floor). Independent lever, stacked on top.
        ("phased + bf16 proposal tables",
         {"table_grad_phase": True, "proposal_table_dtype": "bfloat16"}),
    ]
    if smoke:
        for _, over in sweeps:
            over.setdefault("log2_hashmap_size", 14)
            over.setdefault("proposal_distill_points", 256)
    base = None
    for label, over in sweeps:
        p, d, t = run(label, buf, K, steps, rays, **over)
        if base is None:
            base = (p, d, t)
        else:
            print(f"    vs prod: {p - base[0]:+.2f} dB, "
                  f"depth {d - base[1]:+.3f}, speedup {base[2]/t:.2f}x",
                  flush=True)


if __name__ == "__main__":
    main()
