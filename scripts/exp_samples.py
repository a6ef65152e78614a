"""Quality vs descriptor-count: nerf/proposal sample ablation (TPU).

Descriptor COUNT is the mapping step's hard cost floor (~4-5 ns/gather,
~17-26 ns/scatter each — scripts/exp_gather.py / exp_scatter2.py), and
every field sample costs gathers + a backward scatter. This script fits
the production-geometry mapper on the synthetic textured-box scene and
sweeps `num_nerf_samples` (48 = reference nerfacto budget) and the
proposal sample budget, reporting train-batch PSNR, median relative depth
error, and ms/step: the gate for trading samples/ray for throughput
without giving up reconstruction quality. Reference budget:
nerf_vo/mapping/nerfstudio.py:47-103 (48 final + 256/96 proposal samples).

Usage: python scripts/exp_samples.py [steps] [--cpu-smoke]
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

from exp_distill import make_scene  # noqa: E402
from nerf_vo_tpu.mapping import keyframe_buffer as kb
from nerf_vo_tpu.mapping.trainer import MappingTrainer, TrainerConfig
from nerf_vo_tpu.models.nerfacto import NerfactoConfig, NerfactoModel


def run(label, buf, K, steps, rays, **over):
    cfg = NerfactoConfig(num_images=K, proposal_training="distill", **over)
    trainer = MappingTrainer(
        NerfactoModel(cfg),
        TrainerConfig(rays_per_batch=rays, max_iterations=steps),
        K,
    )
    state = trainer.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    t0 = None
    warm = min(5, steps // 4)
    for i in range(steps):
        key, sub = jax.random.split(key)
        state, m = trainer.train_step(state, buf, sub)
        if i == warm:
            float(m["loss"])  # force sync (block_until_ready no-op here)
            t0 = time.perf_counter()
    psnr = float(m["psnr"])
    dt = (time.perf_counter() - t0) / max(steps - warm - 1, 1)

    # median relative depth error on a held ray batch
    model = trainer.model
    batch = kb.sample_ray_batch(buf, None, jax.random.PRNGKey(99), rays)
    out = model.render(
        state.params, batch["origins"], batch["directions"],
        batch.get("camera_indices"), train=False,
        occ_grid=state.occ_grid,
    )
    rel = jnp.abs(out["depth"] - batch["depth"]) / jnp.clip(
        batch["depth"], 0.1
    )
    med = float(jnp.median(rel))
    print(f"{label:36s} psnr={psnr:6.2f} dB  med|dz|/z={med:6.3f}  "
          f"{dt*1e3:7.1f} ms/step ({rays/dt/1e3:7.1f}K rays/s)", flush=True)
    return psnr, med, dt


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
        # the 13:23 2026-08-19 run of these arms flipped the DEFAULT
        # proposal budget to 96+48 — pin the old prod explicitly so the
        # baseline row stays comparable across runs
        ("48 nerf / 128+64 prop (old prod)",
         {"num_proposal_samples": (128, 64)}),
        ("32 nerf / 128+64 prop", {"num_nerf_samples": 32}),
        ("24 nerf / 128+64 prop", {"num_nerf_samples": 24}),
        ("32 nerf / 96+48 prop",
         {"num_nerf_samples": 32, "num_proposal_samples": (96, 48)}),
        ("32 nerf / mlp 128 prop",
         {"num_nerf_samples": 32, "proposal_type": "mlp",
          "num_proposal_samples": (128,), "proposal_mlp_freqs": (6,)}),
        # proposal-budget-ONLY cuts (2026-08-19): the nerf-sample cuts above
        # all failed their quality gates, but they confounded nerf and
        # proposal budgets. The FINAL sample count is the quality knob;
        # proposals only place samples — these arms keep the full 48 nerf
        # samples and cut only the (gradient-free, distilled) proposal
        # evals, which cost fwd gathers + PDF machinery in-step.
        ("48 nerf / 96+48 prop", {"num_proposal_samples": (96, 48)}),
        ("48 nerf / 64+32 prop", {"num_proposal_samples": (64, 32)}),
        ("48 nerf / 128 prop (one level)",
         {"num_proposal_samples": (128,)}),
        # the Instant-NGP-path sampler: occupancy-grid empty-space skipping
        # instead of proposal fields — zero proposal evals and ONE cheap
        # occupancy lookup per coarse bin. If it holds quality here it is
        # the natural throughput-first production sampler (it is already
        # the reference's pyngp mode, SURVEY N5).
        ("48 nerf / occupancy sampler", {"sampler": "occupancy"}),
        # the 13:23 run's occupancy arm collapsed on depth (med 9.26):
        # 400 steps is too few for the grid EMA to clear (0.95^25 = 0.28 >
        # threshold, still "everything occupied"), and DISPARITY spacing
        # piles the 128 coarse bins against the near plane. The NGP path
        # now defaults to linear spacing (runtime/stages.py) — this arm
        # gates that choice at the sampler level
        ("48 nerf / occupancy (linear spacing)",
         {"sampler": "occupancy", "spacing": "linear", "near": 0.05,
          "far": 8.0}),
    ]
    if smoke:
        # shrink every arm the same way the mlp smoke does
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
