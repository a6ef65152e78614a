"""Quality + speed gate: MLP proposals vs dense-grid proposals (TPU).

Fits the production-geometry mapper on the synthetic textured-box scene
(same harness as exp_distill.py) under proposal_type "dense" vs "mlp" and
reports train-batch PSNR and step time. The MLP proposal removes ALL
gather/scatter descriptors from the proposal path (~192/ray at production
config — see models/nerf_field.py MLPProposalField); this script guards
that sample placement quality survives the capacity cut.

Usage: python scripts/exp_mlp_prop.py [steps] [--cpu-smoke]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# The env's axon TPU plugin overrides JAX_PLATFORMS=cpu; honor the env var
# explicitly so --cpu-smoke runs never touch the (possibly down) tunnel.
if (os.environ.get("JAX_PLATFORMS") == "cpu" or "--cpu-smoke" in sys.argv
        or "--cpu-medium" in sys.argv):
    jax.config.update("jax_platforms", "cpu")

import numpy as np

from exp_distill import make_scene  # noqa: E402
from nerf_vo_tpu.mapping.trainer import MappingTrainer, TrainerConfig
from nerf_vo_tpu.models.nerfacto import NerfactoConfig, NerfactoModel

import jax.numpy as jnp  # noqa: E402  (after path insert, matches exp_distill)


def run(label, buf, K, steps=400, rays=4096, **over):
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
            float(m["loss"])  # force (block_until_ready is a no-op here)
            t0 = time.perf_counter()
    psnr = float(m["psnr"])
    dt = (time.perf_counter() - t0) / max(steps - warm - 1, 1)
    print(f"{label:28s} psnr={psnr:6.2f} dB  {dt*1e3:7.1f} ms/step "
          f"({rays/dt/1e3:7.1f}K rays/s)", flush=True)
    return psnr, dt


def main():
    smoke = "--cpu-smoke" in sys.argv
    medium = "--cpu-medium" in sys.argv  # 1-core-CPU-feasible quality run
    steps = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() \
        else (30 if smoke else 200 if medium else 400)
    if smoke:
        K, H, W, rays = 8, 48, 64, 512
    elif medium:
        K, H, W, rays = 16, 72, 96, 1024
    else:
        K, H, W, rays = 32, 120, 160, 4096
    rng = np.random.default_rng(0)
    buf = make_scene(rng, K, H, W)

    p_dense, t_dense = run("dense (baseline)", buf, K, steps, rays)
    p_mlp, t_mlp = run("mlp 2-level", buf, K, steps, rays,
                       proposal_type="mlp")
    p_mlp1, t_mlp1 = run("mlp 1-level (128 samples)", buf, K, steps, rays,
                         proposal_type="mlp",
                         num_proposal_samples=(128,),
                         proposal_mlp_freqs=(6,))
    print(f"mlp - dense delta: {p_mlp - p_dense:+.2f} dB, "
          f"speedup {t_dense / t_mlp:.2f}x")
    print(f"mlp1 - dense delta: {p_mlp1 - p_dense:+.2f} dB, "
          f"speedup {t_dense / t_mlp1:.2f}x")


if __name__ == "__main__":
    main()
