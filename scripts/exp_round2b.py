"""Round-2b mapping levers: scatter payload trim + proposal restructuring.

Times the production train step and fits the synthetic posed-keyframe scene
(400 steps, exp_distill.py scene) for each variant so speed wins are
quality-gated in the same run:

  A  baseline (trimmed bf16 scatter, 128+64 proposals)   [current default]
  B  f32 scatter (round-1 behavior, SCATTER_BF16=False)
  C  single proposal level (160,) x (128,) samples
  D  C + 32 nerf samples
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from exp_distill import make_scene
from nerf_vo_tpu.mapping import keyframe_buffer as kb
from nerf_vo_tpu.mapping.trainer import MappingTrainer, TrainerConfig
from nerf_vo_tpu.models.nerfacto import NerfactoConfig, NerfactoModel
from nerf_vo_tpu.ops import hash_grid


def run(name, buf, K, steps=400, **over):
    cfg = NerfactoConfig(num_images=K, **over)
    trainer = MappingTrainer(
        NerfactoModel(cfg),
        TrainerConfig(rays_per_batch=4096, max_iterations=steps), K,
    )
    state = trainer.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    t0 = None
    for i in range(steps):
        key, sub = jax.random.split(key)
        state, m = trainer.train_step(state, buf, sub)
        if i == 5:
            float(m["loss"])
            t0 = time.perf_counter()
    psnr = float(m["psnr"])
    dt = (time.perf_counter() - t0) / (steps - 6)
    print(f"{name}: {psnr:.1f} dB  {dt*1e3:.2f} ms/step "
          f"({4096/dt/1e3:.1f}K rays/s)", flush=True)


def main():
    K, H, W = 32, 360, 640
    rng = np.random.default_rng(0)
    buf = make_scene(rng, K, H, W)

    run("A baseline (bf16 trim scatter)", buf, K)

    hash_grid.SCATTER_BF16 = False
    try:
        run("B f32 scatter (round-1)", buf, K)
    finally:
        hash_grid.SCATTER_BF16 = True

    run("C one proposal level 160x128", buf, K,
        num_proposal_samples=(128,), proposal_resolutions=(160,))
    run("D C + 32 nerf samples", buf, K,
        num_proposal_samples=(128,), proposal_resolutions=(160,),
        num_nerf_samples=32)


if __name__ == "__main__":
    main()
