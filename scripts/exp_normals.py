"""Quality + speed check: grad_normal_mode = samples / surface / none.

Fits the production-geometry mapper on the synthetic textured-box scene
(32 posed keyframes) under each density-gradient-normal placement and
reports train-batch PSNR, median relative depth error, and ms/step — the
gate that moving the orientation/pred-normal targets from every sample to
ONE surface point per ray (S-fold fewer pullback points) does not cost
reconstruction quality.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from nerf_vo_tpu.mapping.trainer import MappingTrainer, TrainerConfig
from nerf_vo_tpu.models.nerfacto import NerfactoConfig, NerfactoModel
from scripts.exp_distill import make_scene


def run(mode, buf, K, steps=400):
    cfg = NerfactoConfig(num_images=K, grad_normal_mode=mode)
    trainer = MappingTrainer(
        NerfactoModel(cfg),
        TrainerConfig(rays_per_batch=4096, max_iterations=steps),
        K,
    )
    state = trainer.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    t0 = None
    for i in range(steps):
        key, sub = jax.random.split(key)
        state, m = trainer.train_step(state, buf, sub)
        if i == 5:
            float(m["loss"])  # force sync (block_until_ready is a no-op here)
            t0 = time.perf_counter()
    psnr = float(m["psnr"])
    float(m["loss"])
    dt = (time.perf_counter() - t0) / (steps - 6)

    # median relative depth error on a held ray batch
    model = trainer.model
    from nerf_vo_tpu.mapping import keyframe_buffer as kb

    batch = kb.sample_ray_batch(buf, None, jax.random.PRNGKey(7), 4096)
    out = model.render(
        state.params, batch["origins"], batch["directions"],
        batch.get("camera_indices"), train=False,
        occ_grid=state.occ_grid,
    )
    rel = jnp.abs(out["depth"] - batch["depth"]) / jnp.clip(batch["depth"], 0.1)
    med = float(jnp.median(rel))
    print(
        f"{mode:8s}: psnr={psnr:.2f} dB  med|dz|/z={med:.4f}  "
        f"{dt*1e3:.1f} ms/step ({4096/dt/1e3:.1f}K rays/s)",
        flush=True,
    )
    return psnr, med


def main():
    K, H, W = 32, 120, 160
    rng = np.random.default_rng(0)
    buf = make_scene(rng, K, H, W)
    p_sam, _ = run("samples", buf, K)
    p_sur, _ = run("surface", buf, K)
    p_non, _ = run("none", buf, K)
    print(f"surface - samples delta: {p_sur - p_sam:+.2f} dB")
    print(f"none    - samples delta: {p_non - p_sam:+.2f} dB")


if __name__ == "__main__":
    main()
