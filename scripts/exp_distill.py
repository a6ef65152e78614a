"""Quality check: distilled dense proposals vs interlevel-trained (TPU).

Fits the production-geometry mapper on a synthetic textured-box scene from
32 posed keyframes for N steps under both proposal_training modes and
reports train-batch PSNR — the guard that the zero-scatter distillation
redesign does not cost reconstruction quality.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from nerf_vo_tpu.mapping import keyframe_buffer as kb
from nerf_vo_tpu.mapping.trainer import MappingTrainer, TrainerConfig
from nerf_vo_tpu.models.nerfacto import NerfactoConfig, NerfactoModel


def make_scene(rng, K, H, W):
    """Keyframes looking at a textured plane z=2 from jittered poses."""
    buf = kb.create(K, H, W)
    fx = 0.8 * W
    intr = jnp.tile(jnp.asarray([fx, fx, W / 2, H / 2]), (K, 1))
    c2w = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
    c2w[:, :3, 3] = rng.uniform(-0.3, 0.3, (K, 3)) * [1, 1, 0.2]
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    colors = np.zeros((K, H, W, 3), np.float32)
    depths = np.zeros((K, H, W), np.float32)
    for k in range(K):
        dirs = np.stack(
            [(xs - W / 2) / fx, (ys - H / 2) / fx, np.ones_like(xs)], -1
        )
        dw = dirs @ c2w[k, :3, :3].T
        o = c2w[k, :3, 3]
        t = (2.0 - o[2]) / dw[..., 2]
        p = o + t[..., None] * dw
        colors[k] = np.stack(
            [0.5 + 0.5 * np.sin(3 * p[..., 0]),
             0.5 + 0.5 * np.cos(4 * p[..., 1]),
             0.5 + 0.25 * np.sin(5 * (p[..., 0] + p[..., 1]))], -1,
        )
        depths[k] = t * np.linalg.norm(dirs, axis=-1) / np.linalg.norm(
            dirs, axis=-1
        )  # euclidean along ray ~ t * |dir|; keep t for simplicity
        depths[k] = t
    packet = {
        "intrinsics": intr,
        "c2w": jnp.asarray(c2w),
        "color": jnp.asarray(colors),
        "depth": jnp.asarray(depths),
        "normal": jnp.tile(jnp.asarray([0.0, 0.0, -1.0]), (K, H, W, 1)),
    }
    return kb.insert(buf, jnp.arange(K), packet)


def run(mode, buf, K, steps=400, **over):
    cfg = NerfactoConfig(num_images=K, proposal_training=mode, **over)
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
            float(m["loss"])
            t0 = time.perf_counter()
    psnr = float(m["psnr"])
    dt = (time.perf_counter() - t0) / (steps - 6)
    print(f"{mode}: psnr={psnr:.2f} dB  {dt*1e3:.1f} ms/step "
          f"({4096/dt/1e3:.1f}K rays/s)", flush=True)
    return psnr


def main():
    K, H, W = 32, 120, 160
    rng = np.random.default_rng(0)
    buf = make_scene(rng, K, H, W)
    p_dis = run("distill", buf, K)
    p_48 = run("distill", buf, K, num_grid_levels=4,
               grid_features_per_level=8)
    p_int = run("interlevel", buf, K)
    print(f"4x8 - 8x4 delta: {p_48 - p_dis:+.2f} dB")
    print(f"distill - interlevel delta: {p_dis - p_int:+.2f} dB")


if __name__ == "__main__":
    main()
