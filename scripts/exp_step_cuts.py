"""Fine-grained cost attribution of the mapping train step (TPU).

Beyond profile_mapping_ablate.py's config ablations, this isolates the
encode's backward scatter (by stop-gradding the table gather), position
gradients (stop-grad on sample positions entering the field), and batch
amortization — the levers named in STATUS round-2 agenda.
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
from nerf_vo_tpu.ops import hash_grid


def make_buf(rng, K, H, W):
    buf = kb.create(K, H, W)
    n_kf = 32
    c2w = np.tile(np.eye(4, dtype=np.float32), (n_kf, 1, 1))
    c2w[:, :3, 3] = rng.uniform(-0.5, 0.5, (n_kf, 3))
    packet = {
        "intrinsics": jnp.tile(jnp.asarray([320.0, 320.0, W / 2, H / 2]), (n_kf, 1)),
        "c2w": jnp.asarray(c2w),
        "color": jnp.asarray(rng.uniform(0, 1, (n_kf, H, W, 3)), jnp.float32),
        "depth": jnp.asarray(rng.uniform(0.5, 4.0, (n_kf, H, W)), jnp.float32),
        "normal": jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (n_kf, H, W, 1)),
    }
    return kb.insert(buf, jnp.arange(n_kf), packet)


def time_variant(name, model_cfg, trainer_cfg, buf, K, n=20):
    model = NerfactoModel(model_cfg)
    trainer = MappingTrainer(model, trainer_cfg, K)
    state = trainer.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    rays = trainer_cfg.rays_per_batch

    def step():
        nonlocal state, key
        key, sub = jax.random.split(key)
        state, m = trainer.train_step(state, buf, sub)
        return m

    m = step()
    float(jnp.sum(m["loss"]))
    for _ in range(6):
        m = step()
    float(jnp.sum(m["loss"]))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(n):
            m = step()
        float(jnp.sum(m["loss"]))
        best = min(best, (time.perf_counter() - t0) / n)
    print(f"{name}: {best*1e3:.2f} ms/step ({rays/best/1e3:.1f}K rays/s)",
          flush=True)
    return best


def main():
    K, H, W = 192, 360, 640
    rng = np.random.default_rng(0)
    buf = make_buf(rng, K, H, W)
    tc = TrainerConfig(rays_per_batch=4096, max_iterations=8192)
    base = NerfactoConfig(num_images=K)

    time_variant("baseline (brick scatter)", base, tc, buf, K)

    # The in-step backward-route comparison (brick 29.44 / cell 32.25 /
    # Pallas segsum 31.99 ms, 2026-08-19) is settled: brick won; the cell
    # and segsum routes were deleted (see ops/hash_grid.py route note).

    # kill table grads + backward scatter: gather a stop-gradded table.
    # NOTE the patch target: hash_encode routes scattered levels through
    # the _gather_scattered FACTORY (patching _gather_cols, as this script
    # did before 2026-08-19, was a no-op — the "frozen" rows in early
    # tpu_runs/exp_step_cuts.log measured the live backward).
    orig = hash_grid._gather_scattered

    def frozen_factory(n_bricks, base_col):
        return lambda tables, idx, loc: hash_grid._split_take(
            jax.lax.stop_gradient(tables).astype(jnp.bfloat16), idx
        )

    hash_grid._gather_scattered = frozen_factory
    try:
        time_variant("frozen tables (no bwd scatter)", base, tc, buf, K)
    finally:
        hash_grid._gather_scattered = orig

    time_variant(
        "field 2x16",
        dataclasses.replace(base, num_grid_levels=2,
                            grid_features_per_level=16),
        tc, buf, K,
    )
    time_variant(
        "field 3x8 (24-dim encode)",
        dataclasses.replace(base, num_grid_levels=3,
                            grid_features_per_level=8),
        tc, buf, K,
    )
    time_variant(
        "8192-ray batch",
        base, dataclasses.replace(tc, rays_per_batch=8192), buf, K,
    )
    time_variant(
        "16384-ray batch",
        base, dataclasses.replace(tc, rays_per_batch=16384), buf, K,
    )

    # attribute the non-scatter remainder: frozen tables + one more cut each
    hash_grid._gather_scattered = frozen_factory
    try:
        time_variant(
            "frozen + no normals",
            dataclasses.replace(base, predict_normals=False,
                                normal_loss_mult=0.0),
            tc, buf, K,
        )
        time_variant(
            "frozen + no pose opt",
            base, dataclasses.replace(tc, optimize_extrinsics=False), buf, K,
        )
        time_variant(
            "frozen + one proposal level",
            dataclasses.replace(base, num_proposal_samples=(128,)),
            tc, buf, K,
        )
        time_variant(
            "frozen + 24 nerf samples",
            dataclasses.replace(base, num_nerf_samples=24), tc, buf, K,
        )
        time_variant(
            "frozen + everything off",
            dataclasses.replace(
                base, predict_normals=False, normal_loss_mult=0.0,
                num_proposal_samples=(128,), depth_loss_mult=0.0,
                distortion_loss_mult=0.0,
            ),
            dataclasses.replace(tc, optimize_extrinsics=False), buf, K,
        )
    finally:
        hash_grid._gather_scattered = orig


if __name__ == "__main__":
    main()
