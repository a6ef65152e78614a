"""In-step A/B: double-buffered pixel-batch prefetch on the full train step.

VERDICT r4 item 3: exp_floor_r4 showed removing ray-batch sampling takes
the production step 26.61 -> 20.53 ms — XLA does not overlap the
28K-descriptor pixel gather with MXU work when the gather's consumer is in
the same step. With NERF_VO_PREFETCH_BATCH (trainer.py), the gather's
consumer moves to the NEXT step, so the DMA can overlap this step's
matmuls. This harness times the full production train step with prefetch
off vs on, interleaved A-B-A in one session (paired against tunnel drift).

Quality note: prefetch changes neither the ray distribution nor the loss —
batches are iid pixel picks either way; targets are one buffer-insert
stale at most. Speed is the only gate.

Output: per-arm step times + a JSON summary.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build(prefetch: bool):
    import jax
    import jax.numpy as jnp

    from nerf_vo_tpu.mapping import keyframe_buffer as kb
    from nerf_vo_tpu.mapping.trainer import MappingTrainer, TrainerConfig
    from nerf_vo_tpu.models.nerfacto import NerfactoConfig, NerfactoModel

    K, H, W = 192, 360, 640
    rays = 4096
    model = NerfactoModel(NerfactoConfig(num_images=K))
    trainer = MappingTrainer(
        model,
        TrainerConfig(rays_per_batch=rays, max_iterations=8192,
                      prefetch_batch=prefetch),
        K,
    )
    state = trainer.init(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    buf = kb.create(K, H, W)
    n_kf = 32
    c2w = np.tile(np.eye(4, dtype=np.float32), (n_kf, 1, 1))
    c2w[:, :3, 3] = rng.uniform(-0.5, 0.5, (n_kf, 3))
    packet = {
        "intrinsics": jnp.tile(
            jnp.asarray([320.0, 320.0, W / 2, H / 2]), (n_kf, 1)
        ),
        "c2w": jnp.asarray(c2w),
        "color": jnp.asarray(rng.uniform(0, 1, (n_kf, H, W, 3)), jnp.float32),
        "depth": jnp.asarray(rng.uniform(0.5, 4.0, (n_kf, H, W)), jnp.float32),
        "normal": jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (n_kf, H, W, 1)),
    }
    buf = kb.insert(buf, jnp.arange(n_kf), packet)
    return trainer, state, buf


def run_arm(prefetch: bool, n_windows: int = 3, n_steps: int = 60):
    import jax
    import jax.numpy as jnp

    trainer, state, buf = build(prefetch)
    key = jax.random.PRNGKey(1)
    t_last = 1e9
    for i in range(20):
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        state, metrics = trainer.train_step(state, buf, sub)
        loss = float(jnp.sum(metrics["loss"]))
        assert np.isfinite(loss), f"non-finite loss, warmup {i}"
        dt = time.perf_counter() - t0
        if i >= 5 and dt < 0.1 and t_last < 0.1:
            break
        t_last = dt

    out = []
    for _ in range(n_windows):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            key, sub = jax.random.split(key)
            state, metrics = trainer.train_step(state, buf, sub)
        loss = float(jnp.sum(metrics["loss"]))  # force full drain
        assert np.isfinite(loss)
        out.append((time.perf_counter() - t0) / n_steps * 1e3)
    return out


def main():
    from nerf_vo_tpu.utils.jax_setup import setup_jax

    setup_jax()

    results = {"off": [], "on": []}
    for k, arm in enumerate(("off", "on", "off")):
        ms = run_arm(arm == "on")
        results[arm].extend(ms)
        for v in ms:
            print(f"prefetch={arm} pass={k} step_ms={v:.2f}", flush=True)

    best = {a: round(min(v), 2) for a, v in results.items()}
    rays = 4096
    print(json.dumps({
        "metric": "prefetch_ab",
        "best_step_ms": best,
        "best_rays_per_sec": {
            a: round(rays / (v * 1e-3), 0) for a, v in best.items()
        },
        "rule": "flip NERF_VO_PREFETCH_BATCH default on a >5% in-step win",
    }))


if __name__ == "__main__":
    main()
