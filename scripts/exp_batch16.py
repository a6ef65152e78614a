"""In-step ray-batch-size sweep for the production mapping step.

exp_floor_r5 measured "phased + 16384-ray batch" at 203.6K rays/s, but
phased table grads FAILED their paired quality gate (-0.72 dB, worst
-1.21; exp_gate_phase.log) — so the 16K-ONLY number was never isolated.
The step's fixed per-dispatch costs (masked adam 1.86 ms, part of the
sampler chain, dispatch overhead) amortize 4x at 16K rays, so larger
batches should win even without phasing.

Arms (each its own jitted trainer at production config, same buffer):
  4096 (baseline A) -> 8192 -> 16384 -> 32768 -> 4096 (baseline A')
The bracketing 4096 re-run separates tunnel drift from the effect, the
same A-B-A protocol exp_softagg_ab / exp_prefetch used.

Adjudication (pre-registered, TPU_QUEUE.md): a batch size becomes the
production default only if (a) its in-step rays/s beats the bracketing-
4096 best by >10% AND (b) the equal-total-rays paired quality gate
passes (exp_gate_samples --rays16k-only). Reference budget context:
4096 rays x 8192 iters (/root/reference/nerf_vo/mapping/nerfstudio.py:62)
— a flip keeps total rays constant (iterations scale down 4x).

Usage: python scripts/exp_batch16.py [--smoke]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from nerf_vo_tpu.utils.jax_setup import setup_jax

    setup_jax()
    from nerf_vo_tpu.mapping import keyframe_buffer as kb
    from nerf_vo_tpu.mapping.trainer import MappingTrainer, TrainerConfig
    from nerf_vo_tpu.models.nerfacto import NerfactoConfig, NerfactoModel

    smoke = "--smoke" in sys.argv
    if smoke:
        K, H, W, n_kf = 8, 48, 64, 4
        batches = [512, 1024, 512]
        n_steps, windows = 4, 2
    else:
        K, H, W, n_kf = 192, 360, 640, 32  # bench.py replica geometry
        batches = [4096, 8192, 16384, 32768, 4096]
        n_steps, windows = 40, 3

    rng = np.random.default_rng(0)
    buf = kb.create(K, H, W)
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

    over = {"log2_hashmap_size": 14} if smoke else {}
    results = []
    for arm_i, rays in enumerate(batches):
        model = NerfactoModel(NerfactoConfig(num_images=K, **over))
        trainer = MappingTrainer(
            model, TrainerConfig(rays_per_batch=rays, max_iterations=8192), K
        )
        state = trainer.init(jax.random.PRNGKey(0))
        key = jax.random.PRNGKey(1 + arm_i)
        # warmup until two consecutive fast steps (bench.py protocol)
        t_last = 1e9
        for i in range(20):
            key, sub = jax.random.split(key)
            t0 = time.perf_counter()
            state, metrics = trainer.train_step(state, buf, sub)
            loss = float(jnp.sum(metrics["loss"]))
            assert np.isfinite(loss), f"non-finite loss, arm rays={rays}"
            dt = time.perf_counter() - t0
            if i >= 5 and dt < 0.5 and t_last < 0.5:
                break
            t_last = dt
        best = 0.0
        for _ in range(windows):
            t0 = time.perf_counter()
            for _ in range(n_steps):
                key, sub = jax.random.split(key)
                state, metrics = trainer.train_step(state, buf, sub)
            jax.block_until_ready(metrics)
            float(jnp.sum(metrics["loss"]))
            dt = time.perf_counter() - t0
            best = max(best, rays * n_steps / dt)
        ms = rays / best * 1e3  # ms/step
        results.append((rays, best, ms))
        print(f"rays={rays:6d}: {ms:7.2f} ms/step  {best/1e3:7.1f}K rays/s",
              flush=True)

    base = max(r[1] for r in results if r[0] == batches[0])
    print("\n== summary (vs best bracketing baseline "
          f"{base/1e3:.1f}K rays/s) ==")
    for rays, rps, ms in results:
        print(f"rays={rays:6d}: {rps/1e3:7.1f}K rays/s  ({rps/base:5.2f}x)")


if __name__ == "__main__":
    main()
