"""Benchmark: online mapping train-step throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The headline metric is rendered training rays/sec of the nerfacto-equivalent
mapper at the production configuration (4096 rays/batch, proposal 96+48
[TPU-gated flip from 128+64, tpu_runs/exp_samples.log] + the reference's
48 final samples, pose optimization on) — the reference's
mapping budget is 8192 iters x 4096 rays (BASELINE.md). vs_baseline is the
ratio against the 1M rays/s north-star target for one TPU v5e chip.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def _probe_backend_once(timeout_s: float = 120.0) -> bool:
    """The tunneled TPU backend has full outages where even a tiny matmul
    blocks forever at 0% CPU (no error). Probe it in a subprocess with a
    hard timeout so an outage yields a diagnosable JSON line instead of a
    hung bench."""
    try:
        subprocess.run(
            [sys.executable, "-c",
             "import jax, jax.numpy as jnp; "
             "x = jnp.ones((128, 128)); print(float(jnp.sum(x @ x)))"],
            timeout=timeout_s, check=True,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        return True
    except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
        return False


def _probe_backend(window_s: float = 2700.0, retry_s: float = 300.0) -> bool:
    """Retry the probe across a bounded window (default 45 min, every
    5 min) before giving up: the round driver's end-of-round capture has
    twice landed inside an outage and recorded 0.0 (BENCH_r03/r04.json)
    even though a clean number existed minutes away. Progress lines go to
    stderr so the single stdout JSON line stays machine-parseable.

    NERF_VO_BENCH_RETRY_S=0 restores the old single-probe behavior (the
    TPU queue's own retry loop already spaces attempts)."""
    env = os.environ.get("NERF_VO_BENCH_RETRY_S")
    if env is not None:
        window_s = float(env)
    deadline = time.monotonic() + window_s
    attempt = 0
    while True:
        attempt += 1
        if _probe_backend_once():
            return True
        if time.monotonic() >= deadline:
            return False
        print(f"[bench] probe attempt {attempt} failed; retrying in "
              f"{retry_s:.0f}s (window ends in "
              f"{deadline - time.monotonic():.0f}s)", file=sys.stderr)
        time.sleep(min(retry_s, max(0.0, deadline - time.monotonic())))


def main():
    from nerf_vo_tpu.utils.jax_setup import setup_jax

    setup_jax()
    if not _probe_backend():
        print(json.dumps({
            "metric": "mapping_train_rays_per_sec", "value": 0.0,
            "unit": "rays/s", "vs_baseline": 0.0,
            "error": "backend unresponsive: 128x128 matmul did not "
                     "complete within 120s (TPU tunnel outage)",
        }))
        # nonzero rc so harnesses (run_tpu_queue.py, the round driver)
        # can tell "outage" from "measured 0" — ADVICE r2: rc alone must
        # disambiguate skipped/failed from ran-and-passed
        sys.exit(3)
    from nerf_vo_tpu.mapping import keyframe_buffer as kb
    from nerf_vo_tpu.mapping.trainer import MappingTrainer, TrainerConfig
    from nerf_vo_tpu.models.nerfacto import NerfactoConfig, NerfactoModel

    K, H, W = 192, 360, 640  # configs/nerf_vo_replica.yaml geometry
    rays = 4096
    model = NerfactoModel(NerfactoConfig(num_images=K))
    trainer = MappingTrainer(
        model, TrainerConfig(rays_per_batch=rays, max_iterations=8192), K
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

    key = jax.random.PRNGKey(1)

    # warmup / compile: the first ~12 executions of a fresh executable are
    # up to 100x slow on this backend — run each with a forced scalar fetch
    # (block_until_ready does NOT block here) until two consecutive steps
    # are fast, then time.
    t_last = 1e9
    for i in range(20):
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        state, metrics = trainer.train_step(state, buf, sub)
        loss = float(jnp.sum(metrics["loss"]))
        assert np.isfinite(loss), f"non-finite loss at warmup step {i}: {loss}"
        dt = time.perf_counter() - t0
        if i >= 5 and dt < 0.1 and t_last < 0.1:
            break
        t_last = dt

    # several timing windows; report the best — the shared TPU tunnel has
    # large run-to-run variance unrelated to the program under test
    n_steps = 60
    best = 0.0
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(n_steps):
            key, sub = jax.random.split(key)
            state, metrics = trainer.train_step(state, buf, sub)
        jax.block_until_ready(metrics)
        loss = float(jnp.sum(metrics["loss"]))  # force full drain
        assert np.isfinite(loss), f"non-finite loss in timing window: {loss}"
        dt = time.perf_counter() - t0
        best = max(best, rays * n_steps / dt)
    rays_per_sec = best
    print(
        json.dumps(
            {
                "metric": "mapping_train_rays_per_sec",
                "value": round(rays_per_sec, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_sec / 1e6, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
