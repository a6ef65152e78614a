"""Quantitative accuracy gates (VERDICT round-1 item 8).

The e2e tests assert mechanics and finiteness; these pin NUMBERS on the
parts that need no trained weights:
  * mapping PSNR on GT-posed synthetic keyframes (the SURVEY §7.2 offline
    slice) — a geometry/renderer regression shows up as a PSNR drop, not
    just a NaN;
  * depth accuracy of the converged field against the analytic scene.
Thresholds carry a wide margin over observed values so only real
regressions trip them (observed with grad_normal_mode="samples" pinned:
19.4 dB PSNR at 50 steps, 24.7 at 100, ~0.15 median relative depth error
at 160 steps at this shrunken CPU configuration; random init sits at
~8 dB / ~2.0). Depth converges LATE (0.77 at step 100, 0.15 at 160 —
remeasured 2026-08-19), so its gate rides a continuation fixture in the
slow tier; the PSNR gate stays fast-tier and stops at 50 steps (each
step costs ~1.1 s of 1-core CPU; 100-step fits put this fixture alone at
~3.5 min of the fast tier's 10-minute budget).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_vo_tpu.mapping import keyframe_buffer as kb
from nerf_vo_tpu.mapping.trainer import MappingTrainer, TrainerConfig
from nerf_vo_tpu.models.nerfacto import NerfactoConfig, NerfactoModel

K, H, W = 6, 32, 40
FX = 30.0


def _make_scene(rng):
    """Keyframes viewing a textured plane at z = 2.5 from jittered poses."""
    ys, xs = np.mgrid[0:H, 0:W]
    c2w = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
    c2w[:, 0, 3] = np.linspace(-0.15, 0.15, K)
    c2w[:, 1, 3] = rng.uniform(-0.05, 0.05, K)
    colors = np.zeros((K, H, W, 3), np.float32)
    depths = np.zeros((K, H, W), np.float32)
    for k in range(K):
        d = np.stack(
            [(xs - W / 2) / FX, (ys - H / 2) / FX, np.ones_like(xs)], -1
        )
        dw = d @ c2w[k, :3, :3].T
        o = c2w[k, :3, 3]
        t = (2.5 - o[2]) / dw[..., 2]
        p = o + t[..., None] * dw
        colors[k] = np.stack(
            [0.5 + 0.45 * np.sin(4 * p[..., 0]),
             0.5 + 0.45 * np.cos(5 * p[..., 1]),
             0.5 + 0.3 * np.sin(3 * (p[..., 0] - p[..., 1]))], -1,
        )
        depths[k] = t  # euclidean along unit-z ray param
    buf = kb.create(K, H, W)
    packet = {
        "intrinsics": jnp.tile(jnp.asarray([FX, FX, W / 2, H / 2]), (K, 1)),
        "c2w": jnp.asarray(c2w),
        "color": jnp.asarray(colors),
        "depth": jnp.asarray(depths),
        "normal": jnp.tile(jnp.asarray([0.0, 0.0, -1.0]), (K, H, W, 1)),
    }
    return kb.insert(buf, jnp.arange(K), packet), colors, depths


@pytest.fixture(scope="module")
def fitted():
    rng = np.random.default_rng(7)
    buf, colors, depths = _make_scene(rng)
    cfg = NerfactoConfig(
        num_images=K,
        num_proposal_samples=(32, 16),
        num_nerf_samples=16,
        log2_hashmap_size=13,
        max_res=256,
        # grid geometry pinned so production-default changes don't move
        # this gate's calibration
        num_grid_levels=5,
        grid_features_per_level=8,
        proposal_resolutions=(32, 48),
        proposal_refresh_every=8,
        # stronger depth weighting than the production 1e-3: this gate
        # checks the geometry machinery converges, at 1/30 the step budget
        depth_loss_mult=0.05,
        # pinned like the grid geometry: the production default flipped to
        # "surface" on its TPU gate (2026-08-19), which moves this toy
        # scene's calibration (surface: 22.9 dB @50 but depth 0.250 @160 —
        # ON the 0.25 gate; samples: 19.4 dB @50, depth 0.153 @160)
        grad_normal_mode="samples",
    )
    trainer = MappingTrainer(
        NerfactoModel(cfg),
        # GT poses: pose optimization off isolates the field/renderer.
        # 256 rays x 40 steps: the smallest budget where the PSNR gate
        # still has daylight (17.1 dB observed; 30 steps lands at 14.0,
        # too close to the gate) — each step costs ~1.5 s of 1-core CPU
        # regardless of precision flags, so steps are the only knob.
        TrainerConfig(rays_per_batch=256, max_iterations=160,
                      optimize_extrinsics=False),
        K,
    )
    state = trainer.init(jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(1)
    for _ in range(40):
        key, sub = jax.random.split(key)
        state, m = trainer.train_step(state, buf, sub)
    return trainer, state, buf, colors, depths, key


@pytest.fixture(scope="module")
def fitted_full(fitted):
    """Continue the shared fit (depth convergence needs the extra steps;
    recalibrated for the 256-ray fixture, see test_mapping_depth_gate)."""
    trainer, state, buf, colors, depths, key = fitted
    for _ in range(200):
        key, sub = jax.random.split(key)
        state, m = trainer.train_step(state, buf, sub)
    return trainer, state, buf, colors, depths


def test_mapping_psnr_gate(fitted):
    trainer, state, buf, colors, depths, _ = fitted
    out = trainer.render_image(
        state, buf.c2w[0], buf.intrinsics[0], H, W
    )
    rgb = np.asarray(out["rgb"])
    mse = float(np.mean((rgb - colors[0]) ** 2))
    psnr = -10.0 * np.log10(max(mse, 1e-10))
    # observed 17.1 dB at 40 steps x 256 rays (samples mode, 2026-08-19;
    # 19.4 at the old 50 x 512); random init ~8 dB, broken transforms land
    # below 10 — 13 splits the gap
    assert psnr > 13.0, f"mapping PSNR regressed: {psnr:.2f} dB"


@pytest.mark.slow
def test_mapping_depth_gate(fitted_full):
    trainer, state, buf, colors, depths = fitted_full
    out = trainer.render_image(
        state, buf.c2w[0], buf.intrinsics[0], H, W
    )
    pred = np.asarray(out["depth"])
    # rendered depth is euclidean ray distance; convert GT z-depth
    ys, xs = np.mgrid[0:H, 0:W]
    dirlen = np.sqrt(((xs - W / 2) / FX) ** 2 + ((ys - H / 2) / FX) ** 2 + 1)
    gt = depths[0] * dirlen
    rel = np.abs(pred - gt) / gt
    med = float(np.median(rel))
    # observed 0.153 at this shrunken config (16-sample rays in disparity
    # spacing bias the expected-depth estimate); gate at 0.25 — a geometry
    # regression lands far above (random init: ~2.0, broken transforms >0.5)
    assert med < 0.25, f"median relative depth error regressed: {med:.3f}"
