"""Quantitative accuracy gate for the instant-ngp mapping path (VERDICT r3
item 7).

The nerfacto path has tests/test_accuracy.py; the NGP path (occupancy-grid
empty-space skipping + covariance-weighted L2 depth loss + bounded-AABB
linear-t marching — the reference's pyngp mode, /root/reference/nerf_vo/
mapping/instant_ngp.py:46-48,87-100) had only plumbing e2e coverage. The
exp_samples occupancy arm measured −5.36 dB / depth +8.95 under the
*nerf_vo* config (disparity spacing piles the coarse bins against the near
plane); runtime/stages.py:290-298 argues the NGP path's linear spacing in a
bounded AABB avoids that failure. This gate pins it quantitatively: a
GT-posed synthetic fit through the exact sampler/loss combination the
nerf_slam configs run, with PSNR and depth thresholds.

Calibration (1-core CPU, 5 seeds via scripts/exp_ngp_gate_seeds.py,
2026-08-21): PSNR 16.93-19.82 dB (mean 18.00, std 1.03), median relative
depth 0.067-0.073 (std 0.002); random init ~8 dB / ~2.0. Gates tightened
to measured-minus-noise (VERDICT r4 item 9): PSNR > 15.0 (worst seed
minus ~2 sigma), depth < 0.12 (worst seed plus >20 sigma — the depth axis
is extremely stable on this fixture) so a 1-2 dB regression actually
trips instead of living inside a 3.6 dB cushion.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_vo_tpu.mapping import keyframe_buffer as kb
from nerf_vo_tpu.mapping.trainer import MappingTrainer, TrainerConfig
from nerf_vo_tpu.models.nerfacto import NerfactoConfig, NerfactoModel
from nerf_vo_tpu.ops import occupancy as O

K, H, W = 6, 32, 40
FX = 30.0


def _make_scene(rng):
    """GT-posed keyframes viewing a textured plane at z = 2.5, with the
    DROID-style per-pixel depth covariance the NGP loss weights by."""
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
        depths[k] = t
    buf = kb.create(K, H, W, use_depth_cov=True)
    packet = {
        "intrinsics": jnp.tile(jnp.asarray([FX, FX, W / 2, H / 2]), (K, 1)),
        "c2w": jnp.asarray(c2w),
        "color": jnp.asarray(colors),
        "depth": jnp.asarray(depths),
        # spatially varying covariance (higher at the image border, like
        # DROID's marginal depth covariance) so the 1/cov weighting is a
        # real code path, not a constant
        "depth_cov": jnp.asarray(
            np.tile(
                (0.01 + 0.05 * ((xs - W / 2) / W) ** 2).astype(np.float32),
                (K, 1, 1),
            )
        ),
    }
    return kb.insert(buf, jnp.arange(K), packet), colors, depths


def fit_ngp(seed: int = 0):
    """Build + fit the NGP-path fixture with a given seed (init key = seed,
    ray stream = seed+1). Exposed for the multi-seed gate calibration
    (scripts/exp_ngp_gate_seeds.py, VERDICT r4 item 9)."""
    rng = np.random.default_rng(7)
    buf, colors, depths = _make_scene(rng)
    # the MappingStage NGP configuration (runtime/stages.py:279-299),
    # shrunk the same way test_accuracy.py shrinks the nerfacto path
    cfg = NerfactoConfig(
        num_images=K,
        sampler="occupancy",
        spacing="linear",
        near=0.05,
        far=6.0,
        use_contraction=False,
        aabb_min=-1.0,
        aabb_max=4.0,
        depth_loss_type="l2",
        depth_loss_mult=0.05,
        num_nerf_samples=16,
        num_occ_bins=64,
        # decay shrunk from the NGP 0.95 for the toy step budget: clearing
        # a never-occupied cell needs decay^n_refresh < occ_threshold, and
        # 160 steps give only 10 refreshes (0.95^10 = 0.60 stays
        # "occupied"; 0.5^10 = 1e-3 clears) — production runs 8192 steps
        # where 0.95 clears with the same margin (0.95^512 << 1e-2)
        occupancy=O.OccupancyConfig(resolution=32, slab_div=4, decay=0.5),
        log2_hashmap_size=13,
        max_res=256,
        num_grid_levels=5,
        grid_features_per_level=8,
        grad_normal_mode="none",
        normal_loss_mult=0.0,
    )
    trainer = MappingTrainer(
        NerfactoModel(cfg),
        TrainerConfig(rays_per_batch=256, max_iterations=160,
                      optimize_extrinsics=False),
        K,
    )
    state = trainer.init(jax.random.PRNGKey(seed))
    assert state.occ_grid is not None  # the occupancy path is actually on
    key = jax.random.PRNGKey(seed + 1)
    for _ in range(160):
        key, sub = jax.random.split(key)
        state, m = trainer.train_step(state, buf, sub)
    assert np.isfinite(float(m["loss"]))
    return trainer, state, buf, colors, depths


@pytest.fixture(scope="module")
def fitted_ngp():
    return fit_ngp(0)


@pytest.mark.slow
def test_ngp_psnr_gate(fitted_ngp):
    trainer, state, buf, colors, depths = fitted_ngp
    out = trainer.render_image(state, buf.c2w[0], buf.intrinsics[0], H, W)
    rgb = np.asarray(out["rgb"])
    mse = float(np.mean((rgb - colors[0]) ** 2))
    psnr = -10.0 * np.log10(max(mse, 1e-10))
    assert psnr > 15.0, f"instant-ngp path PSNR regressed: {psnr:.2f} dB"


@pytest.mark.slow
def test_ngp_depth_gate(fitted_ngp):
    trainer, state, buf, colors, depths = fitted_ngp
    out = trainer.render_image(state, buf.c2w[0], buf.intrinsics[0], H, W)
    pred = np.asarray(out["depth"])
    ys, xs = np.mgrid[0:H, 0:W]
    dirlen = np.sqrt(((xs - W / 2) / FX) ** 2 + ((ys - H / 2) / FX) ** 2 + 1)
    gt = depths[0] * dirlen  # rendered depth is euclidean ray distance
    rel = np.abs(pred - gt) / gt
    med = float(np.median(rel))
    assert med < 0.12, f"instant-ngp path depth regressed: med rel {med:.3f}"


@pytest.mark.slow
def test_ngp_occupancy_refresh_ran(fitted_ngp):
    """The refresh machinery must have actually run: the grid cannot still
    be at its optimistic init (1.0 everywhere) after 10 refreshes.

    A density-CONTRAST assertion (plane slab vs free space, by mean or by
    max) is NOT achievable at this toy budget — measured 2026-08-20: both
    slabs sit at the decay floor (max 0.24 vs 0.29) because 160 steps of
    depth-L2 fitting reach 0.07 median relative depth with soft density
    (sigma < 0.3 everywhere; 16 linear samples + last-sample background
    let expected-depth match GT without a sharp surface). The sampler
    failure mode that motivated this file (exp_samples' occupancy-arm
    depth collapse) is trapped by test_ngp_depth_gate directly."""
    trainer, state, buf, colors, depths = fitted_ngp
    occ = np.asarray(state.occ_grid)
    assert float(occ.max()) < 1.0, "grid still at optimistic init"
    assert float(occ.min()) >= 0.0
    assert occ.std() > 0.0, "refresh never wrote scene densities"
