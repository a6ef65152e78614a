"""MLP proposal field (zero-descriptor proposals) + in-step distillation.

Covers the TPU-first redesign of nerfstudio's HashMLPDensityField
(reference N7, nerf_vo/mapping/nerfstudio.py:47-103) as a fourier-feature
MLP trained by density distillation inside the loss
(models/nerf_field.py MLPProposalField, models/nerfacto.py loss()).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from nerf_vo_tpu.models.nerf_field import MLPProposalField
from nerf_vo_tpu.models.nerfacto import NerfactoConfig, NerfactoModel

TINY_MLP = NerfactoConfig(
    near=0.1,
    far=5.0,
    num_proposal_samples=(16, 8),
    num_nerf_samples=8,
    num_images=4,
    log2_hashmap_size=10,
    max_res=64,
    proposal_type="mlp",
    proposal_mlp_freqs=(3, 4),
    proposal_distill_points=64,
)


@pytest.fixture(scope="module")
def model_and_params():
    model = NerfactoModel(TINY_MLP)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def _rays(n, seed=0):
    rng = np.random.RandomState(seed)
    origins = jnp.zeros((n, 3))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 2] = np.abs(d[:, 2]) + 0.5
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    return origins, jnp.asarray(d)


def _batch(n, seed=0):
    o, d = _rays(n, seed)
    return {
        "origins": o,
        "directions": d,
        "rgb": jnp.full((n, 3), 0.5),
        "depth": jnp.full((n,), 2.0),
        "normal": jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n, 1)),
        "camera_indices": jnp.zeros((n,), jnp.int32),
    }


def test_field_forward_positive():
    pf = MLPProposalField(n_freqs=4)
    pts = jnp.asarray(np.random.RandomState(0).normal(size=(32, 3)),
                      jnp.float32)
    params = pf.init(jax.random.PRNGKey(1), pts)
    dens = pf.apply(params, pts)
    assert dens.shape == (32,)
    assert np.isfinite(np.asarray(dens)).all()
    assert (np.asarray(dens) > 0).all()
    # logit path consistent with density
    logit = pf.apply(params, pts, method="logit")
    np.testing.assert_allclose(
        np.asarray(jnp.exp(logit - 1.0)), np.asarray(dens), rtol=1e-5
    )


def test_loss_and_proposal_grads(model_and_params):
    """One value_and_grad pass checks the loss/metrics AND that proposal
    MLP params get gradients from the distill term (the render path is
    stop-gradient). Merged from two tests: a fwd-only loss compile plus a
    separate grad compile cost ~60 s of XLA on this 1-core host; the
    value_and_grad program covers both."""
    model, params = model_and_params
    batch = _batch(8)

    (loss, metrics), grads = jax.value_and_grad(
        lambda p: model.loss(p, batch, jax.random.PRNGKey(3)),
        has_aux=True,
    )(params)
    assert np.isfinite(float(loss))
    assert "proposal_distill_loss" in metrics
    assert np.isfinite(float(metrics["proposal_distill_loss"]))
    # no interlevel term under distill
    assert "interlevel_loss" not in metrics
    gp = jax.tree_util.tree_leaves(grads["proposal_0"])
    assert all(np.isfinite(np.asarray(g)).all() for g in gp)
    assert any(float(jnp.max(jnp.abs(g))) > 0 for g in gp)


def test_proposal_grads_vanish_without_distill(model_and_params):
    _, params = model_and_params
    batch = _batch(8)

    # with the distill term disabled, proposal grads vanish entirely
    import dataclasses
    m0 = NerfactoModel(dataclasses.replace(
        TINY_MLP, proposal_distill_loss_mult=0.0))
    grads0 = jax.grad(
        lambda p: m0.loss(p, batch, jax.random.PRNGKey(3))[0]
    )(params)
    gp0 = jax.tree_util.tree_leaves(grads0["proposal_0"])
    assert all(float(jnp.max(jnp.abs(g))) == 0 for g in gp0)


def test_distill_converges_toward_field():
    """A few Adam steps on the distill loss alone pull the proposal logit
    toward log(field density) at coverage points."""
    model = NerfactoModel(TINY_MLP)
    params = model.init(jax.random.PRNGKey(0))
    batch = _batch(16)
    tx = optax.adam(3e-3)
    opt = tx.init(params)

    def step(params, opt, key):
        (loss, metrics), g = jax.value_and_grad(
            model.loss, has_aux=True)(params, batch, key)
        upd, opt = tx.update(g, opt)
        return optax.apply_updates(params, upd), opt, metrics

    step = jax.jit(step)
    first = None
    for i in range(30):
        params, opt, metrics = step(params, opt, jax.random.PRNGKey(i))
        if first is None:
            first = float(metrics["proposal_distill_loss"])
    last = float(metrics["proposal_distill_loss"])
    assert np.isfinite(last)
    assert last < first * 0.7, (first, last)


def test_trainer_step_with_mlp_proposals():
    """The jitted trainer step runs end-to-end with MLP proposals (the
    dense-grid slab refresh branch must not fire)."""
    from nerf_vo_tpu.mapping import keyframe_buffer as kb
    from nerf_vo_tpu.mapping.trainer import MappingTrainer, TrainerConfig

    K, H, W = 4, 12, 16
    model = NerfactoModel(TINY_MLP)
    trainer = MappingTrainer(
        model, TrainerConfig(rays_per_batch=64, max_iterations=8), K
    )
    state = trainer.init(jax.random.PRNGKey(0))
    buf = kb.create(K, H, W, use_normals=True)
    rng = np.random.RandomState(0)
    c2w = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
    buf = kb.insert(
        buf,
        jnp.arange(K, dtype=jnp.int32),
        {
            "intrinsics": jnp.tile(
                jnp.asarray([W / 2, H / 2, W / 2, H / 2], jnp.float32),
                (K, 1),
            ),
            "c2w": jnp.asarray(c2w),
            "color": jnp.asarray(rng.rand(K, H, W, 3), jnp.float32),
            "depth": jnp.ones((K, H, W), jnp.float32),
            "normal": jnp.tile(
                jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (K, H, W, 1)
            ),
        },
    )
    for i in range(3):
        state, metrics = trainer.train_step(
            state, buf, jax.random.PRNGKey(i)
        )
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["proposal_distill_loss"]))


def test_mapping_stage_model_overrides():
    """`mapping_model_overrides:` YAML escape hatch reaches NerfactoConfig
    (lists coerce to tuples; unknown fields fail loudly)."""
    import argparse

    from nerf_vo_tpu.runtime.stages import MappingStage

    args = argparse.Namespace(
        mapping_module="nerfstudio",
        enhancement_module="depth",
        num_keyframes=4,
        frame_height=12,
        frame_width=16,
        mapping_iterations=8,
        rays_per_batch=32,
        mapping_model_overrides={
            "proposal_type": "mlp",
            "num_proposal_samples": [8, 4],
            "proposal_mlp_freqs": [3, 4],
            "num_nerf_samples": 8,
            "log2_hashmap_size": 10,
            "max_res": 64,
            "proposal_distill_points": 64,
        },
    )
    stage = MappingStage(args)
    assert stage.model.config.proposal_type == "mlp"
    assert stage.model.config.num_proposal_samples == (8, 4)

    args.mapping_model_overrides = {"not_a_field": 1}
    with pytest.raises(ValueError, match="not_a_field"):
        MappingStage(args)
