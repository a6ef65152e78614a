import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from nerf_vo_tpu.models.nerfacto import NerfactoConfig, NerfactoModel

TINY = NerfactoConfig(
    near=0.1,
    far=5.0,
    num_proposal_samples=(16,),
    num_nerf_samples=8,
    num_images=4,
    log2_hashmap_size=10,
    max_res=64,
    proposal_resolutions=(16,),
)


@pytest.fixture(scope="module")
def model_and_params():
    model = NerfactoModel(TINY)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def _rays(n, rng):
    origins = jnp.zeros((n, 3))
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:, 2] = np.abs(d[:, 2]) + 0.5
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    return origins, jnp.asarray(d)


def test_render_shapes(model_and_params, rng):
    model, params = model_and_params
    o, d = _rays(8, rng)
    out = model.render(params, o, d, jnp.zeros((8,), jnp.int32))
    assert out["rgb"].shape == (8, 3)
    assert out["depth"].shape == (8,)
    assert out["accumulation"].shape == (8,)
    assert out["normals"].shape == (8, 3)
    assert np.isfinite(np.asarray(out["rgb"])).all()
    assert (np.asarray(out["rgb"]) >= 0).all() and (np.asarray(out["rgb"]) <= 1).all()
    assert (np.asarray(out["depth"]) >= TINY.near - 1e-5).all()
    assert (np.asarray(out["depth"]) <= TINY.far + 1e-4).all()


def test_loss_and_grads_finite(model_and_params, rng):
    model, params = model_and_params
    o, d = _rays(8, rng)
    batch = {
        "origins": o,
        "directions": d,
        "rgb": jnp.full((8, 3), 0.5),
        "depth": jnp.full((8,), 2.0),
        "normal": jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (8, 1)),
        "camera_indices": jnp.zeros((8,), jnp.int32),
    }
    (loss, metrics), grads = jax.value_and_grad(model.loss, has_aux=True)(
        params, batch, jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(loss))
    for k, v in metrics.items():
        assert np.isfinite(float(v)), k
    flat, _ = jax.flatten_util.ravel_pytree(grads)
    assert np.isfinite(np.asarray(flat)).all()
    assert np.abs(np.asarray(flat)).sum() > 0


def test_bf16_proposal_tables_train_and_refresh(rng):
    """proposal_table_dtype='bfloat16': tables init + stay bf16 through a
    train step and a distill refresh; the step runs finite, and phased
    table grads compose with it."""
    import dataclasses

    from nerf_vo_tpu.mapping import keyframe_buffer as kb
    from nerf_vo_tpu.mapping.trainer import MappingTrainer, TrainerConfig

    cfg = dataclasses.replace(
        TINY, proposal_table_dtype="bfloat16", table_grad_phase=True,
        proposal_refresh_every=1,
    )
    model = NerfactoModel(cfg)
    trainer = MappingTrainer(
        model, TrainerConfig(rays_per_batch=64, max_iterations=8), 4
    )
    state = trainer.init(jax.random.PRNGKey(0))
    assert state.params["proposal_0"]["tables"].dtype == jnp.bfloat16

    buf = kb.create(4, 8, 12)
    packet = {
        "intrinsics": jnp.tile(jnp.asarray([10.0, 10.0, 6.0, 4.0]), (2, 1)),
        "c2w": jnp.broadcast_to(jnp.eye(4), (2, 4, 4)),
        "color": jnp.full((2, 8, 12, 3), 0.4),
        "depth": jnp.full((2, 8, 12), 2.0),
        "normal": jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (2, 8, 12, 1)),
    }
    buf = kb.insert(buf, jnp.arange(2), packet)
    for _ in range(3):  # crosses a refresh boundary AND both grad phases
        state, m = trainer.train_step(state, buf, jax.random.PRNGKey(3))
    assert np.isfinite(float(m["loss"]))
    assert state.params["proposal_0"]["tables"].dtype == jnp.bfloat16


@pytest.mark.parametrize("mode", ["samples", "surface", "none"])
def test_grad_normal_modes(mode, rng):
    """All three grad-normal placements produce finite losses/grads; the
    orientation/pred-normal losses exist iff the mode computes targets."""
    import dataclasses

    model = NerfactoModel(dataclasses.replace(TINY, grad_normal_mode=mode))
    params = model.init(jax.random.PRNGKey(0))
    o, d = _rays(8, rng)
    batch = {
        "origins": o,
        "directions": d,
        "rgb": jnp.full((8, 3), 0.5),
        "normal": jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (8, 1)),
        "camera_indices": jnp.zeros((8,), jnp.int32),
    }
    (loss, metrics), grads = jax.value_and_grad(model.loss, has_aux=True)(
        params, batch, jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(loss))
    has_norm_losses = "orientation_loss" in metrics
    assert has_norm_losses == (mode != "none")
    if has_norm_losses:
        assert np.isfinite(float(metrics["orientation_loss"]))
        assert np.isfinite(float(metrics["pred_normal_loss"]))
    flat, _ = jax.flatten_util.ravel_pytree(grads)
    assert np.isfinite(np.asarray(flat)).all()
    assert np.abs(np.asarray(flat)).sum() > 0


def test_overfit_constant_color(model_and_params, rng):
    model, _ = model_and_params
    params = model.init(jax.random.PRNGKey(2))
    o, d = _rays(32, rng)
    target = jnp.tile(jnp.asarray([[0.8, 0.2, 0.1]]), (32, 1))
    batch = {"origins": o, "directions": d, "rgb": target,
             "camera_indices": jnp.zeros((32,), jnp.int32)}

    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, key):
        (loss, m), g = jax.value_and_grad(model.loss, has_aux=True)(
            params, batch, key
        )
        updates, opt_state = tx.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state, m["rgb_loss"]

    key = jax.random.PRNGKey(3)
    first = None
    for i in range(60):
        key, sub = jax.random.split(key)
        params, opt_state, rl = step(params, opt_state, sub)
        if first is None:
            first = float(rl)
    assert float(rl) < first * 0.2, (first, float(rl))
