import jax
import numpy as np
import pytest


def test_devices_available():
    assert len(jax.devices()) >= 8


def test_dryrun_multichip():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)


def test_tp_matches_dp():
    """DP(4) x TP(2) must reproduce DP(4): the tensor-parallel table path
    (masked local gather + feature psum, shard-local scatter grads) is
    numerically the same computation, just column-sharded."""
    import jax.numpy as jnp

    from nerf_vo_tpu.mapping import keyframe_buffer as kb
    from nerf_vo_tpu.mapping.trainer import MappingTrainer, TrainerConfig
    from nerf_vo_tpu.models.nerfacto import NerfactoConfig, NerfactoModel
    from nerf_vo_tpu.parallel import sharding

    K, H, W = 4, 12, 16
    model = NerfactoModel(
        NerfactoConfig(
            num_proposal_samples=(8,),
            num_nerf_samples=4,
            num_images=K,
            log2_hashmap_size=8,
            max_res=32,
            proposal_resolutions=(8,),
        )
    )
    trainer = MappingTrainer(
        model, TrainerConfig(rays_per_batch=64, max_iterations=8), K
    )
    buf = kb.create(K, H, W)
    packet = {
        "intrinsics": jnp.tile(jnp.asarray([10.0, 10.0, W / 2, H / 2]),
                               (K, 1)),
        "c2w": jnp.tile(jnp.eye(4), (K, 1, 1)),
        "color": jnp.full((K, H, W, 3), 0.5),
        "depth": jnp.full((K, H, W), 2.0),
        "normal": jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (K, H, W, 1)),
    }
    buf = kb.insert(buf, jnp.arange(K), packet)
    key = jax.random.PRNGKey(1)

    mesh_dp = sharding.make_mesh(4)
    st_dp = sharding.replicate(trainer.init(jax.random.PRNGKey(0)), mesh_dp)
    dp = sharding.make_dp_train_step(trainer, mesh_dp)
    _, m_dp = dp(st_dp, sharding.replicate(buf, mesh_dp), key)

    mesh_tp = sharding.make_mesh_2d(4, 2)
    st_tp = sharding.shard_state_tp(trainer.init(jax.random.PRNGKey(0)),
                                    mesh_tp)
    tp = sharding.make_dp_tp_train_step(trainer, mesh_tp)
    _, m_tp = tp(st_tp, sharding.replicate(buf, mesh_tp), key)

    np.testing.assert_allclose(
        float(m_dp["loss"]), float(m_tp["loss"]), rtol=1e-5
    )


def test_entry_compiles():
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    out = jax.jit(fn)(*args)
    rgb = np.asarray(out[0])
    assert rgb.shape[1] == 3
    assert np.isfinite(rgb).all()
