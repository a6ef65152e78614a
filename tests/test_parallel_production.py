"""Production-shape multi-device mapping steps on the virtual CPU mesh
(VERDICT r3 item 6 / weak #6).

`__graft_entry__.dryrun_multichip` validates the sharded step on TOY
geometry (2^8 tables, 8+4 samples) so it stays fast for the driver. These
slow-tier tests run `make_dp_tp_train_step` — replicated-TP and
descriptor-sharded — at the REAL production shapes the capacity slacks
were designed around (`_TP_BWD_SLACK=1.5`, `_TP_A2A_SLACK=2.0`):
2^19-entry tables x 3 levels x 8 features, 96+48 proposal + 48 nerf
samples, 4096 rays, on the 8-virtual-device mesh (conftest forces
xla_force_host_platform_device_count=8).

At these shapes the per-device a2a descriptor slice is large enough that
the fixed per-pair capacity (slack * M / D, rounded to 128) is REAL — the
stats test pins, with the actual routing math (hash ids are uniform), how
much headroom the 2.0 slack leaves and that a deliberately skewed index
load trips the documented lax.cond fallback instead of corrupting data.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_vo_tpu.mapping import keyframe_buffer as kb
from nerf_vo_tpu.mapping.trainer import MappingTrainer, TrainerConfig
from nerf_vo_tpu.models.nerfacto import NerfactoConfig, NerfactoModel
from nerf_vo_tpu.ops import hash_grid
from nerf_vo_tpu.parallel import sharding

K, H, W = 8, 24, 32


def _production_trainer():
    # the REAL default NerfactoConfig (2^19 tables, 3x8 grid, 96+48+48
    # samples) — only num_images and the keyframe geometry shrink, neither
    # of which touches table or sample shapes
    model = NerfactoModel(NerfactoConfig(num_images=K))
    return MappingTrainer(
        model, TrainerConfig(rays_per_batch=4096, max_iterations=8), K
    )


def _buffer():
    buf = kb.create(K, H, W)
    rng = np.random.default_rng(0)
    c2w = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
    c2w[:, :3, 3] = rng.uniform(-0.3, 0.3, (K, 3))
    packet = {
        "intrinsics": jnp.tile(jnp.asarray([20.0, 20.0, W / 2, H / 2]),
                               (K, 1)),
        "c2w": jnp.asarray(c2w),
        "color": jnp.asarray(rng.uniform(0, 1, (K, H, W, 3)), jnp.float32),
        "depth": jnp.asarray(rng.uniform(0.5, 4.0, (K, H, W)), jnp.float32),
        "normal": jnp.tile(jnp.asarray([0.0, 0.0, 1.0]), (K, H, W, 1)),
    }
    return kb.insert(buf, jnp.arange(K), packet)


def _snapshot_params(state):
    """Host copies of the param leaves — the sharded steps DONATE their
    input state, so the originals are deleted after the call."""
    return [
        (path, np.asarray(leaf))
        for path, leaf in jax.tree_util.tree_leaves_with_path(state.params)
    ]


def _assert_finite_step(state2, metrics, before):
    assert np.isfinite(float(metrics["loss"]))
    moved = 0
    after = jax.tree_util.tree_leaves_with_path(state2.params)
    assert len(before) == len(after)
    for (path0, a0), (path2, l2) in zip(before, after):
        assert path0 == path2
        a2 = np.asarray(l2)
        assert np.isfinite(a2).all(), jax.tree_util.keystr(path2)
        if not np.array_equal(a0, a2):
            moved += 1
    assert moved > 0, "optimizer step did not update any parameter"


@pytest.mark.slow
def test_production_shape_tp_step():
    """DP(4) x TP(2) replicated-descriptor step at production table/sample
    shapes: one full train step, finite loss, finite updated params."""
    trainer = _production_trainer()
    buf = _buffer()
    mesh = sharding.make_mesh_2d(4, 2)
    st = sharding.shard_state_tp(trainer.init(jax.random.PRNGKey(0)), mesh)
    before = _snapshot_params(st)
    step = sharding.make_dp_tp_train_step(trainer, mesh)
    st2, m = step(st, sharding.replicate(buf, mesh), jax.random.PRNGKey(1))
    _assert_finite_step(st2, m, before)


@pytest.mark.slow
def test_production_shape_descriptor_sharded_step():
    """Descriptor-sharded 2D step at production shapes: rays shard over
    both axes, every scattered-level lookup routes through the a2a gather
    with its REAL capacity (slack*M/D at M = per-device descriptors)."""
    trainer = _production_trainer()
    buf = _buffer()
    mesh = sharding.make_mesh_2d(4, 2)
    st = sharding.shard_state_tp(trainer.init(jax.random.PRNGKey(0)), mesh)
    before = _snapshot_params(st)
    step = sharding.make_dp_tp_train_step(trainer, mesh,
                                          descriptor_sharding=True)
    st2, m = step(st, sharding.replicate(buf, mesh), jax.random.PRNGKey(1))
    _assert_finite_step(st2, m, before)


def test_a2a_capacity_headroom_at_production_shapes():
    """The routing-capacity math at the real shapes. With hash-uniform ids
    (the production distribution: brick ids are hash-mixed), the max
    per-owner request count must sit comfortably under the 2.0-slack cap;
    a fully skewed load (every descriptor owned by one shard) must
    OVERFLOW — that is what the lax.cond fallback exists for. Fast tier:
    pure host math, no mesh."""
    D = 2
    # per-device descriptor slice: 4096 rays x 48 nerf samples x 2
    # scattered levels / (4 data x 2 model devices) in the 2D mode
    M = 4096 * 48 * 2 // 8
    n_cols = (1 << 19)
    rng = np.random.default_rng(3)
    uniform = rng.integers(0, n_cols, M)
    stats = hash_grid.a2a_route_stats(uniform, n_cols, D)
    assert not stats["overflow"]
    # the slack's purpose: at uniform load max_rank ~ M/D; cap = 2.0x that
    assert stats["max_rank"] < 0.6 * stats["cap"], stats

    # at D=2 the cap clamps to M (cap = min(slack*M/D, M) = M), so even a
    # fully skewed load stays in-capacity — the fallback can only engage at
    # D >= 3. Check both facts.
    skew = np.full(M, 7, dtype=np.int64)  # all requests to shard 0
    assert not hash_grid.a2a_route_stats(skew, n_cols, 2)["overflow"]
    stats_skew = hash_grid.a2a_route_stats(skew, n_cols, 4)
    assert stats_skew["overflow"], stats_skew
