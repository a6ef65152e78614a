"""Multi-chip scaling for the mapper: data-parallel rays over a device mesh.

The reference is strictly single-GPU (SURVEY.md §2.3) — its only parallelism
is a 4-stage host process pipeline. The TPU rebuild's scaling story is
different and native: shard the ray batch of each mapping train step across a
``jax.sharding.Mesh`` (axis ``"data"``), replicate the hash tables / MLPs /
pose deltas, and let a ``shard_map``-wrapped step psum-average gradients over
ICI. Tracking BA solves are small dense problems and stay replicated.

This module is exercised on real hardware by ``__graft_entry__.dryrun_multichip``
and in CI on a virtual 8-device CPU mesh (tests/test_parallel.py).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nerf_vo_tpu.mapping import keyframe_buffer as kb
from nerf_vo_tpu.mapping.trainer import MappingTrainer, TrainState


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(jax.make_mesh((len(devs),), (axis,), devices=devs).devices, (axis,))


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def make_dp_train_step(trainer: MappingTrainer, mesh: Mesh, axis: str = "data"):
    """Build a data-parallel train step over ``mesh``.

    Each device samples ``rays_per_batch // n_dev`` rays (device-unique PRNG
    fold), computes local grads, and gradients are psum-averaged over ICI
    before the (replicated) Adam update. Semantically equivalent to the
    single-chip step with the full batch.
    """
    n_dev = mesh.devices.size
    per_dev = trainer.config.rays_per_batch // n_dev
    assert per_dev * n_dev == trainer.config.rays_per_batch, (
        "rays_per_batch must be divisible by mesh size"
    )

    def loss_fn(params, pose_deltas, buffer, key, occ_grid):
        k_sample, k_render = jax.random.split(key)
        deltas = pose_deltas if trainer.config.optimize_extrinsics else None
        batch = kb.sample_ray_batch(buffer, deltas, k_sample, per_dev)
        return trainer.model.loss(params, batch, k_render, occ_grid=occ_grid)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def dp_step(state: TrainState, buffer, key):
        dev_key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        occ = (
            jax.lax.stop_gradient(state.occ_grid)
            if state.occ_grid is not None else None
        )
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(state.params, state.pose_deltas, buffer, dev_key, occ)
        g_params, g_pose = grads
        g_params = jax.lax.pmean(g_params, axis)
        g_pose = jax.lax.pmean(g_pose, axis)
        metrics = jax.lax.pmean(metrics, axis)

        updates, opt_state = trainer.tx.update(g_params, state.opt_state)
        params = optax.apply_updates(state.params, updates)
        if trainer.config.optimize_extrinsics:
            g_pose = g_pose.at[0].set(0.0)
            cam_updates, cam_opt_state = trainer.cam_tx.update(
                g_pose, state.cam_opt_state
            )
            pose_deltas = optax.apply_updates(state.pose_deltas, cam_updates)
        else:
            pose_deltas = state.pose_deltas
            cam_opt_state = state.cam_opt_state
        occ_grid = state.occ_grid
        if occ_grid is not None:
            # replicated refresh: same key on every device -> identical grids
            occ_cfg = trainer.model.config.occupancy
            occ_grid = jax.lax.cond(
                state.step % occ_cfg.update_every == 0,
                lambda g: trainer.model.refresh_occupancy(
                    params, g, state.step, jax.random.fold_in(key, 1)
                ),
                lambda g: g,
                occ_grid,
            )
        new_state = TrainState(
            params=params,
            pose_deltas=pose_deltas,
            opt_state=opt_state,
            cam_opt_state=cam_opt_state,
            step=state.step + 1,
            occ_grid=occ_grid,
        )
        return new_state, metrics

    return jax.jit(dp_step, donate_argnums=(0,))
