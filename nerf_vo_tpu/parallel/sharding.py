"""Multi-chip scaling for the mapper over a jax.sharding device mesh.

The reference is strictly single-GPU (SURVEY.md §2.3) — its only parallelism
is a 4-stage host process pipeline. The TPU rebuild's scaling story is
native SPMD, along the two axes that actually help this workload:

* **data** — shard the ray batch (make_dp_train_step): rays are
  embarrassingly parallel and the encode cost is per gather DESCRIPTOR
  (scripts/exp_gather.py), so descriptors/device scale 1/n_data. This is
  the THROUGHPUT axis. Gradients psum-average over ICI.
* **model** — column-shard the hash tables (make_dp_tp_train_step): each
  device owns a contiguous brick-column slice of every grid; features are
  reassembled with one psum, and table gradients (and Adam state) stay
  shard-local. Descriptors/device do NOT shrink — this is the MEMORY axis,
  for scenes whose grids exceed one chip's HBM (ops/hash_grid.py
  _tp_gather_cols has the full analysis).

Tracking BA solves are small dense problems and stay replicated.

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


def make_mesh_2d(n_data: int, n_model: int,
                 axes: Tuple[str, str] = ("data", "model")) -> Mesh:
    """2D mesh: data-parallel rays x model-parallel hash tables."""
    devs = jax.devices()[: n_data * n_model]
    return Mesh(
        jax.make_mesh((n_data, n_model), axes, devices=devs).devices, axes
    )


def initialize_distributed(**kwargs) -> None:
    """Multi-host (pod / multi-slice) init: call once per host before any
    backend use. Thin wrapper over jax.distributed.initialize so run
    scripts never import jax.distributed directly; on a single host it is
    a documented no-op (initialize() requires cluster env vars)."""
    import os

    if "JAX_COORDINATOR_ADDRESS" in os.environ or kwargs:
        jax.distributed.initialize(**kwargs)


def make_pod_mesh(n_data: Optional[int] = None, n_model: int = 1,
                  axes: Tuple[str, str] = ("data", "model")) -> Mesh:
    """Pod-scale 2D mesh with collective-locality-aware axis placement.

    The MODEL axis carries one feature psum per hash-grid encode (several
    per train step), so it must ride ICI: it is placed within a slice
    (innermost). The DATA axis carries exactly one gradient pmean per
    step — DCN-tolerant — so it spans slices/hosts (outermost). On one
    host/slice this degrades to make_mesh_2d's layout; with multiple
    slices it uses mesh_utils.create_hybrid_device_mesh, which keeps each
    slice's devices contiguous on the inner axes.
    """
    from jax.experimental import mesh_utils

    devs = jax.devices()
    total = len(devs)
    if n_data is None:
        assert total % n_model == 0, (total, n_model)
        n_data = total // n_model
    n_slices = len({getattr(d, "slice_index", 0) for d in devs})
    if n_slices > 1:
        per_slice = total // n_slices
        assert n_model <= per_slice and per_slice % n_model == 0, (
            f"model axis ({n_model}) must fit inside one slice "
            f"({per_slice} devices) — its psum rides ICI"
        )
        mesh_devs = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(n_data // n_slices, n_model),
            dcn_mesh_shape=(n_slices, 1),
            devices=devs,
        )
        return Mesh(mesh_devs, axes)
    return make_mesh_2d(n_data, n_model, axes)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def _is_table_path(path) -> bool:
    return any(
        getattr(k, "key", None) == "tables" for k in path
    )


def table_sharded_specs(params, model_axis: str = "model"):
    """PartitionSpec tree for params: hash-table leaves column-sharded over
    ``model_axis``, everything else replicated."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: P(None, model_axis) if _is_table_path(path)
        else P(),
        params,
    )


def shard_state_tp(state: TrainState, mesh: Mesh, model_axis: str = "model"):
    """Place a TrainState on a 2D mesh: tables (and their Adam moments)
    column-sharded over ``model_axis``, everything else replicated."""
    pspec = table_sharded_specs(state.params, model_axis)

    def put(tree, spec_tree):
        return jax.tree_util.tree_map(
            lambda leaf, spec: jax.device_put(
                leaf, NamedSharding(mesh, spec)
            ),
            tree, spec_tree,
        )

    params = put(state.params, pspec)
    # optax.adam state: ScaleByAdamState(count, mu, nu) + chain wrappers —
    # mu/nu mirror the params tree; shard them identically
    def put_opt(opt_state):
        return jax.tree_util.tree_map_with_path(
            lambda path, leaf: jax.device_put(
                leaf,
                NamedSharding(
                    mesh,
                    P(None, model_axis)
                    if (_is_table_path(path) and leaf.ndim == 2) else P(),
                ),
            ),
            opt_state,
        )

    return TrainState(
        params=params,
        pose_deltas=jax.device_put(
            state.pose_deltas, NamedSharding(mesh, P())
        ),
        opt_state=put_opt(state.opt_state),
        cam_opt_state=jax.device_put(
            state.cam_opt_state, NamedSharding(mesh, P())
        ),
        step=jax.device_put(state.step, NamedSharding(mesh, P())),
        occ_grid=(
            jax.device_put(state.occ_grid, NamedSharding(mesh, P()))
            if state.occ_grid is not None else None
        ),
    )


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
        mcfg = trainer.model.config
        # MLP proposals distill through the loss itself (no slab refresh)
        if (mcfg.proposal_training == "distill"
                and mcfg.proposal_type == "dense"
                and trainer.model.proposal_fields):
            # replicated refresh: deterministic slab -> identical tables
            params = jax.lax.cond(
                state.step % mcfg.proposal_refresh_every == 0,
                lambda p: trainer.model.refresh_proposals(p, state.step),
                lambda p: p,
                params,
            )
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


def make_dp_render_chunk(trainer: MappingTrainer, mesh: Mesh,
                         axis: str = "data"):
    """Data-parallel eval renderer: shard a render chunk's RAYS over
    ``mesh`` (params/occupancy replicated, no collectives — rendering is
    embarrassingly parallel). Drop-in for
    :meth:`MappingTrainer.render_image`'s ``chunk_fn``; full-frame eval
    renders (evaluation/nerf_renderer.py MapRenderer, the reference's
    NeRFRenderer role) then scale 1/n_devices.

    The chunk size fed to render_image must stay divisible by the mesh
    size (the default 1 << 14 covers any power-of-two mesh).
    """
    n_dev = int(mesh.devices.size)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )
    def chunk(params, occ, o, d):
        return trainer.model.render(params, o, d, None, occ_grid=occ)

    chunk_jit = jax.jit(chunk)

    def run(params, occ, o, d):
        assert o.shape[0] % n_dev == 0, (o.shape, n_dev)
        return chunk_jit(params, occ, o, d)

    return run


def _tp_refresh_proposals(tp_model, params, step, n_model: int, axis: str):
    """Distill-refresh the dense proposal grids when their tables are
    column-sharded: the slab is computed replicated (density eval goes
    through the TP field view), then each device overwrites only the
    columns it owns."""
    import jax.numpy as jnp

    field_params = {"params": params["field"]}
    new_params = dict(params)
    ax = jax.lax.axis_index(axis)
    for i, pf in enumerate(tp_model.proposal_fields):
        b0, col = tp_model._proposal_slab(field_params, pf, step)
        local = params[f"proposal_{i}"]["tables"]  # [32, NB/m]
        local_nb = local.shape[1]
        gid = ax * local_nb + jnp.arange(local_nb, dtype=jnp.int32)
        rel = gid - b0
        S = col.shape[1]
        in_slab = (rel >= 0) & (rel < S)
        upd = col[:, jnp.clip(rel, 0, S - 1)].astype(local.dtype)
        new_tables = jnp.where(in_slab[None, :], upd, local)
        new_params[f"proposal_{i}"] = dict(
            params[f"proposal_{i}"], tables=new_tables
        )
    return new_params


def make_dp_tp_train_step(trainer: MappingTrainer, mesh: Mesh,
                          data_axis: str = "data",
                          model_axis: str = "model",
                          descriptor_sharding: bool = False):
    """Build a 2D data x model parallel train step over ``mesh``.

    Rays shard over ``data_axis`` (throughput); every grid's table columns
    shard over ``model_axis`` (memory — see module docstring). Use
    :func:`shard_state_tp` to place the TrainState first.

    The loss runs on a model VIEW with ``config.model_axis`` set, so each
    ``hash_encode`` does the local masked gather + feature psum; the param
    tree is identical to the replicated model's, just column-sharded.

    ``descriptor_sharding``: 2D descriptor sharding — the ray batch shards
    over BOTH axes (each model-axis device gets different rays) and table
    lookups route through the all_to_all gather
    (ops/hash_grid.tp_gather_cols_a2a), so per-device encode descriptors
    scale ~1/(n_data*n_model) instead of 1/n_data. Table gradients arrive
    at their owning shard as the SUM over the model group (the routing
    delivers each descriptor's cotangent exactly once) and are divided by
    n_model to make the group mean; replicated leaves pmean over both axes
    as a true average. The model axis becomes a throughput axis too, while
    keeping the 1/n_model table memory.
    """
    import dataclasses as _dc

    from nerf_vo_tpu.models.nerfacto import NerfactoModel

    n_data = mesh.shape[data_axis]
    n_model = int(mesh.shape[model_axis])
    n_groups = n_data * n_model if descriptor_sharding else n_data
    per_dev = trainer.config.rays_per_batch // n_groups
    assert per_dev * n_groups == trainer.config.rays_per_batch, (
        trainer.config.rays_per_batch, n_groups
    )

    tp_model = NerfactoModel(
        _dc.replace(
            trainer.model.config,
            model_axis=model_axis,
            model_axis_size=n_model,
            descriptor_sharding=descriptor_sharding,
        )
    )

    def loss_fn(params, pose_deltas, buffer, key, occ_grid):
        k_sample, k_render = jax.random.split(key)
        deltas = pose_deltas if trainer.config.optimize_extrinsics else None
        batch = kb.sample_ray_batch(buffer, deltas, k_sample, per_dev)
        return tp_model.loss(params, batch, k_render, occ_grid=occ_grid)

    # param leaves: tables carry a per-device column shard; grads for them
    # are shard-local (no collective); everything else is replicated and
    # pmean'd over both axes
    def spec_of(state):
        pspec = table_sharded_specs(state.params, model_axis)
        opt_spec = jax.tree_util.tree_map_with_path(
            lambda path, leaf: P(None, model_axis)
            if (_is_table_path(path) and getattr(leaf, "ndim", 0) == 2)
            else P(),
            state.opt_state,
        )
        return TrainState(
            params=pspec, pose_deltas=P(), opt_state=opt_spec,
            cam_opt_state=P(), step=P(),
            occ_grid=P() if state.occ_grid is not None else None,
        )

    def build(state_spec):
        @functools.partial(
            jax.shard_map,
            mesh=mesh,
            in_specs=(state_spec, P(), P()),
            out_specs=(state_spec, P()),
            check_vma=False,
        )
        def step(state: TrainState, buffer, key):
            if descriptor_sharding:
                # unique rays on EVERY device (both axes)
                dev_key = jax.random.fold_in(
                    key,
                    jax.lax.axis_index(data_axis) * n_model
                    + jax.lax.axis_index(model_axis),
                )
            else:
                # same rays within a model group; unique rays per data row
                dev_key = jax.random.fold_in(
                    key, jax.lax.axis_index(data_axis)
                )
            occ = (
                jax.lax.stop_gradient(state.occ_grid)
                if state.occ_grid is not None else None
            )
            (loss, metrics), grads = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True
            )(state.params, state.pose_deltas, buffer, dev_key, occ)
            g_params, g_pose = grads
            # table grads: shard-local columns, pmean over data only;
            # replicated leaves: pmean over both axes (identical across
            # the model axis in exact arithmetic; the pmean pins them).
            # Under descriptor sharding the routed table grad is the SUM
            # over the model group's per-device grads — /n_model makes it
            # the group mean, matching the replicated leaves' pmean.
            t_scale = 1.0 / n_model if descriptor_sharding else 1.0
            g_params = jax.tree_util.tree_map_with_path(
                lambda path, g: jax.lax.pmean(g, data_axis) * t_scale
                if _is_table_path(path)
                else jax.lax.pmean(g, (data_axis, model_axis)),
                g_params,
            )
            g_pose = jax.lax.pmean(g_pose, (data_axis, model_axis))
            metrics = jax.lax.pmean(metrics, (data_axis, model_axis))

            updates, opt_state = trainer.tx.update(
                g_params, state.opt_state
            )
            params = optax.apply_updates(state.params, updates)
            if trainer.config.optimize_extrinsics:
                g_pose = g_pose.at[0].set(0.0)
                cam_updates, cam_opt_state = trainer.cam_tx.update(
                    g_pose, state.cam_opt_state
                )
                pose_deltas = optax.apply_updates(
                    state.pose_deltas, cam_updates
                )
            else:
                pose_deltas = state.pose_deltas
                cam_opt_state = state.cam_opt_state
            mcfg = tp_model.config
            # MLP proposals distill through the loss itself (no slab refresh)
            if (mcfg.proposal_training == "distill"
                    and mcfg.proposal_type == "dense"
                    and tp_model.proposal_fields):
                # refresh through the TP model view (column-sharded field
                # tables feed density_unit); proposal tables are themselves
                # column-sharded, so slice the update to the local shard
                params = jax.lax.cond(
                    state.step % mcfg.proposal_refresh_every == 0,
                    lambda p: _tp_refresh_proposals(
                        tp_model, p, state.step, mesh.shape[model_axis],
                        model_axis,
                    ),
                    lambda p: p,
                    params,
                )
            occ_grid = state.occ_grid
            if occ_grid is not None:
                # Refresh through the TP model view so density evaluation
                # does the local masked gather + feature psum over the
                # column-sharded tables; same key everywhere -> identical
                # grids (mirrors the DP step's replicated refresh).
                occ_cfg = tp_model.config.occupancy
                occ_grid = jax.lax.cond(
                    state.step % occ_cfg.update_every == 0,
                    lambda g: tp_model.refresh_occupancy(
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

        return jax.jit(step, donate_argnums=(0,))

    _cache = {}

    def run(state, buffer, key):
        # Key on the pytree structure, not the (always-identical) class:
        # occ_grid None vs array changes the spec and must not hit a stale
        # compiled step.
        k = jax.tree_util.tree_structure(state)
        if k not in _cache:
            _cache[k] = build(spec_of(state))
        return _cache[k](state, buffer, key)

    return run
