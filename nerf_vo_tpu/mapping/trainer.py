"""Online NeRF mapping trainer: fused sample→render→loss→update step.

TPU-native replacement for the reference's nerfstudio ``Trainer`` +
``VanillaPipeline`` + optimizer wiring (nerf_vo/mapping/nerfstudio.py:47-173):
one jitted train step samples a ray batch from the keyframe buffer, renders,
computes the full loss set, and applies Adam updates to the field parameters
AND the per-keyframe SE3 pose corrections (the reference's CameraOptimizer,
Adam 1e-4 with exponential decay to 1e-5 — nerfstudio.py:84-100).

The whole step is one XLA program with donated state — the TPU never waits on
the host between iterations (async dispatch), which is what replaces the
reference's process-parallel trainer.
"""

from __future__ import annotations

import dataclasses
import functools
import os as _os
from typing import Any, Dict, Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from nerf_vo_tpu.mapping import keyframe_buffer as kb
from nerf_vo_tpu.models.nerfacto import NerfactoConfig, NerfactoModel

# NERF_VO_PREFETCH_BATCH=1 double-buffers the ray-batch PIXEL gather in
# TrainState: step t trains on the pixel batch sampled during step t-1 and
# samples step t+1's batch in the same program, so the gather has NO
# consumer inside its own step. Ray generation stays in-step on the
# CURRENT pose_deltas (camera-opt gradients exact); only the pixel
# TARGETS are one step stale (the reference's host-side PixelSampler has
# the same property across its process pipeline,
# nerfstudio_utils.py:295-300).
# MEASURED NEGATIVE (2026-08-21, tpu_runs/exp_prefetch.log): A-B-A
# best-of 23.83 ms off vs 23.73 ms on (0.4%, rule needed >5%) — the TPU
# executes the program's ops serially, so removing the data dependency
# does NOT let the gather DMA overlap the matmuls; there is no dual-queue
# concurrency to exploit at the XLA op level. Default stays off; the
# mechanism is kept because it is cheap, correct, and the right shape for
# a future backend whose scheduler can overlap (or for multi-chip splits
# where the sampler runs on another core's step).
_PREFETCH_BATCH = _os.environ.get("NERF_VO_PREFETCH_BATCH", "0") == "1"


@dataclasses.dataclass(frozen=True)
class TrainerConfig:
    rays_per_batch: int = 4096  # reference: 4096 (nerfstudio.py:62)
    learning_rate: float = 1e-2  # fields+proposals Adam (nerfstudio.py:84-100)
    camera_learning_rate: float = 1e-4
    camera_lr_final: float = 1e-5
    max_iterations: int = 8192  # mapping_iterations (configs/*.yaml)
    optimize_extrinsics: bool = True
    eps: float = 1e-15
    prefetch_batch: bool = _PREFETCH_BATCH


@flax.struct.dataclass
class TrainState:
    params: Any  # {"proposal_0", ..., "field"}
    pose_deltas: jnp.ndarray  # [K, 6]
    opt_state: Any
    cam_opt_state: Any
    step: jnp.ndarray  # [] int32
    occ_grid: Any = None  # [res^3] f32 when sampler == "occupancy"
    prefetch: Any = None  # next step's pixel batch (prefetch_batch mode)


class MappingTrainer:
    def __init__(self, model: NerfactoModel, config: TrainerConfig,
                 num_keyframes: int):
        self.model = model
        self.config = config
        self.num_keyframes = num_keyframes
        adam = optax.adam(config.learning_rate, eps=config.eps)
        mcfg = model.config
        if (mcfg.proposal_training == "distill"
                and mcfg.proposal_type == "dense"
                and model.proposal_fields):
            # Distilled DENSE proposal grids carry NO gradients (their only
            # write path is refresh_proposals' slab overwrite), yet a plain
            # Adam over the full params tree still materializes their zero
            # cotangents and reads+writes full-size m/v moments every step
            # — ~100 MB of params -> ~500+ MB of pure HBM overhead at the
            # production proposal resolutions (128/160). Route them through
            # set_to_zero(): their grad chain DCEs out of the XLA program,
            # the moment buffers are never allocated, and apply_updates'
            # p + 0 folds away in the algebraic simplifier. MLP proposals
            # (distill loss) and interlevel-trained grids keep real Adam.
            def _labels(params):
                return {
                    k: jax.tree_util.tree_map(
                        lambda _: "frozen" if k.startswith("proposal_")
                        else "train"
                    , v)
                    for k, v in params.items()
                }

            self.tx = optax.multi_transform(
                {"train": adam, "frozen": optax.set_to_zero()}, _labels
            )
        else:
            self.tx = adam
        cam_schedule = optax.exponential_decay(
            init_value=config.camera_learning_rate,
            transition_steps=max(config.max_iterations, 1),
            decay_rate=config.camera_lr_final / config.camera_learning_rate,
        )
        self.cam_tx = optax.adam(cam_schedule, eps=1e-8)
        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0,))
        # one cached jitted renderer (a fresh jit per call would recompile
        # every render — measured minutes/frame under remote XLA compile)
        self._render_chunk = jax.jit(
            lambda params, occ, o, d: self.model.render(
                params, o, d, None, occ_grid=occ
            )
        )

    def init(self, key) -> TrainState:
        from nerf_vo_tpu.ops import occupancy as O

        params = self.model.init(key)
        pose_deltas = jnp.zeros((self.num_keyframes, 6), jnp.float32)
        occ = (
            O.create(self.model.config.occupancy)
            if self.model.config.sampler == "occupancy"
            else None
        )
        return TrainState(
            params=params,
            pose_deltas=pose_deltas,
            opt_state=self.tx.init(params),
            cam_opt_state=self.cam_tx.init(pose_deltas),
            step=jnp.asarray(0, jnp.int32),
            occ_grid=occ,
        )

    # ------------------------------------------------------------------

    def _loss_fn(self, params, pose_deltas, buffer, key, step=None,
                 occ_grid=None, pixel_batch=None):
        k_sample, k_render = jax.random.split(key)
        deltas = pose_deltas if self.config.optimize_extrinsics else None
        if pixel_batch is not None:
            batch = kb.rays_from_pixel_batch(buffer, deltas, pixel_batch)
        else:
            batch = kb.sample_ray_batch(
                buffer, deltas, k_sample, self.config.rays_per_batch
            )
        return self.model.loss(
            params, batch, k_render, step=step, occ_grid=occ_grid
        )

    def _train_step_impl(self, state: TrainState, buffer: kb.KeyframeBuffer,
                         key) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        def wrapped(params, pose_deltas):
            return self._loss_fn(
                params, pose_deltas, buffer, key, step=state.step,
                occ_grid=jax.lax.stop_gradient(state.occ_grid)
                if state.occ_grid is not None else None,
                pixel_batch=state.prefetch,
            )

        # next step's pixel batch: no consumer in this step's loss/grad
        # chain, so its gather DMA is free to overlap the matmuls below
        # (this is the point of the double-buffering — see _PREFETCH_BATCH)
        prefetch = (
            kb.sample_pixel_batch(
                buffer, jax.random.fold_in(key, 2),
                self.config.rays_per_batch,
            )
            if state.prefetch is not None else None
        )

        (loss, metrics), grads = jax.value_and_grad(
            wrapped, argnums=(0, 1), has_aux=True
        )(state.params, state.pose_deltas)
        g_params, g_pose = grads

        updates, opt_state = self.tx.update(g_params, state.opt_state)
        params = optax.apply_updates(state.params, updates)

        if self.config.optimize_extrinsics:
            # keyframe 0 is the gauge anchor: freeze it
            g_pose = g_pose.at[0].set(0.0)
            cam_updates, cam_opt_state = self.cam_tx.update(
                g_pose, state.cam_opt_state
            )
            pose_deltas = optax.apply_updates(state.pose_deltas, cam_updates)
        else:
            pose_deltas = state.pose_deltas
            cam_opt_state = state.cam_opt_state

        mcfg = self.model.config
        # MLP proposals distill through the loss itself (no slab refresh)
        if (mcfg.proposal_training == "distill"
                and mcfg.proposal_type == "dense"
                and self.model.proposal_fields):
            params = jax.lax.cond(
                state.step % mcfg.proposal_refresh_every == 0,
                lambda p: self.model.refresh_proposals(p, state.step),
                lambda p: p,
                params,
            )

        occ_grid = state.occ_grid
        if occ_grid is not None:
            occ_cfg = self.model.config.occupancy
            key_occ = jax.random.fold_in(key, 1)
            occ_grid = jax.lax.cond(
                state.step % occ_cfg.update_every == 0,
                lambda g: self.model.refresh_occupancy(
                    params, g, state.step, key_occ
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
            prefetch=prefetch,
        )
        return new_state, metrics

    def train_step(self, state: TrainState, buffer: kb.KeyframeBuffer, key
                   ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
        if self.config.prefetch_batch and state.prefetch is None:
            # first call: fill the double buffer outside the jitted step
            # (one extra dispatch once; the pytree structure is then stable
            # so the step compiles exactly once)
            state = state.replace(prefetch=jax.jit(
                kb.sample_pixel_batch, static_argnames=("num_rays",)
            )(buffer, jax.random.fold_in(key, 3),
              num_rays=self.config.rays_per_batch))
        return self._train_step(state, buffer, key)

    # ------------------------------------------------------------------

    def optimized_c2w(self, state: TrainState, buffer: kb.KeyframeBuffer):
        """Per-keyframe poses with the learned SE3 corrections applied
        (reference: composing camera-optimizer deltas,
        evaluation/nerf_renderer.py:109-123)."""
        from nerf_vo_tpu.core import conventions, lie

        delta = lie.se3_matrix(lie.se3_exp(state.pose_deltas))
        return conventions.apply_transform(delta, buffer.c2w)

    def render_image(self, state: TrainState, c2w, intrinsics, height: int,
                     width: int, chunk: int = 1 << 14,
                     chunk_fn=None) -> Dict[str, jnp.ndarray]:
        """Full-frame render in fixed-size ray chunks (eval path,
        reference nerfstudio get_outputs_for_camera_ray_bundle [upstream]).

        ``chunk_fn`` overrides the single-device chunk renderer — pass
        :func:`parallel.sharding.make_dp_render_chunk`'s result to shard
        each chunk's rays over a device mesh (eval-side data parallelism).
        """
        from nerf_vo_tpu.core import cameras

        ys, xs = jnp.meshgrid(
            jnp.arange(height, dtype=jnp.float32),
            jnp.arange(width, dtype=jnp.float32),
            indexing="ij",
        )
        xy = jnp.stack([xs, ys], -1).reshape(-1, 2) + 0.5
        n = xy.shape[0]
        pad = (-n) % chunk
        xy = jnp.pad(xy, ((0, pad), (0, 0)))
        o, d, dn = cameras.generate_rays(c2w, intrinsics, xy, "opengl")

        render = chunk_fn if chunk_fn is not None else self._render_chunk
        outs = []
        for i in range(0, n + pad, chunk):
            r = render(
                state.params, state.occ_grid, o[i:i + chunk], d[i:i + chunk]
            )
            outs.append({k: r[k] for k in ("rgb", "depth", "accumulation")})
        cat = {k: jnp.concatenate([x[k] for x in outs])[:n] for k in outs[0]}
        rgb = cat["rgb"].reshape(height, width, 3)
        # euclidean ray distance -> z-depth (reference nerf_renderer.py:164-166)
        zdepth = (cat["depth"] / dn[: n, 0]).reshape(height, width)
        acc = cat["accumulation"].reshape(height, width)
        return {"rgb": rgb, "depth": zdepth, "accumulation": acc}
