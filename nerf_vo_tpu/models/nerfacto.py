"""Nerfacto-equivalent NeRF model: proposal sampling + hash field + losses.

TPU-native replacement for the reference's ``ExtendedNerfactoModel``
(nerf_vo/mapping/nerfstudio_utils.py:326-350 on top of nerfstudio's
DepthNerfactoModel/NerfactoModel [upstream]): two hash-grid proposal density
fields drive PDF resampling, a final hash-grid field renders RGB / depth /
normals, and the loss set is RGB MSE + interlevel + distortion + DS-NeRF
depth + monosdf normal (+ orientation / pred-normal when predicting normals).

Everything is static-shape and jit-compiled as ONE fused XLA program per
train/render step; there is no nerfacc-style dynamic ray marching
(SURVEY.md §7.3(3)).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from nerf_vo_tpu.models.nerf_field import (
    DenseProposalField,
    HashGridConfig,
    MLPProposalField,
    NerfactoField,
    ProposalDensityField,
)
from nerf_vo_tpu.ops import losses as L
from nerf_vo_tpu.ops import occupancy as O
from nerf_vo_tpu.ops import rendering as R


@dataclasses.dataclass(frozen=True)
class NerfactoConfig:
    near: float = 0.05
    far: float = 50.0
    spacing: str = "disparity"
    # Proposal budget flipped 128+64 -> 96+48 on its TPU gate
    # (tpu_runs/exp_samples.log, 2026-08-19 13:23 proposal-budget-only
    # arms, production geometry): 96+48 = +0.94 dB / depth +0.16 at
    # 1.07x vs 128+64. Proposals are gradient-free (distilled) and only
    # place samples, so the budget cut touches forward gathers only;
    # 64+32 was faster (1.14x) but tripled the depth error (+0.86).
    # The nerf-sample budget stays at the reference's 48 — every cut
    # failed its quality gate (exp_samples 07:31 run: 32 -> -0.74 dB).
    num_proposal_samples: Tuple[int, ...] = (96, 48)
    num_nerf_samples: int = 48
    num_images: int = 512
    use_contraction: bool = True
    aabb_min: float = -1.0
    aabb_max: float = 1.0
    predict_normals: bool = True
    # where density-gradient normals (the orientation / pred-normal targets)
    # are evaluated:
    #   "samples" — at every final-field sample (nerfacto semantics
    #     [upstream]): the d(density)/d(pos) pullback runs at R x S points.
    #   "surface" — TPU redesign: ONE point per ray at the
    #     rendered expected depth, weighted by accumulation. The normal
    #     supervision signal lives where the surface is — the per-sample
    #     version spends its pullback mostly on near-zero-weight samples —
    #     and the pullback shrinks S-fold (48x at production config).
    #     Quality-gated on the synthetic posed-keyframe fit
    #     (scripts/exp_normals.py).
    #   "none" — disable orientation + pred-normal losses entirely
    #     (monosdf normal supervision against Omnidata priors remains).
    # Default flipped to "surface" on its TPU gate (tpu_runs/
    # exp_normals.log, 2026-08-19, v5e production geometry): surface
    # 30.32 dB / med rel-depth 0.289 vs samples 29.84 dB / 1.159 at
    # equal speed (27.5 vs 26.9 ms/step) — better on BOTH quality axes.
    grad_normal_mode: str = "surface"
    background: str = "last_sample"  # or "black" / "white"
    # loss multipliers (reference: nerf_vo/mapping/nerfstudio.py:62-103)
    interlevel_loss_mult: float = 1.0
    distortion_loss_mult: float = 0.002
    depth_loss_mult: float = 0.001
    depth_loss_type: str = "ds_nerf"  # "ds_nerf" (nerfstudio path) | "l2" (NGP path)
    normal_loss_mult: float = 5e-6
    depth_sigma: float = 0.001
    orientation_loss_mult: float = 1e-4
    pred_normal_loss_mult: float = 1e-3
    is_euclidean_depth: bool = False
    max_res: int = 2048
    log2_hashmap_size: int = 19
    # field grid geometry: 3 levels x 8 features (vs tiny-cuda-nn's 16 x 2).
    # On TPU the encode cost is per gather DESCRIPTOR (~4-5 ns fwd, ~17-26 ns
    # bwd scatter, scripts/exp_gather.py / exp_scatter2.py), one per
    # sample-level — fewer levels with fatter brick payloads win outright.
    # Geometry sweep on the synthetic posed-keyframe fit
    # (scripts/exp_distill.py, 400 steps): 3x8 = 32.2 dB, 4x8 = 28.8,
    # 3x12 = 29.9, 2x16 = 26.4, 8x4 = 26.6 — 3x8 is BOTH the fastest
    # trainable geometry (one level rides the one-hot MXU path, only two
    # levels pay the backward scatter) and the best-fitting one (more
    # entries per level cut hash collisions at the resolutions that matter).
    num_grid_levels: int = 3
    grid_features_per_level: int = 8
    # proposal fields: "dense" = single-level dense voxel density bricks
    # (1 descriptor/sample, no MLP — DenseProposalField); "hash" = 5-level
    # hash grid + MLP mirroring nerfstudio's HashMLPDensityField; "mlp" =
    # fourier-feature MLP (ZERO descriptors, pure MXU — MLPProposalField),
    # trained by in-step density distillation (requires
    # proposal_training == "distill").
    proposal_type: str = "dense"
    proposal_resolutions: Tuple[int, ...] = (128, 160)
    # per-level fourier frequency counts for proposal_type == "mlp"
    # (coarse level fewer frequencies, like coarse grid resolution)
    proposal_mlp_freqs: Tuple[int, ...] = (4, 6)
    # proposal TRAINING mechanism:
    #   "interlevel" — nerfacto semantics: proposals learn through the
    #     interlevel histogram loss (their only gradient path). On TPU that
    #     backward is pure scatter descriptors (~27 ms/step at production
    #     sizes, scripts/profile_mapping_ablate.py).
    #   "distill" (default) — TPU-first redesign: proposal grids carry NO
    #     gradients; a rotating brick slab is re-evaluated against the
    #     CURRENT field density every proposal_refresh_every steps
    #     (dynamic_update_slice, zero scatters), exactly the mechanism the
    #     NGP occupancy grid uses. Proposals only gate sample placement,
    #     so direct distillation preserves capability; requires
    #     proposal_type == "dense".
    proposal_training: str = "distill"
    # storage dtype of the distilled dense proposal tables (see
    # DenseProposalField.table_dtype): "bfloat16" halves the random-gather
    # bytes of the step's biggest table. Gated in exp_gradphase.py.
    proposal_table_dtype: str = "float32"
    proposal_refresh_every: int = 16
    proposal_refresh_bricks: int = 8192  # bricks re-evaluated per refresh
    # MLP-proposal distillation (proposal_type == "mlp"): the distill loss
    # matches each proposal MLP's logit to log(field density), stop-gradient,
    # at (a) the final field samples already evaluated this step (free,
    # naturally importance-weighted) and (b) this many uniform unit-cube
    # coverage points (teaches emptiness outside the sampled envelope —
    # the role the rotating brick slab plays for dense grids).
    proposal_distill_points: int = 4096
    proposal_distill_loss_mult: float = 1.0
    # log-density clamp for the distill target: proposals only gate sample
    # placement, so ~e^20 of dynamic range is plenty and keeps the MLP
    # regression well-conditioned
    proposal_distill_clip: float = 10.0
    # mesh axis name for tensor-parallel (column-sharded) hash tables; set
    # only when the train step runs inside a shard_map over that axis
    # (parallel/sharding.py make_dp_tp_train_step). None = replicated.
    model_axis: Optional[str] = None
    model_axis_size: int = 1
    # descriptor sharding (2D data x model): the sample axis is sharded
    # over the model axis too and table lookups route via all_to_all
    # (ops/hash_grid.tp_gather_cols_a2a) — per-device descriptor work
    # scales ~1/model_axis_size instead of staying flat. The train step
    # must then feed each model-axis device DIFFERENT rays
    # (make_dp_tp_train_step(descriptor_sharding=True)).
    descriptor_sharding: bool = False
    # phased table-gradient backward: each train step scatters only ONE of
    # the field's scattered hash levels (step % n_scattered picks it) —
    # exact per-level gradients at 1/n_scattered rate for 1/n_scattered of
    # the dominant backward-scatter cost (~8.5 ms of a ~29 ms step at
    # production config, tpu_runs/exp_step_cuts.log). Same staleness bet
    # the distilled proposals make. Default OFF until the TPU quality+speed
    # gate (scripts/exp_gradphase.py) passes.
    table_grad_phase: bool = False
    # sampling strategy: "proposal" (nerfacto) or "occupancy" (Instant-NGP
    # path: density-grid-driven empty-space skipping, ops/occupancy.py)
    sampler: str = "proposal"
    num_occ_bins: int = 128  # coarse occupancy bins per ray
    occupancy: O.OccupancyConfig = O.OccupancyConfig()


class NerfactoModel:
    """Stateless orchestrator; parameters live in a pytree owned by the caller."""

    def __init__(self, config: NerfactoConfig = NerfactoConfig()):
        self.config = config
        common = dict(
            use_contraction=config.use_contraction,
            aabb_min=config.aabb_min,
            aabb_max=config.aabb_max,
            model_axis=config.model_axis,
            model_axis_size=config.model_axis_size,
            descriptor_sharding=config.descriptor_sharding,
        )
        if config.proposal_type == "dense":
            self.proposal_fields = [
                DenseProposalField(
                    resolution=r,
                    table_dtype=config.proposal_table_dtype,
                    **common,
                )
                for r in config.proposal_resolutions
            ][: len(config.num_proposal_samples)]
        elif config.proposal_type == "mlp":
            assert config.proposal_training == "distill", (
                "MLP proposals have no interlevel gradient path; they train "
                "by density distillation (proposal_training='distill')"
            )
            self.proposal_fields = [
                MLPProposalField(n_freqs=f, **common)
                for f in config.proposal_mlp_freqs
            ][: len(config.num_proposal_samples)]
        else:
            self.proposal_fields = [
                ProposalDensityField(
                    grid=HashGridConfig(5, 2, 17, 16, 128), hidden=16, **common
                ),
                ProposalDensityField(
                    grid=HashGridConfig(5, 2, 17, 16, 256), hidden=16, **common
                ),
            ][: len(config.num_proposal_samples)]
        if config.sampler == "occupancy":
            self.proposal_fields = []
        self.field = NerfactoField(
            grid=HashGridConfig(
                config.num_grid_levels,
                config.grid_features_per_level,
                config.log2_hashmap_size,
                16,
                config.max_res,
            ),
            num_images=config.num_images,
            predict_normals=config.predict_normals,
            **common,
        )
        self._s_to_t = R.SPACINGS[config.spacing][0]

    # -- params ------------------------------------------------------------

    def init(self, key) -> Dict[str, Any]:
        kp = jax.random.split(key, len(self.proposal_fields) + 1)
        pts = jnp.zeros((8, 3))
        dirs = jnp.ones((8, 3)) / jnp.sqrt(3.0)
        params = {}
        for i, pf in enumerate(self.proposal_fields):
            params[f"proposal_{i}"] = pf.init(kp[i], pts)["params"]
        params["field"] = self.field.init(
            kp[-1], pts, dirs, jnp.zeros((8,), jnp.int32)
        )["params"]
        return params

    # -- rendering ---------------------------------------------------------

    def _positions(self, origins, directions, t_mid):
        return origins[..., None, :] + directions[..., None, :] * t_mid[..., None]

    def render(
        self,
        params: Dict[str, Any],
        origins,
        directions,
        camera_indices=None,
        key=None,
        train: bool = False,
        compute_grad_normals: bool = False,
        occ_grid=None,
        step=None,
    ) -> Dict[str, Any]:
        """Render a batch of rays.

        Args:
          origins/directions: [R, 3] world-frame rays (unit directions).
          camera_indices: [R] int32 keyframe ids for appearance embedding.
          key: PRNG key for stratified sampling (None -> deterministic centers).
          train: stratified sampling + keep per-level histograms for losses.

        Returns dict with rgb[R,3], depth[R] (euclidean ray distance),
        accumulation[R], optionally normals[R,3], plus histogram extras.
        """
        cfg = self.config
        n_rays = origins.shape[0]
        keys = (
            jax.random.split(key, len(cfg.num_proposal_samples) + 1)
            if key is not None
            else [None] * (len(cfg.num_proposal_samples) + 1)
        )

        edges_list = []
        weights_list = []

        if cfg.sampler == "occupancy":
            # Instant-NGP-equivalent empty-space skipping: cheap occupancy
            # gathers at coarse bin centers drive the PDF resampler, so the
            # fixed sample budget lands in occupied cells only.
            s_edges = R.uniform_bins(
                keys[0], n_rays, cfg.num_occ_bins, stratified=train
            )
            t_edges = self._s_to_t(s_edges, cfg.near, cfg.far)
            t_mid = 0.5 * (t_edges[..., 1:] + t_edges[..., :-1])
            pos = self._positions(origins, directions, t_mid)
            if occ_grid is not None:
                unit = self.field._to_unit(pos)
                w = O.bin_weights(occ_grid, unit, cfg.occupancy)
            else:  # no grid yet: uniform allocation
                w = jnp.ones(t_mid.shape, jnp.float32)
            s_edges = R.sample_pdf(
                keys[-1], s_edges, w, cfg.num_nerf_samples, stratified=train
            )
        else:
            s_edges = R.uniform_bins(
                keys[0], n_rays, cfg.num_proposal_samples[0], stratified=train
            )
            for i, pf in enumerate(self.proposal_fields):
                t_edges = self._s_to_t(s_edges, cfg.near, cfg.far)
                t_mid = 0.5 * (t_edges[..., 1:] + t_edges[..., :-1])
                deltas = t_edges[..., 1:] - t_edges[..., :-1]
                pos = self._positions(origins, directions, t_mid)
                density = pf.apply({"params": params[f"proposal_{i}"]}, pos)
                if cfg.proposal_training == "distill":
                    # distilled proposals carry no gradients: kills the
                    # backward scatter through the proposal tables AND the
                    # pose-gradient chain through proposal sampling
                    density = jax.lax.stop_gradient(density)
                weights, _ = R.render_weights(density, deltas)
                edges_list.append(s_edges)
                weights_list.append(weights)
                n_next = (
                    cfg.num_proposal_samples[i + 1]
                    if i + 1 < len(cfg.num_proposal_samples)
                    else cfg.num_nerf_samples
                )
                s_edges = R.sample_pdf(
                    keys[i + 1], s_edges, weights, n_next, stratified=train
                )

        # final field
        t_edges = self._s_to_t(s_edges, cfg.near, cfg.far)
        t_mid = 0.5 * (t_edges[..., 1:] + t_edges[..., :-1])
        deltas = t_edges[..., 1:] - t_edges[..., :-1]
        pos = self._positions(origins, directions, t_mid)

        field_params = {"params": params["field"]}
        # phased table-grad backward (see table_grad_phase): only the main
        # field pass gets the phase — the surface-normal pullback's extra
        # R descriptors are ~2% of the scatter and stay exact
        gp = step if (cfg.table_grad_phase and train
                      and step is not None) else None

        grad_normals = None
        if compute_grad_normals and cfg.grad_normal_mode == "samples":
            # Density-gradient normals are TARGETS (stop-gradient), not a
            # differentiable branch: the reference's orientation loss is
            # second-order in the field [upstream nerfstudio], but a
            # second-order pass would double the encode cost and forbid the
            # mixed-precision gather VJP; the surface orientation signal
            # here comes from pred_normal_loss + the Omnidata normal
            # supervision (the NeRF-VO-specific path). Documented delta.
            # jax.vjp shares the encode's gathered bricks between the
            # density value and its position gradient — no second encode.
            (density, geo), pullback = jax.vjp(
                lambda p: self.field.apply(
                    field_params, p, method=self.field.density, grad_phase=gp
                ),
                pos,
            )
            g = jax.lax.stop_gradient(
                pullback((jnp.ones_like(density), jnp.zeros_like(geo)))[0]
            )
            grad_normals = -g / jnp.clip(
                jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-7
            )
        else:
            density, geo = self.field.apply(
                field_params, pos, method=self.field.density, grad_phase=gp
            )

        dirs_b = jnp.broadcast_to(directions[..., None, :], pos.shape)
        rgb_samples = self.field.apply(
            field_params, geo, dirs_b, camera_indices, method=self.field.rgb
        )

        weights, trans = R.render_weights(density, deltas)
        edges_list.append(s_edges)
        weights_list.append(weights)

        if cfg.background == "last_sample":
            background = rgb_samples[..., -1, :]
        elif cfg.background == "white":
            background = jnp.ones(3)
        else:
            background = jnp.zeros(3)
        rgb = R.composite(weights, rgb_samples, background=background)
        depth = R.render_depth(weights, t_mid)
        acc = R.render_accumulation(weights)

        out = {
            "rgb": rgb,
            "depth": depth,
            "accumulation": acc,
            "s_edges_list": edges_list,
            "weights_list": weights_list,
            "t_mid": t_mid,
            "deltas": deltas,
            "sample_weights": weights,
        }
        if (train and cfg.proposal_type == "mlp"
                and cfg.proposal_training == "distill"):
            # free distillation targets for the MLP proposals: the field's
            # density at this step's final samples (see loss())
            out["sample_positions"] = pos
            out["sample_density"] = density
        if cfg.predict_normals:
            pred_n = self.field.apply(field_params, geo, method=self.field.normals)
            out["normals"] = R.composite(weights, pred_n)
            out["sample_pred_normals"] = pred_n
        if grad_normals is not None:
            out["sample_grad_normals"] = grad_normals
        if compute_grad_normals and cfg.grad_normal_mode == "surface":
            # One density pullback per ray at the rendered expected depth
            # (grad_normal_mode="surface"): the [R, 1, 3] surface point re-
            # encodes (R extra gather descriptors per level — noise next to
            # the R*S of the field pass) and its d(density)/d(pos) gives the
            # orientation / pred-normal target where the surface actually
            # is, weighted by the ray's accumulation.
            p_surf = jax.lax.stop_gradient(
                origins + directions * depth[..., None]
            )[..., None, :]
            (dens_s, geo_s), pullback = jax.vjp(
                lambda p: self.field.apply(
                    field_params, p, method=self.field.density
                ),
                p_surf,
            )
            g = jax.lax.stop_gradient(
                pullback((jnp.ones_like(dens_s), jnp.zeros_like(geo_s)))[0]
            )
            out["sample_grad_normals"] = -g / jnp.clip(
                jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-7
            )
            out["surface_pred_normals"] = self.field.apply(
                field_params, geo_s, method=self.field.normals
            )
            out["surface_weights"] = acc[..., None]
        return out

    # -- losses ------------------------------------------------------------

    def loss(self, params, batch: Dict[str, Any], key, step=None,
             occ_grid=None) -> Tuple[Any, Dict]:
        """Full training loss on a ray batch.

        batch keys: origins, directions, rgb [R,3]; optional: depth [R],
        normal [R,3], depth_cov [R], camera_indices [R], depth_mask, normal_mask.
        """
        cfg = self.config
        out = self.render(
            params,
            batch["origins"],
            batch["directions"],
            batch.get("camera_indices"),
            key=key,
            train=True,
            compute_grad_normals=(
                cfg.predict_normals and cfg.grad_normal_mode != "none"
            ),
            occ_grid=occ_grid,
            step=step,
        )
        metrics = {}
        loss = L.rgb_loss(out["rgb"], batch["rgb"])
        metrics["rgb_loss"] = loss

        # interlevel: each proposal histogram vs the final one (zero-mult
        # configs skip the computation entirely, not just the add)
        final_edges = out["s_edges_list"][-1]
        final_w = out["weights_list"][-1]
        if cfg.interlevel_loss_mult > 0 and cfg.proposal_training != "distill":
            inter = 0.0
            for pe, pw in zip(out["s_edges_list"][:-1],
                              out["weights_list"][:-1]):
                inter = inter + R.interlevel_loss(pe, pw, final_edges, final_w)
            metrics["interlevel_loss"] = inter
            loss = loss + cfg.interlevel_loss_mult * inter

        if (cfg.proposal_training == "distill" and cfg.proposal_type == "mlp"
                and self.proposal_fields):
            # MLP-proposal distillation: regress each proposal MLP's logit
            # onto log(field density), stop-gradient — the online analog of
            # the dense-grid slab refresh (refresh_proposals), riding the
            # SAME optimizer step. Targets: (a) the final samples already
            # evaluated (free, importance-weighted by the sampler itself —
            # corrects stale proposal mass because empty regions the
            # proposal wrongly favors keep getting sampled and re-labeled),
            # (b) uniform unit-cube coverage points (teaches structure
            # outside the current sampling envelope; field eval there is
            # forward-only — ~2 descriptors/point, no backward).
            c = cfg.proposal_distill_clip
            pts = jax.lax.stop_gradient(out["sample_positions"])
            tgt = jnp.clip(jnp.log(jnp.clip(jax.lax.stop_gradient(
                out["sample_density"]), 1e-30)), -c, c)
            kd = jax.random.fold_in(key, 7)
            up = jax.random.uniform(kd, (cfg.proposal_distill_points, 3))
            dens_u = jax.lax.stop_gradient(self.field.apply(
                {"params": params["field"]}, up,
                method=self.field.density_unit))
            tgt_u = jnp.clip(jnp.log(jnp.clip(dens_u, 1e-30)), -c, c)
            dloss = 0.0
            for i, pf in enumerate(self.proposal_fields):
                pv = {"params": params[f"proposal_{i}"]}
                ls = pf.apply(pv, pts, method="logit") - 1.0
                lu = pf.apply(pv, up, method="logit_unit") - 1.0
                dloss = (dloss
                         + jnp.mean(jnp.square(ls - tgt))
                         + jnp.mean(jnp.square(lu - tgt_u)))
            metrics["proposal_distill_loss"] = dloss
            loss = loss + cfg.proposal_distill_loss_mult * dloss

        if cfg.distortion_loss_mult > 0:
            dist = R.distortion_loss(final_edges, final_w)
            metrics["distortion_loss"] = dist
            loss = loss + cfg.distortion_loss_mult * dist

        if "depth" in batch and cfg.depth_loss_mult > 0:
            if cfg.depth_loss_type == "l2":
                # Instant-NGP / NeRF-SLAM covariance-weighted L2 depth loss
                # (reference nerf_vo/mapping/instant_ngp.py:46-48)
                dloss = L.depth_l2_loss(
                    out["depth"],
                    batch["depth"],
                    depth_cov=batch.get("depth_cov"),
                    mask=batch.get("depth_mask"),
                )
            else:
                dloss = L.ds_nerf_depth_loss(
                    out["sample_weights"],
                    out["t_mid"],
                    out["deltas"],
                    batch["depth"],
                    cfg.depth_sigma,
                    mask=batch.get("depth_mask"),
                )
            metrics["depth_loss"] = dloss
            loss = loss + cfg.depth_loss_mult * dloss

        if "normal" in batch and cfg.predict_normals and cfg.normal_loss_mult > 0:
            nloss = L.monosdf_normal_loss(
                out["normals"], batch["normal"], mask=batch.get("normal_mask")
            )
            metrics["normal_loss"] = nloss
            loss = loss + cfg.normal_loss_mult * nloss

        if cfg.predict_normals and "sample_grad_normals" in out:
            # surface mode carries ONE accumulation-weighted surface sample
            # per ray; samples mode the full [R, S] set (see grad_normal_mode)
            if cfg.grad_normal_mode == "surface":
                n_w = out["surface_weights"]
                n_pred = out["surface_pred_normals"]
            else:
                n_w = out["sample_weights"]
                n_pred = out["sample_pred_normals"]
            oloss = L.orientation_loss(
                n_w, out["sample_grad_normals"], batch["directions"]
            )
            ploss = L.pred_normal_loss(
                n_w, n_pred, out["sample_grad_normals"]
            )
            metrics["orientation_loss"] = oloss
            metrics["pred_normal_loss"] = ploss
            loss = (
                loss
                + cfg.orientation_loss_mult * oloss
                + cfg.pred_normal_loss_mult * ploss
            )

        metrics["loss"] = loss
        metrics["psnr"] = -10.0 * jnp.log10(jnp.clip(metrics["rgb_loss"], 1e-10))
        return loss, metrics

    # -- proposal distillation ----------------------------------------------

    def refresh_proposals(self, params, step):
        """Re-evaluate one rotating brick slab of every dense proposal grid
        against the CURRENT field density (proposal_training == "distill").

        Zero scatter descriptors: corner densities are written back with one
        dynamic_update_slice per level. Proposal and field share the same
        unit-cube contraction, so corner lattice coordinates feed
        ``field.density_unit`` directly.
        """
        cfg = self.config
        assert cfg.proposal_type == "dense", "distill requires dense proposals"
        field_params = {"params": params["field"]}
        new_params = dict(params)
        for i, pf in enumerate(self.proposal_fields):
            b0, col = self._proposal_slab(field_params, pf, step)
            tables = params[f"proposal_{i}"]["tables"]
            tables = jax.lax.dynamic_update_slice(
                tables, col.astype(tables.dtype), (0, b0)
            )
            new_params[f"proposal_{i}"] = dict(
                params[f"proposal_{i}"], tables=tables
            )
        return new_params

    def _proposal_slab(self, field_params, pf, step):
        """(start column, [32, S] refreshed brick columns) of one dense
        proposal grid's rotating slab, distilled from the field."""
        cfg = self.config
        g = pf.grid
        res = g.base_resolution
        bpa = ((res - 1) >> 1) + 1
        nb_real = bpa**3
        S = min(nb_real, cfg.proposal_refresh_bricks)
        n_slabs = max(nb_real // S, 1)
        rot = (step // cfg.proposal_refresh_every) % n_slabs
        b0 = rot * S
        bids = b0 + jnp.arange(S, dtype=jnp.int32)
        bx = bids // (bpa * bpa)
        by = (bids // bpa) % bpa
        bz = bids % bpa
        e = jnp.arange(27, dtype=jnp.int32)
        ex, ey, ez = e // 9, (e // 3) % 3, e % 3  # hash_encode W order
        gx = 2 * bx[None, :] + ex[:, None]
        gy = 2 * by[None, :] + ey[:, None]
        gz = 2 * bz[None, :] + ez[:, None]
        unit = jnp.stack([gx, gy, gz], -1).astype(jnp.float32) / res
        density = self.field.apply(
            field_params, unit, method=self.field.density_unit
        )  # [27, S]
        logits = jnp.log(jnp.clip(density, 1e-8, 1e8)) + 1.0
        col = jnp.concatenate(
            [logits, jnp.zeros((5, S), logits.dtype)], axis=0
        )  # pad to the 32-row brick column (pad rows carry zero weight)
        return b0, jax.lax.stop_gradient(col)

    # -- occupancy maintenance ----------------------------------------------

    def refresh_occupancy(self, params, occ_grid, step, key):
        """One occupancy-grid refresh (caller gates on cfg.occupancy.
        update_every): re-evaluate this step's rotating cell slab against the
        current field and max-merge (reference: pyngp's density-grid update
        inside Testbed.frame() [upstream])."""
        cfg = self.config.occupancy
        unit, start = O.slab_cell_centers(step, key, cfg)
        density = self.field.apply(
            {"params": params["field"]}, unit, method=self.field.density_unit
        )
        return O.refresh(occ_grid, density, start, cfg)
