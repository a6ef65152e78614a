"""Hash-grid NeRF fields (nerfacto-family) in Flax.

TPU-native replacement for nerfstudio's ``HashMLPDensityField`` /
``NerfactoField`` (reference submodule N7, consumed via
nerf_vo/mapping/nerfstudio.py:47-103) and the tiny-cuda-nn fused MLPs inside
them (N6). The MLPs here are deliberately plain XLA matmuls: at 64-wide
hidden layers over >=10^5 samples per batch they map straight onto the MXU
and XLA fuses the elementwise chain — a hand-written Pallas kernel buys
nothing until profiling says otherwise (SURVEY.md §7.1(4)).
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from nerf_vo_tpu.ops import hash_grid
from nerf_vo_tpu.ops.hash_grid import HashGridConfig
from nerf_vo_tpu.ops.sh import sh_encode


@jax.custom_vjp
def trunc_exp(x):
    """exp with a clamped-input gradient (Instant-NGP's density activation)."""
    return jnp.exp(x)


def _trunc_exp_fwd(x):
    return jnp.exp(x), x


def _trunc_exp_bwd(x, g):
    return (g * jnp.exp(jnp.clip(x, -15.0, 15.0)),)


trunc_exp.defvjp(_trunc_exp_fwd, _trunc_exp_bwd)


class MLP(nn.Module):
    hidden: int
    depth: int
    out_dim: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        for _ in range(self.depth):
            x = nn.Dense(self.hidden, dtype=self.dtype)(x)
            x = nn.relu(x)
        x = nn.Dense(self.out_dim, dtype=self.dtype)(x)
        return x.astype(jnp.float32)


class ProposalDensityField(nn.Module):
    """Small hash grid -> density only (nerfstudio HashMLPDensityField)."""

    grid: HashGridConfig = HashGridConfig(
        n_levels=5, features_per_level=2, log2_table_size=17,
        base_resolution=16, max_resolution=256,
    )
    hidden: int = 16
    model_axis: Optional[str] = None  # mesh axis of column-sharded tables
    model_axis_size: int = 1  # shard count (declares local param shape)
    descriptor_sharding: bool = False  # a2a-routed lookups (samples sharded)
    use_contraction: bool = True
    aabb_min: float = -1.0
    aabb_max: float = 1.0

    def _to_unit(self, positions):
        if self.use_contraction:
            return hash_grid.contract_to_unit_cube(positions)
        return hash_grid.normalize_to_unit_cube(
            positions, self.aabb_min, self.aabb_max
        )

    @nn.compact
    def __call__(self, positions):
        """positions [..., 3] world-frame -> density [...]."""
        tables = self.param(
            "tables",
            lambda key: hash_grid.init_tables(
                key, self.grid, shard=self.model_axis_size),
        )
        feat = hash_grid.hash_encode(
            tables, self._to_unit(positions), self.grid,
            model_axis=self.model_axis,
            descriptor_sharding=self.descriptor_sharding,
        )
        h = MLP(hidden=self.hidden, depth=1, out_dim=1)(feat)
        return trunc_exp(h[..., 0] - 1.0)


class MLPProposalField(nn.Module):
    """Fourier-feature MLP proposal density — ZERO gather/scatter descriptors.

    Third proposal-field design point (after ``ProposalDensityField``'s
    hash+MLP and ``DenseProposalField``'s 1-descriptor dense grid), motivated
    by the measured TPU cost model: every grid formulation pays a hard
    per-descriptor floor (~4-5 ns gather fwd, ~17-26 ns scatter bwd,
    scripts/exp_gather.py / exp_scatter2.py), and at the production budget
    (4096 rays x 192 proposal samples) the dense-grid proposals' gathers
    alone are ~3.5 ms/step — a third of the whole train step. A
    positional-encoding MLP moves the entire proposal evaluation onto the
    MXU: ~20 KFLOP/sample = ~0.1 ms for the same batch, with no backward
    scatter ever. Capacity is far below a res-128 grid, but proposal fields
    only gate sample placement (the final field does the rendering), and the
    MLP trains online by direct density distillation from the field
    (NerfactoModel.loss, proposal_training == "distill") — the same
    capability argument as the dense-grid distillation, quality-gated on the
    synthetic posed-keyframe fit (scripts/exp_distill.py).

    Fulfils the nerfstudio ``HashMLPDensityField`` role (reference N7,
    nerf_vo/mapping/nerfstudio.py:47-103).
    """

    n_freqs: int = 6
    hidden: int = 64
    depth: int = 2
    model_axis: Optional[str] = None  # unused: params replicate under TP
    model_axis_size: int = 1
    descriptor_sharding: bool = False  # unused: no table lookups here
    use_contraction: bool = True
    aabb_min: float = -1.0
    aabb_max: float = 1.0

    def _to_unit(self, positions):
        if self.use_contraction:
            return hash_grid.contract_to_unit_cube(positions)
        return hash_grid.normalize_to_unit_cube(
            positions, self.aabb_min, self.aabb_max
        )

    @nn.compact
    def _mlp(self, x):
        return MLP(hidden=self.hidden, depth=self.depth, out_dim=1)(x)

    def _encode(self, unit):
        # NeRF positional encoding on [-1, 1]^3: [x, sin/cos(2^k pi x)]
        x = unit * 2.0 - 1.0
        k = 2.0 ** jnp.arange(self.n_freqs, dtype=jnp.float32) * jnp.pi
        ang = x[..., None] * k  # [..., 3, n_freqs]
        enc = jnp.concatenate(
            [jnp.sin(ang), jnp.cos(ang)], axis=-1
        ).reshape(x.shape[:-1] + (3 * 2 * self.n_freqs,))
        return jnp.concatenate([x, enc], axis=-1)

    def logit_unit(self, unit_positions):
        """Density logit at unit-cube coords (pre ``- 1`` shift): the
        distillation target space — logit - 1 approximates log(density)."""
        return self._mlp(self._encode(unit_positions))[..., 0]

    def logit(self, positions):
        """Density logit at world coords (distill-loss prediction path)."""
        return self.logit_unit(self._to_unit(positions))

    def __call__(self, positions):
        """positions [..., 3] world-frame -> density [...]."""
        return trunc_exp(self.logit(positions) - 1.0)


class DenseProposalField(nn.Module):
    """Dense voxel density grid -> density (TPU-native proposal field).

    Fulfils the role of nerfstudio's ``HashMLPDensityField`` (reference
    N7, nerf_vo/mapping/nerfstudio.py:47-103) but is REDESIGNED for the TPU
    cost model: proposal encodes are descriptor-bound (each hash-grid level
    costs one gather DESCRIPTOR per sample at a hard ~4-5 ns floor,
    scripts/exp_gather.py), so a proposal-quality density field should spend
    exactly ONE descriptor per sample. A dense single-level brick grid at the
    proposal's max resolution has the same effective capacity as the 5-level
    hash+MLP it replaces (proposal fields only gate sample placement), is
    collision-free, and needs no MLP: the grid stores density logits
    directly. 5x fewer descriptors fwd AND bwd.

    Implemented as the 1-level / 1-feature special case of the brick hash
    grid (dense because the brick lattice fits the table by construction).
    """

    resolution: int = 128
    model_axis: Optional[str] = None  # mesh axis of column-sharded tables
    model_axis_size: int = 1  # shard count (declares local param shape)
    descriptor_sharding: bool = False  # a2a-routed lookups (samples sharded)
    use_contraction: bool = True
    aabb_min: float = -1.0
    aabb_max: float = 1.0
    # distilled proposal tables are refreshed DATA, not optimizer-managed
    # weights (trainer routes them through set_to_zero), and the encode
    # gathers a bf16 shadow anyway — storing bf16 halves the random-gather
    # bytes of the biggest table in the step (res-160 = 65 MB f32, which
    # gathers at ~17 ns/descriptor vs the ~4-5 ns cache-resident floor)
    table_dtype: str = "float32"

    @property
    def grid(self) -> HashGridConfig:
        bricks_per_axis = ((self.resolution - 1) >> 1) + 1
        needed = bricks_per_axis**3 * 32  # brick-padded entries
        return HashGridConfig(
            n_levels=1,
            features_per_level=1,
            log2_table_size=max(needed - 1, 1).bit_length(),
            base_resolution=self.resolution,
            max_resolution=self.resolution,
        )

    def _to_unit(self, positions):
        if self.use_contraction:
            return hash_grid.contract_to_unit_cube(positions)
        return hash_grid.normalize_to_unit_cube(
            positions, self.aabb_min, self.aabb_max
        )

    @nn.compact
    def __call__(self, positions):
        """positions [..., 3] world-frame -> density [...]."""
        tables = self.param(
            "tables", lambda key: hash_grid.init_tables(
                key, self.grid, dtype=jnp.dtype(self.table_dtype),
                shard=self.model_axis_size)
        )
        feat = hash_grid.hash_encode(
            tables, self._to_unit(positions), self.grid,
            model_axis=self.model_axis,
            descriptor_sharding=self.descriptor_sharding,
        )
        return trunc_exp(feat[..., 0] - 1.0)


class NerfactoField(nn.Module):
    """Hash-grid field with SH-encoded view directions and appearance embedding.

    density(positions) -> (density, geo_feat); rgb(geo_feat, dirs, cam_idx).
    Matches the nerfacto field's structure [upstream]: 16-level hash grid,
    1-hidden-layer density MLP to (density, 15-dim geometry feature), 2-hidden
    color MLP over [SH(dirs), geo_feat, appearance(cam)].
    """

    grid: HashGridConfig = HashGridConfig()
    geo_feat_dim: int = 15
    hidden: int = 64
    appearance_dim: int = 32
    num_images: int = 512
    sh_degree: int = 4
    model_axis: Optional[str] = None  # mesh axis of column-sharded tables
    model_axis_size: int = 1  # shard count (declares local param shape)
    descriptor_sharding: bool = False  # a2a-routed lookups (samples sharded)
    use_contraction: bool = True
    aabb_min: float = -1.0
    aabb_max: float = 1.0
    predict_normals: bool = True

    def setup(self):
        self.density_mlp = MLP(hidden=self.hidden, depth=1,
                               out_dim=1 + self.geo_feat_dim)
        self.color_mlp = MLP(hidden=self.hidden, depth=2, out_dim=3)
        self.embedding = nn.Embed(self.num_images, self.appearance_dim)
        if self.predict_normals:
            self.normal_mlp = MLP(hidden=self.hidden, depth=2, out_dim=3)
        self.tables = self.param(
            "tables", lambda key: hash_grid.init_tables(
                key, self.grid, shard=self.model_axis_size)
        )

    def _to_unit(self, positions):
        if self.use_contraction:
            return hash_grid.contract_to_unit_cube(positions)
        return hash_grid.normalize_to_unit_cube(
            positions, self.aabb_min, self.aabb_max
        )

    def density(self, positions, grad_phase=None):
        feat = hash_grid.hash_encode(
            self.tables, self._to_unit(positions), self.grid,
            model_axis=self.model_axis,
            descriptor_sharding=self.descriptor_sharding,
            grad_phase=grad_phase,
        )
        h = self.density_mlp(feat)
        density = trunc_exp(h[..., 0] - 1.0)
        return density, h[..., 1:]

    def density_unit(self, unit_positions):
        """Density at coords ALREADY in the unit cube (the occupancy-grid
        refresh evaluates at grid-cell centers, which live in unit space —
        no world-frame round trip needed)."""
        feat = hash_grid.hash_encode(
            self.tables, unit_positions, self.grid,
            model_axis=self.model_axis,
            descriptor_sharding=self.descriptor_sharding,
        )
        h = self.density_mlp(feat)
        return trunc_exp(h[..., 0] - 1.0)

    def rgb(self, geo_feat, directions, camera_indices=None):
        d = sh_encode(directions, self.sh_degree)
        if camera_indices is None:
            emb = jnp.zeros(geo_feat.shape[:-1] + (self.appearance_dim,))
        else:
            emb = self.embedding(camera_indices)
            emb = jnp.broadcast_to(
                emb[..., None, :] if emb.ndim < geo_feat.ndim else emb,
                geo_feat.shape[:-1] + (self.appearance_dim,),
            )
        h = jnp.concatenate([d, geo_feat, emb], axis=-1)
        return nn.sigmoid(self.color_mlp(h))

    def normals(self, geo_feat):
        n = self.normal_mlp(geo_feat)
        return n / jnp.clip(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-7)

    def __call__(self, positions, directions, camera_indices=None):
        """Convenience joint forward (used for init)."""
        density, geo = self.density(positions)
        rgb = self.rgb(geo, directions, camera_indices)
        out = {"density": density, "rgb": rgb}
        if self.predict_normals:
            out["pred_normals"] = self.normals(geo)
        return out
