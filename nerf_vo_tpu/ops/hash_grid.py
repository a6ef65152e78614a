"""Multiresolution hash-grid encoding (Instant-NGP style) for TPU.

TPU-native replacement for tiny-cuda-nn's HashGrid encoding (reference
submodule N6, consumed by pyngp and nerfstudio's nerfacto fields — SURVEY.md
§2.2). Technique per Müller et al., "Instant Neural Graphics Primitives with a
Multiresolution Hash Encoding" (https://arxiv.org/abs/2201.05989).

Design notes (TPU-first, not a CUDA translation):
  * All L levels share one flat table laid out ``[L * T, F]`` so the forward
    pass is a single fused gather of ``[N, L, 8]`` rows and the backward pass a
    single XLA scatter-add — XLA lowers the scatter to a sort + segmented
    reduction on TPU (there are no atomics; this IS the TPU-idiomatic
    equivalent of tiny-cuda-nn's atomicAdd accumulation).
  * Static shapes everywhere: levels/corners are unrolled into array dims, no
    per-level Python loops inside jit beyond construction-time constants.
  * Trilinear weights are computed in f32; the table dtype is configurable
    (f32 default; bf16 halves HBM traffic at some fit quality cost).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import jax
import jax.numpy as jnp

# Spatial hash primes from the Instant-NGP paper (π1=1 for coherent x-axis).
_PRIMES = (1, 2654435761, 805459861)


@dataclasses.dataclass(frozen=True)
class HashGridConfig:
    n_levels: int = 16
    features_per_level: int = 2
    log2_table_size: int = 19
    base_resolution: int = 16
    max_resolution: int = 2048

    @property
    def table_size(self) -> int:
        return 1 << self.log2_table_size

    @property
    def output_dim(self) -> int:
        return self.n_levels * self.features_per_level

    @property
    def resolutions(self) -> Sequence[int]:
        if self.n_levels == 1:
            return (self.base_resolution,)
        growth = math.exp(
            (math.log(self.max_resolution) - math.log(self.base_resolution))
            / (self.n_levels - 1)
        )
        return tuple(
            int(math.floor(self.base_resolution * growth**l))
            for l in range(self.n_levels)
        )


def init_tables(key, config: HashGridConfig, dtype=jnp.float32):
    """Table init U(-1e-4, 1e-4) as in Instant-NGP. Shape [L*T, F]."""
    shape = (config.n_levels * config.table_size, config.features_per_level)
    return jax.random.uniform(key, shape, dtype, minval=-1e-4, maxval=1e-4)


def _corner_indices(config: HashGridConfig):
    """The 8 corner offsets of a voxel, shape [8, 3] (static)."""
    c = jnp.asarray(
        [[i & 1, (i >> 1) & 1, (i >> 2) & 1] for i in range(8)], jnp.int32
    )
    return c


def hash_encode(tables, x, config: HashGridConfig):
    """Encode points with the multiresolution hash grid.

    Args:
      tables: [L*T, F] feature table.
      x: [..., 3] positions in the unit cube [0, 1]^3 (values outside are
        clamped; callers apply scene contraction first).

    Returns:
      [..., L*F] encoded features (f32).
    """
    batch_shape = x.shape[:-1]
    x = x.reshape(-1, 3).astype(jnp.float32)
    x = jnp.clip(x, 0.0, 1.0)
    n = x.shape[0]

    res = jnp.asarray(config.resolutions, jnp.float32)  # [L]
    # scaled coords per level: [N, L, 3]
    xs = x[:, None, :] * res[None, :, None]
    x0 = jnp.floor(xs)
    frac = xs - x0  # [N, L, 3]
    x0 = x0.astype(jnp.int32)

    corners = _corner_indices(config)  # [8, 3]
    # integer corner coords: [N, L, 8, 3]
    coords = x0[:, :, None, :] + corners[None, None, :, :]

    # spatial hash per level -> [N, L, 8]
    primes = jnp.asarray(_PRIMES, jnp.uint32)
    h = (
        coords[..., 0].astype(jnp.uint32) * primes[0]
        ^ coords[..., 1].astype(jnp.uint32) * primes[1]
        ^ coords[..., 2].astype(jnp.uint32) * primes[2]
    )
    idx = (h & jnp.uint32(config.table_size - 1)).astype(jnp.int32)
    # offset each level into the flat table
    level_offset = (
        jnp.arange(config.n_levels, dtype=jnp.int32) * config.table_size
    )
    idx = idx + level_offset[None, :, None]  # [N, L, 8]

    # one fused gather: [N, L, 8, F]
    feats = jnp.take(tables, idx.reshape(-1), axis=0).reshape(
        n, config.n_levels, 8, config.features_per_level
    )

    # trilinear weights: [N, L, 8]
    w = jnp.where(corners[None, None, :, :] == 1, frac[:, :, None, :], 1.0 - frac[:, :, None, :])
    w = w[..., 0] * w[..., 1] * w[..., 2]

    out = jnp.sum(feats.astype(jnp.float32) * w[..., None], axis=2)  # [N, L, F]
    return out.reshape(batch_shape + (config.output_dim,))


def contract(x, order: float = jnp.inf):
    """MipNeRF-360 scene contraction: maps R^3 into the ball of radius 2.

    Used by the nerfacto-family fields for unbounded scenes (reference
    consumes it via nerfstudio's SceneContraction [upstream], SURVEY.md N7).
    """
    norm = jnp.linalg.norm(x, ord=order, axis=-1, keepdims=True) if order != jnp.inf else jnp.max(
        jnp.abs(x), axis=-1, keepdims=True
    )
    norm = jnp.clip(norm, 1e-7)
    return jnp.where(norm <= 1.0, x, (2.0 - 1.0 / norm) * x / norm)


def contract_to_unit_cube(x, order: float = jnp.inf):
    """Contraction composed with the affine map of [-2, 2]^3 onto [0, 1]^3."""
    return (contract(x, order) + 2.0) * 0.25


def normalize_to_unit_cube(x, aabb_min, aabb_max):
    """Affine map of an axis-aligned bounding box onto [0, 1]^3 (bounded scenes)."""
    return (x - aabb_min) / (aabb_max - aabb_min)
