"""Multiresolution hash-grid encoding (Instant-NGP style) for TPU.

TPU-native replacement for tiny-cuda-nn's HashGrid encoding (reference
submodule N6, consumed by pyngp and nerfstudio's nerfacto fields — SURVEY.md
§2.2). Technique per Müller et al., "Instant Neural Graphics Primitives with a
Multiresolution Hash Encoding" (https://arxiv.org/abs/2201.05989).

Design notes (TPU-first, not a CUDA translation):
  * All L levels share one flat table laid out ``[F, L * T]`` — the FEATURE
    axis major and the huge table axis minor-most, so TPU tiling (last dim
    padded to 128 lanes) pads nothing. A ``[L*T, F=2]`` layout would be
    lane-padded 2->128 (64x HBM blowup); measured on v5e, the naive
    ``[N, L, 8, 3]`` corner tensors alone cost 4.5 GB of padding and OOM the
    chip at the production batch size.
  * Every large intermediate is laid out ``[..., N]`` with the sample count N
    minor-most: corner hashes/weights are ``[8, L, N]``, gathered features
    ``[F, 8, L, N]``. The per-axis hash components are computed separately
    and XOR-combined per corner, so no ``[..., 3]``-trailing tensor is ever
    materialized.
  * The forward pass is one fused gather; the backward pass is one XLA
    scatter-add, which lowers to a sort + segmented reduction on TPU (no
    atomics; this IS the TPU-idiomatic equivalent of tiny-cuda-nn's
    atomicAdd accumulation).
  * Static shapes everywhere: levels/corners are unrolled into array dims, no
    per-level Python loops inside jit beyond construction-time constants.
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
    """Table init U(-1e-4, 1e-4) as in Instant-NGP. Shape [F, L*T]
    (feature-major: see module docstring for why)."""
    shape = (config.features_per_level, config.n_levels * config.table_size)
    return jax.random.uniform(key, shape, dtype, minval=-1e-4, maxval=1e-4)


def hash_encode(tables, x, config: HashGridConfig):
    """Encode points with the multiresolution hash grid.

    Args:
      tables: [F, L*T] feature table (feature-major layout).
      x: [..., 3] positions in the unit cube [0, 1]^3 (values outside are
        clamped; callers apply scene contraction first).

    Returns:
      [..., L*F] encoded features (f32), feature-within-level minor
      (level l, feature f at output column l*F + f).
    """
    batch_shape = x.shape[:-1]
    n = math.prod(batch_shape) if batch_shape else 1
    L = config.n_levels
    F = config.features_per_level

    # [3, N] with the big axis minor-most from here on
    xt = jnp.clip(x.reshape(-1, 3).astype(jnp.float32), 0.0, 1.0).T
    res = jnp.asarray(config.resolutions, jnp.float32)  # [L]
    xs = xt[:, None, :] * res[None, :, None]  # [3, L, N]
    x0f = jnp.floor(xs)
    frac = xs - x0f  # [3, L, N]
    x0 = x0f.astype(jnp.int32)

    # per-axis hashed corner components: h[a][b] = (x0_a + b) * prime_a
    h0 = [x0[a].astype(jnp.uint32) * jnp.uint32(_PRIMES[a]) for a in range(3)]
    h1 = [
        (x0[a] + 1).astype(jnp.uint32) * jnp.uint32(_PRIMES[a])
        for a in range(3)
    ]
    w1 = [frac[a] for a in range(3)]
    w0 = [1.0 - frac[a] for a in range(3)]

    level_offset = (
        jnp.arange(L, dtype=jnp.uint32)[:, None] * jnp.uint32(config.table_size)
    )  # [L, 1]
    mask = jnp.uint32(config.table_size - 1)

    idx = []  # 8 x [L, N]
    w = []  # 8 x [L, N]
    for c in range(8):
        bx, by, bz = c & 1, (c >> 1) & 1, (c >> 2) & 1
        h = (h1[0] if bx else h0[0]) ^ (h1[1] if by else h0[1]) ^ (
            h1[2] if bz else h0[2]
        )
        idx.append(((h & mask) + level_offset).astype(jnp.int32))
        w.append(
            (w1[0] if bx else w0[0])
            * (w1[1] if by else w0[1])
            * (w1[2] if bz else w0[2])
        )
    idx = jnp.stack(idx)  # [8, L, N]
    w = jnp.stack(w)  # [8, L, N]

    # gather along the minor table axis: [F, 8*L*N] -> [F, 8, L, N]
    feats = jnp.take(tables, idx.reshape(-1), axis=1).reshape(
        F, 8, L, n
    )
    out = jnp.einsum(
        "fcln,cln->fln", feats.astype(jnp.float32), w,
        precision=jax.lax.Precision.HIGHEST,
    )  # [F, L, N]
    # -> [N, L*F] with feature minor within level
    out = out.transpose(2, 1, 0).reshape(batch_shape + (L * F,))
    return out


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
