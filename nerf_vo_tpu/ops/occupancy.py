"""Occupancy-grid ray sampling (Instant-NGP equivalent, TPU-native).

Replaces pyngp's occupancy-grid ray marching for the nerf_slam/Instant-NGP
mapping path (reference submodule N5 [upstream]; call sites
nerf_vo/mapping/instant_ngp.py:33-50, 104-108). Instant-NGP maintains a
multiscale density bitfield refreshed from the field every ~16 steps and
skips empty cells while marching rays with dynamic step counts. A literal
port (variable samples/ray, atomic bitfield writes) is hostile to XLA's
static-shape model, so the rebuild recasts the same mechanism:

  * the grid is a dense f32 density EMA over the field's unit-cube
    coordinates (flat [res^3], 8 MB at 128^3) — not a bitfield: TPUs have
    no cheap HBM bit ops, and a dense f32 array reads at full bandwidth;
  * per ray, occupancy is gathered at the centers of M coarse bins and
    becomes the WEIGHTS of the shared PDF resampler
    (ops/rendering.sample_pdf): inverse-transform sampling concentrates the
    fixed per-ray sample budget in occupied bins — the static-shape
    equivalent of empty-space skipping (SURVEY.md §7.3(3));
  * refreshes avoid TPU scatters entirely: a rotating CONTIGUOUS slab of
    cells is re-evaluated per refresh (one dynamic_update_slice) after a
    whole-grid multiplicative decay — over ``slab_div`` refreshes every
    cell is revisited, matching NGP's stochastic cell refresh in
    expectation with fully static shapes.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class OccupancyConfig:
    resolution: int = 128
    decay: float = 0.95          # NGP's per-refresh density EMA decay
    update_every: int = 16       # train steps between refreshes (NGP: 16)
    slab_div: int = 8            # cells re-evaluated per refresh: res^3/slab_div
    occ_threshold: float = 1e-2  # density above which a cell is "occupied"
    base_weight: float = 1e-3    # sampling floor so unseen space stays visible


def create(config: OccupancyConfig) -> jnp.ndarray:
    """Fresh grid: everything occupied (optimistic init, like NGP)."""
    n = config.resolution ** 3
    return jnp.full((n,), 1.0, jnp.float32)


def lookup(grid: jnp.ndarray, unit_pos: jnp.ndarray, config: OccupancyConfig
           ) -> jnp.ndarray:
    """Occupancy density at unit-cube positions [..., 3] -> [...]."""
    r = config.resolution
    idx = jnp.clip((unit_pos * r).astype(jnp.int32), 0, r - 1)
    flat = (idx[..., 0] * r + idx[..., 1]) * r + idx[..., 2]
    return jnp.take(grid, flat.reshape(-1), axis=0).reshape(flat.shape)


def bin_weights(grid: jnp.ndarray, unit_pos: jnp.ndarray,
                config: OccupancyConfig) -> jnp.ndarray:
    """PDF-resampler weights for coarse bins at unit positions [..., M, 3]."""
    occ = lookup(grid, unit_pos, config)
    return (occ > config.occ_threshold).astype(jnp.float32) + config.base_weight


def slab_cell_centers(step, key, config: OccupancyConfig):
    """Unit-cube sample positions (jittered cell centers) of this refresh's
    slab, plus the slab's flat-index start offset.

    The slab index rotates deterministically with the refresh counter so
    every cell is revisited once per ``slab_div`` refreshes.
    """
    r = config.resolution
    n = r ** 3
    slab = n // config.slab_div
    i = (step // config.update_every) % config.slab_div
    start = i * slab
    cell = start + jnp.arange(slab)
    z = cell % r
    y = (cell // r) % r
    x = cell // (r * r)
    jitter = jax.random.uniform(key, (slab, 3))
    u = (jnp.stack([x, y, z], -1).astype(jnp.float32) + jitter) / r
    return u, start


def refresh(grid: jnp.ndarray, density_slab: jnp.ndarray, start,
            config: OccupancyConfig) -> jnp.ndarray:
    """Apply one refresh: whole-grid decay + max-merge the slab's densities.

    Args:
      density_slab: [res^3 / slab_div] densities evaluated at
        ``slab_cell_centers`` positions.
      start: flat start offset returned by ``slab_cell_centers``.
    """
    grid = grid * config.decay
    old = jax.lax.dynamic_slice(grid, (start,), (density_slab.shape[0],))
    merged = jnp.maximum(old, density_slab.astype(grid.dtype))
    return jax.lax.dynamic_update_slice(grid, merged, (start,))
