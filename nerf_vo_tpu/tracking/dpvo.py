"""Deep patch visual odometry: TPU-native DPVO-equivalent tracker.

Replaces the DPVO submodule + DPVOHandler of the reference (N1;
nerf_vo/tracking/dpvo.py). Architecture per SURVEY.md §7.1(6):

  * HOST side (numpy bookkeeping): frame window, patch lifetimes, padded
    edge-slot table, keyframe decisions, retirement. Cheap, branchy,
    sequential — exactly what should NOT be in the compiled program.
  * DEVICE side: three jitted static-shape programs —
      1. `encode`: feature/context CNNs + patchify (MXU convs),
      2. `vo_update`: reproject -> correlation lookup (ops/correlation.py)
         -> update net -> bundle adjustment (ops/ba.py),
      3. pose helpers (constant-velocity init, frame distance).
    The edge buffer has ONE static size (cfg.max_edges) so the whole
    steady-state loop is a single compiled program; dead edges are masked,
    never compacted.

Behavioral parity targets (reference nerf_vo/tracking/dpvo.py):
  * config fields PATCHES_PER_FRAME / REMOVAL_WINDOW / OPTIMIZATION_WINDOW /
    PATCH_LIFETIME / KEYFRAME_THRESH / KEYFRAME_INDEX (dpvo.py:31-38),
  * per-frame call returning retired keyframe ids or [] (dpvo.py:62-64),
  * patch state at 1/4 feature resolution; packets carry [K, P, 3, 3, 3]
    (x, y, inverse-depth grids) like ``patches_`` (dpvo.py:85-99).
"""

from __future__ import annotations

import dataclasses
import os as _os
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nerf_vo_tpu.core import lie
from nerf_vo_tpu.models.dpvo_net import DPVONet, extract_patches
from nerf_vo_tpu.ops import ba
from nerf_vo_tpu.ops.correlation import patch_correlation

# NERF_VO_SOFTAGG_ROUTE selects the update net's SoftAgg formulation:
#   "scatter" — upstream-style segment scatters (models/dpvo_net.py),
#   "gather"  — member-table route reusing nbr_tab (zero extra scatters).
# The gather route was flipped to default in round 4 WITHOUT its in-step
# gate; both post-flip tracking benches read 21.41 FPS vs 24.13 pre-flip
# (tpu_runs/bench_tracking_r4.log vs bench_tracking_r5.log), so the
# default REVERTS to the measured winner per the flip-only-on-gate rule
# (TPU_QUEUE.md). Re-flip only on a same-session A/B win
# (scripts/exp_softagg_ab.py).
_SOFTAGG_ROUTE = _os.environ.get("NERF_VO_SOFTAGG_ROUTE", "scatter")
if _SOFTAGG_ROUTE not in ("scatter", "gather"):
    raise ValueError(
        "NERF_VO_SOFTAGG_ROUTE must be 'scatter' or 'gather', got "
        f"{_SOFTAGG_ROUTE!r}"
    )

# NERF_VO_DEBUG_CHECKS=1 turns on host-side invariant assertions in the
# tracker's per-frame path (slow; test/debug only).
_DEBUG_CHECKS = _os.environ.get("NERF_VO_DEBUG_CHECKS", "0") == "1"


@dataclasses.dataclass(frozen=True)
class TrackingConfig:
    patches_per_frame: int = 96
    removal_window: int = 28
    optimization_window: int = 13
    patch_lifetime: int = 15
    keyframe_threshold: float = 8.0
    keyframe_index: int = 4
    init_frames: int = 8
    init_iterations: int = 8
    update_iterations: int = 1
    ba_iterations: int = 2
    max_frames: int = 4096  # pose/patch buffer capacity
    max_edges: int = 32768
    ring_size: int = 32  # feature ring; >= removal window + margin
    corr_radius: int = 3
    use_pallas_corr: bool = True  # Pallas VMEM corr kernel (TPU only)


class DPVOTracker:
    """Online deep-patch VO. Feed frames with `track`; poll retirements."""

    def __init__(self, config: TrackingConfig, net: DPVONet, params,
                 height: int, width: int):
        assert height % 4 == 0 and width % 4 == 0
        self.cfg = config
        self.net = net
        self.params = {"params": params}
        self.H, self.W = height, width
        self.H4, self.W4 = height // 4, width // 4
        P = config.patches_per_frame
        R = config.ring_size
        E = config.max_edges
        N = config.max_frames
        C, D = net.fdim, net.cdim

        # ---- device state ------------------------------------------------
        self.poses = jnp.tile(lie.se3_identity(), (N, 1))  # w2c
        self.pt_xy = jnp.zeros((N, P, 2))
        self.pt_invd = jnp.ones((N, P))
        self.intrinsics4 = jnp.ones((N, 4))  # at 1/4 res per frame
        self.fmap1 = jnp.zeros((R, self.H4, self.W4, C), jnp.bfloat16)
        self.fmap2 = jnp.zeros((R, self.H4 // 2, self.W4 // 2, C), jnp.bfloat16)
        self.gmap = jnp.zeros((R, P, 3, 3, C), jnp.bfloat16)
        self.imap = jnp.zeros((R, P, D), jnp.bfloat16)
        self.hidden = jnp.zeros((E, D))
        self.e_target = jnp.zeros((E, 2))

        # ---- host bookkeeping -------------------------------------------
        self.n = 0  # frames appended (device buffer high-water)
        self.frame_gids: List[int] = []  # alive frames, time order
        self.ring_of: Dict[int, int] = {}  # gid -> ring slot
        self.free_rings = list(range(R))
        self.tstamps: Dict[int, float] = {}
        self.src_index: Dict[int, int] = {}  # gid -> source frame_index
        self.colors: Dict[int, np.ndarray] = {}  # gid -> HxWx3 uint8
        self.e_patch_g = np.full(E, -1, np.int64)  # global patch id f*P+p
        self.e_jj_g = np.full(E, -1, np.int64)
        self.e_valid = np.zeros(E, bool)
        self.e_fresh = np.zeros(E, bool)
        self.free_edges = list(range(E))
        self.is_initialized = False
        self.retired: List[int] = []  # gids retired, in order
        self._rng = jax.random.PRNGKey(0)

        self._pending_kf_checks: List[Any] = []
        self._encode_append = jax.jit(
            self._encode_append_impl, static_argnames=("pose_mode",),
            donate_argnames=(
                "fmap1", "fmap2", "gmap", "imap", "pt_xy", "pt_invd",
                "intrinsics4", "poses",
            ),
        )
        self._vo_update = jax.jit(
            self._vo_update_impl, static_argnames=("ba_iters",),
            donate_argnames=("poses", "pt_invd", "hidden", "e_target"),
        )
        # fused steady-state step: encode + append + vo_update in ONE
        # dispatch (the per-dispatch floor on the tunneled backend is ~2 ms,
        # and fusing lets XLA overlap the encoder with the corr DMAs)
        self._track_fused = jax.jit(
            self._track_fused_impl,
            static_argnames=("pose_mode", "ba_iters"),
            donate_argnames=(
                "fmap1", "fmap2", "gmap", "imap", "pt_xy", "pt_invd",
                "intrinsics4", "poses", "hidden", "e_target",
            ),
        )
        self._frame_distance = jax.jit(self._frame_distance_impl)

    # ------------------------------------------------------------------
    # jitted device programs
    # ------------------------------------------------------------------

    def _encode_impl(self, params, image, key, init_invd):
        """image [H, W, 3] float 0..255 -> features + random patches."""
        fmap1, fmap2, imap_full = self.net.apply(
            params, image[None], method=self.net.encode
        )
        fmap1, fmap2, imap_full = fmap1[0], fmap2[0], imap_full[0]
        P = self.cfg.patches_per_frame
        kx, ky = jax.random.split(key)
        # random patch centers, 1px margin (DPVO default RANDOM sampling)
        xs = jax.random.uniform(kx, (P,), minval=1.0, maxval=self.W4 - 2.0)
        ys = jax.random.uniform(ky, (P,), minval=1.0, maxval=self.H4 - 2.0)
        centers = jnp.stack([xs, ys], -1)
        gmap = extract_patches(fmap1, centers, radius=1)  # [P, 3, 3, C]
        imap = extract_patches(imap_full, centers, radius=0)[:, 0, 0]  # [P, D]
        invd = jnp.full((P,), init_invd)
        return (
            fmap1.astype(jnp.bfloat16),
            fmap2.astype(jnp.bfloat16),
            gmap.astype(jnp.bfloat16),
            imap.astype(jnp.bfloat16),
            centers,
            invd,
        )

    def _append_impl(self, fmap1, fmap2, gmap, imap, pt_xy, pt_invd,
                     intrinsics4, poses, slot, gid, f1, f2, gm, im, centers,
                     invd, intr, prev1, prev2, pose_mode: int):
        """Donated in-place frame append + constant-velocity pose init.

        pose_mode: 0 = first frame (identity), 1 = copy previous,
        2 = constant velocity from the previous two poses. Static (3 compiles).
        """
        fmap1 = fmap1.at[slot].set(f1)
        fmap2 = fmap2.at[slot].set(f2)
        gmap = gmap.at[slot].set(gm)
        imap = imap.at[slot].set(im)
        pt_xy = pt_xy.at[gid].set(centers)
        pt_invd = pt_invd.at[gid].set(invd)
        intrinsics4 = intrinsics4.at[gid].set(intr / 4.0)
        if pose_mode == 1:
            poses = poses.at[gid].set(poses[prev1])
        elif pose_mode == 2:
            g1 = poses[prev1]
            g2 = poses[prev2]
            motion = lie.se3_mul(g1, lie.se3_inv(g2))
            poses = poses.at[gid].set(lie.se3_mul(motion, g1))
        return fmap1, fmap2, gmap, imap, pt_xy, pt_invd, intrinsics4, poses

    def _encode_append_impl(self, params, image_u8, key, fmap1, fmap2, gmap,
                            imap, pt_xy, pt_invd, intrinsics4, poses, slot,
                            gid, intr, prev1, prev2, pose_mode: int):
        """Fused per-frame ingest: one dispatch instead of three (median +
        encode + append). The image arrives as uint8 and is cast on device —
        the tunnel's H2D path moves ~50-60 MB/s, so shipping f32 frames cost
        a measured 45 ms/frame vs 17 ms for uint8."""
        init_invd = (
            jnp.median(pt_invd[prev1]) if pose_mode > 0
            else jnp.asarray(1.0, pt_invd.dtype)
        )
        f1, f2, gm, im, centers, invd = self._encode_impl(
            params, image_u8.astype(jnp.float32), key, init_invd
        )
        return self._append_impl(
            fmap1, fmap2, gmap, imap, pt_xy, pt_invd, intrinsics4, poses,
            slot, gid, f1, f2, gm, im, centers, invd, intr, prev1, prev2,
            pose_mode,
        )

    def _vo_update_impl(
        self,
        params,
        poses,
        pt_xy,        # [N, P, 2] full patch-center buffer
        pt_invd,      # [N, P] full inverse-depth buffer
        intrinsics4,
        fmap1, fmap2, gmap, imap,
        hidden, e_target,
        meta,         # ONE packed uint8 H2D buffer (~340 KB; the tunnel
                      # moves ~50-60 MB/s, so int32 metadata cost ~19 ms a
                      # frame): e_host i16 [E] | e_patch u8 [E] | e_jj i16
                      # [E] | fresh u8 [E] | hosts i16 [LIFE] | ring_lookup
                      # i8 [N] | slot_map i16 [N] | kf_pair i16 [2] |
                      # optional perm u16 [E2] | inv u16 [E] | blocks u8.
                      # Redundant per-edge fields (kk_local, rings,
                      # liveness) are DERIVED on device from these.
        ba_iters: int,
        profile_cut: int = 0,  # dev-only (scripts/exp_vo_cut.py): return
                               # early after stage N to attribute device time
    ):
        """One tracking update: correlate -> update net -> BA (+ pipelined
        keyframe flow-distance for frames fd_i -> fd_j).

        The edge buffer IS the layout: edge arrays are indexed by slot
        directly (no indirection), so hidden/e_target scatter back in place.
        """
        cfg = self.cfg
        P = cfg.patches_per_frame
        R = cfg.ring_size
        E = cfg.max_edges
        LIFE = cfg.patch_lifetime
        KL = LIFE * P
        N = cfg.max_frames

        o = 0

        def take(n):
            nonlocal o
            s = meta[o: o + n]
            o += n
            return s

        def as16(b, signed=True):
            t = jnp.int16 if signed else jnp.uint16
            return jax.lax.bitcast_convert_type(
                b.reshape(-1, 2), t
            ).astype(jnp.int32)

        e_host = as16(take(2 * E))
        e_patch = take(E).astype(jnp.int32)
        e_jj = as16(take(2 * E))
        e_new = take(E).astype(bool)
        hosts = as16(take(2 * LIFE))
        ring_lookup = jax.lax.bitcast_convert_type(
            take(N), jnp.int8
        ).astype(jnp.int32)
        slot_map = as16(take(2 * N))
        kf = as16(take(4))
        fd_i, fd_j = kf[0], kf[1]
        perm_pack = take(meta.shape[0] - o) if meta.shape[0] > o else None
        # sorted-edge buffer length is host-bucketed to the LIVE edge count
        # (dead slots used to ride along as full pad blocks — ~37% of the
        # corr kernel at steady state); derived from the pack length so each
        # bucket is its own compiled program. pack = perm u16 [E2] +
        # inv u16 [E] + blocks u8 [E2/EB].
        if perm_pack is not None:
            from nerf_vo_tpu.ops.correlation_pallas import EB as _EB0

            E2_dyn = (
                (perm_pack.shape[0] - 2 * E) * _EB0 // (2 * _EB0 + 1)
            )

        # derive per-edge metadata on device
        host_ok = hosts >= 0
        hp = jnp.full((N + 1,), -1, jnp.int32).at[
            jnp.where(host_ok, hosts, N)
        ].set(jnp.arange(LIFE, dtype=jnp.int32))
        hostpos = hp[:N]

        alive_patch_g = jnp.where(
            host_ok[:, None],
            hosts[:, None] * P + jnp.arange(P)[None, :],
            -1,
        ).reshape(KL)
        pt_host_k = jnp.broadcast_to(
            jnp.where(host_ok, hosts, 0)[:, None], (LIFE, P)
        ).reshape(KL)

        e_host_c = jnp.clip(e_host, 0, N - 1)
        e_jj_c = jnp.clip(e_jj, 0, N - 1)
        base = hostpos[e_host_c]
        e_host_ring = ring_lookup[e_host_c]
        e_jj_ring = ring_lookup[e_jj_c]
        e_kk_local = jnp.clip(base * P + e_patch, 0, KL - 1)
        e_live = (
            (e_host >= 0) & (e_jj >= 0) & (base >= 0)
            & (e_host_ring >= 0) & (e_jj_ring >= 0)
        )
        pt_xy_k = pt_xy.reshape(-1, 2)[
            jnp.clip(alive_patch_g, 0, pt_xy.size // 2 - 1)
        ]

        kk = jnp.clip(e_kk_local, 0, KL - 1)
        flat_invd = pt_invd.reshape(-1)
        safe_pg = jnp.clip(alive_patch_g, 0, flat_invd.size - 1)
        invd_k = flat_invd[safe_pg]  # [KL]

        xy_e = pt_xy_k[kk]  # [E, 2]
        ii_e = pt_host_k[kk]
        jj_e = jnp.clip(e_jj, 0, poses.shape[0] - 1)
        center, z = ba.reproject_edges(
            poses, intrinsics4, xy_e, invd_k[kk], ii_e, jj_e
        )

        # correlation features around the reprojected centers (bf16 gather)
        ring_i_c = jnp.clip(e_host_ring, 0, R - 1)
        kk_p = kk % P
        if perm_pack is not None:
            from nerf_vo_tpu.ops.correlation_pallas import (
                EB as _EB,
                patch_correlation_pallas,
            )

            E2 = E2_dyn
            u16 = lambda b: jax.lax.bitcast_convert_type(
                b.reshape(-1, 2), jnp.uint16
            ).astype(jnp.int32)
            perm = u16(perm_pack[: 2 * E2])
            inv_perm = u16(perm_pack[2 * E2: 2 * E2 + 2 * E])
            block_frame = perm_pack[2 * E2 + 2 * E:].astype(jnp.int32)
            # gather gmap straight into sorted order (composing the perm
            # into the gather indices saves a [E2, 9, C] re-permute pass)
            pf_s = gmap[ring_i_c[perm], kk_p[perm]]
            corr_s = patch_correlation_pallas(
                pf_s, fmap1, fmap2, block_frame, center[perm],
                radius=cfg.corr_radius, n_blocks=E2 // _EB,
            )
            corr = corr_s[inv_perm]
        else:
            pf = gmap[ring_i_c, kk_p]
            corr = patch_correlation(
                pf, fmap1, fmap2,
                jnp.clip(e_jj_ring, 0, R - 1), center,
                radius=cfg.corr_radius,
            )

        if profile_cut == 1:  # after correlation
            z = jnp.sum(corr) + jnp.sum(center)
            return (poses + z * 0, pt_invd, hidden, e_target,
                    jnp.zeros((ba_iters,)), z)

        h = jnp.where(e_new[:, None], 0.0, hidden)

        # --- update-net grouping metadata (upstream Update semantics) ----
        # Temporal neighbors: the same patch's edge to target frame jj-1 /
        # jj+1, found via a modular lookup table — live targets span less
        # than ring_size frames, so jj mod R is unique per patch window.
        # Pair groups: (host window position, target) for agg_ij. Dead
        # edges route to trash entries so they never touch a live group.
        nbr_idx = jnp.where(e_live, kk * R + e_jj_c % R, KL * R)
        nbr_tab = jnp.full((KL * R + 1,), -1, jnp.int32).at[nbr_idx].set(
            jnp.arange(E, dtype=jnp.int32)
        )
        ix = nbr_tab[jnp.where(e_live, kk * R + (e_jj_c - 1) % R, KL * R)]
        jx = nbr_tab[jnp.where(e_live, kk * R + (e_jj_c + 1) % R, KL * R)]
        kk_g = jnp.where(e_live, kk, KL)
        pair_g = jnp.where(
            e_live, jnp.clip(base, 0) * R + e_jj_c % R, LIFE * R
        )
        # nbr_tab doubles as the SoftAgg member tables (exp_vo_cut_r4
        # attributed +4.2 ms to the scatter-route soft aggregation): row
        # kk*R + jj%R holds the one edge of (patch kk, target jj), so a
        # reshape lists each patch's edges [KL, R], and a transpose lists
        # each (host-window-pos, target)-pair's edges over patches
        # [LIFE*R, P] — the exact pair_g grouping. Zero extra scatters.
        # INVARIANT this route leans on: (kk, jj mod R) must be unique per
        # live edge (live targets span < ring_size frames). On the scatter
        # route a collision only corrupts one edge's ix/jx neighbor input;
        # here it silently drops an edge from BOTH group sums. The host
        # asserts uniqueness under NERF_VO_DEBUG_CHECKS=1 (_check_edge
        # _slot_uniqueness) so a bad window/ring configuration fails loudly.
        if _SOFTAGG_ROUTE == "gather":
            mt_kk = nbr_tab[: KL * R].reshape(KL, R)
            mt_ij = (
                mt_kk.reshape(LIFE, P, R).transpose(0, 2, 1)
                .reshape(LIFE * R, P)
            )
        else:
            mt_kk = mt_ij = None

        im_e = imap[jnp.clip(e_host_ring, 0, R - 1), kk % P].astype(jnp.float32)
        # profile_cut 11-14: stop INSIDE the update net (corr MLP /
        # neighbor mixing / soft agg / GRU — see UpdateNet stop_after)
        net_stop = profile_cut - 10 if 11 <= profile_cut <= 14 else 0
        h, delta, weight = self.net.apply(
            params, h, im_e, corr, kk_g, pair_g, ix, jx, e_live,
            KL, LIFE * R, net_stop, mt_kk, mt_ij,
            method=self.net.update_step,
        )
        if net_stop:
            z = jnp.sum(h)
            return (poses + z * 0, pt_invd, hidden, e_target,
                    jnp.zeros((ba_iters,)), z)
        target = jax.lax.stop_gradient(center) + delta
        weight = weight * e_live[:, None]

        if profile_cut == 2:  # after update net
            z = jnp.sum(target) + jnp.sum(weight) + jnp.sum(h)
            return (poses + z * 0, pt_invd, hidden, e_target,
                    jnp.zeros((ba_iters,)), z)

        problem = ba.BAProblem(
            poses=poses,
            intrinsics=intrinsics4,
            pt_xy=pt_xy_k,
            pt_invd=invd_k,
            pt_host=pt_host_k,
            kk=kk,
            jj=jj_e,
            targets=target,
            weights=weight,
            valid=e_live,
        )
        new_poses, new_invd_k, costs = ba.bundle_adjust(
            problem, slot_map, num_iters=ba_iters,
            window=cfg.optimization_window + 3,
        )

        if profile_cut == 3:  # after bundle adjustment
            z = jnp.sum(new_invd_k)
            return (new_poses, pt_invd, hidden, e_target, costs, z)

        # scatter alive-patch depths back into the big buffer
        flat = flat_invd.at[safe_pg].set(
            jnp.where(alive_patch_g >= 0, new_invd_k, flat_invd[safe_pg])
        )
        pt_invd = flat.reshape(pt_invd.shape)

        hidden = jnp.where(e_live[:, None], h, hidden)
        e_target = jnp.where(e_live[:, None], target, e_target)

        # pipelined keyframe decision input: flow distance fd_i -> fd_j on
        # the just-optimized state (read back asynchronously by the host)
        dist = self._frame_distance_impl(
            new_poses, pt_xy, pt_invd, intrinsics4, fd_i, fd_j
        )
        return new_poses, pt_invd, hidden, e_target, costs, dist

    def _track_fused_impl(self, params, image_u8, key, fmap1, fmap2, gmap,
                          imap, pt_xy, pt_invd, intrinsics4, poses, hidden,
                          e_target, slot, gid, intr, prev1, prev2, meta,
                          pose_mode: int, ba_iters: int):
        """Whole steady-state frame as one program: ingest then update.

        The update's host metadata (edge table, window, sort) depends only
        on host bookkeeping, so it is packed BEFORE dispatch and the two
        device halves fuse."""
        (fmap1, fmap2, gmap, imap, pt_xy, pt_invd, intrinsics4, poses
         ) = self._encode_append_impl(
            params, image_u8, key, fmap1, fmap2, gmap, imap, pt_xy, pt_invd,
            intrinsics4, poses, slot, gid, intr, prev1, prev2, pose_mode,
        )
        poses, pt_invd, hidden, e_target, costs, dist = self._vo_update_impl(
            params, poses, pt_xy, pt_invd, intrinsics4, fmap1, fmap2, gmap,
            imap, hidden, e_target, meta, ba_iters,
        )
        return (fmap1, fmap2, gmap, imap, pt_xy, pt_invd, intrinsics4,
                poses, hidden, e_target, costs, dist)

    def _frame_distance_impl(self, poses, pt_xy, pt_invd, intrinsics4, a, b):
        """Mean optical-flow magnitude of frame a's patches reprojected into b
        (replaces droid_backends.frame_distance semantics for keyframing)."""
        P = self.cfg.patches_per_frame
        xy = pt_xy[a]
        d = pt_invd[a]
        host = jnp.full((P,), a, jnp.int32)
        tgt, z = ba.reproject_edges(
            poses, intrinsics4, xy, d, host, jnp.full((P,), b, jnp.int32)
        )
        disp = jnp.linalg.norm(tgt - xy, axis=-1)
        ok = (z > 0.1) & jnp.all(jnp.isfinite(tgt), -1)
        return jnp.sum(disp * ok) / jnp.clip(jnp.sum(ok), 1.0)

    # ------------------------------------------------------------------
    # host logic
    # ------------------------------------------------------------------

    def _alloc_ring(self, gid: int) -> int:
        slot = self.free_rings.pop()
        self.ring_of[gid] = slot
        return slot

    def _free_frame(self, gid: int) -> None:
        if gid in self.ring_of:
            self.free_rings.append(self.ring_of.pop(gid))
        P = self.cfg.patches_per_frame
        dead = (self.e_jj_g == gid) | (self.e_patch_g // P == gid)
        self._kill_edges(dead)

    def _check_edge_slot_uniqueness(self, live, base, e_jj_c) -> None:
        """Debug invariant (NERF_VO_DEBUG_CHECKS=1): every live edge owns a
        distinct nbr_tab slot kk*R + jj%R — i.e. live targets of one patch
        span fewer than ring_size frames. The gather-route SoftAgg reads
        its member tables straight out of nbr_tab, so a collision silently
        drops an edge from both aggregation group sums; fail loudly here
        instead (ADVICE r4)."""
        R = self.cfg.ring_size
        P = self.cfg.patches_per_frame
        kk_local = base + (self.e_patch_g % P)
        slots = kk_local[live] * R + (e_jj_c[live] % R)
        uniq = np.unique(slots)
        if uniq.size != slots.size:
            raise AssertionError(
                f"nbr_tab slot collision: {slots.size} live edges map to "
                f"{uniq.size} distinct (kk, jj%R) slots — live targets of "
                f"some patch span >= ring_size={R} frames; raise ring_size "
                "above removal_window + margin"
            )

    def _kill_edges(self, mask: np.ndarray) -> None:
        idx = np.nonzero(mask & self.e_valid)[0]
        if idx.size == 0:
            return
        self.e_valid[idx] = False
        self.e_patch_g[idx] = -1
        self.e_jj_g[idx] = -1
        self.free_edges.extend(int(s) for s in idx)

    def _add_edges(self, patch_g: np.ndarray, jj: np.ndarray) -> None:
        n = min(len(patch_g), len(self.free_edges))
        if n == 0:
            return  # budget exhausted; existing edges keep priority
        slots = np.asarray(
            [self.free_edges.pop() for _ in range(n)], np.int64
        )
        self.e_patch_g[slots] = patch_g[:n]
        self.e_jj_g[slots] = jj[:n]
        self.e_valid[slots] = True
        self.e_fresh[slots] = True

    def _edge_pairs_for_new_frame(self, gid: int):
        """DPVO edge policy [upstream]: new patches x recent frames
        (backward), recent patches x new frame (forward), within
        PATCH_LIFETIME. Returns (patch_g [M], jj [M]) numpy arrays."""
        P = self.cfg.patches_per_frame
        recent = np.asarray(
            [g for g in self.frame_gids[-self.cfg.patch_lifetime:]
             if g != gid], np.int64,
        )
        if recent.size == 0:
            return np.zeros(0, np.int64), np.zeros(0, np.int64)
        p = np.arange(P, dtype=np.int64)
        # backward: new patches -> recent frames
        back_pg = (gid * P + p)[None, :].repeat(recent.size, 0).ravel()
        back_jj = recent[:, None].repeat(P, 1).ravel()
        # forward: recent patches -> new frame
        fwd_pg = (recent[:, None] * P + p[None, :]).ravel()
        fwd_jj = np.full(fwd_pg.size, gid, np.int64)
        return (
            np.concatenate([back_pg, fwd_pg]),
            np.concatenate([back_jj, fwd_jj]),
        )

    def _expire_old_patches(self) -> None:
        """Kill edges whose host patch left the lifetime window."""
        P = self.cfg.patches_per_frame
        alive = set(self.frame_gids[-self.cfg.patch_lifetime:])
        hosts = self.e_patch_g // P
        dead = self.e_valid & ~np.isin(hosts, list(alive))
        self._kill_edges(dead)

    # ------------------------------------------------------------------

    def track(self, tstamp: float, image: np.ndarray, intrinsics: np.ndarray,
              frame_index: Optional[int] = None,
              image_device=None) -> List[int]:
        """Process one frame.

        Args:
          image: [H, W, 3] uint8 RGB (host array; retained for packets).
          intrinsics: [4] fx, fy, cx, cy at full input resolution.
          image_device: optional device-resident uint8 copy of ``image``.
            The frame H2D costs ~12 ms on the tunneled link; callers that
            ``jax.device_put`` the NEXT frame while the current one computes
            take that transfer off the serial device timeline (the DMA and
            compute engines overlap).

        Returns: retired keyframe gids (possibly empty).
        """
        cfg = self.cfg
        gid = self.n
        self.n += 1
        assert gid < cfg.max_frames, "frame buffer exhausted"

        # NOTE: all dynamic indices are jnp scalars, not Python ints — a
        # Python-int index is baked into the compiled executable, so every
        # frame would trigger fresh (remote, minutes-long) XLA compiles.
        gid_d = jnp.asarray(gid, jnp.int32)
        self._rng, key = jax.random.split(self._rng)
        slot = self._alloc_ring(gid)
        pose_mode = min(len(self.frame_gids), 2)
        prev1 = jnp.asarray(
            self.frame_gids[-1] if self.frame_gids else 0, jnp.int32
        )
        prev2 = jnp.asarray(
            self.frame_gids[-2] if len(self.frame_gids) >= 2 else 0, jnp.int32
        )
        img_dev = (
            image_device if image_device is not None
            else jnp.asarray(image, jnp.uint8)
        )

        # host bookkeeping first: the update's metadata depends only on it,
        # so the steady-state frame can go down in ONE fused dispatch
        self.tstamps[gid] = tstamp
        self.src_index[gid] = frame_index if frame_index is not None else gid
        self.colors[gid] = np.asarray(image, np.uint8)
        self.frame_gids.append(gid)
        self._expire_old_patches()
        self._add_edges(*self._edge_pairs_for_new_frame(gid))

        retired: List[int] = []
        fused_prep = (
            self._prepare_update(queue_kf=True)
            if self.is_initialized and cfg.update_iterations == 1 else None
        )
        if fused_prep is not None:
            meta, kf_mid, live = fused_prep
            (self.fmap1, self.fmap2, self.gmap, self.imap, self.pt_xy,
             self.pt_invd, self.intrinsics4, self.poses, self.hidden,
             self.e_target, costs, dist) = self._track_fused(
                self.params, img_dev, key,
                self.fmap1, self.fmap2, self.gmap, self.imap, self.pt_xy,
                self.pt_invd, self.intrinsics4, self.poses, self.hidden,
                self.e_target,
                jnp.asarray(slot, jnp.int32), gid_d,
                jnp.asarray(intrinsics, jnp.float32), prev1, prev2, meta,
                pose_mode=pose_mode, ba_iters=cfg.ba_iterations,
            )
            self._finish_update(live, kf_mid, dist)
            self._resolve_kf_checks()
            return self._retire()

        (self.fmap1, self.fmap2, self.gmap, self.imap, self.pt_xy,
         self.pt_invd, self.intrinsics4, self.poses) = self._encode_append(
            self.params, img_dev, key,
            self.fmap1, self.fmap2, self.gmap, self.imap, self.pt_xy,
            self.pt_invd, self.intrinsics4, self.poses,
            jnp.asarray(slot, jnp.int32), gid_d,
            jnp.asarray(intrinsics, jnp.float32), prev1, prev2,
            pose_mode=pose_mode,
        )
        if not self.is_initialized:
            if len(self.frame_gids) >= cfg.init_frames:
                for _ in range(cfg.init_iterations):
                    self._run_update(queue_kf=False)
                self.is_initialized = True
        else:
            for it in range(cfg.update_iterations):
                self._run_update(queue_kf=it == cfg.update_iterations - 1)
            self._resolve_kf_checks()
            retired = self._retire()
        return retired

    # ------------------------------------------------------------------

    def _prepare_update(self, queue_kf: bool = False):
        """Host half of one update: pack all metadata into the uint8 H2D
        buffer. Returns (meta, kf_mid, live) or None when no edges live.
        Pure host state — safe to run BEFORE the frame's encode dispatch,
        which is what lets the fused track step exist."""
        cfg = self.cfg
        P = cfg.patches_per_frame
        E = cfg.max_edges
        if not self.e_valid.any():
            return None

        # keyframe-candidate pair whose flow distance rides along with this
        # update (resolved asynchronously 2 frames later)
        kf_pair = (0, 0)
        kf_mid = None
        if queue_kf and len(self.frame_gids) > cfg.keyframe_index + 2:
            mid = self.frame_gids[-cfg.keyframe_index]
            if mid > 1:  # never drop gauge anchors
                kf_pair = (
                    self.frame_gids[-cfg.keyframe_index - 1],
                    self.frame_gids[-cfg.keyframe_index + 1],
                )
                kf_mid = mid

        # alive patches = patches of the last patch_lifetime frames
        hosts = self.frame_gids[-cfg.patch_lifetime:]
        hosts_arr = np.full(cfg.patch_lifetime, -1, np.int16)
        hosts_arr[: len(hosts)] = hosts
        base_lookup = np.full(cfg.max_frames, -1, np.int64)
        ring_lookup = np.full(cfg.max_frames, -1, np.int8)
        for g, s in self.ring_of.items():
            ring_lookup[g] = s
        for i, hgid in enumerate(hosts):
            base_lookup[hgid] = i * P

        # host-side liveness/ring metadata (the device re-derives these from
        # the packed buffer; here they only drive the edge sort)
        e_host_g = np.clip(self.e_patch_g // P, 0, cfg.max_frames - 1)
        e_jj_c = np.clip(self.e_jj_g, 0, cfg.max_frames - 1)
        base = base_lookup[e_host_g]
        ring_j = ring_lookup[e_jj_c].astype(np.int64)
        ring_i = ring_lookup[e_host_g].astype(np.int64)
        live = (
            self.e_valid & (self.e_patch_g >= 0) & (self.e_jj_g >= 0)
            & (base >= 0) & (ring_j >= 0) & (ring_i >= 0)
        )
        if _DEBUG_CHECKS:
            self._check_edge_slot_uniqueness(live, base, e_jj_c)

        # BA window: last optimization_window alive frames free, except the
        # global gauge anchors (first two frames)
        win = self.frame_gids[-cfg.optimization_window:]
        slot_map = np.full(cfg.max_frames, -1, np.int32)
        nslot = 0
        for g in win:
            if g <= 1:
                continue
            slot_map[g] = nslot
            nslot += 1

        # edge sort for the Pallas correlation kernel: per-ring contiguous
        # runs padded to EB-blocks, so each block reads ONE frame's features
        perm = inv_perm = block_frame = None
        if self.cfg.use_pallas_corr and jax.default_backend() == "tpu":
            from nerf_vo_tpu.ops.correlation_pallas import EB as _EB

            E = cfg.max_edges
            ring_clamped = np.where(live, ring_j, 0)
            order = np.argsort(ring_clamped, kind="stable")
            rings_sorted = ring_clamped[order]
            perm_list = []
            blocks = []
            for ring in range(cfg.ring_size):
                sel = order[rings_sorted == ring]
                if sel.size == 0:
                    continue
                nb = -(-sel.size // _EB)
                pad = nb * _EB - sel.size
                perm_list.append(sel)
                if pad:
                    perm_list.append(np.full(pad, sel[-1]))
                blocks.extend([ring] * nb)
            # total length bucketed to the live edge count (quarters of the
            # max): dead edge slots used to ride along as pad blocks — ~37%
            # of the corr kernel at steady state. Each bucket is one compiled
            # program (<= 4 compiles over a run; buckets recur, so the
            # executable cache covers them after first use).
            max_blocks = (E + cfg.ring_size * _EB) // _EB
            quarter = max(max_blocks // 4, 1)
            n_blk = min(
                -(-max(len(blocks), 1) // quarter) * quarter, max_blocks
            )
            E2 = n_blk * _EB
            flat = np.concatenate(perm_list) if perm_list else np.zeros(0, np.int64)
            fill = E2 - flat.size
            perm_np = np.concatenate([flat, np.zeros(fill, np.int64)])
            blocks += [0] * (n_blk - len(blocks))
            # inverse permutation: first occurrence wins for pad duplicates
            inv_np = np.zeros(E, np.int64)
            if flat.size:
                uniq, first_idx = np.unique(flat, return_index=True)
                inv_np[uniq] = first_idx
            perm_parts = [perm_np.astype(np.uint16), inv_np.astype(np.uint16),
                          np.asarray(blocks, np.uint8)]
        else:
            perm_parts = []

        # ONE packed ~340 KB uint8 H2D transfer for all host metadata
        # (the tunnel moves ~50-60 MB/s: int32 fields cost ~19 ms/frame)
        e_host16 = np.where(
            self.e_patch_g >= 0, self.e_patch_g // P, -1
        ).astype(np.int16)
        e_patch8 = np.where(
            self.e_patch_g >= 0, self.e_patch_g % P, 0
        ).astype(np.uint8)
        sections = [
            e_host16,
            e_patch8,
            self.e_jj_g.astype(np.int16),
            self.e_fresh.astype(np.uint8),
            hosts_arr,
            ring_lookup,
            slot_map.astype(np.int16),
            np.asarray(kf_pair, np.int16),
        ] + perm_parts
        meta = jnp.asarray(
            np.concatenate([np.ascontiguousarray(s).view(np.uint8).ravel()
                            for s in sections])
        )
        return meta, kf_mid, live

    def _finish_update(self, live, kf_mid, dist) -> None:
        self.e_fresh[live] = False
        if kf_mid is not None:
            try:
                dist.copy_to_host_async()
            except Exception:
                pass
            self._pending_kf_checks.append((kf_mid, dist))

    def _run_update(self, queue_kf: bool = False) -> None:
        prep = self._prepare_update(queue_kf)
        if prep is None:
            return
        meta, kf_mid, live = prep
        (self.poses, self.pt_invd, self.hidden, self.e_target, costs, dist
         ) = self._vo_update(
            self.params,
            self.poses,
            self.pt_xy,
            self.pt_invd,
            self.intrinsics4,
            self.fmap1, self.fmap2, self.gmap, self.imap,
            self.hidden, self.e_target,
            meta,
            ba_iters=self.cfg.ba_iterations,
        )
        self._finish_update(live, kf_mid, dist)

    def _resolve_kf_checks(self) -> None:
        """Drop frame (n - KEYFRAME_INDEX) if local motion is below the
        keyframe threshold (reference policy [upstream]; thresh from
        configs/*.yaml keyframe_threshold).

        The flow-distance readback is PIPELINED: the distance is computed
        inside the same fused update program that produced the poses, its
        device->host copy is started asynchronously, and the decision is
        resolved once it is 2 frames old — deep enough that the device has
        finished the producing frame's work and the readback is free. The
        removal therefore lands two frames later than the reference's
        synchronous check — same policy, two steps of latency.
        """
        cfg = self.cfg
        queue = self._pending_kf_checks
        while len(queue) >= 2:
            mid, dist = queue.pop(0)
            if mid in self.frame_gids and mid > 1:
                if float(np.asarray(dist)) < cfg.keyframe_threshold:
                    self.frame_gids.remove(mid)
                    self._free_frame(mid)
                    self.colors.pop(mid, None)

    def _retire(self) -> List[int]:
        """Frames older than the removal window become final keyframes."""
        cfg = self.cfg
        retired = []
        while len(self.frame_gids) > cfg.removal_window:
            gid = self.frame_gids.pop(0)
            retired.append(gid)
            self.retired.append(gid)
            self._free_frame(gid)  # colors retained for packet assembly
        return retired

    def flush(self) -> List[int]:
        """Retire all remaining frames (end of sequence)."""
        out = list(self.frame_gids)
        self.retired.extend(out)
        self.frame_gids = []
        return out

    # ------------------------------------------------------------------
    # packet assembly (DPVOHandler parity)
    # ------------------------------------------------------------------

    def keyframe_packet(self, gids: List[int], last_frame: bool = False
                        ) -> Optional[Dict[str, Any]]:
        """Build the tracking->enhancement packet (SURVEY.md appendix).

        Colors of emitted keyframes are released after assembly.
        """
        if not gids:
            return None
        # pad to a power-of-two bucket: a distinct jit/eager program per
        # packet length would recompile constantly (remote compiles)
        K0 = len(gids)
        B = 1
        while B < K0:
            B *= 2
        padded = list(gids) + [gids[-1]] * (B - K0)
        idx = jnp.asarray(padded)
        poses = self.poses[idx]
        c2w = lie.se3_matrix(lie.se3_inv(poses))  # cam2world, OpenCV frame
        xy = self.pt_xy[idx]  # [K, P, 2]
        invd = self.pt_invd[idx]  # [K, P]
        offs = jnp.stack(
            jnp.meshgrid(jnp.arange(-1.0, 2.0), jnp.arange(-1.0, 2.0),
                         indexing="xy"),
            -1,
        )
        grid = xy[:, :, None, None, :] + offs[None, None]  # [K, P, 3, 3, 2]
        d = jnp.broadcast_to(invd[:, :, None, None, None],
                             grid.shape[:-1] + (1,))
        patches = jnp.concatenate([grid, d], -1)  # [K, P, 3, 3, 3]
        patches = jnp.moveaxis(patches, -1, 2)  # [K, P, 3(x|y|d), 3, 3]
        colors = np.stack(
            [self.colors.pop(g, np.zeros((self.H, self.W, 3), np.uint8))
             for g in gids]
        )
        # intrinsics/extrinsics/patches stay DEVICE arrays: a np.asarray
        # here is a synchronous D2H that waits for every program already
        # queued on the device — including the pipeline's interleaved
        # mapping steps — re-serializing the whole pipeline once per
        # keyframe (bench_pipeline_v2 measured all arms flattened to
        # ~3.5 FPS by exactly this stall). The enhancement/mapping stages
        # consume device arrays natively; colors come from the host ring.
        return {
            "keyframe_indices": np.asarray(gids, np.int64),
            "camera_intrinsics": self.intrinsics4[idx][:K0] * 4.0,
            "camera_extrinsics": c2w[:K0].astype(jnp.float32),
            "frames_color": np.moveaxis(colors, -1, 1),  # [K, 3, H, W] uint8
            "dpvo_patches": patches[:K0].astype(jnp.float32),
            "last_frame": last_frame,
        }

    def trajectory(self) -> Dict[int, np.ndarray]:
        """gid -> cam2world 4x4 for all retired + alive frames."""
        gids = self.retired + self.frame_gids
        if not gids:
            return {}
        mats = np.asarray(
            lie.se3_matrix(lie.se3_inv(self.poses[jnp.asarray(gids)]))
        )
        return {g: mats[i] for i, g in enumerate(gids)}
