"""DROID-SLAM-style dense tracking frontend (the "nerf_slam" pipeline).

TPU-native replacement for the reference's 1335-line DROIDSLAM class
(nerf_vo/tracking/droid_slam.py) and its CUDA/GTSAM underpinnings:
  * motion filter keeping keyframes with mean flow above a threshold
    (reference has_enough_motion, droid_slam.py:1185-1204),
  * a keyframe factor graph with neighborhood + recency edges
    (add_neighborhood/add_proximity_factors, droid_slam.py:997-1073 —
    proximity selection simplified to a windowed distance test),
  * dense per-pixel correlation pyramids REBUILT inside the jitted update
    (ops/dense_corr.py) — on TPU recomputing the all-pairs matmul each
    update is cheaper than managing cached volumes, inverting the CUDA
    design,
  * ConvGRU update -> flow targets/weights/damping -> dense bundle
    adjustment (ops/dense_ba.py) over the frontend window,
  * learned 8x convex upsampling of inverse depth for emitted keyframes and
    the exact per-pixel marginal depth covariance from the BA Schur system
    (Sigma_d = C^-1 + C^-1 U S^-1 U^T C^-1 — the same quantity the
    reference computes via dense Cholesky, droid_slam.py:676-725),
  * global bundle adjustment over all keyframes at termination
    (reference terminate/backend, droid_slam.py:318-338,727-768).

Host/device split mirrors tracking/dpvo.py: numpy bookkeeping drives
fixed-shape jitted programs.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nerf_vo_tpu.core import lie
from nerf_vo_tpu.models.droid_net import (
    DroidNet,
    cvx_upsample,
    normalize_images,
)
from nerf_vo_tpu.ops import dense_ba
from nerf_vo_tpu.ops.dense_corr import build_corr_pyramid, corr_lookup


@dataclasses.dataclass(frozen=True)
class DroidConfig:
    buffer_size: int = 512
    motion_threshold: float = 2.4  # droid_slam.py:61
    keyframe_threshold: float = 4.0
    frontend_window: int = 25  # reference droid_slam.py:69
    frontend_radius: int = 2
    frontend_nms: int = 1  # proximity NMS radius (reference droid nms=1)
    frontend_threshold: float = 16.0  # max flow distance for proximity edges
    max_factors: int = 48
    # reference iteration schedule (droid_slam.py:80-83): iters1 update
    # iterations run with every candidate keyframe; iters2 more run only
    # when the candidate is KEPT (flow distance between the two previous
    # keyframes >= keyframe_threshold — otherwise the previous keyframe is
    # removed, reference __update + rm_keyframe, droid_slam.py:271-316,964)
    iters1: int = 4
    iters2: int = 2
    # inactive-factor store (reference rm_factors(store=True) +
    # update(use_inactive=True), droid_slam.py:381-391,1086-1090): edges
    # evicted from the live set keep their last flow target/weight and
    # stay in every frontend BA as fixed reprojection constraints while
    # both endpoints remain in the window. 0 disables (live edges only).
    inactive_factors: int = 48
    ba_iters: int = 2
    backend_radius: int = 2
    backend_nms: int = 3
    backend_threshold: float = 22.0
    backend_steps1: int = 7
    backend_steps2: int = 12
    perform_global_ba: bool = True
    compute_covariances: bool = True


class DROIDSLAMTracker:
    def __init__(self, config: DroidConfig, net: DroidNet, params,
                 height: int, width: int, mesh=None):
        """``mesh``: optional jax.sharding.Mesh — when given, the frontend
        dense-BA solver shards its pixel axis over the mesh's first axis
        (ops/dense_ba.make_sharded_dense_ba): per-device jacobian work
        shrinks 1/D with one (P*6)^2 psum per GN iteration. The reference
        is single-GPU here; this is the tracking-side multi-chip path."""
        assert height % 8 == 0 and width % 8 == 0
        self.cfg = config
        self.net = net
        self.params = {"params": params}
        self._sharded_ba = (
            dense_ba.make_sharded_dense_ba(
                mesh, axis=mesh.axis_names[0],
                num_iters=config.ba_iters, window=config.frontend_window,
            )
            if mesh is not None else None
        )
        self.H, self.W = height, width
        self.h, self.w = height // 8, width // 8
        B = config.buffer_size
        E = config.max_factors

        self.poses = jnp.tile(lie.se3_identity(), (B, 1))
        self.disps = jnp.ones((B, self.h, self.w))
        self.intrinsics8 = jnp.ones((B, 4))
        self.fmaps = jnp.zeros((B, self.h, self.w, net.fdim), jnp.bfloat16)
        self.nets0 = jnp.zeros((B, self.h, self.w, net.cdim), jnp.bfloat16)
        self.inps = jnp.zeros((B, self.h, self.w, net.cdim), jnp.bfloat16)
        self.hidden = jnp.zeros((E, self.h, self.w, net.cdim))
        self.e_target = jnp.zeros((E, self.h, self.w, 2))
        self.e_weight = jnp.zeros((E, self.h, self.w, 2))
        EI = max(config.inactive_factors, 1)
        self.i_target = jnp.zeros((EI, self.h, self.w, 2))
        self.i_weight = jnp.zeros((EI, self.h, self.w, 2))
        self.i_ii = np.full(EI, -1, np.int64)
        self.i_jj = np.full(EI, -1, np.int64)
        self.i_valid = np.zeros(EI, bool)
        self.i_ptr = 0
        self.eta = jnp.zeros((B, self.h, self.w))
        self.upmask = jnp.zeros((B, self.h, self.w, 576))
        self.depth_cov = jnp.ones((B, self.h, self.w))

        self.n_kf = 0  # buffer high-water mark (slots ever allocated)
        self.free_slots: List[int] = []  # slots freed by keyframe removal
        self.tstamps: Dict[int, float] = {}
        self.src_index: Dict[int, int] = {}
        self.colors: Dict[int, np.ndarray] = {}
        self.alive: List[int] = []  # kf slot ids in the frontend window
        self.retired: List[int] = []
        self.e_ii = np.full(E, -1, np.int64)
        self.e_jj = np.full(E, -1, np.int64)
        self.e_valid = np.zeros(E, bool)
        self.e_fresh = np.zeros(E, bool)
        self._last_fmap = None
        # frontend correlation-pyramid cache: the pyramid depends only on
        # (fmaps, live edge set), both fixed across the iters1+iters2
        # update iterations of one frame — build once per graph version
        # and reuse, like the reference's CorrBlock which materializes the
        # volume once per edge set (droid_slam.py:360; CUDA corr kernels)
        self._graph_version = 0
        self._pyr_cache = None
        self._pyr_version = -1

        self._encode = jax.jit(self._encode_impl)
        self._motion = jax.jit(self._motion_impl)
        self._update = jax.jit(
            self._update_impl,
            donate_argnames=("poses", "disps", "hidden", "e_target",
                             "e_weight"),
        )
        self._upsample = jax.jit(
            lambda disps, mask: cvx_upsample(disps, mask)
        )
        self._pair_distance = jax.jit(
            lambda poses, disps, intr, ii, jj: dense_ba.frame_distance(
                poses, disps, intr, ii, jj
            )
        )
        self._backend_flow = jax.jit(
            self._backend_flow_impl, static_argnames=("n_frames",)
        )
        self._pyramid = jax.jit(self._pyramid_impl)

    # ------------------------------------------------------------------

    def _backend_flow_impl(self, params, poses, disps, intrinsics8, fmaps,
                           inps, hidden, target_prev, ii, jj, ii_local,
                           valid, fresh, n_frames: int):
        """Backend GRU flow pass over one host-frame-grouped edge chunk
        (reference update_lowmem inner loop, droid_slam.py:516-552).

        ii/jj: [CE] global buffer slots; ii_local: [CE] chunk-frame index
        in [0, n_frames) for the agg head (every edge of a host frame is
        in the chunk, so the per-frame pooling is complete); fresh: scalar
        bool — the first backend step zeroes hidden state and targets.
        """
        h, w = self.h, self.w
        f_i = fmaps[ii].astype(jnp.float32)
        f_j = fmaps[jj].astype(jnp.float32)
        pyr = build_corr_pyramid(f_i, f_j, num_levels=4)
        coords, z = dense_ba.dense_reproject(poses, disps, intrinsics8, ii, jj)
        corr = corr_lookup(pyr, coords, radius=3)
        ys, xs = jnp.meshgrid(
            jnp.arange(h, dtype=jnp.float32),
            jnp.arange(w, dtype=jnp.float32), indexing="ij",
        )
        grid = jnp.stack([xs, ys], -1)[None]
        tgt_prev = jnp.where(fresh, coords, target_prev)
        flow = jnp.clip(
            jnp.concatenate([coords - grid, tgt_prev - coords], -1),
            -64.0, 64.0,
        )
        net = jnp.where(fresh, 0.0, hidden.astype(jnp.float32))
        inp = inps[ii].astype(jnp.float32)
        net, delta, weight, eta, upmask = self.net.apply(
            params, net, inp, corr, flow, ii_local, n_frames,
            method=self.net.update_step,
        )
        target = coords + delta
        weight = weight * valid[:, None, None, None]
        return net, target, weight, eta, upmask

    def _encode_impl(self, params, image):
        # ImageNet normalization, matching the reference's
        # droid_normalization (droid_slam.py:1290-1301) so converted
        # droid.pth weights see the distribution they were trained on.
        x = normalize_images(image[None])
        fmap = self.net.apply(params, x, method=self.net.encode_features)[0]
        net0, inp = self.net.apply(params, x, method=self.net.encode_context)
        return (
            fmap.astype(jnp.bfloat16),
            net0[0].astype(jnp.bfloat16),
            inp[0].astype(jnp.bfloat16),
        )

    def _motion_impl(self, params, fmap_new, fmap_last, inp_last):
        """Mean predicted flow of a single identity-initialized edge
        (reference has_enough_motion)."""
        f1 = fmap_last[None].astype(jnp.float32)
        f2 = fmap_new[None].astype(jnp.float32)
        pyr = build_corr_pyramid(f1, f2, num_levels=4)
        ys, xs = jnp.meshgrid(
            jnp.arange(self.h, dtype=jnp.float32),
            jnp.arange(self.w, dtype=jnp.float32), indexing="ij",
        )
        coords = jnp.stack([xs, ys], -1)[None]
        corr = corr_lookup(pyr, coords, radius=3)
        net = jnp.zeros((1, self.h, self.w, self.net.cdim))
        flow = jnp.zeros((1, self.h, self.w, 4))
        _, delta, _, _, _ = self.net.apply(
            params, net, inp_last[None].astype(jnp.float32), corr, flow,
            jnp.zeros((1,), jnp.int32), 1, method=self.net.update_step,
        )
        return jnp.mean(jnp.linalg.norm(delta, axis=-1))

    def _pyramid_impl(self, fmaps, ii, jj):
        f_i = fmaps[ii].astype(jnp.float32)
        f_j = fmaps[jj].astype(jnp.float32)
        return tuple(build_corr_pyramid(f_i, f_j, num_levels=4))

    def _update_impl(self, params, poses, disps, intrinsics8, pyr, inps,
                     hidden, e_target, e_weight, ii, jj, e_new, e_live,
                     slot_map, i_target, i_weight, i_ii, i_jj, i_valid,
                     profile_cut: int = 0):
        """One frontend/backend iteration over the padded edge set.

        The GRU runs on the LIVE edges only; the bundle adjustment also
        sees the INACTIVE store (i_*): evicted edges whose last flow
        target/weight persist as fixed reprojection constraints — the
        reference's update(use_inactive=True) path (droid_slam.py:381-391),
        active on every frontend iteration there and here.

        ``profile_cut`` (dev-only, scripts/exp_droid_cut.py): early-return
        after 1 = reprojection, 2 = correlation lookup, 11-13 = inside the
        update net (encoders / ConvGRU / heads), 3 = full update net,
        4 = skip the BA solve; 0 = full step.
        """
        cfg = self.cfg
        E = ii.shape[0]
        h, w = self.h, self.w
        B = disps.shape[0]

        def cut(token):
            # output-structure-preserving early return; `token` keeps the
            # computed stages alive through DCE
            return (poses + token * 0, disps, hidden, e_target, e_weight,
                    jnp.zeros((B, h, w)), jnp.zeros((B, h, w, 576)),
                    jnp.zeros((cfg.ba_iters,)), jnp.full((B, h, w), 1e9))

        coords, z = dense_ba.dense_reproject(poses, disps, intrinsics8, ii, jj)
        if profile_cut == 1:
            return cut(jnp.sum(coords) + jnp.sum(z))
        corr = corr_lookup(pyr, coords, radius=3)
        if profile_cut == 2:
            return cut(jnp.sum(corr))

        ys, xs = jnp.meshgrid(
            jnp.arange(h, dtype=jnp.float32),
            jnp.arange(w, dtype=jnp.float32), indexing="ij",
        )
        grid = jnp.stack([xs, ys], -1)[None]
        # reference motion features (droid_slam.py:355-358):
        # cat(coords - grid, previous_flow_estimate - coords), clamped
        tgt_prev = jnp.where(e_new[:, None, None, None], coords, e_target)
        flow = jnp.clip(
            jnp.concatenate(
                [coords - grid, jax.lax.stop_gradient(tgt_prev - coords)], -1
            ),
            -64.0, 64.0,
        )
        net = jnp.where(e_new[:, None, None, None], 0.0, hidden)
        inp = inps[ii].astype(jnp.float32)

        net_stop = profile_cut - 10 if 11 <= profile_cut <= 13 else 0
        net, delta, weight, eta, upmask = self.net.apply(
            params, net, inp, corr, flow, ii, disps.shape[0], net_stop,
            method=self.net.update_step,
        )
        if net_stop:
            return cut(jnp.sum(net) + jnp.sum(delta))
        if profile_cut == 3:
            return cut(jnp.sum(net) + jnp.sum(delta) + jnp.sum(weight)
                       + jnp.sum(eta) + jnp.sum(upmask))
        target = jax.lax.stop_gradient(coords) + delta
        weight = weight * e_live[:, None, None, None]
        e_weight = jnp.where(e_live[:, None, None, None], weight, e_weight)

        if cfg.inactive_factors:
            i_mask = i_valid[:, None, None, None]
            ba_ii = jnp.concatenate([ii, i_ii])
            ba_jj = jnp.concatenate([jj, i_jj])
            ba_targets = jnp.concatenate([target, i_target])
            ba_weights = jnp.concatenate([weight, i_weight * i_mask])
            ba_valid = jnp.concatenate([e_live, i_valid])
        else:
            ba_ii, ba_jj = ii, jj
            ba_targets, ba_weights, ba_valid = target, weight, e_live

        problem = dense_ba.DenseBAProblem(
            poses=poses, disps=disps, intrinsics=intrinsics8,
            ii=ba_ii, jj=ba_jj,
            targets=ba_targets, weights=ba_weights, valid=ba_valid,
        )
        if profile_cut == 4:  # everything except the BA solve
            return cut(jnp.sum(ba_targets) + jnp.sum(ba_weights)
                       + jnp.sum(eta) + jnp.sum(upmask))
        if self._sharded_ba is not None:
            poses, disps, costs, depth_cov = self._sharded_ba(
                problem, slot_map, eta=eta
            )
        else:
            poses, disps, costs, depth_cov = dense_ba.dense_bundle_adjust(
                problem, slot_map, num_iters=cfg.ba_iters,
                window=cfg.frontend_window, eta=eta,
            )

        hidden = jnp.where(e_live[:, None, None, None], net, hidden)
        e_target = jnp.where(e_live[:, None, None, None], target, e_target)

        return (poses, disps, hidden, e_target, e_weight, eta, upmask,
                costs, depth_cov)

    # ------------------------------------------------------------------

    def track(self, tstamp: float, image: np.ndarray, intrinsics: np.ndarray,
              frame_index: Optional[int] = None) -> List[int]:
        """Returns retired keyframe ids (possibly empty)."""
        cfg = self.cfg
        img = jnp.asarray(image, jnp.float32)
        fmap, net0, inp = self._encode(self.params, img)

        if self.n_kf > 0:
            last = jnp.asarray(self.alive[-1], jnp.int32)
            motion = float(
                self._motion(self.params, fmap, self.fmaps[last],
                             self.inps[last])
            )
            if motion < cfg.motion_threshold:
                return []

        if self.free_slots:
            kf = self.free_slots.pop()
        else:
            kf = self.n_kf
            self.n_kf += 1
        assert kf < cfg.buffer_size, "keyframe buffer exhausted"
        kf_d = jnp.asarray(kf, jnp.int32)
        self.fmaps = self.fmaps.at[kf_d].set(fmap)
        self.nets0 = self.nets0.at[kf_d].set(net0)
        self.inps = self.inps.at[kf_d].set(inp)
        self.intrinsics8 = self.intrinsics8.at[kf_d].set(
            jnp.asarray(intrinsics, jnp.float32) / 8.0
        )
        if len(self.alive) >= 2:
            g1 = self.poses[jnp.asarray(self.alive[-1], jnp.int32)]
            g2 = self.poses[jnp.asarray(self.alive[-2], jnp.int32)]
            motion_g = lie.se3_mul(g1, lie.se3_inv(g2))
            self.poses = self.poses.at[kf_d].set(lie.se3_mul(motion_g, g1))
            self.disps = self.disps.at[kf_d].set(
                self.disps[jnp.asarray(self.alive[-1], jnp.int32)]
            )
        elif self.alive:
            self.poses = self.poses.at[kf_d].set(
                self.poses[jnp.asarray(self.alive[-1], jnp.int32)]
            )

        self.tstamps[kf] = tstamp
        self.src_index[kf] = frame_index if frame_index is not None else kf
        self.colors[kf] = np.asarray(image, np.uint8)
        self.alive.append(kf)
        self._rebuild_edges()

        if len(self.alive) >= 4:
            for _ in range(cfg.iters1):
                self._run_update()
            # reference keyframe policy (__update, droid_slam.py:298-316):
            # test the flow distance between the two keyframes BEFORE the
            # candidate; if they became redundant under the refined
            # geometry, drop the previous keyframe (the candidate stays),
            # else run iters2 more refinement iterations.
            if len(self.alive) >= 3:
                a, b = self.alive[-3], self.alive[-2]
                d = np.asarray(self._pair_distance(
                    self.poses, self.disps, self.intrinsics8,
                    jnp.asarray([a, b], jnp.int32),
                    jnp.asarray([b, a], jnp.int32),
                ))
                if 0.5 * float(d[0] + d[1]) < cfg.keyframe_threshold:
                    self.remove_keyframe(b)
                else:
                    for _ in range(cfg.iters2):
                        self._run_update()

        return self._retire()

    def remove_keyframe(self, g: int) -> None:
        """Drop a redundant keyframe (reference rm_keyframe,
        droid_slam.py:964-995): the slot returns to the free pool (the
        reference instead shifts its dense buffers down — same effect),
        its edges are dropped, and it never reaches the mapping packet."""
        self.alive.remove(g)
        self.free_slots.append(g)
        self.colors.pop(g, None)
        self.tstamps.pop(g, None)
        self.src_index.pop(g, None)
        # inactive factors referencing the deleted frame die with it
        # (reference rm_keyframe, droid_slam.py:977-988)
        for k in range(self.cfg.inactive_factors):
            if self.i_valid[k] and g in (int(self.i_ii[k]),
                                         int(self.i_jj[k])):
                self.i_valid[k] = False
        self._rebuild_edges()

    # ------------------------------------------------------------------

    def _rebuild_edges(self) -> None:
        """Frontend graph: neighborhood edges among the window keyframes +
        flow-proximity edges selected greedily with NMS suppression
        (reference add_neighborhood_factors/add_proximity_factors,
        droid_slam.py:997-1073: pairwise frame_distance, threshold, sort by
        distance, suppress an index-space neighborhood around each pick)."""
        cfg = self.cfg
        win = self.alive[-cfg.frontend_window:]
        W = len(win)
        pairs = []
        chosen = set()
        for a_idx, a in enumerate(win):
            for b_idx, b in enumerate(win):
                if a == b:
                    continue
                if abs(a_idx - b_idx) <= cfg.frontend_radius:
                    pairs.append((a, b))
                    chosen.add((a_idx, b_idx))

        budget = cfg.max_factors - len(pairs)
        if W >= 3 and budget > 0:
            # pairwise flow distances on device (one padded static-shape call)
            cand = [
                (ai, bi) for ai in range(W) for bi in range(W)
                if ai != bi and (ai, bi) not in chosen
            ]
            if cand:
                P = cfg.frontend_window * (cfg.frontend_window - 1)
                ii = np.zeros(P, np.int32)
                jj = np.zeros(P, np.int32)
                for s, (ai, bi) in enumerate(cand):
                    ii[s] = win[ai]
                    jj[s] = win[bi]
                d = np.asarray(
                    self._pair_distance(
                        self.poses, self.disps, self.intrinsics8,
                        jnp.asarray(ii), jnp.asarray(jj),
                    )
                )[: len(cand)]
                suppressed = set()
                for k in np.argsort(d):
                    if budget <= 0 or d[k] > cfg.frontend_threshold:
                        break
                    ai, bi = cand[k]
                    if (ai, bi) in suppressed:
                        continue
                    pairs.append((win[ai], win[bi]))
                    budget -= 1
                    r = cfg.frontend_nms
                    for di in range(-r, r + 1):
                        for dj in range(-r, r + 1):
                            suppressed.add((ai + di, bi + dj))

        pairs = pairs[-cfg.max_factors:]
        old = {(int(self.e_ii[s]), int(self.e_jj[s])): s
               for s in range(cfg.max_factors) if self.e_valid[s]}
        if cfg.inactive_factors:
            self._store_inactive(old, pairs, set(win))
        self.e_valid[:] = False
        new_ii = np.full(cfg.max_factors, -1, np.int64)
        new_jj = np.full(cfg.max_factors, -1, np.int64)
        new_fresh = np.zeros(cfg.max_factors, bool)
        hidden = self.hidden
        e_target = self.e_target
        perm_src = []
        perm_dst = []
        for s, (a, b) in enumerate(pairs):
            new_ii[s] = a
            new_jj[s] = b
            if (a, b) in old:
                if old[(a, b)] != s:
                    perm_src.append(old[(a, b)])
                    perm_dst.append(s)
                new_fresh[s] = self.e_fresh[old[(a, b)]]
            else:
                new_fresh[s] = True
        if perm_src:
            src = jnp.asarray(perm_src)
            dst = jnp.asarray(perm_dst)
            hidden = hidden.at[dst].set(hidden[src])
            e_target = e_target.at[dst].set(e_target[src])
        self.hidden = hidden
        self.e_target = e_target
        self.e_ii = new_ii
        self.e_jj = new_jj
        self.e_valid[: len(pairs)] = True
        self.e_fresh = new_fresh
        self._graph_version += 1  # invalidates the frontend pyramid cache

    def _store_inactive(self, old: Dict, pairs: List, winset: set) -> None:
        """Move edges evicted from the live set into the inactive ring
        (reference rm_factors(store=True), droid_slam.py:1086-1090): their
        last flow target/weight persist as BA constraints. Entries whose
        endpoints left the window, were removed, or became live again are
        invalidated (reference rm_keyframe + __filter_repeated_edges)."""
        cfg = self.cfg
        EI = cfg.inactive_factors
        pairset = set(pairs)
        for k in range(EI):
            if self.i_valid[k]:
                e = (int(self.i_ii[k]), int(self.i_jj[k]))
                if e in pairset or e[0] not in winset or e[1] not in winset:
                    self.i_valid[k] = False
        src, dst = [], []
        for (a, b), s in old.items():
            if ((a, b) in pairset or self.e_fresh[s]
                    or a not in winset or b not in winset):
                continue  # kept live, never updated, or out of window
            d = self.i_ptr % EI
            self.i_ptr += 1
            self.i_ii[d], self.i_jj[d] = a, b
            self.i_valid[d] = True
            src.append(s)
            dst.append(d)
        if src:
            si = jnp.asarray(src)
            di = jnp.asarray(dst)
            self.i_target = self.i_target.at[di].set(self.e_target[si])
            self.i_weight = self.i_weight.at[di].set(self.e_weight[si])

    def _slot_map(self, free: List[int]) -> np.ndarray:
        cfg = self.cfg
        sm = np.full(cfg.buffer_size, -1, np.int32)
        for s, g in enumerate(free[: cfg.frontend_window]):
            sm[g] = s
        return sm

    def _run_update(self, slot_override: Optional[np.ndarray] = None) -> None:
        cfg = self.cfg
        if not self.e_valid.any():
            return
        win = self.alive[-cfg.frontend_window:]
        # first two keyframes anchor gauge + scale
        free = [g for g in win if g > 1]
        slot_map = (self._slot_map(free) if slot_override is None
                    else slot_override)
        ii_dev = jnp.asarray(np.clip(self.e_ii, 0, None).astype(np.int32))
        jj_dev = jnp.asarray(np.clip(self.e_jj, 0, None).astype(np.int32))
        if self._pyr_version != self._graph_version:
            self._pyr_cache = self._pyramid(self.fmaps, ii_dev, jj_dev)
            self._pyr_version = self._graph_version
        (self.poses, self.disps, self.hidden, self.e_target, self.e_weight,
         self.eta, upmask, costs, depth_cov) = self._update(
            self.params, self.poses, self.disps, self.intrinsics8,
            self._pyr_cache, self.inps, self.hidden, self.e_target,
            self.e_weight,
            ii_dev, jj_dev,
            jnp.asarray(self.e_fresh.copy()),
            jnp.asarray(self.e_valid.copy()),
            jnp.asarray(slot_map),
            self.i_target, self.i_weight,
            jnp.asarray(np.clip(self.i_ii, 0, None).astype(np.int32)),
            jnp.asarray(np.clip(self.i_jj, 0, None).astype(np.int32)),
            jnp.asarray(self.i_valid.copy()),
        )
        self.upmask = upmask
        # merge fresh marginal covariances into the persistent buffer
        # (frames outside the current edge set keep their last estimate)
        self.depth_cov = jnp.where(depth_cov < 1e5, depth_cov, self.depth_cov)
        self.e_fresh[self.e_valid] = False

    def _retire(self) -> List[int]:
        cfg = self.cfg
        retired = []
        while len(self.alive) > cfg.frontend_window:
            g = self.alive.pop(0)
            retired.append(g)
            self.retired.append(g)
        if retired:
            self._rebuild_edges()
        return retired

    def flush(self) -> List[int]:
        if self.cfg.perform_global_ba and len(self.retired + self.alive) >= 8:
            # reference terminate schedule: two full global BA passes
            # (droid_slam.py:318-338 — backend(7) then backend(12))
            self.backend(self.cfg.backend_steps1)
            self.backend(self.cfg.backend_steps2)
        out = list(self.alive)
        self.retired.extend(out)
        self.alive = []
        return out

    # Back-compat alias used by older call sites/tests.
    def global_bundle_adjustment(self, iters: int = 4) -> None:
        self.backend(iters)

    def _backend_edges(self):
        """Proximity edge selection over ALL keyframes (reference
        add_proximity_factors at backend parameters, droid_slam.py:727-768,
        1010-1073): forced radius-2 neighbors + greedy NMS selection of
        flow-close pairs, capped at 16 edges per keyframe on average."""
        cfg = self.cfg
        order = self.retired + self.alive  # time order
        Nk = len(order)
        pairs = []
        chosen = set()
        for a in range(Nk):
            for b in range(Nk):
                if a != b and abs(a - b) <= cfg.backend_radius:
                    pairs.append((a, b))
                    chosen.add((a, b))
        # pairwise flow distances (chunked static-shape device calls)
        cand = [
            (a, b) for a in range(Nk) for b in range(Nk)
            if a != b and (a, b) not in chosen
        ]
        dists = np.full(len(cand), np.inf, np.float32)
        CH = 1024
        for start in range(0, len(cand), CH):
            cc = cand[start: start + CH]
            ii = np.zeros(CH, np.int32)
            jj = np.zeros(CH, np.int32)
            for s, (a, b) in enumerate(cc):
                ii[s] = order[a]
                jj[s] = order[b]
            d = np.asarray(self._pair_distance(
                self.poses, self.disps, self.intrinsics8,
                jnp.asarray(ii), jnp.asarray(jj),
            ))
            dists[start: start + len(cc)] = d[: len(cc)]
        budget = 16 * Nk - len(pairs)
        suppressed = set()
        for k in np.argsort(dists):
            if budget <= 0 or dists[k] > cfg.backend_threshold:
                break
            a, b = cand[k]
            if (a, b) in suppressed:
                continue
            pairs.append((a, b))
            budget -= 1
            r = cfg.backend_nms
            for di in range(-r, r + 1):
                for dj in range(-r, r + 1):
                    suppressed.add((a + di, b + dj))
        return order, pairs

    def backend(self, steps: int) -> None:
        """One global BA pass over all keyframes (reference backend +
        update_lowmem, droid_slam.py:494-571,727-768): fresh proximity
        edges, then `steps` iterations of [host-frame-chunked GRU flow
        updates -> one global dense BA over every edge]. Edge state
        (hidden, flow target, weight) persists across the pass exactly as
        the reference's streaming buffers do."""
        cfg = self.cfg
        order, pairs = self._backend_edges()
        Nk = len(order)
        if Nk < 4 or not pairs:
            return
        h, w = self.h, self.w

        # group edges by host-frame position; bucket ME to a power of two
        per_host: Dict[int, List[int]] = {a: [] for a in range(Nk)}
        for a, b in pairs:
            per_host[a].append(b)
        me = max(len(v) for v in per_host.values())
        ME = 1
        while ME < me:
            ME *= 2
        jj_g = np.zeros((Nk, ME), np.int32)
        valid = np.zeros((Nk, ME), bool)
        for a, bs in per_host.items():
            for m, b in enumerate(bs):
                jj_g[a, m] = order[b]
                valid[a, m] = True
        host = np.asarray([order[a] for a in range(Nk)], np.int32)

        # per-edge state rows (reference gru_* buffers, fp16 there)
        hidden = jnp.zeros((Nk, ME, h, w, self.net.cdim), jnp.bfloat16)
        target = jnp.zeros((Nk, ME, h, w, 2))
        weight = jnp.zeros((Nk, ME, h, w, 2))

        # fix the first two keyframes: SE3 gauge + monocular scale (the
        # reference instead priors pose 0 and lets scale ride the damping)
        slot_map = np.full(cfg.buffer_size, -1, np.int32)
        for p, g in enumerate(order[2:]):
            slot_map[g] = p
        P = max(Nk - 2, 1)
        slot_map_d = jnp.asarray(slot_map)

        CF = min(4, Nk)  # host frames per GRU chunk (reference streams 8)
        for step in range(steps):
            for f0 in range(0, Nk, CF):
                rows = list(range(f0, min(f0 + CF, Nk)))
                rows = rows + [rows[-1]] * (CF - len(rows))  # pad rows
                r_idx = jnp.asarray(rows)
                ii_rep = jnp.repeat(jnp.asarray(host[rows]), ME)
                jj_c = jnp.asarray(jj_g[rows].reshape(-1))
                val_c = jnp.asarray(valid[rows].reshape(-1))
                # padded duplicate rows must not double-write: only the
                # first occurrence of each row is scattered back
                first = np.zeros(CF, bool)
                seen = set()
                for q, rr in enumerate(rows):
                    if rr not in seen:
                        first[q] = True
                        seen.add(rr)
                ii_loc = jnp.repeat(jnp.arange(CF), ME)
                net_c, tgt_c, wgt_c, eta_c, up_c = self._backend_flow(
                    self.params, self.poses, self.disps, self.intrinsics8,
                    self.fmaps, self.inps,
                    hidden[r_idx].reshape(CF * ME, h, w, -1),
                    target[r_idx].reshape(CF * ME, h, w, 2),
                    ii_rep, jj_c, ii_loc, val_c,
                    jnp.asarray(step == 0), n_frames=CF,
                )
                keep = jnp.asarray(first)
                sel = r_idx
                hidden = hidden.at[sel].set(
                    jnp.where(
                        keep[:, None, None, None, None],
                        net_c.reshape(CF, ME, h, w, -1).astype(jnp.bfloat16),
                        hidden[sel],
                    )
                )
                target = target.at[sel].set(
                    jnp.where(keep[:, None, None, None, None],
                              tgt_c.reshape(CF, ME, h, w, 2), target[sel])
                )
                weight = weight.at[sel].set(
                    jnp.where(keep[:, None, None, None, None],
                              wgt_c.reshape(CF, ME, h, w, 2), weight[sel])
                )
                self.eta = self.eta.at[jnp.asarray(host[rows])].set(
                    jnp.where(keep[:, None, None], eta_c, self.eta[jnp.asarray(host[rows])])
                )
                self.upmask = self.upmask.at[jnp.asarray(host[rows])].set(
                    jnp.where(keep[:, None, None, None], up_c,
                              self.upmask[jnp.asarray(host[rows])])
                )
            self.poses, self.disps, costs = dense_ba.global_dense_ba(
                self.poses, self.disps, self.intrinsics8,
                jnp.asarray(host), jnp.asarray(jj_g), jnp.asarray(valid),
                target, weight, slot_map_d,
                num_iters=cfg.ba_iters, P=P,
                eta=0.2 * self.eta + 1e-7,
            )
        if self.alive:
            self._rebuild_edges()

    # ------------------------------------------------------------------

    def keyframe_packet(self, kfs: List[int], last_frame: bool = False
                        ) -> Optional[Dict[str, Any]]:
        """tracking->enhancement packet with dense upsampled inverse depth
        (+ covariance), SURVEY.md appendix schema."""
        if not kfs:
            return None
        K0 = len(kfs)
        B = 1
        while B < K0:
            B *= 2  # bucket packet sizes (see tracking/dpvo.py note)
        idx = jnp.asarray(list(kfs) + [kfs[-1]] * (B - K0))
        poses = self.poses[idx]
        c2w = lie.se3_matrix(lie.se3_inv(poses))[:K0]
        disps = self.disps[idx]
        masks = self.upmask  # [B, h, w, 576] frame-level heads
        up = self._upsample(disps, masks[idx])
        up = np.asarray(up, np.float32)[:K0]
        # scale: disparity at 1/8 res upsampled -> full-res inverse depth
        colors = np.stack(
            [self.colors.pop(k, np.zeros((self.H, self.W, 3), np.uint8))
             for k in kfs]
        )
        packet = {
            "keyframe_indices": np.asarray(kfs, np.int64),
            "camera_intrinsics": np.asarray(self.intrinsics8[idx])[:K0] * 8.0,
            "camera_extrinsics": np.asarray(c2w, np.float32),
            "frames_color": np.moveaxis(colors, -1, 1),
            "droid_slam_inverse_depth": up,
            "last_frame": last_frame,
        }
        if self.cfg.compute_covariances:
            # exact per-pixel marginal covariance from the BA Schur system
            # (reference droid_slam.py:676-725), upsampled with the same
            # learned convex masks as the disparities (reference 481-486)
            cov_up = self._upsample(self.depth_cov[idx], masks[idx])
            packet["droid_slam_depth_covariance"] = np.asarray(
                cov_up, np.float32
            )[:K0]
        return packet

    def trajectory(self) -> Dict[int, np.ndarray]:
        kfs = self.retired + self.alive
        if not kfs:
            return {}
        mats = np.asarray(
            lie.se3_matrix(lie.se3_inv(self.poses[jnp.asarray(kfs)]))
        )
        return {k: mats[i] for i, k in enumerate(kfs)}
