"""Pipeline stages: data -> tracking -> enhancement -> mapping.

Single-process equivalents of the reference's four ProcessModule subclasses
(nerf_vo/data/data_module.py, nerf_vo/tracking/tracking_module.py,
nerf_vo/enhancement/enhancement_module.py, nerf_vo/mapping/mapping_module.py).
The torch.multiprocessing queue pipeline collapses into direct calls driven
by runtime/pipeline.py — JAX async dispatch overlaps host work with device
compute, replacing process-level parallelism (SURVEY.md §5.8, §7.1(7)).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nerf_vo_tpu.core import conventions
from nerf_vo_tpu.data.datasets import make_dataset
from nerf_vo_tpu.enhancement import alignment
from nerf_vo_tpu.enhancement.omnidata import OmnidataEstimator
from nerf_vo_tpu.mapping import keyframe_buffer as kb
from nerf_vo_tpu.mapping.trainer import MappingTrainer, TrainerConfig
from nerf_vo_tpu.models.dpvo_net import init_dpvo_params
from nerf_vo_tpu.models.nerfacto import NerfactoConfig, NerfactoModel
from nerf_vo_tpu.tracking.dpvo import DPVOTracker, TrackingConfig


class DataStage:
    """Frame source (reference DataModule)."""

    def __init__(self, args):
        self.dataset = make_dataset(args.dataset_name, args)
        self.index = 0
        # Start the frame H2D here (in threaded mode this runs in the
        # prefetch thread): the ~12 ms uint8 transfer on the tunneled link
        # then overlaps the PREVIOUS frame's tracking compute instead of
        # sitting on the device timeline. DPVO path only — the DROID stage
        # crops the frame before upload.
        self._h2d = getattr(args, "tracking_module", "dpvo") == "dpvo"

    def step(self) -> Optional[dict]:
        if self.index >= len(self.dataset):
            return None
        frame = self.dataset[self.index]
        self.index += 1
        if self._h2d:
            import jax

            frame["frame_color_device"] = jax.device_put(
                np.ascontiguousarray(frame["frame_color"])
            )
        return frame

    def __len__(self):
        return len(self.dataset)


class TrackingStage:
    """Tracking dispatch (reference TrackingModule): 'dpvo' or 'droid-slam'."""

    def __init__(self, args, params=None):
        self.args = args
        self.name = getattr(args, "tracking_module", "dpvo")
        if self.name == "droid-slam":
            self._init_droid(args, params)
            self.frame_stride = getattr(args, "frame_stride", 1)
            return
        cfg = TrackingConfig(
            patches_per_frame=getattr(args, "patches_per_frame", 96),
            removal_window=getattr(args, "removal_window", 28),
            optimization_window=getattr(args, "optimization_window", 13),
            patch_lifetime=getattr(args, "patch_lifetime", 15),
            keyframe_threshold=getattr(args, "keyframe_threshold", 8.0),
            init_frames=getattr(args, "tracking_init_frames", 8),
            max_edges=getattr(args, "tracking_max_edges", 32768),
            ring_size=getattr(args, "tracking_ring_size", 32),
            max_frames=getattr(args, "tracking_max_frames", 4096),
        )
        net, p = init_dpvo_params(
            jax.random.PRNGKey(42), args.frame_height, args.frame_width,
            corr_radius=cfg.corr_radius,
        )
        if params is None:
            import os

            ckpt = os.environ.get("NERF_VO_DPVO_WEIGHTS")
            if ckpt:
                from nerf_vo_tpu.models.dpvo_net import load_torch_weights

                params = load_torch_weights(ckpt)["params"]
        self.tracker = DPVOTracker(
            cfg, net, params if params is not None else p,
            args.frame_height, args.frame_width,
        )
        self.frame_stride = getattr(args, "frame_stride", 1)

    def _init_droid(self, args, params):
        import jax as _jax

        from nerf_vo_tpu.models.droid_net import init_droid_params
        from nerf_vo_tpu.tracking.droid_slam import (
            DROIDSLAMTracker,
            DroidConfig,
        )

        H = args.frame_height - args.frame_height % 8
        W = args.frame_width - args.frame_width % 8
        cfg = DroidConfig(
            buffer_size=getattr(args, "num_keyframes", 512),
            motion_threshold=getattr(args, "motion_threshold", 2.4),
            keyframe_threshold=getattr(args, "keyframe_threshold", 4.0),
            frontend_window=getattr(args, "tracking_frontend_window", 25),
            max_factors=getattr(args, "tracking_max_edges", 48),
            perform_global_ba=getattr(
                args, "perform_global_bundle_adjustment", True
            ),
            compute_covariances=getattr(args, "compute_covariances", True),
        )
        net, p = init_droid_params(_jax.random.PRNGKey(42), H, W)
        if params is None:
            import os

            ckpt = os.environ.get("NERF_VO_DROID_WEIGHTS")
            if ckpt:
                from nerf_vo_tpu.models.droid_net import load_torch_weights

                params = load_torch_weights(ckpt)["params"]
        self.tracker = DROIDSLAMTracker(
            cfg, net, params if params is not None else p, H, W
        )

    def step(self, frame: Optional[dict]) -> Optional[dict]:
        if frame is None:
            gids = self.tracker.flush()
            return self.tracker.keyframe_packet(gids, last_frame=True)
        ci = frame["camera_intrinsics"]
        intr = np.asarray([ci["fx"], ci["fy"], ci["cx"], ci["cy"]], np.float32)
        color = frame["frame_color"]
        if self.name == "droid-slam":  # crop to a multiple of 8
            color = color[: self.tracker.H, : self.tracker.W]
        track_kwargs = {}
        if self.name != "droid-slam" and "frame_color_device" in frame:
            track_kwargs["image_device"] = frame["frame_color_device"]
        retired = self.tracker.track(
            float(frame["frame_index"]), color, intr,
            frame_index=frame["frame_index"], **track_kwargs,
        )
        if frame.get("last_frame"):
            retired = retired + self.tracker.flush()
            return self.tracker.keyframe_packet(retired, last_frame=True)
        return self.tracker.keyframe_packet(retired)

    def save_artifacts(self, dir_prediction: str) -> None:
        """mapping_keyframe2frame.json + tracking trajectory matrices
        (reference nerf_vo/tracking/dpvo.py:118-138)."""
        os.makedirs(os.path.join(dir_prediction, "matrices"), exist_ok=True)
        kf2frame = {
            str(i): int(self.tracker.src_index[g]) * self.frame_stride
            for i, g in enumerate(self.tracker.retired)
        }
        with open(os.path.join(dir_prediction, "mapping_keyframe2frame.json"),
                  "w") as f:
            json.dump(kf2frame, f)
        traj = self.tracker.trajectory()
        mats = {
            str(int(self.tracker.src_index[g]) * self.frame_stride):
                traj[g].tolist()
            for g in self.tracker.retired
        }
        with open(
            os.path.join(
                dir_prediction, "matrices",
                "matrices_origin2frame_keyframes_tracking.json",
            ), "w",
        ) as f:
            json.dump(mats, f)


def _bucket(n: int) -> int:
    """Pad batch sizes to power-of-two buckets so jitted programs compile a
    bounded number of times (remote XLA compiles cost minutes; a fresh
    program per distinct keyframe count stalls the pipeline)."""
    b = 1
    while b < n:
        b *= 2
    return b


def _pick_device(args, name: str):
    """Resolve an `<stage>_device: N` config knob to a jax.Device.

    The single-chip default (None) keeps everything on the default device.
    On a multi-chip host, `mapping_device: 1` / `enhancement_device: 1`
    move the NeRF training step and the DPT priors onto their own chip so
    they no longer serialize against tracking's per-frame dispatches —
    the multi-chip answer to SURVEY §7.3(4) (bench_pipeline measured
    tracking at ~2-6 FPS when mapping shares the chip; the reference's
    4-process design has the same one-GPU serialization, execute.py:91-109).
    """
    idx = getattr(args, f"{name}_device", None)
    if idx is None:
        return None
    devs = jax.devices()
    if idx >= len(devs):
        raise ValueError(
            f"{name}_device={idx} but only {len(devs)} devices present"
        )
    return devs[idx]


class EnhancementStage:
    """Dense priors + alignment (reference EnhancementModule)."""

    def __init__(self, args):
        self.mode = getattr(args, "enhancement_module", "depth")
        self.mapping_name = getattr(args, "mapping_module", "nerfstudio")
        self.device = _pick_device(args, "enhancement")
        self.estimator = (
            OmnidataEstimator(
                use_normals="normal" in self.mode,
                image_size=getattr(args, "enhancement_image_size", 384),
                # test-size hook: shrink the ViT trunk so CPU e2e runs
                # exercise the plumbing without the full 12-block DPT
                # (the converter round-trip tests cover the real arch)
                depth_layers=getattr(args, "enhancement_dpt_layers", 12),
            )
            if self.mode != "none"
            else None
        )
        if self.estimator is not None and self.device is not None:
            # pin the DPT weights to the enhancement chip; inputs follow
            self.estimator.depth_params = jax.device_put(
                self.estimator.depth_params, self.device
            )
            if self.estimator.normal_params is not None:
                self.estimator.normal_params = jax.device_put(
                    self.estimator.normal_params, self.device
                )

    def step(self, packet: Optional[dict]) -> Optional[dict]:
        if packet is None:
            return None
        out = dict(packet)
        # colors: [K, 3, H, W] u8 -> [K, H, W, 3] f32 in [0, 1].
        # The u8 HWC copy is the ONLY host-side touch; the float conversion
        # and everything downstream (DPT, alignment, normals) stays device-
        # resident so no keyframe forces a D2H sync — bench_pipeline
        # measured the old np round-trip at ~187 ms/keyframe on top of the
        # 31 ms DPT forward (tpu_runs/bench_pipeline.log, 2026-08-20).
        colors_u8 = jax.device_put(
            np.ascontiguousarray(np.moveaxis(packet["frames_color"], 1, -1)),
            self.device,
        )
        colors = colors_u8.astype(jnp.float32) / 255.0
        out["frames_color_float"] = colors

        if self.estimator is not None and "dpvo_patches" in packet:
            K = int(colors.shape[0])
            B = _bucket(K)
            colors_b = (
                jnp.concatenate(
                    [colors, jnp.repeat(colors[-1:], B - K, axis=0)], 0
                ) if B > K else colors
            )
            depth_raw, normal_raw = self.estimator(colors_b)
            # patches arrive as a DEVICE array from the tracker (no D2H in
            # the packet path); slice + pad stay on device too
            patches = jax.device_put(
                jnp.asarray(packet["dpvo_patches"]), self.device
            )  # [K, P, 3, 3, 3]
            centers = patches[:, :, :2, 1, 1]  # [K, P, (x, y)] at 1/4 res
            invd = patches[:, :, 2, 1, 1]  # [K, P]
            pad_k = lambda a: (
                jnp.concatenate(
                    [a, jnp.repeat(a[-1:], B - K, axis=0)], 0
                ) if B > K else a
            )
            aligned, scale, shift = alignment.align_frames(
                depth_raw, pad_k(centers), pad_k(invd)
            )
            out["frames_depth"] = aligned[:K]
            if normal_raw is not None:
                out["frames_normal"] = alignment.decode_normals(
                    normal_raw
                )[:K]
        elif "droid_slam_inverse_depth" in packet:
            # DROID path: depth = 1 / inverse depth (reference
            # enhancement_module.py:106-111)
            inv = packet["droid_slam_inverse_depth"]
            out["frames_depth"] = np.clip(
                1.0 / np.clip(inv, 1e-6, None), 0.0, alignment.MAX_DEPTH
            )
            if "droid_slam_depth_covariance" in packet:
                out["frames_depth_cov"] = packet["droid_slam_depth_covariance"]

        # OpenCV -> OpenGL camera flip. The reference flips only for the
        # nerfstudio mapper (enhancement_module.py:117-118) because pyngp
        # converts OpenCV poses internally; OUR mapper is OpenGL-native for
        # both modes (keyframe_buffer.c2w is documented OpenGL, the sampler
        # and the eval-side MapRenderer both assume it), so the flip applies
        # unconditionally — feeding raw OpenCV poses to the instant-ngp mode
        # trained with y/z-mirrored camera axes.
        # stays a device array: a np.asarray here would stall the host on
        # the full device queue once per keyframe (see keyframe_packet)
        out["camera_extrinsics"] = conventions.opencv_to_opengl(
            jnp.asarray(packet["camera_extrinsics"])
        )
        return out


class MappingStage:
    """Online NeRF mapping (reference MappingModule + Nerfstudio/InstantNGP
    wrappers)."""

    def __init__(self, args):
        self.args = args
        self.name = getattr(args, "mapping_module", "nerfstudio")
        K = args.num_keyframes
        H, W = args.frame_height, args.frame_width
        use_normals = "normal" in getattr(args, "enhancement_module", "depth")
        ngp = self.name == "instant-ngp"
        model_cfg = NerfactoConfig(
            near=0.05,
            far=20.0,
            num_images=K,
            predict_normals=True,
            depth_loss_type="l2" if ngp else "ds_nerf",
            depth_loss_mult=getattr(args, "depth_supervision_lambda", 0.001),
            normal_loss_mult=5e-6 if use_normals else 0.0,
            use_contraction=not ngp,
            aabb_min=-4.0,
            aabb_max=4.0,
            # NGP path: occupancy-grid empty-space skipping instead of
            # proposal networks (reference pyngp Testbed, SURVEY N5).
            # pyngp marches UNIFORMLY in t inside its bounded AABB — with
            # disparity spacing the 128 coarse occupancy bins would pile up
            # against the 0.05 near plane and leave ~10 bins for the whole
            # 0.5-5 m working range (exp_samples' occupancy arm showed the
            # resulting depth collapse).
            sampler="occupancy" if ngp else "proposal",
            spacing="linear" if ngp else "disparity",
        )
        # YAML escape hatch for mapper internals the reference hardcodes in
        # its nerfstudio TrainerConfig tree (reference nerfstudio.py:47-103):
        # any `mapping_model_overrides:` mapping in the config is applied
        # field-for-field onto NerfactoConfig (e.g. proposal_type: mlp,
        # grad_normal_mode: surface) — tuples in dataclass fields accept
        # YAML lists.
        overrides = getattr(args, "mapping_model_overrides", None)
        if overrides:
            import dataclasses as _dc

            fields = {f.name: f for f in _dc.fields(NerfactoConfig)}
            clean = {}
            for k, v in dict(overrides).items():
                if k not in fields:
                    raise ValueError(
                        f"unknown NerfactoConfig field in "
                        f"mapping_model_overrides: {k!r}"
                    )
                if isinstance(v, list):
                    v = tuple(v)
                clean[k] = v
            model_cfg = _dc.replace(model_cfg, **clean)
        self.model = NerfactoModel(model_cfg)
        self.trainer = MappingTrainer(
            self.model,
            TrainerConfig(
                rays_per_batch=getattr(args, "rays_per_batch", 4096),
                camera_learning_rate=getattr(
                    args, "extrinsic_learning_rate", 1e-4
                ),
                max_iterations=args.mapping_iterations,
            ),
            num_keyframes=K,
        )
        self.device = _pick_device(args, "mapping")
        self._put = (
            (lambda x: jax.device_put(x, self.device))
            if self.device is not None else jnp.asarray
        )
        self.state = self.trainer.init(jax.random.PRNGKey(42))
        self.buffer = kb.create(
            K, H, W, use_normals=use_normals,
            use_depth_cov=ngp,
        )
        if self.device is not None:
            # pin the train state + keyframe buffers to the mapping chip:
            # every train_step then runs there, concurrent with tracking's
            # dispatches on the default chip
            self.state = jax.device_put(self.state, self.device)
            self.buffer = jax.device_put(self.buffer, self.device)
        self.num_inserted = 0
        self.step_count = 0
        self.last_received = 0
        self.stream_active = True
        self.mapping_iterations = args.mapping_iterations
        self.snapshot_every = getattr(
            args, "mapping_snapshot_iterations", args.mapping_iterations
        )
        self.num_keyframes = K
        self._key = self._put(jax.random.PRNGKey(7))
        self.metrics_history: List[Dict[str, float]] = []
        # preview dumps replace the reference's live viser viewer
        # (nerf_vo/mapping/nerfstudio.py:101-102,125-137): rendered RGB/depth
        # snapshots land in <dir_prediction>/previews every N steps
        self.preview_every = getattr(args, "preview_iterations", 0)
        self.preview_dir = (
            os.path.join(getattr(args, "dir_prediction", "."), "previews")
            if self.preview_every
            else None
        )
        # live web viewer (reference viser viewer, nerfstudio.py:101-102):
        # opt-in via `viewer: true` in the config; renders stay on THIS
        # thread (the viewer only mailboxes cameras/JPEGs)
        self.viewer = None
        self.viewer_every = getattr(args, "viewer_render_every", 25)
        self.viewer_width = getattr(args, "viewer_width", 160)
        if getattr(args, "viewer", False):
            from nerf_vo_tpu.runtime.viewer import LiveViewer

            self.viewer = LiveViewer(port=getattr(args, "viewer_port", 7007))
            self.viewer.start()

    # -- keyframe stream ------------------------------------------------

    def update(self, packet: dict) -> None:
        n = packet["camera_extrinsics"].shape[0]
        if n == 0:
            return
        take = min(n, self.num_keyframes - self.num_inserted)
        if take < n:
            packet = {  # buffer full: keep the newest
                k: v[:take]
                if isinstance(v, (np.ndarray, jax.Array)) and v.ndim > 0
                else v
                for k, v in packet.items()
            }
            n = take
        if n == 0:
            return
        # pad to a bucket size (duplicate last index+content: duplicate
        # scatter writes carry identical values, so the result is exact)
        B = _bucket(n)

        def pad_k(a):
            # device arrays pad on device — pulling a [K, H, W, 3] float
            # frame back to host costs a forced sync + D2H + H2D per
            # keyframe (the enhancement stage now keeps packets resident)
            if isinstance(a, jax.Array):
                return jnp.concatenate(
                    [a, jnp.repeat(a[-1:], B - n, axis=0)], 0
                ) if B > n else a
            a = np.asarray(a)
            return np.concatenate(
                [a, np.repeat(a[-1:], B - n, axis=0)], 0
            ) if B > n else a

        idx = self._put(
            np.concatenate(
                [np.arange(self.num_inserted, self.num_inserted + n),
                 np.full(B - n, self.num_inserted + n - 1)]
            ).astype(np.int32)
        )
        ins = {
            "intrinsics": self._put(pad_k(packet["camera_intrinsics"])),
            "c2w": self._put(pad_k(packet["camera_extrinsics"])),
            "color": self._put(pad_k(packet["frames_color_float"])),
        }
        if "frames_depth" in packet:
            ins["depth"] = self._put(pad_k(packet["frames_depth"]))
        if "frames_normal" in packet:
            ins["normal"] = self._put(pad_k(packet["frames_normal"]))
        if "frames_depth_cov" in packet:
            ins["depth_cov"] = self._put(pad_k(packet["frames_depth_cov"]))
        self.buffer = kb.insert(self.buffer, idx, ins)
        self.num_inserted += n
        self.last_received = 0

    # -- training -------------------------------------------------------

    def can_train(self) -> bool:
        if self.step_count >= self.mapping_iterations:
            return False
        if self.num_inserted == 0:
            return False
        if not self.stream_active:
            return True
        # pacing rule (reference mapping_module.py:36-47): at most
        # mapping_iterations/num_keyframes consecutive train steps between
        # keyframe packets (the counter resets on every insert)
        budget = self.mapping_iterations / max(self.num_keyframes, 1)
        return self.last_received < budget

    def train_step(self) -> Optional[Dict[str, float]]:
        if not self.can_train():
            return None
        self._key, sub = jax.random.split(self._key)
        self.state, metrics = self.trainer.train_step(
            self.state, self.buffer, sub
        )
        self.step_count += 1
        self.last_received += 1
        if (
            self.preview_every
            and self.step_count % self.preview_every == 0
            and self.num_inserted > 0
        ):
            self._dump_preview()
        if (
            self.viewer is not None
            and self.step_count % self.viewer_every == 0
            and self.num_inserted > 0
        ):
            self._push_viewer(metrics)
        return metrics

    def _push_viewer(self, metrics) -> None:
        import cv2

        H, W = self.buffer.hw
        vw = min(self.viewer_width, W)
        scale = vw / W
        vh = max(int(round(H * scale)), 1)
        intr = self.buffer.intrinsics[0] * scale
        poses = np.asarray(
            self.trainer.optimized_c2w(self.state, self.buffer)
        )[: self.num_inserted]
        cam = self.viewer.requested_camera()
        c2w = jnp.asarray(
            cam if cam is not None else poses[self.num_inserted - 1]
        )
        out = self.trainer.render_image(self.state, c2w, intr, vh, vw)
        rgb = np.clip(np.asarray(out["rgb"]) * 255, 0, 255).astype(np.uint8)
        depth = np.asarray(out["depth"])
        dnorm = np.clip(
            depth / max(float(depth.max()), 1e-6) * 255, 0, 255
        ).astype(np.uint8)
        _, rgb_jpg = cv2.imencode(".jpg", cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR))
        _, d_jpg = cv2.imencode(".jpg", dnorm)
        stats = {"step": float(self.step_count)}
        for k in ("loss", "psnr"):
            if k in metrics:
                stats[k] = float(metrics[k])
        self.viewer.publish(rgb_jpg.tobytes(), d_jpg.tobytes(), stats, poses)

    def _dump_preview(self) -> None:
        import cv2

        os.makedirs(self.preview_dir, exist_ok=True)
        H, W = self.buffer.hw
        out = self.trainer.render_image(
            self.state,
            self.trainer.optimized_c2w(self.state, self.buffer)[0],
            self.buffer.intrinsics[0], H, W,
        )
        rgb = np.clip(np.asarray(out["rgb"]) * 255, 0, 255).astype(np.uint8)
        depth = np.asarray(out["depth"])
        dnorm = np.clip(depth / max(depth.max(), 1e-6) * 255, 0, 255).astype(
            np.uint8
        )
        cv2.imwrite(
            os.path.join(self.preview_dir, f"rgb_{self.step_count:06d}.jpg"),
            cv2.cvtColor(rgb, cv2.COLOR_RGB2BGR),
        )
        cv2.imwrite(
            os.path.join(self.preview_dir,
                         f"depth_{self.step_count:06d}.png"), dnorm,
        )

    def finish(self) -> None:
        """Train to completion after the stream ends
        (reference mapping_module.py:49-52)."""
        self.stream_active = False
        while self.step_count < self.mapping_iterations and self.num_inserted:
            m = self.train_step()
            if m is not None and self.step_count % 512 == 0:
                self.metrics_history.append(
                    {k: float(v) for k, v in m.items()}
                )

    # -- artifacts ------------------------------------------------------

    def restore_snapshot(self, path: str) -> None:
        """Mid-run resume: restore the FULL train state (params, pose deltas,
        both optimizer states, step) — goes beyond the reference, whose
        snapshots only support post-hoc evaluation (SURVEY.md §5.4)."""
        import flax.serialization

        with open(path, "rb") as f:
            blob = f.read()
        target = flax.serialization.to_state_dict(self.state)
        restored = flax.serialization.from_bytes(target, blob)
        self.state = flax.serialization.from_state_dict(self.state, restored)
        self.step_count = int(self.state.step)

    def save_snapshot(self, dir_prediction: str) -> None:
        import flax.serialization

        snap_dir = os.path.join(dir_prediction, "snapshots")
        os.makedirs(snap_dir, exist_ok=True)
        # full resumable train state (params + pose deltas + optimizer states)
        blob = flax.serialization.to_bytes(self.state)
        with open(
            os.path.join(snap_dir,
                         f"trainstate{self.step_count:06d}.msgpack"), "wb",
        ) as f:
            f.write(blob)
        # lightweight eval snapshot (matches load_snapshot_renderer)
        blob = flax.serialization.to_bytes(
            {"params": self.state.params,
             "pose_deltas": self.state.pose_deltas,
             "step": self.state.step}
        )
        path = os.path.join(snap_dir, f"snapshot{self.step_count:06d}.msgpack")
        with open(path, "wb") as f:
            f.write(blob)
        # training-set dump (reference dataset.pt, nerfstudio_utils.py:230-241)
        np.savez_compressed(
            os.path.join(dir_prediction, "dataset.npz"),
            intrinsics=np.asarray(self.buffer.intrinsics),
            c2w=np.asarray(self.buffer.c2w),
            num_active=int(self.buffer.num_active),
        )
        # optimized keyframe poses (matrices_origin2frame_training.json)
        mats = np.asarray(
            self.trainer.optimized_c2w(self.state, self.buffer)
        )[: self.num_inserted]
        os.makedirs(os.path.join(dir_prediction, "matrices"), exist_ok=True)
        with open(
            os.path.join(dir_prediction, "matrices",
                         "matrices_origin2frame_training.json"), "w",
        ) as f:
            json.dump({str(i): m.tolist() for i, m in enumerate(mats)}, f)
