"""NeRF render adapter for evaluation.

Replaces the reference's ``NeRFRenderer`` hierarchy
(evaluation/nerf_renderer.py:35-344): exposes frame rendering at arbitrary
poses, optimized keyframe extrinsics, and density-field meshing, over either
a live MappingStage or a saved snapshot.

Frame conventions: all public methods speak the PREDICTION frame — OpenCV
cam2world in the tracker's world (the convention of
``matrices_origin2frame_keyframes_tracking.json``). Internally poses map
into the mapper's gauge-normalized OpenGL world via the keyframe buffer's
normalization matrix + the basis flip (core/conventions.py), composing the
camera-optimizer SE3 deltas like the reference does
(evaluation/nerf_renderer.py:109-123).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nerf_vo_tpu.core import conventions, lie


class MapRenderer:
    def __init__(self, mapping_stage, mesh=None):
        """``mesh``: optional jax.sharding.Mesh — eval renders then shard
        their rays data-parallel over it (parallel/sharding.py
        make_dp_render_chunk); None = single device."""
        self.mapping = mapping_stage
        self.trainer = mapping_stage.trainer
        self.state = mapping_stage.state
        self.buffer = mapping_stage.buffer
        self._norm = np.asarray(self.buffer.normalization)
        self._norm_inv = np.linalg.inv(self._norm)
        self._chunk_fn = None
        if mesh is not None:
            from nerf_vo_tpu.parallel.sharding import make_dp_render_chunk

            self._chunk_fn = make_dp_render_chunk(self.trainer, mesh)

    # -- pose plumbing ---------------------------------------------------

    def _pred_cv_to_map_gl(self, c2w_cv: np.ndarray) -> np.ndarray:
        gl = np.asarray(
            conventions.opencv_to_opengl(jnp.asarray(c2w_cv, jnp.float32))
        )
        return self._norm @ gl

    def _map_gl_to_pred_cv(self, c2w_gl: np.ndarray) -> np.ndarray:
        cv = self._norm_inv @ c2w_gl
        return np.asarray(
            conventions.opengl_to_opencv(jnp.asarray(cv, jnp.float32))
        )

    def get_camera_extrinsics(self, frame_index: int) -> np.ndarray:
        """Optimized keyframe pose in the prediction frame (OpenCV c2w)."""
        opt = np.asarray(
            self.trainer.optimized_c2w(self.state, self.buffer)[frame_index]
        )
        return self._map_gl_to_pred_cv(opt)

    # -- rendering -------------------------------------------------------

    def _render(self, camera_intrinsics: Dict, c2w_gl: np.ndarray):
        H = camera_intrinsics["height"]
        W = camera_intrinsics["width"]
        intr = jnp.asarray(
            [camera_intrinsics["fx"], camera_intrinsics["fy"],
             camera_intrinsics["cx"], camera_intrinsics["cy"]], jnp.float32,
        )
        out = self.trainer.render_image(
            self.state, jnp.asarray(c2w_gl, jnp.float32), intr, H, W,
            chunk_fn=self._chunk_fn,
        )
        return out

    def render_frame(self, camera_intrinsics: Dict,
                     camera_extrinsics: np.ndarray):
        """(color uint8 [H, W, 3], z-depth f32 [H, W]) at a pred-frame pose."""
        gl = self._pred_cv_to_map_gl(camera_extrinsics)
        out = self._render(camera_intrinsics, gl)
        color = np.asarray(
            np.clip(np.asarray(out["rgb"]) * 255.0, 0, 255), np.uint8
        )
        return color, np.asarray(out["depth"])

    def render_frame_depth_from_training_frame(self, camera_intrinsics: Dict,
                                               frame_index: int) -> np.ndarray:
        """Depth render at an optimized TRAINING pose (reference
        renderer.py:79-111 uses these for the pred->GT scale)."""
        opt = np.asarray(
            self.trainer.optimized_c2w(self.state, self.buffer)[frame_index]
        )
        out = self._render(camera_intrinsics, opt)
        return np.asarray(out["depth"])

    # -- meshing ---------------------------------------------------------

    def render_mesh(self, file_mesh: str, resolution, lower_bound,
                    upper_bound, density_threshold: float = 15.0,
                    chunk: int = 1 << 18) -> None:
        """Isosurface of the density field over a pred-frame AABB
        (replaces marching-cubes mesh export, nerf_renderer.py:170-209).

        The AABB is given in the prediction frame; grid points map through
        the same pose plumbing before density evaluation.
        """
        from nerf_vo_tpu.evaluation import meshio, tsdf

        res = np.clip(np.asarray(resolution, int), 8, 512)
        lo = np.asarray(lower_bound, np.float32)
        hi = np.asarray(upper_bound, np.float32)
        xs = [np.linspace(lo[d], hi[d], int(res[d])) for d in range(3)]
        grid = np.stack(np.meshgrid(*xs, indexing="ij"), -1).reshape(-1, 3)
        # pred(OpenCV world) -> map world: same world-frame transform as
        # poses; points transform by N directly (flip is camera-basis only)
        gridh = np.concatenate([grid, np.ones((len(grid), 1))], -1)
        grid_map = (self._norm @ gridh.T).T[:, :3].astype(np.float32)

        model = self.mapping.model
        params = self.state.params

        @jax.jit
        def density_fn(pts):
            d, _ = model.field.apply(
                {"params": params["field"]}, pts, method=model.field.density
            )
            return d

        out = []
        n = len(grid_map)
        pad = (-n) % chunk
        gm = np.pad(grid_map, ((0, pad), (0, 0)))
        for i in range(0, n + pad, chunk):
            out.append(np.asarray(density_fn(jnp.asarray(gm[i:i + chunk]))))
        density = np.concatenate(out)[:n].reshape(tuple(int(r) for r in res))

        sdf = density_threshold - density  # negative inside
        verts, faces, _ = tsdf.extract_mesh(
            np.clip(sdf / max(density_threshold, 1e-3), -1, 1), None,
            lo, 1.0, None,
        )
        if len(verts):
            # extraction assumed unit voxels at `lo`; rescale per-axis
            scale = (hi - lo) / np.maximum(res - 1, 1)
            verts = (verts - lo) * scale + lo
        meshio.write_ply(file_mesh, verts, faces)


def load_snapshot_renderer(dir_prediction: str, mapping_stage):
    """Rebuild a MapRenderer from the latest snapshot file
    (reference eval_load_checkpoint path, nerf_renderer.py:211-218)."""
    import flax.serialization

    snaps = sorted(
        os.path.join(dir_prediction, "snapshots", f)
        for f in os.listdir(os.path.join(dir_prediction, "snapshots"))
        if f.startswith("snapshot")
    )
    with open(snaps[-1], "rb") as f:
        blob = f.read()
    target = {
        "params": mapping_stage.state.params,
        "pose_deltas": mapping_stage.state.pose_deltas,
        "step": mapping_stage.state.step,
    }
    restored = flax.serialization.from_bytes(target, blob)
    mapping_stage.state = mapping_stage.state.replace(
        params=restored["params"], pose_deltas=restored["pose_deltas"]
    )
    return MapRenderer(mapping_stage)
