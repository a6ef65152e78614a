"""Dense depth/normal prior inference (Omnidata DPT models).

Replaces the reference's ``OmnidataEstimator``
(nerf_vo/enhancement/omnidata_estimator.py): two DPT ViT-hybrid networks —
depth (1ch, input Normalize(0.5, 0.5)) and normals (3ch, unnormalized input)
— run at a fixed 384x384, outputs clamped to [0, 1] and resized back to frame
resolution.

TPU delta: the reference loops batch-size-1 per keyframe
(omnidata_estimator.py:91-106); here all K keyframes of a packet run as ONE
batched XLA program (bf16 on the MXU).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from nerf_vo_tpu.models.dpt import DPTHybrid


class OmnidataEstimator:
    def __init__(self, depth_params=None, normal_params=None,
                 use_normals: bool = True, image_size: int = 384,
                 seed: int = 0, depth_layers: int = 12):
        import os

        self.image_size = image_size
        self.use_normals = use_normals
        hooks = (
            (8, 11) if depth_layers == 12
            else (max(depth_layers - 2, 0), depth_layers - 1)
        )
        self.depth_model = DPTHybrid(num_channels=1, image_size=image_size,
                                     depth_layers=depth_layers, hooks=hooks)
        self.normal_model = DPTHybrid(num_channels=3, image_size=image_size,
                                      depth_layers=depth_layers, hooks=hooks)
        if depth_params is None:
            ckpt = os.environ.get("NERF_VO_OMNIDATA_DEPTH_WEIGHTS")
            if ckpt:
                from nerf_vo_tpu.models.dpt import load_torch_weights

                depth_params = load_torch_weights(ckpt, 1)["params"]
        if normal_params is None and use_normals:
            ckpt = os.environ.get("NERF_VO_OMNIDATA_NORMAL_WEIGHTS")
            if ckpt:
                from nerf_vo_tpu.models.dpt import load_torch_weights

                normal_params = load_torch_weights(ckpt, 3)["params"]
        if depth_params is None:
            depth_params = self._random_init(jax.random.PRNGKey(seed),
                                             self.depth_model)
        if normal_params is None and use_normals:
            normal_params = self._random_init(jax.random.PRNGKey(seed + 1),
                                              self.normal_model)
        self.depth_params = {"params": depth_params}
        self.normal_params = (
            {"params": normal_params} if use_normals else None
        )
        self._infer = jax.jit(self._infer_impl, static_argnames=("hw",))

    def _random_init(self, key, model):
        s = self.image_size
        return model.init(key, jnp.zeros((1, s, s, 3)))["params"]

    def _infer_impl(self, depth_params, normal_params, frames, hw):
        """frames: [K, H, W, 3] float in [0, 1]. Returns (depth [K,H,W],
        normal [K,H,W,3] in [0,1]) at the original resolution."""
        K, H, W, _ = frames.shape
        s = self.image_size
        # cubic resize to mirror the reference's bicubic interpolate
        # (omnidata_estimator.py:79-83; jax uses Keys a=-0.5 vs torch -0.75)
        x = jax.image.resize(frames, (K, s, s, 3), "cubic")
        d_in = (x - 0.5) / 0.5  # depth model: Normalize(0.5, 0.5)
        depth = self.depth_model.apply(depth_params, d_in)[..., 0]
        depth = jax.image.resize(depth, (K,) + hw, "cubic")
        if normal_params is not None:
            normal = self.normal_model.apply(normal_params, x)
            normal = jax.image.resize(normal, (K,) + hw + (3,), "cubic")
        else:
            normal = jnp.zeros((K,) + hw + (3,))
        return jnp.clip(depth, 0.0, 1.0), jnp.clip(normal, 0.0, 1.0)

    def __call__(self, frames) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        """frames: [K, H, W, 3] float32 in [0, 1]."""
        hw = (frames.shape[1], frames.shape[2])
        depth, normal = self._infer(
            self.depth_params, self.normal_params, frames, hw
        )
        return depth, (normal if self.use_normals else None)
