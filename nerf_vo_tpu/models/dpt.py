"""DPT (Dense Prediction Transformer) ViT-hybrid depth/normal networks, Flax.

TPU-native replacement for the Omnidata submodule's ``DPTDepthModel`` with
``backbone='vitb_rn50_384'`` (reference N8; consumed by
nerf_vo/enhancement/omnidata_estimator.py:32-37,56-71). The module topology
mirrors the upstream stack exactly so ``convert_torch_checkpoint`` can load
the real ``omnidata_dpt_{depth,normal}_v2.ckpt`` files:

  * backbone = timm ``vit_base_resnet50_384``: a ResNetV2 stem —
    weight-standardized convs (eps 1e-8) + GroupNorm(32)+ReLU, TF-SAME
    padding, stages (3, 4, 9) blocks with widths 256/512/1024 — feeding a
    1x1 patch-embed projection to 768-d tokens, cls token + pos embed
    (24x24 grid at 384), 12 pre-norm transformer blocks (fused qkv,
    12 heads, GELU MLP x4).
  * DPT decoder: taps at ResNet stage 0 (1/4, 256ch), stage 1 (1/8,
    512ch), transformer blocks 8 and 11; project-readout (cat cls ->
    Linear(1536, 768) -> GELU) on the transformer taps;
    ``act_postprocess3`` (1x1 conv) and ``act_postprocess4`` (1x1 conv +
    3x3 stride-2 conv); ``scratch.layerN_rn`` 3x3 no-bias projections to
    256; four FeatureFusion blocks (residual conv units, x2 bilinear
    upsampling with align_corners=True, 1x1 out conv); output head
    (256 -> 128 conv, x2 upsample, 128 -> 32 conv, ReLU, 32 -> C conv).

Depth = 1 channel (input Normalize(0.5, 0.5)), normals = 3 channels (raw
[0, 1] input); outputs clamped to [0, 1] by the caller (the reference
clamps outside the model, omnidata_estimator.py:99).

All convs NHWC; inference runs bf16 on the MXU by default (``dtype``);
the converter round-trip test runs f32 for exact comparison.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class StdConv(nn.Module):
    """Weight-standardized conv (timm StdConv2dSame): kernel standardized
    per output channel over (kh, kw, in) with biased variance, eps 1e-8;
    TF-SAME padding."""

    features: int
    kernel: Tuple[int, int]
    strides: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel
        cin = x.shape[-1]
        w = self.param(
            "kernel", nn.initializers.lecun_normal(), (kh, kw, cin,
                                                       self.features),
        )
        mean = w.mean((0, 1, 2), keepdims=True)
        var = w.var((0, 1, 2), keepdims=True)  # biased, matching F.batch_norm
        w = (w - mean) / jnp.sqrt(var + 1e-8)
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), w.astype(self.dtype),
            window_strides=(self.strides, self.strides),
            padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class GNAct(nn.Module):
    """GroupNorm(32) + optional ReLU (timm GroupNormAct)."""

    act: bool = True
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=self.dtype)(x)
        return nn.relu(x) if self.act else x


class BottleneckV2(nn.Module):
    """timm ResNetV2 (non-preact) Bottleneck: conv1x1-GN-relu,
    conv3x3(stride)-GN-relu, conv1x1-GN, + shortcut, relu."""

    mid: int
    out: int
    stride: int = 1
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        shortcut = x
        if self.stride != 1 or x.shape[-1] != self.out:
            shortcut = StdConv(self.out, (1, 1), self.stride,
                               dtype=self.dtype, name="down_conv")(x)
            shortcut = GNAct(act=False, dtype=self.dtype,
                             name="down_norm")(shortcut)
        y = StdConv(self.mid, (1, 1), dtype=self.dtype, name="conv1")(x)
        y = GNAct(dtype=self.dtype, name="norm1")(y)
        y = StdConv(self.mid, (3, 3), self.stride, dtype=self.dtype,
                    name="conv2")(y)
        y = GNAct(dtype=self.dtype, name="norm2")(y)
        y = StdConv(self.out, (1, 1), dtype=self.dtype, name="conv3")(y)
        y = GNAct(act=False, dtype=self.dtype, name="norm3")(y)
        return nn.relu(y + shortcut)


class ResNetV2Stem(nn.Module):
    """Stem + stages (3, 4, 9) with taps after stage 0 (1/4, 256) and
    stage 1 (1/8, 512); final output 1/16, 1024."""

    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        x = StdConv(64, (7, 7), 2, dtype=self.dtype, name="stem_conv")(x)
        x = GNAct(dtype=self.dtype, name="stem_norm")(x)
        # TF-SAME maxpool (pads -inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        widths = ((64, 256), (128, 512), (256, 1024))
        blocks = (3, 4, 9)
        taps = []
        for s, (mid, out) in enumerate(widths):
            for b in range(blocks[s]):
                x = BottleneckV2(
                    mid, out, stride=2 if (b == 0 and s > 0) else 1,
                    dtype=self.dtype, name=f"stage{s}_block{b}",
                )(x)
            if s < 2:
                taps.append(x)
        return taps[0], taps[1], x


class Attention(nn.Module):
    """timm ViT attention: fused qkv Linear, 12 heads, scaled dot product."""

    dim: int = 768
    heads: int = 12
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        B, N, D = x.shape
        hd = self.dim // self.heads
        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, self.heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B, N, h, hd]
        att = jnp.einsum("bnhd,bmhd->bhnm", q, k) / jnp.sqrt(
            jnp.asarray(hd, self.dtype)
        )
        att = jax.nn.softmax(att, axis=-1)
        y = jnp.einsum("bhnm,bmhd->bnhd", att, v).reshape(B, N, self.dim)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(y)


class TransformerBlock(nn.Module):
    dim: int = 768
    heads: int = 12
    mlp_ratio: int = 4
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        x = x + Attention(self.dim, self.heads, dtype=self.dtype,
                          name="attn")(h)
        h = nn.LayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(self.dim * self.mlp_ratio, dtype=self.dtype,
                     name="fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, dtype=self.dtype, name="fc2")(h)
        return x + h


def _interp_matrix(n_in: int, n_out: int, dtype):
    """1D bilinear interpolation matrix with align_corners=True."""
    if n_in == n_out:
        return jnp.eye(n_in, dtype=dtype)
    pos = jnp.arange(n_out, dtype=jnp.float32) * (
        (n_in - 1) / (n_out - 1) if n_out > 1 else 0.0
    )
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, max(n_in - 2, 0))
    w = pos - lo
    rows = jnp.arange(n_out)
    M = jnp.zeros((n_out, n_in), jnp.float32)
    M = M.at[rows, lo].add(1.0 - w).at[rows, jnp.minimum(lo + 1, n_in - 1)
                                       ].add(w)
    return M.astype(dtype)


def resize_align_corners(x, h2: int, w2: int):
    """[B, H, W, C] bilinear resize with align_corners=True (torch
    F.interpolate(..., align_corners=True)) as two small matmuls."""
    B, H, W, C = x.shape
    Mh = _interp_matrix(H, h2, x.dtype)
    Mw = _interp_matrix(W, w2, x.dtype)
    x = jnp.einsum("oh,bhwc->bowc", Mh, x)
    return jnp.einsum("pw,bowc->bopc", Mw, x)


class ResidualConvUnit(nn.Module):
    """DPT ResidualConvUnit_custom (bn=False): x + conv(relu(conv(relu(x))))."""

    features: int = 256
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(nn.relu(x))
        h = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(nn.relu(h))
        return x + h


class FeatureFusion(nn.Module):
    """DPT FeatureFusionBlock_custom: (+ rcu1(skip)), rcu2, x2 upsample
    (align_corners=True), 1x1 out conv."""

    features: int = 256
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, skip=None):
        if skip is not None:
            x = x + ResidualConvUnit(self.features, dtype=self.dtype,
                                     name="rcu1")(skip)
        x = ResidualConvUnit(self.features, dtype=self.dtype, name="rcu2")(x)
        B, H, W, C = x.shape
        x = resize_align_corners(x, H * 2, W * 2)
        return nn.Conv(self.features, (1, 1), dtype=self.dtype,
                       name="out_conv")(x)


class ProjectReadout(nn.Module):
    """DPT 'project' readout: cat(spatial tokens, broadcast cls) ->
    Linear(2*dim, dim) -> GELU."""

    dim: int = 768
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, tokens):
        cls = jnp.broadcast_to(tokens[:, :1], tokens[:, 1:].shape)
        x = jnp.concatenate([tokens[:, 1:], cls], -1)
        x = nn.Dense(self.dim, dtype=self.dtype, name="project")(x)
        return nn.gelu(x, approximate=False)


class DPTHybrid(nn.Module):
    """ViT-hybrid DPT: depth (1ch) or normals (3ch) at input resolution."""

    num_channels: int = 1
    dim: int = 768
    depth_layers: int = 12
    hooks: Tuple[int, int] = (8, 11)
    features: int = 256
    image_size: int = 384
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, images):
        """images: [B, 384, 384, 3], normalized. -> [B, 384, 384, C]."""
        DT = self.dtype
        B, H, W, _ = images.shape
        g = self.image_size // 16

        skip1, skip2, x = ResNetV2Stem(dtype=DT, name="stem")(
            images.astype(DT)
        )
        hg, wg = x.shape[1], x.shape[2]
        tokens = nn.Conv(self.dim, (1, 1), dtype=DT, name="patch_embed")(x)
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
            tokens = TransformerBlock(self.dim, dtype=DT,
                                      name=f"block_{i}")(tokens)
            if i in self.hooks:
                taps.append(tokens)

        # readout + act_postprocess on the transformer taps
        t3 = ProjectReadout(self.dim, dtype=DT, name="readout3")(taps[0])
        t3 = t3.reshape(B, hg, wg, self.dim)
        t3 = nn.Conv(self.dim, (1, 1), dtype=DT, name="post3_conv")(t3)
        t4 = ProjectReadout(self.dim, dtype=DT, name="readout4")(taps[1])
        t4 = t4.reshape(B, hg, wg, self.dim)
        t4 = nn.Conv(self.dim, (1, 1), dtype=DT, name="post4_conv")(t4)
        t4 = nn.Conv(self.dim, (3, 3), strides=2, padding=1, dtype=DT,
                     name="post4_down")(t4)

        # scratch.layerN_rn 3x3 no-bias projections to the fusion width
        r1 = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                     dtype=DT, name="layer1_rn")(skip1)
        r2 = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                     dtype=DT, name="layer2_rn")(skip2)
        r3 = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                     dtype=DT, name="layer3_rn")(t3)
        r4 = nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                     dtype=DT, name="layer4_rn")(t4)

        f4 = FeatureFusion(self.features, dtype=DT, name="refinenet4")(r4)
        f3 = FeatureFusion(self.features, dtype=DT, name="refinenet3")(f4, r3)
        f2 = FeatureFusion(self.features, dtype=DT, name="refinenet2")(f3, r2)
        f1 = FeatureFusion(self.features, dtype=DT, name="refinenet1")(f2, r1)

        h = nn.Conv(self.features // 2, (3, 3), padding=1, dtype=DT,
                    name="head_c1")(f1)
        h = resize_align_corners(h, H, W)
        h = nn.relu(nn.Conv(32, (3, 3), padding=1, dtype=DT,
                            name="head_c2")(h))
        out = nn.Conv(self.num_channels, (3, 3), padding=1, dtype=DT,
                      name="head_out")(h)
        # DPTDepthModel applies ReLU (non_negative); caller clamps to [0,1]
        return nn.relu(out.astype(jnp.float32))


# --------------------------------------------------------------------------
# omnidata_dpt_*.ckpt conversion
# --------------------------------------------------------------------------

def _np(v):
    import numpy as np

    return np.asarray(v)


def _conv_w(sd, key):
    import numpy as np

    return np.transpose(_np(sd[key]), (2, 3, 1, 0))


def _conv_kb(sd, prefix, bias=True):
    out = {"kernel": _conv_w(sd, prefix + ".weight")}
    if bias:
        out["bias"] = _np(sd[prefix + ".bias"])
    return out


def _lin(sd, prefix):
    return {"kernel": _np(sd[prefix + ".weight"]).T,
            "bias": _np(sd[prefix + ".bias"])}


def _gn(sd, prefix):
    return {"GroupNorm_0": {"scale": _np(sd[prefix + ".weight"]),
                            "bias": _np(sd[prefix + ".bias"])}}


def _ln(sd, prefix):
    return {"scale": _np(sd[prefix + ".weight"]),
            "bias": _np(sd[prefix + ".bias"])}


def _bottleneck(sd, prefix):
    out = {
        "conv1": {"kernel": _conv_w(sd, prefix + ".conv1.weight")},
        "norm1": _gn(sd, prefix + ".norm1"),
        "conv2": {"kernel": _conv_w(sd, prefix + ".conv2.weight")},
        "norm2": _gn(sd, prefix + ".norm2"),
        "conv3": {"kernel": _conv_w(sd, prefix + ".conv3.weight")},
        "norm3": _gn(sd, prefix + ".norm3"),
    }
    if prefix + ".downsample.conv.weight" in sd:
        out["down_conv"] = {
            "kernel": _conv_w(sd, prefix + ".downsample.conv.weight")
        }
        out["down_norm"] = _gn(sd, prefix + ".downsample.norm")
    return out


def _rcu(sd, prefix):
    return {"conv1": _conv_kb(sd, prefix + ".conv1"),
            "conv2": _conv_kb(sd, prefix + ".conv2")}


def _fusion(sd, prefix):
    return {
        "rcu1": _rcu(sd, prefix + ".resConfUnit1"),
        "rcu2": _rcu(sd, prefix + ".resConfUnit2"),
        "out_conv": _conv_kb(sd, prefix + ".out_conv"),
    }


def convert_torch_checkpoint(state_dict: Dict[str, Any],
                             num_channels: int) -> Dict[str, Any]:
    """Map an Omnidata ``DPTDepthModel`` torch state dict onto DPTHybrid.

    Accepts the raw upstream layout: ``pretrained.model.*`` (timm
    vit_base_resnet50_384 hybrid), ``pretrained.act_postprocess{3,4}.*``,
    ``scratch.*``. An optional leading ``model.`` prefix (the Omnidata
    Lightning dump, stripped by the reference at
    omnidata_estimator.py:63-67) is removed here too. Conv kernels
    transpose OIHW -> HWIO, linear weights transpose, GroupNorm/LayerNorm
    affine maps to scale/bias. ``num_channels`` must match the checkpoint
    (1 depth / 3 normals) — shape-checked on the head conv.
    """
    sd = {}
    for k, v in state_dict.items():
        if k.startswith("model."):
            k = k[6:]
        sd[k] = v

    bb = "pretrained.model.patch_embed.backbone"
    stem = {
        "stem_conv": {"kernel": _conv_w(sd, bb + ".stem.conv.weight")},
        "stem_norm": _gn(sd, bb + ".stem.norm"),
    }
    for s, nblocks in enumerate((3, 4, 9)):
        for b in range(nblocks):
            stem[f"stage{s}_block{b}"] = _bottleneck(
                sd, f"{bb}.stages.{s}.blocks.{b}"
            )

    params: Dict[str, Any] = {"stem": stem}
    params["patch_embed"] = _conv_kb(sd, "pretrained.model.patch_embed.proj")
    params["cls_token"] = _np(sd["pretrained.model.cls_token"])
    params["pos_embed"] = _np(sd["pretrained.model.pos_embed"])

    for i in range(12):
        p = f"pretrained.model.blocks.{i}"
        params[f"block_{i}"] = {
            "norm1": _ln(sd, p + ".norm1"),
            "attn": {"qkv": _lin(sd, p + ".attn.qkv"),
                     "proj": _lin(sd, p + ".attn.proj")},
            "norm2": _ln(sd, p + ".norm2"),
            "fc1": _lin(sd, p + ".mlp.fc1"),
            "fc2": _lin(sd, p + ".mlp.fc2"),
        }

    params["readout3"] = {
        "project": _lin(sd, "pretrained.act_postprocess3.0.project.0")
    }
    params["post3_conv"] = _conv_kb(sd, "pretrained.act_postprocess3.3")
    params["readout4"] = {
        "project": _lin(sd, "pretrained.act_postprocess4.0.project.0")
    }
    params["post4_conv"] = _conv_kb(sd, "pretrained.act_postprocess4.3")
    params["post4_down"] = _conv_kb(sd, "pretrained.act_postprocess4.4")

    for n in range(1, 5):
        params[f"layer{n}_rn"] = _conv_kb(sd, f"scratch.layer{n}_rn",
                                          bias=False)
        params[f"refinenet{n}"] = _fusion(sd, f"scratch.refinenet{n}")

    head_out = _conv_kb(sd, "scratch.output_conv.4")
    assert head_out["kernel"].shape[-1] == num_channels, (
        f"checkpoint head has {head_out['kernel'].shape[-1]} channels, "
        f"model expects {num_channels}"
    )
    params["head_c1"] = _conv_kb(sd, "scratch.output_conv.0")
    params["head_c2"] = _conv_kb(sd, "scratch.output_conv.2")
    params["head_out"] = head_out
    return {"params": params}


def load_torch_weights(path: str, num_channels: int) -> Dict[str, Any]:
    """Load + convert an Omnidata checkpoint from disk (env hooks
    ``NERF_VO_OMNIDATA_DEPTH_WEIGHTS`` / ``NERF_VO_OMNIDATA_NORMAL_WEIGHTS``
    in runtime/stages.py)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(ckpt, dict) and "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    return convert_torch_checkpoint(ckpt, num_channels)
