"""Round-trip validation of the Omnidata DPT weight converter.

Builds a torch implementation of the upstream stack — timm
vit_base_resnet50_384 hybrid backbone (weight-standardized convs,
GroupNorm, TF-SAME padding, ResNetV2 stages (3,4,9)) + the DPT decoder
(project readout, act_postprocess, scratch refinenets, output head) —
with the exact checkpoint key layout, randomizes it, converts with
``convert_torch_checkpoint``, and asserts the Flax forward matches.

Runs at a reduced 96x96 image size (the modules are size-agnostic; only
pos_embed depends on the grid, and the converter passes it through).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from nerf_vo_tpu.models.dpt import (  # noqa: E402
    DPTHybrid,
    convert_torch_checkpoint,
)

S = 96  # test image size (384 in production; grid = S/16)


def _pad_same(x, k, s):
    ih, iw = x.shape[-2:]
    ph = max((-(-ih // s) - 1) * s + k - ih, 0)
    pw = max((-(-iw // s) - 1) * s + k - iw, 0)
    return F.pad(x, (pw // 2, pw - pw // 2, ph // 2, ph - ph // 2))


class TStdConv(tnn.Conv2d):
    """timm StdConv2dSame: standardized weights + TF-SAME padding."""

    def __init__(self, cin, cout, k, stride=1):
        super().__init__(cin, cout, k, stride=stride, bias=False)

    def forward(self, x):
        w = self.weight
        v, m = torch.var_mean(w, dim=[1, 2, 3], keepdim=True,
                              unbiased=False)
        w = (w - m) / torch.sqrt(v + 1e-8)
        x = _pad_same(x, self.kernel_size[0], self.stride[0])
        return F.conv2d(x, w, None, self.stride, 0)


class TGNAct(tnn.GroupNorm):
    def __init__(self, ch, act=True):
        super().__init__(32, ch)
        self.act = act

    def forward(self, x):
        x = super().forward(x)
        return F.relu(x) if self.act else x


class TBottleneck(tnn.Module):
    def __init__(self, cin, mid, cout, stride=1):
        super().__init__()
        if stride != 1 or cin != cout:
            self.downsample = tnn.Module()
            self.downsample.conv = TStdConv(cin, cout, 1, stride)
            self.downsample.norm = TGNAct(cout, act=False)
        else:
            self.downsample = None
        self.conv1 = TStdConv(cin, mid, 1)
        self.norm1 = TGNAct(mid)
        self.conv2 = TStdConv(mid, mid, 3, stride)
        self.norm2 = TGNAct(mid)
        self.conv3 = TStdConv(mid, cout, 1)
        self.norm3 = TGNAct(cout, act=False)

    def forward(self, x):
        shortcut = x
        if self.downsample is not None:
            shortcut = self.downsample.norm(self.downsample.conv(x))
        x = self.norm1(self.conv1(x))
        x = self.norm2(self.conv2(x))
        x = self.norm3(self.conv3(x))
        return F.relu(x + shortcut)


class TStage(tnn.Module):
    def __init__(self, cin, mid, cout, n, stride):
        super().__init__()
        blocks = [TBottleneck(cin, mid, cout, stride)]
        blocks += [TBottleneck(cout, mid, cout, 1) for _ in range(n - 1)]
        self.blocks = tnn.Sequential(*blocks)

    def forward(self, x):
        return self.blocks(x)


class TBackbone(tnn.Module):
    def __init__(self):
        super().__init__()
        self.stem = tnn.Module()
        self.stem.conv = TStdConv(3, 64, 7, 2)
        self.stem.norm = TGNAct(64)
        self.stages = tnn.ModuleList([
            TStage(64, 64, 256, 3, 1),
            TStage(256, 128, 512, 4, 2),
            TStage(512, 256, 1024, 9, 2),
        ])

    def forward(self, x):
        x = self.stem.norm(self.stem.conv(x))
        x = F.max_pool2d(_pad_same(x, 3, 2).clamp(min=-1e30), 3, 2)
        taps = []
        for i, st in enumerate(self.stages):
            x = st(x)
            if i < 2:
                taps.append(x)
        return taps[0], taps[1], x


class TAttention(tnn.Module):
    def __init__(self, dim=768, heads=12):
        super().__init__()
        self.heads = heads
        self.qkv = tnn.Linear(dim, dim * 3)
        self.proj = tnn.Linear(dim, dim)

    def forward(self, x):
        B, N, D = x.shape
        hd = D // self.heads
        qkv = self.qkv(x).reshape(B, N, 3, self.heads, hd)
        q, k, v = qkv.permute(2, 0, 3, 1, 4)
        att = (q @ k.transpose(-2, -1)) * hd ** -0.5
        att = att.softmax(dim=-1)
        y = (att @ v).transpose(1, 2).reshape(B, N, D)
        return self.proj(y)


class TMlp(tnn.Module):
    def __init__(self, dim=768):
        super().__init__()
        self.fc1 = tnn.Linear(dim, dim * 4)
        self.fc2 = tnn.Linear(dim * 4, dim)

    def forward(self, x):
        return self.fc2(F.gelu(self.fc1(x)))


class TBlock(tnn.Module):
    def __init__(self, dim=768):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
        self.attn = TAttention(dim)
        self.norm2 = tnn.LayerNorm(dim, eps=1e-6)
        self.mlp = TMlp(dim)

    def forward(self, x):
        x = x + self.attn(self.norm1(x))
        return x + self.mlp(self.norm2(x))


class TVit(tnn.Module):
    def __init__(self, grid):
        super().__init__()
        self.patch_embed = tnn.Module()
        self.patch_embed.backbone = TBackbone()
        self.patch_embed.proj = tnn.Conv2d(1024, 768, 1)
        self.cls_token = tnn.Parameter(torch.zeros(1, 1, 768))
        self.pos_embed = tnn.Parameter(
            torch.randn(1, grid * grid + 1, 768) * 0.02
        )
        self.blocks = tnn.ModuleList([TBlock() for _ in range(12)])


class TProjectReadout(tnn.Module):
    def __init__(self, dim=768):
        super().__init__()
        self.project = tnn.Sequential(tnn.Linear(2 * dim, dim), tnn.GELU())

    def forward(self, tokens):
        cls = tokens[:, :1].expand_as(tokens[:, 1:])
        return self.project(torch.cat([tokens[:, 1:], cls], -1))


class TRCU(tnn.Module):
    def __init__(self, f=256):
        super().__init__()
        self.conv1 = tnn.Conv2d(f, f, 3, padding=1)
        self.conv2 = tnn.Conv2d(f, f, 3, padding=1)

    def forward(self, x):
        h = self.conv1(F.relu(x))
        h = self.conv2(F.relu(h))
        return x + h


class TFusion(tnn.Module):
    def __init__(self, f=256):
        super().__init__()
        self.resConfUnit1 = TRCU(f)
        self.resConfUnit2 = TRCU(f)
        self.out_conv = tnn.Conv2d(f, f, 1)

    def forward(self, x, skip=None):
        if skip is not None:
            x = x + self.resConfUnit1(skip)
        x = self.resConfUnit2(x)
        x = F.interpolate(x, scale_factor=2, mode="bilinear",
                          align_corners=True)
        return self.out_conv(x)


class TDPT(tnn.Module):
    def __init__(self, grid, num_channels=1):
        super().__init__()
        self.pretrained = tnn.Module()
        self.pretrained.model = TVit(grid)
        self.pretrained.act_postprocess3 = tnn.Sequential(
            TProjectReadout(), tnn.Sequential(), tnn.Sequential(),
            tnn.Conv2d(768, 768, 1),
        )
        self.pretrained.act_postprocess4 = tnn.Sequential(
            TProjectReadout(), tnn.Sequential(), tnn.Sequential(),
            tnn.Conv2d(768, 768, 1),
            tnn.Conv2d(768, 768, 3, stride=2, padding=1),
        )
        self.scratch = tnn.Module()
        self.scratch.layer1_rn = tnn.Conv2d(256, 256, 3, padding=1,
                                            bias=False)
        self.scratch.layer2_rn = tnn.Conv2d(512, 256, 3, padding=1,
                                            bias=False)
        self.scratch.layer3_rn = tnn.Conv2d(768, 256, 3, padding=1,
                                            bias=False)
        self.scratch.layer4_rn = tnn.Conv2d(768, 256, 3, padding=1,
                                            bias=False)
        self.scratch.refinenet1 = TFusion()
        self.scratch.refinenet2 = TFusion()
        self.scratch.refinenet3 = TFusion()
        self.scratch.refinenet4 = TFusion()
        self.scratch.output_conv = tnn.Sequential(
            tnn.Conv2d(256, 128, 3, padding=1), tnn.Sequential(),
            tnn.Conv2d(128, 32, 3, padding=1), tnn.ReLU(True),
            tnn.Conv2d(32, num_channels, 3, padding=1), tnn.ReLU(True),
            tnn.Sequential(),
        )

    def forward(self, x):
        B = x.shape[0]
        m = self.pretrained.model
        s1, s2, feat = m.patch_embed.backbone(x)
        t = m.patch_embed.proj(feat)
        hg, wg = t.shape[-2:]
        t = t.flatten(2).transpose(1, 2)
        t = torch.cat([m.cls_token.expand(B, -1, -1), t], 1) + m.pos_embed
        taps = []
        for i, blk in enumerate(m.blocks):
            t = blk(t)
            if i in (8, 11):
                taps.append(t)

        def tok2map(tok):
            return tok.transpose(1, 2).reshape(B, 768, hg, wg)

        t3 = tok2map(self.pretrained.act_postprocess3[0](taps[0]))
        t3 = self.pretrained.act_postprocess3[3](t3)
        t4 = tok2map(self.pretrained.act_postprocess4[0](taps[1]))
        t4 = self.pretrained.act_postprocess4[3](t4)
        t4 = self.pretrained.act_postprocess4[4](t4)

        r1 = self.scratch.layer1_rn(s1)
        r2 = self.scratch.layer2_rn(s2)
        r3 = self.scratch.layer3_rn(t3)
        r4 = self.scratch.layer4_rn(t4)
        f4 = self.scratch.refinenet4(r4)
        f3 = self.scratch.refinenet3(f4, r3)
        f2 = self.scratch.refinenet2(f3, r2)
        f1 = self.scratch.refinenet1(f2, r1)

        oc = self.scratch.output_conv
        h = oc[0](f1)
        h = F.interpolate(h, scale_factor=2, mode="bilinear",
                          align_corners=True)
        h = oc[3](oc[2](h))
        return oc[5](oc[4](h))


@pytest.mark.slow
def test_dpt_converter_parity(rng):
    # slow tier (2026-08-19): building the full torch hybrid-ViT reference
    # net costs ~22 s of the fast tier; the converter's key-layout handling
    # stays covered fast by test_dpt_converter_rejects_wrong_channels.
    torch.manual_seed(3)
    tnet = TDPT(S // 16, num_channels=1)
    tnet.eval()
    # the Omnidata dump prefixes keys with "model." — exercise the strip
    sd = {"model." + k: v for k, v in tnet.state_dict().items()}
    params = convert_torch_checkpoint(sd, num_channels=1)

    model = DPTHybrid(num_channels=1, image_size=S, dtype=jnp.float32)
    img = rng.uniform(-1, 1, (1, S, S, 3)).astype(np.float32)
    with torch.no_grad():
        ref = tnet(torch.from_numpy(
            np.moveaxis(img, -1, 1).copy()
        )).numpy()[:, 0]
    out = np.asarray(model.apply(params, jnp.asarray(img)))[..., 0]
    err = np.abs(out - ref)
    scale = np.abs(ref).mean() + 1e-3
    assert err.max() / scale < 2e-2, (err.max(), scale)
    np.testing.assert_allclose(out, ref, rtol=5e-2, atol=5e-3)


def test_dpt_converter_rejects_wrong_channels():
    torch.manual_seed(4)
    tnet = TDPT(S // 16, num_channels=3)
    sd = tnet.state_dict()
    with pytest.raises(AssertionError):
        convert_torch_checkpoint(sd, num_channels=1)
    params = convert_torch_checkpoint(sd, num_channels=3)
    assert params["params"]["head_out"]["kernel"].shape[-1] == 3
