"""DROID-SLAM network stack in Flax: 1/8-res encoders + ConvGRU update.

TPU-native replacement for the NeRF-SLAM fork's torch networks (reference
nerf_vo/tracking/droid_slam.py:93-100 ``BasicEncoder``/``UpdateModule``
loaded from droid.pth, and the ``cvx_upsample`` learned 8x upsampler,
droid_slam.py:897-961). All convolutions run NHWC (TPU-native layout); the
module topology mirrors the upstream DROID-SLAM nets exactly so that
``convert_torch_checkpoint`` can load a real ``droid.pth``:

  * ``BasicEncoder`` — RAFT-style residual encoder to 1/8 resolution
    (conv7x7/2 + 3 residual stages 64/96/128 + 1x1 head).
  * ``UpdateModule`` — corr encoder (196->128 1x1, 128->128 3x3), flow
    encoder (4->128 7x7, 128->64 3x3), a ConvGRU over the 320-ch input
    concat WITH the global-context path (sigmoid(w(net))*net pooled to
    1x1 and re-injected through 1x1 convs), delta/weight heads (the
    trained checkpoint emits 3 channels; the reference slices the head
    weights to [:2] at load, droid_slam.py:1268-1276 — the converter does
    the same), and the frame-level ``agg`` head (conv -> scatter-mean over
    host frame -> conv -> 0.01*softplus damping + 576-ch upsample mask).

The checkpoint key layout is pinned IN-TREE by the reference's
``load_weights`` (droid_slam.py:1257-1277): keys are ``fnet.*`` /
``cnet.*`` / ``update.*`` with an optional ``module.`` prefix.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# ImageNet statistics — the reference normalizes frames with these before
# the encoders (droid_slam.py:1290-1301 "droid_normalization").
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize_images(images_u8):
    """[..., H, W, 3] uint8-range floats -> ImageNet-normalized floats."""
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)
    return (images_u8 / 255.0 - mean) / std


def _inorm(x):
    # InstanceNorm2d(affine=False): per-sample, per-channel over H, W
    return (x - x.mean((1, 2), keepdims=True)) / jnp.sqrt(
        x.var((1, 2), keepdims=True) + 1e-5
    )


class _Res(nn.Module):
    """RAFT ResidualBlock: conv-norm-relu x2 + (1x1 conv + norm) shortcut
    when downsampling."""

    planes: int
    stride: int = 1
    norm: str = "instance"

    @nn.compact
    def __call__(self, x):
        n = _inorm if self.norm == "instance" else (lambda v: v)
        y = nn.relu(n(nn.Conv(self.planes, (3, 3), strides=self.stride,
                              padding=1, name="conv1")(x)))
        y = nn.relu(n(nn.Conv(self.planes, (3, 3), padding=1,
                              name="conv2")(y)))
        if self.stride > 1:
            x = n(nn.Conv(self.planes, (1, 1), strides=self.stride,
                          name="downsample")(x))
        return nn.relu(x + y)


class BasicEncoder8(nn.Module):
    """DROID BasicEncoder: 1/8 resolution, stages 64/96/128."""

    output_dim: int = 128
    norm: str = "instance"

    @nn.compact
    def __call__(self, images):
        x = nn.Conv(64, (7, 7), strides=2, padding=3, name="conv1")(images)
        if self.norm == "instance":
            x = _inorm(x)
        x = nn.relu(x)
        x = _Res(64, 1, self.norm, name="layer1_0")(x)
        x = _Res(64, 1, self.norm, name="layer1_1")(x)
        x = _Res(96, 2, self.norm, name="layer2_0")(x)
        x = _Res(96, 1, self.norm, name="layer2_1")(x)
        x = _Res(128, 2, self.norm, name="layer3_0")(x)
        x = _Res(128, 1, self.norm, name="layer3_1")(x)
        return nn.Conv(self.output_dim, (1, 1), name="conv2")(x)


class ConvGRU(nn.Module):
    """DROID ConvGRU with the global-context path: a sigmoid-gated spatial
    mean of the hidden state feeds each gate through a 1x1 conv."""

    hidden: int = 128

    @nn.compact
    def __call__(self, h, *inputs):
        inp = jnp.concatenate(inputs, -1)
        hx = jnp.concatenate([h, inp], -1)
        glo = nn.sigmoid(nn.Conv(self.hidden, (1, 1), name="w")(h)) * h
        glo = glo.mean((1, 2), keepdims=True)  # [E, 1, 1, 128]
        z = nn.sigmoid(
            nn.Conv(self.hidden, (3, 3), padding=1, name="convz")(hx)
            + nn.Conv(self.hidden, (1, 1), name="convz_glo")(glo)
        )
        r = nn.sigmoid(
            nn.Conv(self.hidden, (3, 3), padding=1, name="convr")(hx)
            + nn.Conv(self.hidden, (1, 1), name="convr_glo")(glo)
        )
        q = jnp.tanh(
            nn.Conv(self.hidden, (3, 3), padding=1, name="convq")(
                jnp.concatenate([r * h, inp], -1)
            )
            + nn.Conv(self.hidden, (1, 1), name="convq_glo")(glo)
        )
        return (1 - z) * h + z * q


class DroidUpdate(nn.Module):
    """Per-edge ConvGRU update: correlation + flow -> (delta, weight) and
    per-host-frame (damping, upsample mask) via the agg head."""

    hidden: int = 128
    corr_dim: int = 4 * 49  # 4 pyramid levels * (2*3+1)^2 lookups

    @nn.compact
    def __call__(self, net, inp, corr, flow, ii, num_frames: int,
                 stop_after: int = 0):
        """
        Args:
          net: [E, h, w, 128] hidden per edge.
          inp: [E, h, w, 128] context of host frame.
          corr: [E, h, w, corr_dim]; flow: [E, h, w, 4] (flow + residual).
          ii: [E] host frame per edge.
          stop_after: dev-only profiling cut (scripts/exp_droid_cut.py):
            1 = corr/flow encoders, 2 = ConvGRU, 3 = delta/weight heads;
            0/4 = full. Early returns carry zeroed heads with a data
            dependency on the computed stages so they don't DCE.
        Returns: (net', delta [E,h,w,2], weight [E,h,w,2],
                  eta [num_frames,h,w], upmask [num_frames,h,w,576]).
        """
        hw = net.shape[1:3]

        def stubs(token):
            z2 = jnp.zeros(net.shape[:3] + (2,)) + token
            eta0 = jnp.zeros((num_frames,) + hw)
            up0 = jnp.zeros((num_frames,) + hw + (576,))
            return z2, eta0, up0

        c = nn.relu(nn.Conv(128, (1, 1), name="corr_enc0")(corr))
        c = nn.relu(nn.Conv(128, (3, 3), padding=1, name="corr_enc2")(c))
        f = nn.relu(nn.Conv(128, (7, 7), padding=3, name="flow_enc0")(flow))
        f = nn.relu(nn.Conv(64, (3, 3), padding=1, name="flow_enc2")(f))
        if stop_after == 1:
            z2, eta0, up0 = stubs(jnp.sum(c) * 0 + jnp.sum(f) * 0)
            return net, z2, z2, eta0, up0
        # GRU input: cat(inp, corr_enc, flow_enc) = 128+128+64 = 320 ch
        net = ConvGRU(self.hidden, name="gru")(net, inp, c, f)
        if stop_after == 2:
            z2, eta0, up0 = stubs(jnp.sum(net) * 0)
            return net, z2, z2, eta0, up0

        d = nn.relu(nn.Conv(128, (3, 3), padding=1, name="delta0")(net))
        delta = nn.Conv(2, (3, 3), padding=1, name="delta2")(d)
        w = nn.relu(nn.Conv(128, (3, 3), padding=1, name="weight0")(net))
        weight = nn.sigmoid(nn.Conv(2, (3, 3), padding=1, name="weight2")(w))
        if stop_after == 3:
            _, eta0, up0 = stubs(0.0)
            return net, delta, weight, eta0, up0

        # frame-level agg head: conv BEFORE the per-host-frame mean (the
        # upstream GraphAgg order), then conv after
        E = net.shape[0]
        a = nn.relu(nn.Conv(128, (3, 3), padding=1, name="agg_conv1")(net))
        ones = jnp.zeros((num_frames,)).at[ii].add(jnp.ones((E,)))
        pooled = jnp.zeros((num_frames,) + a.shape[1:]).at[ii].add(a)
        pooled = pooled / jnp.clip(ones[:, None, None, None], 1.0)
        h2 = nn.relu(nn.Conv(128, (3, 3), padding=1, name="agg_conv2")(pooled))
        eta = 0.01 * nn.softplus(
            nn.Conv(1, (3, 3), padding=1, name="agg_eta")(h2)[..., 0]
        )
        upmask = nn.Conv(8 * 8 * 9, (1, 1), name="agg_upmask")(h2)
        return net, delta, weight, eta, upmask


def cvx_upsample(data, mask):
    """Learned convex 8x upsampling (reference cvx_upsample,
    droid_slam.py:481-486 [upstream]).

    Args:
      data: [N, h, w] field to upsample (e.g. inverse depth).
      mask: [N, h, w, 576] logits, channel layout (9, 8, 8) =
        (neighbor k, subpixel row, subpixel col) — the torch conv head's
        view order, so converted weights drop in unchanged.

    Returns [N, 8h, 8w].
    """
    N, h, w = data.shape
    m = mask.reshape(N, h, w, 9, 8, 8)
    m = jax.nn.softmax(m, axis=-3)
    # 3x3 neighborhoods, zero-padded (torch F.unfold semantics)
    pad = jnp.pad(data, ((0, 0), (1, 1), (1, 1)))
    neigh = jnp.stack(
        [pad[:, dy: dy + h, dx: dx + w]
         for dy in range(3) for dx in range(3)], -1,
    )  # [N, h, w, 9] in unfold order k = (dy+1)*3 + (dx+1)
    up = jnp.einsum("nhwkyx,nhwk->nhwyx", m, neigh)  # [N, h, w, 8, 8]
    return up.transpose(0, 1, 3, 2, 4).reshape(N, 8 * h, 8 * w)


class DroidNet(nn.Module):
    fdim: int = 128
    cdim: int = 128

    def setup(self):
        self.fnet = BasicEncoder8(output_dim=self.fdim, norm="instance")
        self.cnet = BasicEncoder8(output_dim=2 * self.cdim, norm="none")
        self.update = DroidUpdate(hidden=self.cdim)

    def encode_features(self, images):
        """ImageNet-normalized [B, H, W, 3] -> fmap [B, H/8, W/8, 128]."""
        return self.fnet(images)

    def encode_context(self, images):
        c = self.cnet(images)
        net, inp = jnp.split(c, 2, axis=-1)
        return jnp.tanh(net), nn.relu(inp)

    def update_step(self, net, inp, corr, flow, ii, num_frames,
                    stop_after: int = 0):
        return self.update(net, inp, corr, flow, ii, num_frames, stop_after)

    def __call__(self, images, net, inp, corr, flow, ii):
        f = self.encode_features(images)
        c = self.encode_context(images)
        u = self.update(net, inp, corr, flow, ii, 2)
        return f, c, u


def init_droid_params(key, height: int, width: int, n_edges: int = 2
                      ) -> Tuple[DroidNet, Any]:
    model = DroidNet()
    h, w = height // 8, width // 8
    E = n_edges
    params = model.init(
        key,
        jnp.zeros((1, height, width, 3)),
        jnp.zeros((E, h, w, 128)),
        jnp.zeros((E, h, w, 128)),
        jnp.zeros((E, h, w, 4 * 49)),
        jnp.zeros((E, h, w, 4)),
        jnp.zeros((E,), jnp.int32),
    )["params"]
    return model, params


# --------------------------------------------------------------------------
# droid.pth conversion
# --------------------------------------------------------------------------

def _conv(sd, key):
    """Torch OIHW conv kernel -> Flax HWIO."""
    import numpy as np

    return np.transpose(np.asarray(sd[key]), (2, 3, 1, 0))


def _conv_kb(sd, prefix):
    import numpy as np

    return {
        "kernel": _conv(sd, prefix + ".weight"),
        "bias": np.asarray(sd[prefix + ".bias"]),
    }


def _res_block(sd, prefix):
    out = {
        "conv1": _conv_kb(sd, prefix + ".conv1"),
        "conv2": _conv_kb(sd, prefix + ".conv2"),
    }
    if prefix + ".downsample.0.weight" in sd:
        out["downsample"] = _conv_kb(sd, prefix + ".downsample.0")
    return out


def _encoder(sd, prefix):
    return {
        "conv1": _conv_kb(sd, prefix + ".conv1"),
        "conv2": _conv_kb(sd, prefix + ".conv2"),
        "layer1_0": _res_block(sd, prefix + ".layer1.0"),
        "layer1_1": _res_block(sd, prefix + ".layer1.1"),
        "layer2_0": _res_block(sd, prefix + ".layer2.0"),
        "layer2_1": _res_block(sd, prefix + ".layer2.1"),
        "layer3_0": _res_block(sd, prefix + ".layer3.0"),
        "layer3_1": _res_block(sd, prefix + ".layer3.1"),
    }


def convert_torch_checkpoint(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Map a ``droid.pth`` torch state dict onto DroidNet params.

    Accepts the raw upstream checkpoint: optional ``module.`` prefixes are
    stripped, conv kernels transpose OIHW -> HWIO, and the 3-channel
    ``update.delta.2`` / ``update.weight.2`` heads are sliced to their
    first two channels — exactly the surgery the reference performs at
    load (droid_slam.py:1268-1276).

    Returns the ``{"params": ...}`` tree expected by ``DroidNet.apply``.
    """
    import numpy as np

    sd = {}
    for k, v in state_dict.items():
        k = k.replace("module.", "")
        sd[k] = np.asarray(v)

    def head2(prefix):
        # conv -> relu -> conv(3ch), sliced [:2] like the reference
        w = _conv(sd, prefix + ".2.weight")  # HWIO, O = 3
        b = np.asarray(sd[prefix + ".2.bias"])
        return (
            _conv_kb(sd, prefix + ".0"),
            {"kernel": w[..., :2], "bias": b[:2]},
        )

    delta0, delta2 = head2("update.delta")
    weight0, weight2 = head2("update.weight")

    update = {
        "corr_enc0": _conv_kb(sd, "update.corr_encoder.0"),
        "corr_enc2": _conv_kb(sd, "update.corr_encoder.2"),
        "flow_enc0": _conv_kb(sd, "update.flow_encoder.0"),
        "flow_enc2": _conv_kb(sd, "update.flow_encoder.2"),
        "gru": {
            "convz": _conv_kb(sd, "update.gru.convz"),
            "convr": _conv_kb(sd, "update.gru.convr"),
            "convq": _conv_kb(sd, "update.gru.convq"),
            "w": _conv_kb(sd, "update.gru.w"),
            "convz_glo": _conv_kb(sd, "update.gru.convz_glo"),
            "convr_glo": _conv_kb(sd, "update.gru.convr_glo"),
            "convq_glo": _conv_kb(sd, "update.gru.convq_glo"),
        },
        "delta0": delta0,
        "delta2": delta2,
        "weight0": weight0,
        "weight2": weight2,
        "agg_conv1": _conv_kb(sd, "update.agg.conv1"),
        "agg_conv2": _conv_kb(sd, "update.agg.conv2"),
        "agg_eta": _conv_kb(sd, "update.agg.eta.0"),
        "agg_upmask": _conv_kb(sd, "update.agg.upmask.0"),
    }
    return {
        "params": {
            "fnet": _encoder(sd, "fnet"),
            "cnet": _encoder(sd, "cnet"),
            "update": update,
        }
    }


def load_torch_weights(path: str) -> Dict[str, Any]:
    """Load + convert a droid.pth checkpoint from disk (see the env hook
    ``NERF_VO_DROID_WEIGHTS`` in tracking/droid_slam.py)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return convert_torch_checkpoint(sd)
