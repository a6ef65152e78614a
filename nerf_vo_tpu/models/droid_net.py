"""DROID-SLAM network stack in Flax: 1/8-res encoders + ConvGRU update.

TPU-native replacement for the NeRF-SLAM fork's torch networks (reference
nerf_vo/tracking/droid_slam.py:93-100 ``BasicEncoder``/``UpdateModule``
loaded from droid.pth, and the ``cvx_upsample`` learned 8x upsampler,
droid_slam.py:897-961). NHWC convs; weight conversion from ``droid.pth`` is
an explicit stub (zero-egress environment; see convert_torch_checkpoint).
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class _Res(nn.Module):
    planes: int
    stride: int = 1
    norm: str = "instance"

    def _n(self):
        if self.norm == "instance":
            return lambda x: (x - x.mean((1, 2), keepdims=True)) / jnp.sqrt(
                x.var((1, 2), keepdims=True) + 1e-5
            )
        return lambda x: x

    @nn.compact
    def __call__(self, x):
        n = self._n()
        y = nn.relu(n(nn.Conv(self.planes, (3, 3), strides=self.stride,
                              padding=1)(x)))
        y = nn.relu(n(nn.Conv(self.planes, (3, 3), padding=1)(y)))
        if self.stride > 1 or x.shape[-1] != self.planes:
            x = n(nn.Conv(self.planes, (1, 1), strides=self.stride)(x))
        return nn.relu(x + y)


class BasicEncoder8(nn.Module):
    """RAFT/DROID encoder to 1/8 resolution."""

    output_dim: int = 128
    norm: str = "instance"

    @nn.compact
    def __call__(self, images):
        x = nn.Conv(64, (7, 7), strides=2, padding=3)(images)
        if self.norm == "instance":
            x = (x - x.mean((1, 2), keepdims=True)) / jnp.sqrt(
                x.var((1, 2), keepdims=True) + 1e-5
            )
        x = nn.relu(x)
        x = _Res(64, 1, self.norm)(x)
        x = _Res(64, 1, self.norm)(x)
        x = _Res(96, 2, self.norm)(x)
        x = _Res(96, 1, self.norm)(x)
        x = _Res(128, 2, self.norm)(x)
        x = _Res(128, 1, self.norm)(x)
        return nn.Conv(self.output_dim, (1, 1))(x)


class ConvGRU(nn.Module):
    hidden: int = 128

    @nn.compact
    def __call__(self, h, x):
        hx = jnp.concatenate([h, x], -1)
        z = nn.sigmoid(nn.Conv(self.hidden, (3, 3), padding=1)(hx))
        r = nn.sigmoid(nn.Conv(self.hidden, (3, 3), padding=1)(hx))
        q = jnp.tanh(
            nn.Conv(self.hidden, (3, 3), padding=1)(
                jnp.concatenate([r * h, x], -1)
            )
        )
        return (1 - z) * h + z * q


class DroidUpdate(nn.Module):
    """Per-edge ConvGRU update: correlation + flow -> (delta, weight) and
    per-host-frame (damping, upsample mask) via aggregation."""

    hidden: int = 128
    corr_dim: int = 4 * 49  # 4 levels * (2*3+1)^2

    @nn.compact
    def __call__(self, net, inp, corr, flow, ii, num_frames: int):
        """
        Args:
          net: [E, h, w, 128] hidden per edge.
          inp: [E, h, w, 128] context of host frame.
          corr: [E, h, w, corr_dim]; flow: [E, h, w, 4] (residual flow + extra).
          ii: [E] host frame per edge.
        Returns: (net', delta [E,h,w,2], weight [E,h,w,2],
                  eta [num_frames,h,w], upmask [num_frames,h,w,576]).
        """
        c = nn.relu(nn.Conv(96, (1, 1))(corr))
        c = nn.relu(nn.Conv(96, (3, 3), padding=1)(c))
        f = nn.relu(nn.Conv(64, (7, 7), padding=3)(flow))
        f = nn.relu(nn.Conv(64, (3, 3), padding=1)(f))
        x = nn.relu(nn.Conv(self.hidden, (3, 3), padding=1)(
            jnp.concatenate([c, f, inp], -1)
        ))
        net = ConvGRU(self.hidden)(net, x)

        h1 = nn.relu(nn.Conv(self.hidden, (3, 3), padding=1)(net))
        delta = nn.Conv(2, (3, 3), padding=1)(h1)
        weight = nn.sigmoid(nn.Conv(2, (3, 3), padding=1)(h1))

        # frame-level heads on edge states mean-pooled per host frame
        E = net.shape[0]
        ones = jnp.zeros((num_frames,)).at[ii].add(jnp.ones((E,)))
        pooled = jnp.zeros((num_frames,) + net.shape[1:]).at[ii].add(net)
        pooled = pooled / jnp.clip(ones[:, None, None, None], 1.0)
        h2 = nn.relu(nn.Conv(self.hidden, (3, 3), padding=1)(pooled))
        eta = nn.softplus(nn.Conv(1, (3, 3), padding=1)(h2)[..., 0] - 4.0)
        upmask = nn.Conv(8 * 8 * 9, (1, 1))(h2)
        return net, delta, weight, eta, upmask


def cvx_upsample(data, mask):
    """Learned convex 8x upsampling (reference cvx_upsample,
    droid_slam.py:481-486 [upstream]).

    Args:
      data: [N, h, w] field to upsample (e.g. inverse depth).
      mask: [N, h, w, 576] logits over 9 neighbors per 8x8 subpixel.

    Returns [N, 8h, 8w].
    """
    N, h, w = data.shape
    m = mask.reshape(N, h, w, 8, 8, 9)
    m = jax.nn.softmax(m, axis=-1)
    # 3x3 neighborhoods of data
    pad = jnp.pad(data, ((0, 0), (1, 1), (1, 1)), mode="edge")
    neigh = jnp.stack(
        [pad[:, dy: dy + h, dx: dx + w]
         for dy in range(3) for dx in range(3)], -1,
    )  # [N, h, w, 9]
    up = jnp.einsum("nhwxyk,nhwk->nhwxy", m, neigh)
    return up.transpose(0, 1, 3, 2, 4).reshape(N, 8 * h, 8 * w)


class DroidNet(nn.Module):
    fdim: int = 128
    cdim: int = 128

    def setup(self):
        self.fnet = BasicEncoder8(output_dim=self.fdim, norm="instance")
        self.cnet = BasicEncoder8(output_dim=2 * self.cdim, norm="none")
        self.update = DroidUpdate(hidden=self.cdim)

    def encode_features(self, images):
        """[B, H, W, 3] in [-0.5, 0.5] -> fmap [B, H/8, W/8, 128]."""
        return self.fnet(images)

    def encode_context(self, images):
        c = self.cnet(images)
        net, inp = jnp.split(c, 2, axis=-1)
        return jnp.tanh(net), nn.relu(inp)

    def update_step(self, net, inp, corr, flow, ii, num_frames):
        return self.update(net, inp, corr, flow, ii, num_frames)

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


def convert_torch_checkpoint(state_dict: Any):
    """Map ``droid.pth`` onto DroidNet (incl. the reference's ``[:2]`` weight
    slice surgery, droid_slam.py:1268-1276). Stub until a checkpoint is
    available in-environment (zero egress)."""
    raise NotImplementedError(
        "requires droid.pth to validate layer mapping"
    )
