"""DPVO network stack in Flax: feature/context encoders + patch update net.

TPU-native replacement for the DPVO submodule's torch networks (reference
N1 [upstream]; consumed via nerf_vo/tracking/dpvo.py:8-9,62-64): a RAFT-style
residual encoder producing matching features (128-d) and context features
(384-d) at 1/4 resolution, a patchifier that extracts 3x3 patch grids, and
the recurrent update operator that turns correlation + context into per-edge
flow deltas and confidence weights.

Weight conversion: `convert_torch_checkpoint` maps a ``dpvo.pth`` state dict
onto these modules when a checkpoint is available (none can be fetched in
this zero-egress environment, so geometric correctness is validated with
oracle tests and the nets are exercised with random init).

All convolutions are NHWC (TPU-native layout).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


class ResidualBlock(nn.Module):
    planes: int
    stride: int = 1
    norm: str = "instance"  # "instance" | "none"

    def _norm(self):
        if self.norm == "instance":
            # InstanceNorm over spatial dims, no batch stats
            return lambda x: (x - x.mean((1, 2), keepdims=True)) / jnp.sqrt(
                x.var((1, 2), keepdims=True) + 1e-5
            )
        return lambda x: x

    @nn.compact
    def __call__(self, x):
        norm = self._norm()
        y = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1)(x)
        y = nn.relu(norm(y))
        y = nn.Conv(self.planes, (3, 3), padding=1)(y)
        y = nn.relu(norm(y))
        if self.stride > 1 or x.shape[-1] != self.planes:
            x = nn.Conv(self.planes, (1, 1), strides=self.stride)(x)
            x = norm(x)
        return nn.relu(x + y)


class BasicEncoder4(nn.Module):
    """RAFT-style encoder to 1/4 resolution (DPVO BasicEncoder4 [upstream])."""

    output_dim: int = 128
    norm: str = "instance"
    dim: int = 32

    @nn.compact
    def __call__(self, images):
        """images: [B, H, W, 3] float in [-0.5, 0.5]-ish. -> [B, H/4, W/4, D]."""
        x = nn.Conv(self.dim, (7, 7), strides=2, padding=3)(images)
        if self.norm == "instance":
            x = (x - x.mean((1, 2), keepdims=True)) / jnp.sqrt(
                x.var((1, 2), keepdims=True) + 1e-5
            )
        x = nn.relu(x)
        x = ResidualBlock(self.dim, 1, self.norm)(x)
        x = ResidualBlock(self.dim, 1, self.norm)(x)
        x = ResidualBlock(2 * self.dim, 2, self.norm)(x)
        x = ResidualBlock(2 * self.dim, 2 // 2, self.norm)(x)
        return nn.Conv(self.output_dim, (1, 1))(x)


def avg_pool2(x):
    """2x2 average pool (pyramid level 1)."""
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


def extract_patches(fmap, coords, radius: int = 1):
    """Extract (2r+1)^2 patch grids from a feature map by bilinear sampling.

    Args:
      fmap: [H, W, C] single-frame features.
      coords: [P, 2] (x, y) patch centers in fmap pixels.

    Returns: [P, 2r+1, 2r+1, C].
    """
    from nerf_vo_tpu.ops.correlation import bilinear_gather

    d = 2 * radius + 1
    dx = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    offs = jnp.stack(jnp.meshgrid(dx, dx, indexing="xy"), -1)  # [d, d, 2]
    c = coords[:, None, None, :] + offs[None]
    frame = jnp.zeros(c.shape[:-1], jnp.int32)
    return bilinear_gather(fmap[None], frame, c)


class SoftAgg(nn.Module):
    """Softmax-weighted aggregation of edge states over a grouping index
    (DPVO's SoftAgg over patch / frame groups [upstream])."""

    dim: int = 384

    @nn.compact
    def __call__(self, x, groups, num_groups: int):
        # x: [E, D]; groups: [E] int32 in [0, num_groups)
        logits = nn.Dense(1)(x)[..., 0]  # [E]
        # segment softmax
        gmax = jnp.full((num_groups,), -jnp.inf).at[groups].max(logits)
        ex = jnp.exp(logits - gmax[groups])
        gsum = jnp.zeros((num_groups,)).at[groups].add(ex)
        w = ex / jnp.clip(gsum[groups], 1e-12)
        agg = jnp.zeros((num_groups, x.shape[-1])).at[groups].add(
            x * w[:, None]
        )
        return nn.Dense(self.dim)(agg[groups])


class UpdateNet(nn.Module):
    """Recurrent patch-graph update operator (DPVO Update [upstream]).

    Per edge: encode correlation + current flow estimate, mix with context,
    aggregate over edges sharing a patch and edges sharing a frame, gated
    residual update of the hidden state, then regress (delta, weight).
    """

    dim: int = 384
    corr_dim: int = 882  # 2 levels * 3*3 * 7*7

    @nn.compact
    def __call__(self, net, imap, corr, flow, kk, jj, num_patches: int,
                 num_frames: int):
        """
        Args:
          net: [E, D] hidden state per edge.
          imap: [E, D] context features (host patch context per edge).
          corr: [E, corr_dim] correlation features.
          flow: [E, 2] current flow residual estimate (pixels, detached).
          kk: [E] patch index per edge; jj: [E] target frame per edge.

        Returns: (net', delta [E, 2], weight [E, 2])
        """
        corr = nn.relu(nn.Dense(self.dim)(corr))
        corr = nn.relu(nn.Dense(self.dim)(corr))
        flw = nn.relu(nn.Dense(self.dim)(flow / 8.0))
        x = nn.LayerNorm()(net + imap + corr + flw)
        x = x + SoftAgg(self.dim, name="agg_kk")(x, kk, num_patches)
        x = x + SoftAgg(self.dim, name="agg_jj")(x, jj, num_frames)

        # gated (GRU-style) hidden update
        z = nn.sigmoid(nn.Dense(self.dim)(jnp.concatenate([net, x], -1)))
        q = jnp.tanh(nn.Dense(self.dim)(jnp.concatenate([net, x], -1)))
        net = (1.0 - z) * net + z * q

        h = nn.relu(nn.Dense(self.dim)(net))
        delta = nn.Dense(2)(h)
        weight = nn.sigmoid(nn.Dense(2)(h))
        return net, delta, weight


class DPVONet(nn.Module):
    """Bundle of the three sub-networks with a single param tree."""

    fdim: int = 128
    cdim: int = 384

    def setup(self):
        self.fnet = BasicEncoder4(output_dim=self.fdim, norm="instance")
        self.inet = BasicEncoder4(output_dim=self.cdim, norm="none")
        self.update = UpdateNet(dim=self.cdim)

    def encode(self, images):
        """images [B, H, W, 3] uint8-range floats. Returns (fmap1, fmap2, imap)."""
        x = images / 255.0 - 0.5
        fmap1 = self.fnet(x)
        imap = self.inet(x)
        return fmap1, avg_pool2(fmap1), imap

    def update_step(self, net, imap, corr, flow, kk, jj, num_patches,
                    num_frames):
        return self.update(net, imap, corr, flow, kk, jj, num_patches,
                           num_frames)

    def __call__(self, images, net, imap_e, corr, flow, kk, jj):
        """Joint forward for init only."""
        f1, f2, im = self.encode(images)
        out = self.update(net, imap_e, corr, flow, kk, jj, 4, 4)
        return f1, f2, im, out


def init_dpvo_params(key, height: int = 120, width: int = 160,
                     n_edges: int = 8, corr_radius: int = 3
                     ) -> Tuple[DPVONet, Any]:
    corr_dim = 2 * 9 * (2 * corr_radius + 1) ** 2
    model = DPVONet()
    E = n_edges
    params = model.init(
        key,
        jnp.zeros((1, height, width, 3)),
        jnp.zeros((E, 384)),
        jnp.zeros((E, 384)),
        jnp.zeros((E, corr_dim)),
        jnp.zeros((E, 2)),
        jnp.zeros((E,), jnp.int32),
        jnp.zeros((E,), jnp.int32),
    )["params"]
    return model, params


def convert_torch_checkpoint(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Map a torch ``dpvo.pth`` state dict onto DPVONet params.

    Placeholder until a checkpoint is available in-environment: the upstream
    submodule is empty in the reference checkout (SURVEY.md header) and the
    environment has no egress, so the exact upstream layer naming cannot be
    verified. The mapping must be completed against the real checkpoint
    (torch NCHW conv kernels -> HWIO transpose, linear weights -> transpose).
    """
    raise NotImplementedError(
        "requires a dpvo.pth checkpoint to validate layer mapping"
    )
