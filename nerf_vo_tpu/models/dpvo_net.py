"""DPVO network stack in Flax: feature/context encoders + patch update net.

TPU-native replacement for the DPVO submodule's torch networks (reference
N1 [upstream]; consumed via nerf_vo/tracking/dpvo.py:8-9,62-64). The module
topology mirrors the upstream DPVO ``VONet`` exactly so that
``convert_torch_checkpoint`` can load a real ``dpvo.pth``:

  * ``patchify.fnet`` — BasicEncoder4 (1/4 res, instance norm, 128-d
    matching features) and ``patchify.inet`` (no norm, 384-d context),
    both scaled by 1/4 after the head conv, on images normalized
    ``2*(x/255) - 0.5``.
  * ``update`` — per-edge operator over the patch graph: corr MLP
    (882 -> 384 with an inner LayerNorm), additive context, LayerNorm,
    temporal neighbor mixing ``c1``/``c2`` (2-layer MLPs applied to the
    hidden state of the SAME patch's edge to frame j-1 / j+1; a missing
    neighbor feeds zeros, so the MLP bias still flows — an upstream
    quirk we replicate), softmax aggregation over patch groups
    (``agg_kk``) and over (source, target) frame-pair groups
    (``agg_ij``), a 2x (LayerNorm + GatedResidual) "gru", and the
    ``d``/``w`` heads for flow delta and confidence.

All convolutions are NHWC (TPU-native layout); edge tensors are padded to
a static size and masked (dead edges route to trash aggregation groups so
they can never pollute a live group — upstream has no padding at all).

Checkpoint layout caveats (upstream submodule is EMPTY in the reference
checkout, so these are pinned to public DPVO and must be re-verified
against a real ``dpvo.pth`` when one is available):
  * corr feature layout: ours is ``[level(2), patch_px(9, row-major),
    dy*7+dx]`` (ops/correlation.py); if upstream's flatten order differs,
    pass ``corr_perm`` to ``convert_torch_checkpoint`` to permute the
    first corr Linear's input rows.
  * the ``update.lmbda`` scalar (a learned BA damping) is ignored at
    load, as upstream's own loader does.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

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
        y = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                    name="conv1")(x)
        y = nn.relu(norm(y))
        y = nn.Conv(self.planes, (3, 3), padding=1, name="conv2")(y)
        y = nn.relu(norm(y))
        if self.stride > 1:
            x = nn.Conv(self.planes, (1, 1), strides=self.stride,
                        padding=0, name="downsample")(x)
            x = norm(x)
        return nn.relu(x + y)


class BasicEncoder4(nn.Module):
    """RAFT-style encoder to 1/4 resolution (DPVO BasicEncoder4 [upstream]):
    conv7x7/2 -> 2 blocks @32 -> 2 blocks @64 (first strided) -> 1x1."""

    output_dim: int = 128
    norm: str = "instance"
    dim: int = 32

    @nn.compact
    def __call__(self, images):
        """images: [B, H, W, 3] normalized floats -> [B, H/4, W/4, D]."""
        x = nn.Conv(self.dim, (7, 7), strides=2, padding=3,
                    name="conv1")(images)
        if self.norm == "instance":
            x = (x - x.mean((1, 2), keepdims=True)) / jnp.sqrt(
                x.var((1, 2), keepdims=True) + 1e-5
            )
        x = nn.relu(x)
        x = ResidualBlock(self.dim, 1, self.norm, name="layer1_0")(x)
        x = ResidualBlock(self.dim, 1, self.norm, name="layer1_1")(x)
        x = ResidualBlock(2 * self.dim, 2, self.norm, name="layer2_0")(x)
        x = ResidualBlock(2 * self.dim, 1, self.norm, name="layer2_1")(x)
        return nn.Conv(self.output_dim, (1, 1), name="conv2")(x)


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


class MLP2(nn.Module):
    """Linear -> ReLU -> Linear (upstream's c1/c2 and GatedResidual.res)."""

    dim: int = 384

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(self.dim, name="lin0")(x))
        return nn.Dense(self.dim, name="lin2")(x)


class GatedResidual(nn.Module):
    """x + sigmoid(gate(x)) * res(x) (upstream GatedResidual)."""

    dim: int = 384

    @nn.compact
    def __call__(self, x):
        gate = nn.sigmoid(nn.Dense(self.dim, name="gate0")(x))
        res = MLP2(self.dim, name="res")(x)
        return x + gate * res


class SoftAgg(nn.Module):
    """Channel-wise softmax-weighted aggregation over a grouping index
    (upstream SoftAgg: w = scatter_softmax(g(x)); y = scatter_sum(f(x)*w);
    out = h(y) expanded back to edges).

    Two mathematically identical routes:
      * scatter route (``members=None``): three segment scatters — each at
        the measured ~21-27 ns/descriptor TPU scatter floor; the whole-net
        attribution put soft aggregation at +4.2 ms of the update step
        (tpu_runs/exp_vo_cut_r4.log).
      * member-table route: ``members [G, T]`` lists each group's edge
        slots (pad -1). The output only needs GROUP sums, so one fused
        [G, T, 2D] gather + axis reductions replace every scatter —
        gathers sit at the cheap ~4-5 ns/descriptor floor. The tracker
        gets the table for free: its neighbor-lookup scatter ``nbr_tab``
        (one int32 [E] scatter, already paid for ix/jx) reshapes into the
        member lists of BOTH aggregation groups.
    """

    dim: int = 384

    @nn.compact
    def __call__(self, x, groups, num_groups: int, members=None):
        # x: [E, D]; groups: [E] int32 in [0, num_groups); dead edges must
        # use the trash group ``num_groups - 1``.
        gx = nn.Dense(self.dim, name="g")(x)  # [E, D]
        fx = nn.Dense(self.dim, name="f")(x)
        if members is None:
            gmax = jnp.full(
                (num_groups, self.dim), -jnp.inf
            ).at[groups].max(gx)
            ex = jnp.exp(gx - gmax[groups])
            gsum = jnp.zeros((num_groups, self.dim)).at[groups].add(ex)
            w = ex / jnp.clip(gsum[groups], 1e-12)
            y = jnp.zeros((num_groups, self.dim)).at[groups].add(fx * w)
            return nn.Dense(self.dim, name="h")(y)[groups]

        # members: [G, T] edge slots per group, -1 = pad; G == num_groups-1
        # (the trash group has no member list — its row is zero by
        # construction, exactly what dead edges should read back).
        valid = (members >= 0)[..., None]          # [G, T, 1]
        m = jnp.clip(members, 0)
        gfm = jnp.concatenate([gx, fx], axis=-1)[m]  # ONE [G, T, 2D] gather
        gxm = jnp.where(valid, gfm[..., : self.dim], -jnp.inf)
        fxm = gfm[..., self.dim:]
        gmax = jnp.max(gxm, axis=1)                # [G, D]
        gmax = jnp.where(jnp.isfinite(gmax), gmax, 0.0)
        exm = jnp.exp(gxm - gmax[:, None, :])      # invalid -> exp(-inf)=0
        gsum = jnp.sum(exm, axis=1)
        y = jnp.sum(fxm * exm, axis=1) / jnp.clip(gsum, 1e-12)
        y = jnp.concatenate(
            [y, jnp.zeros((1, self.dim), y.dtype)], axis=0
        )  # trash row
        return nn.Dense(self.dim, name="h")(y)[groups]


class UpdateNet(nn.Module):
    """Recurrent patch-graph update operator (upstream DPVO Update)."""

    dim: int = 384
    corr_dim: int = 882  # 2 levels * 3*3 patch px * 7*7 lookups

    @nn.compact
    def __call__(self, net, imap, corr, kk, pair, ix, jx, live,
                 num_patches: int, num_pairs: int, stop_after: int = 0,
                 mt_kk=None, mt_ij=None):
        """
        Args:
          net: [E, D] hidden state per edge.
          imap: [E, D] context features (host patch context per edge).
          corr: [E, corr_dim] correlation features.
          kk: [E] patch-group index in [0, num_patches]; dead edges must
            point at the trash group ``num_patches``.
          pair: [E] (source, target) frame-pair group in [0, num_pairs];
            trash group ``num_pairs`` for dead edges.
          ix, jx: [E] edge-slot index of the same patch's edge to the
            previous / next target frame, or -1 when absent.
          live: [E] bool edge liveness.
          stop_after: dev-only profiling cut (scripts/exp_vo_cut.py):
            1 = corr MLP, 2 = neighbor mixing, 3 = soft aggregation,
            4 = GRU blocks; 0 = full. Early returns carry zero
            delta/weight so downstream ops dead-code-eliminate.
          mt_kk: optional [num_patches, T] member table for the patch
            aggregation (edge slots per patch, -1 pad) — switches SoftAgg
            to its gather route (see SoftAgg docstring).
          mt_ij: optional [num_pairs, T'] member table for the frame-pair
            aggregation.

        Returns: (net', delta [E, 2], weight [E, 2])
        """
        z2 = jnp.zeros(net.shape[:1] + (2,), net.dtype)
        c = nn.relu(nn.Dense(self.dim, name="corr0")(corr))
        c = nn.Dense(self.dim, name="corr2")(c)
        c = nn.relu(nn.LayerNorm(epsilon=1e-3, name="corr3")(c))
        c = nn.Dense(self.dim, name="corr5")(c)

        net = net + imap + c
        net = nn.LayerNorm(epsilon=1e-3, name="norm")(net)
        if stop_after == 1:
            return net, z2, z2

        # temporal neighbor mixing: same patch, target frame -1 / +1.
        # Missing neighbor -> zero input (the MLP bias still contributes —
        # exact upstream behavior). Sequential: c2 reads the c1-updated net.
        prev = jnp.where(
            (ix >= 0)[:, None], net[jnp.clip(ix, 0)], 0.0
        )
        net = net + MLP2(self.dim, name="c1")(prev)
        nxt = jnp.where(
            (jx >= 0)[:, None], net[jnp.clip(jx, 0)], 0.0
        )
        net = net + MLP2(self.dim, name="c2")(nxt)
        if stop_after == 2:
            return net, z2, z2

        net = net + SoftAgg(self.dim, name="agg_kk")(
            net, kk, num_patches + 1, mt_kk
        )
        net = net + SoftAgg(self.dim, name="agg_ij")(
            net, pair, num_pairs + 1, mt_ij
        )
        if stop_after == 3:
            return net, z2, z2

        net = nn.LayerNorm(epsilon=1e-3, name="gru0")(net)
        net = GatedResidual(self.dim, name="gru1")(net)
        net = nn.LayerNorm(epsilon=1e-3, name="gru2")(net)
        net = GatedResidual(self.dim, name="gru3")(net)
        if stop_after == 4:
            return net, z2, z2

        delta = nn.Dense(2, name="d1")(nn.relu(net))
        weight = nn.sigmoid(nn.Dense(2, name="w1")(nn.relu(net)))
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
        """images [B, H, W, 3] uint8-range floats.

        Returns (fmap1, fmap2, imap). Normalization 2*(x/255) - 0.5 and the
        /4 output scaling match upstream's VONet/Patchifier, so converted
        weights see their training distribution; correlation is then raw
        dot products of the pre-scaled features (no extra normalizer).
        """
        x = 2.0 * (images / 255.0) - 0.5
        fmap1 = self.fnet(x) * 0.25
        imap = self.inet(x) * 0.25
        return fmap1, avg_pool2(fmap1), imap

    def update_step(self, net, imap, corr, kk, pair, ix, jx, live,
                    num_patches, num_pairs, stop_after=0,
                    mt_kk=None, mt_ij=None):
        return self.update(net, imap, corr, kk, pair, ix, jx, live,
                           num_patches, num_pairs, stop_after,
                           mt_kk, mt_ij)

    def __call__(self, images, net, imap_e, corr, kk, pair, ix, jx, live):
        """Joint forward for init only."""
        f1, f2, im = self.encode(images)
        out = self.update(net, imap_e, corr, kk, pair, ix, jx, live, 4, 4)
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
        jnp.zeros((E,), jnp.int32),
        jnp.zeros((E,), jnp.int32),
        jnp.full((E,), -1, jnp.int32),
        jnp.full((E,), -1, jnp.int32),
        jnp.ones((E,), bool),
    )["params"]
    return model, params


# --------------------------------------------------------------------------
# dpvo.pth conversion
# --------------------------------------------------------------------------

def _lin(sd, prefix):
    import numpy as np

    return {
        "kernel": np.asarray(sd[prefix + ".weight"]).T,
        "bias": np.asarray(sd[prefix + ".bias"]),
    }


def _conv_kb(sd, prefix):
    import numpy as np

    return {
        "kernel": np.transpose(np.asarray(sd[prefix + ".weight"]),
                               (2, 3, 1, 0)),
        "bias": np.asarray(sd[prefix + ".bias"]),
    }


def _ln(sd, prefix):
    import numpy as np

    return {
        "scale": np.asarray(sd[prefix + ".weight"]),
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


def _encoder4(sd, prefix):
    return {
        "conv1": _conv_kb(sd, prefix + ".conv1"),
        "conv2": _conv_kb(sd, prefix + ".conv2"),
        "layer1_0": _res_block(sd, prefix + ".layer1.0"),
        "layer1_1": _res_block(sd, prefix + ".layer1.1"),
        "layer2_0": _res_block(sd, prefix + ".layer2.0"),
        "layer2_1": _res_block(sd, prefix + ".layer2.1"),
    }


def _mlp2(sd, prefix):
    return {"lin0": _lin(sd, prefix + ".0"), "lin2": _lin(sd, prefix + ".2")}


def _softagg(sd, prefix):
    return {
        "f": _lin(sd, prefix + ".f"),
        "g": _lin(sd, prefix + ".g"),
        "h": _lin(sd, prefix + ".h"),
    }


def convert_torch_checkpoint(
    state_dict: Dict[str, Any],
    corr_perm: Optional[Any] = None,
) -> Dict[str, Any]:
    """Map a torch ``dpvo.pth`` state dict onto DPVONet params.

    Strips optional ``module.`` prefixes, drops the unused ``update.lmbda``
    scalar (upstream's loader does the same), transposes conv kernels
    OIHW -> HWIO and linear weights [out, in] -> [in, out].

    Args:
      corr_perm: optional [882] permutation mapping OUR corr layout to the
        checkpoint's expected input order, applied to the rows of
        ``update.corr.0.weight`` (see module docstring).

    Returns the ``{"params": ...}`` tree expected by ``DPVONet.apply``.
    """
    import numpy as np

    sd = {}
    for k, v in state_dict.items():
        k = k.replace("module.", "")
        if "update.lmbda" in k:
            continue
        sd[k] = np.asarray(v)

    corr0 = _lin(sd, "update.corr.0")
    if corr_perm is not None:
        corr0 = {
            "kernel": corr0["kernel"][np.asarray(corr_perm)],
            "bias": corr0["bias"],
        }

    update = {
        "corr0": corr0,
        "corr2": _lin(sd, "update.corr.2"),
        "corr3": _ln(sd, "update.corr.3"),
        "corr5": _lin(sd, "update.corr.5"),
        "norm": _ln(sd, "update.norm"),
        "c1": _mlp2(sd, "update.c1"),
        "c2": _mlp2(sd, "update.c2"),
        "agg_kk": _softagg(sd, "update.agg_kk"),
        "agg_ij": _softagg(sd, "update.agg_ij"),
        "gru0": _ln(sd, "update.gru.0"),
        "gru1": {
            "gate0": _lin(sd, "update.gru.1.gate.0"),
            "res": _mlp2(sd, "update.gru.1.res"),
        },
        "gru2": _ln(sd, "update.gru.2"),
        "gru3": {
            "gate0": _lin(sd, "update.gru.3.gate.0"),
            "res": _mlp2(sd, "update.gru.3.res"),
        },
        "d1": _lin(sd, "update.d.1"),
        "w1": _lin(sd, "update.w.1"),
    }
    return {
        "params": {
            "fnet": _encoder4(sd, "patchify.fnet"),
            "inet": _encoder4(sd, "patchify.inet"),
            "update": update,
        }
    }


def load_torch_weights(path: str) -> Dict[str, Any]:
    """Load + convert a dpvo.pth checkpoint from disk (see the env hook
    ``NERF_VO_DPVO_WEIGHTS`` in runtime/stages.py)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return convert_torch_checkpoint(sd)
