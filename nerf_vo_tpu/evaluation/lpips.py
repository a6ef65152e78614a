"""LPIPS(alex) perceptual metric in pure JAX.

TPU-native replacement for the ``lpips`` package the reference evaluator
uses (reference evaluation/evaluation_utils.py:418-444, SURVEY.md N9): the
AlexNet feature trunk, LPIPS input scaling, per-layer unit normalization,
and the learned non-negative 1x1 linear heads are all implemented here; the
only thing this zero-egress environment cannot provide is the pretrained
weights, so :func:`load_torch_weights` converts a torch state dict (either
the ``lpips`` package's combined dump or torchvision ``alexnet`` features +
``lins``) when a file is available, and callers gate on that.

Structure (Zhang et al., "The Unreasonable Effectiveness of Deep Features
as a Perceptual Metric", CVPR 2018):
  d(x, y) = sum_l mean_hw || w_l * (norm(f_l(x)) - norm(f_l(y))) ||^2
with f_l the 5 post-ReLU AlexNet feature stages.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

# LPIPS input normalization (the package's ScalingLayer constants)
_SHIFT = np.asarray([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.asarray([0.458, 0.448, 0.450], np.float32)

# AlexNet feature geometry: (out_ch, kernel, stride, pad, maxpool_before)
_ALEX = (
    (64, 11, 4, 2, False),
    (192, 5, 1, 2, True),
    (384, 3, 1, 1, True),
    (256, 3, 1, 1, False),
    (256, 3, 1, 1, False),
)
_CHANNELS = tuple(c for c, *_ in _ALEX)


def init_params(key) -> Dict[str, Any]:
    """Random-init parameter tree (for tests; real use loads a checkpoint)."""
    params: Dict[str, Any] = {}
    cin = 3
    keys = jax.random.split(key, 2 * len(_ALEX))
    for i, (cout, k, _, _, _) in enumerate(_ALEX):
        params[f"conv{i}_w"] = (
            jax.random.normal(keys[2 * i], (k, k, cin, cout)) * 0.05
        )
        params[f"conv{i}_b"] = jnp.zeros((cout,))
        params[f"lin{i}"] = jnp.abs(
            jax.random.normal(keys[2 * i + 1], (cout,)) * 0.1
        )
        cin = cout
    return params


def _features(params, x):
    """x: [B, H, W, 3] in [-1, 1] (LPIPS convention). -> 5 feature taps."""
    x = (x - _SHIFT) / _SCALE
    taps = []
    for i, (_, _, stride, pad, pool_before) in enumerate(_ALEX):
        if pool_before:
            x = -jax.lax.reduce_window(
                -x, jnp.inf, jax.lax.min, (1, 3, 3, 1), (1, 2, 2, 1),
                "VALID",
            )
        x = jax.lax.conv_general_dilated(
            x, params[f"conv{i}_w"], (stride, stride),
            [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + params[f"conv{i}_b"]
        x = jax.nn.relu(x)
        taps.append(x)
    return taps


def lpips_alex(params, pred, target):
    """LPIPS distance per batch element.

    Args:
      pred/target: [B, H, W, 3] float RGB in [0, 1].

    Returns [B] distances.
    """
    a = _features(params, pred * 2.0 - 1.0)
    b = _features(params, target * 2.0 - 1.0)
    total = 0.0
    for i, (fa, fb) in enumerate(zip(a, b)):
        na = fa / jnp.clip(
            jnp.linalg.norm(fa, axis=-1, keepdims=True), 1e-10
        )
        nb = fb / jnp.clip(
            jnp.linalg.norm(fb, axis=-1, keepdims=True), 1e-10
        )
        d = (na - nb) ** 2 * params[f"lin{i}"]
        total = total + jnp.mean(jnp.sum(d, axis=-1), axis=(1, 2))
    return total


def load_torch_weights(path: str) -> Dict[str, Any]:
    """Convert a torch LPIPS-Alex checkpoint to this module's param tree.

    Accepts either (a) a combined ``lpips.LPIPS(net='alex')`` state dict
    (keys ``net.slice*.*.weight`` + ``lin*.model.1.weight``) or (b) a dict
    with torchvision ``features.*`` AlexNet keys + ``lin*`` heads. Conv
    kernels transpose OIHW -> HWIO; the 1x1 head weights flatten to [C].
    """
    import torch

    # weights_only=True: never execute pickled code from the checkpoint
    # path (it is user-supplied via NERF_VO_LPIPS_WEIGHTS). Full-module
    # pickles are intentionally unsupported — export a state dict instead.
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: np.asarray(v) for k, v in sd.items()}

    def find(*cands):
        for c in cands:
            if c in sd:
                return sd[c]
        raise KeyError(f"none of {cands} in checkpoint ({len(sd)} keys)")

    # torchvision AlexNet feature indices of the conv layers
    tv_idx = (0, 3, 6, 8, 10)
    # lpips-package slices: net.slice{n}.{local_idx}
    slice_idx = ((1, 0), (2, 3), (3, 6), (4, 8), (5, 10))
    params: Dict[str, Any] = {}
    for i in range(5):
        s, li = slice_idx[i]
        w = find(
            f"features.{tv_idx[i]}.weight",
            f"net.features.{tv_idx[i]}.weight",
            f"net.slice{s}.{li}.weight",
        )
        b = find(
            f"features.{tv_idx[i]}.bias",
            f"net.features.{tv_idx[i]}.bias",
            f"net.slice{s}.{li}.bias",
        )
        params[f"conv{i}_w"] = jnp.asarray(w.transpose(2, 3, 1, 0))
        params[f"conv{i}_b"] = jnp.asarray(b)
        lin = find(
            f"lin{i}.model.1.weight",
            f"lins.{i}.model.1.weight",
            f"lin{i}.weight",
        )
        params[f"lin{i}"] = jnp.asarray(lin.reshape(-1))
        assert params[f"lin{i}"].shape[0] == _CHANNELS[i], (
            params[f"lin{i}"].shape, _CHANNELS[i],
        )
    return params


_cached: Dict[str, Any] = {}


def lpips_from_file(pred: np.ndarray, target: np.ndarray,
                    weights_path: str) -> Optional[float]:
    """Single-pair convenience wrapper with weight caching."""
    if weights_path not in _cached:
        _cached[weights_path] = load_torch_weights(weights_path)
    params = _cached[weights_path]
    d = lpips_alex(
        params,
        jnp.asarray(pred, jnp.float32)[None],
        jnp.asarray(target, jnp.float32)[None],
    )
    return float(d[0])
