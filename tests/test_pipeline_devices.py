"""Two-chip pipeline split: mapping + enhancement pinned to their own
device (the multi-chip answer to SURVEY §7.3(4)).

bench_pipeline measured that on ONE chip the mapping train steps serialize
against tracking's per-frame dispatches (tracking drops to single-digit
FPS at 4 mapping steps/frame). With `mapping_device: 1` /
`enhancement_device: 1` in the config, the NeRF state, keyframe buffers,
and DPT weights live on a second chip and their dispatches overlap
tracking's on chip 0. These tests validate the placement + the full
packet flow on the virtual 8-device CPU mesh (conftest forces it); real
overlap needs real chips, which the driver does not have — the mechanism
is what is pinned here.
"""

from types import SimpleNamespace

import jax
import numpy as np
import pytest

from nerf_vo_tpu.runtime.stages import EnhancementStage, MappingStage


def _args(**over):
    base = dict(
        enhancement_module="depth+normal",
        mapping_module="nerfstudio",
        num_keyframes=8,
        frame_height=48,
        frame_width=64,
        mapping_iterations=16,
        enhancement_image_size=96,
        enhancement_dpt_layers=2,
        rays_per_batch=128,
        mapping_model_overrides={
            "log2_hashmap_size": 10,
            "num_proposal_samples": (8,),
            "proposal_resolutions": (8,),
            "num_nerf_samples": 8,
        },
        mapping_device=1,
        enhancement_device=1,
    )
    base.update(over)
    return SimpleNamespace(**base)


def _packet(rng, K=3, lo=0):
    return {
        "keyframe_indices": np.arange(lo, lo + K),
        "camera_intrinsics": np.tile(
            [50.0, 50.0, 32.0, 24.0], (K, 1)
        ).astype(np.float32),
        "camera_extrinsics": np.tile(np.eye(4, dtype=np.float32), (K, 1, 1)),
        "frames_color": rng.integers(0, 255, (K, 3, 48, 64), dtype=np.uint8),
        "dpvo_patches": rng.uniform(0, 10, (K, 8, 3, 3, 3)).astype(
            np.float32
        ),
        "last_frame": False,
    }


def _on_device(x, d):
    return list(x.devices()) == [d]


def test_two_chip_packet_flow():
    dev1 = jax.devices()[1]
    enh = EnhancementStage(_args())
    mapping = MappingStage(_args())
    # placement: DPT weights, train state, and buffers live on device 1
    leaf = jax.tree_util.tree_leaves(enh.estimator.depth_params)[0]
    assert _on_device(leaf, dev1)
    assert _on_device(jax.tree_util.tree_leaves(mapping.state.params)[0],
                      dev1)
    assert _on_device(mapping.buffer.pixels, dev1)

    rng = np.random.default_rng(0)
    out = enh.step(_packet(rng))
    # the enhanced packet's heavy tensors are device arrays on device 1 —
    # no host round-trip between enhancement and mapping
    assert _on_device(out["frames_color_float"], dev1)
    assert _on_device(out["frames_depth"], dev1)
    mapping.update(out)
    m = mapping.train_step()
    assert m is not None and np.isfinite(float(m["loss"]))
    assert _on_device(jax.tree_util.tree_leaves(mapping.state.params)[0],
                      dev1)
    # second packet exercises the device bucket-pad path (B=4 > n=3)
    mapping.update(enh.step(_packet(rng, lo=3)))
    m = mapping.train_step()
    assert np.isfinite(float(m["loss"]))


def test_single_device_default_unchanged():
    """Without the knobs everything stays on the default device."""
    dev0 = jax.devices()[0]
    args = _args(mapping_device=None, enhancement_device=None)
    enh = EnhancementStage(args)
    mapping = MappingStage(args)
    rng = np.random.default_rng(1)
    out = enh.step(_packet(rng))
    assert _on_device(out["frames_depth"], dev0)
    mapping.update(out)
    m = mapping.train_step()
    assert m is not None and np.isfinite(float(m["loss"]))


def test_bad_device_index_raises():
    with pytest.raises(ValueError):
        MappingStage(_args(mapping_device=64))
