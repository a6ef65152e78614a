
"""Full-train-state snapshot/restore roundtrip."""

import argparse
import pytest

pytestmark = pytest.mark.slow  # full snapshot/restore fit; compile-heavy

import jax
import jax.numpy as jnp
import numpy as np


def test_trainstate_resume(tmp_path, rng):
    from nerf_vo_tpu.runtime.stages import MappingStage
    from nerf_vo_tpu.mapping import keyframe_buffer as kb

    H, W, K = 16, 24, 8
    args = argparse.Namespace(
        mapping_module="nerfstudio", enhancement_module="depth",
        num_keyframes=K, frame_height=H, frame_width=W,
        mapping_iterations=6, mapping_snapshot_iterations=6,
        rays_per_batch=64, dir_prediction=str(tmp_path),
    )
    m = MappingStage(args)
    c2w = np.tile(np.eye(4, dtype=np.float32), (2, 1, 1))
    pkt = {
        "camera_intrinsics": np.tile(np.asarray([10., 10., W/2, H/2],
                                                np.float32), (2, 1)),
        "camera_extrinsics": c2w,
        "frames_color_float": rng.uniform(0, 1, (2, H, W, 3)).astype(
            np.float32),
        "frames_depth": np.full((2, H, W), 2.0, np.float32),
        "frames_normal": np.tile(np.asarray([0, 0, 1], np.float32),
                                 (2, H, W, 1)),
    }
    m.update(pkt)
    m.finish()  # trains to mapping_iterations
    assert m.step_count == 6
    m.save_snapshot(str(tmp_path))

    m2 = MappingStage(args)
    m2.buffer = m.buffer
    m2.num_inserted = m.num_inserted
    m2.restore_snapshot(str(tmp_path) + "/snapshots/trainstate000006.msgpack")
    assert m2.step_count == 6
    flat1, _ = jax.flatten_util.ravel_pytree(m.state.params)
    flat2, _ = jax.flatten_util.ravel_pytree(m2.state.params)
    np.testing.assert_allclose(np.asarray(flat1), np.asarray(flat2))
    flat1, _ = jax.flatten_util.ravel_pytree(m.state.opt_state)
    flat2, _ = jax.flatten_util.ravel_pytree(m2.state.opt_state)
    np.testing.assert_allclose(np.asarray(flat1), np.asarray(flat2))
    # training continues from the restored state without error
    m2.mapping_iterations = 8
    m2.stream_active = False
    m2.train_step()
    assert m2.step_count == 7
