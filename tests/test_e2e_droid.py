"""End-to-end test of the nerf_slam pipeline (DROID tracking + NGP-style
mapping with covariance-weighted depth) on the synthetic scene."""

import argparse
import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full pipeline; busts the 1-core CPU fast tier

from tests.test_e2e import H, W, scene_root  # noqa: F401 (fixture reuse)


def _args(scene_root, tmp_path):
    pred = tmp_path / "pred" / "room0"
    result = tmp_path / "results" / "room0"
    pred.mkdir(parents=True)
    result.mkdir(parents=True)
    cfg = dict(
        dir_dataset=str(scene_root / "room0"),
        dir_prediction=str(pred),
        dir_result=str(result),
        dataset_name="replica",
        scene_name="room0",
        num_evaluation_frames=4,
        tracking_module="droid-slam",
        enhancement_module="none",
        mapping_module="instant-ngp",
        perform_global_bundle_adjustment=True,
        compute_covariances=True,
        multithreading=False,
        performance_tracking=True,
        cache_dataset=False,
        first_frame_index=0,
        last_frame_index=-1,
        frame_stride=1,
        num_keyframes=24,
        frame_height=H,
        frame_width=W,
        motion_threshold=0.0,
        keyframe_threshold=4.0,
        tracking_frontend_window=5,
        tracking_max_edges=24,
        mapping_iterations=32,
        mapping_snapshot_iterations=32,
        rays_per_batch=128,
    )
    return argparse.Namespace(**cfg), cfg


def test_nerf_slam_pipeline(scene_root, tmp_path):
    from nerf_vo_tpu.runtime.pipeline import execute

    args, cfg = _args(scene_root, tmp_path)
    mapping = execute(args)
    assert mapping.num_inserted > 0
    assert mapping.step_count == cfg["mapping_iterations"]
    # depth covariance flowed into the buffer (instant-ngp path)
    assert mapping.buffer.depth_cov.shape[1] == H
    cov = np.asarray(mapping.buffer.depth_cov[: mapping.num_inserted])
    assert (cov > 0).all()
    # depth converted from DROID inverse depth
    d = np.asarray(mapping.buffer.depth[: mapping.num_inserted])
    assert (d >= 0).all() and np.isfinite(d).all()
    pred = cfg["dir_prediction"]
    assert os.path.exists(pred + "/mapping_keyframe2frame.json")
    with open(pred + "/mapping_keyframe2frame.json") as f:
        assert len(json.load(f)) == mapping.num_inserted
