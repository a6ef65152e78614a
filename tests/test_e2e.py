"""End-to-end pipeline integration test on a synthetic Replica-style scene.

Exercises: data loading -> DPVO tracking (random weights; mechanics, not
accuracy) -> enhancement (random-weight DPT + alignment) -> online mapping ->
artifact outputs -> rendering -> trajectory/2D/3D metric computation.
"""

import argparse
import json
import os

import cv2
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full pipeline; busts the 1-core CPU fast tier

H, W = 48, 64
FX = 50.0
INTR = dict(h=H, w=W, fx=FX, fy=FX, cx=W / 2, cy=H / 2, depth_scale=6553.5)
N_FRAMES = 14


def _scene_sdf_depth_color(c2w, n_sub=1):
    """Analytic render of a textured room: a plane at z=3 plus a sphere."""
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float64)
    d = np.stack(
        [(xs - INTR["cx"]) / FX, (ys - INTR["cy"]) / FX, np.ones_like(xs)], -1
    )
    R, o = c2w[:3, :3], c2w[:3, 3]
    dw = d @ R.T
    # plane z = 3 (world)
    t_plane = (3.0 - o[2]) / np.clip(dw[..., 2], 1e-6, None)
    t_plane = np.where(t_plane > 0, t_plane, 1e9)
    # sphere at (0, 0, 2), r = 0.5
    center = np.asarray([0.0, 0.0, 2.0])
    oc = o - center
    b = 2 * np.sum(dw * oc, -1)
    c = np.sum(oc * oc) - 0.25
    disc = b * b - 4 * np.sum(dw * dw, -1) * c
    t_sph = np.where(
        disc > 0,
        (-b - np.sqrt(np.maximum(disc, 0))) / (2 * np.sum(dw * dw, -1)),
        1e9,
    )
    t_sph = np.where(t_sph > 0, t_sph, 1e9)
    t = np.minimum(t_plane, t_sph)
    hit_sphere = t_sph < t_plane
    pts = o + dw * t[..., None]
    # texture: checkerboard on the plane, solid on the sphere
    check = ((np.floor(pts[..., 0] * 4) + np.floor(pts[..., 1] * 4)) % 2)
    color = np.where(
        hit_sphere[..., None],
        np.asarray([0.9, 0.3, 0.2]),
        np.stack([0.2 + 0.6 * check, 0.7 - 0.4 * check, 0.5 * np.ones_like(check)], -1),
    )
    depth = t  # z-depth since dw has unit camera z
    return (np.clip(color * 255, 0, 255).astype(np.uint8),
            np.clip(depth, 0, 9.9))


@pytest.fixture(scope="module")
def scene_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("Replica")
    scene = root / "room0"
    (scene / "results").mkdir(parents=True)
    (root / "camera_parameters.json").write_text(
        json.dumps({"replica": INTR})
    )
    traj = []
    for i in range(N_FRAMES):
        c2w = np.eye(4)
        c2w[0, 3] = 0.04 * i  # slow lateral motion
        ang = 0.01 * i
        c2w[:3, :3] = np.asarray(
            [[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
             [-np.sin(ang), 0, np.cos(ang)]]
        )
        color, depth = _scene_sdf_depth_color(c2w)
        cv2.imwrite(str(scene / "results" / f"frame{i:06d}.jpg"),
                    cv2.cvtColor(color, cv2.COLOR_RGB2BGR))
        cv2.imwrite(
            str(scene / "results" / f"depth{i:06d}.png"),
            (depth * INTR["depth_scale"]).astype(np.uint16),
        )
        traj.append(" ".join(str(v) for v in c2w.flatten()))
    (scene / "traj.txt").write_text("\n".join(traj))
    return root


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
        tracking_module="dpvo",
        enhancement_module="depth",
        mapping_module="nerfstudio",
        multithreading=False,
        performance_tracking=True,
        cache_dataset=False,
        first_frame_index=0,
        last_frame_index=-1,
        frame_stride=1,
        num_keyframes=16,
        frame_height=H,
        frame_width=W,
        patches_per_frame=8,
        removal_window=5,
        optimization_window=4,
        patch_lifetime=4,
        keyframe_threshold=0.0,
        mapping_iterations=48,
        mapping_snapshot_iterations=48,
        rays_per_batch=128,
        enhancement_image_size=96,
        enhancement_dpt_layers=2,
        tracking_init_frames=4,
        tracking_max_edges=512,
        tracking_ring_size=8,
        tracking_max_frames=64,
        render_poisson_mesh=True,
        poisson_grid_resolution=64,
    )
    return argparse.Namespace(**cfg), cfg


@pytest.fixture(scope="module")
def pipeline_run(scene_root, tmp_path_factory):
    from nerf_vo_tpu.runtime.pipeline import execute

    tmp = tmp_path_factory.mktemp("out")
    args, cfg = _args(scene_root, tmp)
    mapping = execute(args)
    return args, cfg, mapping


def test_pipeline_artifacts(pipeline_run):
    args, cfg, mapping = pipeline_run
    assert mapping.num_inserted > 0
    assert mapping.step_count == cfg["mapping_iterations"]
    pred = cfg["dir_prediction"]
    assert os.path.exists(pred + "/mapping_keyframe2frame.json")
    assert os.path.exists(
        pred + "/matrices/matrices_origin2frame_keyframes_tracking.json"
    )
    assert os.path.exists(
        pred + "/matrices/matrices_origin2frame_training.json"
    )
    snaps = os.listdir(pred + "/snapshots")
    assert len(snaps) >= 1
    assert os.path.exists(pred + "/dataset.npz")
    # runtime telemetry
    for stage in ("data", "tracking", "mapping"):
        assert os.path.exists(cfg["dir_result"] + f"/runtime_{stage}.csv")
    with open(pred + "/mapping_keyframe2frame.json") as f:
        kf2f = json.load(f)
    assert len(kf2f) == mapping.num_inserted


def test_render_and_evaluate(pipeline_run):
    from nerf_vo_tpu.evaluation.runner import render_and_evaluate

    args, cfg, mapping = pipeline_run
    metrics = render_and_evaluate(args, cfg, mapping)
    t = metrics["trajectory"]
    assert "keyframes_tracking/ate_rmse" in t
    assert np.isfinite(t["keyframes_tracking/ate_rmse"])
    m2 = metrics["2d"]
    assert "psnr" in m2 and np.isfinite(m2["psnr"])
    assert "depth_rmse" in m2
    # artifacts
    pred = cfg["dir_prediction"]
    from nerf_vo_tpu.evaluation.datasets import ReplicaDataset

    n_eval = len(range(0, N_FRAMES, N_FRAMES // 4))  # reference stepping
    assert len(os.listdir(pred + "/evaluation_frames/color")) == n_eval
    assert len(os.listdir(pred + "/evaluation_frames/depth")) == n_eval
    assert os.path.exists(pred + "/mesh/mesh_from_evaluation_frames.ply")
    assert os.path.exists(pred + "/mesh/mesh_from_poisson.ply")
    m3 = metrics["3d"]
    assert m3 is not None and np.isfinite(m3["mesh_f1"])
