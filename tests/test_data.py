import argparse
import json
import os

import cv2
import numpy as np
import pytest

from nerf_vo_tpu.data import utils
from nerf_vo_tpu.data.datasets import make_dataset


def _args(**kw):
    base = dict(
        dir_dataset="",
        dataset_name="replica",
        first_frame_index=0,
        last_frame_index=-1,
        frame_stride=1,
        frame_height=48,
        frame_width=64,
        cache_dataset=False,
    )
    base.update(kw)
    return argparse.Namespace(**base)


@pytest.fixture
def replica_root(tmp_path):
    root = tmp_path / "Replica"
    scene = root / "room0" / "results"
    scene.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(6):
        img = rng.integers(0, 255, (60, 80, 3), dtype=np.uint8)
        cv2.imwrite(str(scene / f"frame{i:06d}.jpg"), img)
    (root / "camera_parameters.json").write_text(
        json.dumps(
            {
                "replica": {
                    "h": 60, "w": 80, "fx": 40.0, "fy": 40.0,
                    "cx": 40.0, "cy": 30.0, "depth_scale": 6553.5,
                }
            }
        )
    )
    return root


def test_replica_dataset(replica_root):
    args = _args(dir_dataset=str(replica_root / "room0"))
    ds = make_dataset("replica", args)
    assert len(ds) == 6
    f = ds[0]
    assert f["frame_color"].shape == (48, 64, 3)
    assert f["frame_color"].dtype == np.uint8
    assert not f["last_frame"]
    assert ds[5]["last_frame"]
    # intrinsics scaled 80->64, 60->48
    np.testing.assert_allclose(ds.intrinsics_vector(), [32.0, 32.0, 32.0, 24.0])
    assert f["camera_intrinsics"]["depth_scale"] == 6553.5


def test_replica_slicing_and_cache(replica_root):
    args = _args(
        dir_dataset=str(replica_root / "room0"),
        first_frame_index=1,
        last_frame_index=5,
        frame_stride=2,
        cache_dataset=True,
    )
    ds = make_dataset("replica", args)
    assert len(ds) == 2  # frames 1, 3
    assert ds.cache is not None
    assert ds[1]["last_frame"]


@pytest.fixture
def tum_root(tmp_path):
    root = tmp_path / "TUM"
    seq = root / "rgbd_dataset_freiburg1_desk"
    (seq / "rgb").mkdir(parents=True)
    rng = np.random.default_rng(1)
    rgb_lines = ["# color data"]
    depth_lines = ["# depth data"]
    gt_lines = ["# ground truth"]
    for i in range(5):
        t = 100.0 + i * 0.1
        name = f"rgb/{t:.6f}.png"
        cv2.imwrite(
            str(seq / name), rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
        )
        rgb_lines.append(f"{t:.6f} {name}")
        depth_lines.append(f"{t + 0.005:.6f} depth/{t:.6f}.png")
        gt_lines.append(f"{t + 0.002:.6f} 0 0 0 0 0 0 1")
    # one unmatched color frame (no depth within 0.02s)
    cv2.imwrite(
        str(seq / "rgb/999.000000.png"),
        rng.integers(0, 255, (48, 64, 3), dtype=np.uint8),
    )
    rgb_lines.append("999.000000 rgb/999.000000.png")
    (seq / "rgb.txt").write_text("\n".join(rgb_lines))
    (seq / "depth.txt").write_text("\n".join(depth_lines))
    (seq / "groundtruth.txt").write_text("\n".join(gt_lines))
    (root / "camera_parameters.json").write_text(
        json.dumps(
            {
                "fr1": {
                    "h": 48, "w": 64, "fx": 50.0, "fy": 50.0, "cx": 32.0,
                    "cy": 24.0, "depth_scale": 5000.0,
                    "k1": 0.01, "k2": -0.01, "p1": 0.0, "p2": 0.0, "k3": 0.0,
                }
            }
        )
    )
    return seq


def test_tum_dataset(tum_root):
    args = _args(
        dir_dataset=str(tum_root), dataset_name="tum-rgbd",
        frame_height=40, frame_width=60,
    )
    ds = make_dataset("tum-rgbd", args)
    assert len(ds) == 5  # unmatched frame dropped
    f = ds[0]
    assert f["frame_color"].shape == (40, 60, 3)
    ci = f["camera_intrinsics"]
    assert "k1" not in ci
    # pad-crop shifts the principal point by half the padding
    pad_h = utils.even_padding(60)
    pad_v = utils.even_padding(40)
    sx = (60 + pad_h) / 64
    np.testing.assert_allclose(ci["fx"], 50.0 * sx)
    np.testing.assert_allclose(ci["cx"], 32.0 * sx - pad_h / 2)


def test_associate_timestamps_greedy():
    src = [1.0, 2.0, 3.0]
    tgt = [1.015, 2.5, 3.001]
    matches = utils.associate_timestamp_data(src, tgt)
    assert (3.0, 3.001) in matches
    assert (1.0, 1.015) in matches
    assert len(matches) == 2
    assert src == [2.0]  # consumed like the reference


def test_even_padding():
    assert utils.even_padding(640) == 64
    assert utils.even_padding(360) == 36
    assert utils.even_padding(630) == 64  # 63 -> rounded up to even


@pytest.fixture
def scannet_root(tmp_path):
    scene = tmp_path / "scene0000_00"
    (scene / "color").mkdir(parents=True)
    (scene / "intrinsics").mkdir()
    rng = np.random.default_rng(2)
    for i in [0, 1, 2, 10]:  # numeric sort must order 2 < 10
        cv2.imwrite(
            str(scene / "color" / f"{i}.jpg"),
            rng.integers(0, 255, (48, 64, 3), dtype=np.uint8),
        )
    K = np.eye(4)
    K[0, 0], K[1, 1], K[0, 2], K[1, 2] = 50, 50, 32, 24
    (scene / "intrinsics" / "intrinsic_color.txt").write_text(
        " ".join(str(v) for v in K.flatten())
    )
    return scene


def test_scannet_dataset(scannet_root):
    args = _args(
        dir_dataset=str(scannet_root), dataset_name="scannet",
        frame_height=40, frame_width=60,
    )
    ds = make_dataset("scannet", args)
    assert len(ds) == 4
    assert os.path.basename(ds.files_color[-1]) == "10.jpg"
    assert ds[0]["frame_color"].shape == (40, 60, 3)
    assert ds.camera_intrinsics["depth_scale"] == 1000.0
