"""ScanNet scene downloader + .sens decoder.

Parity with the reference's scripts/download_scannet.py: downloads a scene's
``.sens`` capture via the official ScanNet HTTP endpoint (requires having
accepted the ScanNet terms of use) and decodes it into
``color/ depth/ pose/ intrinsics/`` directories in the layout the ScanNet
loaders expect.

.sens binary layout (public ScanNet C++ SensorData format): a header with
version/sensor-name/calibration matrices/compression types/frame count,
followed by per-frame records (two 4x4 camera-to-world floats? no — one 4x4
pose, timestamps, and length-prefixed compressed color (JPEG) + depth (zlib
uint16) payloads).

Usage:
  python scripts/download_scannet.py --scene scene0000_00 --out datasets/ScanNet
  python scripts/download_scannet.py --decode path/to/scene0000_00.sens --out datasets/ScanNet
"""

from __future__ import annotations

import argparse
import os
import struct
import urllib.request
import zlib

import cv2
import numpy as np

BASE_URL = "http://kaldir.vc.in.tum.de/scannet/v2/scans"


def download_scene(scene: str, out_dir: str) -> str:
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, f"{scene}.sens")
    if not os.path.exists(path):
        url = f"{BASE_URL}/{scene}/{scene}.sens"
        print(f"downloading {url}")
        urllib.request.urlretrieve(url, path)
    return path


def _read_string(f) -> str:
    (n,) = struct.unpack("<Q", f.read(8))
    return f.read(n).decode("ascii", errors="replace")


def decode_sens(sens_path: str, out_root: str, frame_skip: int = 1) -> None:
    scene = os.path.splitext(os.path.basename(sens_path))[0]
    out = os.path.join(out_root, scene)
    for sub in ("color", "depth", "pose", "intrinsics"):
        os.makedirs(os.path.join(out, sub), exist_ok=True)

    with open(sens_path, "rb") as f:
        (version,) = struct.unpack("<I", f.read(4))
        _sensor_name = _read_string(f)
        intrinsic_color = np.frombuffer(f.read(16 * 4), np.float32).reshape(4, 4)
        extrinsic_color = np.frombuffer(f.read(16 * 4), np.float32).reshape(4, 4)
        intrinsic_depth = np.frombuffer(f.read(16 * 4), np.float32).reshape(4, 4)
        extrinsic_depth = np.frombuffer(f.read(16 * 4), np.float32).reshape(4, 4)
        (color_compression,) = struct.unpack("<i", f.read(4))
        (depth_compression,) = struct.unpack("<i", f.read(4))
        (color_w,) = struct.unpack("<I", f.read(4))
        (color_h,) = struct.unpack("<I", f.read(4))
        (depth_w,) = struct.unpack("<I", f.read(4))
        (depth_h,) = struct.unpack("<I", f.read(4))
        (_depth_shift,) = struct.unpack("<f", f.read(4))
        (num_frames,) = struct.unpack("<Q", f.read(8))

        np.savetxt(os.path.join(out, "intrinsics", "intrinsic_color.txt"),
                   intrinsic_color)
        np.savetxt(os.path.join(out, "intrinsics", "intrinsic_depth.txt"),
                   intrinsic_depth)
        np.savetxt(os.path.join(out, "intrinsics", "extrinsic_color.txt"),
                   extrinsic_color)
        np.savetxt(os.path.join(out, "intrinsics", "extrinsic_depth.txt"),
                   extrinsic_depth)

        for i in range(num_frames):
            pose = np.frombuffer(f.read(16 * 4), np.float32).reshape(4, 4)
            (_t_color,) = struct.unpack("<Q", f.read(8))
            (_t_depth,) = struct.unpack("<Q", f.read(8))
            (n_color,) = struct.unpack("<Q", f.read(8))
            (n_depth,) = struct.unpack("<Q", f.read(8))
            color_bytes = f.read(n_color)
            depth_bytes = f.read(n_depth)
            if i % frame_skip:
                continue
            np.savetxt(os.path.join(out, "pose", f"{i}.txt"), pose)
            # color: jpeg payload
            img = cv2.imdecode(
                np.frombuffer(color_bytes, np.uint8), cv2.IMREAD_COLOR
            )
            cv2.imwrite(os.path.join(out, "color", f"{i}.jpg"), img)
            # depth: zlib-compressed uint16 (mm)
            depth = np.frombuffer(
                zlib.decompress(depth_bytes), np.uint16
            ).reshape(depth_h, depth_w)
            cv2.imwrite(os.path.join(out, "depth", f"{i}.png"), depth)
        print(f"decoded {num_frames} frames -> {out}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default=None, help="e.g. scene0000_00")
    ap.add_argument("--decode", default=None, help="path to an existing .sens")
    ap.add_argument("--out", default="datasets/ScanNet")
    ap.add_argument("--frame_skip", type=int, default=1)
    args = ap.parse_args()
    if args.scene:
        sens = download_scene(args.scene, args.out)
    elif args.decode:
        sens = args.decode
    else:
        ap.error("need --scene or --decode")
    decode_sens(sens, args.out, args.frame_skip)


if __name__ == "__main__":
    main()
