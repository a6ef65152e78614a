"""Generate a synthetic Replica-format scene + config for smoke-testing the
full pipeline without real datasets.

Usage:
    python examples/make_synthetic_scene.py [--root datasets_synth] [--frames 40]
    python run.py --config synthetic_demo --experiment smoke --last_scene 0

Renders an analytic textured room (checkerboard plane + sphere) with known
poses into `<root>/Replica/room0` in the exact on-disk layout the Replica
loaders expect (results/frame*.jpg, results/depth*.png, traj.txt,
camera_parameters.json) and writes `configs/synthetic_demo.yaml`.
"""

from __future__ import annotations

import argparse
import json
import os

import cv2
import numpy as np
import yaml

H, W = 120, 160
FX = 120.0
INTR = dict(h=H, w=W, fx=FX, fy=FX, cx=W / 2, cy=H / 2, depth_scale=6553.5)


def render_frame(c2w):
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float64)
    d = np.stack(
        [(xs - INTR["cx"]) / FX, (ys - INTR["cy"]) / FX, np.ones_like(xs)], -1
    )
    R, o = c2w[:3, :3], c2w[:3, 3]
    dw = d @ R.T
    t_plane = (3.0 - o[2]) / np.clip(dw[..., 2], 1e-6, None)
    t_plane = np.where(t_plane > 0, t_plane, 1e9)
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
    hit = t_sph < t_plane
    pts = o + dw * t[..., None]
    check = (np.floor(pts[..., 0] * 4) + np.floor(pts[..., 1] * 4)) % 2
    color = np.where(
        hit[..., None],
        np.asarray([0.9, 0.3, 0.2]),
        np.stack(
            [0.2 + 0.6 * check, 0.7 - 0.4 * check,
             0.5 * np.ones_like(check)], -1,
        ),
    )
    return (
        np.clip(color * 255, 0, 255).astype(np.uint8),
        np.clip(t, 0, 9.9),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="datasets_synth")
    ap.add_argument("--frames", type=int, default=40)
    args = ap.parse_args()

    scene = os.path.join(args.root, "Replica", "room0", "results")
    os.makedirs(scene, exist_ok=True)
    with open(os.path.join(args.root, "Replica", "camera_parameters.json"),
              "w") as f:
        json.dump({"replica": INTR}, f)

    traj = []
    for i in range(args.frames):
        c2w = np.eye(4)
        c2w[0, 3] = 0.03 * i
        ang = 0.008 * i
        c2w[:3, :3] = np.asarray(
            [[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
             [-np.sin(ang), 0, np.cos(ang)]]
        )
        color, depth = render_frame(c2w)
        cv2.imwrite(os.path.join(scene, f"frame{i:06d}.jpg"),
                    cv2.cvtColor(color, cv2.COLOR_RGB2BGR))
        cv2.imwrite(os.path.join(scene, f"depth{i:06d}.png"),
                    (depth * INTR["depth_scale"]).astype(np.uint16))
        traj.append(" ".join(str(v) for v in c2w.flatten()))
    with open(os.path.join(args.root, "Replica", "room0", "traj.txt"),
              "w") as f:
        f.write("\n".join(traj))

    config = dict(
        dir_dataset=os.path.join(args.root, "Replica"),
        dir_prediction="predictions",
        dataset_name="replica",
        scene_names=["room0"],
        num_evaluation_frames=8,
        tracking_module="dpvo",
        enhancement_module="depth",
        mapping_module="nerfstudio",
        multithreading=False,
        performance_tracking=True,
        cache_dataset=True,
        first_frame_index=0,
        last_frame_index=-1,
        frame_stride=1,
        num_keyframes=40,
        frame_height=H,
        frame_width=W,
        patches_per_frame=32,
        removal_window=8,
        optimization_window=6,
        patch_lifetime=6,
        keyframe_threshold=0.0,
        mapping_iterations=512,
        mapping_snapshot_iterations=512,
        rays_per_batch=1024,
        enhancement_image_size=192,
        tracking_init_frames=6,
        tracking_max_edges=4096,
        tracking_ring_size=12,
        tracking_max_frames=128,
    )
    os.makedirs("configs", exist_ok=True)
    with open("configs/synthetic_demo.yaml", "w") as f:
        f.write("# synthetic smoke-test scene (examples/make_synthetic_scene.py)\n")
        yaml.safe_dump(config, f, sort_keys=False)
    print(f"wrote {args.frames} frames to {scene} and configs/synthetic_demo.yaml")


if __name__ == "__main__":
    main()
