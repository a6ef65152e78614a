"""Parity-harness tests: the turnkey accuracy-parity command (parity.py).

Fast tier: weight-hook inventory + abort-with-instructions path.
Slow tier: the full dry run on a synthetic Replica-format scene — asserts
the report covers every reference-comparable metric including an explicit
LPIPS N/A, is stamped DRY-RUN under random weights, and that every
underlying metric CSV/JSON artifact exists (reference surface:
run.py:29-91, evaluation/evaluator.py:55-174).
"""

import json
import os
import sys

import cv2
import numpy as np
import pytest
import yaml

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import parity  # noqa: E402

H, W = 48, 64
FX = 50.0
INTR = dict(h=H, w=W, fx=FX, fy=FX, cx=W / 2, cy=H / 2, depth_scale=6553.5)
N_FRAMES = 14


def test_weight_hooks_inventory(monkeypatch):
    cfg = dict(tracking_module="dpvo", enhancement_module="depth-normal")
    monkeypatch.delenv("NERF_VO_DPVO_WEIGHTS", raising=False)
    monkeypatch.delenv("NERF_VO_LPIPS_WEIGHTS", raising=False)
    hooks = parity.weight_hooks_for(cfg)
    assert set(hooks) == {"dpvo", "omnidata_depth", "omnidata_normal",
                          "lpips"}
    assert hooks["dpvo"]["required"] and not hooks["dpvo"]["present"]
    assert not hooks["lpips"]["required"]

    cfg2 = dict(tracking_module="droid-slam", enhancement_module="none")
    hooks2 = parity.weight_hooks_for(cfg2)
    assert set(hooks2) == {"droid", "lpips"}
    assert hooks2["droid"]["env"] == "NERF_VO_DROID_WEIGHTS"


def test_missing_checkpoints_abort(monkeypatch, tmp_path, capsys):
    for env in ("NERF_VO_DPVO_WEIGHTS", "NERF_VO_OMNIDATA_DEPTH_WEIGHTS",
                "NERF_VO_OMNIDATA_NORMAL_WEIGHTS", "NERF_VO_LPIPS_WEIGHTS"):
        monkeypatch.delenv(env, raising=False)
    monkeypatch.chdir(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    with pytest.raises(SystemExit) as e:
        parity.run_parity("nerf_vo_replica", scenes=["room0"])
    assert e.value.code == 2
    err = capsys.readouterr().err
    assert "NERF_VO_DPVO_WEIGHTS" in err
    assert "NERF_VO_OMNIDATA_DEPTH_WEIGHTS" in err
    assert "--allow-random-weights" in err


def test_hooks_respect_env(monkeypatch, tmp_path):
    ck = tmp_path / "dpvo.pth"
    ck.write_bytes(b"x")
    monkeypatch.setenv("NERF_VO_DPVO_WEIGHTS", str(ck))
    hooks = parity.weight_hooks_for(dict(tracking_module="dpvo",
                                         enhancement_module="none"))
    assert hooks["dpvo"]["present"]
    assert hooks["dpvo"]["path"] == str(ck)


# ---------------------------------------------------------------------------
# Slow tier: full dry run on a synthetic scene
# ---------------------------------------------------------------------------


def _write_scene(root):
    """Synthetic Replica-format scene (same analytic room as test_e2e)."""
    scene = root / "room0"
    (scene / "results").mkdir(parents=True)
    (root / "camera_parameters.json").write_text(json.dumps({"replica": INTR}))
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float64)
    d = np.stack(
        [(xs - INTR["cx"]) / FX, (ys - INTR["cy"]) / FX, np.ones_like(xs)], -1
    )
    traj = []
    for i in range(N_FRAMES):
        c2w = np.eye(4)
        c2w[0, 3] = 0.04 * i
        ang = 0.01 * i
        c2w[:3, :3] = np.asarray(
            [[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
             [-np.sin(ang), 0, np.cos(ang)]]
        )
        R, o = c2w[:3, :3], c2w[:3, 3]
        dw = d @ R.T
        t = np.clip((3.0 - o[2]) / np.clip(dw[..., 2], 1e-6, None), 0, 9.9)
        pts = o + dw * t[..., None]
        check = ((np.floor(pts[..., 0] * 4) + np.floor(pts[..., 1] * 4)) % 2)
        color = np.stack(
            [0.2 + 0.6 * check, 0.7 - 0.4 * check, 0.5 * np.ones_like(check)],
            -1,
        )
        cv2.imwrite(str(scene / "results" / f"frame{i:06d}.jpg"),
                    cv2.cvtColor((color * 255).astype(np.uint8),
                                 cv2.COLOR_RGB2BGR))
        cv2.imwrite(str(scene / "results" / f"depth{i:06d}.png"),
                    (t * INTR["depth_scale"]).astype(np.uint16))
        traj.append(" ".join(str(v) for v in c2w.flatten()))
    (scene / "traj.txt").write_text("\n".join(traj))


@pytest.mark.slow
def test_parity_dry_run(monkeypatch, tmp_path):
    for env in ("NERF_VO_DPVO_WEIGHTS", "NERF_VO_OMNIDATA_DEPTH_WEIGHTS",
                "NERF_VO_OMNIDATA_NORMAL_WEIGHTS", "NERF_VO_LPIPS_WEIGHTS"):
        monkeypatch.delenv(env, raising=False)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    monkeypatch.chdir(repo)
    scene_root = tmp_path / "Replica"
    _write_scene(scene_root)
    overrides = dict(
        dir_dataset=str(scene_root),
        dir_prediction=str(tmp_path / "pred"),
        num_evaluation_frames=4,
        num_keyframes=16,
        frame_height=H, frame_width=W,
        patches_per_frame=8, removal_window=5, optimization_window=4,
        patch_lifetime=4, keyframe_threshold=0.0,
        mapping_iterations=48, mapping_snapshot_iterations=48,
        rays_per_batch=128, enhancement_image_size=96,
        enhancement_dpt_layers=2, tracking_init_frames=4,
        tracking_max_edges=512, tracking_ring_size=8,
        tracking_max_frames=64, multithreading=False,
        cache_dataset=False, frame_stride=1,
        first_frame_index=0, last_frame_index=-1,
    )
    report = parity.run_parity(
        "nerf_vo_replica", scenes=["room0"],
        allow_random_weights=True, overrides=overrides,
    )

    assert report["dry_run"]
    assert report["verdict"].startswith("DRY-RUN")
    # checkpoint provenance is explicit
    assert report["weights"]["dpvo"]["weights"] == "RANDOM (dry run)"
    assert "n/a" in report["weights"]["lpips"]["weights"]

    rows = {r["metric"]: r for r in report["scenes"]["room0"]}
    # every reference-comparable metric has a row
    assert set(rows) == set(parity.REPORT_METRICS)
    # LPIPS: explicit N/A with the env-var hint
    assert rows["2d/lpips"]["status"] == "N/A"
    assert "NERF_VO_LPIPS_WEIGHTS" in rows["2d/lpips"]["note"]
    # produced metrics are real numbers
    for key in ("trajectory/keyframes_tracking/ate_rmse", "2d/psnr",
                "2d/mssim", "2d/depth_abs_rel", "3d/mesh_f1"):
        assert rows[key]["value"] is not None and np.isfinite(
            rows[key]["value"]), key
    # gated metrics under random weights are stamped DRY-RUN, never PASS/FAIL
    assert all(r["status"] in ("DRY-RUN", "N/A", "INFO")
               for r in rows.values())

    # report + full artifact tree on disk
    pred = report["dir_prediction"]
    assert os.path.exists(pred + "/parity_report.json")
    assert os.path.exists(pred + "/parity_report.md")
    res = pred + "/results/room0"
    for artifact in ("metrics_trajectory.csv", "metrics_2d_frames.csv",
                     "metrics_2d.csv", "metrics_2d.json", "metrics_3d.csv"):
        assert os.path.exists(res + f"/{artifact}"), artifact
    # metrics_2d.json carries an explicit null lpips
    with open(res + "/metrics_2d.json") as f:
        agg = json.load(f)
    assert "lpips" in agg and agg["lpips"] is None
    # the per-frame CSV has the lpips column header (empty values)
    with open(res + "/metrics_2d_frames.csv") as f:
        header = f.readline()
    assert "lpips" in header
