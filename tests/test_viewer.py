"""Live web viewer: HTTP mailbox semantics + mapping-stage integration.

The viewer replaces the reference's viser server (nerfstudio.py:101-102)
with a stdlib HTTP mailbox polled by the mapping stage; these tests pin the
endpoint contract (state JSON, camera POST, JPEG serving) and that a real
tiny MappingStage publishes renders and honors a browser-requested camera.
"""

import argparse
import json
import urllib.request

import numpy as np
import pytest


def _get(port, path):
    with urllib.request.urlopen(
        f"http://127.0.0.1:{port}{path}", timeout=10
    ) as r:
        return r.status, r.headers.get("Content-Type"), r.read()


def _post(port, path, body: dict):
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}{path}",
        data=json.dumps(body).encode(), method="POST",
    )
    with urllib.request.urlopen(req, timeout=10) as r:
        return r.status


def test_viewer_endpoints():
    from nerf_vo_tpu.runtime.viewer import LiveViewer

    v = LiveViewer(port=0)  # ephemeral port
    port = v.start()
    try:
        # index page
        code, ctype, body = _get(port, "/")
        assert code == 200 and ctype == "text/html" and b"canvas" in body

        # no render published yet
        with pytest.raises(urllib.error.HTTPError) as e:
            _get(port, "/render.jpg")
        assert e.value.code == 404

        # publish and read back
        poses = np.tile(np.eye(4, dtype=np.float32), (3, 1, 1))
        poses[2, 0, 3] = 1.5
        v.publish(b"RGBJPEG", b"DEPTHJPEG",
                  {"step": 7.0, "loss": 0.25}, poses)
        code, ctype, body = _get(port, "/render.jpg")
        assert code == 200 and ctype == "image/jpeg" and body == b"RGBJPEG"
        _, _, body = _get(port, "/depth.jpg")
        assert body == b"DEPTHJPEG"
        _, _, body = _get(port, "/api/state")
        state = json.loads(body)
        assert state["step"] == 7.0 and state["loss"] == 0.25
        assert state["num_keyframes"] == 3
        assert len(state["poses"]) == 3 and len(state["poses"][0]) == 12
        assert state["poses"][2][3] == 1.5  # translation x of keyframe 2

        # camera mailbox: follow by default, orbit after POST, back to follow
        assert v.requested_camera() is None
        c2w = [float(v) for v in np.eye(4)[:3].reshape(-1)]
        c2w[3] = 2.0
        assert _post(port, "/api/camera", {"c2w": c2w}) == 200
        cam = v.requested_camera()
        assert cam.shape == (4, 4) and cam[0, 3] == 2.0 and cam[3, 3] == 1.0
        assert _post(port, "/api/camera", {"follow": True}) == 200
        assert v.requested_camera() is None

        # malformed camera -> 400, mailbox untouched
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/api/camera", data=b"not json",
            method="POST",
        )
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=10)
        assert e.value.code == 400
    finally:
        v.stop()


def test_mapping_stage_publishes_to_viewer(tmp_path, rng):
    """A tiny real MappingStage with viewer:true publishes a JPEG render and
    honors a requested camera on the next publish."""
    from nerf_vo_tpu.runtime.stages import MappingStage

    H, W, K = 12, 16, 4
    args = argparse.Namespace(
        mapping_module="nerfstudio", enhancement_module="depth",
        num_keyframes=K, frame_height=H, frame_width=W,
        mapping_iterations=4, mapping_snapshot_iterations=4,
        rays_per_batch=32, dir_prediction=str(tmp_path),
        viewer=True, viewer_port=0, viewer_render_every=2, viewer_width=8,
        # publishing mechanics only — shrink the model so the CPU compile
        # doesn't dominate the fast tier (was ~190 s at production size)
        mapping_model_overrides=dict(
            num_proposal_samples=(8,), num_nerf_samples=6,
            log2_hashmap_size=10, max_res=64, proposal_resolutions=(8,),
            proposal_distill_points=64,
            # normals are exercised by test_nerfacto/test_accuracy; dropping
            # the grad-normal vjp-of-vjp here halves this test's XLA compile
            predict_normals=False, grad_normal_mode="none",
        ),
    )
    m = MappingStage(args)
    try:
        port = m.viewer.port
        pkt = {
            "camera_intrinsics": np.tile(
                np.asarray([8.0, 8.0, W / 2, H / 2], np.float32), (2, 1)
            ),
            "camera_extrinsics": np.tile(
                np.eye(4, dtype=np.float32), (2, 1, 1)
            ),
            "frames_color_float": rng.uniform(0, 1, (2, H, W, 3)).astype(
                np.float32
            ),
            "frames_depth": np.full((2, H, W), 2.0, np.float32),
            "frames_normal": np.tile(
                np.asarray([0, 0, 1], np.float32), (2, H, W, 1)
            ),
        }
        m.update(pkt)
        m.stream_active = False
        m.train_step()
        m.train_step()  # step_count=2 -> publish fires
        code, ctype, body = _get(port, "/render.jpg")
        assert code == 200 and body[:2] == b"\xff\xd8"  # JPEG magic
        _, _, state = _get(port, "/api/state")
        state = json.loads(state)
        assert state["step"] == 2.0 and state["num_keyframes"] == 2
        assert "loss" in state

        # requested camera is consumed by the next publish without error
        c2w = [float(v) for v in np.eye(4)[:3].reshape(-1)]
        assert _post(port, "/api/camera", {"c2w": c2w}) == 200
        m.train_step()
        m.train_step()  # step_count=4 -> publish with the orbit camera
        _, _, state = _get(port, "/api/state")
        assert json.loads(state)["step"] == 4.0
    finally:
        if m.viewer is not None:
            m.viewer.stop()
