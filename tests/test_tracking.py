import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_vo_tpu.models.dpvo_net import DPVONet, init_dpvo_params
from nerf_vo_tpu.tracking.dpvo import DPVOTracker, TrackingConfig

H, W = 48, 64
INTR = np.asarray([40.0, 40.0, W / 2, H / 2], np.float32)

TINY = TrackingConfig(
    patches_per_frame=8,
    removal_window=6,
    optimization_window=4,
    patch_lifetime=4,
    keyframe_threshold=0.0,  # never drop frames in mechanics test
    keyframe_index=2,
    init_frames=4,
    init_iterations=2,
    update_iterations=1,
    ba_iterations=1,
    max_frames=64,
    max_edges=512,
    ring_size=8,
    corr_radius=2,
)


def _textured_frame(rng, shift):
    """Shifted random texture (coarse blobs so features see structure)."""
    base = rng.integers(0, 255, (H // 4 + 8, W // 4 + 8, 3), dtype=np.uint8)
    import cv2

    big = cv2.resize(base, ((W // 4 + 8) * 4, (H // 4 + 8) * 4),
                     interpolation=cv2.INTER_LINEAR)
    x0, y0 = 16 + shift, 16
    return big[y0:y0 + H, x0:x0 + W]


@pytest.fixture(scope="module")
def tracker_net():
    net, params = init_dpvo_params(
        jax.random.PRNGKey(0), H, W, corr_radius=TINY.corr_radius
    )
    return net, params


def test_tracker_mechanics(tracker_net, rng):
    net, params = tracker_net
    tr = DPVOTracker(TINY, net, params, H, W)
    all_retired = []
    n_frames = 12
    for i in range(n_frames):
        img = _textured_frame(rng, shift=i)
        retired = tr.track(i * 0.1, img, INTR, frame_index=i)
        all_retired.extend(retired)
    assert tr.is_initialized
    # removal window is 6: with 12 frames and no keyframe drops, 6 retired
    assert len(all_retired) == n_frames - TINY.removal_window
    # retirement order is temporal
    assert all_retired == sorted(all_retired)

    packet = tr.keyframe_packet(all_retired)
    K = len(all_retired)
    P = TINY.patches_per_frame
    assert packet["camera_extrinsics"].shape == (K, 4, 4)
    assert packet["camera_intrinsics"].shape == (K, 4)
    assert packet["frames_color"].shape == (K, 3, H, W)
    assert packet["dpvo_patches"].shape == (K, P, 3, 3, 3)
    assert not packet["last_frame"]
    # c2w matrices are rigid transforms
    R = packet["camera_extrinsics"][:, :3, :3]
    np.testing.assert_allclose(
        R @ np.transpose(R, (0, 2, 1)), np.tile(np.eye(3), (K, 1, 1)),
        atol=1e-4,
    )
    # patch grids: x/y channels are 3x3 grids around a center, invd constant
    patches = packet["dpvo_patches"]
    assert np.allclose(patches[..., 2, :, :].std(axis=(-2, -1)), 0, atol=1e-6)
    assert (patches[..., 2, :, :] > 0).all()

    # flush retires the rest
    rest = tr.flush()
    assert len(rest) == TINY.removal_window
    pkt2 = tr.keyframe_packet(rest, last_frame=True)
    assert pkt2["last_frame"]
    # full trajectory covers all 12 frames
    assert len(tr.trajectory()) == n_frames


@pytest.mark.slow
def test_tracker_keyframe_removal(tracker_net, rng):
    net, params = tracker_net
    import dataclasses

    cfg = dataclasses.replace(TINY, keyframe_threshold=1e9)  # drop everything
    tr = DPVOTracker(cfg, net, params, H, W)
    for i in range(10):
        img = _textured_frame(rng, shift=0)  # static camera
        tr.track(i * 0.1, img, INTR, frame_index=i)
    # with a huge threshold the mid frames keep being dropped: fewer alive
    assert len(tr.frame_gids) < 10
    # gauge anchors never dropped
    assert 0 in tr.frame_gids or 0 in tr.retired
    assert 1 in tr.frame_gids or 1 in tr.retired


@pytest.mark.slow
def test_edge_budget_respected(tracker_net, rng):
    net, params = tracker_net
    tr = DPVOTracker(TINY, net, params, H, W)
    for i in range(10):
        tr.track(i * 0.1, _textured_frame(rng, shift=i), INTR)
        assert tr.e_valid.sum() <= TINY.max_edges
        # free list + valid = total
        assert len(tr.free_edges) + tr.e_valid.sum() == TINY.max_edges


def test_edge_slot_uniqueness_check():
    """The NERF_VO_DEBUG_CHECKS invariant guard (ADVICE r4): live edges
    sharing a (kk, jj mod R) nbr_tab slot must raise, unique slots must
    pass. Called unbound with a stub tracker — the check only reads cfg
    and e_patch_g."""
    from types import SimpleNamespace

    from nerf_vo_tpu.tracking.dpvo import DPVOTracker, TrackingConfig

    cfg = TrackingConfig(ring_size=4, patches_per_frame=2)
    E = 6
    stub = SimpleNamespace(cfg=cfg, e_patch_g=np.arange(E))
    base = np.zeros(E, np.int64)  # all in window position 0
    live = np.ones(E, bool)
    live[4:] = False
    # kk = base + patch%P = [0,1,0,1,...]; jj chosen so the 4 live slots
    # kk*R + jj%R = [0,4,1,5] are distinct
    e_jj = np.asarray([0, 0, 1, 1, 0, 0])
    DPVOTracker._check_edge_slot_uniqueness(stub, live, base, e_jj)  # ok

    # now force a collision: edges 0 and 2 share (kk=0, jj%R=0)
    e_patch = np.asarray([0, 1, 2, 3, 4, 5])
    stub2 = SimpleNamespace(cfg=cfg, e_patch_g=e_patch)
    e_jj_bad = np.asarray([0, 1, 0, 1, 0, 0])
    # kk for edge 0 = 0, edge 2 = 2%2 = 0 -> same slot as edge 0
    with pytest.raises(AssertionError, match="slot collision"):
        DPVOTracker._check_edge_slot_uniqueness(
            stub2, np.ones(E, bool), base, e_jj_bad
        )
