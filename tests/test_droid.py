import jax
import numpy as np
import pytest

from nerf_vo_tpu.models.droid_net import init_droid_params
from nerf_vo_tpu.tracking.droid_slam import DROIDSLAMTracker, DroidConfig

H, W = 48, 64
INTR = np.asarray([40.0, 40.0, W / 2, H / 2], np.float32)

TINY = DroidConfig(
    buffer_size=32,
    motion_threshold=0.0,  # every frame becomes a keyframe
    frontend_window=5,
    frontend_radius=2,
    max_factors=24,
    iters1=1,
    iters2=1,
    ba_iters=1,
    backend_steps1=1,
    backend_steps2=1,
    keyframe_threshold=0.0,  # never remove (removal has its own test)
    perform_global_ba=True,
    compute_covariances=True,
)


@pytest.fixture(scope="module")
def droid_net():
    return init_droid_params(jax.random.PRNGKey(0), H, W)


def _frame(rng, i):
    import cv2

    base = rng.integers(0, 255, (H // 4 + 4, W // 4 + 4, 3), dtype=np.uint8)
    big = cv2.resize(base, ((W // 4 + 4) * 4, (H // 4 + 4) * 4))
    return big[8: 8 + H, 8 + i: 8 + i + W]


def test_droid_mechanics(droid_net, rng):
    net, params = droid_net
    tr = DROIDSLAMTracker(TINY, net, params, H, W)
    all_retired = []
    n = 9
    for i in range(n):
        retired = tr.track(i * 0.1, _frame(rng, i), INTR, frame_index=i)
        all_retired.extend(retired)
    assert tr.n_kf == n  # motion_threshold 0 -> all keyframes
    assert len(all_retired) == n - TINY.frontend_window

    pkt = tr.keyframe_packet(all_retired)
    K = len(all_retired)
    assert pkt["camera_extrinsics"].shape == (K, 4, 4)
    assert pkt["droid_slam_inverse_depth"].shape == (K, H, W)
    assert (pkt["droid_slam_inverse_depth"] > 0).all()
    assert pkt["droid_slam_depth_covariance"].shape == (K, H, W)
    assert (pkt["droid_slam_depth_covariance"] > 0).all()
    assert pkt["frames_color"].shape == (K, 3, H, W)

    rest = tr.flush()  # runs global BA
    assert len(rest) == TINY.frontend_window
    assert len(tr.trajectory()) == n
    # poses stay finite rigid transforms
    for m in tr.trajectory().values():
        assert np.isfinite(m).all()
        np.testing.assert_allclose(
            m[:3, :3] @ m[:3, :3].T, np.eye(3), atol=1e-4
        )


@pytest.mark.slow
def test_droid_mesh_ba_matches_replicated(droid_net, rng):
    """The tracker with a mesh (pixel-sharded frontend BA) follows the
    replicated tracker's trajectory — the solver difference is psum
    reduction order, amplified only by the GRU/GN recurrence.

    Slow tier (2026-08-19): ~29 s, and the op-level mesh-equivalence of the
    sharded dense BA stays covered fast by
    test_dense_ba/test_parallel::test_sharded_dense_ba_matches_replicated;
    this adds only the tracker-level wiring on top."""
    from nerf_vo_tpu.parallel import sharding

    net, params = droid_net
    frames = [_frame(rng, i) for i in range(6)]

    tr0 = DROIDSLAMTracker(TINY, net, params, H, W)
    tr1 = DROIDSLAMTracker(TINY, net, params, H, W,
                           mesh=sharding.make_mesh(4))
    for i, f in enumerate(frames):
        tr0.track(i * 0.1, f, INTR, frame_index=i)
        tr1.track(i * 0.1, f, INTR, frame_index=i)
    tr0.flush()
    tr1.flush()
    t0 = tr0.trajectory()
    t1 = tr1.trajectory()
    assert t0.keys() == t1.keys()
    for k in t0:
        assert np.isfinite(t1[k]).all()
        np.testing.assert_allclose(
            t1[k][:3, :3] @ t1[k][:3, :3].T, np.eye(3), atol=1e-4
        )
        np.testing.assert_allclose(t0[k], t1[k], atol=5e-3)


def test_droid_inactive_store(droid_net, rng):
    """Edges evicted by the sliding window land in the inactive store with
    their last flow target/weight and stay consistent: every valid entry's
    endpoints are inside the current window, no entry duplicates a live
    edge, and entries die with removed keyframes (reference
    rm_factors(store=True) + update(use_inactive=True))."""
    net, params = droid_net
    tr = DROIDSLAMTracker(TINY, net, params, H, W)
    stored_ever = False
    for i in range(9):
        tr.track(i * 0.1, _frame(rng, i), INTR, frame_index=i)
        stored_ever = stored_ever or tr.i_valid.any()
        win = set(tr.alive[-TINY.frontend_window:])
        live = {(int(tr.e_ii[s]), int(tr.e_jj[s]))
                for s in range(TINY.max_factors) if tr.e_valid[s]}
        for k in range(TINY.inactive_factors):
            if tr.i_valid[k]:
                e = (int(tr.i_ii[k]), int(tr.i_jj[k]))
                assert e[0] in win and e[1] in win
                assert e not in live
    assert stored_ever  # window slid 4 times; drops must have occurred
    # stored weights are the frozen GRU weights: nonnegative, finite
    w = np.asarray(tr.i_weight)[np.asarray(tr.i_valid, bool)]
    if w.size:
        assert np.isfinite(w).all() and (w >= 0).all()
    # disabling the store reproduces a BA over live edges only
    import dataclasses

    cfg0 = dataclasses.replace(TINY, inactive_factors=0)
    tr0 = DROIDSLAMTracker(cfg0, net, params, H, W)
    for i in range(6):
        tr0.track(i * 0.1, _frame(rng, i), INTR, frame_index=i)
    for m in tr0.trajectory().values():
        assert np.isfinite(m).all()


def test_droid_motion_filter(droid_net, rng):
    import dataclasses

    net, params = droid_net
    cfg = dataclasses.replace(TINY, motion_threshold=1e9)
    tr = DROIDSLAMTracker(cfg, net, params, H, W)
    for i in range(5):
        tr.track(i * 0.1, _frame(rng, i), INTR)
    # huge threshold: only the very first frame becomes a keyframe
    assert tr.n_kf == 1


def test_droid_keyframe_removal(droid_net, rng):
    """A huge keyframe_threshold makes every pair look redundant: each new
    candidate evicts the previous keyframe (reference __update -> False ->
    rm_keyframe, droid_slam.py:298-316,964), the freed slot is reused, and
    removed keyframes never appear in packets or the trajectory."""
    import dataclasses

    net, params = droid_net
    cfg = dataclasses.replace(TINY, keyframe_threshold=1e6,
                              perform_global_ba=False)
    tr = DROIDSLAMTracker(cfg, net, params, H, W)
    n = 8
    for i in range(n):
        tr.track(i * 0.1, _frame(rng, i), INTR, frame_index=i)
    # first 3 keyframes bootstrap before the policy engages (needs >= 4
    # alive); every later candidate evicts its predecessor
    assert len(tr.free_slots) > 0
    kept = tr.retired + tr.alive
    assert len(kept) < n
    # slot reuse: the high-water mark stays below the frame count
    assert tr.n_kf < n
    # bookkeeping stays consistent for survivors only
    for g in kept:
        assert g in tr.src_index and g in tr.tstamps
    rest = tr.flush()
    assert len(tr.trajectory()) == len(kept)
