import jax
import jax.numpy as jnp
import numpy as np

from nerf_vo_tpu.core import lie
from nerf_vo_tpu.ops import dense_ba
from nerf_vo_tpu.ops.dense_corr import build_corr_pyramid, corr_lookup

H, W = 12, 16
INTR = jnp.asarray([12.0, 12.0, 8.0, 6.0])


def _scene(rng, n=4):
    poses = []
    for i in range(n):
        xi = np.concatenate(
            [[-0.2 * i, 0.01 * i, 0.02 * i], rng.normal(size=3) * 0.01]
        ).astype(np.float32)
        poses.append(np.asarray(lie.se3_exp(jnp.asarray(xi))))
    poses = jnp.asarray(np.stack(poses))
    intr = jnp.tile(INTR[None], (n, 1))
    # smooth depth field
    ys, xs = np.mgrid[0:H, 0:W]
    depth = 3.0 + 0.5 * np.sin(xs / 3.0) * np.cos(ys / 2.0)
    disps = jnp.asarray(
        np.tile(1.0 / depth, (n, 1, 1)), jnp.float32
    )
    ii, jj = [], []
    for a in range(n):
        for b in range(n):
            if a != b and abs(a - b) <= 2:
                ii.append(a)
                jj.append(b)
    ii = jnp.asarray(ii, jnp.int32)
    jj = jnp.asarray(jj, jnp.int32)
    return poses, disps, intr, ii, jj


def test_dense_reproject_identity():
    poses = lie.se3_identity((2,))
    disps = jnp.full((2, H, W), 0.5)
    intr = jnp.tile(INTR[None], (2, 1))
    coords, z = dense_ba.dense_reproject(
        poses, disps, intr, jnp.asarray([0]), jnp.asarray([1])
    )
    ys, xs = np.mgrid[0:H, 0:W]
    np.testing.assert_allclose(coords[0, ..., 0], xs, atol=1e-4)
    np.testing.assert_allclose(coords[0, ..., 1], ys, atol=1e-4)
    np.testing.assert_allclose(z[0], 2.0, atol=1e-5)


def test_dense_ba_converges(rng):
    poses_true, disps_true, intr, ii, jj = _scene(rng)
    targets, z = dense_ba.dense_reproject(poses_true, disps_true, intr, ii, jj)
    weights = jnp.ones(targets.shape)
    N = poses_true.shape[0]

    noise = jnp.asarray(
        np.concatenate([np.zeros((2, 6)),
                        rng.normal(size=(N - 2, 6)) * 0.02], 0),
        jnp.float32,
    )
    poses0 = lie.se3_retract(poses_true, noise)
    disps0 = disps_true * jnp.asarray(
        1.0 + 0.05 * rng.normal(size=disps_true.shape), jnp.float32
    )
    problem = dense_ba.DenseBAProblem(
        poses=poses0, disps=disps0, intrinsics=intr, ii=ii, jj=jj,
        targets=targets, weights=weights,
        valid=jnp.ones(ii.shape, bool),
    )
    slot_map = jnp.where(jnp.arange(N) >= 2, jnp.arange(N) - 2, -1).astype(
        jnp.int32
    )
    poses, disps, costs, depth_cov = dense_ba.dense_bundle_adjust(
        problem, slot_map, num_iters=6, window=4, ep=1e-4,
    )
    assert float(costs[-1]) < float(costs[0]) * 1e-2, costs
    cov = np.asarray(depth_cov)
    assert cov.shape == disps.shape
    assert (cov[np.isfinite(cov)] >= 0).all()
    err = np.asarray(lie.se3_log(lie.se3_mul(poses, lie.se3_inv(poses_true))))
    assert np.abs(err).max() < 2e-3, np.abs(err).max()
    rel = np.abs(np.asarray(disps - disps_true) / np.asarray(disps_true))
    assert np.median(rel) < 5e-3


def test_frame_distance_monotone(rng):
    poses_true, disps_true, intr, ii, jj = _scene(rng)
    d = dense_ba.frame_distance(
        poses_true, disps_true, intr,
        jnp.asarray([0, 0, 0]), jnp.asarray([1, 2, 3]),
    )
    d = np.asarray(d)
    assert d[0] < d[1] < d[2]  # farther frames -> larger flow
    assert (d > 0).all()


def test_corr_pyramid_and_lookup(rng):
    E, C = 3, 16
    f_i = jnp.asarray(rng.normal(size=(E, H, W, C)), jnp.float32)
    # target frame = source frame -> self-correlation peaks at own coords
    pyr = build_corr_pyramid(f_i, f_i, num_levels=3)
    assert pyr[0].shape == (E, H * W, H, W)
    assert pyr[1].shape == (E, H * W, H // 2, W // 2)
    ys, xs = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    coords = jnp.tile(jnp.stack([xs, ys], -1)[None], (E, 1, 1, 1))
    out = corr_lookup(pyr, coords, radius=2)
    D = 5
    assert out.shape == (E, H, W, 3 * D * D)
    # center of the level-0 window (index 2*5+2=12) is the self-correlation
    # = ||f||^2 / sqrt(C): the max over the window at interior pixels
    win0 = np.asarray(out[..., : D * D]).reshape(E, H, W, D, D)
    interior = win0[:, 3:-3, 3:-3]
    center = interior[..., 2, 2]
    assert (center >= interior.reshape(*interior.shape[:3], -1).max(-1) - 1e-4).all()


def test_global_dense_ba_converges(rng):
    """The terminate-time solver (host-frame-grouped scan assembly) must
    recover the same geometry as the frontend solver: oracle flow targets,
    perturbed poses/depths, all-keyframe window."""
    n = 6
    poses_true, disps_true, intr, ii, jj = _scene(rng, n=n)
    targets, _ = dense_ba.dense_reproject(poses_true, disps_true, intr, ii, jj)
    weights = jnp.ones(targets.shape)

    # group edges by host frame, pad rows to ME
    ME = 4
    host = jnp.arange(n, dtype=jnp.int32)
    jj_g = np.zeros((n, ME), np.int32)
    valid = np.zeros((n, ME), bool)
    tgt = np.zeros((n, ME, H, W, 2), np.float32)
    wgt = np.zeros((n, ME, H, W, 2), np.float32)
    counts = np.zeros(n, np.int32)
    for e in range(ii.shape[0]):
        a, b = int(ii[e]), int(jj[e])
        m = counts[a]
        assert m < ME
        jj_g[a, m] = b
        valid[a, m] = True
        tgt[a, m] = np.asarray(targets[e])
        wgt[a, m] = np.asarray(weights[e])
        counts[a] += 1

    noise = jnp.asarray(
        np.concatenate([np.zeros((2, 6)),
                        rng.normal(size=(n - 2, 6)) * 0.02], 0),
        jnp.float32,
    )
    poses0 = lie.se3_retract(poses_true, noise)
    disps0 = disps_true * jnp.asarray(
        1.0 + 0.05 * rng.normal(size=disps_true.shape), jnp.float32
    )
    # fix the first two poses (SE3 gauge + monocular scale), like the
    # frontend test — with only one fixed, global scale drifts freely
    P = n - 2
    slot_map = jnp.where(jnp.arange(n) >= 2, jnp.arange(n) - 2, -1).astype(
        jnp.int32
    )
    poses, disps, costs = dense_ba.global_dense_ba(
        poses0, disps0, intr, host, jnp.asarray(jj_g), jnp.asarray(valid),
        jnp.asarray(tgt), jnp.asarray(wgt), slot_map,
        num_iters=8, P=P, ep=1e-4,
    )
    assert float(costs[-1]) < float(costs[0]) * 1e-2, costs
    err = np.asarray(lie.se3_log(lie.se3_mul(poses, lie.se3_inv(poses_true))))
    assert np.abs(err).max() < 5e-3, np.abs(err).max()
    rel = np.abs(np.asarray(disps - disps_true) / np.asarray(disps_true))
    assert np.median(rel) < 1e-2


def test_corr_lookup_routes_match(rng):
    """The row-gather window route (default; built after the scalar route
    measured 700.9 ms/update on-chip, tpu_runs/exp_droid_cut.log) must
    match the per-tap scalar-gather route exactly — fractional coords,
    borders, and out-of-bounds zeroing included."""
    from nerf_vo_tpu.ops import dense_corr as dc

    E, C = 2, 8
    f_i = jnp.asarray(rng.normal(size=(E, H, W, C)), jnp.float32)
    f_j = jnp.asarray(rng.normal(size=(E, H, W, C)), jnp.float32)
    pyr = build_corr_pyramid(f_i, f_j, num_levels=3)
    # fractional coords spilling past every border
    coords = jnp.asarray(
        rng.uniform(-4.0, W + 3.0, size=(E, H, W, 2)), jnp.float32
    )

    routes = {}
    orig = dc._CORR_LOOKUP_ROUTE
    try:
        for route in ("rows", "scalar", "blocks"):
            dc._CORR_LOOKUP_ROUTE = route
            # bypass the jit cache (the route is read at trace time)
            routes[route] = np.asarray(
                dc.corr_lookup.__wrapped__(pyr, coords, radius=3)
            )
    finally:
        dc._CORR_LOOKUP_ROUTE = orig
    np.testing.assert_allclose(
        routes["rows"], routes["scalar"], rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        routes["blocks"], routes["scalar"], rtol=1e-5, atol=1e-5
    )


def test_dense_ba_assembly_routes_match(rng):
    """The per-edge block assembly ("blocks") must produce the same
    solver trajectory as the window-row Gs assembly ("gs") — identical
    problem, both routes, poses/disps/cov allclose (f32 reassociation
    only)."""
    from nerf_vo_tpu.ops import dense_ba as dba

    n = 6
    poses_true, disps_true, intr, ii, jj = _scene(rng, n=n)
    targets, _ = dense_ba.dense_reproject(
        poses_true, disps_true, intr, ii, jj
    )
    weights = jnp.asarray(rng.uniform(0.3, 1.0, targets.shape), jnp.float32)
    # perturb
    poses = poses_true.at[:, :3].add(
        jnp.asarray(rng.normal(0, 0.01, (n, 3)), jnp.float32)
    )
    disps = disps_true * jnp.asarray(
        rng.uniform(0.9, 1.1, disps_true.shape), jnp.float32
    )
    sm = np.full(n, -1, np.int32)
    sm[2:] = np.arange(n - 2)
    problem = dense_ba.DenseBAProblem(
        poses=poses, disps=disps, intrinsics=intr, ii=ii, jj=jj,
        targets=targets, weights=weights,
        valid=jnp.ones(ii.shape, bool),
    )
    outs = {}
    orig = dba._BA_ASSEMBLY
    try:
        for route in ("gs", "blocks"):
            dba._BA_ASSEMBLY = route
            outs[route] = dba.dense_bundle_adjust.__wrapped__(
                problem, jnp.asarray(sm), num_iters=2, window=n - 2,
            )
    finally:
        dba._BA_ASSEMBLY = orig
    for a, b, name in zip(outs["gs"], outs["blocks"],
                          ("poses", "disps", "costs", "cov")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-3,
            err_msg=name,
        )
