import numpy as np
import pytest

from nerf_vo_tpu.evaluation import meshio, tsdf
from nerf_vo_tpu.evaluation.metrics import (
    absolute_trajectory_error,
    depth_metrics,
    icp_align,
    kabsch_umeyama,
    mesh_3d_metrics,
    mssim,
    psnr,
)


def test_ply_roundtrip(tmp_path, rng):
    v = rng.normal(size=(20, 3)).astype(np.float32)
    f = rng.integers(0, 20, size=(10, 3)).astype(np.int32)
    c = rng.uniform(0, 1, size=(20, 3)).astype(np.float32)
    path = str(tmp_path / "m.ply")
    meshio.write_ply(path, v, f, c)
    v2, f2 = meshio.read_ply(path)
    np.testing.assert_allclose(v2, v, atol=1e-6)
    np.testing.assert_array_equal(f2, f)


def test_sample_and_downsample(rng):
    v = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    f = np.asarray([[0, 1, 2]], np.int32)
    pts = meshio.sample_mesh_points(v, f, 500)
    assert pts.shape == (500, 3)
    assert (pts[:, 2] == 0).all()
    assert (pts[:, 0] >= 0).all() and (pts[:, 0] + pts[:, 1] <= 1 + 1e-5).all()
    down = meshio.voxel_downsample(pts, 0.5)
    assert len(down) <= 6


def _render_sphere_depth(c2w, intr, H, W, center, radius):
    """Analytic depth of a sphere for TSDF testing (OpenCV convention)."""
    fx, fy, cx, cy = intr
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    d = np.stack([(xs - cx) / fx, (ys - cy) / fy, np.ones_like(xs)], -1)
    R = c2w[:3, :3]
    o = c2w[:3, 3]
    dw = d @ R.T
    oc = o - center
    b = 2 * np.sum(dw * oc, -1)
    c = np.sum(oc * oc) - radius**2
    disc = b * b - 4 * np.sum(dw * dw, -1) * c
    t = np.where(disc > 0, (-b - np.sqrt(np.maximum(disc, 0)))
                 / (2 * np.sum(dw * dw, -1)), 0.0)
    z = np.where(t > 0, t, 0.0)  # dw has unit z, so t IS z-depth
    return z


def test_tsdf_sphere_reconstruction():
    H, W = 60, 80
    intr = np.asarray([60.0, 60.0, 40.0, 30.0])
    center = np.asarray([0.0, 0.0, 0.0])
    radius = 0.5
    c2ws, depths = [], []
    for ang in np.linspace(0, 2 * np.pi, 12, endpoint=False):
        # camera on a circle looking at the origin
        pos = np.asarray([2.0 * np.sin(ang), 0.0, -2.0 * np.cos(ang)])
        z = center - pos
        z /= np.linalg.norm(z)
        x = np.cross([0, 1, 0], z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        c2w = np.eye(4)
        c2w[:3, :3] = np.stack([x, y, z], -1)
        c2w[:3, 3] = pos
        c2ws.append(c2w)
        depths.append(_render_sphere_depth(c2w, intr, H, W, center, radius))

    vol = tsdf.fuse_tsdf(
        np.stack(depths), None, intr, np.stack(c2ws), voxel_size=1 / 32,
    )
    verts, faces, _ = tsdf.surface_nets(
        vol["tsdf"], vol["weight"], vol["origin"], vol["voxel_size"]
    )
    assert len(verts) > 100
    assert len(faces) > 100
    r = np.linalg.norm(verts - center, axis=-1)
    # surface within ~1.5 voxels of the true sphere
    assert np.abs(np.median(r) - radius) < 1.5 / 32
    assert np.percentile(np.abs(r - radius), 90) < 3 / 32

    # 3D metrics: mesh vs itself (perturbed) gives high F1
    pts = meshio.sample_mesh_points(verts, faces, 5000)
    m = mesh_3d_metrics(pts + 0.003, pts, threshold=0.05, refine_icp=False)
    assert m["mesh_f1"] > 0.99
    assert m["mesh_accuracy"] < 0.01


def test_icp_recovers_small_transform(rng):
    # ICP is a LOCAL refiner (the evaluator uses it after trajectory
    # alignment): test recovery of a small misalignment
    pts = rng.normal(size=(800, 3)).astype(np.float32)
    from nerf_vo_tpu.core import lie
    import jax.numpy as jnp

    R = np.asarray(lie.quat_to_matrix(lie.so3_exp_quat(
        jnp.asarray([0.02, -0.015, 0.01]))))
    t = np.asarray([0.02, -0.01, 0.03])
    moved = pts @ R.T + t
    T = icp_align(pts, moved, max_correspondence=0.5, iterations=30)
    aligned = pts @ T[:3, :3].T + T[:3, 3]
    assert np.abs(aligned - moved).max() < 1e-2
    assert np.abs(aligned - moved).mean() < 2e-3


def test_ate_known_transform(rng):
    gt = rng.normal(size=(50, 3)) * 2
    R, _, _ = kabsch_umeyama(
        rng.normal(size=(4, 3)), rng.normal(size=(4, 3)), with_scale=False
    )
    pred = (gt @ R.T) * 0.5 + np.asarray([1.0, 2.0, 3.0])
    m = absolute_trajectory_error(gt, pred)
    assert m["ate_rmse"] < 1e-5
    np.testing.assert_allclose(m["scale"], 2.0, atol=1e-4)


def test_psnr_mssim():
    img = np.random.default_rng(0).uniform(0, 1, (64, 64, 3))
    assert psnr(img, img) == np.inf
    assert abs(mssim(img, img) - 1.0) < 1e-9
    noisy = np.clip(img + 0.1, 0, 1)
    assert psnr(noisy, img) < 30
    assert mssim(noisy, img) < 1.0


def test_depth_metrics_perfect():
    d = np.random.default_rng(0).uniform(0.5, 4.0, (32, 32))
    m = depth_metrics(d, d)
    assert m["depth_abs_rel"] < 1e-7
    assert m["depth_delta_1"] == 1.0
    m2 = depth_metrics(d * 2.0, d, scale_match=True)
    assert m2["depth_abs_rel"] < 1e-6  # scale-matched


def test_marching_tetrahedra_sphere():
    # analytic sphere SDF on a grid -> exact-ish isosurface
    n = 48
    xs = np.linspace(-1, 1, n)
    g = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), -1)
    sdf = np.linalg.norm(g, axis=-1) - 0.6
    voxel = 2.0 / (n - 1)
    verts, faces, _ = tsdf.marching_tetrahedra(
        sdf, None, np.asarray([-1.0, -1.0, -1.0], np.float32), voxel
    )
    assert len(verts) > 200 and len(faces) > 200
    r = np.linalg.norm(verts, axis=-1)
    # linear interpolation of a smooth SDF: well under half a voxel
    assert np.abs(r - 0.6).max() < 0.5 * voxel
    assert np.abs(r - 0.6).mean() < 0.1 * voxel
    # faces index valid vertices
    assert faces.min() >= 0 and faces.max() < len(verts)
