"""FFT Poisson surface reconstruction (evaluation/poisson.py) — the
Open3D-free analog of the reference's generate_point_cloud + Poisson
depth-9 + 10% density cull (reference evaluation/nerf_renderer.py:170-209).
"""

import numpy as np

from nerf_vo_tpu.evaluation import poisson


def _sphere_cloud(n=20000, r=1.0, seed=0):
    g = np.random.default_rng(seed)
    v = g.standard_normal((n, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return (r * v).astype(np.float32), v.astype(np.float32)


def test_poisson_sphere_geometry():
    pts, nrm = _sphere_cloud()
    verts, faces = poisson.poisson_mesh(
        pts, nrm, grid_resolution=64, density_quantile=0.0
    )
    assert len(verts) > 500 and faces is not None and len(faces) > 500
    rad = np.linalg.norm(verts, axis=1)
    # reconstructed surface sits on the unit sphere within a voxel or two
    # (voxel = 1.2*2/63 ~ 0.038)
    assert abs(float(np.median(rad)) - 1.0) < 0.05, float(np.median(rad))
    assert float(np.percentile(np.abs(rad - 1.0), 90)) < 0.10


def test_poisson_density_cull_removes_sparse_patch():
    pts, nrm = _sphere_cloud()
    # thin out one octant to ~2% of its points: its verts should be culled
    octant = (pts[:, 0] > 0) & (pts[:, 1] > 0) & (pts[:, 2] > 0)
    keep = ~octant | (np.random.default_rng(1).random(len(pts)) < 0.02)
    verts_c, faces_c = poisson.poisson_mesh(
        pts[keep], nrm[keep], grid_resolution=64, density_quantile=0.10
    )
    assert len(verts_c)
    in_oct = (verts_c > 0.3).all(axis=1).mean()
    # same thinned cloud WITHOUT the cull: isolates the cull's effect
    verts_nc, _ = poisson.poisson_mesh(
        pts[keep], nrm[keep], grid_resolution=64, density_quantile=0.0
    )
    in_oct_nc = (verts_nc > 0.3).all(axis=1).mean()
    assert in_oct < 0.6 * in_oct_nc, (in_oct, in_oct_nc)


def test_depth_backprojection_plane():
    intr = dict(fx=50.0, fy=50.0, cx=32.0, cy=24.0)
    depth = np.full((48, 64), 2.0)
    c2w = np.eye(4)
    pts, nrm = poisson.depth_to_points_normals(depth, intr, c2w, max_depth=5.0)
    assert len(pts)
    np.testing.assert_allclose(pts[:, 2], 2.0, atol=1e-6)
    # plane faces the camera at the origin: outward normal is -z
    np.testing.assert_allclose(nrm[:, 2], -1.0, atol=1e-5)


def test_depth_backprojection_respects_pose_and_maxdepth():
    intr = dict(fx=50.0, fy=50.0, cx=32.0, cy=24.0)
    depth = np.full((48, 64), 2.0)
    depth[:10] = 9.0  # beyond max_depth -> dropped
    c2w = np.eye(4)
    c2w[:3, 3] = [1.0, -2.0, 0.5]
    pts, _ = poisson.depth_to_points_normals(depth, intr, c2w, max_depth=5.0)
    np.testing.assert_allclose(pts[:, 2], 2.5, atol=1e-6)
    assert pts[:, 0].min() > 1.0 - 2.0 / 50.0 * 33 - 0.1
