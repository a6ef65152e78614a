import numpy as np
import pytest

from nerf_vo_tpu import native


@pytest.fixture(scope="module")
def lib():
    if not native.available():
        pytest.skip("native toolchain unavailable")
    return native.load()


def test_nn_distances_matches_kdtree(lib, rng):
    from scipy.spatial import cKDTree

    ref = rng.normal(size=(2000, 3)).astype(np.float32)
    query = rng.normal(size=(500, 3)).astype(np.float32)
    got = native.nn_distances(ref, query, cell=0.2)
    want, _ = cKDTree(ref).query(query, k=1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_native_tsdf_matches_python(lib):
    from tests.test_tsdf import _render_sphere_depth
    from nerf_vo_tpu.evaluation import tsdf as pytsdf

    H, W = 40, 50
    intr = np.asarray([40.0, 40.0, 25.0, 20.0], np.float32)
    c2ws, depths = [], []
    for ang in np.linspace(0, 2 * np.pi, 6, endpoint=False):
        pos = np.asarray([1.5 * np.sin(ang), 0.0, -1.5 * np.cos(ang)])
        z = -pos / np.linalg.norm(pos)
        x = np.cross([0, 1, 0], z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        c2w = np.eye(4, dtype=np.float32)
        c2w[:3, :3] = np.stack([x, y, z], -1)
        c2w[:3, 3] = pos
        c2ws.append(c2w)
        depths.append(
            _render_sphere_depth(c2w, intr, H, W, np.zeros(3), 0.4).astype(
                np.float32
            )
        )
    vol = pytsdf.fuse_tsdf(np.stack(depths), None, intr, np.stack(c2ws),
                           voxel_size=1 / 16, use_native=False)
    X, Y, Z = vol["tsdf"].shape
    trunc = pytsdf.TRUNC_MULT * vol["voxel_size"]
    tsdf_c, weight_c, _ = native.tsdf_fuse(
        depths, None, intr, c2ws, vol["origin"], (X, Y, Z),
        vol["voxel_size"], trunc,
    )
    # same voxels observed
    np.testing.assert_allclose(weight_c, vol["weight"], atol=1e-5)
    obs = weight_c > 0
    np.testing.assert_allclose(tsdf_c[obs], vol["tsdf"][obs], atol=1e-4)
