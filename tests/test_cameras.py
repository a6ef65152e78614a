import jax.numpy as jnp
import numpy as np

from nerf_vo_tpu.core import cameras, conventions, lie

INTR = jnp.asarray([300.0, 320.0, 160.0, 120.0])


def test_scale_intrinsics():
    out = cameras.scale_intrinsics(INTR, (240, 320), (480, 640))
    np.testing.assert_allclose(out, [600.0, 640.0, 320.0, 240.0])


def test_project_unproject_roundtrip(rng):
    pts = jnp.asarray(rng.uniform(0.1, 5.0, size=(32, 3)), jnp.float32)
    pts = pts.at[:, :2].set(pts[:, :2] - 2.0)
    for conv in ("opencv", "opengl"):
        p = pts if conv == "opencv" else pts * jnp.asarray([1.0, -1.0, -1.0])
        xy, z = cameras.project(p, INTR, conv)
        back = cameras.unproject(xy, z, INTR, conv)
        np.testing.assert_allclose(back, p, atol=1e-4)


def test_intrinsics_matrix():
    K = cameras.intrinsics_matrix(INTR)
    np.testing.assert_allclose(K, [[300, 0, 160], [0, 320, 120], [0, 0, 1]])


def test_generate_rays_center_pixel():
    c2w = jnp.eye(4)
    xy = jnp.asarray([[160.0, 120.0]])
    o, d, n = cameras.generate_rays(c2w, INTR, xy, convention="opengl")
    np.testing.assert_allclose(o, 0.0, atol=1e-7)
    np.testing.assert_allclose(d, [[0.0, 0.0, -1.0]], atol=1e-6)
    np.testing.assert_allclose(n, 1.0, atol=1e-6)


def test_generate_rays_matches_se3(rng):
    from tests.test_lie import random_se3

    g = random_se3(rng, (4,))
    m = lie.se3_matrix(g)
    xy = jnp.asarray(rng.uniform(0, 320, size=(4, 2)), jnp.float32)
    o1, d1, n1 = cameras.generate_rays(m, INTR, xy)
    o2, d2, n2 = cameras.generate_rays_se3(g, INTR, xy)
    np.testing.assert_allclose(o1, o2, atol=1e-5)
    np.testing.assert_allclose(d1, d2, atol=1e-5)


def test_distortion_roundtrip(rng):
    dist = jnp.asarray([0.1, -0.05, 0.001, 0.002])
    xy = jnp.asarray(rng.uniform(-0.5, 0.5, size=(64, 2)), jnp.float32)
    xd = cameras.distort_radtan(xy, dist)
    back = cameras.undistort_radtan(xd, dist)
    np.testing.assert_allclose(back, xy, atol=1e-5)


def test_opencv_opengl_flip_involution(rng):
    from tests.test_lie import random_se3

    m = lie.se3_matrix(random_se3(rng, (3,)))
    out = conventions.opengl_to_opencv(conventions.opencv_to_opengl(m))
    np.testing.assert_allclose(out, m, atol=1e-6)
    # matches the reference's in-place column flip semantics
    flipped = np.asarray(m).copy()
    flipped[:, :3, 1:3] *= -1
    np.testing.assert_allclose(conventions.opencv_to_opengl(m), flipped, atol=1e-6)


def test_ngp_cycle_roundtrip(rng):
    from tests.test_lie import random_se3

    m = lie.se3_matrix(random_se3(rng, (3,)))
    out = conventions.ngp_to_nerf(conventions.nerf_to_ngp(m, 0.33), 0.33)
    np.testing.assert_allclose(out, m, atol=1e-5)


def test_gauge_normalization(rng):
    from tests.test_lie import random_se3

    first = lie.se3_matrix(random_se3(rng))
    N = conventions.gauge_normalization_matrix(first)
    np.testing.assert_allclose(
        conventions.apply_transform(N, first), jnp.eye(4), atol=1e-5
    )
