import jax
import jax.numpy as jnp
import numpy as np

from nerf_vo_tpu.ops.correlation import bilinear_gather, patch_correlation


def test_bilinear_gather_exact_on_grid(rng):
    fmap = jnp.asarray(rng.normal(size=(2, 8, 10, 4)), jnp.float32)
    coords = jnp.asarray([[3.0, 2.0], [0.0, 0.0]])
    fidx = jnp.asarray([1, 0])
    out = bilinear_gather(fmap, fidx, coords)
    np.testing.assert_allclose(out[0], fmap[1, 2, 3], atol=1e-6)
    np.testing.assert_allclose(out[1], fmap[0, 0, 0], atol=1e-6)


def test_bilinear_gather_interpolates(rng):
    fmap = jnp.zeros((1, 4, 4, 1)).at[0, 1, 1, 0].set(1.0)
    out = bilinear_gather(
        fmap, jnp.asarray([0]), jnp.asarray([[0.5, 1.0]])
    )
    np.testing.assert_allclose(out[0, 0], 0.5, atol=1e-6)
    # out of bounds -> 0
    out = bilinear_gather(fmap, jnp.asarray([0]), jnp.asarray([[-5.0, 0.0]]))
    np.testing.assert_allclose(out[0, 0], 0.0, atol=1e-6)


def _corr_shapes(E=5, C=16, H=24, W=32):
    rng = np.random.default_rng(0)
    pf = jnp.asarray(rng.normal(size=(E, 3, 3, C)), jnp.float32)
    f1 = jnp.asarray(rng.normal(size=(3, H, W, C)), jnp.float32)
    f2 = jnp.asarray(rng.normal(size=(3, H // 2, W // 2, C)), jnp.float32)
    jj = jnp.asarray(rng.integers(0, 3, size=E), jnp.int32)
    center = jnp.asarray(
        rng.uniform([8, 8], [W - 8, H - 8], size=(E, 2)), jnp.float32
    )
    return pf, f1, f2, jj, center


def test_patch_correlation_shape():
    pf, f1, f2, jj, center = _corr_shapes()
    out = patch_correlation(pf, f1, f2, jj, center, radius=3, chunk=4)
    assert out.shape == (5, 2 * 9 * 49)
    assert np.isfinite(np.asarray(out)).all()


def test_patch_correlation_peak_at_matching_feature():
    """A distinctive feature at the reprojected location must produce the max
    correlation at the window center."""
    C, H, W = 8, 32, 40
    f1 = jnp.zeros((1, H, W, C))
    probe = jnp.asarray(np.ones(C), jnp.float32)
    f1 = f1.at[0, 16, 20].set(probe)  # feature spike at (x=20, y=16)
    f2 = jnp.zeros((1, H // 2, W // 2, C))
    pf = jnp.tile(probe, (1, 3, 3, 1))  # patch looks like the probe
    out = patch_correlation(
        pf, f1, f2, jnp.asarray([0]), jnp.asarray([[20.0, 16.0]]),
        radius=3, chunk=1,
    )
    corr = np.asarray(out).reshape(2, 9, 7, 7)
    # level 0, center patch pixel (p=4): peak at window center (3, 3)
    c = corr[0, 4]
    assert np.unravel_index(np.argmax(c), c.shape) == (3, 3)
    # raw dot product (upstream scales fmaps at encode, not the corr)
    np.testing.assert_allclose(c[3, 3], C, atol=1e-5)


def test_patch_correlation_fractional_blend():
    """Center at half-pixel: the two adjacent window cells share the mass."""
    C, H, W = 4, 16, 16
    f1 = jnp.zeros((1, H, W, C)).at[0, 8, 8].set(1.0)
    f2 = jnp.zeros((1, H // 2, W // 2, C))
    pf = jnp.ones((1, 3, 3, C))
    out = patch_correlation(
        pf, f1, f2, jnp.asarray([0]), jnp.asarray([[7.5, 8.0]]),
        radius=2, chunk=1,
    )
    corr = np.asarray(out).reshape(2, 9, 5, 5)[0, 4]
    # spike is at x=8 = center 7.5 + 0.5: blended between offsets 0 and +1
    assert corr[2, 2] > 0 and corr[2, 3] > 0
    np.testing.assert_allclose(corr[2, 2], corr[2, 3], atol=1e-6)
