import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_vo_tpu.core import lie


def random_se3(rng, shape=()):
    phi = rng.normal(size=shape + (3,)) * 0.8
    q = np.asarray(lie.so3_exp_quat(jnp.asarray(phi, jnp.float32)))
    t = rng.normal(size=shape + (3,)).astype(np.float32)
    return jnp.asarray(np.concatenate([t, q], axis=-1), jnp.float32)


def test_quat_mul_identity(rng):
    q = lie.quat_normalize(jnp.asarray(rng.normal(size=(5, 4)), jnp.float32))
    e = lie.quat_identity((5,))
    np.testing.assert_allclose(lie.quat_mul(q, e), q, atol=1e-6)
    np.testing.assert_allclose(lie.quat_mul(e, q), q, atol=1e-6)


def test_quat_rotate_matches_matrix(rng):
    q = lie.quat_normalize(jnp.asarray(rng.normal(size=(7, 4)), jnp.float32))
    v = jnp.asarray(rng.normal(size=(7, 3)), jnp.float32)
    R = lie.quat_to_matrix(q)
    np.testing.assert_allclose(
        lie.quat_rotate(q, v), jnp.einsum("...ij,...j->...i", R, v), atol=1e-5
    )


def test_matrix_quat_roundtrip(rng):
    q = lie.quat_normalize(jnp.asarray(rng.normal(size=(64, 4)), jnp.float32))
    q = jnp.where(q[..., 3:4] < 0, -q, q)
    q2 = lie.matrix_to_quat(lie.quat_to_matrix(q))
    np.testing.assert_allclose(q2, q, atol=1e-5)


def test_matrix_quat_roundtrip_degenerate():
    # 180-degree rotations hit every branch of Shepperd's method
    for axis in range(3):
        phi = np.zeros(3, np.float32)
        phi[axis] = np.pi - 1e-4
        q = lie.so3_exp_quat(jnp.asarray(phi))
        R = lie.quat_to_matrix(q)
        q2 = lie.matrix_to_quat(R)
        np.testing.assert_allclose(lie.quat_to_matrix(q2), R, atol=1e-4)


def test_so3_exp_log_roundtrip(rng):
    phi = rng.normal(size=(32, 3))
    # log returns the principal rotation: keep angles < pi for exact roundtrip
    phi = phi / np.linalg.norm(phi, axis=-1, keepdims=True)
    phi = phi * rng.uniform(1e-3, np.pi - 1e-2, size=(32, 1))
    phi = jnp.asarray(phi, jnp.float32)
    phi2 = lie.so3_log(lie.so3_exp_quat(phi))
    np.testing.assert_allclose(phi2, phi, atol=1e-4)
    # angles beyond pi wrap but must still represent the same rotation
    big = jnp.asarray([[4.0, 0.0, 0.0]], jnp.float32)
    q1 = lie.so3_exp_quat(big)
    q2 = lie.so3_exp_quat(lie.so3_log(q1))
    np.testing.assert_allclose(
        lie.quat_to_matrix(q2), lie.quat_to_matrix(q1), atol=1e-5
    )


def test_so3_exp_small_angle():
    phi = jnp.asarray([[1e-9, 0.0, 0.0], [0.0, 0.0, 0.0]], jnp.float32)
    q = lie.so3_exp_quat(phi)
    assert not np.any(np.isnan(np.asarray(q)))
    np.testing.assert_allclose(q[1], [0, 0, 0, 1], atol=1e-7)
    # gradients finite at zero
    g = jax.grad(lambda p: jnp.sum(lie.so3_exp_quat(p)))(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(g)))


def test_se3_exp_log_roundtrip(rng):
    xi = jnp.asarray(rng.normal(size=(16, 6)), jnp.float32)
    xi2 = lie.se3_log(lie.se3_exp(xi))
    np.testing.assert_allclose(xi2, xi, atol=1e-4)


def test_se3_inverse(rng):
    g = random_se3(rng, (8,))
    e = lie.se3_mul(g, lie.se3_inv(g))
    np.testing.assert_allclose(lie.se3_t(e), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.abs(np.asarray(lie.se3_q(e))[..., 3]), 1.0, atol=1e-5)


def test_se3_matrix_consistency(rng):
    g1 = random_se3(rng, (4,))
    g2 = random_se3(rng, (4,))
    m = lie.se3_matrix(lie.se3_mul(g1, g2))
    expected = np.asarray(lie.se3_matrix(g1)) @ np.asarray(lie.se3_matrix(g2))
    np.testing.assert_allclose(m, expected, atol=1e-5)


def test_se3_from_matrix_roundtrip(rng):
    g = random_se3(rng, (6,))
    m = lie.se3_matrix(g)
    g2 = lie.se3_from_matrix(m)
    np.testing.assert_allclose(lie.se3_matrix(g2), m, atol=1e-5)


def test_se3_act_matches_matrix(rng):
    g = random_se3(rng, (5,))
    p = jnp.asarray(rng.normal(size=(5, 3)), jnp.float32)
    ph = jnp.concatenate([p, jnp.ones((5, 1))], -1)
    expected = jnp.einsum("...ij,...j->...i", lie.se3_matrix(g), ph)[..., :3]
    np.testing.assert_allclose(lie.se3_act(g, p), expected, atol=1e-5)


def test_se3_retract_first_order(rng):
    g = random_se3(rng)
    xi = jnp.asarray(rng.normal(size=(6,)) * 1e-4, jnp.float32)
    g2 = lie.se3_retract(g, xi)
    # log(g2 g^-1) ≈ xi for small xi
    d = lie.se3_log(lie.se3_mul(g2, lie.se3_inv(g)))
    np.testing.assert_allclose(d, xi, atol=1e-6)


def test_se3_interp_endpoints(rng):
    g0, g1 = random_se3(rng), random_se3(rng)
    a0 = lie.se3_interp(g0, g1, jnp.asarray(0.0))
    a1 = lie.se3_interp(g0, g1, jnp.asarray(1.0))
    np.testing.assert_allclose(lie.se3_matrix(a0), lie.se3_matrix(g0), atol=1e-5)
    np.testing.assert_allclose(lie.se3_matrix(a1), lie.se3_matrix(g1), atol=1e-4)


def test_se3_adjoint(rng):
    g = random_se3(rng)
    xi = jnp.asarray(rng.normal(size=(6,)) * 0.1, jnp.float32)
    # Ad_g xi  satisfies  g exp(xi) g^-1 = exp(Ad_g xi)
    lhs = lie.se3_mul(lie.se3_mul(g, lie.se3_exp(xi)), lie.se3_inv(g))
    rhs = lie.se3_exp(lie.se3_adjoint(g) @ xi)
    np.testing.assert_allclose(lie.se3_matrix(lhs), lie.se3_matrix(rhs), atol=1e-4)


def test_jit_and_vmap():
    f = jax.jit(jax.vmap(lie.se3_exp))
    xi = jnp.zeros((10, 6))
    out = f(xi)
    np.testing.assert_allclose(out, lie.se3_identity((10,)), atol=1e-7)
