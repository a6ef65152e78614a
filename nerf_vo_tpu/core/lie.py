"""SO3 / SE3 Lie-group operations as pure JAX functions.

TPU-native replacement for the lietorch CUDA extension used throughout the
reference (call sites: nerf_vo/tracking/dpvo.py:91-92,128-131,
nerf_vo/tracking/droid_slam.py:616-617,666-668, evaluation/evaluation_utils.py:117-146).

Storage convention (matches lietorch so converted checkpoints / trajectories
interoperate): an SE3 element is a 7-vector ``[tx, ty, tz, qx, qy, qz, qw]``
(translation + unit quaternion, scalar-last).  A tangent vector is a 6-vector
``[rho, phi]`` — translational part first, rotational part second.

All functions broadcast over arbitrary leading batch dimensions and are safe
under jit/vmap/grad; small-angle branches use Taylor expansions selected with
``jnp.where`` on numerically safe operands (no NaN gradients).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8

# Geometry math must be exact: pin small-matrix products to full f32 precision
# so the default bf16 MXU passes never corrupt poses.
def _mm(a, b):
    return jnp.matmul(a, b, precision=jax.lax.Precision.HIGHEST)


# ---------------------------------------------------------------------------
# quaternion primitives (scalar-last [x, y, z, w])
# ---------------------------------------------------------------------------

def quat_identity(shape=(), dtype=jnp.float32):
    q = jnp.zeros(shape + (4,), dtype)
    return q.at[..., 3].set(1.0)


def quat_mul(q1, q2):
    """Hamilton product, scalar-last."""
    x1, y1, z1, w1 = jnp.moveaxis(q1, -1, 0)
    x2, y2, z2, w2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def quat_conj(q):
    return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], q.dtype)


def quat_normalize(q):
    return q / jnp.clip(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)


def quat_rotate(q, v):
    """Rotate 3-vector(s) v by unit quaternion(s) q."""
    qv = q[..., :3]
    qw = q[..., 3:4]
    uv = jnp.cross(qv, v)
    uuv = jnp.cross(qv, uv)
    return v + 2.0 * (qw * uv + uuv)


def quat_to_matrix(q):
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quat(m):
    """Rotation matrix -> scalar-last quaternion (Shepperd's method, branchless)."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tr = m00 + m11 + m22
    # four candidate solutions, one per largest diagonal element / trace
    qw0 = jnp.sqrt(jnp.clip(1.0 + tr, _EPS)) / 2.0
    c0 = jnp.stack([(m21 - m12), (m02 - m20), (m10 - m01), 4.0 * qw0 * qw0], -1) / (
        4.0 * qw0[..., None]
    )
    qx1 = jnp.sqrt(jnp.clip(1.0 + m00 - m11 - m22, _EPS)) / 2.0
    c1 = jnp.stack([4.0 * qx1 * qx1, (m01 + m10), (m02 + m20), (m21 - m12)], -1) / (
        4.0 * qx1[..., None]
    )
    qy2 = jnp.sqrt(jnp.clip(1.0 - m00 + m11 - m22, _EPS)) / 2.0
    c2 = jnp.stack([(m01 + m10), 4.0 * qy2 * qy2, (m12 + m21), (m02 - m20)], -1) / (
        4.0 * qy2[..., None]
    )
    qz3 = jnp.sqrt(jnp.clip(1.0 - m00 - m11 + m22, _EPS)) / 2.0
    c3 = jnp.stack([(m02 + m20), (m12 + m21), 4.0 * qz3 * qz3, (m10 - m01)], -1) / (
        4.0 * qz3[..., None]
    )

    diag = jnp.stack([tr, m00, m11, m22], -1)
    best = jnp.argmax(diag, axis=-1)
    cands = jnp.stack([c0, c1, c2, c3], -2)
    q = jnp.take_along_axis(cands, best[..., None, None].astype(jnp.int32), axis=-2)
    q = q[..., 0, :]
    q = jnp.where(q[..., 3:4] < 0, -q, q)  # canonical w >= 0 hemisphere
    return quat_normalize(q)


# ---------------------------------------------------------------------------
# SO3
# ---------------------------------------------------------------------------

def so3_hat(phi):
    """3-vector -> skew-symmetric matrix."""
    x, y, z = jnp.moveaxis(phi, -1, 0)
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape(phi.shape[:-1] + (3, 3))


def so3_exp_quat(phi):
    """SO3 exponential map -> quaternion (scalar-last)."""
    theta_sq = jnp.sum(phi * phi, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.clip(theta_sq, _EPS))
    small = theta_sq < 1e-8
    half = 0.5 * theta
    # sin(x/2)/x with Taylor fallback
    k = jnp.where(small, 0.5 - theta_sq / 48.0, jnp.sin(half) / theta)
    w = jnp.where(small, 1.0 - theta_sq / 8.0, jnp.cos(half))
    return jnp.concatenate([phi * k, w], axis=-1)


def so3_log(q):
    """Quaternion -> rotation vector (axis * angle)."""
    q = jnp.where(q[..., 3:4] < 0, -q, q)  # canonical hemisphere
    qv = q[..., :3]
    qw = jnp.clip(q[..., 3:4], -1.0, 1.0)
    n_sq = jnp.sum(qv * qv, axis=-1, keepdims=True)
    n = jnp.sqrt(jnp.clip(n_sq, _EPS))
    angle = 2.0 * jnp.arctan2(n, qw)
    small = n_sq < 1e-12
    k = jnp.where(small, 2.0 / jnp.clip(qw, _EPS), angle / n)
    return qv * k


def so3_left_jacobian(phi):
    """Left Jacobian J_l of SO3: exp((phi + dphi)^) ≈ exp(J_l dphi ^) exp(phi^)."""
    theta_sq = jnp.sum(phi * phi, axis=-1)
    theta = jnp.sqrt(jnp.clip(theta_sq, _EPS))
    small = theta_sq < 1e-8
    Phi = so3_hat(phi)
    Phi2 = _mm(Phi, Phi)
    a = jnp.where(small, 0.5 - theta_sq / 24.0, (1 - jnp.cos(theta)) / jnp.clip(theta_sq, _EPS))
    b = jnp.where(
        small, 1.0 / 6.0 - theta_sq / 120.0,
        (theta - jnp.sin(theta)) / jnp.clip(theta_sq * theta, _EPS),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), Phi.shape)
    return eye + a[..., None, None] * Phi + b[..., None, None] * Phi2


# ---------------------------------------------------------------------------
# SE3 — 7-vector [t(3), q(4)]
# ---------------------------------------------------------------------------

def se3_identity(shape=(), dtype=jnp.float32):
    g = jnp.zeros(shape + (7,), dtype)
    return g.at[..., 6].set(1.0)


def se3_t(g):
    return g[..., :3]


def se3_q(g):
    return g[..., 3:7]


def se3_make(t, q):
    return jnp.concatenate([t, q], axis=-1)


def se3_inv(g):
    q_inv = quat_conj(se3_q(g))
    t_inv = -quat_rotate(q_inv, se3_t(g))
    return se3_make(t_inv, q_inv)


def se3_mul(g1, g2):
    """Group composition g1 * g2 (apply g2 first, then g1)."""
    q = quat_mul(se3_q(g1), se3_q(g2))
    t = se3_t(g1) + quat_rotate(se3_q(g1), se3_t(g2))
    return se3_make(t, quat_normalize(q))


def se3_act(g, p):
    """Apply SE3 transform to 3D point(s)."""
    return quat_rotate(se3_q(g), p) + se3_t(g)


def se3_matrix(g):
    """7-vector -> homogeneous 4x4 matrix."""
    R = quat_to_matrix(se3_q(g))
    t = se3_t(g)[..., None]
    top = jnp.concatenate([R, t], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], g.dtype), g.shape[:-1] + (4,)
    )[..., None, :]
    return jnp.concatenate([top, bottom], axis=-2)


def se3_from_matrix(m):
    q = matrix_to_quat(m[..., :3, :3])
    t = m[..., :3, 3]
    return se3_make(t, q)


def se3_exp(xi):
    """SE3 exponential map. xi = [rho(3), phi(3)] -> 7-vector."""
    rho, phi = xi[..., :3], xi[..., 3:6]
    q = so3_exp_quat(phi)
    t = jnp.squeeze(_mm(so3_left_jacobian(phi), rho[..., None]), -1)
    return se3_make(t, q)


def se3_log(g):
    """SE3 logarithm map -> [rho(3), phi(3)]."""
    phi = so3_log(se3_q(g))
    Jl = so3_left_jacobian(phi)
    rho = jnp.linalg.solve(Jl, se3_t(g)[..., None])[..., 0]
    return jnp.concatenate([rho, phi], axis=-1)


def se3_retract(g, xi):
    """Left-multiplicative retraction: exp(xi) * g  (matches lietorch retr)."""
    return se3_mul(se3_exp(xi), g)


def se3_normalize(g):
    return se3_make(se3_t(g), quat_normalize(se3_q(g)))


def se3_interp(g0, g1, alpha):
    """Geodesic interpolation between two SE3 elements (slerp-style).

    Replaces the lietorch-based pose interpolation of invalid ScanNet GT poses
    (reference: evaluation/evaluation_utils.py:93-157).
    """
    d = se3_mul(se3_inv(g0), g1)
    xi = se3_log(d)
    return se3_mul(g0, se3_exp(alpha[..., None] * xi))


def se3_adjoint(g):
    """6x6 adjoint matrix of an SE3 element (tangent [rho, phi] convention)."""
    R = quat_to_matrix(se3_q(g))
    tR = _mm(so3_hat(se3_t(g)), R)
    z = jnp.zeros_like(R)
    top = jnp.concatenate([R, tR], axis=-1)
    bottom = jnp.concatenate([z, R], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)
