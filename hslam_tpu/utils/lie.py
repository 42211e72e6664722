"""Batched Lie-group operations: SO(3), SE(3), Sim(3).

Pure-jnp replacement for the reference's Sophus dependency
(reference: Thirdparty/Sophus; typedefs at Include/GlobalTypes.h:219-221).
All functions broadcast over arbitrary leading batch dimensions and are
differentiable / jit-safe (no data-dependent control flow; small-angle
branches use jnp.where with Taylor fallbacks).

Conventions:
  * SE3 elements are (R, t) pairs: R (..., 3, 3), t (..., 3).
  * se3 tangent vectors are 6-vectors ordered [translation(3), rotation(3)]
    — the same ordering Sophus (and hence the reference's frame states,
    Include/Frame.h:116-275) uses.
  * exp is the left matrix exponential: T = exp(xi^) acts as x -> R x + t.
  * sim3 tangent is 7-vectors [t(3), w(3), sigma(1)] with scale s = exp(sigma).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(w):
    """so3 hat operator: (..., 3) -> (..., 3, 3) skew-symmetric."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def vee(W):
    """Inverse of hat: (..., 3, 3) -> (..., 3)."""
    return jnp.stack([W[..., 2, 1], W[..., 0, 2], W[..., 1, 0]], axis=-1)


def _sinc_terms(theta2):
    """Return (A, B, C) = (sin t/t, (1-cos t)/t^2, (t - sin t)/t^3) with
    series fallbacks near zero. theta2 = t^2."""
    theta = jnp.sqrt(jnp.maximum(theta2, 0.0))
    small = theta2 < 1e-8
    # guard against 0-division in the large branch
    th2_safe = jnp.where(small, 1.0, theta2)
    th_safe = jnp.where(small, 1.0, theta)
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(th_safe) / th_safe)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(th_safe)) / th2_safe)
    C = jnp.where(
        small, 1.0 / 6.0 - theta2 / 120.0, (th_safe - jnp.sin(th_safe)) / (th2_safe * th_safe)
    )
    return A, B, C


def so3_exp(w):
    """Rodrigues: (..., 3) -> (..., 3, 3)."""
    theta2 = jnp.sum(w * w, axis=-1)
    A, B, _ = _sinc_terms(theta2)
    W = hat(w)
    W2 = W @ W
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I + A[..., None, None] * W + B[..., None, None] * W2


def so3_log(R):
    """(..., 3, 3) -> (..., 3), via the quaternion representation — stable
    over the whole angle range including theta near 0 and near pi."""
    q = rot_to_quat(R)                       # [x, y, z, w], w >= 0
    xyz = q[..., :3]
    qw = q[..., 3]
    n = jnp.linalg.norm(xyz, axis=-1)
    theta = 2.0 * jnp.arctan2(n, qw)
    small = n < 1e-6
    n_safe = jnp.where(small, 1.0, n)
    # w = theta * axis; for small angle theta/n -> 2/qw
    scale = jnp.where(small, 2.0 / jnp.maximum(qw, 1e-6), theta / n_safe)
    return xyz * scale[..., None]


def so3_left_jacobian(w):
    """V such that exp(t + w) translation part = V t. (..., 3) -> (..., 3, 3)."""
    theta2 = jnp.sum(w * w, axis=-1)
    _, B, C = _sinc_terms(theta2)
    W = hat(w)
    W2 = W @ W
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I + B[..., None, None] * W + C[..., None, None] * W2


def so3_left_jacobian_inv(w):
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, 0.0))
    small = theta2 < 1e-8
    th_safe = jnp.where(small, 1.0, theta)
    half = th_safe * 0.5
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 - half * jnp.cos(half) / jnp.sin(half)) / th_safe**2,
    )
    W = hat(w)
    W2 = W @ W
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return I - 0.5 * W + cot_term[..., None, None] * W2


def se3_exp(xi):
    """(..., 6) [t, w] -> (R (...,3,3), t (...,3))."""
    v, w = xi[..., :3], xi[..., 3:]
    R = so3_exp(w)
    V = so3_left_jacobian(w)
    t = jnp.einsum("...ij,...j->...i", V, v)
    return R, t


def se3_log(R, t):
    """(R, t) -> (..., 6) [v, w]."""
    w = so3_log(R)
    Vinv = so3_left_jacobian_inv(w)
    v = jnp.einsum("...ij,...j->...i", Vinv, t)
    return jnp.concatenate([v, w], axis=-1)


def se3_inverse(R, t):
    Rt = jnp.swapaxes(R, -1, -2)
    return Rt, -jnp.einsum("...ij,...j->...i", Rt, t)


def se3_mul(Ra, ta, Rb, tb):
    """Compose: (Ra, ta) * (Rb, tb)."""
    return Ra @ Rb, jnp.einsum("...ij,...j->...i", Ra, tb) + ta


def se3_apply(R, t, x):
    return jnp.einsum("...ij,...j->...i", R, x) + t


def se3_adjoint(R, t):
    """Adjoint of SE3 for [v, w] tangent ordering: (..., 6, 6).

    Ad = [[R, hat(t) R], [0, R]] — matches Sophus SE3::Adj() used for the
    reference's relative->absolute chain rule (EnergyFunctional.cpp:41).
    """
    tR = hat(t) @ R
    Z = jnp.zeros_like(R)
    top = jnp.concatenate([R, tR], axis=-1)
    bot = jnp.concatenate([Z, R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def se3_matrix(R, t):
    """(..., 4, 4) homogeneous matrix."""
    batch = R.shape[:-2]
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (1, 4)
    )
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def quat_to_rot(q):
    """Unit quaternion [x, y, z, w] -> rotation matrix (..., 3, 3)."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    n = x * x + y * y + z * z + w * w
    s = jnp.where(n > 0, 2.0 / jnp.maximum(n, _EPS), 0.0)
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    xx, xy, xz = s * x * x, s * x * y, s * x * z
    yy, yz, zz = s * y * y, s * y * z, s * z * z
    return jnp.stack(
        [
            jnp.stack([1.0 - (yy + zz), xy - wz, xz + wy], axis=-1),
            jnp.stack([xy + wz, 1.0 - (xx + zz), yz - wx], axis=-1),
            jnp.stack([xz - wy, yz + wx, 1.0 - (xx + yy)], axis=-1),
        ],
        axis=-2,
    )


def rot_to_quat(R):
    """Rotation matrix -> unit quaternion [x, y, z, w], w >= 0."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22
    # four candidate constructions; pick the numerically best
    qw0 = jnp.sqrt(jnp.maximum(1.0 + tr, _EPS)) * 0.5
    q0 = jnp.stack([(m21 - m12), (m02 - m20), (m10 - m01), 4.0 * qw0 * qw0], axis=-1) / (
        4.0 * qw0[..., None]
    )
    qx1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, _EPS)) * 0.5
    q1 = jnp.stack(
        [4.0 * qx1 * qx1, (m01 + m10), (m02 + m20), (m21 - m12)], axis=-1
    ) / (4.0 * qx1[..., None])
    qy2 = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, _EPS)) * 0.5
    q2 = jnp.stack(
        [(m01 + m10), 4.0 * qy2 * qy2, (m12 + m21), (m02 - m20)], axis=-1
    ) / (4.0 * qy2[..., None])
    qz3 = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, _EPS)) * 0.5
    q3 = jnp.stack(
        [(m02 + m20), (m12 + m21), 4.0 * qz3 * qz3, (m10 - m01)], axis=-1
    ) / (4.0 * qz3[..., None])
    cases = jnp.stack([q0, q1, q2, q3], axis=-2)  # (..., 4, 4)
    scores = jnp.stack([tr, m00 - m11 - m22, m11 - m00 - m22, m22 - m00 - m11], axis=-1)
    best = jnp.argmax(scores, axis=-1)
    q = jnp.take_along_axis(cases, best[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), _EPS)
    return q * jnp.where(q[..., 3:4] < 0, -1.0, 1.0)


# ---------------------------------------------------------------------------
# Sim(3) — needed for scale-drift-aware pose-graph relaxation (capability
# envelope; the reference links g2o for this, CMakeLists.txt:38).
# Element: (s, R, t); action x -> s R x + t. Tangent [v(3), w(3), sigma].
# ---------------------------------------------------------------------------


def sim3_exp(xi):
    """(..., 7) -> (s (...,), R (...,3,3), t (...,3))."""
    v, w, sigma = xi[..., :3], xi[..., 3:6], xi[..., 6]
    s = jnp.exp(sigma)
    R = so3_exp(w)
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, 0.0))
    W = hat(w)
    W2 = W @ W
    I = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), R.shape)

    # W coefficients of the sim3 "V" matrix (closed form, see Strasdat's thesis)
    eps = 1e-6
    sig_small = jnp.abs(sigma) < eps
    th_small = theta < eps
    sig_safe = jnp.where(sig_small, 1.0, sigma)
    th_safe = jnp.where(th_small, 1.0, theta)

    A_ss = jnp.where(sig_small, 1.0 + sigma / 2.0, (s - 1.0) / sig_safe)  # int e^{s u} du approx

    # case both small handled by series; general formulas:
    # exact closed forms (valid at sigma == 0 as-is):
    #   A = [s (sigma sin t - t cos t) + t] / (t (sigma^2 + t^2))
    #   B = [C - (s (sigma cos t + t sin t) - sigma) / (sigma^2 + t^2)] / t^2
    a = sigma * sigma + th_safe * th_safe
    ct, st = jnp.cos(th_safe), jnp.sin(th_safe)
    A_gen = (s * (sigma * st - th_safe * ct) + th_safe) / (a * th_safe)
    B_gen = (A_ss - (s * (sigma * ct + th_safe * st) - sigma) / a) / (th_safe * th_safe)
    A_thsmall = jnp.where(
        sig_small, 0.5 + sigma / 3.0, ((sig_safe - 1.0) * s + 1.0) / (sig_safe * sig_safe)
    )
    B_thsmall = jnp.where(
        sig_small,
        1.0 / 6.0 + sigma / 8.0,
        (s * (0.5 * sig_safe * sig_safe - sig_safe + 1.0) - 1.0) / (sig_safe**3),
    )
    A = jnp.where(th_small, A_thsmall, A_gen)
    B = jnp.where(th_small, B_thsmall, B_gen)
    V = A_ss[..., None, None] * I + A[..., None, None] * W + B[..., None, None] * W2
    t = jnp.einsum("...ij,...j->...i", V, v)
    return s, R, t


def sim3_log(s, R, t):
    """Inverse of sim3_exp via solving V v = t with the same V."""
    w = so3_log(R)
    sigma = jnp.log(s)
    V = _sim3_V(w, sigma)
    v = jnp.linalg.solve(V, t[..., None])[..., 0]
    return jnp.concatenate([v, w, sigma[..., None]], axis=-1)


def _sim3_V(w, sigma):
    s = jnp.exp(sigma)
    theta2 = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta2, 0.0))
    W = hat(w)
    W2 = W @ W
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    eps = 1e-6
    sig_small = jnp.abs(sigma) < eps
    th_small = theta < eps
    sig_safe = jnp.where(sig_small, 1.0, sigma)
    th_safe = jnp.where(th_small, 1.0, theta)
    A_ss = jnp.where(sig_small, 1.0 + sigma / 2.0, (s - 1.0) / sig_safe)
    # exact closed forms (valid at sigma == 0 as-is):
    #   A = [s (sigma sin t - t cos t) + t] / (t (sigma^2 + t^2))
    #   B = [C - (s (sigma cos t + t sin t) - sigma) / (sigma^2 + t^2)] / t^2
    a = sigma * sigma + th_safe * th_safe
    ct, st = jnp.cos(th_safe), jnp.sin(th_safe)
    A_gen = (s * (sigma * st - th_safe * ct) + th_safe) / (a * th_safe)
    B_gen = (A_ss - (s * (sigma * ct + th_safe * st) - sigma) / a) / (th_safe * th_safe)
    A_thsmall = jnp.where(
        sig_small, 0.5 + sigma / 3.0, ((sig_safe - 1.0) * s + 1.0) / (sig_safe * sig_safe)
    )
    B_thsmall = jnp.where(
        sig_small,
        1.0 / 6.0 + sigma / 8.0,
        (s * (0.5 * sig_safe * sig_safe - sig_safe + 1.0) - 1.0) / (sig_safe**3),
    )
    A = jnp.where(th_small, A_thsmall, A_gen)
    B = jnp.where(th_small, B_thsmall, B_gen)
    return A_ss[..., None, None] * I + A[..., None, None] * W + B[..., None, None] * W2


def sim3_inverse(s, R, t):
    si = 1.0 / s
    Rt = jnp.swapaxes(R, -1, -2)
    return si, Rt, -si[..., None] * jnp.einsum("...ij,...j->...i", Rt, t)


def sim3_mul(sa, Ra, ta, sb, Rb, tb):
    return (
        sa * sb,
        Ra @ Rb,
        sa[..., None] * jnp.einsum("...ij,...j->...i", Ra, tb) + ta,
    )
