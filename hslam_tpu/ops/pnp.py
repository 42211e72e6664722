"""Batched PnP (3D-2D pose) RANSAC + Gauss-Newton refinement.

Used by relocalization (models/system.py) — a capability the reference
lacks entirely (its only loss recovery is retrying motion hypotheses,
System.cpp:483-489 "BIG ERROR ... hope we may somehow recover").

Pipeline: minimal 6-point DLT samples solved as one batch (vmapped SVD),
scored by reprojection inliers, then SE3 GN on the best hypothesis's
inlier set. Standard Hartley-Zisserman DLT + orthogonalization.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils import lie


class PnPResult(NamedTuple):
    ok: jnp.ndarray        # ()
    R: jnp.ndarray         # (3, 3) world-to-cam
    t: jnp.ndarray         # (3,)
    inliers: jnp.ndarray   # (N,)


def _dlt_pose(X, x_n):
    """X (6, 3) world points; x_n (6, 2) normalized image coords.
    Returns (R, t) world-to-cam via DLT + orthogonalization."""
    n = X.shape[0]
    zeros = jnp.zeros((n, 4))
    Xh = jnp.concatenate([X, jnp.ones((n, 1))], -1)          # (6, 4)
    r1 = jnp.concatenate([Xh, zeros, -x_n[:, 0:1] * Xh], -1)  # (6, 12)
    r2 = jnp.concatenate([zeros, Xh, -x_n[:, 1:2] * Xh], -1)
    A = jnp.concatenate([r1, r2], 0)                          # (12, 12)
    _, _, Vt = jnp.linalg.svd(A)
    P = Vt[-1].reshape(3, 4)
    M = P[:, :3]
    U, S, Vt2 = jnp.linalg.svd(M)
    det = jnp.linalg.det(U @ Vt2)
    R = U @ jnp.diag(jnp.array([1.0, 1.0, 1.0]) * jnp.sign(det)) @ Vt2
    scale = jnp.sign(det) * jnp.mean(S)
    t = P[:, 3] / jnp.where(jnp.abs(scale) < 1e-12, 1e-12, scale)
    # enforce cheirality on the sample centroid: flip if behind
    zc = (R @ jnp.mean(X, 0) + t)[2]
    flip = zc < 0
    R = jnp.where(flip, -R, R)
    t = jnp.where(flip, -t, t)
    return R, t


def _reproj_err(R, t, X, x_px, K):
    Xc = X @ R.T + t
    z = jnp.where(jnp.abs(Xc[:, 2]) < 1e-9, 1e-9, Xc[:, 2])
    u = K[0, 0] * Xc[:, 0] / z + K[0, 2]
    v = K[1, 1] * Xc[:, 1] / z + K[1, 2]
    err = jnp.sqrt((u - x_px[:, 0]) ** 2 + (v - x_px[:, 1]) ** 2)
    return jnp.where(Xc[:, 2] > 0.01, err, 1e9)


def solve_pnp(
    X: jnp.ndarray,          # (N, 3) 3D points
    x_px: jnp.ndarray,       # (N, 2) pixel observations
    valid: jnp.ndarray,      # (N,)
    K: jnp.ndarray,          # (3, 3)
    key: jnp.ndarray,
    n_iters: int = 64,
    inlier_px: float = 3.0,
    min_inliers: int = 12,
    init_R: jnp.ndarray | None = None,
    init_t: jnp.ndarray | None = None,
) -> PnPResult:
    """init_R/init_t: optional pose hypothesis entered into the RANSAC
    scoring alongside the DLT minimal samples. Essential when the points
    are (near-)coplanar — the 6-point DLT is degenerate on planes, but
    loop closure / relocalization always have a usable prior pose."""
    N = X.shape[0]
    Kinv = jnp.linalg.inv(K)
    x_n = jnp.concatenate([x_px, jnp.ones((N, 1))], -1) @ Kinv.T
    x_n = x_n[:, :2]

    probs = valid.astype(jnp.float32)
    probs = probs / jnp.maximum(probs.sum(), 1.0)
    samples = jax.random.choice(key, N, shape=(n_iters, 6), p=probs)

    Rs, ts = jax.vmap(lambda idx: _dlt_pose(X[idx], x_n[idx]))(samples)
    if init_R is not None:
        Rs = jnp.concatenate([Rs, init_R[None]], axis=0)
        ts = jnp.concatenate([ts, init_t[None]], axis=0)
    errs = jax.vmap(lambda R, t: _reproj_err(R, t, X, x_px, K))(Rs, ts)
    inl = (errs < inlier_px) & valid[None, :]
    counts = jnp.sum(inl, axis=-1)
    best = jnp.argmax(counts)
    R0, t0 = Rs[best], ts[best]
    inliers = inl[best]

    # GN refinement (left-multiplied SE3 increments). `basin_px` sets the
    # robust IRLS basin: wide in round 1 so an approximate init hypothesis
    # pulls in, hard inliers in round 2.
    def make_gn(basin_px, hard_mask=None):
        def gn_step(_, carry):
            R, t = carry
            Xc = X @ R.T + t
            z = jnp.where(jnp.abs(Xc[:, 2]) < 1e-9, 1e-9, Xc[:, 2])
            u = Xc[:, 0] / z
            v = Xc[:, 1] / z
            fx, fy = K[0, 0], K[1, 1]
            ru = fx * u + K[0, 2] - x_px[:, 0]
            rv = fy * v + K[1, 2] - x_px[:, 1]
            err = jnp.sqrt(ru * ru + rv * rv)
            hw = jnp.where(err < basin_px, 1.0,
                           basin_px / jnp.maximum(err, 1e-9))
            w = valid.astype(jnp.float32) * hw * (Xc[:, 2] > 0.01)
            if hard_mask is not None:
                w = w * hard_mask
            iz = 1.0 / z
            Ju = jnp.stack(
                [fx * iz, jnp.zeros_like(iz), -fx * u * iz,
                 -fx * u * v, fx * (1 + u * u), -fx * v], -1)
            Jv = jnp.stack(
                [jnp.zeros_like(iz), fy * iz, -fy * v * iz,
                 -fy * (1 + v * v), fy * u * v, fy * u], -1)
            wc = w[:, None]
            J = jnp.concatenate([Ju * wc, Jv * wc], 0)           # (2N, 6)
            r = jnp.concatenate([ru * w, rv * w])
            H = J.T @ J + jnp.eye(6) * 1e-4
            dx = -jnp.linalg.solve(H, J.T @ r)
            dR, dt = lie.se3_exp(dx)
            return lie.se3_mul(dR, dt, R, t)

        return gn_step

    R, t = jax.lax.fori_loop(0, 6, make_gn(3.0 * inlier_px), (R0, t0))
    err_m = _reproj_err(R, t, X, x_px, K)
    hard = ((err_m < inlier_px) & valid).astype(jnp.float32)
    R, t = jax.lax.fori_loop(0, 5, make_gn(inlier_px, hard), (R, t))
    err_f = _reproj_err(R, t, X, x_px, K)
    inliers = (err_f < inlier_px) & valid
    ok = jnp.sum(inliers) >= min_inliers
    return PnPResult(ok=ok, R=R, t=t, inliers=inliers)


# shared jitted entry (one executable per point-set shape): relocalization
# and loop closure both solve PnP on fixed-capacity keypoint sets, and the
# first call happens on a latency-critical path (tracking failure / loop
# candidate) — warmed by SLAMSystem's background precompile thread.
solve_pnp_jit = jax.jit(solve_pnp, static_argnames=("n_iters",))
