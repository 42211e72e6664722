"""Two-view geometry: batched H/F RANSAC, model selection, reconstruction.

Capability-equivalent re-design of the reference's indirect two-view
initializer core (reference: Src/Initializer.cpp — FindTransformation
:401-520, ReconstructF :811-914, ReconstructH Faugeras decomposition
:916-1073, Triangulate :1075-1090, CheckRT cheirality :1138-1259).
Instead of the reference's two RANSAC threads with per-iteration loops, all
RANSAC hypotheses are evaluated as one batch (the reference's
mMaxIterations=200 fits in a single batched SVD); H and F run side by side
and the winner is chosen by the score ratio RH > 0.40 (:446-452).

Algorithms are the standard Hartley-Zisserman normalized 8-point / DLT
constructions, implemented from first principles.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..utils import lie

CHI2_F = 3.841
CHI2_H = 5.991
SCORE_TH = 5.991
SIGMA = 1.0


def _normalize(pts: jnp.ndarray):
    """Hartley normalization. pts (N, 2) -> (normalized, T (3,3))."""
    mean = pts.mean(axis=0)
    d = jnp.abs(pts - mean).mean(axis=0)
    s = 1.0 / jnp.maximum(d, 1e-8)
    T = jnp.array(
        [[s[0], 0.0, -mean[0] * s[0]], [0.0, s[1], -mean[1] * s[1]], [0.0, 0.0, 1.0]]
    )
    return (pts - mean) * s, T


def _eight_point_F(p1, p2):
    """p1, p2 (8, 2) normalized. Returns F (3, 3) with rank-2 constraint."""
    x1, y1 = p1[:, 0], p1[:, 1]
    x2, y2 = p2[:, 0], p2[:, 1]
    A = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, jnp.ones_like(x1)],
        axis=-1,
    )  # (8, 9)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    F = Vt[-1].reshape(3, 3)
    U, S, Vt2 = jnp.linalg.svd(F)
    S = S.at[2].set(0.0)
    return U @ jnp.diag(S) @ Vt2


def _dlt_H(p1, p2):
    """p1, p2 (8, 2) normalized. DLT homography from >= 4 correspondences."""
    x1, y1 = p1[:, 0], p1[:, 1]
    x2, y2 = p2[:, 0], p2[:, 1]
    z = jnp.zeros_like(x1)
    o = jnp.ones_like(x1)
    r1 = jnp.stack([z, z, z, -x1, -y1, -o, y2 * x1, y2 * y1, y2], axis=-1)
    r2 = jnp.stack([x1, y1, o, z, z, z, -x2 * x1, -x2 * y1, -x2], axis=-1)
    A = jnp.concatenate([r1, r2], axis=0)  # (16, 9)
    _, _, Vt = jnp.linalg.svd(A, full_matrices=True)
    return Vt[-1].reshape(3, 3)


def _score_F(F, p1, p2, valid):
    """Symmetric epipolar-distance score (Initializer CheckFundamental
    style): per point sum of max(0, TH - chi2) both directions."""
    x1 = jnp.concatenate([p1, jnp.ones((p1.shape[0], 1))], axis=-1)
    x2 = jnp.concatenate([p2, jnp.ones((p2.shape[0], 1))], axis=-1)
    Fx1 = x1 @ F.T          # (N, 3) lines in image 2
    Ftx2 = x2 @ F            # lines in image 1
    num = jnp.sum(x2 * Fx1, axis=-1)
    d2_2 = num**2 / jnp.maximum(Fx1[:, 0] ** 2 + Fx1[:, 1] ** 2, 1e-12)
    d2_1 = num**2 / jnp.maximum(Ftx2[:, 0] ** 2 + Ftx2[:, 1] ** 2, 1e-12)
    inv_s2 = 1.0 / (SIGMA * SIGMA)
    chi1 = d2_1 * inv_s2
    chi2 = d2_2 * inv_s2
    in1 = (chi1 <= CHI2_F) & valid
    in2 = (chi2 <= CHI2_F) & valid
    score = (
        jnp.sum(jnp.where(in1, SCORE_TH - chi1, 0.0))
        + jnp.sum(jnp.where(in2, SCORE_TH - chi2, 0.0))
    )
    inliers = in1 & in2
    return score, inliers


def _score_H(Hm, p1, p2, valid):
    Hinv = jnp.linalg.inv(Hm)
    x1 = jnp.concatenate([p1, jnp.ones((p1.shape[0], 1))], axis=-1)
    x2 = jnp.concatenate([p2, jnp.ones((p2.shape[0], 1))], axis=-1)
    Hx1 = x1 @ Hm.T
    Hx1 = Hx1[:, :2] / jnp.where(jnp.abs(Hx1[:, 2:3]) < 1e-12, 1e-12, Hx1[:, 2:3])
    Hix2 = x2 @ Hinv.T
    Hix2 = Hix2[:, :2] / jnp.where(jnp.abs(Hix2[:, 2:3]) < 1e-12, 1e-12, Hix2[:, 2:3])
    inv_s2 = 1.0 / (SIGMA * SIGMA)
    chi2_2 = jnp.sum((p2 - Hx1) ** 2, axis=-1) * inv_s2
    chi2_1 = jnp.sum((p1 - Hix2) ** 2, axis=-1) * inv_s2
    in1 = (chi2_1 <= CHI2_H) & valid
    in2 = (chi2_2 <= CHI2_H) & valid
    score = (
        jnp.sum(jnp.where(in1, SCORE_TH - chi2_1, 0.0))
        + jnp.sum(jnp.where(in2, SCORE_TH - chi2_2, 0.0))
    )
    return score, in1 & in2


class TwoViewResult(NamedTuple):
    ok: jnp.ndarray          # ()
    R: jnp.ndarray           # (3, 3) frame1->frame2
    t: jnp.ndarray           # (3,) unit-normalized
    is_H: jnp.ndarray        # () model used
    inliers: jnp.ndarray     # (N,)
    points3d: jnp.ndarray    # (N, 3) in frame-1 coords
    tri_ok: jnp.ndarray      # (N,) triangulated & cheirality-passed


def _triangulate(R, t, K, p1, p2):
    """Linear triangulation (Initializer.cpp:1075-1090 equivalent).
    Returns (N, 3) points in frame-1 coords."""
    Kinv = jnp.linalg.inv(K)
    x1 = jnp.concatenate([p1, jnp.ones((p1.shape[0], 1))], -1) @ Kinv.T
    x2 = jnp.concatenate([p2, jnp.ones((p2.shape[0], 1))], -1) @ Kinv.T
    # P1 = [I|0], P2 = [R|t] in normalized coords
    # rows of A: x1 x (P1 X) = 0 etc.
    def solve_one(a1, a2):
        A = jnp.stack(
            [
                a1[0] * jnp.array([0.0, 0, 1, 0]) - jnp.array([1.0, 0, 0, 0]),
                a1[1] * jnp.array([0.0, 0, 1, 0]) - jnp.array([0.0, 1, 0, 0]),
                a2[0] * jnp.concatenate([R[2], t[2:3]]) - jnp.concatenate([R[0], t[0:1]]),
                a2[1] * jnp.concatenate([R[2], t[2:3]]) - jnp.concatenate([R[1], t[1:2]]),
            ]
        )
        _, _, Vt = jnp.linalg.svd(A)
        X = Vt[-1]
        return X[:3] / jnp.where(jnp.abs(X[3]) < 1e-12, 1e-12, X[3])

    return jax.vmap(solve_one)(x1, x2)


def _cheirality(R, t, K, p1, p2, inliers):
    """Count points with positive depth in both views + low reproj error
    + sufficient parallax (CheckRT, Initializer.cpp:1138-1259)."""
    X = _triangulate(R, t, K, p1, p2)
    z1 = X[:, 2]
    X2 = X @ R.T + t
    z2 = X2[:, 2]
    # reprojection errors
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    z1s = jnp.where(jnp.abs(z1) < 1e-12, 1e-12, z1)
    z2s = jnp.where(jnp.abs(z2) < 1e-12, 1e-12, z2)
    r1 = jnp.stack([fx * X[:, 0] / z1s + cx, fy * X[:, 1] / z1s + cy], -1)
    r2 = jnp.stack([fx * X2[:, 0] / z2s + cx, fy * X2[:, 1] / z2s + cy], -1)
    e1 = jnp.sum((r1 - p1) ** 2, -1)
    e2 = jnp.sum((r2 - p2) ** 2, -1)
    # parallax
    C2 = -R.T @ t
    n1 = X
    n2 = X - C2
    cos_par = jnp.sum(n1 * n2, -1) / jnp.maximum(
        jnp.linalg.norm(n1, axis=-1) * jnp.linalg.norm(n2, axis=-1), 1e-12
    )
    good = (
        inliers
        & (z1 > 0) & (z2 > 0)
        & (e1 < 4.0 * SIGMA**2) & (e2 < 4.0 * SIGMA**2)
        & (cos_par < 0.99998)
    )
    return good, X


def two_view_reconstruct(
    p1: jnp.ndarray,       # (N, 2) pixel coords in frame 1
    p2: jnp.ndarray,       # (N, 2) matched coords in frame 2
    valid: jnp.ndarray,    # (N,) match validity
    K: jnp.ndarray,        # (3, 3)
    key: jnp.ndarray,
    n_iters: int = 200,
) -> TwoViewResult:
    """Full two-view bootstrap: batched H and F RANSAC, model selection,
    motion recovery, cheirality-checked triangulation."""
    N = p1.shape[0]
    p1n_all, T1 = _normalize(p1)
    p2n_all, T2 = _normalize(p2)

    # --- batched minimal samples
    # weight invalid matches out of the sampling by resampling valid idx
    probs = valid.astype(jnp.float32)
    probs = probs / jnp.maximum(probs.sum(), 1.0)
    samples = jax.random.choice(key, N, shape=(n_iters, 8), p=probs)

    s1 = p1n_all[samples]      # (I, 8, 2)
    s2 = p2n_all[samples]

    F_cands = jax.vmap(_eight_point_F)(s1, s2)      # (I, 3, 3) normalized
    H_cands = jax.vmap(_dlt_H)(s1, s2)

    # denormalize: F = T2^T Fn T1 ; H = T2^-1 Hn T1
    F_cands = jnp.einsum("ji,njk,kl->nil", T2, F_cands, T1)
    T2inv = jnp.linalg.inv(T2)
    H_cands = jnp.einsum("ij,njk,kl->nil", T2inv, H_cands, T1)

    score_F, inl_F = jax.vmap(lambda F: _score_F(F, p1, p2, valid))(F_cands)
    score_H, inl_H = jax.vmap(lambda Hm: _score_H(Hm, p1, p2, valid))(H_cands)

    bF = jnp.argmax(score_F)
    bH = jnp.argmax(score_H)
    F_best = F_cands[bF]
    H_best = H_cands[bH]
    inliers_F = inl_F[bF]
    inliers_H = inl_H[bH]

    # refit on the full inlier set (masked SVD) — reduces the noise
    # amplification of the minimal 8-point solution; one extra SVD
    def refit_F(inl):
        x1, y1 = p1n_all[:, 0], p1n_all[:, 1]
        x2, y2 = p2n_all[:, 0], p2n_all[:, 1]
        A = jnp.stack(
            [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1,
             jnp.ones_like(x1)], axis=-1,
        ) * inl.astype(jnp.float32)[:, None]
        _, _, Vt = jnp.linalg.svd(A, full_matrices=False)
        Fm = Vt[-1].reshape(3, 3)
        U_, S_, Vt2 = jnp.linalg.svd(Fm)
        return T2.T @ (U_ @ jnp.diag(S_.at[2].set(0.0)) @ Vt2) @ T1

    def refit_H(inl):
        x1, y1 = p1n_all[:, 0], p1n_all[:, 1]
        x2, y2 = p2n_all[:, 0], p2n_all[:, 1]
        z = jnp.zeros_like(x1)
        o = jnp.ones_like(x1)
        m = inl.astype(jnp.float32)[:, None]
        r1 = jnp.stack([z, z, z, -x1, -y1, -o, y2 * x1, y2 * y1, y2], -1) * m
        r2 = jnp.stack([x1, y1, o, z, z, z, -x2 * x1, -x2 * y1, -x2], -1) * m
        A = jnp.concatenate([r1, r2], axis=0)
        _, _, Vt = jnp.linalg.svd(A, full_matrices=False)
        return T2inv @ Vt[-1].reshape(3, 3) @ T1

    F_best = refit_F(inliers_F)
    H_best = refit_H(inliers_H)
    SF, inliers_F = _score_F(F_best, p1, p2, valid)
    SH, inliers_H = _score_H(H_best, p1, p2, valid)

    RH = SH / jnp.maximum(SH + SF, 1e-12)
    use_H = RH > 0.40

    # --- motion hypotheses: 4 from E, 8 from H (Faugeras)
    E = K.T @ F_best @ K
    U, S, Vt = jnp.linalg.svd(E)
    Wm = jnp.array([[0.0, -1, 0], [1, 0, 0], [0, 0, 1]])
    R1 = U @ Wm @ Vt
    R2 = U @ Wm.T @ Vt
    R1 = R1 * jnp.sign(jnp.linalg.det(R1))
    R2 = R2 * jnp.sign(jnp.linalg.det(R2))
    tE = U[:, 2]
    tE = tE / jnp.maximum(jnp.linalg.norm(tE), 1e-12)
    F_motions_R = jnp.stack([R1, R1, R2, R2])
    F_motions_t = jnp.stack([tE, -tE, tE, -tE])

    # Faugeras decomposition of calibrated H (Initializer.cpp:916-1073;
    # standard closed form, Faugeras & Lustman 1988)
    A = jnp.linalg.inv(K) @ H_best @ K
    Ua, Sa, Vta = jnp.linalg.svd(A)
    d1, d2, d3 = Sa[0], Sa[1], Sa[2]
    s_det = jnp.linalg.det(Ua) * jnp.linalg.det(Vta)
    # x1 = +-sqrt((d1^2-d2^2)/(d1^2-d3^2)), x3 = +-sqrt((d2^2-d3^2)/(d1^2-d3^2))
    denom = jnp.maximum(d1 * d1 - d3 * d3, 1e-12)
    x1a = jnp.sqrt(jnp.maximum(d1 * d1 - d2 * d2, 0.0) / denom)
    x3a = jnp.sqrt(jnp.maximum(d2 * d2 - d3 * d3, 0.0) / denom)
    eps = jnp.array([[1.0, 1], [1, -1], [-1, 1], [-1, -1]])

    def h_motion(e1, e3, dprime_positive):
        x1_, x3_ = e1 * x1a, e3 * x3a
        if_pos = dprime_positive
        st_den = jnp.maximum((d1 + d3) * d2, 1e-12)
        sin_t = jnp.where(
            if_pos,
            jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)) / st_den,
            jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0))
            / jnp.maximum((d1 - d3) * d2, 1e-12),
        )
        cos_t = jnp.where(
            if_pos, (d2 * d2 + d1 * d3) / st_den,
            (d1 * d3 - d2 * d2) / jnp.maximum((d1 - d3) * d2, 1e-12),
        )
        st = e1 * e3 * sin_t
        Rp = jnp.where(
            if_pos,
            jnp.array([[1.0, 0, 0], [0, 1, 0], [0, 0, 1]])
            .at[0, 0].set(cos_t).at[0, 2].set(-st)
            .at[2, 0].set(st).at[2, 2].set(cos_t),
            jnp.array([[1.0, 0, 0], [0, -1, 0], [0, 0, -1]])
            .at[0, 0].set(cos_t).at[0, 2].set(st)
            .at[2, 0].set(st).at[2, 2].set(-cos_t),
        )
        tp = jnp.where(
            if_pos,
            (d1 - d3) * jnp.array([x1_, 0.0, -x3_]),
            (d1 + d3) * jnp.array([x1_, 0.0, x3_]),
        )
        R = s_det * Ua @ Rp @ Vta
        t = Ua @ tp
        t = t / jnp.maximum(jnp.linalg.norm(t), 1e-12)
        return R, t

    H_Rs, H_ts = [], []
    for i in range(4):
        for pos in (True, False):
            R_, t_ = h_motion(eps[i, 0], eps[i, 1], jnp.bool_(pos))
            H_Rs.append(R_)
            H_ts.append(t_)
    H_motions_R = jnp.stack(H_Rs)
    H_motions_t = jnp.stack(H_ts)

    motions_R = jnp.where(use_H, H_motions_R[:4], F_motions_R)
    motions_R2 = jnp.where(use_H, H_motions_R[4:], F_motions_R)
    motions_t = jnp.where(use_H, H_motions_t[:4], F_motions_t)
    motions_t2 = jnp.where(use_H, H_motions_t[4:], F_motions_t)
    all_R = jnp.concatenate([motions_R, motions_R2])
    all_t = jnp.concatenate([motions_t, motions_t2])
    inliers = jnp.where(use_H, inliers_H, inliers_F)

    goods, Xs = jax.vmap(lambda R, t: _cheirality(R, t, K, p1, p2, inliers))(
        all_R, all_t
    )
    counts = jnp.sum(goods, axis=-1)
    # the F path has only 4 distinct motions (slots 4-7 duplicate 0-3);
    # exclude the duplicates so the best/second-best ratio test is valid
    dup = (jnp.arange(8) >= 4) & ~use_H
    counts = jnp.where(dup, -1, counts)
    best = jnp.argmax(counts)
    n_best = counts[best]
    n_second = jnp.sort(counts)[-2]

    ok = (
        (n_best > 0.8 * jnp.maximum(jnp.sum(inliers), 1))
        & (n_second < 0.75 * n_best)
        & (n_best >= 30)
    )

    return TwoViewResult(
        ok=ok,
        R=all_R[best],
        t=all_t[best],
        is_H=use_H,
        inliers=inliers,
        points3d=Xs[best],
        tri_ok=goods[best],
    )
