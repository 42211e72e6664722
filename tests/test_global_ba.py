"""Keyframe-block-sharded global BA (parallel/global_ba.py) — the
long-sequence distributed tier of north-star config #5. The reference has
no counterpart (it marginalizes history away, Frame.cpp:194-253); oracles
here are ground-truth synthetic geometry and host<->sharded parity."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hslam_tpu.utils import lie
from hslam_tpu.parallel.global_ba import (
    build_problem_from_trajectory, global_ba, partition_problem,
    sharded_global_ba)

W_, H_ = 128, 96
FX = FY = 80.0
CX, CY = W_ / 2 - 0.5, H_ / 2 - 0.5
K = np.array([[FX, 0, CX], [0, FY, CY], [0, 0, 1.0]])
PLANE_Z = 2.0


def _traj(N, step=0.06):
    """Ground-truth w2c poses along a sideways arc over the plane."""
    Rs, ts = [], []
    for i in range(N):
        a = step * i
        xi = jnp.array([0.9 * np.sin(a), 0.5 * (1 - np.cos(a)),
                        0.15 * np.sin(0.7 * a),
                        0.03 * np.sin(0.9 * a), 0.04 * np.sin(0.6 * a),
                        0.02 * np.sin(0.5 * a)])
        R, t = lie.se3_exp(xi)    # cam-to-world of a moving camera
        T = np.eye(4)
        T[:3, :3], T[:3, 3] = np.asarray(R), np.asarray(t)
        Tw2c = np.linalg.inv(T)
        Rs.append(Tw2c[:3, :3])
        ts.append(Tw2c[:3, 3])
    return Rs, ts


def _plane_depth(Rw2c, tw2c):
    C = -Rw2c.T @ tw2c                     # camera center (world)

    def depth_fn(u, v, i):
        d = np.array([(u - CX) / FX, (v - CY) / FY, 1.0])
        rw = Rw2c.T @ d
        return (PLANE_Z - C[2]) / max(rw[2], 1e-6)

    return depth_fn


def _make_problem(N, ppk=6, radius=3, pose_noise=0.02, rho_noise=0.05,
                  seed=0):
    rng = np.random.default_rng(seed)
    Rs, ts = _traj(N)

    def depth_fn(u, v, i):
        return _plane_depth(Rs[i], ts[i])(u, v, i)

    prob = build_problem_from_trajectory(
        Rs, ts, K, points_per_kf=ppk, obs_radius=radius,
        width=W_, height=H_, rng=rng, depth_fn=depth_fn, pix_noise=0.1)

    # perturb poses (except 0, the gauge anchor) and inverse depths
    R_n, t_n = [np.asarray(prob.R[0])], [np.asarray(prob.t[0])]
    for i in range(1, N):
        dR, dt = lie.se3_exp(jnp.asarray(
            rng.normal(0, pose_noise, 6) * np.array([1, 1, 1, .5, .5, .5])))
        R_n.append(np.asarray(dR) @ np.asarray(prob.R[i]))
        t_n.append(np.asarray(dR) @ np.asarray(prob.t[i]) + np.asarray(dt))
    rho_n = np.asarray(prob.rho) * np.exp(
        rng.normal(0, rho_noise, prob.rho.shape[0]))
    noisy = prob._replace(R=jnp.asarray(np.stack(R_n), jnp.float32),
                          t=jnp.asarray(np.stack(t_n), jnp.float32),
                          rho=jnp.asarray(rho_n, jnp.float32))
    return prob, noisy


def _pose_err(p, p_gt):
    """Sim3-aligned ATE RMSE of camera centers — the monocular gauge
    (global scale/rotation/translation unobservable; pinning pose 0 fixes
    6 of the 7 gauge dofs but NOT scale)."""
    C = -np.einsum("nji,nj->ni", np.asarray(p.R, np.float64),
                   np.asarray(p.t, np.float64))
    Cg = -np.einsum("nji,nj->ni", np.asarray(p_gt.R, np.float64),
                    np.asarray(p_gt.t, np.float64))
    mu_e, mu_g = C.mean(0), Cg.mean(0)
    e, g = C - mu_e, Cg - mu_g
    cov = g.T @ e / len(e)
    U, S, Vt = np.linalg.svd(cov)
    d = np.sign(np.linalg.det(U) * np.linalg.det(Vt))
    D = np.diag([1.0, 1.0, d])
    R = U @ D @ Vt
    var_e = (e ** 2).sum() / len(e)
    s = np.trace(np.diag(S) @ D) / max(var_e, 1e-12)
    aligned = s * (R @ e.T).T + mu_g
    return float(np.sqrt(((aligned - Cg) ** 2).sum(1).mean()))


class TestGlobalBA:
    def test_converges_to_ground_truth(self):
        gt, noisy = _make_problem(N=12, ppk=8, radius=4, seed=1)
        err0 = _pose_err(noisy, gt)
        out, chis = global_ba(noisy, K, n_iters=6, cg_iters=80)
        err1 = _pose_err(out, gt)
        chis = np.asarray(chis)
        assert np.all(np.isfinite(chis))
        assert chis[-1] < 0.05 * chis[0], f"chi2 {chis[0]} -> {chis[-1]}"
        assert err1 < 0.25 * err0, f"pose err {err0} -> {err1}"

    def test_huber_rejects_outlier_observations(self):
        gt, noisy = _make_problem(N=10, seed=2)
        # corrupt 10% of observations grossly
        rng = np.random.default_rng(3)
        uv = np.asarray(noisy.obs_uv).copy()
        n_bad = max(1, len(uv) // 10)
        bad = rng.choice(len(uv), n_bad, replace=False)
        uv[bad] += rng.uniform(25, 60, (n_bad, 2))
        noisy_bad = noisy._replace(obs_uv=jnp.asarray(uv, jnp.float32))
        err0 = _pose_err(noisy_bad, gt)
        out, _ = global_ba(noisy_bad, K, n_iters=6, cg_iters=80,
                           huber_px=2.0)
        err1 = _pose_err(out, gt)
        assert err1 < 0.4 * err0, f"pose err {err0} -> {err1} with outliers"

    def test_sharded_matches_host(self):
        gt, noisy = _make_problem(N=16, ppk=5, seed=4)
        n_dev = min(8, jax.device_count())
        mesh = jax.sharding.Mesh(np.array(jax.devices()[:n_dev]),
                                 ("kfblocks",))
        part = partition_problem(noisy, n_dev)
        # host reference runs the SAME partitioned layout
        out_h, chis_h = global_ba(part, K, n_iters=4, cg_iters=60)
        out_s, chis_s = sharded_global_ba(mesh, part, K, n_iters=4,
                                          cg_iters=60)
        np.testing.assert_allclose(np.asarray(chis_s), np.asarray(chis_h),
                                   rtol=2e-3)
        np.testing.assert_allclose(np.asarray(out_s.t), np.asarray(out_h.t),
                                   atol=2e-3)
        np.testing.assert_allclose(np.asarray(out_s.R), np.asarray(out_h.R),
                                   atol=2e-3)
        np.testing.assert_allclose(np.asarray(out_s.rho),
                                   np.asarray(out_h.rho), atol=5e-3)

    def test_partition_preserves_problem(self):
        """partition_problem must keep every real observation exactly once,
        keep landmark/observation pairing, and co-locate each landmark's
        observations in one block."""
        gt, noisy = _make_problem(N=9, ppk=4, seed=5)
        n = 8
        part = partition_problem(noisy, n)
        P_ = part.host.shape[0]
        O_ = part.obs_p.shape[0]
        assert P_ % n == 0 and O_ % n == 0
        m, ob = P_ // n, O_ // n
        obs_p = np.asarray(part.obs_p)
        ow = np.asarray(part.obs_w)
        # real observation count preserved
        assert int((ow > 0).sum()) == int(
            (np.asarray(noisy.obs_w) > 0).sum())
        # block locality: obs in block s reference landmarks in block s
        for s in range(n):
            blk = obs_p[s * ob:(s + 1) * ob]
            assert np.all((blk >= s * m) & (blk < (s + 1) * m))
        # residuals at the same state agree between layouts (sum of
        # weighted squared reprojection errors)
        from hslam_tpu.parallel.global_ba import _linearize, _huber_w

        def chi(p):
            r, _, _, _ = _linearize(p, jnp.asarray(K, jnp.float32))
            valid = (p.obs_w > 0) & p.p_valid[p.obs_p]
            w = jnp.where(valid, p.obs_w, 0.0)
            return float(jnp.sum(w * jnp.sum(r * r, -1)))

        assert abs(chi(part) - chi(noisy)) < 1e-2 * max(chi(noisy), 1.0)


@pytest.mark.slow
def test_256kf_sharded_long_trajectory():
    """North-star config #5 scale check: >=256 keyframes, landmarks and
    observations keyframe-block-sharded over the 8-device mesh; the
    sharded relaxation must recover the trajectory at least as well as
    the host path (ATE no worse than 1.05x host)."""
    gt, noisy = _make_problem(N=256, ppk=4, radius=3, pose_noise=0.015,
                              seed=6)
    n_dev = min(8, jax.device_count())
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:n_dev]), ("kfblocks",))
    part = partition_problem(noisy, n_dev)
    err0 = _pose_err(noisy, gt)

    out_s, chis_s = sharded_global_ba(mesh, part, K, n_iters=5,
                                      cg_iters=150)
    err_s = _pose_err(out_s, gt)
    assert np.all(np.isfinite(np.asarray(chis_s)))
    assert err_s < 0.3 * err0, f"sharded: pose err {err0} -> {err_s}"

    out_h, _ = global_ba(part, K, n_iters=5, cg_iters=150)
    err_h = _pose_err(out_h, gt)
    assert err_s <= 1.05 * err_h + 1e-4, (
        f"sharded ATE {err_s} worse than host {err_h}")
