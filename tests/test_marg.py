"""Marginalization correctness: frame Schur elimination on HM/bM and point
marginalization accumulation, verified against dense f64 elimination."""
import jax
import jax.numpy as jnp
import numpy as np

from hslam_tpu.config import CPARS, Config
from hslam_tpu.models import window as W
from hslam_tpu.models.optimizer import marginalize_frame, marginalize_points
from test_ba import make_synthetic_window, _lin_and_sys, CFG


class TestFrameMarg:
    def test_schur_elimination_matches_dense(self):
        wnd, calib, cfg = make_synthetic_window()
        F = cfg.max_frames
        D = CPARS + 8 * F

        # synthetic marginalization prior: random PSD + diagonal
        rng = np.random.RandomState(0)
        A = rng.randn(D, 2 * D)
        HM = (A @ A.T / (2 * D) + np.eye(D)).astype(np.float32) * 100.0
        bM = rng.randn(D).astype(np.float32) * 10.0
        wnd = wnd._replace(HM=jnp.asarray(HM), bM=jnp.asarray(bM))

        slot = 2
        out = marginalize_frame(wnd, jnp.int32(slot), cfg)

        # dense reference (f64): add priors, Schur-eliminate the 8 dims
        Hd = HM.astype(np.float64)
        bd = bM.astype(np.float64)
        prior = np.asarray(wnd.frames.prior[slot], np.float64)
        delta_prior = np.asarray(wnd.frames.state[slot], np.float64)
        k = CPARS + 8 * slot
        idx = np.arange(k, k + 8)
        Hd[idx, idx] += prior
        bd[idx] += prior * delta_prior
        keep = np.setdiff1d(np.arange(D), idx)
        Hkk = Hd[np.ix_(idx, idx)]
        Hak = Hd[np.ix_(keep, idx)]
        Hinv = np.linalg.inv(Hkk)
        H_new = Hd[np.ix_(keep, keep)] - Hak @ Hinv @ Hak.T
        b_new = bd[keep] - Hak @ (Hinv @ bd[idx])

        got_H = np.asarray(out.HM, np.float64)[np.ix_(keep, keep)]
        got_b = np.asarray(out.bM, np.float64)[keep]
        scale = np.abs(H_new).max()
        np.testing.assert_allclose(got_H, H_new, atol=2e-3 * scale)
        np.testing.assert_allclose(got_b, b_new,
                                   atol=2e-3 * max(np.abs(b_new).max(), 1.0))
        # eliminated dims zeroed, slot freed
        assert not bool(out.frames.valid[slot])
        assert float(jnp.abs(out.HM[idx]).max()) == 0.0
        assert float(jnp.abs(out.bM[idx]).max()) == 0.0


class TestPointMarg:
    def test_point_marg_adds_schur_reduced_information(self):
        wnd, calib, cfg = make_synthetic_window()
        lin, active, AH, AT, sys = _lin_and_sys(wnd, calib, cfg)
        P = cfg.max_points

        to_marg = jnp.zeros(P, bool).at[jnp.arange(0, P, 7)].set(True)
        to_drop = jnp.zeros(P, bool)
        out = marginalize_points(wnd, calib, to_marg, to_drop, cfg)

        # dense reference from the same factored products, with residuals
        # extrapolated to the zero-delta point (fixLinearizationF semantics)
        from hslam_tpu.config import CALIB_SCALE
        from hslam_tpu.ops import ba
        import jax.numpy as jnp2

        f_delta = (wnd.frames.state - wnd.frames.state_zero) * wnd.frames.valid[:, None]
        dp = (jnp.einsum("hfij,hi->hfj", AH, f_delta)
              + jnp.einsum("hfij,fi->hfj", AT, f_delta))
        dp_pf = dp[wnd.points.host]
        c_delta = (calib.value - calib.value_zero) / jnp.asarray(CALIB_SCALE)
        jp_dx = (jnp.einsum("pfj,pfj->pf", lin.Jpdxi[:, :, 0], dp_pf[..., :6])
                 + lin.Jpdc[:, :, 0] @ c_delta)
        jp_dy = (jnp.einsum("pfj,pfj->pf", lin.Jpdxi[:, :, 1], dp_pf[..., :6])
                 + lin.Jpdc[:, :, 1] @ c_delta)
        res0 = (lin.resF
                - lin.JIdx[..., 0] * jp_dx[..., None]
                - lin.JIdx[..., 1] * jp_dy[..., None]
                - lin.JabF[..., 0] * dp_pf[..., None, 6]
                - lin.JabF[..., 1] * dp_pf[..., None, 7])
        lin = lin._replace(resF=res0)

        mask = active & to_marg[:, None]
        sys_m = ba.accumulate(lin, mask, wnd.points.host, AH, AT, cfg.max_frames)
        marg_prior = wnd.points.prior * cfg.idepth_fix_prior_marg_fac
        pt = to_marg & (jnp.sum(mask, 1) > 0)
        # same well-constrained gate as the kernel
        pt = pt & ((sys_m.Hdd + marg_prior) > cfg.min_idepth_h_marg)
        H_sc, b_sc, _ = ba.schur_complement(sys_m, marg_prior, pt)
        mask = mask & pt[:, None]
        sys_m = ba.accumulate(lin, mask, wnd.points.host, AH, AT, cfg.max_frames)

        expected_H = cfg.marg_weight_fac * (np.asarray(sys_m.H) - np.asarray(H_sc))
        expected_b = cfg.marg_weight_fac * (np.asarray(sys_m.b) - np.asarray(b_sc))
        np.testing.assert_allclose(np.asarray(out.HM), expected_H,
                                   atol=1e-3 * max(np.abs(expected_H).max(), 1.0))
        np.testing.assert_allclose(np.asarray(out.bM), expected_b,
                                   atol=1e-3 * max(np.abs(expected_b).max(), 1.0))
        # marginalized points are removed
        st = np.asarray(out.points.status)
        assert (st[np.asarray(to_marg)] == W.PT_EMPTY).all()

    def test_marg_prior_reduces_drift_of_remaining(self):
        """On a *consistent* near-converged scene (the realistic setting —
        marginalization always follows an optimize() call), folding half
        the points into HM/bM and re-optimizing must stay stable."""
        from hslam_tpu.models.optimizer import ba_optimize
        from test_ba import make_rendered_window

        wnd, calib, cfg, _ = make_rendered_window()
        # settle near the optimum first, as the live pipeline does
        res0 = ba_optimize(wnd, calib, cfg, 4)
        wnd, calib = res0.window, res0.calib

        P = cfg.max_points
        to_marg = jnp.zeros(P, bool).at[jnp.arange(0, P, 2)].set(True)
        out = marginalize_points(wnd, calib, to_marg, jnp.zeros(P, bool), cfg)
        res = ba_optimize(out, calib, cfg, 4)
        assert np.isfinite(float(res.rmse))
        st = np.asarray(res.window.frames.state)
        assert np.abs(st).max() < 0.2, "states diverged after marginalization"
