"""Correctness tests for the windowed BA core.

Strategy (SURVEY.md §4): block-by-block parity against independent numpy
re-derivations in float64 —
  * compute_adjoints vs. finite differences of the relative-pose tangent,
  * accumulate() vs. a dense per-residual Jacobian assembly,
  * the Schur complement vs. eliminating idepths from the dense KKT system,
plus a loose numeric-gradient smoke test (the reference's center-pixel
Jacobian approximation, OptimizationClasses.cpp:75-121, makes the exact
energy gradient differ by O(10-50%) on near-cancelling dims) and an
end-to-end convergence test on a rendered scene.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hslam_tpu.config import CALIB_SCALE, CPARS, FRAME_STATE_SCALE, Config
from hslam_tpu.models import window as W
from hslam_tpu.models.calib import make_calib
from hslam_tpu.ops import ba
from hslam_tpu.ops.pyramid import image_gradients
from hslam_tpu.utils import lie

H_IMG, W_IMG = 64, 64
CFG = Config(
    max_frames=4,
    max_points=64,
    outlier_th_sum_component=1e12,
)


def smooth_image(key, h, w):
    ky, kx = jax.random.uniform(key, (2, 4), minval=0.5, maxval=2.5)
    phases = jax.random.uniform(jax.random.fold_in(key, 1), (4,)) * 6.28
    amps = jnp.array([40.0, 25.0, 15.0, 10.0])
    ys, xs = jnp.mgrid[0:h, 0:w]
    img = 120.0 + sum(
        amps[i] * jnp.sin(2 * jnp.pi * (kx[i] * xs / w + ky[i] * ys / h) + phases[i])
        for i in range(4)
    )
    return img.astype(jnp.float32)


def make_synthetic_window(key=jax.random.PRNGKey(0)):
    cfg = CFG
    calib = make_calib(60.0, 60.0, W_IMG / 2 - 0.5, H_IMG / 2 - 0.5, W_IMG, H_IMG)
    wnd = W.empty_window(cfg, H_IMG, W_IMG)
    F = cfg.max_frames

    keys = jax.random.split(key, 8)
    xi = jax.random.normal(keys[0], (F, 6)) * jnp.array([0.05] * 3 + [0.01] * 3)
    xi = xi.at[0].set(0.0)
    R0, t0 = lie.se3_exp(xi)

    imgs = []
    for f in range(F):
        I = smooth_image(jax.random.fold_in(keys[1], f), H_IMG, W_IMG)
        dx, dy = image_gradients(I)
        imgs.append(jnp.stack([I, dx, dy], axis=-1))
    images = jnp.stack(imgs)

    frames = wnd.frames._replace(
        valid=jnp.ones(F, bool),
        evalpt_R=R0,
        evalpt_t=t0,
        kf_id=jnp.arange(F, dtype=jnp.int32),
        images=images,
        exposure=jnp.array([1.0, 1.1, 0.9, 1.05]),
        prior=jnp.stack(
            [jnp.asarray(W.first_frame_prior(cfg))]
            + [jnp.asarray(W.later_frame_prior(cfg))] * (F - 1)
        ),
    )
    # nonzero states so current != FEJ paths are exercised
    st = jax.random.normal(keys[2], (F, 8)) * 0.002
    st = st.at[0].set(0.0)
    frames = frames._replace(state=st.astype(jnp.float32))

    P = cfg.max_points
    n_side = int(np.sqrt(P))
    us = jnp.linspace(10, W_IMG - 10, n_side)
    vs = jnp.linspace(10, H_IMG - 10, n_side)
    uu, vv = jnp.meshgrid(us, vs)
    u = uu.reshape(-1)[:P]
    v = vv.reshape(-1)[:P]
    idep = 0.5 + 0.2 * jax.random.uniform(keys[3], (P,))

    from hslam_tpu.config import PATTERN
    from hslam_tpu.utils.interp import bilinear

    pat = jnp.asarray(PATTERN, jnp.float32)
    up = u[:, None] + pat[None, :, 0]
    vp = v[:, None] + pat[None, :, 1]
    color = bilinear(images[0, :, :, 0], up, vp)

    points = wnd.points._replace(
        status=jnp.ones(P, jnp.int32),
        host=jnp.zeros(P, jnp.int32),
        u=u.astype(jnp.float32),
        v=v.astype(jnp.float32),
        idepth=idep.astype(jnp.float32),
        idepth_zero=idep.astype(jnp.float32),
        color=color,
        weight=jnp.ones((P, 8), jnp.float32),
    )
    wnd = W.Window(frames=frames, points=points, HM=wnd.HM, bM=wnd.bM)
    return wnd, calib, cfg


def make_rendered_window(pert=None, key=jax.random.PRNGKey(5)):
    """Photometrically *consistent* window: every frame is a rendered view
    of the same textured plane (depth 2), points on the plane. Near its
    optimum when pert is None/zero — the realistic setting for testing
    optimization and marginalization."""
    cfg = CFG
    fx, fy, cx, cy = 60.0, 60.0, W_IMG / 2 - 0.5, H_IMG / 2 - 0.5
    calib = make_calib(fx, fy, cx, cy, W_IMG, H_IMG)
    wnd0, _, _ = make_synthetic_window()
    F = cfg.max_frames

    xi = jax.random.normal(key, (F, 6)) * jnp.array(
        [0.08, 0.08, 0.04, 0.01, 0.01, 0.01]
    )
    xi = xi.at[0].set(0.0)
    R_gt, t_gt = lie.se3_exp(xi)
    depth = 2.0
    I0 = smooth_image(jax.random.PRNGKey(7), H_IMG, W_IMG)

    from hslam_tpu.utils.interp import bilinear

    def render(Rf, tf):
        ys, xs = jnp.mgrid[0:H_IMG, 0:W_IMG]
        px = (xs - cx) / fx
        py = (ys - cy) / fy
        Rinv, tinv = lie.se3_inverse(Rf, tf)
        dz = Rinv[2, 0] * px + Rinv[2, 1] * py + Rinv[2, 2]
        s = (depth - tinv[2]) / dz
        X = s * (Rinv[0, 0] * px + Rinv[0, 1] * py + Rinv[0, 2]) + tinv[0]
        Y = s * (Rinv[1, 0] * px + Rinv[1, 1] * py + Rinv[1, 2]) + tinv[1]
        u0 = fx * X / depth + cx
        v0 = fy * Y / depth + cy
        I = bilinear(I0, u0, v0)
        dx, dy = image_gradients(I)
        return jnp.stack([I, dx, dy], axis=-1)

    images = jnp.stack([render(R_gt[f], t_gt[f]) for f in range(F)])
    frames = wnd0.frames._replace(
        evalpt_R=R_gt, evalpt_t=t_gt, images=images,
        state=jnp.zeros((F, 8), jnp.float32),
        exposure=jnp.ones(F),
    )
    pts = wnd0.points._replace(
        idepth=jnp.full(cfg.max_points, 1.0 / depth),
        idepth_zero=jnp.full(cfg.max_points, 1.0 / depth),
    )
    from hslam_tpu.config import PATTERN

    pat = jnp.asarray(PATTERN, jnp.float32)
    up = pts.u[:, None] + pat[None, :, 0]
    vp = pts.v[:, None] + pat[None, :, 1]
    pts = pts._replace(color=bilinear(images[0, :, :, 0], up, vp))

    if pert is not None:
        frames = frames._replace(state=pert.astype(jnp.float32))
    wnd = W.Window(frames=frames, points=pts, HM=wnd0.HM, bM=wnd0.bM)
    return wnd, calib, cfg, (R_gt, t_gt)


def _lin_and_sys(wnd, calib, cfg):
    frames, points = wnd.frames, wnd.points
    F = cfg.max_frames
    lin = ba.linearize(frames, points, calib, cfg)
    grid = (
        (points.status == W.PT_ACTIVE)[:, None]
        & frames.valid[None, :]
        & (points.host[:, None] != jnp.arange(F)[None, :])
    )
    active = grid & (lin.new_state == W.RES_IN)
    AH, AT = ba.compute_adjoints(frames)
    sys = ba.accumulate(lin, active, points.host, AH, AT, F)
    return lin, active, AH, AT, sys


class TestAdjoints:
    def test_adjoints_match_finite_differences(self):
        """AH[h,t]^T columns = d(rel 8-dof tangent)/d(host state);
        AT likewise for the target. Exercises the scale rows too."""
        wnd, calib, cfg = make_synthetic_window()
        frames = wnd.frames
        AH, AT = ba.compute_adjoints(frames)
        AH, AT = np.asarray(AH, np.float64), np.asarray(AT, np.float64)
        S = np.asarray(FRAME_STATE_SCALE, np.float64)

        def rel_tangent(state):
            """8-dof relative quantities for pair (h, t) as a function of
            the full (F, 8) state matrix: [log(Trel Trel0^-1), a_rel-like]"""
            st = jnp.asarray(state, jnp.float32)
            fr = frames._replace(state=st)
            R, t = W.frame_poses(fr)
            aff = W.frame_affine(fr)
            return R, t, aff

        h, t = 1, 2
        R_all, t_all, aff_all = rel_tangent(np.asarray(frames.state))
        Ri, ti = lie.se3_inverse(R_all[h], t_all[h])
        Rrel0, trel0 = lie.se3_mul(R_all[t], t_all[t], Ri, ti)

        exp_ = np.where(np.asarray(frames.exposure) == 0, 1.0,
                        np.asarray(frames.exposure))

        def rel8(state):
            R_a, t_a, aff = rel_tangent(state)
            Ri_, ti_ = lie.se3_inverse(R_a[h], t_a[h])
            Rr, tr = lie.se3_mul(R_a[t], t_a[t], Ri_, ti_)
            dR, dt = lie.se3_mul(Rr, tr, *lie.se3_inverse(Rrel0, trel0))
            xi = np.asarray(lie.se3_log(dR, dt), np.float64)
            # the affine part of the rel tangent, in the linearize
            # parametrization: d a_rel / a_rel0 -> d(dp6) etc. We compare
            # against how linearize consumes dp: residual changes by
            # JabF0 * dp6 + JabF1 * dp7 where the effective (a_rel, b_rel)
            # perturbations are dp6 * (color - b0) ... — instead compare the
            # pose block only here; affine entries are checked analytically.
            return xi

        eps = 1e-4
        base = np.asarray(frames.state, np.float64)
        for slot, Amat in ((h, AH[h, t]), (t, AT[h, t])):
            for dim in range(6):
                sp = base.copy()
                sp[slot, dim] += eps
                sm = base.copy()
                sm[slot, dim] -= eps
                num = (rel8(sp) - rel8(sm)) / (2 * eps)
                # dp = A^T delta  =>  d dp_j / d delta_dim = A[dim, j]
                ana = Amat[dim, :6]
                np.testing.assert_allclose(
                    ana, num, atol=2e-3, rtol=2e-3,
                    err_msg=f"slot {slot} dim {dim}",
                )

        # affine entries analytically (EnergyFunctional.cpp:45-58):
        aff0 = np.asarray(frames.state_zero) * np.asarray(FRAME_STATE_SCALE)
        a_rel = np.exp(aff0[t, 6] - aff0[h, 6]) * exp_[t] / exp_[h]
        np.testing.assert_allclose(AH[h, t][6, 6], a_rel * S[6], rtol=1e-5)
        np.testing.assert_allclose(AH[h, t][7, 7], a_rel * S[7], rtol=1e-5)
        np.testing.assert_allclose(AT[h, t][6, 6], -a_rel * S[6], rtol=1e-5)
        np.testing.assert_allclose(AT[h, t][7, 7], -S[7], rtol=1e-5)


class TestAccumulate:
    def test_dense_assembly_parity(self):
        """accumulate() == dense numpy f64 assembly of per-residual
        absolute Jacobians built from the same factored blocks."""
        wnd, calib, cfg = make_synthetic_window()
        lin, active, AH, AT, sys = _lin_and_sys(wnd, calib, cfg)
        F = cfg.max_frames
        P = cfg.max_points
        D = CPARS + 8 * F

        AHn = np.asarray(AH, np.float64)
        ATn = np.asarray(AT, np.float64)
        host = np.asarray(wnd.points.host)
        act = np.asarray(active)
        Jpdc = np.asarray(lin.Jpdc, np.float64)
        Jpdxi = np.asarray(lin.Jpdxi, np.float64)
        Jpdd = np.asarray(lin.Jpdd, np.float64)
        JIdx = np.asarray(lin.JIdx, np.float64)
        JabF = np.asarray(lin.JabF, np.float64)
        resF = np.asarray(lin.resF, np.float64)

        H = np.zeros((D, D))
        b = np.zeros(D)
        Hdd = np.zeros(P)
        bd = np.zeros(P)
        g = np.zeros((P, D))

        for p in range(P):
            hslot = host[p]
            for f in range(F):
                if not act[p, f]:
                    continue
                # 8 rows of the absolute jacobian + idepth column
                B_rel = np.zeros((4, 8))
                B_rel[0, :6] = Jpdxi[p, f, 0]
                B_rel[1, :6] = Jpdxi[p, f, 1]
                B_rel[2, 6] = 1.0
                B_rel[3, 7] = 1.0
                C = np.concatenate([JIdx[p, f], JabF[p, f]], axis=1)  # (8,4)
                J_rel = C @ B_rel                                     # (8,8)
                J_abs = np.zeros((8, D))
                J_abs[:, :CPARS] = C[:, :2] @ Jpdc[p, f]
                J_abs[:, CPARS + 8 * hslot: CPARS + 8 * hslot + 8] += (
                    J_rel @ AHn[hslot, f].T
                )
                J_abs[:, CPARS + 8 * f: CPARS + 8 * f + 8] += (
                    J_rel @ ATn[hslot, f].T
                )
                J_d = C[:, :2] @ Jpdd[p, f]                           # (8,)
                r = resF[p, f]
                H += J_abs.T @ J_abs
                b += J_abs.T @ r
                Hdd[p] += J_d @ J_d
                bd[p] += J_d @ r
                g[p] += J_abs.T @ J_d

        scale = max(np.abs(H).max(), 1.0)
        np.testing.assert_allclose(np.asarray(sys.H), H, atol=2e-4 * scale)
        np.testing.assert_allclose(np.asarray(sys.b), b,
                                   atol=2e-4 * max(np.abs(b).max(), 1.0))
        np.testing.assert_allclose(np.asarray(sys.Hdd), Hdd,
                                   atol=1e-4 * max(np.abs(Hdd).max(), 1.0))
        np.testing.assert_allclose(np.asarray(sys.bd), bd,
                                   atol=1e-4 * max(np.abs(bd).max(), 1.0))
        np.testing.assert_allclose(np.asarray(sys.g), g,
                                   atol=1e-4 * max(np.abs(g).max(), 1.0))


class TestIndirectFactors:
    def test_indirect_dense_assembly_parity(self):
        """The hybrid reprojection factors enter H, b, Hdd, bd, g exactly as
        2-row dense residuals on the pixel Jacobians (f64 numpy assembly)."""
        wnd, calib, cfg = make_synthetic_window()
        frames, points = wnd.frames, wnd.points
        F, P = cfg.max_frames, cfg.max_points
        D = CPARS + 8 * F

        # synthesize matched-keypoint observations near the true projections
        lin0 = ba.linearize(frames, points, calib, cfg)
        key = jax.random.PRNGKey(11)
        noise = jax.random.normal(key, (P, F, 2)) * 0.8
        ind_u = lin0.center_u + noise[..., 0]
        ind_v = lin0.center_v + noise[..., 1]
        ind_valid = jax.random.uniform(jax.random.fold_in(key, 1), (P, F)) < 0.6
        points = points._replace(
            ind_u=ind_u.astype(jnp.float32), ind_v=ind_v.astype(jnp.float32),
            ind_w=jnp.full((P, F), 25.0, jnp.float32), ind_valid=ind_valid,
        )
        wnd = wnd._replace(points=points)

        lin = ba.linearize(frames, points, calib, cfg)
        grid = (
            (points.status == W.PT_ACTIVE)[:, None]
            & frames.valid[None, :]
            & (points.host[:, None] != jnp.arange(F)[None, :])
        )
        active = grid & (lin.new_state == W.RES_IN)
        ind_active = lin.ind_ok & grid
        assert int(jnp.sum(ind_active)) > 20, "fixture must exercise factors"
        AH, AT = ba.compute_adjoints(frames)
        sys0 = ba.accumulate(lin, active, points.host, AH, AT, F)
        sys1 = ba.accumulate(lin, active, points.host, AH, AT, F,
                             ind_active=ind_active)

        # dense f64 assembly of ONLY the indirect contribution
        AHn = np.asarray(AH, np.float64)
        ATn = np.asarray(AT, np.float64)
        host = np.asarray(points.host)
        ia = np.asarray(ind_active)
        Jpdc = np.asarray(lin.Jpdc, np.float64)
        Jpdxi = np.asarray(lin.Jpdxi, np.float64)
        Jpdd = np.asarray(lin.Jpdd, np.float64)
        res = np.asarray(lin.ind_res, np.float64)
        wgt = np.asarray(lin.ind_wgt, np.float64)

        H = np.zeros((D, D))
        b = np.zeros(D)
        Hdd = np.zeros(P)
        bd = np.zeros(P)
        g = np.zeros((P, D))
        for p in range(P):
            hs = host[p]
            for f in range(F):
                if not ia[p, f]:
                    continue
                J_abs = np.zeros((2, D))
                J_abs[:, :CPARS] = Jpdc[p, f]
                J_rel = np.zeros((2, 8))
                J_rel[:, :6] = Jpdxi[p, f]
                J_abs[:, CPARS + 8 * hs: CPARS + 8 * hs + 8] += J_rel @ AHn[hs, f].T
                J_abs[:, CPARS + 8 * f: CPARS + 8 * f + 8] += J_rel @ ATn[hs, f].T
                w = wgt[p, f]
                r = res[p, f]
                H += w * J_abs.T @ J_abs
                b += w * J_abs.T @ r
                Hdd[p] += w * Jpdd[p, f] @ Jpdd[p, f]
                bd[p] += w * Jpdd[p, f] @ r
                g[p] += w * J_abs.T @ Jpdd[p, f]

        dH = np.asarray(sys1.H, np.float64) - np.asarray(sys0.H, np.float64)
        db = np.asarray(sys1.b, np.float64) - np.asarray(sys0.b, np.float64)
        dHdd = np.asarray(sys1.Hdd, np.float64) - np.asarray(sys0.Hdd, np.float64)
        dbd = np.asarray(sys1.bd, np.float64) - np.asarray(sys0.bd, np.float64)
        dg = np.asarray(sys1.g, np.float64) - np.asarray(sys0.g, np.float64)

        np.testing.assert_allclose(dH, H, atol=3e-4 * max(np.abs(H).max(), 1.0))
        np.testing.assert_allclose(db, b, atol=3e-4 * max(np.abs(b).max(), 1.0))
        np.testing.assert_allclose(dHdd, Hdd, atol=2e-4 * max(np.abs(Hdd).max(), 1.0))
        np.testing.assert_allclose(dbd, bd, atol=2e-4 * max(np.abs(bd).max(), 1.0))
        np.testing.assert_allclose(dg, g, atol=2e-4 * max(np.abs(g).max(), 1.0))

    def test_indirect_huber_and_gate(self):
        """Residuals beyond the gate are dropped; beyond the Huber threshold
        they are downweighted by th/|r|."""
        wnd, calib, cfg = make_synthetic_window()
        frames, points = wnd.frames, wnd.points
        P, F = cfg.max_points, cfg.max_frames
        lin0 = ba.linearize(frames, points, calib, cfg)
        # observation exactly 4 px off in x -> huber-damped but inside gate;
        # 20 px off -> gated out
        ind_u = lin0.center_u - 4.0
        points4 = points._replace(
            ind_u=ind_u, ind_v=lin0.center_v,
            ind_w=jnp.ones((P, F)), ind_valid=jnp.ones((P, F), bool))
        lin4 = ba.linearize(frames, points4, calib, cfg)
        ok4 = np.asarray(lin4.ind_ok)
        w4 = np.asarray(lin4.ind_wgt)
        assert ok4.any()
        np.testing.assert_allclose(w4[ok4], cfg.indirect_huber_px / 4.0,
                                   rtol=1e-5)
        points20 = points4._replace(ind_u=lin0.center_u - 20.0)
        lin20 = ba.linearize(frames, points20, calib, cfg)
        assert not np.asarray(lin20.ind_ok).any()

    def test_indirect_improves_pose_recovery(self):
        """A window with perturbed poses converges tighter with indirect
        factors than without when the photometric signal is weak (flat
        texture regions) — the hybrid premise."""
        from hslam_tpu.models.optimizer import ba_optimize

        pert = (jax.random.normal(jax.random.PRNGKey(3), (4, 8))
                * jnp.array([0.02] * 3 + [0.004] * 3 + [0.0, 0.0]))
        pert = pert.at[0].set(0.0)
        wnd, calib, cfg, (R_gt, t_gt) = make_rendered_window(pert=pert)
        frames, points = wnd.frames, wnd.points
        P, F = cfg.max_points, cfg.max_frames

        # ground-truth keypoint observations: project points at TRUE poses
        fr_gt = frames._replace(state=jnp.zeros((F, 8), jnp.float32))
        lin_gt = ba.linearize(fr_gt, points, calib, cfg)
        points = points._replace(
            ind_u=lin_gt.center_u, ind_v=lin_gt.center_v,
            ind_w=jnp.full((P, F), 25.0), ind_valid=jnp.ones((P, F), bool))
        wnd_ind = wnd._replace(points=points)
        wnd_no = wnd._replace(points=points._replace(
            ind_valid=jnp.zeros((P, F), bool)))

        def mean_reproj_err(result):
            """Mean |GT-keypoint reprojection error| at the BA result —
            gauge-invariant measure of geometric consistency."""
            w2 = result.window
            pts_eval = w2.points._replace(
                ind_u=lin_gt.center_u, ind_v=lin_gt.center_v,
                ind_w=jnp.ones((P, F)), ind_valid=jnp.ones((P, F), bool))
            lin = ba.linearize(w2.frames, pts_eval, result.calib, cfg)
            r = jnp.linalg.norm(lin.ind_res, axis=-1)
            m = lin.ind_ok
            return float(jnp.sum(jnp.where(m, r, 0.0)) / jnp.sum(m))

        res_ind = ba_optimize(wnd_ind, calib, cfg, 10)
        res_no = ba_optimize(wnd_no, calib, cfg, 10)
        assert np.isfinite(res_ind.rmse)
        e_ind = mean_reproj_err(res_ind)
        e_no = mean_reproj_err(res_no)
        assert e_ind < e_no, (
            f"indirect factors must tighten geometry: {e_ind} !< {e_no}")
        assert e_ind < 0.5, f"reprojection error too large: {e_ind}"


class TestSchur:
    def test_schur_equals_dense_elimination(self):
        """H_sc/b_sc/resubstitute consistent with eliminating idepths from
        the dense KKT system — all in f64 numpy to avoid conditioning
        noise."""
        wnd, calib, cfg = make_synthetic_window()
        _, active, _, _, sys = _lin_and_sys(wnd, calib, cfg)
        F = cfg.max_frames
        D = CPARS + 8 * F

        prior_pt = jnp.full(cfg.max_points, 100.0)
        pt_active = jnp.sum(active, axis=1) > 0
        H_sc, b_sc, HdiF = ba.schur_complement(sys, prior_pt, pt_active)

        Hn = np.asarray(sys.H, np.float64)
        bn = np.asarray(sys.b, np.float64)
        gn = np.asarray(sys.g, np.float64)
        Hddn = np.asarray(sys.Hdd + prior_pt, np.float64)
        bdn = np.asarray(sys.bd, np.float64)
        act = np.asarray(pt_active)
        idx = np.where(act)[0]

        Hsc_ref = (gn[idx].T / Hddn[idx]) @ gn[idx]
        bsc_ref = gn[idx].T @ (bdn[idx] / Hddn[idx])
        np.testing.assert_allclose(np.asarray(H_sc), Hsc_ref,
                                   rtol=1e-3, atol=1e-3 * np.abs(Hsc_ref).max())
        np.testing.assert_allclose(np.asarray(b_sc), bsc_ref,
                                   rtol=1e-3, atol=1e-3 * max(np.abs(bsc_ref).max(), 1.0))

        # well-conditioned solve: strong reg, both sides f64
        reg = np.abs(Hn).max() * 1e-3 * np.eye(D) + 10 * np.eye(D)
        x = np.linalg.solve(Hn + reg - Hsc_ref, bn - bsc_ref)
        # dense KKT
        Hfull = np.block([[Hn + reg, gn[idx].T], [gn[idx], np.diag(Hddn[idx])]])
        bfull = np.concatenate([bn, bdn[idx]])
        sol = np.linalg.solve(Hfull, bfull)
        np.testing.assert_allclose(x, sol[:D], rtol=1e-5, atol=1e-8)

        d = np.asarray(ba.resubstitute(sys, HdiF, jnp.asarray(x, jnp.float32)))
        np.testing.assert_allclose(d[idx], -sol[D:], rtol=1e-2,
                                   atol=1e-2 * max(np.abs(sol[D:]).max(), 1e-3))


class TestGradientSmoke:
    def test_frame_translation_gradient_sign_and_scale(self):
        """Loose check: b on frame translation dims matches the numeric
        energy gradient within the reference's center-pixel-Jacobian
        approximation error (see module docstring)."""
        wnd, calib, cfg = make_synthetic_window()
        lin, active, _, _, sys = _lin_and_sys(wnd, calib, cfg)

        def total_E(frames):
            l2 = ba.linearize(frames, wnd.points, calib, cfg)
            return float(jnp.sum(jnp.where(active, l2.energy_raw, 0.0)))

        eps = 1e-5
        for slot, dim in [(1, 0), (2, 1), (3, 2)]:
            stp = wnd.frames.state.at[slot, dim].add(eps)
            stm = wnd.frames.state.at[slot, dim].add(-eps)
            num = (total_E(wnd.frames._replace(state=stp))
                   - total_E(wnd.frames._replace(state=stm))) / (2 * eps)
            ana = 2.0 * float(sys.b[CPARS + 8 * slot + dim])
            assert np.sign(ana) == np.sign(num) or abs(num) < 50.0
            np.testing.assert_allclose(ana, num, rtol=0.5, atol=50.0,
                                       err_msg=f"frame {slot} dim {dim}")


class TestOptimize:
    def test_ba_reduces_pose_error(self):
        from hslam_tpu.models.optimizer import ba_optimize

        F = CFG.max_frames
        # perturbation well above the rendering-model bias (the discrete
        # photometric optimum sits ~0.002 rel-pose-log away from GT at 64^2)
        pert = jax.random.normal(jax.random.PRNGKey(9), (F, 8)) * jnp.array(
            [0.1, 0.1, 0.1, 0.04, 0.04, 0.04, 0.0, 0.0]
        )
        pert = pert.at[0].set(0.0)
        wnd, calib, cfg, (R_gt, t_gt) = make_rendered_window(pert=pert)
        frames = wnd.frames

        res = ba_optimize(wnd, calib, cfg, n_iterations=8)
        R_f, t_f = W.frame_poses(res.window.frames)
        R_p, t_p = W.frame_poses(frames)
        Ri0, ti0 = lie.se3_inverse(R_f[0], t_f[0])
        Rp0, tp0 = lie.se3_inverse(R_p[0], t_p[0])

        err_after = err_b4 = 0.0
        for f in range(1, F):
            Rgt_rel, tgt_rel = lie.se3_mul(
                R_gt[f], t_gt[f], *lie.se3_inverse(R_gt[0], t_gt[0])
            )
            Rrel, trel = lie.se3_mul(R_f[f], t_f[f], Ri0, ti0)
            dR, dt = lie.se3_mul(Rrel, trel, *lie.se3_inverse(Rgt_rel, tgt_rel))
            err_after += float(jnp.sum(lie.se3_log(dR, dt) ** 2))
            Rrel_p, trel_p = lie.se3_mul(R_p[f], t_p[f], Rp0, tp0)
            dRp, dtp = lie.se3_mul(Rrel_p, trel_p, *lie.se3_inverse(Rgt_rel, tgt_rel))
            err_b4 += float(jnp.sum(lie.se3_log(dRp, dtp) ** 2))

        assert np.isfinite(err_after)
        # NOTE: geometric Jacobians are frozen at the first-estimate poses
        # (FEJ, by design — OptimizationClasses.cpp:75-121 evaluates at
        # PRE_*_0), so a *cold* 0.1-scale perturbation converges linearly,
        # not quadratically; ~2x reduction per optimize() call is the
        # expected behavior (the live system only ever sees warm starts).
        assert err_after < 0.55 * err_b4, (err_b4, err_after)


class TestLinearizedResiduals:
    """Mode-1 (isLinearized) machinery: frozen Jacobians, res_toZero,
    resApprox reconstruction, mixed active+linearized accumulation, and the
    linearized/marginal energies (AccumulatedTopHessian.cpp:39-141,
    OptimizationClasses.cpp:258-284, EnergyFunctional.cpp:277-347)."""

    def _freeze_at(self, wnd, calib, cfg):
        lin, active, AH, AT, _ = _lin_and_sys(wnd, calib, cfg)
        frozen = ba.fix_linearization(
            lin, wnd.frames, calib, wnd.points.host, active, AH, AT)
        return lin, active, AH, AT, frozen

    def test_resapprox_reconstructs_resF_at_fixing_state(self):
        """res_toZero + J*delta at the SAME state == the original resF
        (fixLinearizationF followed by mode-1 resApprox is the identity)."""
        wnd, calib, cfg = make_synthetic_window()
        lin, active, AH, AT, frozen = self._freeze_at(wnd, calib, cfg)
        approx = ba.frozen_resapprox(
            frozen, wnd.frames, calib, wnd.points.host, AH, AT)
        a = np.asarray(lin.resF)[np.asarray(active)]
        b = np.asarray(approx)[np.asarray(active)]
        np.testing.assert_allclose(a, b, atol=5e-4 * max(np.abs(a).max(), 1.0))

    def test_mixed_active_linearized_dense_parity(self):
        """f64 dense parity of the MIXED system: half the residuals active
        (mode 0, relinearized at the moved state), half linearized (mode 1,
        frozen J + resApprox = res_toZero + J*delta_new). The combined
        H/b/Hdd/bd/g must equal a dense numpy assembly using each residual's
        respective Jacobians and residual vectors."""
        wnd, calib, cfg = make_synthetic_window()
        F, P = cfg.max_frames, cfg.max_points
        D = CPARS + 8 * F
        lin0, active0, AH0, AT0, _ = _lin_and_sys(wnd, calib, cfg)

        # split: even points' residuals get frozen, odd stay active
        pidx = jnp.arange(P)
        freeze_mask = active0 & ((pidx % 2 == 0)[:, None])
        act_mask = active0 & ((pidx % 2 == 1)[:, None])
        frozen = ba.fix_linearization(
            lin0, wnd.frames, calib, wnd.points.host, freeze_mask, AH0, AT0)

        # move the state (this is the delta the frozen set must track)
        st2 = wnd.frames.state + 0.003 * jax.random.normal(
            jax.random.PRNGKey(42), (F, 8))
        st2 = st2.at[0].set(wnd.frames.state[0])
        frames2 = wnd.frames._replace(state=st2.astype(jnp.float32))
        wnd2 = wnd._replace(frames=frames2)

        AH, AT = ba.compute_adjoints(frames2)   # adjoints are FEJ-based;
        lin2 = ba.linearize(frames2, wnd.points, calib, cfg)
        sys_a = ba.accumulate(lin2, act_mask, wnd.points.host, AH, AT, F)
        sys_l = ba.accumulate_frozen(
            frozen, frames2, calib, wnd.points.host, AH, AT, F)
        sys = ba.add_systems(sys_a, sys_l)

        # --- dense f64 reference
        AHn = np.asarray(AH, np.float64)
        ATn = np.asarray(AT, np.float64)
        host = np.asarray(wnd.points.host)

        # frozen resApprox in f64: res_toZero + J*delta
        dp, c_delta = ba.pair_deltas(frames2, calib, AH, AT)
        dpn = np.asarray(dp, np.float64)
        cdn = np.asarray(c_delta, np.float64)

        H = np.zeros((D, D))
        b = np.zeros(D)
        Hdd = np.zeros(P)
        bd = np.zeros(P)
        g = np.zeros((P, D))

        def add_residual(p, f, Jpdc, Jpdxi, Jpdd, JIdx, JabF, r):
            hslot = host[p]
            B_rel = np.zeros((4, 8))
            B_rel[0, :6] = Jpdxi[p, f, 0]
            B_rel[1, :6] = Jpdxi[p, f, 1]
            B_rel[2, 6] = 1.0
            B_rel[3, 7] = 1.0
            C = np.concatenate([JIdx[p, f], JabF[p, f]], axis=1)
            J_rel = C @ B_rel
            J_abs = np.zeros((8, D))
            J_abs[:, :CPARS] = C[:, :2] @ Jpdc[p, f]
            J_abs[:, CPARS + 8 * hslot: CPARS + 8 * hslot + 8] += (
                J_rel @ AHn[hslot, f].T)
            J_abs[:, CPARS + 8 * f: CPARS + 8 * f + 8] += (
                J_rel @ ATn[hslot, f].T)
            J_d = C[:, :2] @ Jpdd[p, f]
            H_ = J_abs.T @ J_abs
            return H_, J_abs.T @ r, J_d @ J_d, J_d @ r, J_abs.T @ J_d

        # active half: lin2's Jacobians + residuals
        A2 = {k: np.asarray(getattr(lin2, k), np.float64)
              for k in ("Jpdc", "Jpdxi", "Jpdd", "JIdx", "JabF", "resF")}
        actn = np.asarray(act_mask)
        for p in range(P):
            for f in range(F):
                if not actn[p, f]:
                    continue
                dH, db, dHdd, dbd, dg = add_residual(
                    p, f, A2["Jpdc"], A2["Jpdxi"], A2["Jpdd"],
                    A2["JIdx"], A2["JabF"], A2["resF"][p, f])
                H += dH; b += db; Hdd[p] += dHdd; bd[p] += dbd; g[p] += dg

        # linearized half: frozen Jacobians, resApprox from f64 delta algebra
        Fz = {k: np.asarray(getattr(frozen, k), np.float64)
              for k in ("Jpdc", "Jpdxi", "Jpdd", "JIdx", "JabF", "res_toZero")}
        frzn = np.asarray(freeze_mask)
        for p in range(P):
            hslot = host[p]
            for f in range(F):
                if not frzn[p, f]:
                    continue
                dpv = dpn[hslot, f]
                jx = Fz["Jpdxi"][p, f, 0] @ dpv[:6] + Fz["Jpdc"][p, f, 0] @ cdn
                jy = Fz["Jpdxi"][p, f, 1] @ dpv[:6] + Fz["Jpdc"][p, f, 1] @ cdn
                r = (Fz["res_toZero"][p, f]
                     + Fz["JIdx"][p, f, :, 0] * jx
                     + Fz["JIdx"][p, f, :, 1] * jy
                     + Fz["JabF"][p, f, :, 0] * dpv[6]
                     + Fz["JabF"][p, f, :, 1] * dpv[7])
                dH, db, dHdd, dbd, dg = add_residual(
                    p, f, Fz["Jpdc"], Fz["Jpdxi"], Fz["Jpdd"],
                    Fz["JIdx"], Fz["JabF"], r)
                H += dH; b += db; Hdd[p] += dHdd; bd[p] += dbd; g[p] += dg

        scale = max(np.abs(H).max(), 1.0)
        np.testing.assert_allclose(np.asarray(sys.H), H, atol=3e-4 * scale)
        np.testing.assert_allclose(np.asarray(sys.b), b,
                                   atol=3e-4 * max(np.abs(b).max(), 1.0))
        np.testing.assert_allclose(np.asarray(sys.Hdd), Hdd,
                                   atol=2e-4 * max(np.abs(Hdd).max(), 1.0))
        np.testing.assert_allclose(np.asarray(sys.bd), bd,
                                   atol=2e-4 * max(np.abs(bd).max(), 1.0))
        np.testing.assert_allclose(np.asarray(sys.g), g,
                                   atol=2e-4 * max(np.abs(g).max(), 1.0))

    def test_l_energy_matches_numpy(self):
        """calcLEnergyPt parity: sum of Jdelta*(Jdelta + 2 res_toZero) over
        linearized residuals (+ idepth prior energy, 0 here since dd == 0)."""
        wnd, calib, cfg = make_synthetic_window()
        _, active, AH0, AT0, _ = _lin_and_sys(wnd, calib, cfg)
        lin0 = ba.linearize(wnd.frames, wnd.points, calib, cfg)
        frozen = ba.fix_linearization(
            lin0, wnd.frames, calib, wnd.points.host, active, AH0, AT0)

        F = cfg.max_frames
        st2 = wnd.frames.state + 0.002 * jax.random.normal(
            jax.random.PRNGKey(9), (F, 8))
        frames2 = wnd.frames._replace(state=st2.astype(jnp.float32))
        AH, AT = ba.compute_adjoints(frames2)
        E = float(ba.calc_l_energy(
            frozen, frames2, calib, wnd.points.host, AH, AT,
            jnp.zeros(cfg.max_points)))

        dp, c_delta = ba.pair_deltas(frames2, calib, AH, AT)
        dpn = np.asarray(dp, np.float64)
        cdn = np.asarray(c_delta, np.float64)
        host = np.asarray(wnd.points.host)
        Fz = {k: np.asarray(getattr(frozen, k), np.float64)
              for k in ("Jpdc", "Jpdxi", "JIdx", "JabF", "res_toZero")}
        msk = np.asarray(active)
        E_ref = 0.0
        for p in range(cfg.max_points):
            hs = host[p]
            for f in range(F):
                if not msk[p, f]:
                    continue
                dpv = dpn[hs, f]
                jx = Fz["Jpdxi"][p, f, 0] @ dpv[:6] + Fz["Jpdc"][p, f, 0] @ cdn
                jy = Fz["Jpdxi"][p, f, 1] @ dpv[:6] + Fz["Jpdc"][p, f, 1] @ cdn
                jd = (Fz["JIdx"][p, f, :, 0] * jx
                      + Fz["JIdx"][p, f, :, 1] * jy
                      + Fz["JabF"][p, f, :, 0] * dpv[6]
                      + Fz["JabF"][p, f, :, 1] * dpv[7])
                E_ref += float(jd @ (jd + 2.0 * Fz["res_toZero"][p, f]))
        np.testing.assert_allclose(E, E_ref, rtol=2e-2,
                                   atol=1e-3 * max(abs(E_ref), 1.0))

    def test_m_energy_matches_numpy(self):
        D = 20
        rng = np.random.RandomState(3)
        A = rng.randn(D, D)
        HM = jnp.asarray(A @ A.T, jnp.float32)
        bM = jnp.asarray(rng.randn(D), jnp.float32)
        delta = jnp.asarray(0.01 * rng.randn(D), jnp.float32)
        E = float(ba.calc_m_energy(HM, bM, delta))
        d = np.asarray(delta, np.float64)
        E_ref = d @ (2 * np.asarray(bM, np.float64)
                     + np.asarray(HM, np.float64) @ d)
        np.testing.assert_allclose(E, E_ref, rtol=1e-4, atol=1e-6)

    def test_ba_optimize_accepts_frozen_set(self):
        """Smoke: ba_optimize with a frozen residual set runs, stays finite,
        and the frozen information changes the solution (the frozen half
        anchors the window against the perturbation)."""
        from hslam_tpu.models.optimizer import ba_optimize

        wnd, calib, cfg, _ = make_rendered_window()
        lin0, active0, AH0, AT0, _ = _lin_and_sys(wnd, calib, cfg)
        pidx = jnp.arange(cfg.max_points)
        freeze_mask = active0 & ((pidx % 2 == 0)[:, None])
        frozen = ba.fix_linearization(
            lin0, wnd.frames, calib, wnd.points.host, freeze_mask, AH0, AT0)

        pert = 0.02 * np.random.RandomState(11).randn(cfg.max_frames, 8)
        pert[0] = 0
        wnd_p = wnd._replace(frames=wnd.frames._replace(
            state=jnp.asarray(pert, jnp.float32)))

        out_plain = ba_optimize(wnd_p, calib, cfg, 3)
        out_frozen = ba_optimize(wnd_p, calib, cfg, 3, frozen=frozen)
        assert np.isfinite(float(out_plain.rmse))
        assert np.isfinite(float(out_frozen.rmse))
        d = np.abs(np.asarray(out_plain.window.frames.state)
                   - np.asarray(out_frozen.window.frames.state)).max()
        assert d > 1e-7, "frozen residuals should alter the solution"


class TestWindowGather:
    def test_window_path_matches_packed_path(self):
        """linearize() via the 12x12 window-table gather == the per-tap
        packed-cell gather on every residual both paths keep (the window
        path additionally OOB-masks taps whose stencil leaves the window;
        on this moderate-motion fixture none do)."""
        wnd, calib, cfg, _ = make_rendered_window(
            pert=0.02 * np.random.RandomState(3).randn(4, 8)
        )
        frames, points = wnd.frames, wnd.points
        lin_p = ba.linearize(frames, points, calib, cfg)
        tbl = ba.build_window_table(frames.images)
        lin_w = ba.linearize(frames, points, calib, cfg, window_table=tbl)

        keep = np.asarray(lin_w.new_state != W.RES_OOB)
        assert keep.mean() > 0.5, "window fixture should keep most residuals"
        for name in ("resF", "JIdx", "JabF", "energy"):
            a = np.asarray(getattr(lin_p, name))
            b = np.asarray(getattr(lin_w, name))
            np.testing.assert_allclose(
                a[keep], b[keep], rtol=1e-4, atol=1e-3,
                err_msg=f"window-path mismatch in {name}")
        # states agree wherever the window path doesn't extra-mask
        assert (np.asarray(lin_w.new_state)[keep]
                == np.asarray(lin_p.new_state)[keep]).all()


class TestFrameEnergyTH:
    def test_energy_th_matches_numpy_rederivation(self):
        """setNewFrameEnergyTH parity (FullSystemOptimize.cpp:60-101): the
        nth-element of residual energies targeting the newest frame, sqrt,
        median-factor, constant blend, squared, overall weight — re-derived
        independently in numpy."""
        from types import SimpleNamespace

        from hslam_tpu.models.optimizer import _update_energy_th

        wnd, calib, cfg = make_synthetic_window()
        frames = wnd.frames
        F = cfg.max_frames
        P = cfg.max_points
        rng = np.random.RandomState(7)
        energy_raw = rng.uniform(0.0, 900.0, (P, F)).astype(np.float32)
        # some invalid rows (reference: state_NewEnergyWithOutlier < 0)
        energy_raw[rng.rand(P, F) < 0.15] = -1.0
        grid = rng.rand(P, F) < 0.8
        newest = F - 1

        lin = SimpleNamespace(energy_raw=jnp.asarray(energy_raw))
        out = _update_energy_th(frames, lin, jnp.asarray(grid),
                                jnp.int32(newest), cfg)
        got = float(out.energy_th[newest])

        # numpy re-derivation
        mask = grid & (energy_raw >= 0)
        vals = np.sort(energy_raw[:, newest][mask[:, newest]])
        nth = int(cfg.frame_energy_th_n * len(vals))
        th = np.sqrt(vals[nth]) * cfg.frame_energy_th_fac_median
        th = (26.0 * cfg.frame_energy_th_const_weight
              + th * (1.0 - cfg.frame_energy_th_const_weight))
        th = th * th * cfg.overall_energy_th_weight ** 2
        np.testing.assert_allclose(got, th, rtol=1e-5)
        # other slots untouched
        np.testing.assert_array_equal(
            np.asarray(out.energy_th[:newest]),
            np.asarray(frames.energy_th[:newest]))

    def test_energy_th_empty_fallback(self):
        """No residuals targeting the newest frame -> the 12^2*patternNum
        fallback (FullSystemOptimize.cpp:75)."""
        from types import SimpleNamespace

        from hslam_tpu.models.optimizer import _update_energy_th

        wnd, calib, cfg = make_synthetic_window()
        P, F = cfg.max_points, cfg.max_frames
        lin = SimpleNamespace(
            energy_raw=jnp.full((P, F), -1.0, jnp.float32))
        out = _update_energy_th(wnd.frames, lin,
                                jnp.zeros((P, F), bool),
                                jnp.int32(F - 1), cfg)
        np.testing.assert_allclose(float(out.energy_th[F - 1]),
                                   12.0 * 12.0 * 8.0)
