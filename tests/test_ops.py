"""Unit tests for frontend device ops: pyramid, selector, distance map,
KLT, two-view geometry, ORB matching, epipolar trace."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hslam_tpu.config import Config
from hslam_tpu.utils import lie


def checker_image(h=96, w=128, seed=0):
    key = jax.random.PRNGKey(seed)
    ky, kx = jax.random.uniform(key, (2, 6), minval=0.5, maxval=5.5)
    ph = jax.random.uniform(jax.random.fold_in(key, 1), (6,)) * 6.28
    ys, xs = jnp.mgrid[0:h, 0:w]
    img = 120.0 + sum(
        30.0 * jnp.sin(2 * jnp.pi * (kx[i] * xs / w + ky[i] * ys / h) + ph[i])
        for i in range(6)
    )
    return img.astype(jnp.float32)


class TestPyramid:
    def test_downsample_average(self):
        from hslam_tpu.ops.pyramid import downsample2

        img = jnp.arange(16, dtype=jnp.float32).reshape(4, 4)
        d = downsample2(img)
        np.testing.assert_allclose(d, [[2.5, 4.5], [10.5, 12.5]])

    def test_gradients_linear(self):
        from hslam_tpu.ops.pyramid import image_gradients

        ys, xs = jnp.mgrid[0:8, 0:10]
        img = (3.0 * xs + 2.0 * ys).astype(jnp.float32)
        dx, dy = image_gradients(img)
        np.testing.assert_allclose(dx[1:-1, 1:-1], 3.0, atol=1e-5)
        np.testing.assert_allclose(dy[1:-1, 1:-1], 2.0, atol=1e-5)
        # borders zero
        assert float(dx[0, 0]) == 0.0 and float(dy[0, 0]) == 0.0

    def test_build_pyramid_shapes(self):
        from hslam_tpu.ops.pyramid import build_direct_pyramid

        img = checker_image(64, 96)
        pyr, grads = build_direct_pyramid(img, 3)
        assert [p.shape for p in pyr] == [(64, 96, 3), (32, 48, 3), (16, 24, 3)]
        assert grads[0].shape == (64, 96)
        # grad map = dx^2 + dy^2
        np.testing.assert_allclose(
            grads[1], pyr[1][..., 1] ** 2 + pyr[1][..., 2] ** 2, rtol=1e-5
        )


class TestSelector:
    def test_select_respects_budget_and_spread(self):
        from hslam_tpu.ops.selector import compact_selection, select_pixels

        cfg = Config()
        img = checker_image(96, 128)
        from hslam_tpu.ops.pyramid import build_direct_pyramid

        pyr, grads = build_direct_pyramid(img, 3)
        status = select_pixels(pyr[0], tuple(grads), pot=5, th_factor=1.0,
                               seed=jnp.int32(0), cfg=cfg)
        n_sel = int(jnp.sum(status > 0))
        assert n_sel > 50, "too few selected on a textured image"
        u, v, t, valid = compact_selection(
            status, grads[0], 256, jnp.int32(200), jnp.int32(0)
        )
        assert int(valid.sum()) <= 256
        # all returned coords must be selected pixels
        uu = np.asarray(u[valid]).astype(int)
        vv = np.asarray(v[valid]).astype(int)
        s = np.asarray(status)
        assert (s[vv, uu] > 0).all()


class TestDistMap:
    def test_distance_map_basic(self):
        from hslam_tpu.ops.distmap import distance_map

        d = distance_map(jnp.array([5.0]), jnp.array([5.0]),
                         jnp.array([True]), 16, 16, iterations=20)
        assert float(d[5, 5]) == 0.0
        assert float(d[5, 9]) == pytest.approx(4.0, abs=1.0)
        # diagonal distance is the alternating-neighborhood chamfer metric
        assert float(d[9, 9]) <= 8.0
        assert float(d[0, 15]) > 5.0


class TestKLT:
    def test_track_pure_translation(self):
        from hslam_tpu.ops.klt import track
        from hslam_tpu.ops.pyramid import downsample2

        img = checker_image(96, 128, seed=2)
        shift = (3.7, -2.3)
        ys, xs = jnp.mgrid[0:96, 0:128]
        from hslam_tpu.utils.interp import bilinear

        img2 = bilinear(img, xs + shift[0], ys + shift[1])

        ref_pyr = [img, downsample2(img), downsample2(downsample2(img))]
        tgt_pyr = [img2, downsample2(img2), downsample2(downsample2(img2))]
        pts = jnp.array([[40.0, 40.0], [80.0, 50.0], [60.0, 30.0], [30.0, 60.0]])
        out, ok, err = track(ref_pyr, tgt_pyr, pts)
        moved = out - pts
        assert bool(ok.all()), err
        np.testing.assert_allclose(
            moved, np.tile([-shift[0], -shift[1]], (4, 1)), atol=0.2
        )


class TestTwoView:
    def test_reconstruct_known_motion(self):
        from hslam_tpu.ops.twoview import two_view_reconstruct

        key = jax.random.PRNGKey(0)
        N = 200
        fx = fy = 100.0
        cx, cy = 63.5, 47.5
        K = jnp.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
        # random 3D points in front of both cameras
        X = jnp.stack(
            [
                jax.random.uniform(key, (N,), minval=-1.5, maxval=1.5),
                jax.random.uniform(jax.random.fold_in(key, 1), (N,), minval=-1.0, maxval=1.0),
                jax.random.uniform(jax.random.fold_in(key, 2), (N,), minval=2.0, maxval=6.0),
            ],
            axis=-1,
        )
        xi = jnp.array([0.3, 0.05, 0.05, 0.02, -0.04, 0.01])
        R, t = lie.se3_exp(xi)
        X2 = X @ R.T + t
        p1 = jnp.stack([fx * X[:, 0] / X[:, 2] + cx, fy * X[:, 1] / X[:, 2] + cy], -1)
        p2 = jnp.stack([fx * X2[:, 0] / X2[:, 2] + cx, fy * X2[:, 1] / X2[:, 2] + cy], -1)
        noise = jax.random.normal(jax.random.fold_in(key, 3), p2.shape) * 0.3
        p2 = p2 + noise

        res = two_view_reconstruct(p1, p2, jnp.ones(N, bool), K,
                                   jax.random.PRNGKey(7), n_iters=150)
        assert bool(res.ok)
        # rotation error
        dR = np.asarray(res.R) @ np.asarray(R).T
        ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
        assert ang < 0.02, f"rotation error {ang}"
        # translation direction error
        tn = np.asarray(res.t) / np.linalg.norm(res.t)
        tg = np.asarray(t) / np.linalg.norm(t)
        assert min(np.linalg.norm(tn - tg), np.linalg.norm(tn + tg)) < 0.05
        # triangulated depths close (up to scale): compare idepth ratios
        tri = np.asarray(res.tri_ok)
        assert tri.sum() > 100
        z_est = np.asarray(res.points3d[:, 2])[tri]
        z_gt = np.asarray(X[:, 2])[tri]
        scale = np.median(z_gt / z_est)
        rel = np.abs(z_est * scale - z_gt) / z_gt
        # far points triangulated from a short noisy baseline legitimately
        # reach ~12% depth error; require the bulk to be tight
        assert np.percentile(rel, 95) < 0.1, np.percentile(rel, 95)


class TestORB:
    def test_fast_detects_corners(self):
        from hslam_tpu.ops.orb import fast_score

        img = jnp.zeros((64, 64), jnp.float32)
        img = img.at[20:40, 20:40].set(200.0)   # bright square: 4 corners
        score = fast_score(img, 20.0)
        # corners should have nonzero score, flat regions zero
        assert float(score[30, 30]) == 0.0
        assert float(score[10, 10]) == 0.0
        corner_region = score[18:23, 18:23]
        assert float(jnp.max(corner_region)) > 0.0

    def test_descriptor_matching_under_rotation(self):
        from hslam_tpu.ops.orb import grid_nms, fast_score, ic_angle, rbrief, \
            match_descriptors
        from hslam_tpu.ops.pyramid import gaussian_blur7

        img = checker_image(96, 128, seed=4) + 30.0 * checker_image(96, 128, seed=9)
        blur = gaussian_blur7(img)
        score = fast_score(img, 8.0)
        u, v, valid = grid_nms(score, 8, 64)
        ang = ic_angle(img, u, v)
        desc = rbrief(blur, u, v, ang)

        # same keypoints, slightly shifted image -> should match to itself
        best, ok = match_descriptors(desc, desc, valid_a=valid, valid_b=valid)
        idx = np.where(np.asarray(ok))[0]
        assert len(idx) > 10
        np.testing.assert_array_equal(np.asarray(best)[idx], idx)

    def test_hamming(self):
        from hslam_tpu.ops.orb import hamming_matrix

        a = jnp.array([[0b1011, 0, 0, 0, 0, 0, 0, 0]], dtype=jnp.uint32)
        b = jnp.array([[0b0011, 0, 0, 0, 0, 0, 0, 0],
                       [0b1011, 0, 0, 0, 0, 0, 0, 0]], dtype=jnp.uint32)
        D = hamming_matrix(a, b)
        np.testing.assert_array_equal(np.asarray(D), [[1, 0]])


class TestEpipolar:
    def test_trace_recovers_depth(self):
        """Candidates with loose intervals traced against a known-motion
        frame must bracket the true inverse depth."""
        from hslam_tpu.config import PATTERN
        from hslam_tpu.ops import epipolar as epi
        from hslam_tpu.ops.pyramid import image_gradients
        from hslam_tpu.utils.interp import bilinear

        cfg = Config()
        h, w = 96, 128
        fx = fy = 80.0
        cx, cy = w / 2 - 0.5, h / 2 - 0.5
        depth = 2.0
        img = checker_image(h, w, seed=5)

        xi = jnp.array([0.12, 0.02, 0.0, 0.0, 0.0, 0.0])   # mostly x-translation
        R, t = lie.se3_exp(xi)
        ys, xs = jnp.mgrid[0:h, 0:w]
        px = (xs - cx) / fx
        py = (ys - cy) / fy
        Rinv, tinv = lie.se3_inverse(R, t)
        dz = Rinv[2, 0] * px + Rinv[2, 1] * py + Rinv[2, 2]
        s = (depth - tinv[2]) / dz
        X = s * (Rinv[0, 0] * px + Rinv[0, 1] * py + Rinv[0, 2]) + tinv[0]
        Y = s * (Rinv[1, 0] * px + Rinv[1, 1] * py + Rinv[1, 2]) + tinv[1]
        img2 = bilinear(img, fx * X / depth + cx, fy * Y / depth + cy)
        dx2, dy2 = image_gradients(img2)
        target = jnp.stack([img2, dx2, dy2], -1)

        P = 32
        key = jax.random.PRNGKey(1)
        u = jax.random.uniform(key, (P,), minval=20.0, maxval=w - 20.0)
        v = jax.random.uniform(jax.random.fold_in(key, 1), (P,), minval=20.0, maxval=h - 20.0)
        pat = jnp.asarray(PATTERN, jnp.float32)
        col = bilinear(img, u[:, None] + pat[None, :, 0], v[:, None] + pat[None, :, 1])
        gx = bilinear(jnp.asarray(image_gradients(img)[0]), u[:, None] + pat[None, :, 0], v[:, None] + pat[None, :, 1])
        gy = bilinear(jnp.asarray(image_gradients(img)[1]), u[:, None] + pat[None, :, 0], v[:, None] + pat[None, :, 1])
        gH = jnp.stack([
            jnp.stack([jnp.sum(gx * gx, -1), jnp.sum(gx * gy, -1)], -1),
            jnp.stack([jnp.sum(gx * gy, -1), jnp.sum(gy * gy, -1)], -1),
        ], -2)

        K = jnp.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
        KRKi = jnp.broadcast_to(K @ R @ jnp.linalg.inv(K), (P, 3, 3))
        Kt = jnp.broadcast_to(K @ t, (P, 3))
        affine = jnp.broadcast_to(jnp.array([1.0, 0.0]), (P, 2))
        state = epi.init_trace_state(P)
        state = state._replace(
            idepth_min=jnp.zeros(P),
            idepth_max=jnp.full(P, jnp.inf),
        )
        eth = jnp.full(P, 8 * cfg.outlier_th)
        out = epi.trace_on(state, u, v, col, jnp.ones((P, 8)), gH, eth,
                           jnp.ones(P, bool), KRKi, Kt, affine, target, cfg)

        good = np.asarray(out.status) == epi.IPS_GOOD
        assert good.sum() > P // 3, f"only {good.sum()} good traces"
        lo = np.asarray(out.idepth_min)[good]
        hi = np.asarray(out.idepth_max)[good]
        id_true = 1.0 / depth
        frac_bracket = np.mean((lo <= id_true + 0.05) & (hi >= id_true - 0.05))
        assert frac_bracket > 0.8, f"bracket rate {frac_bracket}"


class TestMotionHypothesesDtRatio:
    def test_dt_ratio_scales_constant_motion(self):
        """dt_ratio=2 must make the constant-motion hypothesis equal the
        dt_ratio=1 DOUBLE-motion hypothesis (same twist applied twice) —
        the input-skip velocity scaling of motion_hypotheses_device."""
        import jax.numpy as jnp
        from hslam_tpu.ops import tracker as trk
        from hslam_tpu.utils import lie

        xi_step = jnp.array([0.03, -0.02, 0.05, 0.01, -0.015, 0.02])
        R1, t1 = lie.se3_exp(xi_step)
        prevprev = np.eye(4)
        prev = np.eye(4)
        prev[:3, :3], prev[:3, 3] = np.asarray(R1), np.asarray(t1)
        Rr, tr = lie.se3_exp(jnp.array([0.1, 0.2, -0.1, 0.04, 0.0, -0.02]))
        ref = np.eye(4)
        ref[:3, :3], ref[:3, 3] = np.asarray(Rr), np.asarray(tr)

        args = (jnp.asarray(ref, jnp.float32), jnp.asarray(prev, jnp.float32),
                jnp.asarray(prevprev, jnp.float32), jnp.bool_(True))
        R_a, t_a = trk.motion_hypotheses_device(*args,
                                                dt_ratio=jnp.float32(2.0))
        R_b, t_b = trk.motion_hypotheses_device(*args,
                                                dt_ratio=jnp.float32(1.0))
        # hyp 0 = constant motion, hyp 1 = double motion
        np.testing.assert_allclose(np.asarray(R_a[0]), np.asarray(R_b[1]),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(t_a[0]), np.asarray(t_b[1]),
                                   atol=1e-5)
        # ratio 1 must reproduce the unscaled behavior exactly
        R_c, t_c = trk.motion_hypotheses_device(*args)
        np.testing.assert_allclose(np.asarray(R_b), np.asarray(R_c),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(t_b), np.asarray(t_c),
                                   atol=1e-6)
        # zero-motion-from-last / from-ref hypotheses are ratio-independent
        np.testing.assert_allclose(np.asarray(R_a[3]), np.asarray(R_b[3]),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(R_a[4]), np.asarray(R_b[4]),
                                   atol=1e-6)
