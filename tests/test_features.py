"""Multi-scale feature frontend tests (ops/features.py).

Covers the indirect-layer behaviors of the reference: the 1.2x feature
pyramid + border semantics (Src/Frame.cpp:57-74), oriented rBRIEF descriptor
stability (Src/Detector.cpp:70-159), GetFeaturesInArea radius queries
(Src/Frame.cpp:255-303), and mutual-NN Hamming matching.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hslam_tpu.ops import features as ft
from hslam_tpu.ops.pyramid import gaussian_blur7


def _texture(h=240, w=320, seed=0):
    rng = np.random.RandomState(seed)
    img = np.zeros((h, w), np.float32)
    for _ in range(250):
        y, x = rng.randint(20, h - 20), rng.randint(20, w - 20)
        img[y - 3:y + 4, x - 3:x + 4] += rng.rand() * 120
    img += rng.rand(h, w) * 5
    return np.clip(img, 0, 255)


class TestExtraction:
    def test_multiscale_extract_basic(self):
        img = _texture()
        u, v, lvl, sc, desc, valid = jax.jit(
            lambda im: ft.extract_multiscale(im, 4, 256, 8.0)
        )(jnp.asarray(img))
        n = int(valid.sum())
        assert n > 150
        lv = np.asarray(lvl)[np.asarray(valid)]
        # every level contributes and level budgets shrink with area
        counts = np.bincount(lv, minlength=4)
        assert (counts > 0).all()
        assert counts[0] >= counts[-1]
        # border exclusion (the 19-px indirect-border semantics)
        uu = np.asarray(u)[np.asarray(valid)]
        vv = np.asarray(v)[np.asarray(valid)]
        assert uu.min() >= ft.BORDER - 1 and vv.min() >= ft.BORDER - 1

    def test_gradient_fallback_on_smooth_texture(self):
        """Reference-default keypoint source (UseFAST=false,
        Detector.cpp:56-67): a smooth low-frequency texture has ZERO FAST
        corners (the r5 bench scene measured exactly that — the whole
        indirect layer idled), but gradient-selected keypoints must still
        fill the budget and their descriptors must match across a gain
        change (monotone flicker keeps rBRIEF tap signs)."""
        h, w = 240, 320
        ys, xs = np.mgrid[0:h, 0:w]
        img = 120.0 + sum(
            a * np.sin(2 * np.pi * (kx * xs / w + ky * ys / h) + p)
            for a, kx, ky, p in [(40, 2.3, 1.1, 0.3), (25, 3.7, 2.9, 1.7),
                                 (15, 1.3, 3.4, 2.9), (10, 4.9, 4.1, 0.9)]
        )
        img = np.clip(np.round(img), 0, 255).astype(np.float32)

        # FAST-only: (near) nothing
        *_, valid_fast = ft.extract_multiscale(
            jnp.asarray(img), 3, 256, 8.0, use_fast_only=True)
        assert int(valid_fast.sum()) < 10

        # gradient fallback: a real feature set
        u1, v1, _, _, d1, ok1 = ft.extract_multiscale(
            jnp.asarray(img), 3, 256, 8.0)
        assert int(ok1.sum()) > 80

        # matching across a 1.12x gain (loop-phase flicker)
        img2 = np.clip(np.round(img * 1.12), 0, 255).astype(np.float32)
        u2, v2, _, _, d2, ok2 = ft.extract_multiscale(
            jnp.asarray(img2), 3, 256, 8.0)
        from hslam_tpu.ops.orb import match_descriptors
        idx, mok = match_descriptors(d1, d2, valid_a=ok1, valid_b=ok2)
        mok_np = np.asarray(mok)
        assert int(mok_np.sum()) >= 25
        du = np.asarray(u2)[np.asarray(idx)] - np.asarray(u1)
        dv = np.asarray(v2)[np.asarray(idx)] - np.asarray(v1)
        disp = np.sqrt(du ** 2 + dv ** 2)[mok_np]
        assert float(np.median(disp)) < 2.0

    def test_descriptor_shift_matching(self):
        img = _texture(seed=1)
        ex = jax.jit(lambda im: ft.extract_multiscale(im, 3, 256, 8.0))
        u1, v1, _, _, d1, ok1 = ex(jnp.asarray(img))
        img2 = np.roll(np.roll(img, 4, axis=0), 7, axis=1)
        u2, v2, _, _, d2, ok2 = ex(jnp.asarray(img2))
        idx, ok = ft.match_pair(d1, ok1, d2, ok2)
        okn = np.asarray(ok)
        assert okn.sum() > 40
        du = np.asarray(u2)[np.asarray(idx)] - np.asarray(u1)
        dv = np.asarray(v2)[np.asarray(idx)] - np.asarray(v1)
        inl = (np.abs(du[okn] - 7) < 2) & (np.abs(dv[okn] - 4) < 2)
        assert inl.mean() > 0.8

    def test_descriptor_rotation_invariance(self):
        """Descriptor at a fixed point stays close under content rotation
        (quantized-orientation rBRIEF)."""
        rng = np.random.RandomState(3)
        import scipy.ndimage as ndi
        img = ndi.gaussian_filter(rng.rand(200, 200).astype(np.float32), 2)
        img = (img - img.min()) / (img.max() - img.min()) * 255.0
        blur = gaussian_blur7(jnp.asarray(img))
        d0, a0 = ft.describe(blur, jnp.asarray([100.0]), jnp.asarray([100.0]))
        rand, _ = ft.describe(blur, jnp.asarray([52.0]), jnp.asarray([63.0]))

        def ham(a, b):
            x = np.asarray(jnp.bitwise_xor(a, b)).view(np.uint8)
            return int(np.unpackbits(x).sum())

        base = ham(d0, rand)
        for deg in (10, 30, 45, 90, 180):
            img_r = ndi.rotate(img, deg, reshape=False, order=1)
            d1, a1 = ft.describe(gaussian_blur7(jnp.asarray(img_r)),
                                 jnp.asarray([100.0]), jnp.asarray([100.0]))
            assert ham(d0, d1) < 0.5 * base, f"rotation {deg} broke descriptor"
            # orientation tracks the content rotation
            da = (float(a1[0]) - float(a0[0]) + np.deg2rad(deg)) % (2 * np.pi)
            da = min(da, 2 * np.pi - da)
            assert da < 0.2

    def test_features_in_area_matches_bruteforce(self):
        img = _texture(seed=2)
        u, v, lvl, sc, desc, valid = ft.extract_multiscale(
            jnp.asarray(img), 3, 128, 8.0)
        q_u = jnp.asarray([50.0, 160.0, 300.0])
        q_v = jnp.asarray([60.0, 120.0, 200.0])
        mask = ft.features_in_area(u, v, valid, lvl, q_u, q_v, 25.0,
                                   min_level=0, max_level=1)
        un, vn, ln, valn = map(np.asarray, (u, v, lvl, valid))
        for i in range(3):
            d2 = (un - float(q_u[i])) ** 2 + (vn - float(q_v[i])) ** 2
            ref = (d2 <= 625.0) & valn & (ln <= 1)
            np.testing.assert_array_equal(np.asarray(mask[i]), ref)


class TestSubpix:
    def test_subpix_recovers_fractional_corner(self):
        """cornerSubPix equivalent (Detector.cpp:77-86): a blurred corner
        rendered at a known fractional position must be recovered to well
        under half a pixel from the integer FAST location."""
        import scipy.ndimage as ndi

        true_x, true_y = 40.37, 30.72
        ys, xs = np.mgrid[0:64, 0:80].astype(np.float64)
        img = 200.0 * ((xs < true_x) ^ (ys < true_y)) + 20.0
        img = ndi.gaussian_filter(img, 1.2).astype(np.float32)

        u0 = jnp.asarray([40.0])
        v0 = jnp.asarray([31.0])
        u1, v1 = ft.subpix_refine(jnp.asarray(img), u0, v0, iters=8)
        err = np.hypot(float(u1[0]) - true_x, float(v1[0]) - true_y)
        assert err < 0.15, f"subpix err {err} (got {float(u1[0])},{float(v1[0])})"

    def test_subpix_falls_back_on_flat_patch(self):
        img = jnp.full((64, 64), 50.0)
        u, v = ft.subpix_refine(img, jnp.asarray([32.0]), jnp.asarray([20.0]))
        assert float(u[0]) == 32.0 and float(v[0]) == 20.0


class TestFeatsStore:
    def test_empty_feats_shapes(self):
        f = ft.empty_feats(8, 256)
        assert f.u.shape == (8, 256) and f.desc.shape == (8, 256, 8)
        assert not bool(f.valid.any())
