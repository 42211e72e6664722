"""Pallas frontend kernels: interpreter-mode parity with the jnp path."""
import jax
import jax.numpy as jnp
import numpy as np

from hslam_tpu.ops.pallas_kernels import build_direct_pyramid_pallas, pyramid_level
from hslam_tpu.ops.pyramid import build_direct_pyramid


def test_pyramid_level_parity():
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (64, 96), minval=0.0, maxval=255.0)
    down, dx, dy, g2 = pyramid_level(img, interpret=True)

    ref_levels, ref_grads = build_direct_pyramid(img, 2)
    np.testing.assert_allclose(np.asarray(dx), np.asarray(ref_levels[0][..., 1]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(dy), np.asarray(ref_levels[0][..., 2]),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(g2), np.asarray(ref_grads[0]),
                               rtol=1e-5, atol=1e-2)
    np.testing.assert_allclose(np.asarray(down),
                               np.asarray(ref_levels[1][..., 0]), atol=1e-5)


def test_dispatch_routes_to_pallas(monkeypatch):
    """build_direct_pyramid must route through the Pallas kernel when the
    mode resolves to on/interp (the default TPU path), with identical
    results."""
    from hslam_tpu.ops import pallas_kernels, pyramid

    key = jax.random.PRNGKey(2)
    img = jax.random.uniform(key, (64, 96), minval=0.0, maxval=255.0)
    base_lv, base_gr = pyramid.build_direct_pyramid(img, 3)

    calls = []
    orig = pallas_kernels.build_direct_pyramid_pallas

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(pallas_kernels, "build_direct_pyramid_pallas", spy)
    monkeypatch.setenv("HSLAM_PALLAS", "interp")
    lv, gr = pyramid.build_direct_pyramid(img, 3)
    assert calls, "HSLAM_PALLAS=interp did not route to the Pallas kernel"
    for a, b in zip(lv, base_lv):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
    for a, b in zip(gr, base_gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-2)

    # tiny images must fall back (deepest level would be < 2 px)
    calls.clear()
    tiny = jax.random.uniform(key, (8, 8), minval=0.0, maxval=255.0)
    pyramid.build_direct_pyramid(tiny, 4)
    assert not calls, "tiny-image fallback did not trigger"


def test_full_pyramid_parity():
    key = jax.random.PRNGKey(1)
    img = jax.random.uniform(key, (96, 128), minval=0.0, maxval=255.0)
    gw = jnp.linspace(0.5, 1.5, 256)
    lv_p, gr_p = build_direct_pyramid_pallas(img, 3, gamma_grad_weight=gw,
                                             interpret=True)
    lv_r, gr_r = build_direct_pyramid(img, 3, gamma_grad_weight=gw)
    for a, b in zip(lv_p, lv_r):
        # 0.25*(a+b+c+d) vs mean(): different summation order, f32 noise
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
    for a, b in zip(gr_p, gr_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-2)
