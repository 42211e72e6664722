"""DirectRefinement parity tests: the photometric two-view polish must
improve noisy triangulation seeds, and the alpha/coupling regularizers must
keep a LOW-PARALLAX bootstrap from collapsing (Src/Initializer.cpp:1330-2314
— alphaW/alphaK prior :2097-2150, iR coupling :2123-2127, untriangulated
0.1x down-weighting :2006-2007)."""
import jax
import jax.numpy as jnp
import numpy as np

from hslam_tpu.config import Config
from hslam_tpu.ops.init_refine import direct_refine
from hslam_tpu.ops.pyramid import build_direct_pyramid
from hslam_tpu.utils import lie
from hslam_tpu.utils.interp import bilinear

H, W = 96, 128
FX = FY = 80.0
CX, CY = W / 2 - 0.5, H / 2 - 0.5
DEPTH = 2.0

CFG = Config(max_frames=4, max_points=128, max_immature=128, pyr_levels=3)


def _texture(key=3):
    k = jax.random.PRNGKey(key)
    ky, kx = jax.random.uniform(k, (2, 8), minval=0.5, maxval=6.5)
    ph = jax.random.uniform(jax.random.fold_in(k, 1), (8,)) * 6.28
    amps = jnp.array([35.0, 30.0, 22.0, 18.0, 14.0, 10.0, 8.0, 6.0])
    ys, xs = jnp.mgrid[0:H, 0:W]
    return (120.0 + sum(
        amps[i] * jnp.sin(2 * jnp.pi * (kx[i] * xs / W + ky[i] * ys / H) + ph[i])
        for i in range(8))).astype(jnp.float32)


def _render(I0, Rf, tf):
    ys, xs = jnp.mgrid[0:H, 0:W]
    px = (xs - CX) / FX
    py = (ys - CY) / FY
    Rinv, tinv = lie.se3_inverse(Rf, tf)
    dz = Rinv[2, 0] * px + Rinv[2, 1] * py + Rinv[2, 2]
    s = (DEPTH - tinv[2]) / dz
    X = s * (Rinv[0, 0] * px + Rinv[0, 1] * py + Rinv[0, 2]) + tinv[0]
    Y = s * (Rinv[1, 0] * px + Rinv[1, 1] * py + Rinv[1, 2]) + tinv[1]
    return bilinear(I0, FX * X / DEPTH + CX, FY * Y / DEPTH + CY)


def _setup(xi_true, seed_noise=0.15, pose_noise=0.02, tri_frac=0.7):
    I0 = _texture()
    R1, t1 = lie.se3_exp(jnp.asarray(xi_true))
    img1 = _render(I0, R1, t1)
    pyr0, _ = build_direct_pyramid(I0, 3)
    pyr1, _ = build_direct_pyramid(img1, 3)

    rng = np.random.RandomState(0)
    P = 128
    u = jnp.asarray(rng.uniform(8, W - 8, P), jnp.float32)
    v = jnp.asarray(rng.uniform(8, H - 8, P), jnp.float32)
    valid = jnp.ones(P, bool)
    id_true = np.full(P, 1.0 / DEPTH, np.float32)
    idepth0 = id_true * (1.0 + seed_noise * rng.randn(P)).astype(np.float32)
    tri = jnp.asarray(rng.rand(P) < tri_frac)

    xi0 = np.asarray(xi_true) * (1.0 + pose_noise * rng.randn(6))
    R0, t0 = lie.se3_exp(jnp.asarray(xi0, jnp.float32))
    K4 = jnp.asarray([FX, FY, CX, CY], jnp.float32)
    return (pyr0[0], pyr1[0], u, v, valid, jnp.asarray(idepth0), tri,
            R0, t0, K4, np.asarray(R1), np.asarray(t1), id_true)


def test_refine_improves_pose_and_idepth():
    xi = [0.10, 0.05, 0.02, 0.01, -0.02, 0.005]
    (d0, d1, u, v, valid, id0, tri, R0, t0, K4,
     R_gt, t_gt, id_true) = _setup(xi, pose_noise=0.15)
    res = jax.jit(lambda: direct_refine(
        d0, d1, u, v, valid, id0, tri, R0, t0, K4, CFG))()

    # the photometric cost is scale-gauge-free (t*idepth invariant under
    # s-scaling); compare up to the monocular scale like the windowed BA
    # that follows would
    good = np.asarray(res.good) & np.asarray(tri)
    s = np.median(np.asarray(res.idepth)[good]) / np.median(id_true[good])
    t_aligned = np.asarray(res.t) * s
    id_aligned = np.asarray(res.idepth) / s

    err_t0 = np.linalg.norm(np.asarray(t0) - t_gt)
    err_t1 = np.linalg.norm(t_aligned - t_gt)
    assert err_t1 < err_t0 * 0.7, (err_t0, err_t1)

    e_seed = np.abs(np.asarray(id0) - id_true)[good].mean()
    e_ref = np.abs(id_aligned - id_true)[good].mean()
    assert e_ref < e_seed * 0.6, (e_seed, e_ref)
    assert good.sum() > 40


def test_refine_low_parallax_does_not_collapse():
    """Near-pure-rotation start: tiny translation, noticeable rotation. The
    alpha prior must keep idepths near their seeds instead of letting the
    unconstrained depths run away (the failure mode the reference's
    alphaW/alphaK regularizer exists for)."""
    xi = [0.008, 0.004, 0.001, 0.02, -0.015, 0.01]   # ~8mm trans, ~1.5deg rot
    (d0, d1, u, v, valid, id0, tri, R0, t0, K4,
     R_gt, t_gt, id_true) = _setup(xi, seed_noise=0.3)
    res = jax.jit(lambda: direct_refine(
        d0, d1, u, v, valid, id0, tri, R0, t0, K4, CFG))()

    assert bool(jnp.all(jnp.isfinite(res.t)))
    good = np.asarray(res.good)
    assert good.sum() > 40
    idepth = np.asarray(res.idepth)[good]
    # no collapse/runaway: refined idepths stay within a sane band around
    # the true inverse depth (0.5) — without the alpha prior the
    # unconstrained low-parallax depths drift to the clamp bounds
    frac_sane = np.mean((idepth > 0.1) & (idepth < 2.5))
    assert frac_sane > 0.9, frac_sane
    # rotation must still be recovered
    dR = np.asarray(res.R) @ R_gt.T
    ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
    assert ang < 0.01, ang


def test_refine_untriangulated_downweight():
    """Untriangulated features participate but cannot dominate: with HALF
    the seeds wildly wrong and untriangulated, the triangulated half still
    pulls the pose to the truth."""
    xi = [0.10, 0.05, 0.02, 0.01, -0.02, 0.005]
    (d0, d1, u, v, valid, id0, tri_unused, R0, t0, K4,
     R_gt, t_gt, id_true) = _setup(xi)
    P = int(u.shape[0])
    tri = jnp.asarray(np.arange(P) % 2 == 0)
    id_bad = jnp.where(tri, id0, 5.0)     # untriangulated seeded at 1.0 inside
    res = jax.jit(lambda: direct_refine(
        d0, d1, u, v, valid, id_bad, tri, R0, t0, K4, CFG))()
    good = np.asarray(res.good) & np.asarray(tri)
    s = np.median(np.asarray(res.idepth)[good]) / np.median(id_true[good])
    err_t0 = np.linalg.norm(np.asarray(t0) - t_gt)
    err_t1 = np.linalg.norm(np.asarray(res.t) * s - t_gt)
    assert err_t1 < err_t0, (err_t0, err_t1)
