"""Online photometric calibration: recover synthetic response/vignette/
exposures from tracked-point observations."""
import jax
import jax.numpy as jnp
import numpy as np

from hslam_tpu.models.photo_calib import (
    PhotoParams, calibrate, gamma_lut, init_params, vignette_map,
)


def test_recovers_exposures_and_response():
    key = jax.random.PRNGKey(0)
    P, F = 200, 8

    # ground truth: gamma-style response, radial vignette, varying exposure
    def G(x):      # irradiance (0..255) -> observed
        return 255.0 * (x / 255.0) ** 0.7

    gt_log_exp = jnp.concatenate(
        [jnp.zeros(1), jax.random.uniform(key, (F - 1,), minval=-0.4, maxval=0.4)]
    )
    a2_gt = -0.3

    L = jax.random.uniform(jax.random.fold_in(key, 1), (P,), minval=30.0, maxval=220.0)
    r2 = jax.random.uniform(jax.random.fold_in(key, 2), (P, F), minval=0.0, maxval=1.0)
    V = 1.0 + a2_gt * r2
    irr = jnp.exp(gt_log_exp)[None, :] * V * L[:, None]
    obs = jnp.clip(G(jnp.clip(irr, 0.0, 255.0)), 0.0, 255.0)
    mask = (irr > 5.0) & (irr < 250.0)
    frame_idx = jnp.broadcast_to(jnp.arange(F)[None, :], (P, F))

    params = init_params(F)
    fitted, rms = calibrate(params, obs, frame_idx, r2, mask, n_iters=30)

    assert float(rms) < 0.05, f"residual rms {rms}"
    # the fixed endpoint range of U leaves a single global log-gauge alpha
    # (U' = a U + b fits equally with log e' = a log e, log V' = a log V):
    # exposures and vignette must be recovered up to ONE consistent alpha.
    est = np.asarray(fitted.log_exp)
    est = est - est[0]
    gt = np.asarray(gt_log_exp)
    corr = np.corrcoef(est, gt)[0, 1]
    alpha = np.polyfit(gt, est, 1)[0]
    assert corr > 0.99, f"exposure correlation {corr}"
    assert 0.5 < alpha < 2.5, f"exposure gauge {alpha}"
    # vignette coefficient scales with the same alpha (log V' = alpha log V)
    a2_est = float(fitted.vig[0])
    assert abs(a2_est - alpha * a2_gt) < 0.3 * abs(alpha * a2_gt) + 0.05, (
        a2_est, alpha * a2_gt)

    lut = np.asarray(gamma_lut(fitted))
    assert lut.shape == (256,)
    assert (np.diff(lut) >= -1e-3).all(), "response LUT must be monotone"

    vm = np.asarray(vignette_map(fitted, 24, 32))
    assert vm.shape == (24, 32)
    # vignette darker at corners than center for a2 < 0
    assert vm[12, 16] > vm[0, 0]
