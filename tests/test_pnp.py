"""PnP RANSAC + GN: recover a known pose from noisy 3D-2D matches with
outliers."""
import jax
import jax.numpy as jnp
import numpy as np

from hslam_tpu.ops.pnp import solve_pnp
from hslam_tpu.utils import lie


def test_pnp_recovers_pose_with_outliers():
    key = jax.random.PRNGKey(0)
    N = 120
    fx = fy = 150.0
    cx, cy = 95.5, 63.5
    K = jnp.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])

    X = jnp.stack(
        [jax.random.uniform(key, (N,), minval=-2, maxval=2),
         jax.random.uniform(jax.random.fold_in(key, 1), (N,), minval=-1.5, maxval=1.5),
         jax.random.uniform(jax.random.fold_in(key, 2), (N,), minval=3.0, maxval=8.0)],
        -1,
    )
    xi = jnp.array([0.2, -0.1, 0.15, 0.05, -0.08, 0.03])
    R_gt, t_gt = lie.se3_exp(xi)
    Xc = X @ R_gt.T + t_gt
    u = fx * Xc[:, 0] / Xc[:, 2] + cx
    v = fy * Xc[:, 1] / Xc[:, 2] + cy
    obs = jnp.stack([u, v], -1)
    obs = obs + jax.random.normal(jax.random.fold_in(key, 3), obs.shape) * 0.5
    # 25% outliers
    n_out = N // 4
    bad = jax.random.uniform(jax.random.fold_in(key, 4), (n_out, 2)) * 150.0
    obs = obs.at[:n_out].set(bad)

    res = solve_pnp(X, obs, jnp.ones(N, bool), K, jax.random.PRNGKey(9))
    assert bool(res.ok)
    dR = np.asarray(res.R) @ np.asarray(R_gt).T
    ang = np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1))
    # a relocalization seed needs ~1 deg / few-cm accuracy (the tracker
    # refines photometrically afterwards)
    assert ang < 0.02, f"rotation error {ang}"
    np.testing.assert_allclose(np.asarray(res.t), np.asarray(t_gt), atol=0.08)
    # outliers rejected
    assert int(np.asarray(res.inliers)[:n_out].sum()) < n_out // 4
