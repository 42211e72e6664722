"""Sim(3) / SE(3) pose-graph optimization.

Capability equivalent of the reference's vendored-but-unused g2o pose graph
(reference: Thirdparty/g2o, linked at CMakeLists.txt:38,111 — loop closure
and pose-graph relaxation are declared capabilities with no active code,
SURVEY.md §0). Design is TPU-first:

  * states: (N, 7) sim3 tangent coordinates of world-to-keyframe poses,
    updated by left-multiplied increments;
  * edges: (E,) index pairs with sim3 measurements (relative constraints);
  * residuals r_e = log_sim3( S_meas_e^-1 * S_i * S_j^-1 ) evaluated
    batched; Jacobians by jax.jacfwd of the batched residual closure
    (dense autodiff — exact, compiled once);
  * Gauss-Newton with diagonal damping; dense solve for windows up to
    ~1000 keyframes (7N x 7N), gauge fixed by pinning the first keyframe.

For scale-drift-correcting monocular loop closure (Strasdat-style), edges
are Sim3; with fix_scale=True the sigma component is pinned to zero and
the same machinery does SE3 relaxation.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils import lie


class PoseGraph(NamedTuple):
    # states: world-to-kf sim3 as (s (N,), R (N,3,3), t (N,3))
    s: jnp.ndarray
    R: jnp.ndarray
    t: jnp.ndarray
    valid: jnp.ndarray        # (N,)
    # edges
    edge_i: jnp.ndarray       # (E,) int32
    edge_j: jnp.ndarray       # (E,)
    meas_s: jnp.ndarray       # (E,) measured S_ij = S_i * S_j^-1
    meas_R: jnp.ndarray       # (E, 3, 3)
    meas_t: jnp.ndarray       # (E, 3)
    weight: jnp.ndarray       # (E,) edge weights


def residuals(pg: PoseGraph, delta: jnp.ndarray) -> jnp.ndarray:
    """(E, 7) residuals at states perturbed by delta (N, 7):
    S_i' = exp(delta_i) * S_i."""
    ds, dR, dt = lie.sim3_exp(delta)
    s = pg.s * ds
    R = dR @ pg.R
    t = ds[:, None] * jnp.einsum("nij,nj->ni", dR, pg.t) + dt

    si, Ri, ti = s[pg.edge_i], R[pg.edge_i], t[pg.edge_i]
    sj, Rj, tj = s[pg.edge_j], R[pg.edge_j], t[pg.edge_j]
    sji, Rji, tji = lie.sim3_inverse(sj, Rj, tj)
    s_ij, R_ij, t_ij = lie.sim3_mul(si, Ri, ti, sji, Rji, tji)
    # error = meas^-1 * S_ij
    sm, Rm, tm = lie.sim3_inverse(pg.meas_s, pg.meas_R, pg.meas_t)
    se, Re, te = lie.sim3_mul(sm, Rm, tm, s_ij, R_ij, t_ij)
    return lie.sim3_log(se, Re, te)


@partial(jax.jit, static_argnames=("n_iters", "fix_scale"))
def optimize_pose_graph(pg: PoseGraph, n_iters: int = 10,
                        lam: float = 1e-6, fix_scale: bool = False):
    """Batched GN with autodiff Jacobians. Returns updated (s, R, t)."""
    N = pg.s.shape[0]

    def gn_step(pg: PoseGraph):
        delta0 = jnp.zeros((N, 7))

        def res_flat(delta):
            r = residuals(pg, delta)
            return (r * jnp.sqrt(pg.weight)[:, None]).reshape(-1)

        r0 = res_flat(delta0)
        J = jax.jacfwd(res_flat)(delta0).reshape(-1, N * 7)   # (7E, 7N)

        # gauge: pin keyframe 0 (all 7 dims); invalid nodes pinned too
        pin = jnp.zeros(N, bool).at[0].set(True) | ~pg.valid
        mask = jnp.repeat(~pin, 7).astype(jnp.float32)
        if fix_scale:
            scale_dims = (jnp.arange(N * 7) % 7) == 6
            mask = mask * (1.0 - scale_dims.astype(jnp.float32))
        J = J * mask[None, :]

        H = J.T @ J
        b = J.T @ r0
        H = H + jnp.diag(jnp.maximum(jnp.diag(H) * lam, 1e-8) + (1.0 - mask))
        dx = -jnp.linalg.solve(H, b)
        dx = (dx * mask).reshape(N, 7)

        ds, dR, dt = lie.sim3_exp(dx)
        s_new = pg.s * ds
        R_new = dR @ pg.R
        t_new = ds[:, None] * jnp.einsum("nij,nj->ni", dR, pg.t) + dt
        return pg._replace(s=s_new, R=R_new, t=t_new)

    def body(_, pg):
        return gn_step(pg)

    pg = jax.lax.fori_loop(0, n_iters, body, pg)
    return pg.s, pg.R, pg.t


def make_graph(s, R, t, valid, edge_i, edge_j, meas, weight=None) -> PoseGraph:
    """meas: tuple (s (E,), R (E,3,3), t (E,3)) of measured S_i * S_j^-1."""
    E = edge_i.shape[0]
    if weight is None:
        weight = jnp.ones(E)
    return PoseGraph(
        s=jnp.asarray(s), R=jnp.asarray(R), t=jnp.asarray(t),
        valid=jnp.asarray(valid),
        edge_i=jnp.asarray(edge_i, jnp.int32),
        edge_j=jnp.asarray(edge_j, jnp.int32),
        meas_s=jnp.asarray(meas[0]), meas_R=jnp.asarray(meas[1]),
        meas_t=jnp.asarray(meas[2]), weight=jnp.asarray(weight),
    )
