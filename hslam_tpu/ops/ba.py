"""Windowed photometric bundle adjustment — device kernels.

The numeric heart of the framework: TPU-native re-design of the reference's
EnergyFunctional machinery:

  * residual linearization  (Src/OptimizationClasses.cpp:43-233)
  * pair-block Hessian accumulation + adjoint stitch
    (Src/AccumulatedTopHessian.cpp, Src/EnergyFunctional.cpp:22-82)
  * Schur complement over inverse depths (Src/AccumulatedSCHessian.cpp)
  * camera-system solve + nullspace orthogonalization
    (Src/EnergyFunctional.cpp:648-817)
  * back-substitution of idepth steps (Src/EnergyFunctional.cpp:222-274)

Design: instead of the reference's per-(host,target) 13x13 AccumulatorApprox
arrays stitched through adjoint maps, each residual gets a 4-row
*basis* in the absolute state space:

    rows = [pixel-x, pixel-y, a_rel, b_rel],  U in R^{4 x D}, D = 4 + 8 F

with per-pattern coefficients C in R^{8 x 4} = [JIdx | JabF]. The full
Gauss-Newton system is then

    H = sum_r U_r^T (C_r^T C_r) U_r ,   b = sum_r U_r^T C_r^T res_r

— one large MXU matmul over all residuals, mathematically identical to the
reference's update/stitchDouble path (the 13x13 'AccumulatorApprox' is
exactly C^T C in a factored basis). Idepth columns factor the same way,
giving the per-point scalars Hdd, bd, Hcd and the cross vector g_p used by
the Schur complement: H_sc = sum_p g_p g_p^T / (Hdd_p + prior_p).

All quantities are kept in the reference's SOLVER units (state scaling
folded into Jacobians / adjoints) so priors, lambda handling and
marginalization match numerically.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import (
    CPARS,
    FRAME_STATE_SCALE,
    PATTERN,
    PATTERN_NUM,
    SCALE_C,
    SCALE_F,
    Config,
)
from ..models import window as W
from ..models.calib import Calib
from ..utils import lie


# ---------------------------------------------------------------------------
# adjoints: relative (host->target) 8-dof tangent -> absolute frame states
# (reference: EnergyFunctional::setAdjointsF, EnergyFunctional.cpp:22-82)
# ---------------------------------------------------------------------------


def compute_adjoints(frames: W.Frames) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (AH, AT): (F, F, 8, 8) with AH[h, t] = adHost, AT[h, t] =
    adTarget, rows scaled by the solver preconditioner exactly as the
    reference (EnergyFunctional.cpp:51-58)."""
    F = frames.valid.shape[0]
    R0, t0 = frames.evalpt_R, frames.evalpt_t

    # hostToTarget[h, t] = evalPT_t * evalPT_h^-1
    Rh_inv, th_inv = lie.se3_inverse(R0, t0)
    R_ht = R0[None, :, :, :] @ Rh_inv[:, None, :, :]
    t_ht = jnp.einsum("tij,hj->hti", R0, th_inv) + t0[None, :, :]

    Adj = lie.se3_adjoint(R_ht, t_ht)  # (F, F, 6, 6)

    aff0 = (frames.state_zero * jnp.asarray(FRAME_STATE_SCALE))[:, 6:8]
    exp_ = jnp.where(frames.exposure == 0, 1.0, frames.exposure)
    # a_rel[h, t] = exp(a0_t - a0_h) * exp_t / exp_h  (GlobalTypes.h:334-346)
    a_rel = jnp.exp(aff0[None, :, 0] - aff0[:, None, 0]) * (exp_[None, :] / exp_[:, None])

    AH = jnp.zeros((F, F, 8, 8), jnp.float32)
    AT = jnp.zeros((F, F, 8, 8), jnp.float32)
    AH = AH.at[:, :, :6, :6].set(-jnp.swapaxes(Adj, -1, -2))
    AT = AT.at[:, :, :6, :6].set(jnp.eye(6))
    AH = AH.at[:, :, 6, 6].set(a_rel)
    AH = AH.at[:, :, 7, 7].set(a_rel)
    AT = AT.at[:, :, 6, 6].set(-a_rel)
    AT = AT.at[:, :, 7, 7].set(-1.0)

    row_scale = jnp.asarray(FRAME_STATE_SCALE)[:, None]
    return AH * row_scale, AT * row_scale


# ---------------------------------------------------------------------------
# linearization
# ---------------------------------------------------------------------------


class Linearization(NamedTuple):
    """Per-residual (P, F) factored Jacobians, reference RawResidualJacobian
    (Include/OptimizationClasses.h:48-77)."""

    Jpdc: jnp.ndarray      # (P, F, 2, 4) pixel wrt calib (SCALE_F/C folded in)
    Jpdxi: jnp.ndarray     # (P, F, 2, 6) pixel wrt relative pose (natural)
    Jpdd: jnp.ndarray      # (P, F, 2)   pixel wrt idepth
    JIdx: jnp.ndarray      # (P, F, 8, 2) weighted image gradient at pattern px
    JabF: jnp.ndarray      # (P, F, 8, 2) weighted affine jacobian
    resF: jnp.ndarray      # (P, F, 8)   weighted residuals
    energy: jnp.ndarray    # (P, F) robust energy (capped for OUT)
    energy_raw: jnp.ndarray  # (P, F) state_NewEnergyWithOutlier (-1 if OOB)
    new_state: jnp.ndarray   # (P, F) proposed residual state (IN/OOB/OUT)
    center_u: jnp.ndarray    # (P, F) center projection (current state)
    center_v: jnp.ndarray
    center_idepth: jnp.ndarray


def linearize(
    frames: W.Frames,
    points: W.Points,
    calib: Calib,
    cfg: Config,
) -> Linearization:
    """Relinearize every (point, target-frame) residual at the current state
    with first-estimate (FEJ) geometric Jacobians.

    Mirrors PointFrameResidual::linearize (OptimizationClasses.cpp:43-233):
    geometric Jacobians at (evalPT poses, idepth_zero); intensity residuals
    at (current poses, current idepth, current affine).
    """
    F = frames.valid.shape[0]
    P = points.u.shape[0]
    Hh, Ww = frames.images.shape[1], frames.images.shape[2]

    fx, fy, cx, cy = calib.value[0], calib.value[1], calib.value[2], calib.value[3]

    # --- per-(h,t) precalc (FrameFramePrecalc::set, OptimizationClasses.cpp:13-39)
    R_cur, t_cur = W.frame_poses(frames)             # current worldToCam
    R0, t0 = frames.evalpt_R, frames.evalpt_t        # FEJ worldToCam
    aff = W.frame_affine(frames)
    aff0 = W.frame_affine_zero(frames)
    exp_ = jnp.where(frames.exposure == 0, 1.0, frames.exposure)

    def rel(Ra, ta, Rb, tb):
        # T_ab[h, t] = T_b[t] * T_a[h]^-1  (host h -> target t)
        Ri, ti = lie.se3_inverse(Ra, ta)
        Rr = Rb[None] @ Ri[:, None]
        tr = jnp.einsum("tij,hj->hti", Rb, ti) + tb[None]
        return Rr, tr

    PRE_R0, PRE_t0 = rel(R0, t0, R0, t0)             # (F,F,3,3),(F,F,3) FEJ
    PRE_R, PRE_t = rel(R_cur, t_cur, R_cur, t_cur)   # current

    a_rel = jnp.exp(aff[None, :, 0] - aff[:, None, 0]) * (exp_[None, :] / exp_[:, None])
    b_rel = aff[None, :, 1] - a_rel * aff[:, None, 1]
    b0_host = aff0[:, 1]                              # PRE_b0_mode per host

    # gather per-point host quantities
    h_idx = points.host
    Rr0 = PRE_R0[h_idx]       # (P, F, 3, 3)
    tr0 = PRE_t0[h_idx]       # (P, F, 3)
    Rr = PRE_R[h_idx]
    tr = PRE_t[h_idx]
    a_pf = a_rel[h_idx]       # (P, F)
    b_pf = b_rel[h_idx]
    b0_p = b0_host[h_idx]     # (P,)

    # --- FEJ center projection (OptimizationClasses.cpp:70-122)
    KliP = jnp.stack(
        [(points.u - cx) / fx, (points.v - cy) / fy, jnp.ones_like(points.u)],
        axis=-1,
    )  # (P, 3)
    ptp0 = jnp.einsum("pfij,pj->pfi", Rr0, KliP) + tr0 * points.idepth_zero[:, None, None]
    drescale = 1.0 / jnp.where(jnp.abs(ptp0[..., 2]) < 1e-12, 1e-12, ptp0[..., 2])
    new_idepth0 = points.idepth_zero[:, None] * drescale
    u_n = ptp0[..., 0] * drescale
    v_n = ptp0[..., 1] * drescale
    Ku0 = u_n * fx + cx
    Kv0 = v_n * fy + cy
    fej_ok = (
        (drescale > 0)
        & (Ku0 > 1.1) & (Kv0 > 1.1) & (Ku0 < Ww - 3) & (Kv0 < Hh - 3)
    )

    # idepth jacobian (OptimizationClasses.cpp:85-86)
    d_d_x = drescale * (tr0[..., 0] - tr0[..., 2] * u_n) * fx
    d_d_y = drescale * (tr0[..., 1] - tr0[..., 2] * v_n) * fy
    Jpdd = jnp.stack([d_d_x, d_d_y], axis=-1)  # (P, F, 2)

    # calib jacobian (OptimizationClasses.cpp:88-107), SCALE_F/SCALE_C folded
    R00, R01 = Rr0[..., 0, 0], Rr0[..., 0, 1]
    R10, R11 = Rr0[..., 1, 0], Rr0[..., 1, 1]
    R20, R21 = Rr0[..., 2, 0], Rr0[..., 2, 1]
    dCx2 = drescale * (R20 * u_n - R00)
    dCx3 = fx * drescale * (R21 * u_n - R01) / fy
    dCx0 = KliP[:, None, 0] * dCx2
    dCx1 = KliP[:, None, 1] * dCx3
    dCy2 = fy * drescale * (R20 * v_n - R10) / fx
    dCy3 = drescale * (R21 * v_n - R11)
    dCy0 = KliP[:, None, 0] * dCy2
    dCy1 = KliP[:, None, 1] * dCy3
    Jpdc = jnp.stack(
        [
            jnp.stack([(dCx0 + u_n) * SCALE_F, dCx1 * SCALE_F,
                       (dCx2 + 1.0) * SCALE_C, dCx3 * SCALE_C], axis=-1),
            jnp.stack([dCy0 * SCALE_F, (dCy1 + v_n) * SCALE_F,
                       dCy2 * SCALE_C, (dCy3 + 1.0) * SCALE_C], axis=-1),
        ],
        axis=-2,
    )  # (P, F, 2, 4)

    # pose jacobian (OptimizationClasses.cpp:109-121), natural units
    zero = jnp.zeros_like(u_n)
    Jpdxi = jnp.stack(
        [
            jnp.stack([new_idepth0 * fx, zero, -new_idepth0 * u_n * fx,
                       -u_n * v_n * fx, (1.0 + u_n * u_n) * fx, -v_n * fx], axis=-1),
            jnp.stack([zero, new_idepth0 * fy, -new_idepth0 * v_n * fy,
                       -(1.0 + v_n * v_n) * fy, u_n * v_n * fy, u_n * fy], axis=-1),
        ],
        axis=-2,
    )  # (P, F, 2, 6)

    # --- current-state pattern projection + residuals
    # (OptimizationClasses.cpp:141-204)
    # project all 8 pattern pixels: pt = R K^-1 (u+dx, v+dy, 1) + t * id
    pat = jnp.asarray(PATTERN, jnp.float32)  # (8, 2)
    up = points.u[:, None] + pat[None, :, 0]   # (P, 8)
    vp = points.v[:, None] + pat[None, :, 1]
    # K^-1 (u, v, 1)
    xh = (up - cx) / fx
    yh = (vp - cy) / fy
    # R Kinv p  -> (P, F, 8, 3)
    dirs = jnp.stack([xh, yh, jnp.ones_like(xh)], axis=-1)       # (P, 8, 3)
    rot = jnp.einsum("pfij,pkj->pfki", Rr, dirs)
    ptp = rot + tr[:, :, None, :] * points.idepth[:, None, None, None]
    z = jnp.where(jnp.abs(ptp[..., 2]) < 1e-12, 1e-12, ptp[..., 2])
    Ku = fx * ptp[..., 0] / z + cx     # (P, F, 8)
    Kv = fy * ptp[..., 1] / z + cy
    proj_ok = (Ku > 1.1) & (Kv > 1.1) & (Ku < Ww - 3) & (Kv < Hh - 3)

    # center projection at current state (pattern index 4 is (0,0))
    center_u = Ku[..., 4]
    center_v = Kv[..., 4]
    center_idepth = points.idepth[:, None] / z[..., 4]

    # gather target intensities + precomputed gradients, per frame; packed
    # 2x2 cells make each bilinear sample one row gather (utils.interp)
    from ..utils.interp import pack_cells

    def gather_frame(img, KuF, KvF):
        # img (H, W, 3); KuF/KvF (P, 8)
        packed = jnp.stack([pack_cells(img[..., c]) for c in range(3)], axis=2)
        Kuc = jnp.clip(KuF, 0.0, Ww - 1.001)
        Kvc = jnp.clip(KvF, 0.0, Hh - 1.001)
        ix = jnp.clip(jnp.floor(Kuc).astype(jnp.int32), 0, Ww - 2)
        iy = jnp.clip(jnp.floor(Kvc).astype(jnp.int32), 0, Hh - 2)
        dxf = Kuc - ix
        dyf = Kvc - iy
        cells = packed.reshape(Hh * Ww, 3, 4)[iy * Ww + ix]   # (P, 8, 3, 4)
        wx = dxf[..., None]
        wy = dyf[..., None]
        top = cells[..., 0] * (1 - wx) + cells[..., 1] * wx
        bot = cells[..., 2] * (1 - wx) + cells[..., 3] * wx
        return top * (1 - wy) + bot * wy

    hit = jax.vmap(gather_frame, in_axes=(0, 1, 1), out_axes=1)(
        frames.images, Ku, Kv
    )  # (P, F, 8, 3)
    hit_I, hit_dx, hit_dy = hit[..., 0], hit[..., 1], hit[..., 2]

    residual = hit_I - (a_pf[..., None] * points.color[:, None, :] + b_pf[..., None])
    drdA = points.color[:, None, :] - b0_p[:, None, None]       # (P, F, 8)

    # weights (OptimizationClasses.cpp:163-164)
    c_w = cfg.outlier_th_sum_component
    w_grad = jnp.sqrt(c_w / (c_w + hit_dx**2 + hit_dy**2))
    w = 0.5 * (w_grad + points.weight[:, None, :])

    abs_r = jnp.abs(residual)
    hw = jnp.where(abs_r < cfg.huber_th, 1.0, cfg.huber_th / jnp.maximum(abs_r, 1e-12))
    energy_terms = w * w * hw * residual * residual * (2.0 - hw)

    hw_j = jnp.where(hw < 1.0, jnp.sqrt(hw), hw) * w

    JIdx = jnp.stack([hit_dx * hw_j, hit_dy * hw_j], axis=-1)    # (P, F, 8, 2)
    JabF = jnp.stack([drdA * hw_j, hw_j], axis=-1)               # (P, F, 8, 2)
    resF = residual * hw_j

    wJI2 = jnp.sum((hw_j * hit_dx) ** 2 + (hw_j * hit_dy) ** 2, axis=-1)

    # --- state machine (OptimizationClasses.cpp:219-231)
    oob = (
        ~fej_ok
        | ~jnp.all(proj_ok, axis=-1)
        | ~jnp.all(jnp.isfinite(hit_I), axis=-1)
    )
    energy_raw = jnp.sum(energy_terms, axis=-1)
    th = jnp.maximum(frames.energy_th[h_idx][:, None], frames.energy_th[None, :])
    out = (energy_raw > th) | (wJI2 < 2.0)
    energy = jnp.where(out, th, energy_raw)
    new_state = jnp.where(
        oob, W.RES_OOB, jnp.where(out, W.RES_OUT, W.RES_IN)
    ).astype(jnp.int32)
    energy_raw = jnp.where(oob, -1.0, energy_raw)

    return Linearization(
        Jpdc=Jpdc, Jpdxi=Jpdxi, Jpdd=Jpdd,
        JIdx=JIdx, JabF=JabF, resF=resF,
        energy=energy, energy_raw=energy_raw, new_state=new_state,
        center_u=center_u, center_v=center_v, center_idepth=center_idepth,
    )


# ---------------------------------------------------------------------------
# accumulation
# ---------------------------------------------------------------------------


class GNSystem(NamedTuple):
    H: jnp.ndarray        # (D, D) absolute top Hessian (no priors/HM/SC)
    b: jnp.ndarray        # (D,)
    Hdd: jnp.ndarray      # (P,)
    bd: jnp.ndarray       # (P,)
    g: jnp.ndarray        # (P, D) idepth cross rows (calib part == Hcd)
    num_res: jnp.ndarray  # () number of active residuals


def accumulate(
    lin: Linearization,
    active: jnp.ndarray,      # (P, F) bool — residuals to accumulate
    host: jnp.ndarray,        # (P,) host slot
    AH: jnp.ndarray,          # (F, F, 8, 8)
    AT: jnp.ndarray,
    n_frames: int,
) -> GNSystem:
    """Assemble the absolute GN system from factored Jacobians in one MXU
    pass (replaces AccumulatedTopHessianSSE addPoint + stitchDouble and the
    per-point parts of AccumulatedSCHessianSSE::addPoint)."""
    P, F = active.shape
    D = CPARS + 8 * F

    m = active.astype(jnp.float32)

    # basis coefficients C (P, F, 8, 4) and products
    C = jnp.concatenate([lin.JIdx, lin.JabF], axis=-1)          # (P, F, 8, 4)
    M = jnp.einsum("pfka,pfkb->pfab", C, C)                     # (P, F, 4, 4)
    mvec = jnp.einsum("pfka,pfk->pfa", C, lin.resF)             # (P, F, 4)

    # relative-state basis rows B_rel (P, F, 4, 8):
    #   rows 0, 1: [Jpdxi, 0, 0]; row 2: e_a; row 3: e_b
    B_rel = jnp.zeros((P, F, 4, 8), jnp.float32)
    B_rel = B_rel.at[:, :, 0:2, 0:6].set(lin.Jpdxi)
    B_rel = B_rel.at[:, :, 2, 6].set(1.0)
    B_rel = B_rel.at[:, :, 3, 7].set(1.0)

    # map to absolute host/target blocks: U_h = B_rel @ AH[h, t]^T
    AH_pf = AH[host]          # (P, F, 8, 8)
    AT_pf = AT[host]
    U_h = jnp.einsum("pfkr,pfsr->pfks", B_rel, AH_pf)           # (P, F, 4, 8)
    U_t = jnp.einsum("pfkr,pfsr->pfks", B_rel, AT_pf)

    # calib block rows
    U_c = jnp.zeros((P, F, 4, CPARS), jnp.float32)
    U_c = U_c.at[:, :, 0:2, :].set(lin.Jpdc)

    # scatter into the absolute basis U (P, F, 4, D)
    host_onehot = jax.nn.one_hot(host, F, dtype=jnp.float32)    # (P, F)
    eyeF = jnp.eye(F, dtype=jnp.float32)
    U_frames = (
        jnp.einsum("pg,pfks->pfkgs", host_onehot, U_h)
        + jnp.einsum("fg,pfks->pfkgs", eyeF, U_t)
    ).reshape(P, F, 4, 8 * F)
    U = jnp.concatenate([U_c, U_frames], axis=-1)               # (P, F, 4, D)

    # mask inactive residuals
    Mw = M * m[..., None, None]
    mw = mvec * m[..., None]

    # H = sum U^T M U ; b = sum U^T m  — single large matmuls
    WU = jnp.einsum("pfab,pfbd->pfad", Mw, U)                   # (P, F, 4, D)
    Uf = U.reshape(-1, D)
    WUf = WU.reshape(-1, D)
    H = Uf.T @ WUf                                              # (D, D)
    b = jnp.einsum("pfkd,pfk->d", U, mw)

    # idepth basis coefficients
    V_d = jnp.concatenate(
        [lin.Jpdd, jnp.zeros((P, F, 2), jnp.float32)], axis=-1
    )  # (P, F, 4)
    MV = jnp.einsum("pfab,pfb->pfa", Mw, V_d)                   # (P, F, 4)
    Hdd = jnp.einsum("pfa,pfa->p", V_d, MV)
    bd = jnp.einsum("pfa,pfa->p", V_d, mw)
    g = jnp.einsum("pfkd,pfk->pd", U, MV)                       # (P, D)

    return GNSystem(
        H=H, b=b, Hdd=Hdd, bd=bd, g=g,
        num_res=jnp.sum(m),
    )


def schur_complement(sys: GNSystem, point_prior: jnp.ndarray,
                     point_active: jnp.ndarray):
    """H_sc, b_sc, HdiF (AccumulatedSCHessian.cpp:10-52, stitch :54-195)."""
    Hdd_total = sys.Hdd + point_prior
    HdiF = jnp.where(point_active, 1.0 / jnp.maximum(Hdd_total, 1e-10), 0.0)
    gw = sys.g * HdiF[:, None]
    H_sc = sys.g.T @ gw
    b_sc = gw.T @ sys.bd
    return H_sc, b_sc, HdiF


def resubstitute(sys: GNSystem, HdiF: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Per-point idepth steps: step_p = -HdiF_p (bd_p - g_p . x)
    (EnergyFunctional::resubstituteFPt, EnergyFunctional.cpp:249-274;
    note frame steps are -x so g.x enters with a minus)."""
    return -HdiF * (sys.bd - sys.g @ x)


# ---------------------------------------------------------------------------
# nullspaces + orthogonalization (FullSystemOptimize.cpp:616-670,
# EnergyFunctional.cpp:648-702)
# ---------------------------------------------------------------------------


def nullspaces(frames: W.Frames) -> jnp.ndarray:
    """(D, 7) stacked gauge directions: 6 rigid + 1 scale, in solver units.

    Per frame: nullspaces_pose = Adj(worldToCam_evalPT) (the reference
    computes this by central differences, Frame.h:151-166 — analytically it
    is the adjoint), nullspaces_scale = [t_evalPT, 0]."""
    F = frames.valid.shape[0]
    D = CPARS + 8 * F
    Adj = lie.se3_adjoint(frames.evalpt_R, frames.evalpt_t)   # (F, 6, 6)
    inv_scale = 1.0 / jnp.asarray(FRAME_STATE_SCALE[:6])

    ns = jnp.zeros((D, 7), jnp.float32)
    valid = frames.valid.astype(jnp.float32)
    for i in range(6):
        col = Adj[:, :, i] * inv_scale[None, :] * valid[:, None]   # (F, 6)
        pad = jnp.zeros((F, 2), jnp.float32)
        vec = jnp.concatenate([col, pad], axis=-1).reshape(-1)
        ns = ns.at[CPARS:, i].set(vec)
    scale_dir = jnp.concatenate(
        [frames.evalpt_t * inv_scale[None, :3] * valid[:, None],
         jnp.zeros((F, 5), jnp.float32)],
        axis=-1,
    ).reshape(-1)
    ns = ns.at[CPARS:, 6].set(scale_dir)
    return ns


def nullspace_projector(N: jnp.ndarray, svd_eps: float = 1e-5) -> jnp.ndarray:
    """(D, D) orthogonal projector onto span(N) via SVD pseudo-inverse
    (EnergyFunctional::orthogonalize, EnergyFunctional.cpp:648-702).
    Loop-invariant during one optimize() call — compute once, apply often
    (small-matrix SVDs are expensive on TPU)."""
    norms = jnp.linalg.norm(N, axis=0, keepdims=True)
    Nn = N / jnp.maximum(norms, 1e-12)
    U_, S, Vt = jnp.linalg.svd(Nn, full_matrices=False)
    S_max = jnp.max(S)
    S_inv = jnp.where(S > svd_eps * S_max, 1.0 / jnp.maximum(S, 1e-20), 0.0)
    proj = U_ @ ((S_inv * S)[:, None] * U_.T)
    return 0.5 * (proj + proj.T)


def orthogonalize(vec: jnp.ndarray, N: jnp.ndarray, svd_eps: float = 1e-5):
    """Project `vec` off the span of nullspace columns N."""
    return vec - nullspace_projector(N, svd_eps) @ vec
