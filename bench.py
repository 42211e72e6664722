"""Benchmark: steady-state SLAM pipeline throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload (reference envelope, BASELINE.md): 640x480 mono, 6-level tracker
pyramid, 2048 active points, 8-frame window, 6 GN iterations per KF,
2048-candidate epipolar trace per frame. Steady-state per-frame cost =
prep + track + trace + (BA + template rebuild) amortized at 1 KF per 5
frames — the reference's typical KF rate. Baseline: 2x real-time at 20 fps
input (north star: > 2x real-time on one v5e) => vs_baseline = fps / 40.

Timing methodology: every component is measured as N data-dependent
iterations chained inside ONE jitted lax.fori_loop with a forced scalar
read, differencing two loop lengths (utils/devtime.py). Anything else
(enqueue-N-then-block) is unreliable through the development TPU tunnel:
dispatch round-trip is ~20ms, block_until_ready does not block, and
repeated identical executions are deduplicated.
"""
import json
import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from hslam_tpu.config import PATTERN, Config
    from hslam_tpu.models import window as W
    from hslam_tpu.models.calib import level_intrinsics, make_calib
    from hslam_tpu.models.optimizer import ba_optimize
    from hslam_tpu.ops import epipolar as epi
    from hslam_tpu.ops import tracker as trk
    from hslam_tpu.ops.pyramid import build_direct_pyramid, image_gradients
    from hslam_tpu.utils import lie
    from hslam_tpu.utils.devtime import device_time
    from hslam_tpu.utils.interp import bilinear

    Hh, Ww = 480, 640
    cfg = Config(max_frames=8, max_points=2048, max_immature=2048, pyr_levels=6)
    calib = make_calib(320.0, 320.0, Ww / 2 - 0.5, Hh / 2 - 0.5, Ww, Hh)

    key = jax.random.PRNGKey(0)
    ys, xs = jnp.mgrid[0:Hh, 0:Ww]
    I0 = (120.0 + 50.0 * jnp.sin(0.09 * xs) * jnp.cos(0.11 * ys)
          + 30.0 * jnp.sin(0.031 * xs + 0.57 * jnp.cos(0.021 * ys))).astype(jnp.float32)

    xi_gt = jnp.array([0.05, -0.02, 0.01, 0.004, -0.006, 0.002])
    R_gt, t_gt = lie.se3_exp(xi_gt)

    # warped second image (plane at depth 2)
    depth = 2.0
    fx, fy, cx, cy = 320.0, 320.0, Ww / 2 - 0.5, Hh / 2 - 0.5
    px = (xs - cx) / fx
    py = (ys - cy) / fy
    Rinv, tinv = lie.se3_inverse(R_gt, t_gt)
    dz = Rinv[2, 0] * px + Rinv[2, 1] * py + Rinv[2, 2]
    s = (depth - tinv[2]) / dz
    Xw = s * (Rinv[0, 0] * px + Rinv[0, 1] * py + Rinv[0, 2]) + tinv[0]
    Yw = s * (Rinv[1, 0] * px + Rinv[1, 1] * py + Rinv[1, 2]) + tinv[1]
    I1 = bilinear(I0, fx * Xw / depth + cx, fy * Yw / depth + cy)

    pyr0, _ = jax.jit(lambda im: build_direct_pyramid(im, cfg.pyr_levels))(I0)

    P = cfg.max_points
    u = jax.random.uniform(key, (P,), minval=8.0, maxval=Ww - 8.0)
    v = jax.random.uniform(jax.random.fold_in(key, 1), (P,), minval=8.0, maxval=Hh - 8.0)
    tmpl = jax.jit(trk.build_template)(
        u, v, jnp.full(P, 0.5), jnp.ones(P), jnp.ones(P, bool), pyr0)
    K_pyr = jnp.stack([level_intrinsics(calib, l) for l in range(cfg.pyr_levels)])
    pat = jnp.asarray(PATTERN, jnp.float32)

    # --- prep (pyramid + gradients)
    def prep_body(img):
        pyr, grads = build_direct_pyramid(img, cfg.pyr_levels)
        sc = pyr[-1][0, 0, 0] + grads[0][5, 5]
        return img + sc * 1e-30, sc

    t_prep = device_time(prep_body, I1, 3, 13)

    # --- prep + track (the tracker needs the fresh pyramid)
    def track_body(img):
        pyr, _ = build_direct_pyramid(img, cfg.pyr_levels)
        r = trk.track_coarse(
            tmpl, pyr, K_pyr, jnp.eye(3), jnp.zeros(3), jnp.zeros(2),
            jnp.float32(1.0), jnp.float32(1.0), jnp.zeros(2), cfg)
        sc = r.t[0] + r.residuals[0]
        return img + sc * 1e-30, sc

    t_track = max(device_time(track_body, I1, 3, 13) - t_prep, 0.0)

    # --- epipolar trace of all immature candidates
    trace_state = epi.init_trace_state(cfg.max_immature)
    ui = jax.random.uniform(jax.random.fold_in(key, 2), (cfg.max_immature,),
                            minval=8.0, maxval=Ww - 8.0)
    vi = jax.random.uniform(jax.random.fold_in(key, 3), (cfg.max_immature,),
                            minval=8.0, maxval=Hh - 8.0)
    colors = bilinear(I0, ui[:, None] + pat[None, :, 0], vi[:, None] + pat[None, :, 1])
    K = jnp.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1.0]])
    KRKi = jnp.broadcast_to(K @ R_gt @ jnp.linalg.inv(K), (cfg.max_immature, 3, 3))
    Kt = jnp.broadcast_to(K @ t_gt, (cfg.max_immature, 3))
    affs = jnp.broadcast_to(jnp.array([1.0, 0.0]), (cfg.max_immature, 2))
    gradH = jnp.broadcast_to(jnp.eye(2) * 100.0, (cfg.max_immature, 2, 2))
    eth = jnp.full(cfg.max_immature, 8 * 144.0)
    pyr1_l0, _ = jax.jit(lambda im: build_direct_pyramid(im, 1))(I1)

    def trace_body(img):
        ts2 = epi.trace_on(
            trace_state, ui, vi, colors, jnp.ones((cfg.max_immature, 8)),
            gradH, eth, jnp.ones(cfg.max_immature, bool), KRKi, Kt, affs, img, cfg)
        sc = ts2.idepth_min[0] + ts2.idepth_max[1]
        return img + sc * 1e-30, sc

    t_trace = device_time(trace_body, pyr1_l0[0], 3, 13)

    # --- tracker template rebuild (per KF)
    def tmpl_body(uu):
        tm = trk.build_template(uu, v, jnp.full(P, 0.5), jnp.ones(P),
                                jnp.ones(P, bool), pyr0)
        sc = tm.idepth[0][0] + tm.u[1][3]
        return uu + sc * 1e-30, sc

    t_tmpl = device_time(tmpl_body, u, 3, 13)

    # --- windowed BA, 6 GN iterations (per KF)
    wnd = W.empty_window(cfg, Hh, Ww)
    F = cfg.max_frames
    xi_all = jax.random.normal(jax.random.fold_in(key, 5), (F, 6)) * jnp.array(
        [0.05] * 3 + [0.01] * 3)
    xi_all = xi_all.at[0].set(0.0)
    R_all, t_all = lie.se3_exp(xi_all)
    dx0, dy0 = image_gradients(I0)
    img_stack = jnp.stack([jnp.stack([I0, dx0, dy0], -1)] * F)
    frames = wnd.frames._replace(
        valid=jnp.ones(F, bool), evalpt_R=R_all, evalpt_t=t_all,
        kf_id=jnp.arange(F, dtype=jnp.int32), images=img_stack,
        prior=jnp.stack([jnp.asarray(W.first_frame_prior(cfg))]
                        + [jnp.asarray(W.later_frame_prior(cfg))] * (F - 1)))
    points = wnd.points._replace(
        status=jnp.ones(P, jnp.int32), host=jnp.zeros(P, jnp.int32),
        u=u, v=v, idepth=jnp.full(P, 0.5), idepth_zero=jnp.full(P, 0.5),
        color=bilinear(I0, u[:, None] + pat[None, :, 0], v[:, None] + pat[None, :, 1]),
        weight=jnp.ones((P, 8)))
    wnd = W.Window(frames=frames, points=points, HM=wnd.HM, bM=wnd.bM)

    def ba_body(w):
        out = ba_optimize(w, calib, cfg, 6)
        sc = out.rmse
        w2 = w._replace(frames=w.frames._replace(state=w.frames.state + sc * 1e-30))
        return w2, sc

    t_ba = device_time(ba_body, wnd, 2, 7)

    per_frame = t_prep + t_track + t_trace
    per_kf = t_ba + t_tmpl
    kf_every = 5.0
    steady = per_frame + per_kf / kf_every
    fps = 1.0 / steady

    sys.stderr.write(
        f"prep {t_prep*1e3:.2f}ms track {t_track*1e3:.2f}ms "
        f"trace {t_trace*1e3:.2f}ms ba {t_ba*1e3:.2f}ms tmpl {t_tmpl*1e3:.2f}ms "
        f"-> steady {steady*1e3:.2f}ms/frame\n"
    )
    print(json.dumps({
        "metric": "steady_state_pipeline_fps_640x480",
        "value": round(fps, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / 40.0, 3),
    }))


if __name__ == "__main__":
    main()
