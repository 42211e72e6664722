"""Distributed BA: point-sharded step on the virtual 8-device CPU mesh must
(a) run, and (b) produce the same camera system as the single-device path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from hslam_tpu.config import CPARS
from hslam_tpu.models import window as W
from hslam_tpu.ops import ba


def test_sharded_step_matches_single_device():
    from test_ba import make_synthetic_window, _lin_and_sys
    from hslam_tpu.parallel.dist_ba import sharded_ba_step
    from hslam_tpu.models.optimizer import (
        _prior_vectors, _slot_mask, _stitched_delta, solve_camera_system,
    )

    wnd, calib, cfg = make_synthetic_window()
    devices = np.array(jax.devices()[:8])
    mesh = Mesh(devices, ("points",))

    rmse, new_state, d_step = sharded_ba_step(mesh, wnd, calib, cfg)
    assert np.isfinite(float(rmse))

    # single-device reference: one GN step with identical algebra
    lin, active, AH, AT, sys = _lin_and_sys(wnd, calib, cfg)
    pt_active = (wnd.points.status == W.PT_ACTIVE) & (jnp.sum(active, 1) > 0)
    H_sc, b_sc, HdiF = ba.schur_complement(sys, wnd.points.prior, pt_active)
    delta = _stitched_delta(wnd.frames, calib)
    prior_diag, prior_b = _prior_vectors(wnd.frames, calib, cfg)
    ns_proj = ba.nullspace_projector(ba.nullspaces(wnd.frames),
                                     cfg.solver_mode_delta)
    x = solve_camera_system(
        sys.H, sys.b, H_sc, b_sc, wnd.HM, wnd.bM, delta, prior_diag,
        prior_b, _slot_mask(wnd.frames), ns_proj, jnp.float32(cfg.fix_lambda),
        jnp.bool_(False), cfg,
    )
    F = cfg.max_frames
    expect_state = wnd.frames.state - (
        x[CPARS:].reshape(F, 8) * wnd.frames.valid[:, None]
    )
    # psum reduces in a different order than the single-device matmul; the
    # near-singular camera solve amplifies f32 rounding to the % level
    np.testing.assert_allclose(
        np.asarray(new_state), np.asarray(expect_state), rtol=5e-2, atol=1e-3
    )
    expect_d = ba.resubstitute(sys, HdiF, x)
    np.testing.assert_allclose(
        np.asarray(d_step), np.asarray(expect_d), rtol=5e-2, atol=2e-3
    )


def test_graft_dryrun():
    """The driver's multichip dry-run contract must hold on the CPU mesh."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)
