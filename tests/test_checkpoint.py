"""Checkpoint/resume: a mid-sequence snapshot must restore bit-identical
state and continue producing identical trajectories (also serves as the
determinism test — the reference seeds its RNGs for reproducibility,
PixelSelector.cpp:21, Initializer.cpp:25; here determinism is structural)."""
import os
import tempfile

import numpy as np
import pytest

from test_system import H, W, FX, FY, CX, CY, make_texture, render

from hslam_tpu.config import Config
from hslam_tpu.utils import lie
import jax.numpy as jnp


CFG = Config(
    max_frames=6, max_points=256, max_immature=256, max_features=256,
    pyr_levels=3, init_min_matches=50, init_ransac_iters=100,
    desired_point_density=200.0, desired_immature_density=150.0,
    tracker_iters_per_level=(6, 10, 10),
)


def make_frames(n):
    I0 = make_texture()
    out = []
    for i in range(n):
        t = i / 10.0
        xi = jnp.array(
            [0.35 * np.sin(0.5 * t), 0.18 * (1 - np.cos(0.5 * t)), 0.05 * t,
             0.015 * np.sin(0.4 * t), 0.025 * t, 0.01 * np.sin(0.3 * t)]
        )
        R, tt = lie.se3_exp(xi)
        out.append(render(I0, R, tt))
    return out


@pytest.mark.slow
def test_checkpoint_roundtrip_and_determinism():
    from hslam_tpu.io.checkpoint import load_state, save_state
    from hslam_tpu.models.system import SLAMSystem

    frames = make_frames(16)

    # run A: straight through
    a = SLAMSystem(FX, FY, CX, CY, W, H, CFG)
    for i, img in enumerate(frames):
        a.process_frame(img, i / 10.0)

    # run B: snapshot at frame 10, restore into a fresh system, continue
    b1 = SLAMSystem(FX, FY, CX, CY, W, H, CFG)
    for i in range(10):
        b1.process_frame(frames[i], i / 10.0)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt.npz")
        save_state(path, b1)
        b2 = SLAMSystem(FX, FY, CX, CY, W, H, CFG)
        load_state(path, b2)
    for i in range(10, 16):
        b2.process_frame(frames[i], i / 10.0)

    assert a.initialized and b2.initialized
    assert a.next_kf_id == b2.next_kf_id, (a.next_kf_id, b2.next_kf_id)
    # trajectories identical (determinism + faithful restore)
    for sa, sb in zip(a.shells, b2.shells[: len(a.shells)]):
        np.testing.assert_allclose(
            sa.cam_to_world, sb.cam_to_world, atol=1e-5,
            err_msg=f"frame {sa.id}",
        )
