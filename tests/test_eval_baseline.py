"""BASELINE-eval driver path (scripts/eval_baseline.py) proven on a
generated EuRoC-layout ZIP fixture: dataset detection, zip decode,
geometric remap, the full-hybrid config run, GT association, and the ATE
report — so the one-command BASELINE table works the moment real
sequences are mounted (none exist in this environment)."""
import os
import sys
import zipfile

import numpy as np
import jax.numpy as jnp
import pytest

from hslam_tpu.config import Config
from hslam_tpu.utils import lie
from tests.test_system import FX, FY, CX, CY, H, W, make_texture, render

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))


def _write_euroc_zip(root, n_frames):
    """EuRoC-layout zip: images.zip!mav0/cam0/data/<ts_ns>.png, plus
    camera.txt and mav0/state_groundtruth_estimate0/data.csv on disk."""
    import cv2

    I0 = make_texture()
    os.makedirs(os.path.join(root, "mav0", "state_groundtruth_estimate0"))
    gt_rows = []
    zpath = os.path.join(root, "images.zip")
    with zipfile.ZipFile(zpath, "w") as zf:
        for i in range(n_frames):
            t = i / 10.0
            xi = jnp.array(
                [0.4 * np.sin(0.3 * t), 0.25 * (1 - np.cos(0.35 * t)),
                 0.12 * np.sin(0.2 * t),
                 0.03 * np.sin(0.25 * t), 0.03 * (1 - np.cos(0.2 * t)),
                 0.015 * t])
            R, tt = lie.se3_exp(xi)
            img = np.asarray(render(I0, R, tt))
            ok, buf = cv2.imencode(
                ".png", np.clip(img, 0, 255).astype(np.uint8))
            assert ok
            ts_ns = int(t * 1e9)
            zf.writestr(f"mav0/cam0/data/{ts_ns}.png", buf.tobytes())
            # GT: cam-to-world translation (camera center) per EuRoC csv
            Tcw = np.eye(4)
            Tcw[:3, :3], Tcw[:3, 3] = np.asarray(R), np.asarray(tt)
            C = np.linalg.inv(Tcw)[:3, 3]
            gt_rows.append(f"{ts_ns},{C[0]},{C[1]},{C[2]},1,0,0,0")
    with open(os.path.join(root, "mav0", "state_groundtruth_estimate0",
                           "data.csv"), "w") as f:
        f.write("#timestamp,px,py,pz,qw,qx,qy,qz\n")
        f.write("\n".join(gt_rows) + "\n")
    with open(os.path.join(root, "camera.txt"), "w") as f:
        f.write(f"{FX} {FY} {CX} {CY} 0\n{W} {H}\nnone\n{W} {H}\n")
    return root


def test_eval_baseline_full_hybrid_on_euroc_zip(tmp_path):
    import eval_baseline as EB

    root = _write_euroc_zip(str(tmp_path / "seq"), n_frames=36)

    from hslam_tpu.io.dataset import DatasetReader
    rd = DatasetReader(root)
    assert rd.kind == "euroc" and len(rd) == 36
    assert rd.camera is not None and rd.camera.out_size == (W, H)

    cfg = Config(
        max_frames=6, max_points=512, max_immature=512, max_features=512,
        pyr_levels=3, init_min_matches=50, init_ransac_iters=100,
        desired_point_density=400.0, desired_immature_density=300.0,
        tracker_iters_per_level=(6, 10, 10),
    )
    r = EB.run_config(root, 3, cfg_override=cfg)
    assert r["initialized"], r
    assert r["n_frames"] == 36
    assert r["n_keyframes"] >= 3
    assert r["gt_matched_frames"] >= 25
    # same bound as the sibling end-to-end tests (test_system.py) — this
    # fixture proves the dataset->report PATH, not odometric accuracy
    assert r["ate_rmse"] is not None and r["ate_rmse"] < 0.15, r
