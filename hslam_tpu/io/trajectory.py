"""Trajectory export and ATE evaluation.

The reference has NO result output (SURVEY.md §5: even the GUI is the only
observability surface) — this module adds the TUM-format trajectory export
and ATE-RMSE evaluation needed for the BASELINE.json metrics.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def write_tum(path: str, timestamps: Sequence[float],
              poses: Sequence[Tuple[np.ndarray, np.ndarray]]):
    """TUM format: `timestamp tx ty tz qx qy qz qw` per line.
    poses are camToWorld (R, t)."""
    from ..utils import lie
    import jax.numpy as jnp

    with open(path, "w") as f:
        for ts, (R, t) in zip(timestamps, poses):
            q = np.asarray(lie.rot_to_quat(jnp.asarray(R)))
            f.write(
                f"{ts:.9f} {t[0]:.6f} {t[1]:.6f} {t[2]:.6f} "
                f"{q[0]:.7f} {q[1]:.7f} {q[2]:.7f} {q[3]:.7f}\n"
            )


def read_tum(path: str):
    """Returns (timestamps (N,), positions (N, 3), quaternions (N, 4) xyzw)."""
    ts, pos, quat = [], [], []
    for ln in open(path):
        ln = ln.strip()
        if not ln or ln.startswith("#"):
            continue
        v = [float(x) for x in ln.replace(",", " ").split()]
        if len(v) < 8:
            continue
        ts.append(v[0])
        pos.append(v[1:4])
        quat.append(v[4:8])
    return np.array(ts), np.array(pos), np.array(quat)


def associate(ts_a: np.ndarray, ts_b: np.ndarray, max_diff: float = 0.02):
    """Greedy nearest-timestamp association; returns index pairs."""
    ia = np.argsort(ts_a)
    ib = np.argsort(ts_b)
    pairs = []
    j = 0
    for i in ia:
        while j + 1 < len(ib) and abs(ts_b[ib[j + 1]] - ts_a[i]) <= abs(
            ts_b[ib[j]] - ts_a[i]
        ):
            j += 1
        if abs(ts_b[ib[j]] - ts_a[i]) < max_diff:
            pairs.append((i, ib[j]))
    return pairs


def align_sim3(X: np.ndarray, Y: np.ndarray):
    """Umeyama alignment: find s, R, t minimizing ||Y - (s R X + t)||.
    X, Y: (N, 3). Needed because monocular trajectories have free scale."""
    mx = X.mean(0)
    my = Y.mean(0)
    Xc = X - mx
    Yc = Y - my
    cov = Yc.T @ Xc / len(X)
    U, S, Vt = np.linalg.svd(cov)
    d = np.sign(np.linalg.det(U @ Vt))
    D = np.diag([1.0, 1.0, d])
    R = U @ D @ Vt
    var_x = (Xc**2).sum() / len(X)
    s = np.trace(np.diag(S) @ D) / var_x if var_x > 0 else 1.0
    t = my - s * R @ mx
    return s, R, t


def ate_rmse(gt_pos: np.ndarray, est_pos: np.ndarray,
             align: str = "sim3") -> float:
    """Absolute trajectory error RMSE after sim3 (monocular) or se3
    alignment. Positions must already be associated (same length)."""
    if len(gt_pos) < 3:
        return float("nan")
    if align == "sim3":
        s, R, t = align_sim3(est_pos, gt_pos)
    else:
        s = 1.0
        _, R, t = align_sim3(est_pos, gt_pos)  # reuse, fix scale
        # re-estimate t with s=1
        t = gt_pos.mean(0) - R @ est_pos.mean(0)
    aligned = (s * (R @ est_pos.T)).T + t
    err = aligned - gt_pos
    return float(np.sqrt((err**2).sum(-1).mean()))


def evaluate_ate(gt_file: str, est_file: str, max_diff: float = 0.02) -> float:
    ts_g, pos_g, _ = read_tum(gt_file)
    ts_e, pos_e, _ = read_tum(est_file)
    pairs = associate(ts_g, ts_e, max_diff)
    if len(pairs) < 3:
        return float("nan")
    gi = np.array([p[0] for p in pairs])
    ei = np.array([p[1] for p in pairs])
    return ate_rmse(pos_g[gi], pos_e[ei])
