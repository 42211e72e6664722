"""Run the BASELINE.json evaluation configs verbatim from a dataset root.

One command produces the BASELINE table once real sequences are mounted
(none exist in the build environment — zero egress — so the path is
proven by tests/test_eval_baseline.py on a generated EuRoC-layout
fixture):

    python scripts/eval_baseline.py --dataset /data/euroc/MH_01 --config 1
    python scripts/eval_baseline.py --dataset-root /data/euroc \
        --sequences MH_01,MH_02,V1_01 --config 1 3 --json /tmp/table.json

Configs (BASELINE.json `configs`):
  1  Monocular odometry (CoarseTracker + windowed photometric BA, LC off)
  2  TUM-MonoVO with photometric calibration (pcalib.txt + vignette.png,
     the photometricUndistorter path, photometricUndistorter.cpp:121-146)
  3  Full hybrid: indirect features + BoW loop closure + pose graph
  4  Online photometric calibration (OnlineCalibrator capability — frames
     fed RAW, response/vignette/exposure estimated on device)
  5  Multi-host distributed (keyframe-block BA + pose graph): run
     tests/test_global_ba.py / tests/test_multihost.py on the target pod;
     this driver prints guidance only (needs >=2 real hosts).

Ground truth: EuRoC `mav0/state_groundtruth_estimate0/data.csv` is found
automatically; TUM-format files via --gt. ATE is Sim3-aligned RMSE with
nearest-timestamp association (<=20 ms).
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CONFIG_NAMES = {
    1: "mono odometry (LC off)",
    2: "photometric calib (pcalib+vignette)",
    3: "full hybrid (features + LC + pose graph)",
    4: "online photometric calibration",
}


def load_groundtruth(dataset_path: str, gt_path: str | None):
    """Returns (timestamps (N,), positions (N, 3)) or None."""
    cands = []
    if gt_path:
        cands.append(gt_path)
    cands.append(os.path.join(dataset_path, "mav0",
                              "state_groundtruth_estimate0", "data.csv"))
    cands.append(os.path.join(dataset_path, "groundtruth.txt"))
    for c in cands:
        if not os.path.exists(c):
            continue
        ts, pos = [], []
        if c.endswith(".csv"):
            for ln in open(c):
                if ln.startswith("#"):
                    continue
                f = ln.strip().split(",")
                if len(f) < 4:
                    continue
                ts.append(float(f[0]) * 1e-9)
                pos.append([float(f[1]), float(f[2]), float(f[3])])
        else:                                 # TUM format: t x y z qx qy qz qw
            for ln in open(c):
                if ln.startswith("#"):
                    continue
                f = ln.strip().split()
                if len(f) < 4:
                    continue
                ts.append(float(f[0]))
                pos.append([float(f[1]), float(f[2]), float(f[3])])
        if ts:
            return np.asarray(ts), np.asarray(pos)
    return None


def associate_ate(shells, gt, max_dt=0.02):
    """Sim3-aligned ATE of pose-valid shells against (ts, pos) GT."""
    from hslam_tpu.io.trajectory import ate_rmse
    gts, gpos = gt
    est, ref = [], []
    for s in shells:
        if not s.pose_valid:
            continue
        j = int(np.searchsorted(gts, s.timestamp))
        best, bdt = None, max_dt
        for k in (j - 1, j):
            if 0 <= k < len(gts) and abs(gts[k] - s.timestamp) <= bdt:
                best, bdt = k, abs(gts[k] - s.timestamp)
        if best is None:
            continue
        est.append(s.cam_to_world[:3, 3])
        ref.append(gpos[best])
    if len(est) < 8:
        return float("nan"), len(est)
    return ate_rmse(np.stack(ref), np.stack(est)), len(est)


def run_config(dataset_path: str, config_id: int, calib: str | None = None,
               gt_path: str | None = None, max_frames: int = 0,
               cfg_override=None, vocab: str | None = None):
    """Run one BASELINE config on one sequence; returns a result dict."""
    import jax.numpy as jnp

    from hslam_tpu.config import Config
    from hslam_tpu.io.dataset import DatasetReader
    from hslam_tpu.models.system import SLAMSystem
    from hslam_tpu.ops.undistort import (invert_response, photometric_correct,
                                         remap_image)

    rd = DatasetReader(dataset_path, calib_path=calib)
    if rd.camera is None:
        raise SystemExit(
            f"{dataset_path}: no geometric calibration found (camera.txt / "
            f"camera.yaml / --calib); reference requires one "
            f"(GeometricUndistorter.cpp:26-78)")
    cam = rd.camera
    K = cam.out_K
    w, h = cam.out_size
    cfg = cfg_override or Config(max_frames=8, max_points=2048,
                                 max_immature=2048, max_features=2048,
                                 pyr_levels=4)
    online = config_id == 4
    slam = SLAMSystem(
        K[0, 0], K[1, 1], K[0, 2], K[1, 2], w, h, cfg,
        enable_loop_closure=(config_id == 3),
        online_photo_calib=online, vocab_path=vocab, sequential=False)

    remap = jnp.asarray(cam.remap)
    inv_resp = None
    inv_vig = None
    if config_id == 2 and not online:
        if rd.photometric.gamma is not None:
            inv_resp = jnp.asarray(
                invert_response(jnp.asarray(rd.photometric.gamma)))
        if rd.photometric.inv_vignette is not None:
            inv_vig = jnp.asarray(rd.photometric.inv_vignette)

    n = len(rd) if max_frames <= 0 else min(len(rd), max_frames)
    t0 = time.perf_counter()
    for i in range(n):
        fr = rd.get_raw(i)
        img = remap_image(jnp.asarray(fr.image), remap)
        if inv_resp is not None or inv_vig is not None:
            ir = (inv_resp if inv_resp is not None
                  else jnp.arange(256, dtype=jnp.float32))
            iv = (inv_vig if inv_vig is not None
                  else jnp.ones((h, w), jnp.float32))
            img = photometric_correct(img, ir, iv)
        slam.process_frame_pipelined(np.asarray(img), fr.timestamp,
                                     exposure=fr.exposure)
    slam.flush_pipeline()
    slam.finish()
    wall = time.perf_counter() - t0
    gt = load_groundtruth(dataset_path, gt_path)
    ate, n_assoc = (float("nan"), 0) if gt is None else associate_ate(
        slam.shells, gt)
    out = {
        "config": config_id,
        "config_name": CONFIG_NAMES[config_id],
        "sequence": os.path.basename(dataset_path.rstrip("/")),
        "n_frames": n,
        "fps": round(n / wall, 2),
        "initialized": bool(slam.initialized),
        "n_keyframes": int(slam.next_kf_id),
        "n_loops_closed": int(slam.n_loops_closed),
        "n_relocs": int(slam.n_relocs),
        "ate_rmse": None if np.isnan(ate) else round(float(ate), 4),
        "gt_matched_frames": n_assoc,
    }
    slam.close()
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset", help="one sequence directory")
    ap.add_argument("--dataset-root", help="root holding sequence dirs")
    ap.add_argument("--sequences", default="",
                    help="comma-separated sequence names under root")
    ap.add_argument("--config", type=int, nargs="+", default=[1],
                    help="BASELINE config ids (1-5)")
    ap.add_argument("--calib", default=None,
                    help="geometric calib file (camera.txt / OpenCV yaml, "
                         "e.g. the reference Extras/Calib/*.yaml)")
    ap.add_argument("--gt", default=None, help="ground-truth file")
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--vocab", default=None)
    ap.add_argument("--json", default=None, help="write results as JSON")
    args = ap.parse_args()

    if args.dataset:
        seqs = [args.dataset]
    elif args.dataset_root:
        names = ([s for s in args.sequences.split(",") if s]
                 or sorted(os.listdir(args.dataset_root)))
        seqs = [os.path.join(args.dataset_root, s) for s in names]
    else:
        ap.error("need --dataset or --dataset-root")

    import hslam_tpu
    hslam_tpu.ensure_compile_cache()

    rows = []
    for cid in args.config:
        if cid == 5:
            print("config 5 (multi-host distributed) needs >=2 real hosts: "
                  "run tests/test_multihost.py + tests/test_global_ba.py "
                  "(slow lane) on the pod; see parallel/global_ba.py")
            continue
        for seq in seqs:
            print(f"== config {cid} ({CONFIG_NAMES[cid]}) on {seq}")
            r = run_config(seq, cid, calib=args.calib, gt_path=args.gt,
                           max_frames=args.max_frames, vocab=args.vocab)
            rows.append(r)
            print("   " + json.dumps(r))

    if rows:
        print("\n| config | sequence | frames | fps | KFs | loops | ATE |")
        print("|---|---|---|---|---|---|---|")
        for r in rows:
            print(f"| {r['config']} | {r['sequence']} | {r['n_frames']} | "
                  f"{r['fps']} | {r['n_keyframes']} | "
                  f"{r['n_loops_closed']} | {r['ate_rmse']} |")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(rows, f, indent=1)
        print(f"results -> {args.json}")


if __name__ == "__main__":
    main()
