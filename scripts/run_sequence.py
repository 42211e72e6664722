"""Run the full SLAM system on a dataset (or a synthetic sequence).

Usage:
    python scripts/run_sequence.py --synthetic 60        # N synthetic frames
    python scripts/run_sequence.py --dataset /path/to/euroc_seq [--out traj.txt]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def synthetic_sequence(n_frames, h=240, w=320, loop=False):
    """Textured plane + a second depth layer, smooth camera arc."""
    import jax
    import jax.numpy as jnp

    from hslam_tpu.utils import lie
    from hslam_tpu.utils.interp import bilinear

    fx = fy = 160.0
    cx, cy = w / 2 - 0.5, h / 2 - 0.5
    depth = 2.0

    key = jax.random.PRNGKey(3)
    ky, kx = jax.random.uniform(key, (2, 8), minval=0.5, maxval=6.5)
    ph = jax.random.uniform(jax.random.fold_in(key, 1), (8,)) * 6.28
    amps = jnp.array([35.0, 30.0, 22.0, 18.0, 14.0, 10.0, 8.0, 6.0])
    ys, xs = jnp.mgrid[0:h, 0:w]
    I0 = 120.0 + sum(
        amps[i] * jnp.sin(2 * jnp.pi * (kx[i] * xs / w + ky[i] * ys / h) + ph[i])
        for i in range(8)
    )
    # band-limited speckle: bilinear-upsampled random grid gives the scene
    # FAST-scale corners (pure sinusoids are corner-free at 320x240)
    grid = jax.random.uniform(jax.random.fold_in(key, 2),
                              (h // 4 + 2, w // 4 + 2), minval=-22.0, maxval=22.0)
    I0 = I0 + bilinear(grid, jnp.asarray(xs / 4.0), jnp.asarray(ys / 4.0))
    I0 = jnp.clip(I0, 5.0, 250.0).astype(jnp.float32)

    def render(Rf, tf):
        px = (xs - cx) / fx
        py = (ys - cy) / fy
        Rinv, tinv = lie.se3_inverse(Rf, tf)
        dz = Rinv[2, 0] * px + Rinv[2, 1] * py + Rinv[2, 2]
        s = (depth - tinv[2]) / dz
        X = s * (Rinv[0, 0] * px + Rinv[0, 1] * py + Rinv[0, 2]) + tinv[0]
        Y = s * (Rinv[1, 0] * px + Rinv[1, 1] * py + Rinv[1, 2]) + tinv[1]
        u0 = fx * X / depth + cx
        v0 = fy * Y / depth + cy
        return np.asarray(bilinear(I0, u0, v0))

    frames = []
    poses = []
    for i in range(n_frames):
        t = i / 30.0
        if loop:
            # closed circuit: returns to the start pose at the last frame
            a = 2 * np.pi * i / max(n_frames - 1, 1)
            xi = jnp.array(
                [0.35 * np.sin(a), 0.15 * (1 - np.cos(a)), 0.0,
                 0.01 * np.sin(a), 0.015 * np.sin(a), 0.0]
            )
        else:
            xi = jnp.array(
                [0.25 * np.sin(0.5 * t), 0.12 * (1 - np.cos(0.5 * t)), 0.06 * t,
                 0.02 * np.sin(0.4 * t), 0.03 * t, 0.01 * np.sin(0.3 * t)]
            )
        R, tt = lie.se3_exp(xi)   # worldToCam
        frames.append(render(R, tt))
        poses.append((np.asarray(R), np.asarray(tt)))
    return frames, poses, (fx, fy, cx, cy, w, h)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--synthetic", type=int, default=0)
    ap.add_argument("--dataset", type=str, default=None)
    ap.add_argument("--out", type=str, default="/tmp/traj.txt")
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--realtime", action="store_true",
                    help="pace playback by input timestamps, skipping frames "
                         "when behind (reference Main.cpp:91-106 semantics)")
    ap.add_argument("--viz-dir", type=str, default=None,
                    help="write per-keyframe debug PNGs here")
    ap.add_argument("--loop-closure", action="store_true",
                    help="enable BoW loop closure + pose-graph correction")
    ap.add_argument("--loop-trajectory", action="store_true",
                    help="synthetic: fly a closed loop that revisits the start")
    ap.add_argument("--vocab", type=str, default=None,
                    help="offline-trained BoW vocabulary .npz "
                         "(scripts/train_vocab.py); the reference's "
                         "mandatory vocabulary argument (Main.h:81)")
    ap.add_argument("--metrics", type=str, default=None,
                    help="write per-frame/per-keyframe JSONL metrics here")
    ap.add_argument("--view3d", action="store_true",
                    help="serve the live 3D map (WebGL point clouds + "
                         "frusta + trajectory) at http://localhost:PORT")
    ap.add_argument("--view3d-port", type=int, default=8642)
    ap.add_argument("--online-calib", action="store_true",
                    help="estimate response/vignette/exposure online "
                         "(OnlineCalibrator capability; frames are fed RAW)")
    args = ap.parse_args()

    from hslam_tpu.config import Config
    from hslam_tpu.models.system import SLAMSystem
    from hslam_tpu.io.trajectory import write_tum, ate_rmse

    viewer = None
    if args.view3d:
        if args.metrics is None:
            args.metrics = "/tmp/hslam_metrics.jsonl"
        open(args.metrics, "w").close()   # fresh stream for the viewer
        from hslam_tpu.viz.view3d import MapServer
        viewer = MapServer(args.metrics, port=args.view3d_port).start()
        print(f"live 3D map at {viewer.url}  (drag orbit / wheel zoom / "
              f"F follow)")

    if args.synthetic:
        frames, gt_poses, (fx, fy, cx, cy, w, h) = synthetic_sequence(
            args.synthetic, loop=args.loop_trajectory)
        cfg = Config(max_frames=8, max_points=2048, max_immature=2048,
                     max_features=2048, pyr_levels=4)
        sys_ = SLAMSystem(fx, fy, cx, cy, w, h, cfg,
                          enable_loop_closure=args.loop_closure,
                          online_photo_calib=args.online_calib,
                          vocab_path=args.vocab, metrics_path=args.metrics)
        t0 = time.time()
        for i, img in enumerate(frames):
            sys_.process_frame(img, i / 30.0)
            if sys_.is_lost:
                print(f"LOST at frame {i}")
                break
        dt = time.time() - t0
        print(f"processed {len(frames)} frames in {dt:.1f}s "
              f"({len(frames)/dt:.1f} fps), {sys_.next_kf_id} keyframes, "
              f"initialized={sys_.initialized}, "
              f"loops_closed={sys_.n_loops_closed}")

        # ATE vs ground truth (sim3-aligned, KF poses only)
        est, gt = [], []
        for s in sys_.shells:
            if s.pose_valid and s.id < len(gt_poses):
                est.append(s.cam_to_world[:3, 3])
                R, t = gt_poses[s.id]
                Tcw = np.eye(4)
                Tcw[:3, :3], Tcw[:3, 3] = R, t
                gt.append(np.linalg.inv(Tcw)[:3, 3])
        if len(est) > 5 and sys_.initialized:
            err = ate_rmse(np.array(gt), np.array(est))
            print(f"ATE RMSE (sim3-aligned): {err:.4f} (scene depth = 2.0)")
        write_tum(args.out, [s.timestamp for s in sys_.shells],
                  [(s.cam_to_world[:3, :3], s.cam_to_world[:3, 3])
                   for s in sys_.shells])
    else:
        from hslam_tpu.io.dataset import DatasetReader

        rd = DatasetReader(args.dataset)
        cam = rd.camera
        K = cam.out_K
        cfg = Config()
        sys_ = SLAMSystem(K[0, 0], K[1, 1], K[0, 2], K[1, 2],
                          cam.out_size[0], cam.out_size[1], cfg,
                          online_photo_calib=args.online_calib,
                          vocab_path=args.vocab, metrics_path=args.metrics)
        import jax.numpy as jnp
        from hslam_tpu.ops.undistort import remap_image, photometric_correct

        remap = jnp.asarray(cam.remap)
        inv_resp_np = None
        inv_vig_np = None
        if args.online_calib:
            # OnlineCalib mode: the system estimates response/vignette
            # itself, so frames must stay RAW — geometric remap only
            # (reversed correction order, DatasetLoader.h:436-506)
            pass
        else:
            if rd.photometric.gamma is not None:
                from hslam_tpu.ops.undistort import invert_response
                inv_resp_np = np.asarray(
                    invert_response(jnp.asarray(rd.photometric.gamma)))
            inv_vig_np = rd.photometric.inv_vignette

        # native threaded decode: path-based prefetch loader for directory
        # datasets, blob-fed decode pool for zip archives (the consumer
        # thread only reads compressed bytes; decode + photometric
        # correction run in the C++ worker pool)
        from hslam_tpu.io import native_loader
        use_native = native_loader.available()
        # the geometric remap also runs in the worker pool (loader_set_remap)
        # so native-path frames arrive fully corrected — frees the device of
        # per-frame remap gathers AND the host of a second pass
        if use_native and rd._zip is None:
            nl = native_loader.NativeLoader(
                rd.files, n_prefetch=8, n_threads=2,
                inv_response=inv_resp_np, inv_vignette=inv_vig_np,
                remap=cam.remap,
            )
        elif use_native:
            nl = native_loader.NativeMemLoader(
                len(rd), lambda i: rd._zip.read(rd.files[i]),
                n_prefetch=8, n_threads=2,
                inv_response=inv_resp_np, inv_vignette=inv_vig_np,
                remap=cam.remap,
            )
        inv_resp = jnp.asarray(inv_resp_np) if inv_resp_np is not None else None
        inv_vig = jnp.asarray(inv_vig_np) if inv_vig_np is not None else None

        n = len(rd) if not args.max_frames else min(len(rd), args.max_frames)
        t0 = time.time()
        n_skipped = 0
        i = 0
        while i < n:
            if use_native:
                # photometric + geometric correction already applied natively
                img = jnp.asarray(nl.get(i))
                ts, exp = rd.timestamps[i], rd.exposures[i]
            else:
                fd = rd.get_raw(i)
                img = photometric_correct(jnp.asarray(fd.image), inv_resp, inv_vig)
                ts, exp = fd.timestamp, fd.exposure
                img = remap_image(img, remap)
            sys_.process_frame(np.asarray(img), ts, exp)
            if args.viz_dir and sys_.shells and sys_.shells[-1].is_kf:
                os.makedirs(args.viz_dir, exist_ok=True)
                from hslam_tpu.viz.debug_draw import save_debug_frame
                save_debug_frame(
                    os.path.join(args.viz_dir, f"kf_{sys_.next_kf_id:04d}.png"),
                    sys_, np.asarray(img),
                )
            if sys_.is_lost:
                print(f"LOST at frame {i}")
                break
            i += 1
            if args.realtime and i < n:
                # skip frames whose timestamp has already passed
                # (Main.cpp:91-106: frame-skip when behind)
                wall = time.time() - t0
                while i < n - 1 and rd.timestamps[i] - rd.timestamps[0] < wall:
                    i += 1
                    n_skipped += 1
                # wait if ahead of schedule
                ahead = (rd.timestamps[i] - rd.timestamps[0]) - wall
                if ahead > 0:
                    time.sleep(min(ahead, 1.0))
        dt_skip = f", skipped {n_skipped}" if args.realtime else ""
        dt = time.time() - t0
        n_proc = len(sys_.shells)
        print(f"{n_proc} frames in {dt:.1f}s ({n_proc/dt:.1f} fps), "
              f"{sys_.next_kf_id} KFs{dt_skip}")
        write_tum(args.out, [s.timestamp for s in sys_.shells],
                  [(s.cam_to_world[:3, :3], s.cam_to_world[:3, 3])
                   for s in sys_.shells])
    print(f"trajectory written to {args.out}")
    if viewer is not None:
        print(f"sequence done — viewer still serving at {viewer.url}; "
              f"Ctrl-C to exit")
        try:
            while True:
                time.sleep(3600)
        except KeyboardInterrupt:
            viewer.stop()


if __name__ == "__main__":
    main()
