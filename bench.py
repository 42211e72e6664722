"""Benchmark: REAL system-loop throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Unlike the round-1 component-sum proxy, this drives the actual
`SLAMSystem` end to end on a 640x480 synthetic sequence (textured plane,
smooth camera arc): initialization, pipelined tracking
(process_frame_pipelined — pyramid + device-side motion hypotheses +
batched hypothesis scoring + coarse-to-fine LM in ONE dispatch per frame,
lag-1 result pull overlapping the next frame's compute), the async mapping
thread (epipolar trace, point activation, windowed BA, marginalization,
template rebuild), selector, and all host orchestration. Measured
steady-state wall-clock fps over the last `MEASURE` frames, including
drain of the mapping queue (finish()).

Baseline: 2x real-time at 20 fps input (north star: > 2x real-time on one
v5e) => vs_baseline = fps / 40.
"""
import json
import sys
import time

import numpy as np

H, W = 480, 640
FX = FY = 320.0
CX, CY = W / 2 - 0.5, H / 2 - 0.5
DEPTH = 2.0
WARMUP = 30      # frames before the timed window (includes init + compiles)
MEASURE = 50     # timed frames


def make_frames(n_frames):
    """Render a textured fronto-parallel plane under a smooth camera arc."""
    import jax
    import jax.numpy as jnp
    from hslam_tpu.utils import lie
    from hslam_tpu.utils.interp import bilinear

    key = jax.random.PRNGKey(11)
    ky, kx = jax.random.uniform(key, (2, 8), minval=0.5, maxval=7.5)
    ph = jax.random.uniform(jax.random.fold_in(key, 1), (8,)) * 6.28
    amps = jnp.array([40.0, 30.0, 22.0, 16.0, 12.0, 9.0, 7.0, 5.0])
    ys, xs = jnp.mgrid[0:H, 0:W]
    I0 = 120.0 + sum(
        amps[i] * jnp.sin(2 * jnp.pi * (kx[i] * xs / W + ky[i] * ys / H) + ph[i])
        for i in range(8)
    )
    I0 = I0.astype(jnp.float32)

    px = (xs - CX) / FX
    py = (ys - CY) / FY

    def render(Rf, tf):
        Rinv, tinv = lie.se3_inverse(Rf, tf)
        dz = Rinv[2, 0] * px + Rinv[2, 1] * py + Rinv[2, 2]
        s = (DEPTH - tinv[2]) / dz
        X = s * (Rinv[0, 0] * px + Rinv[0, 1] * py + Rinv[0, 2]) + tinv[0]
        Y = s * (Rinv[1, 0] * px + Rinv[1, 1] * py + Rinv[1, 2]) + tinv[1]
        return bilinear(I0, FX * X / DEPTH + CX, FY * Y / DEPTH + CY)

    frames = []
    for i in range(n_frames):
        t = i * 0.05
        xi = jnp.array([
            0.35 * np.sin(0.25 * t), 0.22 * (1 - np.cos(0.3 * t)),
            0.10 * np.sin(0.17 * t),
            0.02 * np.sin(0.2 * t), 0.02 * (1 - np.cos(0.15 * t)), 0.01 * t,
        ], jnp.float32)
        Rf, tf = lie.se3_exp(xi)
        # frames enter the system as 8-bit sensor data, like a real camera
        # (and 4x less host->device tunnel bandwidth than float32)
        img = np.asarray(render(Rf, tf))
        frames.append(np.clip(np.round(img), 0, 255).astype(np.uint8))
    return frames


def main():
    from hslam_tpu.config import Config
    from hslam_tpu.models.system import SLAMSystem

    n_total = WARMUP + MEASURE + 2
    sys.stderr.write("rendering synthetic sequence...\n")
    frames = make_frames(n_total)

    cfg = Config(max_frames=8, max_points=2048, max_immature=2048,
                 pyr_levels=6)
    slam = SLAMSystem(FX, FY, CX, CY, W, H, cfg, sequential=False)

    sys.stderr.write("warmup (init + compiles)...\n")
    t_warm0 = time.perf_counter()
    for i in range(WARMUP):
        slam.process_frame_pipelined(frames[i], i * 0.05)
    slam.flush_pipeline()
    slam.finish()
    slam.wait_compiles()   # background selector-ladder compiles must settle
    sys.stderr.write(
        f"warmup done in {time.perf_counter()-t_warm0:.1f}s; "
        f"kfs={slam.next_kf_id} initialized={slam.initialized}\n")
    if not slam.initialized:
        sys.stderr.write("FATAL: system failed to initialize in warmup\n")
        print(json.dumps({
            "metric": "real_system_loop_fps_640x480", "value": 0.0,
            "unit": "frames/s/chip", "vs_baseline": 0.0}))
        return

    kf0 = slam.next_kf_id
    t0 = time.perf_counter()
    for i in range(WARMUP, WARMUP + MEASURE):
        slam.process_frame_pipelined(frames[i], i * 0.05)
    slam.flush_pipeline()
    slam.finish()
    t1 = time.perf_counter()

    n_kf = slam.next_kf_id - kf0
    fps = MEASURE / (t1 - t0)
    lat = list(getattr(slam, "kf_latencies", []))
    sys.stderr.write(
        f"measured {MEASURE} frames in {t1-t0:.2f}s -> {fps:.1f} fps | "
        f"keyframes {n_kf} ({n_kf/MEASURE:.2f}/frame), "
        f"skipped {slam.n_frames_skipped} | "
        f"KF latency mean {np.mean(lat)*1e3:.1f}ms max {np.max(lat)*1e3:.1f}ms\n"
        if lat else
        f"measured {MEASURE} frames in {t1-t0:.2f}s -> {fps:.1f} fps | "
        f"keyframes {n_kf}\n")
    slam.close()

    print(json.dumps({
        "metric": "real_system_loop_fps_640x480",
        "value": round(fps, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / 40.0, 3),
    }))


if __name__ == "__main__":
    main()
