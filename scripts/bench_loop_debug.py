"""Diagnostic: run the bench's warmup + loop phase only, with
HSLAM_LC_DEBUG gate tracing, to see which loop-closure gate fires/blocks
on the bench trajectory. Not part of the driver contract."""
import os
import sys
import time

os.environ.setdefault("HSLAM_LC_DEBUG", "1")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import bench  # noqa: E402


def main():
    import hslam_tpu
    hslam_tpu.ensure_compile_cache()
    from hslam_tpu.config import Config
    from hslam_tpu.models.system import SLAMSystem

    n_arc = bench.WARMUP + bench.MEASURE + bench.PACED + 2
    frame_at = bench.make_renderer()
    sys.stderr.write("rendering...\n")
    frames, gt_t = bench.make_frames(n_arc, frame_at)
    cfg = Config(max_frames=8, max_points=2048, max_immature=2048,
                 pyr_levels=6)
    slam = SLAMSystem(bench.FX, bench.FY, bench.CX, bench.CY,
                      bench.W, bench.H, cfg, sequential=False)
    t0 = time.perf_counter()
    for i in range(n_arc):
        slam.process_frame_pipelined(frames[i], i * 0.05)
    slam.flush_pipeline()
    slam.finish()
    slam.wait_compiles()
    sys.stderr.write(f"arc: {n_arc} frames in {time.perf_counter()-t0:.1f}s "
                     f"kfs={slam.next_kf_id}\n")

    loop_frames, loop_gt, loop_ts = bench.make_loop_frames(n_arc, frame_at)
    t1 = time.perf_counter()
    for k, ts in enumerate(loop_ts):
        slam.process_frame_pipelined(loop_frames[k], ts)
    slam.flush_pipeline()
    slam.finish()
    sys.stderr.write(
        f"loop phase: {len(loop_ts)} frames in {time.perf_counter()-t1:.1f}s "
        f"| kfs={slam.next_kf_id} loops={slam.n_loops_closed} "
        f"relocs={slam.n_relocs}\n")
    if slam.loop_closer is not None:
        sys.stderr.write(
            f"LC entries={len(slam.loop_closer.entries)} "
            f"run_scale={slam.loop_closer.run_scale():.4f}\n")
    slam.close()


if __name__ == "__main__":
    main()
