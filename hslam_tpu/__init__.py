"""hslam_tpu — a TPU-native hybrid direct-indirect monocular SLAM framework.

A from-scratch JAX/XLA/Pallas re-design of the capability set of H-SLAM
(reference: /root/reference, a DSO-style sliding-window photometric odometry
with ORB-feature-hosted candidate points, two-view indirect initialization,
and — as declared capabilities — BoW loop closure and pose-graph relaxation).

Design stance (not a port):
  * struct-of-arrays, fixed-capacity, masked state pytrees (no pointer graphs)
  * every numeric hot path is jit-compiled; batched over points/residuals
  * images live on device as (I, dx, dy) pyramids
  * multi-chip scaling via jax.sharding Mesh + shard_map/psum over point shards

Subpackages:
  utils     — Lie groups (SO3/SE3/Sim3), interpolation, robust losses
  ops       — device kernels: pyramids, undistortion, tracking, BA, epipolar
  models    — stateful subsystems: calib, frames, window BA, tracker, system
  parallel  — device meshes and sharded/distributed solvers
  io        — dataset readers (TUM-mono / EuRoC / KITTI), calib, trajectory
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# SLAM estimation is ill-conditioned (Hessians with priors up to 1e14); the
# TPU default of bf16 matmul inputs silently destroys it. Hot image kernels
# that tolerate bf16 opt in explicitly at the call site.
_jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: the framework compiles ~10 large graphs;
# caching makes process restarts (and flaky remote-compile environments)
# incremental instead of from-scratch.
#
# The default cache dir is scoped by backend + machine + CPU feature set:
# a single shared path poisons fresh processes when entries were compiled
# on a different machine (XLA:CPU AOT executables embed host CPU features
# and fail to load — or worse, segfault on concurrent writes). Set
# HSLAM_JAX_CACHE to override, or HSLAM_JAX_CACHE=0 to disable entirely.


def _default_cache_dir(backend="auto"):
    import hashlib
    import platform

    backend = backend or "auto"
    feat = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    feat = hashlib.sha1(line.encode()).hexdigest()[:10]
                    break
    except OSError:
        pass
    tag = f"{backend}-{platform.machine()}-{feat or 'nofeat'}"
    return f"/tmp/hslam_jax_cache-{tag}"


_cache_decided = False


def ensure_compile_cache():
    """Enable the persistent compile cache iff the RESOLVED backend is an
    accelerator. On the CPU backend the cache is a net negative: XLA:CPU
    AOT entries embed "+prefer-no-gather/scatter" pseudo-features that
    never match the host on reload (every load fails with feature-mismatch
    spam and recompiles anyway), and concurrent writes have segfaulted CI.

    Called lazily (SLAMSystem construction / bench / driver entry) rather
    than at import: resolving the backend here is safe, whereas doing it
    at import time would break callers that must run
    jax.distributed.initialize() BEFORE first backend use
    (tests/test_multihost.py). Set HSLAM_JAX_CACHE=<dir> to force a cache
    path, or HSLAM_JAX_CACHE=0 to disable entirely."""
    global _cache_decided
    if _cache_decided:
        return
    _cache_decided = True
    cache_dir = _os.environ.get("HSLAM_JAX_CACHE")
    if cache_dir == "0":
        return
    if not cache_dir:
        try:
            backend = _jax.default_backend()
        except Exception:
            return
        if backend in ("cpu",):
            return
        cache_dir = _default_cache_dir(backend)
    try:
        _jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache even sub-second compiles: on a remote-compile backend each
        # tiny op costs a ~0.35s round trip, and a cold warmup dispatches
        # hundreds of them — the default 1s floor would skip them all
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass


# Explicit env configuration keeps the old eager behavior (no backend
# resolution needed): a KNOWN-accelerator JAX_PLATFORMS, or a forced dir.
_cache_dir = _os.environ.get("HSLAM_JAX_CACHE")
_backend = (_os.environ.get("JAX_PLATFORMS", "") or "").split(",")[0]
if _cache_dir != "0" and (_cache_dir or _backend in ("axon", "tpu", "gpu",
                                                     "cuda", "rocm")):
    _cache_decided = True
    try:
        _jax.config.update(
            "jax_compilation_cache_dir",
            _cache_dir or _default_cache_dir(_backend))
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass
elif _backend == "cpu":
    _cache_decided = True   # explicit CPU: cache stays off, decision final
