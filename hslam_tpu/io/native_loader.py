"""ctypes binding for the native (C++) prefetching frame loader.

Wraps native/libhslam_loader.so (see native/loader.cpp) — the host-runtime
equivalent of the reference's DatasetLoader worker thread. Falls back
gracefully when the library has not been built.
"""
from __future__ import annotations

import ctypes
import os
from typing import List, Optional

import numpy as np

_LIB_PATHS = [
    os.path.join(os.path.dirname(__file__), "..", "..", "native", "build",
                 "libhslam_loader.so"),
]


def _load_lib():
    for p in _LIB_PATHS:
        p = os.path.abspath(p)
        if os.path.exists(p):
            lib = ctypes.CDLL(p)
            if not hasattr(lib, "loader_set_remap"):
                # stale build predating the remap ABI — fall back to the
                # pure-python path ("falls back gracefully" contract);
                # native/build.sh rebuilds it
                return None
            lib.loader_open.restype = ctypes.c_void_p
            lib.loader_open.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
                ctypes.c_int,
            ]
            lib.loader_get.restype = ctypes.c_int
            lib.loader_get.argtypes = [
                ctypes.c_void_p, ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.c_long,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ]
            lib.loader_set_photometric.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
                ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ]
            lib.loader_set_remap.argtypes = [
                ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
                ctypes.c_int, ctypes.c_int,
            ]
            lib.loader_close.argtypes = [ctypes.c_void_p]
            lib.loader_count.restype = ctypes.c_int
            lib.loader_count.argtypes = [ctypes.c_void_p]
            lib.loader_open_mem.restype = ctypes.c_void_p
            lib.loader_open_mem.argtypes = [ctypes.c_int, ctypes.c_int]
            lib.loader_push.argtypes = [
                ctypes.c_void_p, ctypes.c_int,
                ctypes.POINTER(ctypes.c_ubyte), ctypes.c_long,
            ]
            return lib
    return None


_LIB = None


def available() -> bool:
    global _LIB
    if _LIB is None:
        _LIB = _load_lib()
    return _LIB is not None


def _install_remap(handle, keeper, remap: np.ndarray):
    """Install a (H_out, W_out, 2) geometric remap table (x, y source
    coords, -1 = invalid) — workers then ship fully geometry+photometry
    corrected frames (GeometricUndistorter.cpp:458-475 semantics, same
    table ops/undistort.remap_image consumes)."""
    m = np.ascontiguousarray(remap, np.float32)
    assert m.ndim == 3 and m.shape[2] == 2
    keeper.append(m)
    _LIB.loader_set_remap(
        handle, m.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        m.shape[1], m.shape[0])


class NativeLoader:
    """Threaded prefetching decoder over an explicit file list."""

    def __init__(self, paths: List[str], n_prefetch: int = 8,
                 n_threads: int = 2,
                 inv_response: Optional[np.ndarray] = None,
                 inv_vignette: Optional[np.ndarray] = None,
                 remap: Optional[np.ndarray] = None):
        if not available():
            raise RuntimeError(
                "native loader not built — run native/build.sh"
            )
        self._keep = []
        arr = (ctypes.c_char_p * len(paths))(
            *[p.encode() for p in paths]
        )
        self._h = _LIB.loader_open(arr, len(paths), n_prefetch, n_threads)
        self._n = len(paths)
        if inv_response is not None or inv_vignette is not None:
            resp = None
            vig = None
            vw = vh = 0
            if inv_response is not None:
                r = np.ascontiguousarray(inv_response, np.float32)
                assert r.shape == (256,)
                resp = r.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
                self._keep_r = r
            if inv_vignette is not None:
                v = np.ascontiguousarray(inv_vignette, np.float32)
                vh, vw = v.shape
                vig = v.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
                self._keep_v = v
            _LIB.loader_set_photometric(self._h, resp, vig, vw, vh)
        if remap is not None:
            _install_remap(self._h, self._keep, remap)
        self._buf = None

    def __len__(self):
        return self._n

    def get(self, idx: int) -> np.ndarray:
        """Blocking fetch of frame idx as (H, W) float32."""
        w = ctypes.c_int()
        h = ctypes.c_int()
        if self._buf is None:
            self._buf = np.empty(4096 * 4096, np.float32)
        rc = _LIB.loader_get(
            self._h, idx,
            self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self._buf.size, ctypes.byref(w), ctypes.byref(h),
        )
        if rc != 0:
            raise IOError(f"native loader failed on frame {idx}: rc={rc}")
        return self._buf[: w.value * h.value].reshape(h.value, w.value).copy()

    def close(self):
        if self._h:
            _LIB.loader_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class NativeMemLoader:
    """Decode pool fed with compressed blobs — the archive-dataset path
    (reference reads zips through libzip, DatasetLoader.h:410-434). The
    consumer thread only does cheap sequential archive reads (`read_blob`
    callback); image decode + photometric correction run in the C++
    worker pool ahead of the consumer."""

    def __init__(self, n_frames: int, read_blob, n_prefetch: int = 8,
                 n_threads: int = 2,
                 inv_response: Optional[np.ndarray] = None,
                 inv_vignette: Optional[np.ndarray] = None,
                 remap: Optional[np.ndarray] = None):
        if not available():
            raise RuntimeError("native loader not built — run native/build.sh")
        self._keep = []
        self._h = _LIB.loader_open_mem(n_frames, n_threads)
        self._n = n_frames
        self._read_blob = read_blob
        self._prefetch = max(1, n_prefetch)
        self._pushed = -1          # highest index handed to the pool
        if inv_response is not None or inv_vignette is not None:
            resp = vig = None
            vw = vh = 0
            if inv_response is not None:
                r = np.ascontiguousarray(inv_response, np.float32)
                assert r.shape == (256,)
                resp = r.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
                self._keep_r = r
            if inv_vignette is not None:
                v = np.ascontiguousarray(inv_vignette, np.float32)
                vh, vw = v.shape
                vig = v.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
                self._keep_v = v
            _LIB.loader_set_photometric(self._h, resp, vig, vw, vh)
        if remap is not None:
            _install_remap(self._h, self._keep, remap)
        self._buf = None

    def __len__(self):
        return self._n

    def _feed_to(self, upto: int):
        for i in range(self._pushed + 1, min(upto, self._n - 1) + 1):
            blob = np.frombuffer(self._read_blob(i), np.uint8)
            _LIB.loader_push(
                self._h, i,
                blob.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
                blob.size)
            self._pushed = i

    def get(self, idx: int) -> np.ndarray:
        """Blocking fetch of frame idx as (H, W) float32; feeds the pool
        `n_prefetch` frames ahead so decode overlaps the caller."""
        self._feed_to(idx + self._prefetch)
        w = ctypes.c_int()
        h = ctypes.c_int()
        if self._buf is None:
            self._buf = np.empty(4096 * 4096, np.float32)
        rc = _LIB.loader_get(
            self._h, idx,
            self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            self._buf.size, ctypes.byref(w), ctypes.byref(h),
        )
        if rc != 0:
            raise IOError(f"native loader failed on frame {idx}: rc={rc}")
        return self._buf[: w.value * h.value].reshape(h.value, w.value).copy()

    def close(self):
        if self._h:
            _LIB.loader_close(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
