"""ctypes bindings for the native runtime (native/libtpuslam_native.so).

Exposes the C++ PNG decoder, the threaded dataset prefetcher, and the
quadtree selection oracle. Falls back gracefully (native_available() False)
when the library has not been built — `make -C native` builds it.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _lib_path() -> str:
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(root, "native", "libtpuslam_native.so")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = _lib_path()
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.tpuslam_decode_png_gray.restype = ctypes.c_int
    lib.tpuslam_decode_png_gray.argtypes = [
        ctypes.c_char_p,
        ctypes.c_size_t,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
        ctypes.c_float,
    ]
    lib.tpuslam_free.argtypes = [ctypes.c_void_p]
    lib.tpuslam_prefetch_create.restype = ctypes.c_void_p
    lib.tpuslam_prefetch_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_float,
    ]
    lib.tpuslam_prefetch_next.restype = ctypes.c_long
    lib.tpuslam_prefetch_next.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    lib.tpuslam_release_frame.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)]
    lib.tpuslam_prefetch_destroy.argtypes = [ctypes.c_void_p]
    lib.tpuslam_distribute_quadtree.restype = ctypes.c_int
    lib.tpuslam_distribute_quadtree.argtypes = [
        np.ctypeslib.ndpointer(np.float32),
        np.ctypeslib.ndpointer(np.float32),
        np.ctypeslib.ndpointer(np.float32),
        ctypes.c_int,
        ctypes.c_float,
        ctypes.c_float,
        ctypes.c_float,
        ctypes.c_float,
        ctypes.c_int,
        np.ctypeslib.ndpointer(np.int32),
    ]
    lib.tpuslam_ate.restype = ctypes.c_double
    lib.tpuslam_ate.argtypes = [
        np.ctypeslib.ndpointer(np.float64),
        np.ctypeslib.ndpointer(np.float64),
        ctypes.c_int64,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_double),
        np.ctypeslib.ndpointer(np.float64),
        np.ctypeslib.ndpointer(np.float64),
    ]
    lib.tpuslam_rpe.restype = ctypes.c_double
    lib.tpuslam_rpe.argtypes = [
        np.ctypeslib.ndpointer(np.float64),
        np.ctypeslib.ndpointer(np.float64),
        ctypes.c_int64,
        ctypes.c_int64,
    ]
    lib.tpuslam_fast_nms.restype = ctypes.c_int
    lib.tpuslam_fast_nms.argtypes = [
        np.ctypeslib.ndpointer(np.float32),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_float,
        np.ctypeslib.ndpointer(np.float32),
    ]
    _LIB = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def decode_png_gray(data: bytes, scale16: float = 1.0) -> np.ndarray:
    """Decode PNG bytes to a float32 grayscale array with the C++ decoder."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built (make -C native)")
    out = ctypes.POINTER(ctypes.c_float)()
    w = ctypes.c_int()
    h = ctypes.c_int()
    rc = lib.tpuslam_decode_png_gray(data, len(data), ctypes.byref(out),
                                     ctypes.byref(w), ctypes.byref(h),
                                     ctypes.c_float(scale16))
    if rc != 0:
        raise ValueError(f"PNG decode failed (code {rc})")
    arr = np.ctypeslib.as_array(out, shape=(h.value, w.value)).copy()
    lib.tpuslam_free(out)
    return arr


class NativePrefetcher:
    """Background-threaded, in-order image prefetcher over a path list."""

    def __init__(self, paths, n_threads: int = 2, capacity: int = 8, scale16: float = 1.0):
        lib = _load()
        if lib is None:
            raise RuntimeError("native library not built (make -C native)")
        self._lib = lib
        self._paths = [p.encode() for p in paths]
        arr = (ctypes.c_char_p * len(self._paths))(*self._paths)
        self._h = lib.tpuslam_prefetch_create(
            arr, len(self._paths), n_threads, capacity, ctypes.c_float(scale16)
        )
        self._n = len(self._paths)

    def __iter__(self):
        while True:
            buf = ctypes.POINTER(ctypes.c_float)()
            w = ctypes.c_int()
            h = ctypes.c_int()
            idx = self._lib.tpuslam_prefetch_next(
                self._h, ctypes.byref(buf), ctypes.byref(w), ctypes.byref(h)
            )
            if idx == -1:
                return
            if idx == -2:
                continue  # decode failure: skip frame
            arr = np.ctypeslib.as_array(buf, shape=(h.value, w.value)).copy()
            self._lib.tpuslam_release_frame(self._h, buf)
            yield int(idx), arr

    def close(self):
        if self._h:
            self._lib.tpuslam_prefetch_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def distribute_quadtree(xs, ys, responses, bounds, target: int) -> np.ndarray:
    """Exact sequential quadtree selection (parity oracle for the TPU
    per-cell selection). Returns a bool keep-mask."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library not built (make -C native)")
    xs = np.ascontiguousarray(xs, np.float32)
    ys = np.ascontiguousarray(ys, np.float32)
    rs = np.ascontiguousarray(responses, np.float32)
    keep = np.zeros(len(xs), np.int32)
    lib.tpuslam_distribute_quadtree(
        xs, ys, rs, len(xs),
        ctypes.c_float(bounds[0]), ctypes.c_float(bounds[1]),
        ctypes.c_float(bounds[2]), ctypes.c_float(bounds[3]),
        target, keep,
    )
    return keep.astype(bool)


def evaluate_ate(est: np.ndarray, gt: np.ndarray, fix_scale: bool = False):
    """ATE RMSE after Umeyama (Horn) alignment of est (N, 3) camera centers
    onto gt (N, 3); fix_scale=True constrains s=1 (SE3). Returns
    (rmse, scale, R (3,3), t (3,)). Native C++ (native/src/evaluate.cc) —
    the counterpart of the TUM benchmark's evaluate_ate.py the reference
    points users to (README.md:95-167)."""
    lib = _load()
    est = np.ascontiguousarray(est, np.float64)
    gt = np.ascontiguousarray(gt, np.float64)
    assert est.shape == gt.shape and est.ndim == 2 and est.shape[1] == 3
    if lib is None:
        # Pure-jax fallback via sfm.horn_sim3.
        import jax.numpy as jnp

        from tpuslam.sfm import horn_sim3

        s, R, t = horn_sim3(
            jnp.asarray(est, jnp.float32), jnp.asarray(gt, jnp.float32),
            jnp.ones(len(est)), fix_scale=fix_scale,
        )
        s, R, t = float(s), np.asarray(R, np.float64), np.asarray(t, np.float64)
        aligned = s * est @ R.T + t
        return float(np.sqrt(np.mean(np.sum((aligned - gt) ** 2, -1)))), s, R, t
    scale = ctypes.c_double()
    R = np.zeros((3, 3), np.float64)
    t = np.zeros((3,), np.float64)
    rmse = lib.tpuslam_ate(
        est, gt, est.shape[0], int(fix_scale), ctypes.byref(scale), R, t
    )
    if rmse < 0:
        raise ValueError("evaluate_ate: need at least 3 matched poses")
    return float(rmse), float(scale.value), R, t


def evaluate_rpe(est: np.ndarray, gt: np.ndarray, delta: int = 1) -> float:
    """RMS translational relative-pose error over a frame delta (native)."""
    lib = _load()
    est = np.ascontiguousarray(est, np.float64)
    gt = np.ascontiguousarray(gt, np.float64)
    if est.shape[0] <= delta:
        # Same error either backend (the native path returns < 0 for this).
        raise ValueError("evaluate_rpe: need more poses than delta")
    if lib is None:
        de = est[delta:] - est[:-delta]
        dg = gt[delta:] - gt[:-delta]
        return float(np.sqrt(np.mean(np.sum((de - dg) ** 2, -1))))
    out = lib.tpuslam_rpe(est, gt, est.shape[0], delta)
    if out < 0:
        raise ValueError("evaluate_rpe: need more poses than delta")
    return float(out)


def fast_nms_native(img: np.ndarray, min_th: float) -> np.ndarray:
    """Dense FAST-9/16 score + 3x3 NMS with the C++ kernel (native/src/
    fast.cc) — exact semantics of ops.orb.fast_response + _nms3."""
    lib = _load()
    im = np.ascontiguousarray(img, np.float32)
    out = np.empty_like(im)
    rc = lib.tpuslam_fast_nms(im, im.shape[0], im.shape[1], float(min_th), out)
    if rc != 0:
        raise RuntimeError("tpuslam_fast_nms failed")
    return out
