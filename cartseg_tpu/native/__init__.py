"""Native host runtime (C++ via ctypes): exact EDT oracle and the fused
letterbox+resize loader path — the TPU-framework counterparts of the
reference's native layer (its CUDA lsr_cpp extension lives on device as
Pallas kernels; the HOST-side native work here is where C++ still pays:
data loading and exact CPU transforms).

Compiled lazily on first import with g++ (-O3 -fopenmp), cached as
_cartseg_native.so next to this file; everything degrades gracefully to
the numpy/scipy/cv2 fallbacks when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_HERE = Path(__file__).parent
_SO = _HERE / "_cartseg_native.so"
_SOURCES = [_HERE / "edt.cpp", _HERE / "preproc.cpp"]

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[Path]:
    cmd = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-fopenmp",
           "-o", str(_SO)] + [str(s) for s in _SOURCES]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        return _SO
    except Exception:
        # retry without -march=native / openmp (portability)
        try:
            cmd = ["g++", "-O3", "-shared", "-fPIC", "-o", str(_SO)] + \
                [str(s) for s in _SOURCES]
            subprocess.run(cmd, check=True, capture_output=True, timeout=300)
            return _SO
        except Exception:
            return None


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, building it on first use; None if no
    toolchain is available (callers fall back to numpy)."""
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        stale = _SO.exists() and any(
            s.exists() and s.stat().st_mtime > _SO.stat().st_mtime
            for s in _SOURCES)
        if _SO.exists() and not stale:
            so = _SO
        else:
            so = _build() or (_SO if _SO.exists() else None)
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(str(so))
        except OSError:
            return None
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.edt_sq.argtypes = [u8p, f32p, ctypes.c_int, ctypes.c_int]
        lib.edt_sq.restype = None
        lib.letterbox_resize_u8.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, u8p, ctypes.c_int,
            ctypes.c_int, ctypes.c_float, ctypes.c_uint8, ctypes.c_uint8,
            ctypes.c_uint8]
        lib.letterbox_resize_u8.restype = None
        lib.resize_nearest_u8.argtypes = [
            u8p, ctypes.c_int, ctypes.c_int, u8p, ctypes.c_int,
            ctypes.c_int]
        lib.resize_nearest_u8.restype = None
        _lib = lib
        return _lib


def available() -> bool:
    return get_lib() is not None


def edt_exact(seeds: np.ndarray) -> np.ndarray:
    """Exact Euclidean distance to the nearest True pixel (float32).
    Falls back to scipy when the native lib is unavailable."""
    seeds = np.ascontiguousarray(seeds.astype(np.uint8))
    lib = get_lib()
    if lib is None:
        from scipy import ndimage
        return ndimage.distance_transform_edt(~(seeds > 0)).astype(np.float32)
    h, w = seeds.shape
    out = np.empty((h, w), np.float32)
    lib.edt_sq(seeds, out, h, w)
    return np.sqrt(out)


def distance_transform_edt(mask: np.ndarray) -> np.ndarray:
    """scipy semantics: for nonzero pixels, distance to nearest zero."""
    mask = mask > 0
    d = edt_exact(~mask)
    d[~mask] = 0.0
    return d


def letterbox_resize(img: np.ndarray, out_hw, side_ratio: float = 0.1,
                     pad=(0, 0, 0)) -> np.ndarray:
    """Fused letterbox+bilinear-resize of an HxWx3 uint8 image. Falls
    back to geometry.letterbox_and_resize (numpy+cv2)."""
    lib = get_lib()
    if lib is None:
        from cartseg_tpu.geometry import letterbox_and_resize
        return letterbox_and_resize(img, out_hw, side_ratio)
    img = np.ascontiguousarray(img, np.uint8)
    sh, sw = img.shape[:2]
    dh, dw = out_hw
    out = np.empty((dh, dw, 3), np.uint8)
    lib.letterbox_resize_u8(img, sh, sw, out, dh, dw,
                            ctypes.c_float(side_ratio),
                            pad[0], pad[1], pad[2])
    return out


def resize_nearest(mask: np.ndarray, out_hw) -> np.ndarray:
    """Nearest resize of an HxW uint8 mask (cv2 convention)."""
    lib = get_lib()
    if lib is None:
        import cv2
        return cv2.resize(mask, (out_hw[1], out_hw[0]),
                          interpolation=cv2.INTER_NEAREST)
    mask = np.ascontiguousarray(mask, np.uint8)
    sh, sw = mask.shape
    dh, dw = out_hw
    out = np.empty((dh, dw), np.uint8)
    lib.resize_nearest_u8(mask, sh, sw, out, dh, dw)
    return out
