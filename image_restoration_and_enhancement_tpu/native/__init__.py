"""Native (C++) host-preprocessing library with lazy build + numpy fallback.

Builds `libpreprocess.so` from preprocess.cpp on first use (g++ -O3); every
entry point has a pure-numpy fallback so the framework works without a
compiler. See preprocess.cpp for the rationale.
"""
from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "preprocess.cpp")
_SO = os.path.join(_DIR, "libpreprocess.so")
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> Optional[ctypes.CDLL]:
    global _build_failed
    if _build_failed:
        return None
    try:
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-o", _SO, _SRC],
                check=True, capture_output=True,
            )
        lib = ctypes.CDLL(_SO)
        f32p = ctypes.POINTER(ctypes.c_float)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.resize_bicubic_f32.argtypes = [f32p] + [ctypes.c_int] * 3 + [f32p] + [ctypes.c_int] * 2
        lib.u8_to_pm1.argtypes = [u8p, ctypes.c_int, f32p]
        lib.pm1_to_u8.argtypes = [f32p, ctypes.c_int, u8p]
        lib.add_gaussian_noise_u8.argtypes = [u8p, ctypes.c_int, ctypes.c_float, ctypes.c_uint64]
        lib.rgb_to_lab_l_u8.argtypes = [u8p, ctypes.c_int, u8p]
        return lib
    except Exception:
        logger.warning("native preprocess build failed; using numpy fallback", exc_info=True)
        _build_failed = True
        return None


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is None and not _build_failed:
        _lib = _build()
    return _lib


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _u8ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def resize_bicubic(img: np.ndarray, out_hw) -> np.ndarray:
    """Bicubic resize float32 HWC.

    Backend order is MEASURED, not ideological (scripts/bench_loader.py +
    the round-4 standalone grid): cv2's SIMD separable bicubic beats the
    scalar C++ loop 7-15x at the loader's shapes (64->256: 0.19 vs 2.60
    ms), so cv2 is primary and the C++ lib is the no-cv2 fallback."""
    img = np.ascontiguousarray(img, dtype=np.float32)
    h, w, c = img.shape
    dh, dw = out_hw
    try:
        import cv2

        return cv2.resize(img, (dw, dh), interpolation=cv2.INTER_CUBIC)
    except ImportError:
        pass
    lib = get_lib()
    if lib is not None:
        out = np.empty((dh, dw, c), dtype=np.float32)
        lib.resize_bicubic_f32(_fptr(img), h, w, c, _fptr(out), dh, dw)
        return out
    raise RuntimeError("neither cv2 nor the native library is available")


def to_pm1(img_u8: np.ndarray) -> np.ndarray:
    """uint8 -> float32 [-1,1]. Native primary (measured ~3x faster than
    the numpy astype/scale chain at 256px: 0.05 vs 0.15 ms — one fused
    pass, no float temporaries; ~+10% loader throughput end to end)."""
    img_u8 = np.ascontiguousarray(img_u8, dtype=np.uint8)
    lib = get_lib()
    if lib is not None:
        out = np.empty(img_u8.shape, dtype=np.float32)
        lib.u8_to_pm1(_u8ptr(img_u8), img_u8.size, _fptr(out))
        return out
    return img_u8.astype(np.float32) / 127.5 - 1.0


def from_pm1(img: np.ndarray) -> np.ndarray:
    img = np.ascontiguousarray(img, dtype=np.float32)
    lib = get_lib()
    if lib is not None:
        out = np.empty(img.shape, dtype=np.uint8)
        lib.pm1_to_u8(_fptr(img), img.size, _u8ptr(out))
        return out
    return np.rint((img + 1.0) * 127.5).clip(0, 255).astype(np.uint8)


def add_gaussian_noise_u8(img_u8: np.ndarray, sigma: float, seed: int) -> np.ndarray:
    """Native primary (measured 1.8x faster than numpy's normal+clip chain
    at 256px: 2.1 vs 3.8 ms — fused xorshift+Box-Muller, no float temps)."""
    out = np.ascontiguousarray(img_u8, dtype=np.uint8).copy()
    lib = get_lib()
    if lib is not None:
        lib.add_gaussian_noise_u8(_u8ptr(out), out.size, ctypes.c_float(sigma),
                                  ctypes.c_uint64(seed))
        return out
    rng = np.random.default_rng(seed)
    noisy = out.astype(np.float32) + rng.normal(0, sigma, out.shape)
    return noisy.clip(0, 255).astype(np.uint8)


def rgb_to_lab_l(img_u8: np.ndarray) -> np.ndarray:
    """RGB u8 HWC -> LAB-L u8 HW (cv2 scale convention).

    cv2 primary (measured 2x faster than the scalar C++ loop at 256px:
    2.08 vs 4.06 ms), C++ lib as the no-cv2 fallback."""
    img_u8 = np.ascontiguousarray(img_u8, dtype=np.uint8)
    h, w, _ = img_u8.shape
    try:
        import cv2

        return cv2.cvtColor(img_u8, cv2.COLOR_RGB2LAB)[:, :, 0]
    except ImportError:
        pass
    lib = get_lib()
    if lib is not None:
        out = np.empty((h, w), dtype=np.uint8)
        lib.rgb_to_lab_l_u8(_u8ptr(img_u8), h * w, _u8ptr(out))
        return out
    raise RuntimeError("neither cv2 nor the native library is available")
