"""ctypes bindings for the native raster-preprocessing library
(native/raster_ops.cc): multithreaded SAR/RGB/DSM normalization and box
resize for the CPU side of the input pipeline — the TPU-framework
counterpart of the reference's vendored C++/CUDA extension build
(downstream/*/modeling/pixel_decoder/ops/setup.py + make.sh).

Auto-builds with `make -C native` on first use when a toolchain exists;
falls back to the pure-numpy implementations in data/dfc2023.py otherwise.
Parity between the two is tested (tests/test_native.py).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

from .dfc2023 import RGB_MEAN, RGB_STD, SAR_MEAN, SAR_STD

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libraster_ops.so")
_lib: Optional[ctypes.CDLL] = None
_build_attempted = False

_F32P = ctypes.POINTER(ctypes.c_float)


def _try_build() -> bool:
    global _build_attempted
    if _build_attempted:
        return os.path.exists(_LIB_PATH)
    _build_attempted = True
    src = os.path.join(_NATIVE_DIR, "raster_ops.cc")
    if os.path.exists(_LIB_PATH) and (
            not os.path.exists(src)
            or os.path.getmtime(_LIB_PATH) >= os.path.getmtime(src)):
        return True  # up to date (make semantics; stale .so lacks new symbols)
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR], check=True,
            capture_output=True, timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def load_library() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not _try_build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.sar_normalize.argtypes = [_F32P, _F32P, ctypes.c_int64, ctypes.c_float,
                                  ctypes.c_float, ctypes.c_int]
    lib.channel_zscore.argtypes = [_F32P, _F32P, ctypes.c_int64, ctypes.c_int64,
                                   _F32P, _F32P, ctypes.c_int]
    lib.standardize.argtypes = [_F32P, _F32P, ctypes.c_int64, ctypes.c_int]
    lib.box_resize.argtypes = [_F32P, _F32P] + [ctypes.c_int64] * 5 + [ctypes.c_int]
    lib.sar_normalize_batch.argtypes = [_F32P, _F32P, ctypes.c_int64,
                                        ctypes.c_int64, ctypes.c_float,
                                        ctypes.c_float, ctypes.c_int]
    lib.standardize_batch.argtypes = [_F32P, _F32P, ctypes.c_int64,
                                      ctypes.c_int64, ctypes.c_int]
    for fn, ptr in (("rgb_u8_hwc_normalize", ctypes.POINTER(ctypes.c_uint8)),
                    ("rgb_u16_hwc_normalize", ctypes.POINTER(ctypes.c_uint16))):
        if hasattr(lib, fn):  # stale .so without the fused kernels: rebuild
            getattr(lib, fn).argtypes = [ptr, _F32P, ctypes.c_int64, _F32P, _F32P]
    _lib = lib
    return lib


def available() -> bool:
    return load_library() is not None


def _fp(a: np.ndarray):
    return a.ctypes.data_as(_F32P)


def _prep(a) -> np.ndarray:
    return np.ascontiguousarray(a, np.float32)


def sar_normalize(x: np.ndarray, num_threads: int = 4) -> np.ndarray:
    lib = load_library()
    x = _prep(x)
    out = np.empty_like(x)
    lib.sar_normalize(_fp(x), _fp(out), x.size, SAR_MEAN, SAR_STD, num_threads)
    return out


def rgb_normalize(x: np.ndarray, num_threads: int = 4) -> np.ndarray:
    """x: [3, H, W]."""
    lib = load_library()
    x = _prep(np.nan_to_num(x))
    out = np.empty_like(x)
    mean = _prep(RGB_MEAN)
    std = _prep(RGB_STD)
    lib.channel_zscore(_fp(x), _fp(out), x.shape[0],
                       x.size // x.shape[0], _fp(mean), _fp(std), num_threads)
    return out


def dsm_standardize(x: np.ndarray, num_threads: int = 4) -> np.ndarray:
    lib = load_library()
    x = _prep(x)
    out = np.empty_like(x)
    lib.standardize(_fp(x), _fp(out), x.size, num_threads)
    return out


def box_resize(x: np.ndarray, size: int, num_threads: int = 4) -> np.ndarray:
    """x: [C, H, W] -> [C, size, size]."""
    lib = load_library()
    x = _prep(x)
    c, h, w = x.shape
    out = np.empty((c, size, size), np.float32)
    lib.box_resize(_fp(x), _fp(out), c, h, w, size, size, num_threads)
    return out


def rgb_hwc_normalize_into(x: np.ndarray, out: np.ndarray) -> bool:
    """Fused raw-HWC-RGB -> normalized float32 HWC, written into ``out``
    (a contiguous [H, W, 3] batch-buffer slot). One read + one write pass;
    returns False when the dtype has no fused kernel (caller falls back)."""
    lib = load_library()
    if x.dtype == np.uint8 and hasattr(lib, "rgb_u8_hwc_normalize"):
        fn, ptr = lib.rgb_u8_hwc_normalize, ctypes.POINTER(ctypes.c_uint8)
    elif x.dtype == np.uint16 and hasattr(lib, "rgb_u16_hwc_normalize"):
        fn, ptr = lib.rgb_u16_hwc_normalize, ctypes.POINTER(ctypes.c_uint16)
    else:
        return False
    assert x.flags.c_contiguous and out.flags.c_contiguous
    assert x.shape == out.shape and x.shape[-1] == 3
    mean = _prep(RGB_MEAN)
    std = _prep(RGB_STD)
    fn(x.ctypes.data_as(ptr), _fp(out), x.size // 3, _fp(mean), _fp(std))
    return True


def sar_normalize_into(x: np.ndarray, out: np.ndarray) -> None:
    """SAR normalize into a preallocated slot (layout-free elementwise)."""
    lib = load_library()
    x = _prep(x)
    assert out.flags.c_contiguous and x.size == out.size
    lib.sar_normalize(_fp(x), _fp(out), x.size, SAR_MEAN, SAR_STD, 1)


def standardize_into(x: np.ndarray, out: np.ndarray) -> None:
    """Per-image standardize into a preallocated slot."""
    lib = load_library()
    x = _prep(x)
    assert out.flags.c_contiguous and x.size == out.size
    lib.standardize(_fp(x), _fp(out), x.size, 1)


def sar_normalize_batch(x: np.ndarray, num_threads: int = 8) -> np.ndarray:
    lib = load_library()
    x = _prep(x)
    out = np.empty_like(x)
    b = x.shape[0]
    lib.sar_normalize_batch(_fp(x), _fp(out), b, x.size // b,
                            SAR_MEAN, SAR_STD, num_threads)
    return out


def dsm_standardize_batch(x: np.ndarray, num_threads: int = 8) -> np.ndarray:
    lib = load_library()
    x = _prep(x)
    out = np.empty_like(x)
    b = x.shape[0]
    lib.standardize_batch(_fp(x), _fp(out), b, x.size // b, num_threads)
    return out
