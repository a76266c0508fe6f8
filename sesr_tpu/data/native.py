"""ctypes bindings for the native raw-Bayer IO core (native/bayerio.cpp).

The hot input path of the deployment pipeline — .raw uint16 read +
sparse/dense 3-channel expansion — in C++, with a silent fallback to the
pure-Python/numpy implementations in data/bayer.py (which remain the
executable spec; tests/test_native.py asserts bit-identical float32
output). Builds on first use if g++ is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libbayerio.so")

_lib = None
_load_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(["make", "-C", _NATIVE_DIR, "libbayerio.so"],
                           check=True, capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)
        lib.read_raw_u16.restype = ctypes.c_long
        lib.read_raw_u16.argtypes = [ctypes.c_char_p, ctypes.c_long,
                                     ctypes.POINTER(ctypes.c_uint16)]
        for name in ("expand_sparse", "expand_dense"):
            fn = getattr(lib, name)
            fn.restype = None
            fn.argtypes = [ctypes.POINTER(ctypes.c_uint16), ctypes.c_long,
                           ctypes.c_long, ctypes.c_float,
                           ctypes.POINTER(ctypes.c_float)]
        _lib = lib
    except Exception:
        _load_failed = True
    return _lib


def available() -> bool:
    return _load() is not None


def read_raw(path: str, w: int, h: int) -> Optional[np.ndarray]:
    """uint16 (w, h) plane via the native reader, or None (fallback)."""
    lib = _load()
    if lib is None:
        return None
    out = np.empty(w * h, np.uint16)
    got = lib.read_raw_u16(path.encode(), w * h,
                           out.ctypes.data_as(
                               ctypes.POINTER(ctypes.c_uint16)))
    if got != w * h:
        return None
    return out.reshape(w, h)


def expand(raw_hw: np.ndarray, dense: bool,
           denom: float = float(2 ** 12 - 1)) -> Optional[np.ndarray]:
    """(3, H, W) float32 expansion of a uint16 Bayer plane, or None.
    Matches data/bayer.py expand_bayer_plane{,_dense}(raw/denom) bit-for-
    bit (both divide each sample by `denom` in float32)."""
    lib = _load()
    if lib is None:
        return None
    raw_hw = np.ascontiguousarray(raw_hw, np.uint16)
    h, w = raw_hw.shape
    if dense and (h % 2 or w % 2):
        return None                     # numpy spec requires even sizes
    out = np.empty((3, h, w), np.float32)
    fn = lib.expand_dense if dense else lib.expand_sparse
    fn(raw_hw.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), h, w,
       ctypes.c_float(denom),
       out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out
