"""ctypes bindings for the native hex-export core (native/hexport.cpp).

Builds on first use if g++ is available; falls back silently to the pure-
Python formatters in export/vectors.py otherwise (those remain the
executable spec — tests/test_native.py asserts byte-identical output).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libhexport.so")

_lib = None
_load_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    try:
        if not os.path.exists(_LIB_PATH):
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(_LIB_PATH)
        for name in ("blocked_stream", "input_tiles"):
            fn = getattr(lib, name)
            fn.restype = ctypes.c_long
        lib.blocked_stream.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_long, ctypes.c_long,
            ctypes.c_long, ctypes.c_int, ctypes.c_int,
            ctypes.c_char_p, ctypes.c_long]
        lib.blocked_stream_size.restype = ctypes.c_long
        lib.blocked_stream_size.argtypes = [
            ctypes.c_long, ctypes.c_long, ctypes.c_long,
            ctypes.c_int, ctypes.c_int]
        lib.input_tiles.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_long, ctypes.c_long,
            ctypes.c_long, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_char_p, ctypes.c_long]
        lib.input_tiles_size.restype = ctypes.c_long
        lib.input_tiles_size.argtypes = [
            ctypes.c_long, ctypes.c_long, ctypes.c_long,
            ctypes.c_int, ctypes.c_int]
        _lib = lib
    except Exception:
        _load_failed = True
    return _lib


def available() -> bool:
    return _load() is not None


def _as_i32(data_chw: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(data_chw), dtype=np.int32)


def blocked_stream(data_chw: np.ndarray, bits: int, tile: int = 32) -> Optional[str]:
    lib = _load()
    if lib is None:
        return None
    d = _as_i32(data_chw)
    c, h, w = d.shape
    cap = lib.blocked_stream_size(c, h, w, bits, tile)
    buf = ctypes.create_string_buffer(int(cap))
    n = lib.blocked_stream(d.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                           c, h, w, bits, tile, buf, cap)
    if n < 0:
        return None
    return buf.raw[:n].decode("ascii")


def input_tiles(data_chw: np.ndarray, bits: int, tile: int,
                h_overlap: int, w_overlap: int) -> Optional[str]:
    lib = _load()
    if lib is None:
        return None
    d = _as_i32(data_chw)
    c, h, w = d.shape
    cap = lib.input_tiles_size(c, h, w, bits, tile)
    buf = ctypes.create_string_buffer(int(cap))
    n = lib.input_tiles(d.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                        c, h, w, bits, tile, h_overlap, w_overlap, buf, cap)
    if n < 0:
        return None
    return buf.raw[:n].decode("ascii")
