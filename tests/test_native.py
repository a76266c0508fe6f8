"""Native hex-export core: byte-identical to the Python executable spec,
and meaningfully faster."""

import time

import numpy as np
import pytest

from sesr_tpu.export import native
from sesr_tpu.export import vectors


@pytest.fixture(scope="module")
def have_native():
    if not native.available():
        pytest.skip("native hexport lib not buildable (no g++?)")
    return True


def _python_blocked(data, bits):
    # call the pure-Python body by temporarily disabling the native lib
    orig = native._lib
    native._lib, native._load_failed = None, True
    try:
        return vectors._blocked_stream(data, bits)
    finally:
        native._lib, native._load_failed = orig, False


@pytest.mark.parametrize("shape,bits", [
    ((16, 80, 96), 18), ((16, 33, 47), 20), ((3, 32, 32), 8), ((12, 7, 100), 18),
])
def test_blocked_stream_matches_python(have_native, rng, shape, bits):
    lo = -(1 << (bits - 1))
    hi = (1 << (bits - 1)) - 1
    data = rng.integers(lo, hi + 1, shape).astype(np.int32)
    got = native.blocked_stream(data, bits)
    want = _python_blocked(data, bits)
    assert got == want


def test_input_tiles_matches_python(have_native, rng):
    from sesr_tpu.quant.params import QuantParams
    import os
    art = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                       "qparams_nrdm_3.npz")
    if not os.path.exists(art):
        pytest.skip("artifact missing")
    qp = QuantParams.load(art)
    data = rng.integers(-128, 128, (1, 40, 72, 3)).astype(np.float32)
    dumps = {"input.0": data,
             "input.1": rng.integers(-128, 128, (1, 40, 72, 16)).astype(np.float32)}
    orig = native._lib
    native._lib, native._load_failed = None, True
    try:
        want = vectors.export_input_tiles(qp, dumps, [5])
    finally:
        native._lib, native._load_failed = orig, False
    got = vectors.export_input_tiles(qp, dumps, [5])
    assert got["input.0.txt"] == want["input.0.txt"]
    assert got["input.1.txt"] == want["input.1.txt"]


def test_native_speedup(have_native, rng):
    data = rng.integers(-(1 << 17), 1 << 17, (16, 160, 960)).astype(np.int32)
    native.blocked_stream(data, 18)          # warm (lib load, page-in)
    t0 = time.perf_counter()
    native.blocked_stream(data, 18)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    _python_blocked(data, 18)
    t_python = time.perf_counter() - t0
    assert t_native < t_python / 3, (t_native, t_python)
