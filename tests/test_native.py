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


# ---- native raw-Bayer IO core (native/bayerio.cpp) -------------------------


@pytest.fixture(scope="module")
def have_bayerio():
    from sesr_tpu.data import native as dnative
    if not dnative.available():
        pytest.skip("native bayerio lib not buildable (no g++?)")
    return True


@pytest.mark.parametrize("dense", [False, True])
@pytest.mark.parametrize("hw", [(16, 24), (64, 64)])
def test_bayerio_expand_bitexact(have_bayerio, dense, hw):
    """Native expansion == the numpy executable spec, bit-for-bit f32."""
    from sesr_tpu.data import native as dnative
    from sesr_tpu.data.bayer import expand_bayer_plane, expand_bayer_plane_dense

    rng = np.random.default_rng(3)
    raw = rng.integers(0, 4096, hw, dtype=np.uint16)
    want_fn = expand_bayer_plane_dense if dense else expand_bayer_plane
    want = want_fn(raw.astype(np.float32) / (2 ** 12 - 1))
    got = dnative.expand(raw, dense=dense)
    assert got is not None and got.dtype == np.float32
    np.testing.assert_array_equal(got, want)


def test_bayerio_sparse_odd_sizes(have_bayerio):
    from sesr_tpu.data import native as dnative
    from sesr_tpu.data.bayer import expand_bayer_plane

    rng = np.random.default_rng(5)
    raw = rng.integers(0, 4096, (15, 21), dtype=np.uint16)
    want = expand_bayer_plane(raw.astype(np.float32) / (2 ** 12 - 1))
    np.testing.assert_array_equal(dnative.expand(raw, dense=False), want)
    # dense requires even sizes (the numpy spec errors on odd): native
    # returns None so callers fall back
    assert dnative.expand(raw, dense=True) is None


def test_bayerio_read_raw(have_bayerio, tmp_path):
    from sesr_tpu.data import native as dnative

    rng = np.random.default_rng(7)
    raw = rng.integers(0, 4096, (32, 40), dtype=np.uint16)
    p = str(tmp_path / "scene_32_40.raw")
    raw.tofile(p)
    got = dnative.read_raw(p, 32, 40)
    np.testing.assert_array_equal(got, raw)
    assert dnative.read_raw(str(tmp_path / "missing.raw"), 4, 4) is None


def test_bayerio_read_raw_rejects_size_mismatch(have_bayerio, tmp_path):
    """The numpy executable spec (np.fromfile().reshape(w, h)) errors on
    files whose size is not exactly w*h entries; the native reader must not
    silently truncate an oversized (trailing-garbage) file either."""
    from sesr_tpu.data import native as dnative

    rng = np.random.default_rng(11)
    raw = rng.integers(0, 4096, (8, 10), dtype=np.uint16)
    p = str(tmp_path / "trailing_8_10.raw")
    with open(p, "wb") as f:
        f.write(raw.tobytes())
        f.write(b"\x00\x01\x02")                    # trailing garbage
    assert dnative.read_raw(p, 8, 10) is None       # falls back to the spec
    short = str(tmp_path / "short_8_10.raw")
    with open(short, "wb") as f:
        f.write(raw.tobytes()[:-4])
    assert dnative.read_raw(short, 8, 10) is None


def test_bayerio_faster_than_numpy(have_bayerio):
    from sesr_tpu.data import native as dnative
    from sesr_tpu.data.bayer import expand_bayer_plane

    rng = np.random.default_rng(9)
    raw = rng.integers(0, 4096, (1080, 1920), dtype=np.uint16)
    for _ in range(2):  # warm
        dnative.expand(raw, dense=False)
        expand_bayer_plane(raw.astype(np.float32) / 4095.0)
    t0 = time.perf_counter()
    for _ in range(5):
        dnative.expand(raw, dense=False)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(5):
        expand_bayer_plane(raw.astype(np.float32) / 4095.0)
    t_numpy = time.perf_counter() - t0
    # don't flake on machine noise; just require "not slower"
    assert t_native < t_numpy * 1.2, (t_native, t_numpy)
