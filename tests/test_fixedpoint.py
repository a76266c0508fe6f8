"""Unit tests for the fixed-point primitives against hand-computed values and
(when available) the reference implementation itself."""

import math
import sys

import jax.numpy as jnp
import numpy as np
import pytest

from sesr_tpu.ops.fixedpoint import (
    saturate, encode_requant, apply_requant_f32, int_to_hex,
)
from tests.conftest import REFERENCE_ROOT, requires_reference


def test_saturate_bounds():
    x = jnp.array([-(2 ** 20), -131073, -131072, -5, 0, 7, 131071, 131072, 2 ** 20])
    y = saturate(x, 18)
    np.testing.assert_array_equal(
        np.asarray(y),
        [-131072, -131072, -131072, -5, 0, 7, 131071, 131071, 131071],
    )


def test_encode_requant_small_value():
    # value < 1: n = leading-zero doublings + 16, mantissa = trunc(v * 2^n)
    m, n = encode_requant(0.25, 16, 32)
    assert n == 17  # int(0.25*2)=0 -> times=1 -> 1+16
    assert m == int(0.25 * 2 ** 17) == 32768


def test_encode_requant_ge_one():
    m, n = encode_requant(3.0, 16, 32)
    # int bits = ceil(log2(4)) = 2 -> n = 14, m = 3 * 2^14
    assert (m, n) == (3 * 2 ** 14, 14)


def test_encode_requant_shift_clamp():
    v = 2.0 ** -40
    m, n = encode_requant(v, 16, 32)
    assert n == 32
    assert m == int(v * 2 ** 32) == 0  # underflow truncates to 0, as upstream


def test_encode_requant_mantissa_width():
    for v in [0.9999, 0.5, 0.017, 1.5, 123.456]:
        m, n = encode_requant(v, 16, 32)
        assert 0 <= m < 2 ** 16
        assert abs(m * 2.0 ** -n - v) <= v * 2 ** -15


@requires_reference
def test_encode_requant_matches_reference():
    sys.path.insert(0, REFERENCE_ROOT)
    try:
        from myQL.quan_func import quan_layer_between_const
    finally:
        sys.path.remove(REFERENCE_ROOT)
    rng = np.random.default_rng(0)
    values = list(10.0 ** rng.uniform(-6, 3, size=200)) + [0.5, 1.0, 2.0, 65535.9]
    for v in values:
        assert encode_requant(v, 16, 32) == quan_layer_between_const(v, 16, 32), v


def test_apply_requant_f32_matches_float32_order():
    # values large enough that f32 rounding is observable
    x = jnp.array([524287.0, -524288.0, 123456.0], dtype=jnp.float32)
    m, n = 65535, 16
    got = np.asarray(apply_requant_f32(x, m, n))
    want = (np.float32(x) * np.float32(m)) * np.float32(2.0 ** -n)
    np.testing.assert_array_equal(got, np.float32(want))


def test_int_to_hex():
    assert int_to_hex(127, 8) == "7f"
    assert int_to_hex(-1, 8) == "ff"
    assert int_to_hex(-128, 8) == "80"
    assert int_to_hex(-1, 18) == "3ffff"
    assert int_to_hex(5, 8) == "05"
    assert int_to_hex(-1, 16) == "ffff"
    assert int_to_hex(3, math.log2(32)) == "03"  # requant shift table width
