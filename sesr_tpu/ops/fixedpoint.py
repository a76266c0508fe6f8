"""Fixed-point primitives for the ASIC datapath.

These reproduce, bit for bit, the arithmetic conventions of the reference's
integer simulation (myQL/quan_func.py), expressed as pure jnp/python functions:

- saturating clamp at an arbitrary bit width (PE accumulator 18b, adder 20b,
  fused bias 16b — reference quan_func.py:327-370, 428-437, 486)
- the 16-bit-mantissa x 2^-n requantization constant encoder
  (reference quan_func.py:495-515 `quan_layer_between_const`)
- requant application in float32 (the reference multiplies int-valued float32
  tensors by a python-int mantissa then by 2^-n — both steps round to nearest
  float32, which is observable for |x*m| > 2^24, so we replicate the exact
  op order and dtype — reference quan_func.py:529,560,584,605)
- two's-complement hex formatting for the RTL vector exporters
  (reference output.py:13-39)
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def saturate(x, bits: int):
    """Clamp to the signed two's-complement range of ``bits`` bits.

    Works on jnp arrays of any dtype; comparison constants are python ints so
    integer inputs stay exact.
    """
    lo = -(1 << (bits - 1))
    hi = (1 << (bits - 1)) - 1
    return jnp.clip(x, lo, hi)


def encode_requant(value: float, data_bits: int = 16, shift_max: int = 32):
    """Encode a positive scale ratio as (mantissa, n) with value ~= m * 2^-n.

    Semantics match reference quan_func.py:495-515 exactly, including its
    truncating int() conversions and the asymmetric handling of values >= 1
    (n chosen so the mantissa has exactly ``data_bits`` significant bits; NOT
    clamped to shift_max) vs values < 1 (n = leading-zero count + data_bits,
    clamped to shift_max).
    """
    assert data_bits < shift_max, "requant data bit must be less than shift_max"
    value = float(value)
    assert value > 0.0, "requant constant must be positive"
    if int(value) != 0:
        # >= 1: integer part needs ceil(log2(int+1)) bits before the point
        before_point_bits = math.ceil(math.log2(int(value) + 1))
        n = data_bits - before_point_bits
    else:
        # < 1: count doublings until the integer part becomes nonzero
        data = value * 2
        times = 0
        while int(data) == 0:
            times += 1
            data = data * 2
        n = times + data_bits
        if n > shift_max:
            n = shift_max
    mantissa = int(value * (2 ** n))
    return mantissa, n


def apply_requant_f32(x, mantissa: int, n: int):
    """Apply x * mantissa * 2^-n with float32 rounding at each step.

    The reference computes this on float32 tensors holding integer values up
    to ~2^19 * 2^16 — beyond float32's 24-bit exact-integer range — so the
    intermediate rounding is part of the bit-exact contract. Op order matches
    reference quan_func.py:529 (`input * m * 2**(0-n)`).
    """
    x = x.astype(jnp.float32)
    y = x * jnp.float32(mantissa)
    return y * jnp.float32(2.0 ** (-n))


def int_to_hex(value, bit_width: int) -> str:
    """Two's-complement hex string of ``value`` at ``bit_width`` bits.

    Digit count is ceil(bit_width/4), matching the full-width variant of the
    reference's float_to_hex (output.py:13-39; the quan_func.py:22-42 copy
    only handles <=5 digits — a divergence we do not replicate).
    """
    digits = math.ceil(bit_width / 4)
    v = int(value)
    if v < 0:
        v += 1 << bit_width
    return format(v, "0{}x".format(max(digits, 2)))
