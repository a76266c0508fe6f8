"""The fused Pallas kernel must be BIT-EXACT with the integer interpreter
(which is itself bit-exact with the reference sim). Runs in interpret mode
on CPU; the same kernel compiles for real TPUs (benchmarked in bench.py)."""

import numpy as np
import pytest
import jax.numpy as jnp

from sesr_tpu.ops.pallas_pipeline import build_pallas_forward
from sesr_tpu.quant.integer import integer_forward
from tests.test_integer_bitexact import _load_golden, _golden_qparams


@pytest.mark.parametrize("task", ["nrdm_3", "sr_x4", "sr_x2"])
def test_pallas_bit_exact_vs_interpreter(task, rng):
    g = _load_golden(task)
    spec, params, qp = _golden_qparams(task, g)
    H, W = 40, 72
    x = jnp.asarray(rng.random((1, H, W, spec.in_channels), dtype=np.float32))
    y_ref, _ = integer_forward(spec, qp, x)
    f = build_pallas_forward(spec, qp, H, W, tile_h=16, tile_w=32, interpret=True)
    y = f(x)
    assert y.shape == y_ref.shape
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y_ref))


def test_pallas_bit_exact_golden_fixture():
    """Directly against the reference-generated golden output."""
    task = "sr_x4"
    g = _load_golden(task)
    spec, params, qp = _golden_qparams(task, g)
    x = jnp.asarray(g["fixture"].transpose(0, 2, 3, 1))
    H, W = x.shape[1], x.shape[2]
    f = build_pallas_forward(spec, qp, H, W, tile_h=16, tile_w=32, interpret=True)
    y = f(x)
    np.testing.assert_array_equal(np.asarray(y), g["gfake"].transpose(0, 2, 3, 1))


def test_pallas_unaligned_size(rng):
    """H/W not multiples of the tile: padding is masked, result identical."""
    task = "nrdm_3"
    g = _load_golden(task)
    spec, params, qp = _golden_qparams(task, g)
    H, W = 27, 45
    x = jnp.asarray(rng.random((1, H, W, spec.in_channels), dtype=np.float32))
    y_ref, _ = integer_forward(spec, qp, x)
    f = build_pallas_forward(spec, qp, H, W, tile_h=16, tile_w=32, interpret=True)
    np.testing.assert_array_equal(np.asarray(f(x)), np.asarray(y_ref))
