"""Sharded (dp x sp + halo) execution must equal monolithic execution —
bit-exactly for the integer path — on a virtual 8-device CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sesr_tpu.config import spec_for_task
from sesr_tpu.models.blocks import oihw_to_hwio
from sesr_tpu.models.sesr import CollapsedParams, forward_float, init_params
from sesr_tpu.parallel.tiling import (
    make_mesh, sharded_integer_forward, sharded_float_forward,
)
from sesr_tpu.ops.halo import halo_exchange_w
from sesr_tpu.quant.params import CalibState, quantize_weights, finalize
from sesr_tpu.quant.integer import integer_forward

from tests.test_integer_bitexact import _load_golden, _golden_qparams


def test_devices_available():
    assert len(jax.devices()) >= 8, "conftest must force an 8-device CPU mesh"


@pytest.mark.parametrize("dp,sp", [(1, 8), (2, 4), (1, 4)])
def test_sharded_integer_bit_exact(dp, sp):
    task = "nrdm_3"
    g = _load_golden(task)
    spec, params, qp = _golden_qparams(task, g)
    mesh = make_mesh(dp * sp, dp=dp, sp=sp)

    rng = np.random.default_rng(7)
    x = rng.random((dp, 24, 8 * sp * 3, spec.in_channels), dtype=np.float32)

    y_mono, _ = integer_forward(spec, qp, jnp.asarray(x))
    f = sharded_integer_forward(spec, qp, mesh)
    y_shard = f(jnp.asarray(x))

    np.testing.assert_array_equal(np.asarray(y_shard), np.asarray(y_mono))


def test_sharded_integer_bit_exact_pixelshuffle():
    task = "sr_x4"
    g = _load_golden(task)
    spec, params, qp = _golden_qparams(task, g)
    mesh = make_mesh(8, dp=2, sp=4)

    rng = np.random.default_rng(8)
    x = rng.random((2, 16, 40, spec.in_channels), dtype=np.float32)

    y_mono, _ = integer_forward(spec, qp, jnp.asarray(x))
    f = sharded_integer_forward(spec, qp, mesh)
    y_shard = f(jnp.asarray(x))
    assert y_shard.shape == y_mono.shape  # (2, 64, 160, 1)
    np.testing.assert_array_equal(np.asarray(y_shard), np.asarray(y_mono))


def test_sharded_float_close():
    spec = spec_for_task("nrdm_6")
    params = init_params(spec, jax.random.PRNGKey(3))
    mesh = make_mesh(8, dp=1, sp=8)
    rng = np.random.default_rng(9)
    x = rng.random((1, 20, 64, spec.in_channels), dtype=np.float32)

    y_mono = forward_float(spec, params, jnp.asarray(x))
    y_shard = sharded_float_forward(spec, params, mesh)(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(y_shard), np.asarray(y_mono),
                               rtol=1e-5, atol=1e-5)


def test_halo_mode_unsharded_equals_same_mode():
    """halo_axis=None per-layer zero-extension == SAME mode, monolithic."""
    spec = spec_for_task("nrdm_3")
    params = init_params(spec, jax.random.PRNGKey(4))
    rng = np.random.default_rng(10)
    x = rng.random((1, 12, 30, 3), dtype=np.float32)
    y_same = forward_float(spec, params, jnp.asarray(x))
    y_halo = forward_float(spec, params, jnp.asarray(x), halo_axis=None)
    np.testing.assert_allclose(np.asarray(y_halo), np.asarray(y_same),
                               rtol=1e-6, atol=1e-6)


def test_sharded_calibration_matches_monolithic(rng):
    """Distributed calibration (pmin/pmax over the mesh) produces the same
    quantization constants as single-device calibration."""
    from sesr_tpu.parallel.tiling import sharded_calibrate
    from sesr_tpu.quant.calibrate import calibrate
    from sesr_tpu.io.torch_import import load_reference_checkpoint

    spec = spec_for_task("nrdm_3")
    params = load_reference_checkpoint("nrdm_3")
    imgs = [rng.random((2, 16, 48, 3), dtype=np.float32) for _ in range(2)]
    mesh = make_mesh(8, dp=2, sp=4)

    qp_mono = calibrate(spec, params, imgs)
    qp_shard = sharded_calibrate(spec, params, imgs, mesh)

    for d in range(spec.num_convs + 1):
        assert qp_shard.a_scale[d] == pytest.approx(qp_mono.a_scale[d], rel=1e-6), d
        assert qp_shard.a_zero[d] == qp_mono.a_zero[d], d
    assert qp_shard.requant_m == qp_mono.requant_m
    assert qp_shard.requant_n == qp_mono.requant_n
