"""Experimental archs (inception/split/anchor) + extra QAT activation ops."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from sesr_tpu.config import spec_for_task, SESRSpec
from sesr_tpu.models.sesr import init_params
from sesr_tpu.models.experimental import (
    InceptionSESRParams, SplitSESRParams, inception_path_spec,
    forward_inception, forward_split, anchor_upsample, anchor_weights,
)
from sesr_tpu.quant.qat import (
    QATConfig, QuantizerState, quant_relu, quant_leaky_relu,
    quant_adaptive_avg_pool, _fresh_qstate,
)


def _path_params(spec, key):
    pre = SESRSpec(spec.name, spec.in_channels,
                   spec.out_channels * spec.scaling_factor ** 2,
                   num_channels=spec.num_channels,
                   num_lblocks=spec.num_lblocks, scaling_factor=1)
    return init_params(pre, key)


def test_inception_forward(rng):
    base = spec_for_task("sr_x4")
    specs = inception_path_spec(base)
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    params = InceptionSESRParams([_path_params(s, k) for s, k in zip(specs, keys)])
    x = jnp.asarray(rng.random((1, 12, 16, 1), dtype=np.float32))
    y = forward_inception(base, params, x)
    assert y.shape == (1, 48, 64, 1)
    # single_path + conv_scale selects one path (sesr_arch.py:89-94)
    singles = [forward_inception(base, params, x, single_path=True,
                                 conv_scale=cs) for cs in (1, 2, 3)]
    for y1 in singles:
        assert y1.shape == y.shape
        assert not np.allclose(np.asarray(y), np.asarray(y1))
    # the sum of the three selected paths is the default output
    np.testing.assert_allclose(np.asarray(singles[0] + singles[1] + singles[2]),
                               np.asarray(y), rtol=1e-5, atol=1e-6)
    with pytest.raises(ValueError):
        forward_inception(base, params, x, single_path=True, conv_scale=4)


def test_split_forward(rng):
    spec = spec_for_task("sr_x4")
    t = 8
    key = jax.random.PRNGKey(1)
    k1, k2, k3, k4, k5, k6, k7 = jax.random.split(key, 7)

    def conv_params(kk, ic, oc, k):
        w = jax.random.normal(kk, (k, k, ic, oc)) * 0.1
        return type(init_params(spec, kk))([w], [jnp.zeros((oc,))])

    first = [conv_params(k1, 1, t, 5), conv_params(k2, 1, t // 2, 5),
             conv_params(k3, 1, t // 2, 5)]
    trunk = type(first[0])(
        [jax.random.normal(k4, (3, 3, 2 * t, 2 * t)) * 0.05 for _ in range(3)],
        [jnp.zeros((2 * t,)) for _ in range(3)])
    last = [conv_params(k5, t, 16, 5), conv_params(k6, t // 2, 16, 5),
            conv_params(k7, t // 2, 16, 5)]
    params = SplitSESRParams(first, trunk, last)
    x = jnp.asarray(rng.random((1, 10, 14, 1), dtype=np.float32))
    y = forward_split(spec, params, x, tiny_channels=t)
    assert y.shape == (1, 40, 56, 1)


def test_anchor_is_nearest_upsample(rng):
    from sesr_tpu.ops.conv import nearest_upsample_x2
    x = jnp.asarray(rng.random((1, 6, 8, 3), dtype=np.float32))
    y = anchor_upsample(x, 2)
    np.testing.assert_allclose(np.asarray(y), np.asarray(nearest_upsample_x2(x)),
                               rtol=1e-6)
    w = np.asarray(anchor_weights(3, 2))
    assert w.sum() == 3 * 4  # one 1 per (channel, copy)


def test_quant_activation_ops(rng):
    cfg = QATConfig()
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4)).astype(np.float32))
    st = _fresh_qstate()
    y, st = quant_relu(cfg, st, x, training=True)
    assert float(y.min()) >= 0
    y2, _ = quant_leaky_relu(cfg, _fresh_qstate(), x, training=True)
    assert float(y2.min()) < 0
    y3, _ = quant_adaptive_avg_pool(cfg, _fresh_qstate(), x, (2, 2), training=True)
    assert y3.shape == (1, 2, 2, 4)
