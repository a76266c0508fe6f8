"""The collapsed SESR network: parameters and float forward pass.

After collapse every task in the zoo is the same shape of graph
(reference models/sesr.py:42-50, nrdm_3.py:40-47):

    c0 = relu(conv_first(x))                 # k_first
    h  = relu(conv_i(h))   for each lblock   # k_block, residual folded into W
    h  = h + c0                              # outer residual add
    y  = conv_last(h)                        # k_last, identity activation
    y  = pixel_shuffle(y, r)                 # only when scaling_factor > 1

There is no module tree and no graph surgery: the network is a list of
(weight, bias) pairs interpreted by pure functions. The fake-quant and
integer paths (quant/calibrate.py, quant/integer.py) interpret the same
parameters with extra numerics spliced between the same seams — replacing the
reference's torch.fx node-insertion passes (myQL/graph_modify.py).
"""

from __future__ import annotations

from typing import List, NamedTuple

import jax
from jax import lax
import jax.numpy as jnp
import numpy as np

from sesr_tpu.config import SESRSpec
from sesr_tpu.ops.conv import conv2d_nhwc, pixel_shuffle_nhwc


class CollapsedParams(NamedTuple):
    """Weights of a collapsed SESR net. weights[i]: HWIO, biases[i]: (OC,)."""

    weights: List[jnp.ndarray]
    biases: List[jnp.ndarray]

    @property
    def num_convs(self) -> int:
        return len(self.weights)


def init_params(spec: SESRSpec, key, dtype=jnp.float32) -> CollapsedParams:
    """Random collapsed-form parameters (for tests/benchmarks; real weights
    come from io/torch_import.py)."""
    ks = spec.kernel_sizes
    chans = ([spec.in_channels] + [spec.num_channels] * (spec.num_convs - 1)
             + [spec.conv_out_channels])
    weights, biases = [], []
    for i, k in enumerate(ks):
        key, k1 = jax.random.split(key)
        fan_in = k * k * chans[i]
        w = jax.random.normal(k1, (k, k, chans[i], chans[i + 1]), dtype) / np.sqrt(fan_in)
        weights.append(w)
        biases.append(jnp.zeros((chans[i + 1],), dtype))
    return CollapsedParams(weights, biases)


def forward_float(spec: SESRSpec, params: CollapsedParams, x: jnp.ndarray,
                  halo_axis=None) -> jnp.ndarray:
    """FP32 forward of the collapsed network. x: NHWC in [0, 1].

    ``halo_axis``: a mesh axis name (W sharding) or an (h_axis, w_axis)
    pair (2D spatial mesh) for spatially-sharded execution (inside
    shard_map). Each conv then exchanges its k//2 halo with spatial
    neighbours instead of zero padding (ops/halo.py) — bit-identical to
    the monolithic result.
    """
    from sesr_tpu.ops.halo import halo_exchange_2d, halo_exchange_w

    def conv(h, i):
        w, b = params.weights[i], params.biases[i]
        if isinstance(halo_axis, tuple):
            h = halo_exchange_2d(h, w.shape[0] // 2, *halo_axis)
            return conv2d_nhwc(h, w, b, w_valid=True, h_valid=True,
                                precision=lax.Precision.HIGHEST)
        if halo_axis is not None:
            h = halo_exchange_w(h, w.shape[0] // 2, halo_axis)
            return conv2d_nhwc(h, w, b, w_valid=True,
                               precision=lax.Precision.HIGHEST)
        return conv2d_nhwc(h, w, b, precision=lax.Precision.HIGHEST)

    n_convs = params.num_convs
    h = jax.nn.relu(conv(x, 0))
    c0 = h
    for i in range(1, n_convs - 1):
        h = jax.nn.relu(conv(h, i))
    h = h + c0
    y = conv(h, n_convs - 1)
    if spec.has_pixel_shuffle:
        y = pixel_shuffle_nhwc(y, spec.scaling_factor)
    return y
