"""Uncollapsed (train-time) SESR networks: expand -> squeeze blocks.

Training and QAT operate on the over-parameterized form (reference
models/model_utils_pt.py:5-27, train.py); collapse happens only for
inference/quantization (io/torch_import.py, models/blocks.py).
"""

from __future__ import annotations

from typing import List, NamedTuple

import jax
from jax import lax
import jax.numpy as jnp
import numpy as np

from sesr_tpu.config import SESRSpec
from sesr_tpu.models.blocks import collapse_block, fold_residual_identity, oihw_to_hwio
from sesr_tpu.models.sesr import CollapsedParams
from sesr_tpu.ops.conv import conv2d_nhwc, pixel_shuffle_nhwc


class ExpandedBlock(NamedTuple):
    w_expand: jnp.ndarray   # HWIO (k, k, IC, T)
    w_squeeze: jnp.ndarray  # HWIO (1, 1, T, OC)
    b_squeeze: jnp.ndarray  # (OC,)


class ExpandedParams(NamedTuple):
    blocks: List[ExpandedBlock]


def init_expanded(spec: SESRSpec, key, dtype=jnp.float32) -> ExpandedParams:
    ks = spec.kernel_sizes
    chans = ([spec.in_channels] + [spec.num_channels] * (spec.num_convs - 1)
             + [spec.conv_out_channels])
    blocks = []
    for i, k in enumerate(ks):
        key, k1, k2 = jax.random.split(key, 3)
        t = spec.tmp_channels
        w_e = jax.random.normal(k1, (k, k, chans[i], t), dtype) / np.sqrt(k * k * chans[i])
        w_s = jax.random.normal(k2, (1, 1, t, chans[i + 1]), dtype) / np.sqrt(t)
        blocks.append(ExpandedBlock(w_e, w_s, jnp.zeros((chans[i + 1],), dtype)))
    return ExpandedParams(blocks)


def expanded_from_state_dict(spec: SESRSpec, state) -> ExpandedParams:
    """Build ExpandedParams from a reference torch state dict (numpy)."""
    names = (["conv_first"] + [f"residual_block.{i}" for i in range(spec.num_lblocks)]
             + ["conv_last"])
    blocks = []
    for name in names:
        blocks.append(ExpandedBlock(
            jnp.asarray(oihw_to_hwio(state[f"{name}.conv_expand.weight"])),
            jnp.asarray(oihw_to_hwio(state[f"{name}.conv_squeeze.weight"])),
            jnp.asarray(state[f"{name}.conv_squeeze.bias"]),
        ))
    return ExpandedParams(blocks)


def forward_expanded(spec: SESRSpec, params: ExpandedParams, x) -> jnp.ndarray:
    """FP32 forward of the uncollapsed network (reference sesr.py:42-50 with
    block internals from model_utils_pt.py:24-27, 74-77)."""
    L = spec.num_convs

    def block(h, i, residual):
        b = params.blocks[i]
        hp = lax.Precision.HIGHEST
        y = conv2d_nhwc(conv2d_nhwc(h, b.w_expand, precision=hp),
                        b.w_squeeze, b.b_squeeze, precision=hp)
        if residual:
            y = y + h
        return y

    h = jax.nn.relu(block(x, 0, False))
    c0 = h
    for i in range(1, L - 1):
        h = jax.nn.relu(block(h, i, True))
    h = h + c0
    y = block(h, L - 1, False)
    if spec.has_pixel_shuffle:
        y = pixel_shuffle_nhwc(y, spec.scaling_factor)
    return y


def collapse_expanded(spec: SESRSpec, params: ExpandedParams) -> CollapsedParams:
    """Collapse trained ExpandedParams into inference form."""
    weights, biases = [], []
    for i, blk in enumerate(params.blocks):
        w_exp = np.transpose(np.asarray(blk.w_expand), (3, 2, 0, 1))   # ->OIHW
        w_sq = np.transpose(np.asarray(blk.w_squeeze), (3, 2, 0, 1))
        w, b = collapse_block(w_exp, w_sq, np.asarray(blk.b_squeeze))
        if 0 < i < spec.num_convs - 1:
            w = fold_residual_identity(w)
        weights.append(np.ascontiguousarray(oihw_to_hwio(w)))
        biases.append(b)
    return CollapsedParams(weights, biases)


def collapse_expanded_qat(spec: SESRSpec,
                          params: ExpandedParams) -> CollapsedParams:
    """Collapse QAT-trained ExpandedParams THROUGH the fake-quant delta
    response (io/torch_import.py qat_collapse_block) — the composition the
    reference's own qatf deployment uses (prepare -> collapse).

    Measured (tools/qat_value.py, sr_x4): collapsing QAT weights with the
    float analytic contraction forfeits ~0.4 dB of deployment INT8 PSNR;
    the fake-quant-consistent collapse reproduces the noise the weights
    were trained under and drives the own-float -> int8 quantization gap
    to ~0."""
    from sesr_tpu.io.torch_import import qat_collapse_block

    weights, biases = [], []
    for i, blk in enumerate(params.blocks):
        w_exp = np.transpose(np.asarray(blk.w_expand), (3, 2, 0, 1))
        w_sq = np.transpose(np.asarray(blk.w_squeeze), (3, 2, 0, 1))
        w, b = qat_collapse_block(w_exp, w_sq, np.asarray(blk.b_squeeze))
        if 0 < i < spec.num_convs - 1:
            w = fold_residual_identity(w)
        weights.append(np.ascontiguousarray(oihw_to_hwio(w)))
        biases.append(b)
    return CollapsedParams(weights, biases)
