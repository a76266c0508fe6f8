"""Quantization-aware training: functional fake-quant with straight-through
estimators.

Re-designs the reference's QAT stack (models/quantize_utils_cuda.py) as pure
functions over explicit state pytrees — no module swapping, no buffers:

- observers: MinMax (:45-80), MovingAverageMinMax (momentum 0.1, :83-119),
  Histogram/percentile (kthvalue of |x|, :122-145)
- quantizers: symmetric (:298-311) / asymmetric (:315-327) with the STE
  Round function sign*floor(|x|+0.5) whose gradient is clipped outside the
  observer range (:150-174)
- QuantConv2d (:331-513): fake-quant input + weight, then conv
- QuantAdd (:654-711): residual and shortcut share a union min/max
- prepare(): QATConfig + fresh QATState (:801-834)

Reference quirk replicated: `prepare(..., q_level="C")` compares q_level
against 0, so the string "C" actually selects LAYER-level weight scales —
which is how every shipped *_qat_G.pth checkpoint was trained (scale buffers
have shape (1,)). Per-channel is available here via q_level="C_real".

The training step (qat_train_step) is Adam(1e-5) + MSE like train.py:45-46,
jit-able and shardable over a (dp, sp) mesh.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import List, NamedTuple, Optional, Tuple

import jax
from jax import lax
import jax.numpy as jnp
import numpy as np

from sesr_tpu.config import SESRSpec
from sesr_tpu.models.expanded import ExpandedParams, forward_expanded
from sesr_tpu.ops.conv import conv2d_nhwc, pixel_shuffle_nhwc


# --------------------------------------------------------------------------
# config / state


@dataclasses.dataclass(frozen=True)
class QATConfig:
    a_bits: int = 8
    w_bits: int = 8
    q_type: int = 0              # 0 symmetric, 1 asymmetric (activations)
    q_level: str = "C"           # "C"/"L" -> layer-level (upstream quirk);
                                 # "C_real" -> true per-channel weight scales
    weight_observer: int = 0     # 0 MinMax, 1 MovingAverageMinMax
    momentum: float = 0.1
    ptq: bool = False            # percentile histogram observer for acts
    percentile: float = 0.9999

    @property
    def per_channel(self) -> bool:
        return self.q_level == "C_real"


class QuantizerState(NamedTuple):
    min_val: jnp.ndarray
    max_val: jnp.ndarray
    num_flag: jnp.ndarray        # 0 before first observation


def _fresh_qstate(shape=(1,)) -> QuantizerState:
    return QuantizerState(jnp.zeros(shape, jnp.float32),
                          jnp.zeros(shape, jnp.float32),
                          jnp.zeros((), jnp.int32))


class ConvQuantState(NamedTuple):
    act: QuantizerState
    weight: QuantizerState


class AddQuantState(NamedTuple):
    res: QuantizerState
    shortcut: QuantizerState


class QATState(NamedTuple):
    convs: Tuple[ConvQuantState, ...]   # 2 per block: expand, squeeze
    add: AddQuantState


def prepare(spec: SESRSpec, cfg: QATConfig = QATConfig()) -> QATState:
    """Fresh QAT state for a network (reference prepare(), :801-834)."""
    convs = []
    chans = ([spec.num_channels] * (spec.num_convs - 1) + [spec.conv_out_channels])
    for i in range(spec.num_convs):
        t = spec.tmp_channels
        w_shape_e = (t, 1, 1, 1) if cfg.per_channel else (1,)
        w_shape_s = (chans[i], 1, 1, 1) if cfg.per_channel else (1,)
        convs.append(ConvQuantState(_fresh_qstate(), _fresh_qstate(w_shape_e)))
        convs.append(ConvQuantState(_fresh_qstate(), _fresh_qstate(w_shape_s)))
    return QATState(tuple(convs), AddQuantState(_fresh_qstate(), _fresh_qstate()))


# --------------------------------------------------------------------------
# observers (pure update functions; input already stop_gradient'ed)


def _minmax_update(state: QuantizerState, x, per_channel: bool) -> QuantizerState:
    if per_channel:
        flat = x.reshape(x.shape[0], -1) if x.ndim == 2 else \
            jnp.moveaxis(x, -1, 0).reshape(x.shape[-1], -1)
        cur_min = flat.min(axis=1).reshape(state.min_val.shape)
        cur_max = flat.max(axis=1).reshape(state.max_val.shape)
    else:
        cur_min = jnp.full_like(state.min_val, x.min())
        cur_max = jnp.full_like(state.max_val, x.max())
    first = state.num_flag == 0
    new_min = jnp.where(first, cur_min, jnp.minimum(cur_min, state.min_val))
    new_max = jnp.where(first, cur_max, jnp.maximum(cur_max, state.max_val))
    return QuantizerState(new_min, new_max, state.num_flag + first.astype(jnp.int32))


def _moving_avg_update(state: QuantizerState, x, momentum: float,
                       per_channel: bool) -> QuantizerState:
    if per_channel:
        flat = jnp.moveaxis(x, -1, 0).reshape(x.shape[-1], -1)
        cur_min = flat.min(axis=1).reshape(state.min_val.shape)
        cur_max = flat.max(axis=1).reshape(state.max_val.shape)
    else:
        cur_min = jnp.full_like(state.min_val, x.min())
        cur_max = jnp.full_like(state.max_val, x.max())
    first = state.num_flag == 0
    new_min = jnp.where(first, cur_min,
                        (1 - momentum) * state.min_val + momentum * cur_min)
    new_max = jnp.where(first, cur_max,
                        (1 - momentum) * state.max_val + momentum * cur_max)
    return QuantizerState(new_min, new_max, state.num_flag + first.astype(jnp.int32))


def _percentile_update(state: QuantizerState, x, momentum: float,
                       percentile: float) -> QuantizerState:
    """HistogramObserver (:132-145): moving average of the percentile-th
    |x| order statistic; min stays at -max for symmetric use."""
    flat = jnp.sort(jnp.abs(x).reshape(-1))
    k = int(percentile * flat.shape[0])
    cur_max = jnp.full_like(state.max_val, flat[max(k - 1, 0)])
    first = state.num_flag == 0
    new_max = jnp.where(first, cur_max,
                        (1 - momentum) * state.max_val + momentum * cur_max)
    return QuantizerState(-new_max, new_max, state.num_flag + first.astype(jnp.int32))


# --------------------------------------------------------------------------
# STE round + fake quant


@jax.custom_vjp
def ste_round(t, lo, hi):
    return jnp.sign(t) * jnp.floor(jnp.abs(t) + 0.5)


def _ste_fwd(t, lo, hi):
    return ste_round(t, lo, hi), (t, lo, hi)


def _ste_bwd(res, g):
    t, lo, hi = res
    mask = jnp.logical_and(t >= lo, t <= hi)
    return (jnp.where(mask, g, 0.0), None, None)


ste_round.defvjp(_ste_fwd, _ste_bwd)


def _qparams(state: QuantizerState, bits: int, q_type: int, is_weight: bool):
    """Scale/zero from observer state (SymmetricQuantizer:298-311 /
    AsymmetricQuantizer:315-327), including the weight range [-127,127] vs
    activation [-128,127] asymmetry (SignedQuantizer:249-269)."""
    eps = jnp.float32(np.finfo(np.float32).eps)
    if q_type == 0:
        if is_weight:
            qmin, qmax = float(-(2 ** (bits - 1) - 1)), float(2 ** (bits - 1) - 1)
        else:
            qmin, qmax = float(-(2 ** (bits - 1))), float(2 ** (bits - 1) - 1)
        quant_range = (qmax - qmin) / 2
        float_range = jnp.maximum(jnp.abs(state.min_val), jnp.abs(state.max_val))
        scale = jnp.maximum(float_range / quant_range, eps)
        zero = jnp.zeros_like(scale)
    else:
        if is_weight:
            qmin, qmax = 0.0, float((1 << bits) - 2)
        else:
            qmin, qmax = 0.0, float((1 << bits) - 1)
        quant_range = qmax - qmin
        scale = jnp.maximum((state.max_val - state.min_val) / quant_range, eps)
        zero = jnp.sign(state.min_val) * jnp.floor(jnp.abs(state.min_val / scale) + 0.5)
    return scale, zero, qmin, qmax


def fake_quant(x, state: QuantizerState, bits: int, q_type: int, is_weight: bool):
    """Quantizer.forward (:220-246): STE round of x/scale - zero with
    gradient clipped outside the observer range, clamp, dequantize."""
    scale, zero, qmin, qmax = _qparams(state, bits, q_type, is_weight)
    t = x / scale - zero
    lo = state.min_val / scale - zero
    hi = state.max_val / scale - zero
    if q_type == 0:
        m = jnp.maximum(jnp.abs(lo), jnp.abs(hi))
        lo, hi = -m, m
    q = jnp.clip(ste_round(t, lo, hi), qmin, qmax)
    return (q + zero) * scale


# --------------------------------------------------------------------------
# QAT forward


def _observe_act(cfg: QATConfig, state: QuantizerState, x, training: bool):
    if not training:
        return state
    xs = jax.lax.stop_gradient(x)
    if cfg.ptq:
        return _percentile_update(state, xs, cfg.momentum, cfg.percentile)
    return _moving_avg_update(state, xs, cfg.momentum, False)


def _observe_weight(cfg: QATConfig, state: QuantizerState, w, training: bool):
    if not training:
        return state
    ws = jax.lax.stop_gradient(w)
    if cfg.weight_observer == 0:
        return _minmax_update(state, ws, cfg.per_channel)
    return _moving_avg_update(state, ws, cfg.momentum, cfg.per_channel)


def _quant_conv(cfg, cstate: ConvQuantState, x, w_hwio, bias, training):
    """QuantConv2d.forward (:498-513)."""
    astate = _observe_act(cfg, cstate.act, x, training)
    wstate = _observe_weight(cfg, cstate.weight, w_hwio, training)
    x_fq = fake_quant(x, astate, cfg.a_bits, cfg.q_type, is_weight=False)
    w_scale_state = wstate
    if cfg.per_channel:
        # reshape per-channel (OC,1,1,1) state to broadcast over HWIO
        w_scale_state = QuantizerState(
            wstate.min_val.reshape(1, 1, 1, -1),
            wstate.max_val.reshape(1, 1, 1, -1),
            wstate.num_flag)
    w_fq = fake_quant(w_hwio, w_scale_state, cfg.w_bits, 0, is_weight=True)
    y = conv2d_nhwc(x_fq, w_fq, bias, precision=lax.Precision.HIGHEST)
    return y, ConvQuantState(astate, wstate)


def _quant_add(cfg, astate: AddQuantState, res, shortcut, training):
    """QuantAdd.forward (:697-711): union min/max across both inputs."""
    rs = _observe_act(cfg, astate.res, res, training)
    ss = _observe_act(cfg, astate.shortcut, shortcut, training)
    union = QuantizerState(jnp.minimum(rs.min_val, ss.min_val),
                           jnp.maximum(rs.max_val, ss.max_val),
                           rs.num_flag)
    q_res = fake_quant(res, union, cfg.a_bits, cfg.q_type, is_weight=False)
    q_short = fake_quant(shortcut, union, cfg.a_bits, cfg.q_type, is_weight=False)
    return q_res + q_short, AddQuantState(rs, ss)


def qat_forward(spec: SESRSpec, cfg: QATConfig, params: ExpandedParams,
                state: QATState, x, training: bool = True):
    """Fake-quant forward of the uncollapsed network. Returns (y, state')."""
    L = spec.num_convs
    new_convs = list(state.convs)

    def qblock(h, i, residual, training):
        blk = params.blocks[i]
        y, new_convs[2 * i] = _quant_conv(
            cfg, state.convs[2 * i], h, blk.w_expand, None, training)
        y, new_convs[2 * i + 1] = _quant_conv(
            cfg, state.convs[2 * i + 1], y, blk.w_squeeze, blk.b_squeeze, training)
        if residual:
            y = y + h
        return y

    h = jax.nn.relu(qblock(x, 0, False, training))
    c0 = h
    for i in range(1, L - 1):
        h = jax.nn.relu(qblock(h, i, True, training))
    h, new_add = _quant_add(cfg, state.add, h, c0, training)
    y = qblock(h, L - 1, False, training)
    if spec.has_pixel_shuffle:
        y = pixel_shuffle_nhwc(y, spec.scaling_factor)
    return y, QATState(tuple(new_convs), new_add)


def quant_add_scale_from_bounds(lo: float, hi: float, bits: int = 8) -> float:
    """The frozen QuantAdd scale: max(|lo|, |hi|) / 127.5 with the f32 eps
    floor (SymmetricQuantizer.update_qparams, quantize_utils_cuda.py:
    298-311), computed in float32 exactly as torch does at trace time."""
    qmin, qmax = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
    quant_range = np.float32((qmax - qmin) / 2.0)
    float_range = np.float32(max(abs(np.float32(lo)), abs(np.float32(hi))))
    return float(np.maximum(np.float32(float_range / quant_range),
                            np.float32(np.finfo(np.float32).eps)))


def quant_add_frozen(res, shortcut, union_lo: float, union_hi: float,
                     bits: int = 8):
    """QuantAdd as it actually executes inside the reference's fx-composed
    qatf="qat_" pipeline (test.py:61-63 + the insert passes): a fake-quant
    of both operands with a scale FROZEN at trace time from the
    checkpoint's observer buffers.

    QuantAdd.forward (quantize_utils_cuda.py:697-711) nominally keeps
    running observers — but torch.fx.symbolic_trace INLINES the custom
    module, and at trace time the union min/max are read from the CONCRETE
    buffers (the values load_state_dict restored from the QAT checkpoint),
    so update_qparams runs concretely and the scale is baked into the
    graph as a tensor constant (`input / _tensor_constant0` in the traced
    code — verified by printing gm.code for the prepared nr model). The
    runtime observer copy_ nodes still execute but their results are never
    read again: dead stores. Semantics therefore: a FIXED symmetric
    activation fake-quant with scale = max(|union_lo|, |union_hi|)/127.5
    from the checkpoint's add_residual observer values, applied to each
    operand, then added."""
    qmin, qmax = float(-(1 << (bits - 1))), float((1 << (bits - 1)) - 1)
    scale = jnp.float32(quant_add_scale_from_bounds(union_lo, union_hi,
                                                    bits))

    def fq(x):
        t = x / scale
        q = jnp.clip(jnp.sign(t) * jnp.floor(jnp.abs(t) + jnp.float32(0.5)),
                     qmin, qmax)
        return q * scale

    return fq(res) + fq(shortcut)


# --------------------------------------------------------------------------
# quantized activation ops (library completeness: the reference also ships
# QuantReLU :527-568, QuantLeakyReLU :570-612, QuantAdaptiveAvgPool2d
# :616-651 — each fake-quants its INPUT then applies the float op)


def quant_relu(cfg: QATConfig, state: QuantizerState, x, training: bool):
    """QuantReLU.forward (:565-568). Returns (y, state')."""
    st = _observe_act(cfg, state, x, training)
    return jax.nn.relu(fake_quant(x, st, cfg.a_bits, cfg.q_type, False)), st


def quant_leaky_relu(cfg: QATConfig, state: QuantizerState, x,
                     negative_slope: float = 0.01, training: bool = True):
    """QuantLeakyReLU.forward (:609-612)."""
    st = _observe_act(cfg, state, x, training)
    xq = fake_quant(x, st, cfg.a_bits, cfg.q_type, False)
    return jnp.where(xq >= 0, xq, negative_slope * xq), st


def quant_adaptive_avg_pool(cfg: QATConfig, state: QuantizerState, x,
                            output_size, training: bool = True):
    """QuantAdaptiveAvgPool2d.forward (:648-651): fake-quant then adaptive
    average pool to (oh, ow) on NHWC input (exact for divisible sizes, the
    only case the reference's networks could use)."""
    st = _observe_act(cfg, state, x, training)
    xq = fake_quant(x, st, cfg.a_bits, cfg.q_type, False)
    n, h, w, c = xq.shape
    oh, ow = output_size if isinstance(output_size, tuple) else (output_size,) * 2
    assert h % oh == 0 and w % ow == 0, "adaptive pool needs divisible sizes"
    xq = xq.reshape(n, oh, h // oh, ow, w // ow, c)
    return xq.mean(axis=(2, 4)), st


# --------------------------------------------------------------------------
# training


def make_train_step(spec: SESRSpec, cfg: Optional[QATConfig], optimizer):
    """Build a jit-able train step: MSE + Adam like train.py:45-78.

    cfg=None trains the plain float network (the reference's default path —
    its QAT trigger is dead code behind `epoch > 10000`, train.py:61-63).

    Specs with ``global_input_skip`` (sr_x2) predict a RESIDUAL: the
    reference adds the nearest-upsampled input OUTSIDE the model at eval
    (test.py:149-155), and upstream never trains that arch (train.py is
    the Bayer pipeline), so the convention at train time is ours to fix —
    the loss must score y + nearest_up(x) against the full-image gt, or a
    fine-tune from a good checkpoint diverges immediately (measured:
    300 steps drove the sr_x2 reference checkpoint from 30.4 to 13.9 dB
    held-out before this correction; pinned in tests/test_qat.py).
    """
    import optax

    def step(params, qstate, opt_state, batch):
        x, gt = batch

        def loss_fn(p):
            if cfg is None:
                y = forward_expanded(spec, p, x)
                aux = qstate
            else:
                y, aux = qat_forward(spec, cfg, p, qstate, x, training=True)
            if spec.global_input_skip:
                y = y + jnp.repeat(jnp.repeat(x, spec.scaling_factor, axis=1),
                                   spec.scaling_factor, axis=2)
            return jnp.mean((y - gt) ** 2), aux

        (loss, new_qstate), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, new_opt_state = optimizer.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_qstate, new_opt_state, loss

    return step


# --------------------------------------------------------------------------
# reference QAT checkpoint import (validation)


def qat_state_from_state_dict(spec: SESRSpec, state_dict) -> QATState:
    """Load observer buffers from a reference *_qat_G.pth state dict."""
    names = (["conv_first"] + [f"residual_block.{i}" for i in range(spec.num_lblocks)]
             + ["conv_last"])
    convs = []
    for name in names:
        for sub in ("conv_expand", "conv_squeeze"):
            cs = []
            for q in ("activation_quantizer", "weight_quantizer"):
                lo = np.asarray(state_dict[f"{name}.{sub}.{q}.observer.min_val"])
                hi = np.asarray(state_dict[f"{name}.{sub}.{q}.observer.max_val"])
                cs.append(QuantizerState(jnp.asarray(lo.reshape(-1)[:1]),
                                         jnp.asarray(hi.reshape(-1)[:1]),
                                         jnp.ones((), jnp.int32)))
            convs.append(ConvQuantState(cs[0], cs[1]))
    add = AddQuantState(
        QuantizerState(jnp.asarray(np.asarray(state_dict["add_residual.observer_res.min_val"]).reshape(1)),
                       jnp.asarray(np.asarray(state_dict["add_residual.observer_res.max_val"]).reshape(1)),
                       jnp.ones((), jnp.int32)),
        QuantizerState(jnp.asarray(np.asarray(state_dict["add_residual.observer_shortcut.min_val"]).reshape(1)),
                       jnp.asarray(np.asarray(state_dict["add_residual.observer_shortcut.max_val"]).reshape(1)),
                       jnp.ones((), jnp.int32)),
    )
    return QATState(tuple(convs), add)
