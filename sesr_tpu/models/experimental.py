"""Experimental SESR variants from the reference's scratchpad
(models/sesr_arch.py:7-205) — unused by any entry script upstream, carried
here for inventory completeness:

- inception_sesr (:7-98): three parallel SESR paths with different widths
  (tiny, tiny+4, tiny+8), outputs summed before the pixel shuffle (or one
  path selected via single_path/conv_scale).
- split_sesr (:101-168): three first-convs concatenated into one trunk of
  residual blocks, then three last-convs over channel slices, summed. (The
  upstream file references an undefined SplitResidualCollapsibleLinearBlock
  — the class would NameError if constructed; standard residual blocks are
  used for the trunk here, which is the only well-defined reading.)
- anchor_weights (:171-205 AnchorOp): nearest-neighbour upsampling expressed
  as a frozen 1x1 conv producing scaling_factor^2 copies of each channel,
  consumed by a pixel shuffle.

All are expressed over ExpandedParams-style blocks and collapse through the
same machinery as the main zoo.
"""

from __future__ import annotations

from typing import List, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from sesr_tpu.config import SESRSpec
from sesr_tpu.models.sesr import CollapsedParams, forward_float
from sesr_tpu.ops.conv import conv2d_nhwc, pixel_shuffle_nhwc

# float-semantics convs must not run as bf16 MXU passes on TPU (ops/conv.py)
_HP = lax.Precision.HIGHEST


class InceptionSESRParams(NamedTuple):
    paths: List[CollapsedParams]       # one collapsed SESR chain per path


def inception_path_spec(base: SESRSpec, widths=(8, 12, 16)):
    """Per-path specs: same topology, different widths (sesr_arch.py:20-63)."""
    return [SESRSpec(f"{base.name}_p{i}", base.in_channels, base.out_channels,
                     num_channels=w, num_lblocks=base.num_lblocks,
                     scaling_factor=base.scaling_factor)
            for i, w in enumerate(widths)]


def forward_inception(base: SESRSpec, params: InceptionSESRParams, x,
                      single_path: bool = False, conv_scale: int = 3):
    """single_path falsy: sum all paths (sesr_arch.py:95-97); single_path
    truthy: emit only path `conv_scale` (1-based path selector, matching the
    reference's `conv_scale==1/2/3` chain at sesr_arch.py:14,89-94)."""
    if not isinstance(single_path, bool):
        # the pre-round-5 API had no conv_scale param; an integer here is
        # almost certainly legacy "use path N" intent — reinterpreting it
        # as truthy would silently select path `conv_scale` instead
        raise TypeError("single_path is a bool; pass the path index via "
                        "conv_scale= (e.g. single_path=True, conv_scale=2)")
    specs = inception_path_spec(base)[: len(params.paths)]
    # run each path WITHOUT its own pixel shuffle; sum pre-shuffle
    outs = []
    for spec, p in zip(specs, params.paths):
        pre = SESRSpec(spec.name, spec.in_channels,
                       spec.out_channels * spec.scaling_factor ** 2,
                       num_channels=spec.num_channels,
                       num_lblocks=spec.num_lblocks, scaling_factor=1)
        outs.append(forward_float(pre, p, x))
    if single_path:
        if not 1 <= conv_scale <= len(outs):
            raise ValueError(f"conv_scale must be 1..{len(outs)}, "
                             f"got {conv_scale}")
        y = outs[conv_scale - 1]
    else:
        y = outs[0]
        for o in outs[1:]:
            y = y + o
    return pixel_shuffle_nhwc(y, base.scaling_factor)


class SplitSESRParams(NamedTuple):
    first: List[CollapsedParams]       # 3 first-conv (k5) params: (w, b) each
    trunk: CollapsedParams             # residual blocks over concat channels
    last: List[CollapsedParams]        # 3 last-conv (k5) params


def forward_split(spec: SESRSpec, params: SplitSESRParams, x,
                  tiny_channels: int = 8):
    """split_sesr forward (sesr_arch.py:155-168)."""
    firsts = [jax.nn.relu(conv2d_nhwc(x, w, b, precision=_HP))
              for (w, b) in zip(params.first.weights, params.first.biases)] \
        if isinstance(params.first, CollapsedParams) else [
            jax.nn.relu(conv2d_nhwc(x, p.weights[0], p.biases[0],
                                    precision=_HP))
            for p in params.first]
    h = jnp.concatenate(firsts, axis=-1)
    c0 = h
    for w, b in zip(params.trunk.weights, params.trunk.biases):
        h = jax.nn.relu(conv2d_nhwc(h, w, b, precision=_HP))
    h = h + c0
    t = tiny_channels
    slices = [h[..., :t], h[..., t:t + t // 2], h[..., t + t // 2:]]
    y = None
    for sl, p in zip(slices, params.last):
        o = conv2d_nhwc(sl, p.weights[0], p.biases[0], precision=_HP)
        y = o if y is None else y + o
    return pixel_shuffle_nhwc(y, spec.scaling_factor)


def anchor_weights(in_channels: int, scaling_factor: int):
    """AnchorOp as conv weights (sesr_arch.py:171-205): a 1x1 HWIO kernel
    whose output channel c*r^2 + j copies input channel c — nearest-neighbour
    upsampling once followed by PixelShuffle(r)."""
    r2 = scaling_factor ** 2
    w = np.zeros((1, 1, in_channels, in_channels * r2), np.float32)
    for c in range(in_channels):
        w[0, 0, c, c * r2:(c + 1) * r2] = 1.0
    return jnp.asarray(w)


def anchor_upsample(x, scaling_factor: int):
    """nearest-upsample via the anchor conv + pixel shuffle (the conv-only
    formulation the reference uses so the op can ride the quantized conv
    datapath). precision=HIGHEST: on TPU a default-precision f32 conv runs
    as a bf16 MXU pass, which would round general-f32 activations even
    though the 0/1 selector weights are exact."""
    w = anchor_weights(x.shape[-1], scaling_factor)
    return pixel_shuffle_nhwc(conv2d_nhwc(x, w, precision=_HP),
                              scaling_factor)
