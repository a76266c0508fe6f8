"""NHWC convolution and pixel-shuffle primitives.

The framework uses NHWC activations and HWIO weights throughout (TPU-native
layouts; XLA maps these onto the MXU without transposes). The reference is
NCHW/OIHW torch (models/*.py); conversion happens once at checkpoint import
(io/torch_import.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_DIMNUMS = ("NHWC", "HWIO", "NHWC")


def conv2d_nhwc(x, w_hwio, bias=None, *, preferred_element_type=None,
                w_valid: bool = False, h_valid: bool = False,
                precision=None):
    """Stride-1 2D convolution, NHWC x HWIO -> NHWC; SAME-padded.

    All reference convs are stride 1 with padding k//2 (models/sesr.py:14-31).
    ``preferred_element_type=jnp.int32`` gives exact int8 x int8 -> int32
    accumulation for the integer paths.

    ``w_valid=True`` / ``h_valid=True`` use VALID padding along that axis:
    the mode used by spatially-sharded execution, where each shard carries a
    halo of neighbour columns/rows instead of zero padding
    (parallel/tiling.py). The output is then ``k//2`` narrower on each side
    of the valid axis.

    ``precision``: FLOAT-SEMANTICS call sites (the float forward, the
    fake-quant calibration/QAT paths — anything whose operands are general
    f32, not int8-valued) must pass ``lax.Precision.HIGHEST``: on the TPU
    backend a default-precision f32 conv runs as bf16 MXU passes, which is
    exact for int8-valued data but silently drifts general floats — a
    calibration run on-TPU would otherwise produce different scales/zeros
    than the CPU/reference run (round-4 review finding). Integer-path
    callers feed bf16/int32 operands deliberately and leave this None.
    """
    k = w_hwio.shape[0]
    pad = k // 2
    w_pad = (0, 0) if w_valid else (pad, pad)
    h_pad = (0, 0) if h_valid else (pad, pad)
    y = lax.conv_general_dilated(
        x,
        w_hwio,
        window_strides=(1, 1),
        padding=[h_pad, w_pad],
        dimension_numbers=_DIMNUMS,
        preferred_element_type=preferred_element_type,
        precision=precision,
    )
    if bias is not None:
        y = y + bias
    return y


def pixel_shuffle_nhwc(x, r: int):
    """Depth-to-space with torch.nn.PixelShuffle channel ordering.

    torch semantics (models/sesr.py:31 depth_to_space): out[n, c, h*r+i, w*r+j]
    = in[n, c*r*r + i*r + j, h, w]. In NHWC: split the channel axis as
    (c, i, j) and interleave (i, j) into (h, w).
    """
    n, h, w, c_rr = x.shape
    c = c_rr // (r * r)
    x = x.reshape(n, h, w, c, r, r)
    # (n, h, i, w, j, c) -> (n, h*r, w*r, c)
    x = x.transpose(0, 1, 4, 2, 5, 3)
    return x.reshape(n, h * r, w * r, c)


def nearest_upsample_x2(x):
    """2x nearest-neighbour upsample in NHWC.

    The reference applies this input skip for the sr_x2 task outside the model
    (test.py:149-155: each input pixel copied to a 2x2 block).
    """
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)
