from sesr_tpu.ops.fixedpoint import (
    saturate,
    encode_requant,
    apply_requant_f32,
    int_to_hex,
)
from sesr_tpu.ops.conv import conv2d_nhwc, pixel_shuffle_nhwc, nearest_upsample_x2
