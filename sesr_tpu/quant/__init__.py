from sesr_tpu.quant.params import QuantParams, CalibState, quantize_weights, finalize
from sesr_tpu.quant.calibrate import (
    calibration_forward, calibrate, fake_quant_forward,
)
from sesr_tpu.quant.integer import integer_forward
