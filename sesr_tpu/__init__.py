"""sesr_tpu — a TPU-native quantized-inference framework for the SESR model family.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
gui-yupeng/sesr-pytorch-quantize (reference mounted at /root/reference):

- structural-reparameterization SESR CNNs (SR x2/x4, NR, DM, NRDM-3/6)
  collapsed at load time into plain conv chains       (models/, io/)
- INT8 post-training quantization with min-max / percentile / KL-entropy
  calibration carried on-device                        (quant/observers.py, calibrate.py)
- a bit-exact integer simulation of a 4-PE INT8 conv ASIC: 18-bit PE
  accumulators, 20-bit PE adder, 16-bit fused bias, 16-bit-mantissa x 2^-n
  fixed-point requantization                           (quant/integer.py)
- a channel-packed (space-to-depth) MXU datapath for production inference
  plus fused whole-network Pallas kernels              (ops/packed.py,
                                                        ops/pallas_*.py)
- spatial tiling + halo exchange over a device mesh     (parallel/)
- QAT fake-quant with straight-through estimators       (quant/qat.py)
- RTL hex test-vector exporters                         (export/)

Unlike the reference (which stores all cross-run state in an output_pt/ file
tree), every quantization artifact lives in one explicit `QuantParams` pytree
(quant/params.py), produced by calibration and consumed by the fake-quant,
integer, and Pallas execution paths.
"""

from sesr_tpu.config import HardwareConfig, DEFAULT_HW, TASKS

__version__ = "0.1.0"
