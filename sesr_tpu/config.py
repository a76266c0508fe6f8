"""Hardware datapath configuration and the model/task registry.

The reference keeps these as module-level constants in define.py
(/root/reference/define.py:1-36) plus six near-identical model files selected
by an integer ``MFLAG``.  Here the datapath is an explicit immutable config
object threaded through the quantization pipeline, and the model zoo is a
single parameterized spec (the reference's six files differ only in channel
counts / depth / scaling factor — see models/nrdm_3.py vs models/nr.py, which
are byte-identical upstream).
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class HardwareConfig:
    """Bit widths of the simulated 4-PE INT8 convolution ASIC.

    Mirrors /root/reference/define.py:5-14.
    """

    pe: int = 4                 # number of processing elements (channel round-robin)
    quan_bits: int = 8          # INT8 weights (symmetric) / activations (asymmetric)
    bias_bits: int = 16         # fused bias clamp width (bias_int - zero*sum(W_int))
    pe_acc_bits: int = 18       # per-PE accumulator saturating width
    pe_add_bits: int = 20       # 4-PE adder-tree saturating width
    requant_bits: int = 16      # requant mantissa width
    requant_n_max: int = 32     # max right-shift for requant (mantissa * 2^-n)
    tile_width: int = 32        # hardware line-buffer tile width (export format)

    @property
    def quan_min(self) -> int:
        return -(1 << (self.quan_bits - 1))

    @property
    def quan_max(self) -> int:
        return (1 << (self.quan_bits - 1)) - 1


DEFAULT_HW = HardwareConfig()


@dataclasses.dataclass(frozen=True)
class SESRSpec:
    """Architecture of one SESR-family network (after collapse: a plain chain
    of convs k=[k_first, k_block*num_lblocks, k_last] with one outer residual
    add and an optional PixelShuffle).

    Train-time blocks are over-parameterized expand(k x k, C->tmp) ->
    squeeze(1x1, tmp->C) pairs (reference models/model_utils_pt.py:5-66);
    they are collapsed analytically at checkpoint load (io/torch_import.py).
    """

    name: str
    in_channels: int
    out_channels: int
    num_channels: int = 16
    num_lblocks: int = 3
    scaling_factor: int = 1       # PixelShuffle factor; 1 = no shuffle
    tmp_channels: int = 256
    k_first: int = 5
    k_block: int = 3
    k_last: int = 5
    # sr_x2 adds a nearest-upsampled global input skip OUTSIDE the model
    # (reference test.py:149-155); recorded here so eval can apply it.
    global_input_skip: bool = False

    @property
    def num_convs(self) -> int:
        return self.num_lblocks + 2

    @property
    def kernel_sizes(self) -> tuple:
        return (self.k_first,) + (self.k_block,) * self.num_lblocks + (self.k_last,)

    @property
    def conv_out_channels(self) -> int:
        """Output channels of the last conv (pre-PixelShuffle)."""
        return self.out_channels * self.scaling_factor ** 2

    @property
    def has_pixel_shuffle(self) -> bool:
        return self.scaling_factor > 1

    def halo_width(self) -> int:
        """Total receptive-field halo of the conv chain: sum of k//2.

        This is the overlap the hardware tile format shrinks per layer
        (reference output.py:42-65) and the halo exchanged across devices in
        the sharded path (parallel/tiling.py).
        """
        return sum(k // 2 for k in self.kernel_sizes)


# The reference's MFLAG 1..6 task selector (test.py:29-52).
TASKS = {
    "nr": SESRSpec("nr", in_channels=3, out_channels=3),                     # MFLAG=1
    "dm": SESRSpec("dm", in_channels=3, out_channels=3),                     # MFLAG=2
    "nrdm_3": SESRSpec("nrdm_3", in_channels=3, out_channels=3),             # MFLAG=3
    "nrdm_6": SESRSpec("nrdm_6", in_channels=3, out_channels=3,
                       num_lblocks=6),                                       # MFLAG=4
    "sr_x4": SESRSpec("sr_x4", in_channels=1, out_channels=1,
                      scaling_factor=4),                                     # MFLAG=5
    "sr_x2": SESRSpec("sr_x2", in_channels=3, out_channels=3,
                      scaling_factor=2, global_input_skip=True),             # MFLAG=6
}

MFLAG_TO_TASK = {1: "nr", 2: "dm", 3: "nrdm_3", 4: "nrdm_6", 5: "sr_x4", 6: "sr_x2"}

# Checkpoint files shipped with the reference, per task (test.py:64-69).
REFERENCE_CHECKPOINTS = {
    "nr": "nr_G.pth",
    "dm": "dm_G.pth",
    "nrdm_3": "nrdm_3_raw_G.pth",
    "nrdm_6": "nrdm_6_G.pth",
    "sr_x4": "x4sesr.pth",
    "sr_x2": "x2sesr.pth.tar",
}


def spec_for_task(task: str) -> SESRSpec:
    if task not in TASKS:
        raise KeyError(f"unknown task {task!r}; known: {sorted(TASKS)}")
    return TASKS[task]
