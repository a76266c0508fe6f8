"""Fast-mode certification: mechanically prove, over a calibration set, that
the deployment fast datapath is exact.

The fast path (quant/integer.py, compute="fast") runs ONE full-channel conv
per layer and skips the per-PE 18-bit saturation stage of the ASIC — it is
bit-identical to the PE-exact path precisely when no accumulator ever
saturates. The reference's only guard for this was a print sentinel
(quan_func.py:357-361, "max_overflow"/"min_overflow"). This module
productizes that sentinel as a three-way proof obligation per calibration
image:

1. the PE-exact interpreter's saturation-event counters are all zero
   (18-bit per-PE and 20-bit adder stages);
2. the per-MAC-saturating strict model agrees with the clamp-once conv at
   every layer's actual integer input (quant/strict.py
   strict_vs_fast_divergence == 0) — transient mid-accumulation saturation
   cannot hide behind an in-range final sum. Checked per PE (the ASIC runs
   4 separate accumulators over the channel round-robin,
   quan_modules.py:101-201 composes conv_forward_naive per pseudo-batch),
   NOT one fused accumulator over all channels — interleaving all channels
   into one per-MAC-clamped trajectory is a different (unimplemented)
   machine and reports false transients ~4x larger than the hardware's;
3. the fast lowering's output is array-equal to the PE-exact output.

`certify_fast` stamps the verdict into `QuantParams.fast_cert_ok`;
`compute="fast"` refuses an unstamped artifact at trace time.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np
import jax.numpy as jnp

from sesr_tpu.config import SESRSpec
from sesr_tpu.quant.params import QuantParams


def certify_fast(spec: SESRSpec, qp: QuantParams,
                 images: Sequence[np.ndarray]) -> QuantParams:
    """Run the proof obligations over `images` (NHWC float in [0,1]).

    Returns a copy of `qp` with fast_cert_ok/fast_cert_images stamped.
    A failed obligation returns fast_cert_ok=False (and the fast path will
    refuse the artifact); certification is evidence on the calibration
    distribution, so the images should cover the deployment distribution.
    """
    from sesr_tpu.quant.integer import integer_forward, _pe_weight_masks
    from sesr_tpu.quant.strict import strict_vs_fast_divergence

    # optimistically-stamped copy so the fast lowering can run during its own
    # certification (the trace-time guard would otherwise refuse it)
    qp_try = dataclasses.replace(qp, fast_cert_ok=True,
                                 fast_cert_images=len(images))
    ok = True
    for img in images:
        x = jnp.asarray(img, jnp.float32)
        y_exact, dumps = integer_forward(spec, qp_try, x, collect_dumps=True,
                                         corrected=True)
        if int(np.asarray(dumps["overflow_counts"]).sum()) != 0:
            ok = False
            break
        for i in range(qp.num_convs):
            x_shift = (np.asarray(dumps[f"input.{i}"], np.int32)
                       - qp.effective_zero(i))
            if any(strict_vs_fast_divergence(x_shift, w_p, qp.hw) != 0
                   for w_p in _pe_weight_masks(np.asarray(qp.w_int[i]),
                                               qp.hw.pe)):
                ok = False
                break
        if not ok:
            break
        y_fast, _ = integer_forward(spec, qp_try, x, corrected=True,
                                    compute="fast")
        if not np.array_equal(np.asarray(y_exact), np.asarray(y_fast)):
            ok = False
            break
    return dataclasses.replace(qp, fast_cert_ok=ok,
                               fast_cert_images=len(images))
