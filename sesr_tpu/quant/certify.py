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

Round 2 refinement — PER-LAYER stamps (`fast_cert_layers`): obligations 1-2
are evaluated per layer (and obligation 1 splits the counters: only 18-bit
per-PE events disqualify — the fast lowering applies the identical 20-bit
adder clamp). Tasks whose saturation is confined to a few layers (nr and
nrdm_6: the last conv only) then run the LAYER-HYBRID deployment lowering
(ops/packed.py packed_hybrid_forward) at near-fast speed, with its
end-to-end equality to the PE-exact interpreter proven per calibration
image as obligation 3'.
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

    Returns a copy of `qp` with fast_cert_ok / fast_cert_images /
    fast_cert_layers stamped. fast_cert_layers[i] is True when layer i's
    18-bit events and per-MAC strict divergence are both zero over every
    image — the per-layer refinement that powers the LAYER-HYBRID
    deployment path (ops/packed.py packed_hybrid_forward) for tasks whose
    saturation is confined to a few layers (nr and nrdm_6 saturate only in
    their last conv). 20-bit adder events do NOT disqualify a layer: the
    fast lowering applies the identical 20-bit clamp.

    A partially-certified artifact additionally has its hybrid lowering
    proven array-equal to the PE-exact interpreter end-to-end on every
    image (the per-layer flags are sound by induction — a fast layer fed
    the exact path's inputs produces the exact path's outputs — and the
    equality check makes that mechanical, not rhetorical). Certification is
    evidence on the calibration distribution, so the images should cover
    the deployment distribution.
    """
    from sesr_tpu.quant.integer import integer_forward, _pe_weight_masks
    from sesr_tpu.quant.strict import strict_vs_fast_divergence

    L = qp.num_convs
    # optimistically-stamped copy so the fast/hybrid lowerings can run during
    # their own certification (the trace-time guard would otherwise refuse)
    qp_try = dataclasses.replace(qp, fast_cert_ok=True,
                                 fast_cert_images=len(images),
                                 fast_cert_layers=tuple([True] * L))
    layer_ok = [True] * L
    exact_outs = []
    for img in images:
        x = jnp.asarray(img, jnp.float32)
        y_exact, dumps = integer_forward(spec, qp_try, x, collect_dumps=True,
                                         corrected=True)
        exact_outs.append(np.asarray(y_exact))
        ovf18 = np.asarray(dumps["overflow_18"])
        for i in range(L):
            if ovf18[i] != 0:
                layer_ok[i] = False
        for i in range(L):
            if not layer_ok[i]:
                continue
            x_shift = (np.asarray(dumps[f"input.{i}"], np.int32)
                       - qp.effective_zero(i))
            if any(strict_vs_fast_divergence(x_shift, w_p, qp.hw) != 0
                   for w_p in _pe_weight_masks(np.asarray(qp.w_int[i]),
                                               qp.hw.pe)):
                layer_ok[i] = False

    ok = all(layer_ok)
    if ok:
        for img, y_e in zip(images, exact_outs):
            y_fast, _ = integer_forward(spec, qp_try, jnp.asarray(img),
                                        corrected=True, compute="fast")
            if not np.array_equal(y_e, np.asarray(y_fast)):
                # should be unreachable given the per-layer obligations;
                # demote everything rather than ship unsound stamps
                ok, layer_ok = False, [False] * L
                break
    elif any(layer_ok):
        from sesr_tpu.ops.packed import packed_hybrid_forward
        qp_h = dataclasses.replace(qp_try, fast_cert_ok=False,
                                   fast_cert_layers=tuple(layer_ok))
        # check every cell geometry the CLI/bench expose (the packed
        # rewrite is cell-size-exact by construction; this is the
        # mechanical belt-and-braces over the implementation)
        for cells in ((2, 4), (4, 4)):
            for img, y_e in zip(images, exact_outs):
                y_h = packed_hybrid_forward(spec, qp_h, img, cells)
                if not np.array_equal(y_e, np.asarray(y_h)):
                    layer_ok = [False] * L
                    break
            if not any(layer_ok):
                break
    return dataclasses.replace(qp, fast_cert_ok=ok,
                               fast_cert_images=len(images),
                               fast_cert_layers=tuple(layer_ok))
