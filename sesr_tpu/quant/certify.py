"""Fast-mode certification: prove that the deployment fast datapath is exact
— statically where possible, mechanically over a calibration set otherwise.

The fast path (quant/integer.py, compute="fast") runs ONE full-channel conv
per layer and skips the per-PE 18-bit saturation stage of the ASIC — it is
bit-identical to the PE-exact path precisely when no accumulator ever
saturates. The reference's only guard for this was a print sentinel
(quan_func.py:357-361, "max_overflow"/"min_overflow"). This module
productizes that sentinel at three strength levels per layer:

STATIC (input-independent proof, round 3): interval arithmetic over the
FULL enforced int8 input domain. The executed datapath clamps every layer
input to [qmin, qmax] before the shift (quant/integer.py
_quantize_domain_in), so the shifted conv input is confined to
[qmin - z_eff, qmax - z_eff] (hulled with 0 for the SAME-padding /
pad-cell sites) NO MATTER what image arrives. Running the prefix-sum
interval of each PE's accumulation in the strict per-MAC tap order
(channel-major, then kernel row, then column — quan_modules.py:88-90)
against +-2^(PE_ACC_BIT-1) bounds every trajectory any input could
produce: a layer whose worst-case prefix interval stays in range can
never saturate, transiently or finally, for ANY input. Such layers are
fast-safe unconditionally — the out-of-distribution caveat of empirical
stamps does not apply to them.

EMPIRICAL (per-calibration-image evidence): for layers the static bound
cannot clear, the round-2 obligations run per image:
1. the PE-exact interpreter's 18-bit per-PE saturation counters are zero
   (20-bit adder events do NOT disqualify — the fast lowering applies the
   identical 20-bit clamp);
2. the per-MAC-saturating strict model agrees with the clamp-once conv at
   the layer's actual integer input, PER PE (quant/strict.py) — transient
   mid-accumulation saturation cannot hide behind an in-range final sum.

WHOLE-ARTIFACT equality obligations: a fully-certified artifact has the
fast interpreter AND the channel-packed fast lowering (ops/packed.py,
narrow int8/int16 inter-layer stores) proven array-equal to the PE-exact
interpreter on every image and every deployment cell geometry
(ops/packed.py CERTIFIED_CELLS — recorded into the artifact as
qp.cert_cells so the CLI gates geometries against what THIS artifact's
run actually executed), plus the strided-entry variant that serves
s_h>1 cells on large frames; the int16 narrow store of the residual
shortcut is additionally bounded directly (max |round(shortcut)| < 2^15),
and — where static_shortcut_bound clears 2^15 — PROVEN wrap-free for all
inputs (shortcut_static stamp; required for the "static" grade, so a
statically-graded artifact carries NO calibration-distribution caveat
anywhere in its fast lowering, narrow stores included).
A partially-certified artifact proves the layer-hybrid lowering equal the
same way.

`certify_fast` stamps fast_cert_ok / fast_cert_layers / fast_cert_static
into the QuantParams; compute="fast" refuses an unstamped artifact at
trace time.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from sesr_tpu.config import SESRSpec
from sesr_tpu.quant.integer import pe_channel_mask
from sesr_tpu.quant.params import QuantParams


def _input_interval(qp: QuantParams, i: int) -> Tuple[int, int]:
    """The full enforced domain of layer i's SHIFTED conv input: the int8
    clamp bounds minus the effective zero, hulled with 0 (zero padding at
    image borders and masked pad cells feed exact zeros)."""
    bits = qp.hw.quan_bits
    qmin, qmax = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
    z = qp.effective_zero(i)
    return min(0, qmin - z), max(0, qmax - z)


def _pe_tap_matrix(w_int: np.ndarray, pe: int, p: int) -> np.ndarray:
    """(T, OC) int64 tap weights of PE p in the strict per-MAC accumulation
    order: input channel outermost, then kernel row, then kernel column
    (quan_modules.py:88-90; channels c % pe != p masked to zero exactly as
    quant/strict.py does — a zero operand is an exact no-op MAC)."""
    w = np.asarray(w_int, np.int64)
    ic = w.shape[2]
    w_p = w * pe_channel_mask(ic, pe, p)[None, None, :, None]
    return w_p.transpose(2, 0, 1, 3).reshape(-1, w.shape[3])


def static_layer_safe(qp: QuantParams, i: int) -> bool:
    """Input-independent saturation-freedom proof for layer i.

    True iff, for every PE and output channel, the prefix-sum interval of
    the per-MAC accumulation over the full enforced input domain
    (_input_interval) stays strictly inside the PE_ACC_BIT saturation
    bounds. Sound for the fast lowering (no transient can exceed what some
    prefix interval allows) and for the strict per-MAC model (no clamp ever
    engages, so clamp-once == clamp-every-MAC == unclamped)."""
    hw = qp.hw
    lo_x, hi_x = _input_interval(qp, i)
    lim_hi = (1 << (hw.pe_acc_bits - 1)) - 1
    lim_lo = -(1 << (hw.pe_acc_bits - 1))
    for p in range(hw.pe):
        taps = _pe_tap_matrix(qp.w_int[i], hw.pe, p)         # (T, OC)
        t_lo = np.minimum(taps * lo_x, taps * hi_x)
        t_hi = np.maximum(taps * lo_x, taps * hi_x)
        if (np.cumsum(t_lo, axis=0).min() < lim_lo
                or np.cumsum(t_hi, axis=0).max() > lim_hi):
            return False
    return True


def static_layer_stamps(qp: QuantParams) -> Tuple[bool, ...]:
    """static_layer_safe for every conv."""
    return tuple(static_layer_safe(qp, i) for i in range(qp.num_convs))


def static_requant_bound(qp: QuantParams, i: int) -> float:
    """Input-independent upper bound on max |round(relu(requant_i(...)))| —
    the post-ReLU requant output of conv i (i < L-1; used for the int16
    narrow stores of the residual shortcut, i=0, and of the L-2 -> residual
    boundary). Hulls BOTH lowering forms of layer i:

    - fast/packed: one full conv, 20-bit clamp, clipped bias_int add;
    - PE-exact/hybrid: per-PE 18-bit clamps on (partial conv + floored-zero
      restoration), 20-bit clamp on the 4-PE sum, the fused
      clamp(bias_int - zero*sum(W)) bias (with the reference's unfloored-
      zero quirk, quan_func.py:484).

    Soundness: per-PE taps partition the kernel, clamping is monotone and
    contractive, so every per-input trajectory of either form lies inside
    the interval hull computed here over the full enforced int8 domain
    (_input_interval); the two f32 roundings of apply_requant_f32 are
    covered by the (1 + 1e-6) headroom, and round(x) <= x + 0.5."""
    hw = qp.hw
    lo_x, hi_x = _input_interval(qp, i)
    w = np.asarray(qp.w_int[i], np.int64)
    add_lo = -(1 << (hw.pe_add_bits - 1))
    add_hi = (1 << (hw.pe_add_bits - 1)) - 1
    acc_lo = -(1 << (hw.pe_acc_bits - 1))
    acc_hi = (1 << (hw.pe_acc_bits - 1)) - 1
    b_lo, b_hi = -(1 << (hw.bias_bits - 1)), (1 << (hw.bias_bits - 1)) - 1
    bias = np.asarray(qp.bias_int[i], np.int64)

    # form A (fast/packed)
    t_hi = np.maximum(w * lo_x, w * hi_x).sum(axis=(0, 1, 2))
    hi_a = np.clip(t_hi, add_lo, add_hi) + np.clip(bias, b_lo, b_hi)

    # form B (PE-exact / hybrid)
    z = qp.a_zero[i]
    z_eff = qp.effective_zero(i)
    ic = w.shape[2]
    s_hi = np.zeros(w.shape[3], np.int64)
    for p in range(hw.pe):
        wp = w * pe_channel_mask(ic, hw.pe, p)[None, None, :, None]
        p_hi = np.maximum(wp * lo_x, wp * hi_x).sum(axis=(0, 1, 2))
        rest = z_eff * wp.sum(axis=(0, 1, 2))
        s_hi += np.clip(p_hi + rest, acc_lo, acc_hi)
    fused = np.clip(bias - z * w.sum(axis=(0, 1, 2)), b_lo, b_hi)
    hi_b = np.clip(s_hi, add_lo, add_hi) + fused

    hi_y = float(max(hi_a.max(), hi_b.max(), 0))
    h_hi = hi_y * qp.requant_m[i] * 2.0 ** (-qp.requant_n[i]) * (1 + 1e-6)
    return h_hi + 0.5


def static_shortcut_bound(qp: QuantParams) -> float:
    """static_requant_bound for the residual shortcut (layer 0)."""
    return static_requant_bound(qp, 0)


def static_shortcut_safe(qp: QuantParams) -> bool:
    """True iff the int16 narrow store of the residual shortcut is PROVEN
    wrap-free for ALL inputs (not just the calibration set)."""
    return static_shortcut_bound(qp) < float(1 << 15)


def adversarial_input_for_layer(qp: QuantParams, i: int):
    """The worst-case SHIFTED input patch for layer i: a (1, k, k, IC) int
    array (values in the enforced domain) that drives some PE's per-MAC
    prefix sum at the center output position to its interval extreme.

    Every site takes lo_x or hi_x according to the sign of the worst
    (PE, out-channel)'s kernel weight there, so the center position's
    accumulation trajectory IS the interval bound — if static_layer_safe
    holds, even this input cannot saturate; if it does not because the
    bound is exceeded, this input realizes an 18-bit event. Used by
    tests/test_certify.py to show the static stamp is tight, not vacuous.
    """
    hw = qp.hw
    w = np.asarray(qp.w_int[i], np.int64)
    k, _, ic, oc = w.shape
    lo_x, hi_x = _input_interval(qp, i)

    best = None                                     # (|extreme|, p, o, sign)
    for p in range(hw.pe):
        taps = _pe_tap_matrix(w, hw.pe, p)
        t_lo = np.minimum(taps * lo_x, taps * hi_x)
        t_hi = np.maximum(taps * lo_x, taps * hi_x)
        hi_ext = np.cumsum(t_hi, axis=0).max(axis=0)         # (OC,)
        lo_ext = np.cumsum(t_lo, axis=0).min(axis=0)
        for o in range(oc):
            for val, sign in ((hi_ext[o], +1), (-lo_ext[o], -1)):
                if best is None or val > best[0]:
                    best = (val, p, o, sign)
    _, p, o, sign = best
    mask = pe_channel_mask(ic, hw.pe, p)[None, None, :]
    w_po = w[:, :, :, o] * mask                              # (k, k, IC)
    x = np.where(w_po * sign > 0, hi_x, lo_x).astype(np.int32)
    x = np.where((w_po == 0) & ~np.broadcast_to(mask, w_po.shape), 0, x)
    return x[None], (p, o, sign)


def adversarial_image(qp: QuantParams, hw: Tuple[int, int] = (64, 96)):
    """A legitimate [0, 1] NHWC image that realizes layer 0's interval-
    extreme accumulation trajectory: the adversarial_input_for_layer(qp, 0)
    shifted patch, mapped back through the layer-0 quantizer
    (x = (q - zero) * scale with q = x_shift + z_eff — exactly invertible,
    every q is in the enforced int8 domain) and tiled to ``hw``.

    If layer 0 is NOT statically proven, this image fires real 18-bit
    events on it — the out-of-distribution input the empirical-stamp
    caveat warns about, realized. Used by the runtime audit tests
    (quant/audit.py) and available for red-teaming an artifact's
    empirical stamps."""
    x_shift, _meta = adversarial_input_for_layer(qp, 0)
    z_eff = qp.effective_zero(0)
    zero, scale = qp.a_zero[0], qp.a_scale[0]
    q = x_shift[0] + z_eff                               # (k, k, IC)
    k = q.shape[0]
    reps = (hw[0] + k - 1) // k, (hw[1] + k - 1) // k
    img_q = np.tile(q, (reps[0], reps[1], 1))[: hw[0], : hw[1], :]
    x = ((img_q - zero) * scale).astype(np.float32)
    return np.clip(x, 0.0, 1.0)[None]


def certify_fast(spec: SESRSpec, qp: QuantParams,
                 images: Sequence[np.ndarray]) -> QuantParams:
    """Run the proof obligations over `images` (NHWC float in [0,1]).

    Returns a copy of `qp` with fast_cert_ok / fast_cert_images /
    fast_cert_layers / fast_cert_static stamped:

    - fast_cert_static[i]: layer i is PROVEN saturation-free for ALL
      possible inputs (interval arithmetic, static_layer_safe) — no
      calibration-distribution caveat applies.
    - fast_cert_layers[i]: layer i is fast-safe — statically, or
      empirically over every image (zero 18-bit events + zero per-MAC
      strict divergence). Powers the LAYER-HYBRID deployment path
      (ops/packed.py packed_hybrid_forward) for tasks whose saturation is
      confined to a few layers (nr and nrdm_6: the last conv only).
    - fast_cert_ok: every layer is fast-safe AND the fast interpreter and
      every CERTIFIED_CELLS packed fast lowering (narrow int8/int16
      stores included) reproduced the PE-exact output array-exactly on
      every image, with the int16 shortcut store bounded directly.

    Empirical stamps are evidence on the calibration distribution, so the
    images should cover the deployment distribution; static stamps are
    proofs and need no images at all. SOUNDNESS of the zero-image case:
    with `images=[]` every per-image obligation below is vacuous, so ONLY
    the static proofs may stamp anything — a non-static layer gets NO
    stamp, and fast_cert_ok additionally requires the int16 shortcut
    store's static proof (shortcut_static). An all-static artifact may
    therefore certify from zero images (that IS the "static" grade: the
    math equality is proven by interval arithmetic; the lowerings' CODE
    equality is pinned by the test suite on fixed artifacts) — but an
    artifact with any empirical-only layer can never come back
    fast_cert_ok from zero evidence (round-3 verdict item 3;
    tests/test_certify.py::test_empty_image_set_cannot_stamp_empirical).
    """
    from sesr_tpu.ops.packed import CERTIFIED_CELLS
    from sesr_tpu.quant.integer import integer_forward, _pe_weight_masks
    from sesr_tpu.quant.strict import strict_vs_fast_divergence

    L = qp.num_convs
    static = list(static_layer_stamps(qp))
    # optimistically-stamped copy so the fast/hybrid lowerings can run during
    # their own certification (the trace-time guard would otherwise refuse)
    qp_try = dataclasses.replace(qp, fast_cert_ok=True,
                                 fast_cert_images=len(images),
                                 fast_cert_layers=tuple([True] * L),
                                 fast_cert_static=tuple(static))
    # static layers are proven; the rest start optimistic and are demoted
    # by per-image evidence (counters / per-MAC strict divergence). With
    # NO images there is no evidence at all: only static proofs stamp.
    layer_ok = [True] * L if images else list(static)
    exact_outs = []
    shortcut_max = 0.0
    for img in images:
        x = jnp.asarray(img, jnp.float32)
        y_exact, dumps = integer_forward(spec, qp_try, x, collect_dumps=True,
                                         corrected=True)
        exact_outs.append(np.asarray(y_exact))
        shortcut_max = max(shortcut_max,
                           float(np.abs(np.round(
                               np.asarray(dumps["shortcut"]))).max()))
        ovf18 = np.asarray(dumps["overflow_18"])
        for i in range(L):
            if static[i]:
                # the static proof covers every input; a counter firing here
                # would mean the bound is unsound — surface it loudly
                assert ovf18[i] == 0, (
                    f"layer {i}: statically-proven-safe but 18-bit counter "
                    f"fired ({int(ovf18[i])} events) — interval bound bug")
                continue
            if ovf18[i] != 0:
                layer_ok[i] = False
        for i in range(L):
            if static[i] or not layer_ok[i]:
                continue
            x_shift = (np.asarray(dumps[f"input.{i}"], np.int32)
                       - qp.effective_zero(i))
            if any(strict_vs_fast_divergence(x_shift, w_p, qp.hw) != 0
                   for w_p in _pe_weight_masks(np.asarray(qp.w_int[i]),
                                               qp.hw.pe)):
                layer_ok[i] = False

    # static proof for the int16 shortcut store; when it holds, the
    # empirical max must lie under the interval bound or the bound is
    # unsound — surface that loudly like the layer-counter cross-check
    sc_bound = static_shortcut_bound(qp)
    sc_static = sc_bound < float(1 << 15)
    if sc_static and images:
        assert shortcut_max <= sc_bound, (
            f"shortcut statically bounded at {sc_bound:.1f} but measured "
            f"{shortcut_max:.1f} — interval bound bug")

    ok = all(layer_ok)
    if ok and not images and not sc_static:
        # zero-image run on an all-static artifact whose int16 shortcut
        # store lacks a static proof: the empirical shortcut bound below
        # would pass vacuously (shortcut_max == 0) — refuse the full stamp
        ok = False
    if ok:
        # direct bound on the int16 narrow store of the residual shortcut
        # (ops/packed.py narrow_store) — a wrap there would corrupt the
        # residual add silently
        if shortcut_max >= float(1 << 15):
            ok, layer_ok = False, [False] * L
    if ok:
        from sesr_tpu.ops.packed import packed_fast_forward
        for img, y_e in zip(images, exact_outs):
            y_fast, _ = integer_forward(spec, qp_try, jnp.asarray(img),
                                        corrected=True, compute="fast")
            if not np.array_equal(y_e, np.asarray(y_fast)):
                # should be unreachable given the per-layer obligations;
                # demote everything rather than ship unsound stamps
                ok, layer_ok = False, [False] * L
                break
        # the packed fast lowering (incl. its narrow int8/int16 inter-layer
        # stores) on every geometry the deployment surface exposes
        if ok:
            for cells in CERTIFIED_CELLS:
                for img, y_e in zip(images, exact_outs):
                    y_p = packed_fast_forward(spec, qp_try, img, cells)
                    if not np.array_equal(y_e, np.asarray(y_p)):
                        ok, layer_ok = False, [False] * L
                        break
                if not ok:
                    break
        if ok:
            # the STRIDED-entry variant (entry="auto" selects it for
            # s_h>1 cells on >=1.5 Mpx frames in deployment, which the
            # small calibration crops never trigger through "auto" —
            # exercise it explicitly, on EVERY s_h>1 geometry the gate
            # admits, so each large-frame strided program this artifact
            # can serve is inside its own equality run (round-3 advisor:
            # checking only (2,4) left 4x2/2x2/4x4 outside the
            # per-artifact proof while cert_cells admitted them)
            for cells in CERTIFIED_CELLS:
                if cells[0] <= 1:
                    continue    # W-only cells never select the strided entry
                for img, y_e in zip(images, exact_outs):
                    y_s = packed_fast_forward(spec, qp_try, img, cells,
                                              entry="strided")
                    if not np.array_equal(y_e, np.asarray(y_s)):
                        ok, layer_ok = False, [False] * L
                        break
                if not ok:
                    break
    elif any(layer_ok):
        from sesr_tpu.ops.packed import packed_hybrid_forward
        # carry the shortcut_static stamp into the equality run: the
        # hybrid lowering narrow-stores its boundaries exactly when the
        # artifact holds that proof, so the program verified here must be
        # the program that will serve
        qp_h = dataclasses.replace(qp_try, fast_cert_ok=False,
                                   fast_cert_layers=tuple(layer_ok),
                                   shortcut_static=sc_static)
        # mechanical belt-and-braces over every geometry the CLI/bench
        # expose (the packed rewrite is cell-size-exact by construction)
        for cells in CERTIFIED_CELLS:
            for img, y_e in zip(images, exact_outs):
                y_h = packed_hybrid_forward(spec, qp_h, img, cells)
                if not np.array_equal(y_e, np.asarray(y_h)):
                    layer_ok = [False] * L
                    break
            if not any(layer_ok):
                break
    return dataclasses.replace(qp, fast_cert_ok=ok,
                               fast_cert_images=len(images),
                               fast_cert_layers=tuple(layer_ok),
                               fast_cert_static=tuple(static),
                               shortcut_static=sc_static,
                               cert_cells=tuple(CERTIFIED_CELLS))
