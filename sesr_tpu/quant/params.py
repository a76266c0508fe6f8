"""QuantParams: the single explicit artifact holding every quantization
constant of a network.

The reference scatters this state across an output_pt/ file tree — scales,
zero points, int weights, requant factors, the residual shortcut — written
and re-read on every call (quan_func.py:419-422, 521-522 et passim). Here it
is one picklable pytree produced by `finalize()` after calibration and
consumed by the fake-quant, integer, and Pallas paths.

Scalar arithmetic deliberately happens in python float64, matching the
reference's use of `.item()` python floats for all scale math
(quan_func.py:58-70, 198-205; test.py:186-217); tensors only ever see the
float32-cast of these scalars.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from sesr_tpu.config import HardwareConfig, SESRSpec, DEFAULT_HW
from sesr_tpu.ops.fixedpoint import encode_requant


@dataclasses.dataclass
class CalibState:
    """Running per-domain activation min/max. Domain i = input of conv i;
    domain L = the output domain (PixelShuffle input upstream)."""

    min_vals: List[float]
    max_vals: List[float]

    @classmethod
    def fresh(cls, num_domains: int) -> "CalibState":
        return cls([float("inf")] * num_domains, [float("-inf")] * num_domains)

    def update(self, domain: int, lo: float, hi: float) -> None:
        if lo < self.min_vals[domain]:
            self.min_vals[domain] = float(lo)
        if hi > self.max_vals[domain]:
            self.max_vals[domain] = float(hi)


def asym_qparams(lo: float, hi: float, bits: int):
    """Asymmetric per-tensor scale/zero (reference quan_func.py:198-205 /
    test.py:190-193): scale=(max-min)/(qmax-qmin), zero=qmin-round(min/scale).
    round() is python banker's rounding, as upstream."""
    qmax = 2 ** (bits - 1) - 1
    qmin = -(2 ** (bits - 1))
    scale = (hi - lo) / (qmax - qmin)
    if scale == 0.0:
        # the reference asserts "Input tensor is all equal"
        # (quan_func.py:196); surface the degenerate calibration domain
        # with context instead of a bare ZeroDivisionError
        raise ValueError(
            f"degenerate calibration domain [{lo}, {hi}]: every observed "
            f"activation is equal — calibrate on images with signal "
            f"(the reference's 'Input tensor is all equal' case)")
    zero = qmin - round(lo / scale)
    return scale, int(zero)


def sym_qparams(absmax: float, bits: int) -> float:
    """Symmetric per-tensor weight scale (quan_func.py:61-70):
    scale = 2*absmax / (qmax-qmin)."""
    qmax = 2 ** (bits - 1) - 1
    qmin = -(2 ** (bits - 1))
    return (absmax - (-absmax)) / (qmax - qmin)


@dataclasses.dataclass
class QuantParams:
    """Everything needed to run a collapsed SESR net in INT8.

    Lists are indexed by conv id 0..L-1; activation domains by 0..L.
    """

    task: str
    hw: HardwareConfig
    # weights
    w_scale: List[float]                # symmetric per-tensor weight scales
    w_int: List[np.ndarray]             # HWIO int8-valued arrays (stored int32)
    bias_f: List[np.ndarray]            # original float biases, (OC,)
    # activations
    a_scale: List[float]                # len L+1
    a_zero: List[int]                   # len L+1
    # integer-mode derived constants
    bias_int: List[np.ndarray]          # clamp(round(bias/(s_a*s_w)), 16b), (OC,)
    requant_m: List[int]                # per conv: mantissa into its wired domain
    requant_n: List[int]
    res_requant_m: int                  # residual-add rescale s_1/s_{L-1}
    res_requant_n: int
    # fast-mode certificate (quant/certify.py): the deployment fast path
    # (single full-channel conv per layer, no per-PE 18-bit saturation) is
    # only exact when no accumulator ever saturates; certify_fast() verifies
    # that over a calibration set (overflow counters + per-layer per-MAC
    # strict divergence + fast==PE-exact equality) and stamps the result
    # here. compute="fast" REFUSES an uncertified artifact
    # (quant/integer.py). The sentinel being productized is the reference's
    # max_overflow/min_overflow print (quan_func.py:357-361).
    fast_cert_ok: bool = False
    fast_cert_images: int = 0
    # per-layer refinement of the certificate: layer i is fast-safe when
    # its 18-bit per-PE saturation events AND per-MAC strict divergence
    # are zero over the calibration set (20-bit adder events do NOT
    # disqualify — the fast lowering applies the same 20-bit clamp).
    # Tasks whose saturation is confined to a few layers (nr, nrdm_6:
    # last conv only) run the layer-hybrid deployment path
    # (ops/packed.py packed_hybrid_forward): PE-exact on unsafe layers,
    # fast everywhere else, end-to-end array-equal to the full PE-exact
    # path (certified per image in quant/certify.py).
    fast_cert_layers: Optional[Tuple[bool, ...]] = None
    # STATIC (input-independent) refinement: layer i is PROVEN
    # saturation-free for ALL possible inputs by interval arithmetic over
    # the full enforced int8 domain (quant/certify.py static_layer_safe) —
    # the executed clamp confines every layer input to [qmin, qmax], so the
    # worst-case per-MAC prefix interval bounds every trajectory any image
    # could produce. Statically-stamped layers carry NO
    # calibration-distribution caveat; empirically-stamped ones
    # (fast_cert_layers[i] and not fast_cert_static[i]) remain evidence on
    # the calibration set only.
    fast_cert_static: Optional[Tuple[bool, ...]] = None
    # STATIC proof that the int16 narrow store of the residual shortcut
    # (ops/packed.py) cannot wrap for ANY input: interval bound on
    # round(relu(requant_0(...))) over the full enforced int8 domain,
    # hulling both lowering forms (quant/certify.py
    # static_shortcut_bound). Without it the narrow store is only
    # empirically bounded over the calibration set.
    shortcut_static: bool = False
    # the cell geometries whose packed lowerings the certification's
    # equality obligations ACTUALLY executed (quant/certify.py stamps the
    # CERTIFIED_CELLS of its run) — the CLI gates --cells against the
    # artifact's own record, so an artifact stamped before a geometry was
    # added to CERTIFIED_CELLS cannot silently serve it
    cert_cells: Optional[Tuple[Tuple[int, int], ...]] = None

    @property
    def cert_grade(self) -> str:
        """"static" (every layer AND the int16 shortcut store proven for
        all inputs), "empirical" (fully certified on the calibration set),
        "partial" (layer-hybrid eligible), or "none".

        "static" additionally requires fast_cert_ok: certify_fast demotes
        the whole artifact (fast_cert_ok=False, layers all-False) when a
        WHOLE-ARTIFACT obligation fails (int16 shortcut bound, fast/packed
        equality) — the per-layer interval proofs still hold then, but the
        artifact must not be reported at the strongest grade while its fast
        lowering is refused service."""
        if (self.fast_cert_ok and self.shortcut_static
                and self.fast_cert_static is not None
                and all(self.fast_cert_static)):
            return "static"
        if self.fast_cert_ok:
            return "empirical"
        if self.fast_cert_layers is not None and any(self.fast_cert_layers):
            return "partial"
        return "none"

    @property
    def cert_stamps(self) -> str:
        """Per-layer stamp string: S = statically proven for ALL inputs,
        F = empirically fast-safe over the calibration set, x = saturates
        (PE-exact lowering only). Shared by every reporting surface."""
        if self.fast_cert_layers is None or self.fast_cert_static is None:
            return "?" * self.num_convs
        return "".join("S" if s else ("F" if f else "x")
                       for f, s in zip(self.fast_cert_layers,
                                       self.fast_cert_static))

    @property
    def num_convs(self) -> int:
        return len(self.w_int)

    def effective_zero(self, i: int) -> int:
        """Zero point actually subtracted before conv: floored at -128 because
        the hardware (and F.conv2d upstream) can only zero-pad
        (quan_func.py:289-293, 351-352)."""
        return max(self.a_zero[i], -(1 << (self.hw.quan_bits - 1)))

    def fused_bias(self, i: int) -> np.ndarray:
        """clamp(bias_int - zero_i * sum(W_int), +-2^15) per output channel.

        NOTE (reference quirk, replicated): the zero here is the RAW zero
        point, not the -128-floored one used for the per-PE restoration —
        quan_func.py:484 multiplies by the unfloored `input_zero` while
        :351-356 floors it.
        """
        hi = (1 << (self.hw.bias_bits - 1)) - 1
        lo = -(1 << (self.hw.bias_bits - 1))
        w_sum = self.w_int[i].sum(axis=(0, 1, 2))          # (OC,)
        const = self.bias_int[i] - w_sum * self.a_zero[i]
        return np.clip(const, lo, hi)

    # ---- serialization ----------------------------------------------------
    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        arrays = {}
        for i in range(self.num_convs):
            arrays[f"w_int_{i}"] = self.w_int[i]
            arrays[f"bias_f_{i}"] = self.bias_f[i]
            arrays[f"bias_int_{i}"] = self.bias_int[i]
        meta = dict(
            task=self.task,
            hw=dataclasses.asdict(self.hw),
            w_scale=self.w_scale, a_scale=self.a_scale, a_zero=self.a_zero,
            requant_m=self.requant_m, requant_n=self.requant_n,
            res_requant_m=self.res_requant_m, res_requant_n=self.res_requant_n,
            num_convs=self.num_convs,
            fast_cert_ok=self.fast_cert_ok,
            fast_cert_images=self.fast_cert_images,
            fast_cert_layers=(None if self.fast_cert_layers is None
                              else list(self.fast_cert_layers)),
            fast_cert_static=(None if self.fast_cert_static is None
                              else list(self.fast_cert_static)),
            shortcut_static=self.shortcut_static,
            cert_cells=(None if self.cert_cells is None
                        else [list(c) for c in self.cert_cells]),
        )
        # write to the LITERAL path (np.savez(str) silently appends .npz,
        # desynchronizing save/load for suffixless paths)
        with open(path, "wb") as f:
            np.savez(f, __meta__=json.dumps(meta), **arrays)

    @classmethod
    def load(cls, path: str) -> "QuantParams":
        data = np.load(path, allow_pickle=False)
        meta = json.loads(str(data["__meta__"]))
        L = meta["num_convs"]
        return cls(
            task=meta["task"],
            hw=HardwareConfig(**meta["hw"]),
            w_scale=[float(s) for s in meta["w_scale"]],
            w_int=[data[f"w_int_{i}"] for i in range(L)],
            bias_f=[data[f"bias_f_{i}"] for i in range(L)],
            a_scale=[float(s) for s in meta["a_scale"]],
            a_zero=[int(z) for z in meta["a_zero"]],
            bias_int=[data[f"bias_int_{i}"] for i in range(L)],
            requant_m=[int(m) for m in meta["requant_m"]],
            requant_n=[int(n) for n in meta["requant_n"]],
            res_requant_m=int(meta["res_requant_m"]),
            res_requant_n=int(meta["res_requant_n"]),
            fast_cert_ok=bool(meta.get("fast_cert_ok", False)),
            fast_cert_images=int(meta.get("fast_cert_images", 0)),
            fast_cert_layers=(None if meta.get("fast_cert_layers")
                              is None else
                              tuple(bool(b) for b in
                                    meta["fast_cert_layers"])),
            fast_cert_static=(None if meta.get("fast_cert_static")
                              is None else
                              tuple(bool(b) for b in
                                    meta["fast_cert_static"])),
            shortcut_static=bool(meta.get("shortcut_static", False)),
            cert_cells=(
                tuple(tuple(int(v) for v in c) for c in meta["cert_cells"])
                if meta.get("cert_cells") is not None
                # legacy artifact (stamped before the geometry record
                # existed): the equality obligations of those runs executed
                # exactly this set
                else (((2, 4), (4, 2), (2, 2), (4, 4))
                      if meta.get("fast_cert_layers") is not None else None)),
        )


def quantize_weights(weights_hwio: Sequence[np.ndarray], hw: HardwareConfig = DEFAULT_HW):
    """Symmetric per-tensor INT8 weight quantization (quan_func.py:44-126).

    Returns (w_int list [int32 arrays with int8 values], w_scale list [f64]).
    Rounding is to-nearest-even on the float32 tensor, as torch.round.
    """
    w_ints, w_scales = [], []
    for w in weights_hwio:
        w = np.asarray(w, dtype=np.float32)
        absmax = max(abs(float(w.max())), abs(float(w.min())))
        assert absmax > 0, "conv weight tensor is all zero"
        scale = sym_qparams(absmax, hw.quan_bits)
        q = np.clip(np.rint(w / np.float32(scale)),
                    -(1 << (hw.quan_bits - 1)), (1 << (hw.quan_bits - 1)) - 1)
        w_ints.append(q.astype(np.int32))
        w_scales.append(scale)
    return w_ints, w_scales


def requant_target_domain(i: int, num_convs: int) -> int:
    """Which activation domain conv i's output is requantized into.

    Generalizes the reference's hard-coded func_id wiring
    (quan_func.py:517-611, written for the 5-conv nets):
      - conv 0 -> domain 1, and its post-ReLU output is the residual shortcut
      - the LAST residual block -> domain 1's scale (so the shortcut and the
        branch share a scale for the integer residual add; func_id 3 upstream)
      - the last conv -> the output domain L (with zero-point add + int8 clamp)
      - everything else -> the next conv's domain
    The reference cannot run its 8-conv net (nrdm_6) through this path at all;
    the generalization here makes it work for any depth.
    """
    L = num_convs
    if i == 0:
        return 1
    if i == L - 2:
        return 1
    if i == L - 1:
        return L
    return i + 1


def finalize(spec: SESRSpec,
             w_int: Sequence[np.ndarray],
             w_scale: Sequence[float],
             bias_f: Sequence[np.ndarray],
             calib: CalibState,
             hw: HardwareConfig = DEFAULT_HW,
             force_output_min_zero: bool = True,
             safe_zero_floor: bool = False) -> QuantParams:
    """Turn calibration min/max into a complete QuantParams.

    Mirrors test.py:186-217 (incl. forcing the output domain's min to 0 so
    zero = -128, because the hardware cannot store zeros below -128) plus the
    requant-constant derivation of quan_func.py:517-611.

    safe_zero_floor: when a domain's observed min is positive enough that
    zero < -128, the reference simply floors the zero at execution time
    (quan_func.py:289-293), which silently CLIPS the top of the
    representable range (e.g. everything above 0.89 for a domain calibrated
    to [0.08, 1.0]). With this flag the domain is re-anchored at min=0 so
    zero == -128 exactly — the same remedy the reference applies, but only
    to its output domain (test.py:205-217). Off by default (bit-exact
    reference behaviour); used by the corrected deployment mode.
    """
    L = spec.num_convs
    a_scale, a_zero = [], []
    for d in range(L + 1):
        lo, hi = calib.min_vals[d], calib.max_vals[d]
        if d == L and force_output_min_zero:
            lo = 0.0
        s, z = asym_qparams(lo, hi, hw.quan_bits)
        if safe_zero_floor and z < -(1 << (hw.quan_bits - 1)):
            s, z = asym_qparams(0.0, hi, hw.quan_bits)
        a_scale.append(s)
        a_zero.append(z)

    bias_hi = (1 << (hw.bias_bits - 1)) - 1
    bias_lo = -(1 << (hw.bias_bits - 1))
    bias_int = []
    for i in range(L):
        bscale = a_scale[i] * w_scale[i]
        q = np.clip(np.rint(np.asarray(bias_f[i], np.float32) / np.float32(bscale)),
                    bias_lo, bias_hi)
        bias_int.append(q.astype(np.int32))

    requant_m, requant_n = [], []
    for i in range(L):
        target = requant_target_domain(i, L)
        # op order matches quan_func.py:527: (s_i / s_target) * s_w
        const = a_scale[i] / a_scale[target] * w_scale[i]
        m, n = encode_requant(const, hw.requant_bits, hw.requant_n_max)
        requant_m.append(m)
        requant_n.append(n)

    res_const = a_scale[1] / a_scale[L - 1]          # quan_func.py:259
    res_m, res_n = encode_requant(res_const, hw.requant_bits, hw.requant_n_max)

    return QuantParams(
        task=spec.name, hw=hw,
        w_scale=list(w_scale), w_int=list(w_int),
        bias_f=[np.asarray(b, np.float32) for b in bias_f],
        a_scale=a_scale, a_zero=a_zero, bias_int=bias_int,
        requant_m=requant_m, requant_n=requant_n,
        res_requant_m=res_m, res_requant_n=res_n,
    )
