"""Runtime OOD saturation audit for empirically-stamped artifacts.

Certificate stamps come in two strengths (quant/certify.py): STATIC layers
are proven saturation-free for ALL inputs, but EMPIRICAL layers are only
evidenced over the calibration distribution — an out-of-distribution frame
that fires an 18-bit accumulator event on an empirically-stamped layer
voids the fast lowering's exactness claim for that frame, and the fast
datapath itself cannot notice (it skips the per-PE stage entirely). The
reference at least printed its overflow sentinel on every single run
(quan_func.py:357-361); this module is that sentinel productized for the
fast/hybrid serving paths:

- `audit_frame` runs the always-sound PE-exact interpreter (with the
  overflow counters) on a frame and flags 18-bit events on any layer the
  serving mode trusts on empirical evidence, plus output divergence when
  the served output is provided.
- `stream_frames(..., audit_every=N)` (parallel/multihost.py) audits every
  Nth batch, re-serves a failed batch through the sound PE-exact lowering,
  warns (`OODSaturationWarning`), and degrades the rest of the stream to
  the sound path.
- `infer --audit N` (cli.py) does the same for the single-chip CLI.

Statically-graded artifacts have no empirical trust anywhere
(`empirically_trusted_layers` is empty) and need no audit — the proof is
input-independent.
"""

from __future__ import annotations

import warnings
from typing import NamedTuple, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from sesr_tpu.config import SESRSpec
from sesr_tpu.quant.params import QuantParams


class OODSaturationWarning(UserWarning):
    """An empirically-stamped layer saturated on a served frame: the fast
    lowering's exactness claim does not cover this input. The serving
    surfaces degrade to the PE-exact path when they see this."""


class AuditResult(NamedTuple):
    ok: bool
    violations: Tuple[int, ...]     # empirically-trusted layers that fired
    ovf18: np.ndarray               # per-layer 18-bit event counts
    diverged: Optional[bool]        # served != exact (None: not compared)
    y_exact: np.ndarray             # the sound output (f32, dequantized)


def empirically_trusted_layers(qp: QuantParams,
                               mode: str) -> Tuple[int, ...]:
    """Layers the serving ``mode`` runs through the fast lowering on
    EMPIRICAL evidence only. "fast"/"hybrid": stamped-safe layers without a
    static proof ("F" stamps — hybrid runs its "x" layers PE-exact, which
    is sound unconditionally). "pe-exact": none — always sound."""
    if mode == "pe-exact":
        return ()
    layers = getattr(qp, "fast_cert_layers", None)
    static = getattr(qp, "fast_cert_static", None) or (False,) * qp.num_convs
    if layers is None:
        return ()
    return tuple(i for i in range(qp.num_convs)
                 if layers[i] and not static[i])


def audit_frame(spec: SESRSpec, qp: QuantParams, x, y_served=None,
                mode: Optional[str] = None, warn: bool = True) -> AuditResult:
    """Audit one frame (or batch) against the sound PE-exact interpreter.

    Runs integer_forward(corrected=True, collect_dumps=True) — the same
    form certify_fast's empirical obligations execute — and flags:

    - 18-bit saturation events on any `empirically_trusted_layers(qp,
      mode)` layer (static layers are proof-covered for all inputs and
      exempt; a counter there would be an interval-bound bug, asserted in
      certify_fast);
    - output divergence vs ``y_served`` when given (must be the f32
      dequantized contract; pass None for int8-served frames — the
      counters alone are the saturation evidence).

    ``mode`` defaults to the artifact's certificate-selected serving mode.
    Emits OODSaturationWarning (warn=True) on failure. The audit costs one
    PE-exact forward — the 1-in-N shadow price of keeping the reference's
    always-on sentinel semantics on a datapath that structurally lacks it.
    """
    from sesr_tpu.quant.integer import integer_forward
    from sesr_tpu.ops.packed import select_packed_forward

    if mode is None:
        mode, _ = select_packed_forward(qp)
    trusted = empirically_trusted_layers(qp, mode)
    y_exact, dumps = integer_forward(spec, qp, jnp.asarray(x, jnp.float32),
                                     collect_dumps=True, corrected=True)
    ovf18 = np.asarray(dumps["overflow_18"])
    violations = tuple(i for i in trusted if ovf18[i] != 0)
    diverged = None
    if y_served is not None:
        diverged = not np.array_equal(np.asarray(y_served, np.float32),
                                      np.asarray(y_exact))
    ok = not violations and not diverged
    if not ok and warn:
        warnings.warn(
            f"OOD saturation audit failed ({mode} serving): "
            f"{len(violations)} empirically-stamped layer(s) "
            f"{list(violations)} fired 18-bit events "
            f"(counts {ovf18.tolist()})"
            + (", served output diverges from the PE-exact path"
               if diverged else "")
            + " — this frame is outside the calibration distribution the "
              "empirical stamps cover; degrade to the PE-exact lowering",
            OODSaturationWarning, stacklevel=2)
    return AuditResult(ok, violations, ovf18, diverged, np.asarray(y_exact))
