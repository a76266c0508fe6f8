"""AdaRound — adaptive per-weight rounding for PTQ artifacts.

Standard technique ("Up or Down? Adaptive Rounding for Post-Training
Quantization", arXiv:2004.10568: continuous relaxation of the per-weight
floor/ceil choice, rectified sigmoid, annealed binary regularizer),
adapted to this framework's hardware contract:

- w_int stays per-tensor int8 at the reference scale formula
  (quan_func.py:44-126) — ONLY which neighbor each weight rounds to
  changes, so every downstream consumer (integer interpreter, packed
  lowerings, certification, hex export) is untouched;
- the per-layer objective is the weight-rounding error ON THE QUANTIZED
  PIPELINE'S OWN layer inputs in integer conv units,
      min_h E_n || conv(x_shift_n, (floor(W/s) + h) - W/s) ||^2,
  with x_shift collected from the corrected integer path under the
  running artifact — NOT the float net's activations (the round-4 bias
  study showed post-hoc corrections that chase float trajectories fight
  the calibration's own adaptation and lose);
- layers optimize sequentially (layer i+1 sees layers 0..i already
  re-rounded) and each layer is ACCEPTED only if its final binary
  rounding strictly lowers the calibration rounding error vs
  round-to-nearest — per-layer no-worse on calibration data by
  construction;
- activations are then recalibrated from scratch with the new w_int
  (calibrate(w_int_override=...)) and the artifact re-certified.

VALUE (round-5 study, tools/adaround_study.py, held-out seed-77 GT PSNR
through the corrected integer path, two independent runs):

  sr_x4 +0.166/+0.181 dB (replicates; the task with the largest
  fake-quant delta) — SHIPPED: the default sr_x4 artifact recipe uses
  adaround (tools/make_qparams.py WEIGHT_ROUNDING_DEFAULTS) PAIRED WITH
  the percentile observer: on adaround weights percentile beats the
  round-3 KL winner on all three held-out pools (24.87/26.39/28.05 vs
  kl 24.78/25.99/27.38 — histogram clipping tuned on the raw checkpoint
  does not survive weight modification; ADAROUND_OBSERVER_DEFAULTS).
  Net: sr_x4's PTQ gap 1.07 -> 0.80 dB.
  nrdm_3 -0.01..-0.08, nr -0.01..-0.02, sr_x2 -0.04, dm +0.02 — the
  calibration-fit MSE reduction does NOT transfer to held-out GT for the
  small-gap tasks (12-image layerwise fit on 16-channel nets overfits);
  those keep round-to-nearest. On QAT-trained collapsed weights adaround
  LOSES (gap +0.25 -> +0.30): QAT already places weights at fake-quant
  optima — the techniques do not stack. Full tables in BASELINE.md
  "AdaRound".
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from sesr_tpu.config import SESRSpec
from sesr_tpu.models.sesr import CollapsedParams
from sesr_tpu.ops.conv import conv2d_nhwc
from sesr_tpu.quant.params import QuantParams

_HP = jax.lax.Precision.HIGHEST


def optimize_layer_rounding(w_float, w_scale: float, xs, steps: int = 800,
                            lr: float = 1e-2, lam: float = 1e-2,
                            beta0: float = 18.0, beta1: float = 2.0):
    """One layer. xs: (N, H, W, IC) stacked integer-unit inputs. Returns
    (w_int int32 HWIO, frac_moved_off_nearest, mse_nearest, mse_final) —
    with the accept-if-better guard, mse_final <= mse_nearest always, and
    w_int == round-to-nearest when the optimizer cannot beat it."""
    import optax

    w_real = np.asarray(w_float, np.float64) / w_scale          # HWIO
    base = np.floor(w_real)
    r = np.clip(w_real - base, 1e-4, 1 - 1e-4)
    p = np.clip((r + 0.1) / 1.2, 1e-6, 1 - 1e-6)
    v0 = jnp.asarray(np.log(p / (1 - p)), jnp.float32)          # h(v0) == r
    base_j = jnp.asarray(base, jnp.float32)
    w_real_j = jnp.asarray(w_real, jnp.float32)
    xs_j = jnp.asarray(xs, jnp.float32)

    def h_of(v):
        return jnp.clip(jax.nn.sigmoid(v) * 1.2 - 0.1, 0.0, 1.0)

    def mse(v):
        dw = base_j + h_of(v) - w_real_j        # rounding error, int units
        err = conv2d_nhwc(xs_j, dw, precision=_HP)
        return jnp.mean(err * err)

    def mse_of_ints(w_int_arr):
        """Rounding error of the SHIPPED (int8-clipped) tensor — the
        guard must compare what actually ships, not the unclipped
        parameterization (they differ at the ±127.5 scale boundary,
        which the symmetric scale formula realizes for the max weight)."""
        dw = jnp.asarray(w_int_arr.astype(np.float64) - w_real, jnp.float32)
        err = conv2d_nhwc(xs_j, dw, precision=_HP)
        return float(jnp.mean(err * err))

    # the baseline to beat is the SHIPPED nearest rounding — np.rint
    # (round-half-to-even, quantize_weights), not round-half-up; on exact
    # .5 ties the two differ and the accept guard must compare against
    # what would actually ship
    w_nearest = np.clip(np.rint(w_real), -128, 127).astype(np.int32)
    mse_nearest = mse_of_ints(w_nearest) + 1e-12

    opt = optax.adam(lr)

    @jax.jit
    def step(v, ost, beta):
        def loss(v):
            h = h_of(v)
            reg = jnp.mean(1.0 - jnp.abs(2.0 * h - 1.0) ** beta)
            return mse(v) / mse_nearest + lam * reg
        l, g = jax.value_and_grad(loss)(v)
        up, ost = opt.update(g, ost)
        return optax.apply_updates(v, up), ost, l

    v, ost = v0, opt.init(v0)
    for t in range(steps):
        beta = beta0 + (beta1 - beta0) * (t / max(1, steps - 1))
        v, ost, _l = step(v, ost, jnp.float32(beta))

    h_bin = (np.asarray(h_of(v)) > 0.5).astype(np.int64)
    w_new = np.clip(base.astype(np.int64) + h_bin, -128, 127).astype(np.int32)
    final_mse = mse_of_ints(w_new)
    # accept-if-better: the annealed binary snap can land ABOVE the
    # nearest-rounding error (under-converged layers) — keep nearest there.
    # Both sides evaluate the CLIPPED tensors (mse_of_ints), so the
    # contract holds for what ships.
    if final_mse >= mse_nearest:
        return w_nearest, 0.0, mse_nearest, mse_nearest
    return w_new, float(np.mean(w_new != w_nearest)), mse_nearest, final_mse


def adaround_weights(spec: SESRSpec, params: CollapsedParams,
                     qp_baseline: QuantParams,
                     images: Sequence[np.ndarray], steps: int = 800,
                     verbose: bool = False) -> List[np.ndarray]:
    """Sequentially optimized w_int for every layer (the rounding phase).
    qp_baseline: a finalized artifact at the target scales (its activation
    params drive the input collection; they are refreshed afterwards by
    calibrate(w_int_override=...)).

    Linear-time input collection: each image's activation state is carried
    forward ONE layer per iteration with the already-accepted rounding
    (layer i+1 sees layers 0..i re-rounded), instead of re-running the
    layer prefix per (layer, image) pair."""
    from sesr_tpu.quant.integer import (_integer_conv_pe,
                                        _quantize_domain_in, _requant_out)

    L = qp_baseline.num_convs
    qp_work = qp_baseline
    w_new = [np.asarray(w) for w in qp_baseline.w_int]
    # per-image (h, shortcut) state of the corrected integer path
    states = [(jnp.asarray(img, jnp.float32), None) for img in images]
    for i in range(L):
        # x_shift at layer i depends on activations and quant constants
        # only (not on w_int[i]) — collect once, reuse for the advance
        xshifts = [_quantize_domain_in(h, i, L, qp_work, sc, True)[1]
                   for (h, sc) in states]
        xs = np.concatenate([np.asarray(x) for x in xshifts], axis=0)
        w_i, moved, m_near, m_final = optimize_layer_rounding(
            params.weights[i], qp_baseline.w_scale[i], xs, steps=steps)
        w_new[i] = w_i
        qp_work = dataclasses.replace(qp_work, w_int=list(w_new))
        if verbose:
            print(f"[adaround] layer {i}: {moved*100:.1f}% off nearest; "
                  f"calib rounding mse {m_near:.3e} -> {m_final:.3e}",
                  flush=True)
        if i < L - 1:
            advanced = []
            for (h, sc), x_shift in zip(states, xshifts):
                _po, _pa, y, _ovf = _integer_conv_pe(
                    x_shift, i, qp_work, corrected=True, compute="bf16")
                h2, extras = _requant_out(y, i, L, qp_work)
                if i == 0:
                    sc = extras["shortcut"]
                advanced.append((jax.nn.relu(h2), sc))
            states = advanced
    return w_new


def adaround_calibrate(spec: SESRSpec, params: CollapsedParams,
                       images: Sequence[np.ndarray], steps: int = 800,
                       verbose: bool = False, **calibrate_kwargs
                       ) -> QuantParams:
    """The full two-phase recipe: nearest-rounding calibrate -> sequential
    rounding optimization on the quantized pipeline's own inputs -> full
    recalibration at the optimized w_int. NOT certified — run
    certify_fast on the result like any calibrate() output.

    calibrate_kwargs pass through to BOTH calibrate calls (observer,
    safe_zero_floor, hw, ...)."""
    from sesr_tpu.quant.calibrate import calibrate

    qp0 = calibrate(spec, params, images, **calibrate_kwargs)
    w_new = adaround_weights(spec, params, qp0, images, steps=steps,
                             verbose=verbose)
    return calibrate(spec, params, images, w_int_override=w_new,
                     **calibrate_kwargs)
