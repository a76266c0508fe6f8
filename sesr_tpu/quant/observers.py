"""Activation-range observers for PTQ calibration.

Three strategies, selected by `calibrate(..., observer=...)`:

- "minmax"     running min/max — the reference's only live PTQ observer
               (quan_func.py:177-196).
- "percentile" clip each tail to a cumulative-probability quantile (the
               PTQ analog of the reference's QAT-side HistogramObserver,
               quantize_utils_cuda.py:122-145).
- "kl"         KL-entropy calibration, the feature the reference designed
               and then abandoned (define.py:16-20 "舍弃KL" — only the
               commented constants BINS_NUM=2048 / TGT_BINS_NUM=128
               survive; no KL code exists in any reference .py). Restored
               here with those constants: TensorRT-style sweep minimizing
               KL(P||Q) between the fp32 histogram and its int8-binned
               reconstruction.

Histograms are accumulated ON DEVICE across the calibration set (a (D, B)
int32 array carried through the jitted forward); the KL sweep runs once on
the host afterwards.
"""

from __future__ import annotations

import numpy as np

BINS_NUM = 2048        # define.py:19 (commented-out KL config)
TGT_BINS_NUM = 128     # define.py:20


def histogram_on_device(x, lo: float, hi: float, bins: int = BINS_NUM):
    """Fixed-range histogram of a traced tensor, jit-friendly."""
    import jax.numpy as jnp

    width = (hi - lo) / bins
    idx = jnp.clip(((x - lo) / width).astype(jnp.int32), 0, bins - 1)
    return jnp.zeros((bins,), jnp.int32).at[idx.reshape(-1)].add(1)


def percentile_bounds(hist: np.ndarray, lo: float, hi: float,
                      percentile: float = 0.9999):
    """Clip each tail at the given cumulative probability."""
    hist = np.asarray(hist, np.float64)
    total = hist.sum()
    if total == 0:
        return lo, hi
    edges = np.linspace(lo, hi, hist.size + 1)
    cdf = np.cumsum(hist) / total
    lo_idx = int(np.searchsorted(cdf, 1.0 - percentile))
    hi_idx = int(np.searchsorted(cdf, percentile))
    return float(edges[lo_idx]), float(edges[min(hi_idx + 1, hist.size)])


def _kl_divergence(p: np.ndarray, q: np.ndarray) -> float:
    p = p / p.sum()
    q = q / max(q.sum(), 1e-12)
    mask = p > 0
    q = np.where(q > 0, q, 1e-12)
    return float(np.sum(p[mask] * np.log(p[mask] / q[mask])))


def kl_threshold(hist: np.ndarray, num_quantized_bins: int = TGT_BINS_NUM) -> int:
    """TensorRT-style sweep: return the bin count t (in fp32-histogram bins)
    whose clipped distribution minimizes KL(P||Q) against its
    num_quantized_bins-level reconstruction."""
    hist = np.asarray(hist, np.float64)
    n = hist.size
    best_t, best_kl = n, np.inf
    for t in range(num_quantized_bins, n + 1, num_quantized_bins // 2):
        p = hist[:t].copy()
        p[t - 1] += hist[t:].sum()           # clamp outliers into last bin
        if p.sum() == 0:
            continue
        # quantize t bins down to num_quantized_bins, then expand back
        factor = t / num_quantized_bins
        q = np.zeros(t)
        for j in range(num_quantized_bins):
            start = int(round(j * factor))
            stop = int(round((j + 1) * factor))
            chunk = hist[start:stop]
            nonzero = (chunk > 0).sum()
            if nonzero:
                q[start:stop] = np.where(chunk > 0, chunk.sum() / nonzero, 0)
        kl = _kl_divergence(p, q)
        if kl < best_kl:
            best_kl, best_t = kl, t
    return best_t


def kl_bounds(hist: np.ndarray, lo: float, hi: float,
              num_quantized_bins: int = TGT_BINS_NUM):
    """Effective (lo, hi) after KL clipping of the upper tail.

    Activation domains here are one-sided-heavy (post-ReLU, or [0,1] input),
    so the lower bound is kept at the observed min and the sweep clips the
    max — mirroring how the abandoned design paired KL with the asymmetric
    zero-point scheme.
    """
    t = kl_threshold(np.asarray(hist, np.float64), num_quantized_bins)
    width = (hi - lo) / np.asarray(hist).size
    return lo, float(lo + t * width)


def dump_histograms(spec, params, images, out_dir: str,
                    hw=None, bins: int = 300):
    """Weight / quantized-weight / per-domain activation histogram PNGs.

    The reference writes these behind the WEIGHT_W_HIST_PNG /
    INPUT_W_HIST_PNG flags (define.py:34-36): plt.hist(..., bins=300) into
    output_png/weight/conv.weight.{i}.png, output_png/weight_quan/
    conv.weightquan.{i}.png, and per-conv input histograms
    (quan_func.py:50-56, 118-124). Same tree layout here; activation
    histograms are accumulated ON DEVICE over the whole image set (the
    (D, BINS_NUM) int32 pipeline of calibrate()) instead of one matplotlib
    call per layer per image.

    Returns the list of files written.
    """
    import os

    import jax.numpy as jnp
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from sesr_tpu.config import DEFAULT_HW
    from sesr_tpu.quant.calibrate import (_calibration_forward_impl,
                                          _prep_fq_weights)
    from sesr_tpu.quant.params import CalibState

    hw = hw or DEFAULT_HW
    fq_weights, w_int, w_scale = _prep_fq_weights(params, hw)
    L = spec.num_convs
    written = []

    def _hist_png(values, subdir, name, n_bins=bins):
        d = os.path.join(out_dir, subdir)
        os.makedirs(d, exist_ok=True)
        path = os.path.join(d, name)
        plt.cla()
        plt.hist(np.asarray(values).reshape(-1), bins=n_bins)
        plt.savefig(path)
        written.append(path)

    for i in range(L):
        _hist_png(params.weights[i], "weight", f"conv.weight.{i}.png")
        _hist_png(w_int[i], "weight_quan", f"conv.weightquan.{i}.png")

    # pass 1: per-domain bounds; pass 2: on-device histograms in them
    calib = CalibState.fresh(L + 1)
    for img in images:
        x = jnp.asarray(img, jnp.float32)
        _, minmax = _calibration_forward_impl(spec, fq_weights, x, hw, True)
        mm = np.asarray(minmax, np.float64)
        for d in range(L + 1):
            calib.update(d, mm[0, d], mm[1, d])
    bounds = jnp.asarray(
        np.stack([calib.min_vals, calib.max_vals], axis=1), jnp.float32)
    total = np.zeros((L + 1, BINS_NUM), np.int64)
    for img in images:
        x = jnp.asarray(img, jnp.float32)
        _, _, hists = _calibration_forward_impl(
            spec, fq_weights, x, hw, True, bounds, True)
        total += np.asarray(hists, np.int64)

    for d in range(L + 1):
        lo, hi = calib.min_vals[d], calib.max_vals[d]
        centers = lo + (np.arange(BINS_NUM) + 0.5) * (hi - lo) / BINS_NUM
        dd = os.path.join(out_dir, "input")
        os.makedirs(dd, exist_ok=True)
        path = os.path.join(dd, f"conv.input.{d}.png")
        plt.cla()
        plt.bar(centers, total[d], width=(hi - lo) / BINS_NUM)
        plt.savefig(path)
        written.append(path)
    return written
