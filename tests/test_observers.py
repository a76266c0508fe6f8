"""Percentile / KL calibration observers and the metrics module."""

import numpy as np
import pytest
import jax.numpy as jnp

from sesr_tpu.config import spec_for_task
from sesr_tpu.metrics import psnr, compute_psnr, ssim, evaluate_pair, three2one
from sesr_tpu.quant.observers import (
    histogram_on_device, percentile_bounds, kl_bounds, kl_threshold, BINS_NUM,
)
from sesr_tpu.quant.calibrate import calibrate
from sesr_tpu.models.sesr import init_params
import jax


def test_histogram_on_device(rng):
    x = jnp.asarray(rng.random(10000, dtype=np.float32))
    h = np.asarray(histogram_on_device(x, 0.0, 1.0, 100))
    assert h.sum() == 10000
    ref, _ = np.histogram(np.asarray(x), bins=100, range=(0, 1))
    # identical up to right-edge inclusion of the last bin
    np.testing.assert_allclose(h, ref, atol=2)


def test_percentile_bounds_clips_outliers(rng):
    x = np.concatenate([rng.normal(0, 1, 100000), [50.0, -50.0]])
    h, _ = np.histogram(x, bins=BINS_NUM, range=(-50, 50))
    lo, hi = percentile_bounds(h, -50, 50, 0.999)
    assert -5 < lo < -2 and 2 < hi < 5


def test_kl_threshold_keeps_bulk(rng):
    # concentrated bulk + tiny far outlier: KL clipping should cut the tail
    x = np.abs(rng.normal(0, 1, 200000))
    x[0] = 100.0
    h, _ = np.histogram(x, bins=BINS_NUM, range=(0, 100))
    lo, hi = kl_bounds(h, 0.0, 100.0)
    assert lo == 0.0
    assert hi < 50.0  # outlier clipped


def test_calibrate_histogram_pass_keeps_qat_composition(rng):
    """The histogram (second) calibration pass must run the SAME forward as
    the min/max pass — including the qatf composition's frozen QuantAdd.
    Regression: the hist pass once dropped qat_add_bounds, histogramming a
    plain h + c0 residual against bounds observed through the frozen add,
    silently skewing the KL/percentile scales of the deep domains."""
    from sesr_tpu.config import DEFAULT_HW
    from sesr_tpu.quant.calibrate import (
        _calibration_forward_impl, _prep_fq_weights)

    spec = spec_for_task("nrdm_3")
    params = init_params(spec, jax.random.PRNGKey(0))
    imgs = [rng.random((1, 16, 24, 3), dtype=np.float32) for _ in range(2)]
    bounds = (0.0, 0.25)           # a frozen scale that clips the residual
    L = spec.num_convs
    fq_weights, _, _ = _prep_fq_weights(params, DEFAULT_HW)

    def run(qab, hist_bounds=None, collect=False):
        outs = [_calibration_forward_impl(
            spec, fq_weights, jnp.asarray(im, jnp.float32), DEFAULT_HW,
            True, hist_bounds, collect, None, qab) for im in imgs]
        if collect:
            return sum(np.asarray(o[2], np.int64) for o in outs)
        mm = np.stack([np.asarray(o[1], np.float64) for o in outs])
        return mm[:, 0].min(axis=0), mm[:, 1].max(axis=0)

    lo, hi = run(bounds)                      # pass-1 bounds (frozen add)
    hb = jnp.asarray(np.stack([lo, hi], axis=1), jnp.float32)
    hist_good = run(bounds, hb, True)         # what calibrate must collect
    hist_bad = run(None, hb, True)            # the regression's histogram
    # precondition for test power: the two compositions really histogram
    # differently in the residual-affected domains
    assert any(not np.array_equal(hist_good[d], hist_bad[d])
               for d in range(L + 1))
    # percentile bound computed from the CORRECT histogram must be what
    # calibrate ships (any domain whose good/bad percentile bounds differ)
    p = 0.99
    qp = calibrate(spec, params, imgs, observer="percentile", percentile=p,
                   qat_add_bounds=bounds)
    checked = 0
    for d in range(L):                        # d == L may be min-zero-forced
        glo, ghi = percentile_bounds(hist_good[d], lo[d], hi[d], p)
        blo, bhi = percentile_bounds(hist_bad[d], lo[d], hi[d], p)
        if (glo, ghi) == (blo, bhi):
            continue
        checked += 1
        np.testing.assert_allclose(qp.a_scale[d], (ghi - glo) / 255.0,
                                   rtol=1e-12, err_msg=f"domain {d}")
        assert not np.isclose(qp.a_scale[d], (bhi - blo) / 255.0, rtol=1e-6)
    assert checked > 0, "setup lost its discriminating domain"


@pytest.mark.parametrize("observer", ["percentile", "kl"])
def test_calibrate_with_histogram_observer(observer, rng):
    spec = spec_for_task("nrdm_3")
    params = init_params(spec, jax.random.PRNGKey(0))
    imgs = [rng.random((1, 16, 24, 3), dtype=np.float32) for _ in range(2)]
    qp_mm = calibrate(spec, params, imgs)
    qp_obs = calibrate(spec, params, imgs, observer=observer)
    # histogram observers can only shrink the ranges
    for d in range(spec.num_convs + 1):
        assert qp_obs.a_scale[d] <= qp_mm.a_scale[d] * (1 + 1e-9), d
    # still produces a runnable artifact
    from sesr_tpu.quant.integer import integer_forward
    y, _ = integer_forward(spec, qp_obs, jnp.asarray(imgs[0]))
    assert np.isfinite(np.asarray(y)).all()


def test_psnr_basics():
    a = np.zeros((8, 8))
    b = np.full((8, 8), 0.1)
    assert abs(psnr(a, b, 1.0) - 20.0) < 1e-6
    assert psnr(a, a) == float("inf")
    assert 120 < compute_psnr(a * 255, a * 255) < 130  # eps-bounded, not inf


def test_ssim_identity(rng):
    x = rng.random((32, 32))
    assert abs(ssim(x, x) - 1.0) < 1e-9
    y = x + rng.normal(0, 0.1, x.shape)
    assert ssim(x, np.clip(y, 0, 1)) < 0.99


def test_three2one_sites(rng):
    img = rng.random((4, 4, 3))
    out = three2one(img)
    assert out[0, 0] == img[0, 0, 0]
    assert out[1, 0] == img[1, 0, 1]
    assert out[0, 1] == img[0, 1, 1]
    assert out[1, 1] == img[1, 1, 2]


@pytest.mark.parametrize("task", ["nr", "dm", "nrdm_3", "sr_x4", "sr_x2"])
def test_evaluate_pair_runs(task, rng):
    spec = spec_for_task(task)
    r = spec.scaling_factor
    inp = rng.random((16, 16, spec.in_channels))
    pred = rng.random((16 * r, 16 * r, spec.out_channels))
    gt = rng.random((16 * r, 16 * r, spec.out_channels))
    p, s = evaluate_pair(task, pred, gt, inp)
    assert np.isfinite(p) and -1 <= s <= 1


def test_dump_histograms(tmp_path):
    """Histogram-PNG observability (reference define.py:34-36 debug dumps):
    weight, quantized-weight, and per-domain activation histograms."""
    from sesr_tpu.config import spec_for_task
    from sesr_tpu.data.datasets import SyntheticDataset
    from sesr_tpu.io.torch_import import load_reference_checkpoint
    from sesr_tpu.quant.observers import dump_histograms

    spec = spec_for_task("nrdm_3")
    params = load_reference_checkpoint("nrdm_3")
    images = [inp for inp, _ in SyntheticDataset("nrdm_3", n=1, hw=(32, 48))]
    files = dump_histograms(spec, params, images, str(tmp_path))
    L = spec.num_convs
    assert len(files) == 2 * L + (L + 1)
    import os
    for f in files:
        assert os.path.exists(f) and os.path.getsize(f) > 0


def test_kl_guardrail_fires_on_raw_domain():
    """The round-3 ablation's foot-gun, now guarded (round-3 verdict item
    8): KL on a raw-domain task silently clipped ~12 dB; guarded_calibrate
    must fire ObserverRegressionWarning when the chosen observer loses
    >1 dB ground-truth PSNR vs minmax on the calibration set. (The metric
    is GT PSNR, the ablation's own protocol — NOT fidelity to FP32, which
    KL legitimately trades away on the SR tasks while winning on GT.)"""
    import warnings
    from sesr_tpu.data.datasets import SyntheticDataset
    from sesr_tpu.io.torch_import import load_reference_checkpoint
    from sesr_tpu.quant.calibrate import (guarded_calibrate,
                                          ObserverRegressionWarning)

    spec = spec_for_task("nr")
    params = load_reference_checkpoint("nr")
    data = list(SyntheticDataset("nr", n=2, hw=(64, 96)))
    with pytest.warns(ObserverRegressionWarning, match="degrades"):
        guarded_calibrate(spec, params, data, "nr", observer="kl",
                          safe_zero_floor=True)
    # minmax itself never warns (nothing to compare against)
    with warnings.catch_warnings():
        warnings.simplefilter("error", ObserverRegressionWarning)
        guarded_calibrate(spec, params, data, "nr", observer="minmax",
                          safe_zero_floor=True)


def test_cli_calibrate_kl_requires_force(tmp_path):
    """`calibrate --observer kl` on a raw-domain task must abort without
    --force and succeed (warning only) with it."""
    import os
    from sesr_tpu.cli import main

    out = str(tmp_path / "qp_kl.npz")
    argv = ["calibrate", "--task", "nr", "--out", out, "--observer", "kl",
            "--n-images", "2", "--no-eval"]
    with pytest.raises(SystemExit, match="--force"):
        main(argv)
    assert not os.path.exists(out)
    main(argv + ["--force"])
    assert os.path.exists(out)


def test_quantization_fidelity_psnr():
    """The FP32-fidelity diagnostic (how far the corrected integer path
    strays from the float model — NOT the observer-guard metric, see its
    docstring): a fast-certified artifact must sit well above any
    catastrophic-quantization floor, and the function must agree with a
    direct recomputation."""
    import numpy as np
    import jax.numpy as jnp
    from sesr_tpu.config import spec_for_task
    from sesr_tpu.io.torch_import import load_reference_checkpoint
    from sesr_tpu.models.sesr import forward_float
    from sesr_tpu.quant.calibrate import quantization_fidelity_psnr
    from sesr_tpu.quant.integer import integer_forward
    from sesr_tpu.quant.params import QuantParams

    spec = spec_for_task("nrdm_3")
    params = load_reference_checkpoint("nrdm_3")
    qp = QuantParams.load("artifacts/qparams_nrdm_3.npz")
    rng = np.random.default_rng(4)
    img = rng.random((1, 32, 48, 3), dtype=np.float32)
    p = quantization_fidelity_psnr(spec, params, qp, [img])
    y_f = np.asarray(forward_float(spec, params, jnp.asarray(img)))
    y_i = np.asarray(integer_forward(spec, qp, jnp.asarray(img),
                                     corrected=True)[0])
    expect = -10.0 * np.log10(max(float(np.mean((y_f - y_i) ** 2)), 1e-12))
    assert abs(p - expect) < 1e-6
    assert p > 25.0, p
