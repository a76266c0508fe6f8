"""Fast-mode certification (quant/certify.py): the deployment fast path must
be mechanically proven exact before it can run."""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from sesr_tpu.config import spec_for_task
from sesr_tpu.data.datasets import SyntheticDataset
from sesr_tpu.io.torch_import import load_reference_checkpoint
from sesr_tpu.quant.calibrate import calibrate
from sesr_tpu.quant.certify import certify_fast
from sesr_tpu.quant.integer import integer_forward
from sesr_tpu.quant.params import QuantParams

ARTIFACTS = os.path.join(os.path.dirname(__file__), os.pardir, "artifacts")


def _fresh_qparams(task, n=2):
    spec = spec_for_task(task)
    params = load_reference_checkpoint(task)
    images = [inp for inp, _ in SyntheticDataset(task, n=n, hw=(64, 96))]
    return spec, images, calibrate(spec, params, images, safe_zero_floor=True)


def test_fast_refuses_uncertified():
    spec, images, qp = _fresh_qparams("sr_x2")
    assert not qp.fast_cert_ok
    with pytest.raises(ValueError, match="certified"):
        integer_forward(spec, qp, jnp.asarray(images[0]), corrected=True,
                        compute="fast")


def test_certify_stamps_and_fast_runs():
    spec, images, qp = _fresh_qparams("sr_x2")
    qp = certify_fast(spec, qp, images)
    assert qp.fast_cert_ok and qp.fast_cert_images == len(images)
    y_fast, _ = integer_forward(spec, qp, jnp.asarray(images[0]),
                                corrected=True, compute="fast")
    y_exact, _ = integer_forward(spec, qp, jnp.asarray(images[0]),
                                 corrected=True)
    np.testing.assert_array_equal(np.asarray(y_fast), np.asarray(y_exact))


def test_certificate_survives_serialization(tmp_path):
    spec, images, qp = _fresh_qparams("sr_x2")
    qp = certify_fast(spec, qp, images)
    p = str(tmp_path / "qp.npz")
    qp.save(p)
    qp2 = QuantParams.load(p)
    assert qp2.fast_cert_ok and qp2.fast_cert_images == qp.fast_cert_images


def test_certify_detects_saturation():
    """The nr checkpoint's conv_last genuinely saturates the 18-bit per-PE
    accumulator on bright synthetic-noisy inputs — certification must refuse
    the fast path for it."""
    spec, images, qp = _fresh_qparams("nr")
    qp = certify_fast(spec, qp, images)
    assert not qp.fast_cert_ok


def test_static_stamps_are_input_independent():
    """Statically-proven layers survive even the interval-extreme
    adversarial input: the per-MAC strict model and the clamp-once conv
    agree, and no 18-bit event fires — for an input constructed to maximize
    the accumulator trajectory, which dominates anything a real image can
    produce (quant/certify.py static_layer_safe soundness)."""
    from sesr_tpu.ops.conv import conv2d_nhwc
    from sesr_tpu.ops.fixedpoint import saturate
    from sesr_tpu.quant.certify import (adversarial_input_for_layer,
                                        static_layer_stamps)
    from sesr_tpu.quant.integer import _pe_weight_masks
    from sesr_tpu.quant.strict import strict_vs_fast_divergence

    spec, images, qp = _fresh_qparams("sr_x2")
    static = static_layer_stamps(qp)
    assert any(static), "sr_x2 should have statically-proven layers"
    for i, s in enumerate(static):
        if not s:
            continue
        x_shift, _meta = adversarial_input_for_layer(qp, i)
        for w_p in _pe_weight_masks(np.asarray(qp.w_int[i]), qp.hw.pe):
            assert strict_vs_fast_divergence(x_shift, w_p, qp.hw) == 0
            y = conv2d_nhwc(jnp.asarray(x_shift, jnp.int32),
                            jnp.asarray(w_p, jnp.int32),
                            preferred_element_type=jnp.int32)
            assert bool(jnp.all(saturate(y, qp.hw.pe_acc_bits) == y)), (
                f"static layer {i} saturated on the adversarial input")


def test_static_bound_is_not_vacuous():
    """A layer the static analysis REFUSES must actually be saturable: the
    adversarial input realizes an 18-bit event on nr's saturating conv."""
    from sesr_tpu.ops.conv import conv2d_nhwc
    from sesr_tpu.ops.fixedpoint import saturate
    from sesr_tpu.quant.certify import (adversarial_input_for_layer,
                                        static_layer_stamps)
    from sesr_tpu.quant.integer import _pe_weight_masks

    spec, images, qp = _fresh_qparams("nr")
    static = static_layer_stamps(qp)
    unsafe = [i for i, s in enumerate(static) if not s]
    assert unsafe, "nr should have statically-unprovable layers"
    fired = False
    for i in unsafe:
        x_shift, (p, _o, _sign) = adversarial_input_for_layer(qp, i)
        w_p = _pe_weight_masks(np.asarray(qp.w_int[i]), qp.hw.pe)[p]
        y = conv2d_nhwc(jnp.asarray(x_shift, jnp.int32),
                        jnp.asarray(w_p, jnp.int32),
                        preferred_element_type=jnp.int32)
        if not bool(jnp.all(saturate(y, qp.hw.pe_acc_bits) == y)):
            fired = True
    assert fired, "no statically-refused layer realized a saturation event"


def test_static_layer_exact_on_out_of_distribution_input():
    """The OOD caveat (tests/test_packed.py) does NOT apply to static
    layers: feed a layer an input far outside the calibration distribution
    (every value at the domain extremes, adversarial sign pattern) and the
    fast clamp-once conv still equals the strict per-MAC model."""
    from sesr_tpu.quant.certify import static_layer_stamps
    from sesr_tpu.quant.integer import _pe_weight_masks
    from sesr_tpu.quant.strict import strict_vs_fast_divergence
    from sesr_tpu.quant.certify import _input_interval

    spec, images, qp = _fresh_qparams("sr_x2")
    static = static_layer_stamps(qp)
    i = next(i for i, s in enumerate(static) if s)
    lo, hi = _input_interval(qp, i)
    rng = np.random.default_rng(0)
    ic = qp.w_int[i].shape[2]
    # uniform over the FULL domain — nothing like calibration activations
    x = rng.integers(lo, hi + 1, size=(1, 16, 16, ic)).astype(np.int32)
    for w_p in _pe_weight_masks(np.asarray(qp.w_int[i]), qp.hw.pe):
        assert strict_vs_fast_divergence(x, w_p, qp.hw) == 0


def test_cert_grade_property():
    spec, images, qp = _fresh_qparams("sr_x2")
    assert qp.cert_grade == "none"
    qp_c = certify_fast(spec, qp, images)
    assert qp_c.cert_grade in ("empirical", "static")
    assert qp_c.fast_cert_static is not None
    spec_n, images_n, qp_n = _fresh_qparams("nr")
    qp_n = certify_fast(spec_n, qp_n, images_n)
    assert qp_n.cert_grade == "partial"


def test_static_shortcut_bound():
    """The int16 narrow store of the residual shortcut must be PROVEN
    wrap-free for all inputs where the interval bound clears 2^15 — and the
    bound must actually bound the measured shortcut (soundness) while a
    crafted hostile requant drives it past the limit (non-vacuity)."""
    import dataclasses
    from sesr_tpu.quant.certify import (static_shortcut_bound,
                                        static_shortcut_safe)

    spec, images, qp = _fresh_qparams("sr_x2")
    bound = static_shortcut_bound(qp)
    assert np.isfinite(bound) and bound > 0
    qp_c = certify_fast(spec, qp, images)
    assert qp_c.shortcut_static == (bound < float(1 << 15))
    # soundness: the measured shortcut on real images stays under the bound
    _, dumps = integer_forward(spec, qp_c, jnp.asarray(images[0]),
                               collect_dumps=True, corrected=True)
    assert float(np.abs(np.round(np.asarray(dumps["shortcut"]))).max()) \
        <= bound
    # non-vacuity: a hostile layer-0 requant factor blows the bound
    qp_bad = dataclasses.replace(
        qp, requant_m=[65535] + list(qp.requant_m[1:]),
        requant_n=[0] + list(qp.requant_n[1:]))
    assert not static_shortcut_safe(qp_bad)
    # the stamp survives serialization
    import tempfile, os as _os
    with tempfile.TemporaryDirectory() as d:
        p = _os.path.join(d, "qp.npz")
        qp_c.save(p)
        assert QuantParams.load(p).shortcut_static == qp_c.shortcut_static


def test_cert_grade_requires_shortcut_static():
    """An artifact whose layers are all statically proven but whose int16
    shortcut store is only empirically bounded must not claim the fully-
    static grade (an OOD input could wrap the narrow store)."""
    import dataclasses

    spec, images, qp = _fresh_qparams("sr_x2")
    qp_c = certify_fast(spec, qp, images)
    L = qp.num_convs
    all_static = dataclasses.replace(
        qp_c, fast_cert_ok=True, fast_cert_layers=tuple([True] * L),
        fast_cert_static=tuple([True] * L), shortcut_static=True)
    assert all_static.cert_grade == "static"
    no_sc = dataclasses.replace(all_static, shortcut_static=False)
    assert no_sc.cert_grade == "empirical"


def test_cert_grade_demoted_artifact_is_not_static():
    """certify_fast demotes the WHOLE artifact (fast_cert_ok=False, layers
    all-False) when a whole-artifact obligation fails even though the
    per-layer static interval proofs still hold; the grade must then not
    report the strongest tier, and the stamp string stays per-layer."""
    import dataclasses

    spec, images, qp = _fresh_qparams("sr_x2")
    qp_c = certify_fast(spec, qp, images)
    L = qp.num_convs
    demoted = dataclasses.replace(
        qp_c, fast_cert_ok=False, fast_cert_layers=tuple([False] * L))
    assert demoted.cert_grade != "static"
    assert demoted.cert_grade != "empirical"
    # stamps stay consistent with the per-layer fields (S for static
    # layers, x for the demoted rest) and every surface shares them
    assert len(demoted.cert_stamps) == L
    assert set(demoted.cert_stamps) <= {"S", "x"}
    assert qp.cert_stamps == "?" * L                  # uncertified artifact


@pytest.mark.parametrize("task", ["sr_x2", "nr"])
def test_empty_image_set_cannot_stamp_empirical(task):
    """Round-3 verdict item 3: certify_fast(spec, qp, []) must not come back
    fully certified for an artifact with empirical-only layers — zero images
    means zero evidence, so only the static interval proofs may stamp."""
    from sesr_tpu.quant.certify import static_layer_stamps

    spec, _images, qp = _fresh_qparams(task)
    static = static_layer_stamps(qp)
    assert not all(static), f"{task} should have empirical-only layers"
    qp0 = certify_fast(spec, qp, [])
    assert not qp0.fast_cert_ok
    assert qp0.fast_cert_images == 0
    # stamps must equal the static proofs exactly: nothing optimistic
    assert qp0.fast_cert_layers == static
    # and the fast path still refuses the artifact
    with pytest.raises(ValueError, match="certified"):
        integer_forward(spec, qp0, jnp.zeros((1, 16, 16, spec.in_channels)),
                        corrected=True, compute="fast")


def test_certify_cli_rejects_zero_images(tmp_path):
    """`certify --n-images 0` on a non-static artifact must fail loudly
    instead of emitting a refused (or unsound) artifact."""
    from sesr_tpu.cli import main

    spec, images, qp = _fresh_qparams("sr_x2")
    p = str(tmp_path / "qp.npz")
    qp.save(p)
    with pytest.raises(SystemExit, match="zero images"):
        main(["certify", "--task", "sr_x2", "--qparams", p,
              "--n-images", "0"])


def test_static_stamp_survives_serialization(tmp_path):
    spec, images, qp = _fresh_qparams("sr_x2")
    qp = certify_fast(spec, qp, images)
    p = str(tmp_path / "qp.npz")
    qp.save(p)
    qp2 = QuantParams.load(p)
    assert qp2.fast_cert_static == qp.fast_cert_static


@pytest.mark.parametrize("task", ["sr_x2", "sr_x4"])
def test_shipped_artifact_certified_and_fast_exact(task):
    """The artifacts bench.py / __graft_entry__.py load must carry a valid
    certificate, and fast == PE-exact must hold on data the certificate has
    never seen (fresh synthetic images, not the calibration set)."""
    path = os.path.join(ARTIFACTS, f"qparams_{task}.npz")
    if not os.path.exists(path):
        pytest.skip(f"{path} missing (run tools/make_qparams.py)")
    spec = spec_for_task(task)
    qp = QuantParams.load(path)
    assert qp.fast_cert_ok, "shipped artifact is uncertified"
    for inp, _ in SyntheticDataset(task, n=2, hw=(64, 96), seed=123):
        y_fast, _ = integer_forward(spec, qp, jnp.asarray(inp),
                                    corrected=True, compute="fast")
        y_exact, dumps = integer_forward(spec, qp, jnp.asarray(inp),
                                         corrected=True, collect_dumps=True)
        assert int(np.asarray(dumps["overflow_counts"]).sum()) == 0
        np.testing.assert_array_equal(np.asarray(y_fast), np.asarray(y_exact))
