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
