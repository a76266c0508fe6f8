"""Runtime OOD saturation audit (quant/audit.py; round-5 verdict item 2).

The empirical certificate stamps carry a documented caveat: an
out-of-distribution input that fires an 18-bit event on an
empirically-stamped layer voids the fast lowering's exactness claim, and
the fast datapath cannot notice on its own. These tests pin the
productized sentinel: detection on a realizable adversarial frame against
the SHIPPED nr artifact, graceful stream degradation to the sound path,
and the CLI surface.
"""

import os
import warnings

import numpy as np
import pytest
import jax.numpy as jnp

from sesr_tpu.config import spec_for_task
from sesr_tpu.quant.audit import (OODSaturationWarning, audit_frame,
                                  empirically_trusted_layers)
from sesr_tpu.quant.certify import adversarial_image
from sesr_tpu.quant.integer import integer_forward
from sesr_tpu.quant.params import QuantParams

ARTIFACTS = os.path.join(os.path.dirname(__file__), os.pardir, "artifacts")


def _qp(task):
    path = os.path.join(ARTIFACTS, f"qparams_{task}.npz")
    if not os.path.exists(path):
        pytest.skip(f"{path} missing (run tools/make_qparams.py)")
    return QuantParams.load(path)


def test_trusted_layers_by_mode():
    qp = _qp("nr")                       # stamps FSSSx: hybrid serving
    assert empirically_trusted_layers(qp, "hybrid") == (0,)
    assert empirically_trusted_layers(qp, "pe-exact") == ()
    qp2 = _qp("sr_x2")                   # fully certified
    trusted = empirically_trusted_layers(qp2, "fast")
    assert all(not qp2.fast_cert_static[i] for i in trusted)


def test_audit_detects_adversarial_frame_on_nr():
    """The realizable layer-0 adversarial image (certify.adversarial_image)
    fires 18-bit events on nr's ONE empirically-trusted layer; the audit
    must flag it AND show the served hybrid output diverging from the
    sound path — the silent-wrong-answer case the audit exists for."""
    from sesr_tpu.ops.packed import packed_hybrid_forward

    spec = spec_for_task("nr")
    qp = _qp("nr")
    x = adversarial_image(qp, hw=(64, 96))
    y_served = packed_hybrid_forward(spec, qp, jnp.asarray(x), s=(1, 8))
    with pytest.warns(OODSaturationWarning):
        res = audit_frame(spec, qp, x, y_served=np.asarray(y_served),
                          mode="hybrid")
    assert not res.ok
    assert 0 in res.violations
    assert res.ovf18[0] > 0
    # in-distribution frames pass and serve exactly
    rng = np.random.default_rng(0)
    x_ok = rng.random((1, 64, 96, 3), dtype=np.float32)
    y_ok = packed_hybrid_forward(spec, qp, jnp.asarray(x_ok), s=(1, 8))
    res_ok = audit_frame(spec, qp, x_ok, y_served=np.asarray(y_ok),
                         mode="hybrid")
    assert res_ok.ok and res_ok.violations == ()


def test_audit_bright_frame_is_sound_under_hybrid():
    """A plain bright frame saturates nr's LAST conv — but hybrid serving
    runs that layer PE-exact (stamp x), so the audit correctly does NOT
    flag it: the saturation is computed, not assumed away."""
    spec = spec_for_task("nr")
    qp = _qp("nr")
    x = np.ones((1, 64, 96, 3), np.float32)
    res = audit_frame(spec, qp, x, mode="hybrid")
    assert res.ovf18[-1] > 0             # the event really happens...
    assert res.ok                        # ...on a soundly-served layer


def test_stream_degrades_gracefully():
    """stream_frames(audit_every=1): the adversarial frame is detected
    mid-stream, its batch is RE-SERVED through the sound path, and every
    later batch serves pe-exact — outputs bit-equal to the interpreter
    throughout."""
    from sesr_tpu.parallel.multihost import (make_mesh_multihost,
                                             stream_frames)

    spec = spec_for_task("nr")
    qp = _qp("nr")
    mesh = make_mesh_multihost(n_hosts=1, dp=1, sp=2)
    rng = np.random.default_rng(1)
    dim = [rng.random((1, 64, 96, 3), dtype=np.float32) for _ in range(3)]
    adv = adversarial_image(qp, hw=(64, 96))
    frames = [dim[0], adv, dim[1], dim[2]]
    log = []
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", OODSaturationWarning)
        outs = list(stream_frames(spec, qp, mesh, frames,
                                  lowering="deployment", audit_every=1,
                                  audit_log=log))
    assert len(outs) == 4
    # every yielded output equals the sound interpreter result — including
    # the adversarial batch, which the degraded re-serve corrected
    for f, y in zip(frames, outs):
        y_exact, _ = integer_forward(spec, qp, jnp.asarray(f),
                                     corrected=True)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(y_exact))
    modes = [m for (_i, m, _r) in log]
    assert modes[0] == "hybrid"
    assert modes[1] == "hybrid"          # audited AS hybrid, failed
    assert log[1][2] is not None and not log[1][2].ok
    # after the violation the stream is degraded and has nothing to audit
    assert all(m == "pe-exact" for m in modes[2:])
    assert all(r is None for (_i, _m, r) in log[2:])


def test_stream_audit_noop_on_interpreter_lowering():
    from sesr_tpu.parallel.multihost import (make_mesh_multihost,
                                             stream_frames)

    spec = spec_for_task("nr")
    qp = _qp("nr")
    mesh = make_mesh_multihost(n_hosts=1, dp=1, sp=2)
    rng = np.random.default_rng(2)
    frames = [rng.random((1, 64, 96, 3), dtype=np.float32)]
    log = []
    outs = list(stream_frames(spec, qp, mesh, frames, corrected=True,
                              audit_every=1, audit_log=log))
    assert len(outs) == 1 and log == []


def test_cli_infer_audit_clean_run(capsys):
    """--audit on in-distribution data: dispatches audited, zero
    violations, serving mode unchanged."""
    from sesr_tpu.cli import main

    qp_path = os.path.join(ARTIFACTS, "qparams_nr.npz")
    if not os.path.exists(qp_path):
        pytest.skip("nr artifact missing")
    main(["infer", "--task", "nr", "--qparams", qp_path,
          "--n-images", "2", "--audit", "1"])
    out = capsys.readouterr().out
    assert "packed(1x8, hybrid) mean psnr" in out
    assert "2 dispatch(es) audited, 0 OOD saturation violation(s)" in out


def test_stream_audit_respects_forced_pe_exact():
    """A caller-forced pe-exact stream (force_mode in fwd_kwargs) is
    already sound: the audit must treat pe-exact as the serving mode
    (nothing to audit) and the degrade path must not crash on a duplicate
    force_mode keyword (round-5 review finding)."""
    from sesr_tpu.parallel.multihost import (make_mesh_multihost,
                                             stream_frames)

    spec = spec_for_task("nr")
    qp = _qp("nr")
    mesh = make_mesh_multihost(n_hosts=1, dp=1, sp=2)
    rng = np.random.default_rng(5)
    frames = [rng.random((1, 32, 48, 3), dtype=np.float32),
              adversarial_image(qp, hw=(32, 48))]
    log = []
    outs = list(stream_frames(spec, qp, mesh, frames,
                              lowering="deployment", audit_every=1,
                              audit_log=log, force_mode="pe-exact"))
    assert len(outs) == 2
    # pe-exact serving is sound for every frame incl. the adversarial one
    for f, y in zip(frames, outs):
        y_exact, _ = integer_forward(spec, qp, jnp.asarray(f),
                                     corrected=True)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(y_exact))
    # every audit slot records the sound mode with nothing to audit
    assert [(m, r) for (_i, m, r) in log] == [("pe-exact", None)] * 2

    # the PARTIAL-BATCH TAIL must honor the forced mode too (round-5
    # review: multihost_tail_forward leaked force_mode into the packed
    # forward and bypassed the override via certificate selection)
    mesh2 = make_mesh_multihost(n_hosts=1, dp=2, sp=2)
    rng2 = np.random.default_rng(7)
    frames3 = [rng2.random((1, 32, 64, 3), dtype=np.float32)
               for _ in range(3)]          # batch of 2 + tail of 1
    outs3 = list(stream_frames(spec, qp, mesh2, frames3,
                               lowering="deployment",
                               force_mode="pe-exact"))
    assert len(outs3) == 2 and outs3[1].shape[0] == 1
    for f, y in zip([np.concatenate(frames3[:2]), frames3[2]], outs3):
        y_exact, _ = integer_forward(spec, qp, jnp.asarray(f),
                                     corrected=True)
        np.testing.assert_array_equal(np.asarray(y), np.asarray(y_exact))
