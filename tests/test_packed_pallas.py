"""Fused channel-packed Pallas kernel (ops/pallas_packed.py): interpret-mode
bit-exactness against the certified fast path (which tests/test_certify.py
pins to the PE-exact interpreter and the reference goldens)."""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from sesr_tpu.config import spec_for_task
from sesr_tpu.ops.pallas_packed import build_pallas_packed_forward
from sesr_tpu.quant.integer import integer_forward
from sesr_tpu.quant.params import QuantParams

ARTIFACTS = os.path.join(os.path.dirname(__file__), os.pardir, "artifacts")


def _qp(task):
    path = os.path.join(ARTIFACTS, f"qparams_{task}.npz")
    if not os.path.exists(path):
        pytest.skip(f"{path} missing (run tools/make_qparams.py)")
    return QuantParams.load(path)


@pytest.mark.parametrize("task,s", [("sr_x2", 2), ("sr_x4", 2),
                                    ("sr_x2", 4), ("sr_x2", (2, 4)),
                                    # W-only cells (the shipped XLA default):
                                    # the H axis stays unpacked, so the k=5
                                    # convs keep 5 H-taps and the H ring is
                                    # sum(k//2)=7 — the per-axis tap/ring
                                    # generalization (round-4)
                                    ("sr_x2", (1, 8)), ("sr_x4", (1, 8))])
def test_packed_pallas_bitexact(task, s):
    spec = spec_for_task(task)
    qp = _qp(task)
    rng = np.random.default_rng(11)
    H, W = 40, 72                       # 2 x 3 tiles with tile 16x24 at s=2
    x = jnp.asarray(rng.random((1, H, W, spec.in_channels),
                               dtype=np.float32))
    fwd = build_pallas_packed_forward(spec, qp, H, W, s=s, tile_h=16,
                                      tile_w=24, interpret=True)
    y_ref, _ = integer_forward(spec, qp, x, corrected=True, compute="fast")
    np.testing.assert_array_equal(np.asarray(fwd(x)), np.asarray(y_ref))


@pytest.mark.parametrize("task,s", [("sr_x2", (1, 8)), ("sr_x2", (2, 4)),
                                    ("nrdm_3", (1, 8))])
def test_packed_pallas_int8_dots_bitexact(task, s):
    """The int8-MXU dot form (dot_dtype="int8"): raw q values with
    z_eff-valued pads (int8-exact operands) and the z_eff*sum(W)
    correction subtracted pre-clamp — must be bit-identical to the bf16
    form and hence the certified fast path."""
    spec = spec_for_task(task)
    qp = _qp(task)
    rng = np.random.default_rng(7)
    H, W = 40, 72
    x = jnp.asarray(rng.random((1, H, W, spec.in_channels),
                               dtype=np.float32))
    fwd = build_pallas_packed_forward(spec, qp, H, W, s=s, tile_h=16,
                                      tile_w=24, dot_dtype="int8",
                                      interpret=True)
    y_ref, _ = integer_forward(spec, qp, x, corrected=True, compute="fast")
    np.testing.assert_array_equal(np.asarray(fwd(x)), np.asarray(y_ref))


@pytest.mark.parametrize("dot_dtype", ["bf16", "int8"])
def test_packed_pallas_tap_dots_bitexact(dot_dtype):
    """The per-tap-dot form (tap_dots=True): no lane-concat im2col, one
    K=128 dot per tap — must be bit-identical to the concat forms."""
    spec = spec_for_task("sr_x2")
    qp = _qp("sr_x2")
    rng = np.random.default_rng(13)
    H, W = 40, 72
    x = jnp.asarray(rng.random((1, H, W, spec.in_channels),
                               dtype=np.float32))
    fwd = build_pallas_packed_forward(spec, qp, H, W, s=(1, 8), tile_h=16,
                                      tile_w=24, dot_dtype=dot_dtype,
                                      tap_dots=True, interpret=True)
    y_ref, _ = integer_forward(spec, qp, x, corrected=True, compute="fast")
    np.testing.assert_array_equal(np.asarray(fwd(x)), np.asarray(y_ref))


def test_packed_pallas_batched():
    spec = spec_for_task("sr_x2")
    qp = _qp("sr_x2")
    rng = np.random.default_rng(5)
    H, W = 32, 48
    x = jnp.asarray(rng.random((3, H, W, 3), dtype=np.float32))
    fwd = build_pallas_packed_forward(spec, qp, H, W, tile_h=16, tile_w=24,
                                      batch=3, interpret=True)
    y_ref, _ = integer_forward(spec, qp, x, corrected=True, compute="fast")
    np.testing.assert_array_equal(np.asarray(fwd(x)), np.asarray(y_ref))


def test_packed_pallas_refuses_uncertified():
    import dataclasses
    spec = spec_for_task("sr_x2")
    qp = dataclasses.replace(_qp("sr_x2"), fast_cert_ok=False)
    with pytest.raises(ValueError, match="certified"):
        build_pallas_packed_forward(spec, qp, 32, 48)


def test_packed_pallas_int8_refuses_wide_zero():
    """dot_dtype='int8' stores z_eff in the pads of an int8 buffer;
    effective_zero has no upper bound, so an artifact with a_zero > 127
    must be refused rather than silently wrapped (round-5 guard)."""
    import dataclasses
    spec = spec_for_task("sr_x2")
    qp = _qp("sr_x2")
    az = list(qp.a_zero)
    az[1] = 200
    bad = dataclasses.replace(qp, a_zero=az)
    with pytest.raises(AssertionError, match="does not fit int8"):
        build_pallas_packed_forward(spec, bad, 32, 48, dot_dtype="int8",
                                    interpret=True)
    # the bf16 form stays exact for the same artifact and must not refuse
    build_pallas_packed_forward(spec, bad, 32, 48, interpret=True)


def test_packed_pallas_ring_param():
    """A ring larger than the default must stay bit-exact (the ring only
    needs to be >= L; Mosaic's lowering rules force g to multiples of 4,
    so 8 is the practical minimum for the 5-conv nets)."""
    spec = spec_for_task("sr_x2")
    qp = _qp("sr_x2")
    rng = np.random.default_rng(21)
    H, W = 60, 88
    x = jnp.asarray(rng.random((1, H, W, 3), dtype=np.float32))
    y_ref, _ = integer_forward(spec, qp, x, corrected=True, compute="fast")
    fwd = build_pallas_packed_forward(spec, qp, H, W, tile_h=16,
                                      tile_w=16, g=12, interpret=True)
    np.testing.assert_array_equal(np.asarray(fwd(x)), np.asarray(y_ref))
