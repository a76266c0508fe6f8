"""In-chip slab tiling (ops/slab.py): H-slab execution of the packed
deployment path must be BIT-IDENTICAL to the monolithic packed forward —
the single-chip analog of the reference's shrinking-halo tile walk
(output.py:42-65), built to keep 1080p+ working sets resident."""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from sesr_tpu.config import spec_for_task
from sesr_tpu.data.datasets import SyntheticDataset
from sesr_tpu.ops.packed import (packed_fast_forward, packed_hybrid_forward,
                                 select_packed_forward)
from sesr_tpu.ops.slab import (packed_slab_forward, pick_slab_h,
                               receptive_radius)
from sesr_tpu.quant.params import QuantParams

ARTIFACTS = os.path.join(os.path.dirname(__file__), os.pardir, "artifacts")


def _qp(task):
    path = os.path.join(ARTIFACTS, f"qparams_{task}.npz")
    if not os.path.exists(path):
        pytest.skip(f"{path} missing (run tools/make_qparams.py)")
    return QuantParams.load(path)


@pytest.mark.parametrize("task,slab_h", [
    ("sr_x2", 32), ("sr_x2", 24),      # slab_h % s_h == 0, H % slab_h != 0
    ("sr_x4", 32), ("nrdm_3", 32), ("dm", 24),
])
def test_slab_bitexact_vs_monolithic(task, slab_h):
    spec = spec_for_task(task)
    qp = _qp(task)
    for inp, _ in SyntheticDataset(task, n=2, hw=(88, 64), seed=11):
        x = jnp.asarray(inp)
        y_mono = select_packed_forward(qp)[1](spec, qp, x, s=(2, 4))
        y_slab = packed_slab_forward(spec, qp, x, s=(2, 4), slab_h=slab_h)
        np.testing.assert_array_equal(np.asarray(y_slab), np.asarray(y_mono))


def test_slab_bitexact_odd_height():
    """H neither a multiple of slab_h nor of the cell: the bottom pre-pad
    rows must quantize to the exact SAME-padding value."""
    task = "sr_x2"
    spec = spec_for_task(task)
    qp = _qp(task)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.random((1, 77, 48, 3), dtype=np.float32))
    y_mono = packed_fast_forward(spec, qp, x, s=(2, 4))
    y_slab = packed_slab_forward(spec, qp, x, s=(2, 4), slab_h=32)
    np.testing.assert_array_equal(np.asarray(y_slab), np.asarray(y_mono))


def test_slab_hybrid_lowering():
    """The layer-hybrid lowering (saturating task nr) slabs bit-exactly."""
    task = "nr"
    spec = spec_for_task(task)
    qp = _qp(task)
    if qp.fast_cert_layers is None or not any(qp.fast_cert_layers):
        pytest.skip("nr artifact lacks per-layer stamps")
    inp, _ = SyntheticDataset(task, n=1, hw=(80, 64), seed=3)[0]
    x = jnp.asarray(inp)
    y_mono = packed_hybrid_forward(spec, qp, x, s=(2, 4))
    y_slab = packed_slab_forward(spec, qp, x, s=(2, 4), slab_h=24,
                                 fwd=packed_hybrid_forward)
    np.testing.assert_array_equal(np.asarray(y_slab), np.asarray(y_mono))


def test_slab_batch_serial():
    """batch_serial maps frames sequentially; results identical to the
    batched monolithic run."""
    task = "sr_x2"
    spec = spec_for_task(task)
    qp = _qp(task)
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.random((3, 40, 48, 3), dtype=np.float32))
    y_mono = packed_fast_forward(spec, qp, x, s=(2, 4))
    y_ser = packed_slab_forward(spec, qp, x, s=(2, 4), slab_h=16,
                                batch_serial=True)
    np.testing.assert_array_equal(np.asarray(y_ser), np.asarray(y_mono))


def test_pick_slab_h():
    spec = spec_for_task("sr_x2")
    assert pick_slab_h(spec, 540) == 540          # small frames: monolithic
    h = pick_slab_h(spec, 1080)
    assert h < 1080 and h % 2 == 0 and -(-1080 // h) * h >= 1080
    assert receptive_radius(spec) == 7            # k = [5,3,3,3,5]
