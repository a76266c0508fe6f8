"""Channel-packed deployment datapath (ops/packed.py): the space-to-depth
rewrite must be bit-identical to the certified fast path it lowers."""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from sesr_tpu.config import spec_for_task
from sesr_tpu.data.datasets import SyntheticDataset
from sesr_tpu.ops.conv import conv2d_nhwc
from sesr_tpu.ops.packed import (depth_to_space_nhwc, pack_weight_hwio,
                                 packed_conv_same, packed_fast_forward,
                                 packed_tap_range, space_to_depth_nhwc)
from sesr_tpu.quant.certify import certify_fast
from sesr_tpu.quant.integer import integer_forward
from sesr_tpu.quant.params import QuantParams

ARTIFACTS = os.path.join(os.path.dirname(__file__), os.pardir, "artifacts")


def test_space_to_depth_roundtrip(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 12, 5), dtype=np.float32))
    for s in (2, 4):
        y = space_to_depth_nhwc(x, s)
        assert y.shape == (2, 8 // s, 12 // s, s * s * 5)
        np.testing.assert_array_equal(np.asarray(depth_to_space_nhwc(y, s)),
                                      np.asarray(x))


@pytest.mark.parametrize("k,s", [(3, 2), (5, 2), (3, 4), (5, 4),
                                 (3, (2, 4)), (5, (4, 2))])
def test_packed_conv_equals_same_conv(rng, k, s):
    """Integer-valued float conv: packed rewrite must be array-equal."""
    ic, oc, h, w = 7, 6, 16, 24
    x = jnp.asarray(rng.integers(-255, 256, (1, h, w, ic)).astype(np.float32))
    wk = rng.integers(-128, 128, (k, k, ic, oc)).astype(np.float32)
    ref = conv2d_nhwc(x, jnp.asarray(wk))
    sh, sw = (s, s) if isinstance(s, int) else s
    q_lo = (packed_tap_range(k, sh)[0], packed_tap_range(k, sw)[0])
    q_hi = (packed_tap_range(k, sh)[1], packed_tap_range(k, sw)[1])
    wp = jnp.asarray(pack_weight_hwio(wk, s))
    got = depth_to_space_nhwc(
        packed_conv_same(space_to_depth_nhwc(x, s), wp, q_lo, q_hi), s)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("task,s", [("sr_x2", 2), ("sr_x4", 2),
                                    ("sr_x2", 4), ("sr_x4", 4),
                                    ("sr_x2", (2, 4)), ("sr_x2", (4, 2)),
                                    ("nrdm_3", (2, 4)), ("dm", (2, 4))])
def test_packed_fast_bitexact_vs_fast(task, s):
    """Packed fast == the fast interpreter == the PE-EXACT interpreter.
    nrdm_3 is the regression pin for the round-3 narrow-store fix: the
    rounded int16 shortcut must NOT replace layer 1's unrounded input
    (banker's rounding does not commute with the zero shift at .5
    boundaries — nrdm_3's calibration images hit them; ops/packed.py)."""
    path = os.path.join(ARTIFACTS, f"qparams_{task}.npz")
    if not os.path.exists(path):
        pytest.skip(f"{path} missing (run tools/make_qparams.py)")
    spec = spec_for_task(task)
    qp = QuantParams.load(path)
    for inp, _ in SyntheticDataset(task, n=2, hw=(64, 96), seed=7):
        x = jnp.asarray(inp)
        y_fast, _ = integer_forward(spec, qp, x, corrected=True,
                                    compute="fast")
        y_exact, _ = integer_forward(spec, qp, x, corrected=True)
        y_packed = packed_fast_forward(spec, qp, x, s=s)
        np.testing.assert_array_equal(np.asarray(y_packed),
                                      np.asarray(y_fast))
        np.testing.assert_array_equal(np.asarray(y_packed),
                                      np.asarray(y_exact))


def test_packed_fast_odd_sizes():
    """H, W not divisible by s: the pad-cell mask must reproduce the
    original image-border zero padding exactly."""
    task = "sr_x2"
    path = os.path.join(ARTIFACTS, f"qparams_{task}.npz")
    if not os.path.exists(path):
        pytest.skip(f"{path} missing")
    spec = spec_for_task(task)
    qp = QuantParams.load(path)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((1, 33, 47, 3), dtype=np.float32))
    y_fast, _ = integer_forward(spec, qp, x, corrected=True, compute="fast")
    y_packed = packed_fast_forward(spec, qp, x)
    np.testing.assert_array_equal(np.asarray(y_packed), np.asarray(y_fast))


@pytest.mark.parametrize("task", ["sr_x2", "sr_x4", "dm"])
def test_strided_entry_equals_packed_entry(task):
    """entry="strided" (fold quantize+pad+s2d+conv0 into one strided conv,
    the r3f/r3g entry-cost elimination) must be bit-identical to the
    explicit entry transform on every certified geometry, aligned and
    pad-mask (odd) sizes alike. Exactness argument: <= 3 input channels
    keep every f32 partial sum of the expanded kernel under 2^24
    (ops/packed.py strided_entry_weight)."""
    path = os.path.join(ARTIFACTS, f"qparams_{task}.npz")
    if not os.path.exists(path):
        pytest.skip(f"{path} missing")
    spec = spec_for_task(task)
    qp = QuantParams.load(path)
    rng = np.random.default_rng(11)
    for hw_ in ((64, 96), (33, 47)):
        x = jnp.asarray(rng.random((1, *hw_, spec.in_channels),
                                   dtype=np.float32))
        for s in ((1, 8), (2, 4), (4, 2), (2, 2), (4, 4)):
            y_s = packed_fast_forward(spec, qp, x, s=s, entry="strided")
            y_p = packed_fast_forward(spec, qp, x, s=s, entry="packed")
            np.testing.assert_array_equal(np.asarray(y_s), np.asarray(y_p),
                                          err_msg=f"{hw_} {s}")


def test_packed_refuses_uncertified():
    spec = spec_for_task("sr_x2")
    from sesr_tpu.io.torch_import import load_reference_checkpoint
    from sesr_tpu.quant.calibrate import calibrate
    images = [inp for inp, _ in SyntheticDataset("sr_x2", n=1, hw=(32, 48))]
    qp = calibrate(spec, load_reference_checkpoint("sr_x2"), images,
                   safe_zero_floor=True)
    with pytest.raises(ValueError, match="certified"):
        packed_fast_forward(spec, qp, jnp.asarray(images[0]))


@pytest.mark.parametrize("task,corrected", [
    ("sr_x2", False), ("sr_x2", True), ("sr_x4", False),
    ("nr", False), ("nrdm_6", False), ("nrdm_3", False), ("dm", True),
])
def test_packed_exact_bitexact(task, corrected):
    """PE-exact packed path == the reference-exact interpreter on every
    task — INCLUDING nr/nrdm_6, which saturate the 18-bit accumulator and
    are refused by the certified fast path."""
    from sesr_tpu.ops.packed import packed_exact_forward

    path = os.path.join(ARTIFACTS, f"qparams_{task}.npz")
    if not os.path.exists(path):
        pytest.skip(f"{path} missing")
    spec = spec_for_task(task)
    qp = QuantParams.load(path)
    rng = np.random.default_rng(31)
    x = jnp.asarray(rng.random((1, 28, 44, spec.in_channels),
                               dtype=np.float32))
    y_ref, _ = integer_forward(spec, qp, x, corrected=corrected)
    y_pk = packed_exact_forward(spec, qp, x, corrected=corrected)
    np.testing.assert_array_equal(np.asarray(y_pk), np.asarray(y_ref))


def test_packed_to_image_matches_composition(rng):
    """packed_to_image_nhwc == pixel_shuffle(depth_to_space(x)) for every
    cell/scale combination used by the deployment paths."""
    from sesr_tpu.ops.conv import pixel_shuffle_nhwc
    from sesr_tpu.ops.packed import packed_to_image_nhwc

    for s in ((2, 2), (2, 4), (4, 4)):
        for r in (1, 2, 4):
            c = 3 * r * r
            x = jnp.asarray(rng.random((2, 5, 7, s[0] * s[1] * c),
                                       dtype=np.float32))
            want = depth_to_space_nhwc(x, s)
            if r > 1:
                want = pixel_shuffle_nhwc(want, r)
            got = packed_to_image_nhwc(x, s, r)
            assert got.shape == want.shape
            assert np.array_equal(np.asarray(got), np.asarray(want))


@pytest.mark.parametrize("task", ["nr", "nrdm_6"])
def test_packed_hybrid_bitexact_on_saturating_tasks(task, rng):
    """The layer-hybrid lowering == the PE-exact interpreter on the tasks
    the fast path refuses (their saturation is confined to the last conv:
    certificate stamps F...Fx), on fresh non-calibration inputs including a
    bright one that actually fires the 18-bit clamps."""
    from sesr_tpu.ops.packed import packed_hybrid_forward

    path = os.path.join(ARTIFACTS, f"qparams_{task}.npz")
    if not os.path.exists(path):
        pytest.skip("artifact not built")
    qp = QuantParams.load(path)
    spec = spec_for_task(task)
    assert not qp.fast_cert_ok
    assert qp.fast_cert_layers is not None
    assert list(qp.fast_cert_layers) == [True] * (qp.num_convs - 1) + [False]

    saw_saturation = False
    imgs = [SyntheticDataset(task, n=1, hw=(32, 48), seed=99)[0][0],
            SyntheticDataset(task, n=1, hw=(32, 48), seed=7)[0][0],
            np.ones((1, 32, 48, spec.in_channels), np.float32)]  # saturates
    for x in imgs:
        want, dumps = integer_forward(spec, qp, jnp.asarray(x),
                                      corrected=True, collect_dumps=True)
        ovf18 = np.asarray(dumps["overflow_18"])
        confined = all(ovf18[i] == 0 for i in range(qp.num_convs)
                       if qp.fast_cert_layers[i])
        if not confined:
            # the certificate is evidence on the calibration distribution;
            # an out-of-distribution input may fire a stamped-safe layer
            # (nrdm_6's conv 0 at all-ones), where the hybrid — like the
            # fast path — makes no exactness claim. Verified here so the
            # caveat stays a measured fact, not prose.
            continue
        saw_saturation = saw_saturation or int(ovf18.sum()) > 0
        got = packed_hybrid_forward(spec, qp, x, (2, 4))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # at least one input really exercised the saturating last layer while
    # staying confined to it (nr at all-ones; nrdm_6 via the synthetics)
    assert saw_saturation


def test_packed_hybrid_refuses_unstamped(rng):
    from sesr_tpu.ops.packed import packed_hybrid_forward
    import dataclasses

    path = os.path.join(ARTIFACTS, "qparams_nr.npz")
    if not os.path.exists(path):
        pytest.skip("artifact not built")
    qp = dataclasses.replace(QuantParams.load(path), fast_cert_layers=None)
    with pytest.raises(ValueError, match="per-layer certification"):
        packed_hybrid_forward(spec_for_task("nr"), qp,
                              np.zeros((1, 16, 16, 3), np.float32))


def test_packed_hybrid_all_fast_equals_fast(rng):
    """With every layer stamped safe the hybrid reduces to the fast math."""
    from sesr_tpu.ops.packed import packed_hybrid_forward

    path = os.path.join(ARTIFACTS, "qparams_sr_x2.npz")
    if not os.path.exists(path):
        pytest.skip("artifact not built")
    qp = QuantParams.load(path)
    assert qp.fast_cert_ok and all(qp.fast_cert_layers)
    x = SyntheticDataset("sr_x2", n=1, hw=(32, 48), seed=7)[0][0]
    a = packed_hybrid_forward(spec_for_task("sr_x2"), qp, x, (2, 4))
    b = packed_fast_forward(spec_for_task("sr_x2"), qp, x, (2, 4))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_packed_exact_pe1_keeps_18bit_clamp(rng):
    """A pe=1 HardwareConfig still applies the 18-bit accumulator clamp in
    the packed exact path (regression: the hybrid gate briefly keyed the
    clamp on the number of PE splits instead of the layer mode)."""
    import dataclasses

    path = os.path.join(ARTIFACTS, "qparams_nr.npz")
    if not os.path.exists(path):
        pytest.skip("artifact not built")
    from sesr_tpu.ops.packed import packed_exact_forward

    qp0 = QuantParams.load(path)
    qp = dataclasses.replace(qp0, hw=dataclasses.replace(qp0.hw, pe=1),
                             fast_cert_ok=False, fast_cert_layers=None)
    spec = spec_for_task("nr")
    x = np.ones((1, 32, 48, 3), np.float32)       # saturates the last conv
    want, dumps = integer_forward(spec, qp, jnp.asarray(x), corrected=True,
                                  collect_dumps=True)
    assert int(np.asarray(dumps["overflow_18"]).sum()) > 0  # clamp fires
    got = packed_exact_forward(spec, qp, x, (2, 4), corrected=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_select_packed_forward_modes():
    """Certificate-driven lowering selection: fast / hybrid / pe-exact."""
    import dataclasses
    from sesr_tpu.ops.packed import (select_packed_forward,
                                     packed_fast_forward,
                                     packed_hybrid_forward)

    p_ok = os.path.join(ARTIFACTS, "qparams_sr_x2.npz")
    p_nr = os.path.join(ARTIFACTS, "qparams_nr.npz")
    if not (os.path.exists(p_ok) and os.path.exists(p_nr)):
        pytest.skip("artifacts not built")
    qp_ok, qp_nr = QuantParams.load(p_ok), QuantParams.load(p_nr)
    assert select_packed_forward(qp_ok) == ("fast", packed_fast_forward)
    assert select_packed_forward(qp_nr) == ("hybrid", packed_hybrid_forward)
    qp_none = dataclasses.replace(qp_nr, fast_cert_layers=None)
    mode, fwd = select_packed_forward(qp_none)
    assert mode == "pe-exact"
    # the pe-exact fallback actually runs and matches the interpreter
    x = np.zeros((1, 8, 16, 3), np.float32)
    want, _ = integer_forward(spec_for_task("nr"), qp_none, jnp.asarray(x),
                              corrected=True)
    got = fwd(spec_for_task("nr"), qp_none, x, (2, 4))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_packed_fast_int8_output_contract():
    """out_dtype='int8' returns the raw quantized image; dequantizing with
    (a_zero[L], a_scale[L]) reproduces the f32 contract exactly."""
    task = "sr_x2"
    path = os.path.join(ARTIFACTS, f"qparams_{task}.npz")
    if not os.path.exists(path):
        pytest.skip(f"{path} missing")
    spec = spec_for_task(task)
    qp = QuantParams.load(path)
    rng = np.random.default_rng(71)
    x = jnp.asarray(rng.random((1, 24, 48, 3), dtype=np.float32))
    y_f32 = np.asarray(packed_fast_forward(spec, qp, x))
    y_i8 = np.asarray(packed_fast_forward(spec, qp, x, out_dtype="int8"))
    assert y_i8.dtype == np.int8
    L = qp.num_convs
    deq = (y_i8.astype(np.float32) - np.float32(qp.a_zero[L])) \
        * np.float32(qp.a_scale[L])
    np.testing.assert_array_equal(deq, y_f32)


def test_resolve_cells_policy():
    """resolve_cells: the measured default when the shard admits it, the
    first certified geometry otherwise, halo-capacity constraint on
    sharded axes, cert_cells gate, explicit error when nothing fits, and
    REFUSAL of unstamped artifacts for the certificate-gated modes (the
    same policy `infer --cells` enforces — round-4 review finding)."""
    from sesr_tpu.ops.packed import (resolve_cells, CERTIFIED_CELLS,
                                     FAST_DEFAULT_CELLS)

    all_c = CERTIFIED_CELLS
    assert resolve_cells("fast", 24, 16, all_c) == FAST_DEFAULT_CELLS
    assert resolve_cells("hybrid", 24, 16, all_c) == FAST_DEFAULT_CELLS
    # W shard not divisible by 8: certified fallback (2,4)
    assert resolve_cells("fast", 24, 12, all_c) == (2, 4)
    # H-sharded (2D mesh): since round 5 the halo machinery exchanges the
    # per-layer tap reach (2 cells along an s_h=1 axis under k=5), so the
    # (1,8) default SERVES H-sharded meshes — the pod path no longer pays
    # the (2,4) 1080p+ geometry penalty
    assert resolve_cells("fast", 24, 16, all_c, h_sharded=True) \
        == FAST_DEFAULT_CELLS
    # ...unless the local H shard is too thin to source a 2-cell halo
    # from one neighbour hop (h_local=1: no geometry fits — (1,8) fails
    # the capacity check, every s_h>=2 geometry fails alignment)
    with pytest.raises(ValueError, match="no certified"):
        resolve_cells("fast", 1, 16, all_c, h_sharded=True)
    # pe-exact keeps its measured default and needs no stamps
    assert resolve_cells("pe-exact", 24, 16) == (2, 4)
    # an artifact stamped only for (2,4) must never serve (1,8)
    assert resolve_cells("fast", 24, 16, cert_cells=((2, 4),)) == (2, 4)
    with pytest.raises(ValueError, match="no certified"):
        resolve_cells("fast", 23, 13, all_c)
    # a gated mode with NO stamped geometry set must refuse, exactly like
    # the CLI (a sharded builder must not silently fall open to the full
    # CERTIFIED_CELLS the artifact's certification never executed)
    with pytest.raises(ValueError, match="cert_cells"):
        resolve_cells("fast", 24, 16)
    with pytest.raises(ValueError, match="cert_cells"):
        resolve_cells("hybrid", 24, 16, cert_cells=())


@pytest.mark.parametrize("task", ["sr_x2", "nr"])
def test_packed_exact_and_hybrid_int8_output_contract(task):
    """The int8 output contract on the PE-exact and layer-hybrid lowerings
    (round-3 verdict: it was fast-only): the raw quantized image must
    dequantize exactly to the f32 contract's output."""
    import os
    from sesr_tpu.ops.packed import (packed_exact_forward,
                                     packed_hybrid_forward,
                                     select_packed_forward)
    from sesr_tpu.quant.params import QuantParams

    path = os.path.join(os.path.dirname(__file__), os.pardir, "artifacts",
                        f"qparams_{task}.npz")
    if not os.path.exists(path):
        pytest.skip(f"qparams_{task}.npz missing")
    spec = spec_for_task(task)
    qp = QuantParams.load(path)
    rng = np.random.default_rng(53)
    x = rng.random((1, 24, 48, spec.in_channels), dtype=np.float32)
    L = spec.num_convs
    zero_L, scale_L = float(qp.a_zero[L]), float(qp.a_scale[L])

    fwds = [lambda **kw: packed_exact_forward(spec, qp, x, corrected=True,
                                              **kw)]
    if qp.fast_cert_layers is not None and any(qp.fast_cert_layers):
        fwds.append(lambda **kw: packed_hybrid_forward(spec, qp, x, **kw))
    mode, sel = select_packed_forward(qp)
    fwds.append(lambda **kw: sel(spec, qp, x, **kw))
    for fwd in fwds:
        y_f = np.asarray(fwd())
        y_8 = np.asarray(fwd(out_dtype="int8"))
        assert y_8.dtype == np.int8
        np.testing.assert_array_equal(
            (y_8.astype(np.float32) - zero_L) * scale_L, y_f)


@pytest.mark.parametrize("task", ["nr", "nrdm_6"])
def test_packed_hybrid_narrow_stores(task):
    """Round-3 verdict item 4: the hybrid lowering narrow-stores its int8
    inter-layer / int16 shortcut boundaries when the artifact holds the
    static wrap-free proof — program provably different from the wide
    build, outputs bit-identical to the corrected interpreter either way."""
    import dataclasses
    import jax
    from sesr_tpu.ops.packed import packed_hybrid_forward

    path = os.path.join(ARTIFACTS, f"qparams_{task}.npz")
    if not os.path.exists(path):
        pytest.skip("artifact not built")
    qp = QuantParams.load(path)
    spec = spec_for_task(task)
    assert qp.shortcut_static, "shipped artifact should carry the proof"
    qp_wide = dataclasses.replace(qp, shortcut_static=False)

    shape = jax.ShapeDtypeStruct((1, 32, 48, spec.in_channels), jnp.float32)
    t_narrow = jax.jit(
        lambda v: packed_hybrid_forward(spec, qp, v)).lower(shape).as_text()
    t_wide = jax.jit(
        lambda v: packed_hybrid_forward(spec, qp_wide, v)).lower(shape
                                                                 ).as_text()
    assert t_narrow != t_wide
    assert "i16" in t_narrow and "i16" not in t_wide  # int16 shortcut store

    x = SyntheticDataset(task, n=1, hw=(32, 48), seed=11)[0][0]
    want, _ = integer_forward(spec, qp, jnp.asarray(x), corrected=True)
    for q in (qp, qp_wide):
        got = packed_hybrid_forward(spec, q, x)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_packed_exact_narrow_store_bitexact():
    """packed_exact_forward(narrow_store=True) — int8 boundaries + int16
    shortcut — stays bit-identical to the corrected interpreter (the int8
    stores are exact unconditionally; sr_x2's shortcut is statically
    proven)."""
    from sesr_tpu.ops.packed import packed_exact_forward

    path = os.path.join(ARTIFACTS, "qparams_sr_x2.npz")
    if not os.path.exists(path):
        pytest.skip("artifact not built")
    qp = QuantParams.load(path)
    assert qp.shortcut_static
    spec = spec_for_task("sr_x2")
    x = SyntheticDataset("sr_x2", n=1, hw=(32, 48), seed=13)[0][0]
    want, _ = integer_forward(spec, qp, jnp.asarray(x), corrected=True)
    got = packed_exact_forward(spec, qp, x, corrected=True,
                               narrow_store=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    with pytest.raises(ValueError, match="corrected"):
        packed_exact_forward(spec, qp, x, narrow_store=True)
