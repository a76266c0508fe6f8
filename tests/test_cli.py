"""CLI entry points (cli.py) driven in-process — the reference's
edit-the-source scripts replaced by one argparse surface."""

import json
import os

import numpy as np
import pytest

from sesr_tpu.cli import main

ARTIFACTS = os.path.join(os.path.dirname(__file__), os.pardir, "artifacts")
QP_SR_X2 = os.path.join(ARTIFACTS, "qparams_sr_x2.npz")

needs_artifact = pytest.mark.skipif(not os.path.exists(QP_SR_X2),
                                    reason="qparams_sr_x2.npz missing")


@needs_artifact
def test_cli_sim(tmp_path, capsys):
    rng = np.random.default_rng(0)
    fx = str(tmp_path / "x.npy")
    np.save(fx, rng.random((1, 16, 24, 3), dtype=np.float32))
    main(["sim", "--task", "sr_x2", "--qparams", QP_SR_X2,
          "--fixture", fx, "--dump-dir", str(tmp_path / "dumps")])
    out = capsys.readouterr().out
    assert "overflow counts per layer" in out
    assert os.path.exists(tmp_path / "dumps" / "dumps.npz")


@needs_artifact
def test_cli_infer(capsys):
    main(["infer", "--task", "sr_x2", "--qparams", QP_SR_X2,
          "--n-images", "1"])
    out = capsys.readouterr().out
    # default cells are mode-dependent: 1x8 for the certified fast
    # lowering (FAST_DEFAULT_CELLS), 2x4 for hybrid/pe-exact
    assert "packed(1x8, fast) mean psnr" in out
    psnr = float(out.split("psnr:")[1].split()[0])
    assert psnr > 20.0            # sanity: a real image came through


@needs_artifact
def test_cli_infer_save_dir_defaults_int8(tmp_path, capsys):
    """--save-dir flips the default output contract to int8 (round 5: the
    PNG is 8-bit regardless, so the f32 full-res write buys nothing —
    VERDICT r4 item 6). The PNGs must be identical to the explicit-f32
    run's: the int8 contract dequantizes losslessly client-side."""
    d8 = tmp_path / "png8"
    df = tmp_path / "pngf"
    main(["infer", "--task", "sr_x2", "--qparams", QP_SR_X2,
          "--n-images", "1", "--save-dir", str(d8)])
    out8 = capsys.readouterr().out
    assert "packed(1x8, fast, int8)" in out8
    main(["infer", "--task", "sr_x2", "--qparams", QP_SR_X2,
          "--n-images", "1", "--save-dir", str(df), "--out-dtype", "f32"])
    outf = capsys.readouterr().out
    assert "packed(1x8, fast)" in outf
    from PIL import Image
    a = np.asarray(Image.open(d8 / "out_0000.png"))
    b = np.asarray(Image.open(df / "out_0000.png"))
    np.testing.assert_array_equal(a, b)
    # and identical scores
    assert (out8.split("mean psnr:")[1].splitlines()[0]
            == outf.split("mean psnr:")[1].splitlines()[0])


@needs_artifact
def test_cli_infer_legacy_artifact_cells_gate(tmp_path, capsys):
    """An artifact stamped before (1,8) entered CERTIFIED_CELLS records
    only the legacy geometry set: the CLI's default must fall back to its
    first certified geometry (2x4), and an explicit --cells 1x8 must be
    REJECTED rather than served unverified."""
    import dataclasses
    from sesr_tpu.quant.params import QuantParams

    qp = QuantParams.load(QP_SR_X2)
    legacy = dataclasses.replace(
        qp, cert_cells=((2, 4), (4, 2), (2, 2), (4, 4)))
    p = str(tmp_path / "legacy.npz")
    legacy.save(p)
    main(["infer", "--task", "sr_x2", "--qparams", p, "--n-images", "1"])
    out = capsys.readouterr().out
    assert "packed(2x4, fast) mean psnr" in out
    with pytest.raises(SystemExit, match="certified geometry set"):
        main(["infer", "--task", "sr_x2", "--qparams", p,
              "--n-images", "1", "--cells", "1x8"])


@needs_artifact
def test_cli_infer_hybrid_fallback(capsys):
    """A saturating task's artifact (nr: fast_cert_ok=False, last layer
    unsafe) runs the layer-hybrid lowering through the same command."""
    qp_nr = os.path.join(ARTIFACTS, "qparams_nr.npz")
    if not os.path.exists(qp_nr):
        pytest.skip("nr artifact not built")
    main(["infer", "--task", "nr", "--qparams", qp_nr, "--n-images", "1"])
    out = capsys.readouterr().out
    assert "packed(1x8, hybrid) mean psnr" in out
    psnr = float(out.split("psnr:")[1].split()[0])
    assert psnr > 15.0


def test_cli_hist(tmp_path, capsys):
    main(["hist", "--task", "nrdm_3", "--n-images", "1",
          "--out", str(tmp_path / "png")])
    out = capsys.readouterr().out
    assert "histogram PNGs" in out
    assert os.path.exists(tmp_path / "png" / "weight" / "conv.weight.0.png")


@needs_artifact
def test_cli_export(tmp_path, capsys):
    rng = np.random.default_rng(1)
    fx = str(tmp_path / "x.npy")
    np.save(fx, rng.random((1, 16, 32, 3), dtype=np.float32))
    main(["export", "--task", "sr_x2", "--qparams", QP_SR_X2,
          "--fixture", fx, "--out-dir", str(tmp_path / "hex")])
    # export writes the reference's output_file/ tree layout (one dir per
    # stream); assert every stream dir exists and is non-empty
    streams = set(os.listdir(tmp_path / "hex"))
    assert {"weight", "input", "bias", "pe_out", "pe_add",
            "end2end"} <= streams
    for s in streams:
        assert os.listdir(tmp_path / "hex" / s)


def test_cli_eval_float_real_data(capsys):
    """--data real routes to the offline real-photo crops."""
    main(["eval-float", "--task", "sr_x2", "--data", "real",
          "--n-images", "1"])
    out = capsys.readouterr().out
    assert "psnr" in out
    psnr = float(out.split("psnr:")[1].split()[0])
    assert psnr > 20.0


@needs_artifact
def test_cli_certify(tmp_path, capsys):
    out_path = str(tmp_path / "stamped.npz")
    main(["certify", "--task", "sr_x2", "--qparams", QP_SR_X2,
          "--n-images", "2", "--out", out_path])
    out = capsys.readouterr().out
    assert "grade=" in out and "statically proven" in out
    assert os.path.exists(out_path)
    from sesr_tpu.quant.params import QuantParams
    qp = QuantParams.load(out_path)
    assert qp.fast_cert_static is not None


@needs_artifact
def test_cli_train_preview(tmp_path, capsys):
    main(["train", "--task", "sr_x2", "--steps", "2", "--n-images", "1",
          "--preview-dir", str(tmp_path / "pv"), "--preview-every", "1"])
    files = sorted(os.listdir(tmp_path / "pv"))
    assert files == ["preview_000001.png", "preview_000002.png"], files


def test_cli_train_warm_start_finetune(tmp_path, capsys):
    """--init-checkpoint reproduces the reference's only training recipe —
    the warm-start fine-tune from a float checkpoint (train.py:51-52):
    steps from nrdm_3_raw_G.pth decrease MSE, and the collapsed fine-tuned
    model still certifies for the fast deployment path."""
    from sesr_tpu.config import spec_for_task
    from sesr_tpu.data.datasets import SyntheticDataset
    from sesr_tpu.models.sesr import CollapsedParams
    from sesr_tpu.quant.calibrate import calibrate
    from sesr_tpu.quant.certify import certify_fast

    out = str(tmp_path / "collapsed.npz")
    main(["train", "--task", "nrdm_3", "--steps", "3", "--n-images", "1",
          "--init-checkpoint", "reference", "--out", out])
    txt = capsys.readouterr().out
    assert "warm start from" in txt
    losses = [float(line.split("loss ")[1]) for line in txt.splitlines()
              if line.startswith("step ")]
    assert len(losses) >= 2 and losses[-1] < losses[0], losses
    # collapse-after-finetune still certifies (the fine-tune must not
    # silently push the artifact out of the fast-safe regime)
    spec = spec_for_task("nrdm_3")
    ck = np.load(out)
    params = CollapsedParams(
        [ck[f"w_{i}"] for i in range(spec.num_convs)],
        [ck[f"b_{i}"] for i in range(spec.num_convs)])
    images = [inp for inp, _ in SyntheticDataset("nrdm_3", n=2, hw=(64, 96))]
    qp = certify_fast(spec, calibrate(spec, params, images,
                                      safe_zero_floor=True), images)
    assert qp.fast_cert_ok


def test_cli_train_warm_start_rejects_collapsed(tmp_path):
    """A collapsed checkpoint (no conv_squeeze keys) cannot warm-start the
    expanded trainer — fail with a clear message, not a KeyError."""
    import torch

    p = str(tmp_path / "bad.pth")
    torch.save({"conv_first.conv_expand.weight":
                torch.zeros((16, 3, 5, 5))}, p)
    with pytest.raises(SystemExit, match="UNCOLLAPSED"):
        main(["train", "--task", "nrdm_3", "--steps", "1",
              "--init-checkpoint", p])


@needs_artifact
def test_cli_profile(capsys):
    main(["profile", "--task", "sr_x2", "--qparams", QP_SR_X2,
          "--height", "64", "--width", "96"])
    out = capsys.readouterr().out
    assert "flops/frame" in out and "bytes accessed" in out


def test_cli_calibrate_weight_rounding_adaround(tmp_path, capsys):
    """calibrate --weight-rounding adaround runs the two-phase AdaRound
    recipe through the CLI (round 5, quant/adaround.py): the saved
    artifact's weights are a valid neighbor rounding of the checkpoint at
    the same per-tensor scales, and the observer guard still runs."""
    from sesr_tpu.config import spec_for_task
    from sesr_tpu.io.torch_import import load_reference_checkpoint
    from sesr_tpu.quant.params import QuantParams

    out = str(tmp_path / "qp_ada.npz")
    main(["calibrate", "--task", "nrdm_3", "--n-images", "2",
          "--weight-rounding", "adaround", "--adaround-steps", "8",
          "--out", out, "--no-eval"])
    assert "saved" in capsys.readouterr().out
    qp = QuantParams.load(out)
    params = load_reference_checkpoint("nrdm_3")
    spec = spec_for_task("nrdm_3")
    for i in range(spec.num_convs):
        base = np.floor(np.asarray(params.weights[i], np.float64)
                        / qp.w_scale[i])
        d = np.asarray(qp.w_int[i], np.int64) - base.astype(np.int64)
        inside = (np.asarray(qp.w_int[i]) > -128) & (np.asarray(qp.w_int[i])
                                                     < 127)
        assert np.isin(d[inside], [0, 1]).all(), i
