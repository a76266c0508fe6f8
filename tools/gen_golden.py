"""Generate golden verification artifacts by running the REFERENCE pipeline.

This tool imports the reference implementation from /root/reference (read-only)
and drives its calibration (test.py exe_mode=0 composition, test.py:78-117)
and bit-exact integer sim (sim.py exe_mode=1 composition, sim.py:81-114) on
small fixed synthetic inputs, then bundles every intermediate the reference
dumps into one .npz per task under tests/goldens/.

No reference code is copied into the repo — the reference is executed as an
oracle, exactly as SURVEY.md §4 prescribes ("golden dumps regenerated from
the reference fixtures").

Usage:  python tools/gen_golden.py [--task nrdm_3|sr_x4] [--full]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"

TASK_MFLAG = {"nrdm_3": 3, "sr_x4": 5, "sr_x2": 6, "nr": 1, "dm": 2,
              "nr_qat": 1, "dm_qat": 2, "nrdm_3_qat": 3, "sr_x4_qat": 5,
              "sr_x2_qat": 6}

# MFLAG value installed in the define stub. For nr/dm (MFLAG 1/2) the
# reference's own calibration cannot complete: the output domain (id=5) is
# observed either by the PixelShuffle quant node (absent in nr/dm) or by the
# `MFLAG == 3 and func_id == 4` branch of PEs_and_bias_adder
# (quan_func.py:460-479), so with MFLAG=1/2 input.5.{min,max}_val.pt is never
# written and test.py:205-217 / the exe_mode=1 requant both crash. MFLAG is
# used NOWHERE else in the library code (grep-verified: quan_func.py:460 is
# the only live use), so installing MFLAG=3 while building the nr/dm models
# directly runs 100% reference numerics with its own domain-5 observer
# enabled — the minimal completion of the flow its author left broken.
TASK_STUB_MFLAG = {"nrdm_3": 3, "sr_x4": 5, "sr_x2": 6, "nr": 3, "dm": 3,
                   "nr_qat": 3, "dm_qat": 3, "nrdm_3_qat": 3, "sr_x4_qat": 5,
                   "sr_x2_qat": 6}


def _install_define_stub(mflag: int):
    """Inject a `define` module with the wanted MFLAG before importing the
    reference's myQL.quan_func (which reads define constants at import).
    The reference hard-codes MFLAG in define.py:1; everything else matches
    define.py:5-36 (hist PNGs off)."""
    stub = types.ModuleType("define")
    stub.MFLAG = mflag
    stub.TEST_RAW_ADD_NOISE = False
    stub.PE = 4
    stub.QUAN_BIT = 8
    stub.BIAS_BIT = 16
    stub.PE_ACC_BIT = 18
    stub.PE_ADD_BIT = 20
    stub.REQUAN_BIT = 16
    stub.REQUAN_N_MAX = 32
    for flag in ["WEIGHT_W_FLG", "INPUT_W_FLG", "BIAS_W_FLG", "BIAS_QUAN_W_FLG",
                 "OUTPUT_PE_W_FLG", "OUTPUT_PE_ADD_W_FLG", "REQUAN_FACTOR_W_FLG"]:
        setattr(stub, flag, True)
    stub.WEIGHT_W_HIST_PNG = False
    stub.INPUT_W_HIST_PNG = False
    sys.modules["define"] = stub


def _build_models(task: str):
    import torch
    if task == "sr_x4":
        from models import sesr, sesr_sim
        calib_model, sim_model = sesr.sesr(), sesr_sim.sesr()
        ckpt = torch.load(f"{REFERENCE}/model_params/x4sesr.pth", map_location="cpu")
    elif task == "sr_x2":
        from models import sesr_arch, sesr_arch_sim
        calib_model, sim_model = sesr_arch.sesr(), sesr_arch_sim.sesr()
        ckpt = torch.load(f"{REFERENCE}/model_params/x2sesr.pth.tar",
                          map_location="cpu", weights_only=False)["state_dict"]
    elif task == "nrdm_3":
        from models import nrdm_3, nrdm_3_sim
        calib_model, sim_model = nrdm_3.nr(), nrdm_3_sim.nr()
        ckpt = torch.load(f"{REFERENCE}/model_params/nrdm_3_raw_G.pth",
                          map_location="cpu")
    elif task in ("nr", "dm"):
        # sim.py:33-41 runs the NON-sim models for MFLAG 1/2 — the AddOp
        # stays in the integer graph (shortcut double-add quirk; see
        # quant/integer.py residual_mode="graph_add").
        if task == "nr":
            from models import nr as mod
            calib_model, sim_model = mod.nr(), mod.nr()
        else:
            from models import dm as mod
            calib_model, sim_model = mod.dm(), mod.dm()
        ckpt = torch.load(f"{REFERENCE}/model_params/{task}_G.pth",
                          map_location="cpu")
    elif task in ("nr_qat", "dm_qat"):
        # the qatf="qat_" composition (test.py:27-28,61-75 / sim.py): the
        # model is prepare()'d BEFORE the checkpoint load, so collapse()
        # evaluates the fake-quant delta response and the in-graph AddOp
        # becomes QuantAdd; the checkpoint is the QAT-trained *_qat_G.pth.
        # quantize_utils_pt is the reference's CPU twin of
        # quantize_utils_cuda (diff: .cuda() placement only, SURVEY §2 C7).
        from models import quantize_utils_pt as quantize
        if task == "nr_qat":
            from models import nr as mod
            calib_model, sim_model = mod.nr(), mod.nr()
        else:
            from models import dm as mod
            calib_model, sim_model = mod.dm(), mod.dm()
        for m in (calib_model, sim_model):
            m.train()
            quantize.prepare(m, inplace=True, a_bits=8, w_bits=8,
                             q_type=0, q_level="C")
        ckpt = torch.load(
            f"{REFERENCE}/model_params/{task.split('_')[0]}_qat_G.pth",
            map_location="cpu")
    elif task in ("sr_x4_qat", "sr_x2_qat"):
        # the qatf="qat_" composition on MFLAG 5/6 — an upstream QUIRK
        # path: test.py:64-69 loads the FLOAT x4sesr.pth / x2sesr.pth.tar
        # regardless of qatf, so the prepared model's quantizer/observer
        # buffers keep their INIT state (zeros) and the fx trace freezes
        # whatever scale that yields into the QuantAdd (= the f32 eps
        # floor). Generated to learn/pin that behavior.
        from models import quantize_utils_pt as quantize
        if task == "sr_x4_qat":
            from models import sesr, sesr_sim
            calib_model, sim_model = sesr.sesr(), sesr_sim.sesr()
            ckpt = torch.load(f"{REFERENCE}/model_params/x4sesr.pth",
                              map_location="cpu")
        else:
            from models import sesr_arch, sesr_arch_sim
            calib_model, sim_model = sesr_arch.sesr(), sesr_arch_sim.sesr()
            ckpt = torch.load(f"{REFERENCE}/model_params/x2sesr.pth.tar",
                              map_location="cpu",
                              weights_only=False)["state_dict"]
        for m in (calib_model, sim_model):
            m.train()
            quantize.prepare(m, inplace=True, a_bits=8, w_bits=8,
                             q_type=0, q_level="C")
    elif task == "nrdm_3_qat":
        # the qatf="qat_" composition on the MFLAG 3 (sim-wiring) path:
        # calibration runs the prepared nrdm_3 model (its AddOp becomes
        # QuantAdd), the integer sim runs the prepared nrdm_3_sim model
        # (no AddOp — the in-chain residual wiring of quan_func.py:244-270
        # plus requan_res, unlike nr/dm's graph_add quirk). Upstream
        # composes the checkpoint name "nrdm_3_raw_qat_G.pth"
        # (test.py:38-40), which is absent from the shipped model_params;
        # the shipped QAT weights for this model are nrdm_3_qat_G.pth —
        # the minimal completion of the flow, as with the nr/dm MFLAG stub.
        from models import quantize_utils_pt as quantize
        from models import nrdm_3, nrdm_3_sim
        calib_model, sim_model = nrdm_3.nr(), nrdm_3_sim.nr()
        for m in (calib_model, sim_model):
            m.train()
            quantize.prepare(m, inplace=True, a_bits=8, w_bits=8,
                             q_type=0, q_level="C")
        ckpt = torch.load(f"{REFERENCE}/model_params/nrdm_3_qat_G.pth",
                          map_location="cpu")
    else:
        raise ValueError(task)
    for m in (calib_model, sim_model):
        m.float()
        m.load_state_dict(ckpt, strict=False)
        m.collapse()
    return calib_model, sim_model


def _collapsed_arrays(model):
    """Collapsed conv weights/biases in graph order, as numpy OIHW."""
    convs = [model.conv_first.conv_expand]
    for blk in model.residual_block:
        convs.append(blk.conv_expand)
    convs.append(model.conv_last.conv_expand)
    ws = [c.weight.detach().numpy().copy() for c in convs]
    bs = [c.bias.detach().numpy().copy() for c in convs]
    return ws, bs


def _fx_calibration_model(model, mflag: int):
    """Compose the exe_mode=0 graph passes exactly as test.py:78-106."""
    import torch
    from myQL.quan_func import (quantize_model_weight,
                                quantize_asymmetrical_by_tensor,
                                reshape_input_for_hardware_pe,
                                PEs_and_bias_adder)
    from myQL.quan_classes import NodeInsertMapping, FunctionPackage, \
        NodeInsertMappingElement
    from myQL.graph_modify import insert_before, insert_bias_bypass

    model = quantize_model_weight(model, 8, 0)

    mapping = NodeInsertMapping()
    quan_fp = FunctionPackage(quantize_asymmetrical_by_tensor,
                              {"width": 8, "exe_mode": 0})
    mapping.add_config(NodeInsertMappingElement(torch.nn.Conv2d, quan_fp))
    mapping.add_config(NodeInsertMappingElement(torch.nn.PixelShuffle, quan_fp))
    model = insert_before(model_input=model, insert_mapping=mapping,
                          has_func_id=True)

    reshape_mapping = NodeInsertMapping()
    reshape_fp = FunctionPackage(reshape_input_for_hardware_pe, {"pe_num": 4})
    reshape_mapping.add_config(NodeInsertMappingElement(torch.nn.Conv2d, reshape_fp))
    model = insert_before(model_input=model, insert_mapping=reshape_mapping)

    bypass_mapping = NodeInsertMapping()
    bypass_fp = FunctionPackage(PEs_and_bias_adder,
                                {"pe_add_width": 20, "pe_acc_width": 18,
                                 "bias_width": 16, "pe_num": 4, "exe_mode": 0})
    bypass_mapping.add_config(NodeInsertMappingElement(torch.nn.Conv2d, bypass_fp))
    model = insert_bias_bypass(model_input=model, insert_mapping=bypass_mapping)
    return model


def _fx_sim_model(model):
    """Compose the exe_mode=1 graph passes exactly as sim.py:81-114
    (order: quant, reshape, requant-after, bias-bypass)."""
    import torch
    from myQL.quan_func import (quantize_model_weight,
                                quantize_asymmetrical_by_tensor,
                                reshape_input_for_hardware_pe,
                                PEs_and_bias_adder, requan_conv2d_output)
    from myQL.quan_classes import NodeInsertMapping, FunctionPackage, \
        NodeInsertMappingElement
    from myQL.graph_modify import insert_before, insert_bias_bypass, insert_after

    model = quantize_model_weight(model, 8, 1)

    mapping = NodeInsertMapping()
    quan_fp = FunctionPackage(quantize_asymmetrical_by_tensor,
                              {"width": 8, "exe_mode": 1})
    mapping.add_config(NodeInsertMappingElement(torch.nn.Conv2d, quan_fp))
    model = insert_before(model_input=model, insert_mapping=mapping,
                          has_func_id=True)

    reshape_mapping = NodeInsertMapping()
    reshape_fp = FunctionPackage(reshape_input_for_hardware_pe, {"pe_num": 4})
    reshape_mapping.add_config(NodeInsertMappingElement(torch.nn.Conv2d, reshape_fp))
    model = insert_before(model_input=model, insert_mapping=reshape_mapping)

    requan_mapping = NodeInsertMapping()
    requan_fp = FunctionPackage(requan_conv2d_output, {"exe_mode": 1})
    requan_mapping.add_config(NodeInsertMappingElement(torch.nn.Conv2d, requan_fp))
    model = insert_after(model_input=model, insert_mapping=requan_mapping)

    bypass_mapping = NodeInsertMapping()
    bypass_fp = FunctionPackage(PEs_and_bias_adder,
                                {"pe_add_width": 20, "pe_acc_width": 18,
                                 "bias_width": 16, "pe_num": 4, "exe_mode": 1})
    bypass_mapping.add_config(NodeInsertMappingElement(torch.nn.Conv2d, bypass_fp))
    model = insert_bias_bypass(model_input=model, insert_mapping=bypass_mapping)
    return model


def _finalize_scales(num_convs: int):
    """Replicate the calibration finalize of test.py:186-217: static
    scale/zero from accumulated min/max; output domain forces min=0."""
    import torch
    for d in range(num_convs + 1):
        lo = torch.load(f"output_pt/input/input.{d}.min_val.pt")
        hi = torch.load(f"output_pt/input/input.{d}.max_val.pt")
        if d == num_convs:
            lo = 0
        scale = (hi - lo) / 255.0
        zero = -128 - round(lo / scale)
        torch.save(scale, f"output_pt/input/input.{d}.scale.pt")
        torch.save(zero, f"output_pt/input/input.{d}.zero.pt")


def generate(task: str, out_path: str, fixture_hw=(32, 48), n_calib=3,
             full_fixture=False):
    import torch

    mflag = TASK_MFLAG[task]
    _install_define_stub(TASK_STUB_MFLAG[task])
    sys.path.insert(0, REFERENCE)
    workdir = tempfile.mkdtemp(prefix=f"golden_{task}_")
    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        torch.manual_seed(0)
        calib_model, sim_model = _build_models(task)
        ws, bs = _collapsed_arrays(calib_model)
        L = len(ws)
        in_ch = ws[0].shape[1]

        rng = np.random.default_rng(42)
        h, w = fixture_hw
        calib_images = [rng.random((1, in_ch, h, w)).astype(np.float32)
                        for _ in range(n_calib)]
        if full_fixture:
            # 3-channel tasks use the DM fixture; only sr_x4 is 1-channel
            name = "rand_SR_Input_80x960.pt" if task == "sr_x4" \
                else "rand_DM_Input_80x960.pt"
            fixture = torch.load(f"{REFERENCE}/{name}", map_location="cpu").numpy()
        else:
            fixture = rng.random((1, in_ch, h, w)).astype(np.float32)

        # ---- exe_mode 0: calibration + fake-quant eval -------------------
        fx_calib = _fx_calibration_model(calib_model, mflag)
        fake_outputs = []
        with torch.no_grad():
            for img in calib_images:
                fake_outputs.append(fx_calib(torch.from_numpy(img)).numpy())
        _finalize_scales(L)

        # ---- exe_mode 1: bit-exact integer sim ---------------------------
        fx_sim = _fx_sim_model(sim_model)
        with torch.no_grad():
            gfake = fx_sim(torch.from_numpy(fixture)).numpy()

        # ---- bundle ------------------------------------------------------
        out = {}
        for i in range(L):
            out[f"w_collapsed_{i}"] = ws[i]
            out[f"b_collapsed_{i}"] = bs[i]
            out[f"w_int_{i}"] = torch.load(
                f"output_pt/weight/conv.weight.{i}.pt").numpy().astype(np.int32)
            out[f"w_scale_{i}"] = np.float64(torch.load(
                f"output_pt/weight/conv.weight.{i}.scale.pt"))
            out[f"bias_quan_{i}"] = torch.load(
                f"output_pt/bias/conv.bias.quan{i}.pt").numpy().astype(np.int32)
            out[f"input_{i}"] = torch.load(
                f"output_pt/input/input.{i}.pt").numpy()
            for p in range(4):
                out[f"pe_out_{i}_{p}"] = torch.load(
                    f"output_pt/pe_out/pe_output{i}_{p}.pt").numpy().astype(np.int32)
            out[f"pe_add_{i}"] = torch.load(
                f"output_pt/pe_add/pe_add_output{i}.pt").numpy().astype(np.int32)
        out[f"input_{L}"] = torch.load(f"output_pt/input/input.{L}.pt").numpy()
        out["shortcut"] = torch.load("output_pt/residual/shortcut_tensor.pt").numpy()
        for d in range(L + 1):
            out[f"a_scale_{d}"] = np.float64(torch.load(
                f"output_pt/input/input.{d}.scale.pt"))
            out[f"a_zero_{d}"] = np.int64(torch.load(
                f"output_pt/input/input.{d}.zero.pt"))
            out[f"min_val_{d}"] = np.float64(torch.load(
                f"output_pt/input/input.{d}.min_val.pt"))
            out[f"max_val_{d}"] = np.float64(torch.load(
                f"output_pt/input/input.{d}.max_val.pt"))
        for i in range(L):
            tgt = {0: 1, L - 2: "res_shared", L - 1: L}.get(i, i + 1)
            if i == L - 2:
                out[f"requan_m_{i}"] = np.int64(torch.load(
                    f"output_pt/requan_factor/requan_{i}_{i+1}.pt"))
                out[f"requan_n_{i}"] = np.int64(torch.load(
                    f"output_pt/requan_factor/n_{i}_{i+1}.pt"))
            else:
                out[f"requan_m_{i}"] = np.int64(torch.load(
                    f"output_pt/requan_factor/requan_{i}_{i+1}.pt"))
                out[f"requan_n_{i}"] = np.int64(torch.load(
                    f"output_pt/requan_factor/n_{i}_{i+1}.pt"))
        out["res_requant_m"] = np.int64(torch.load("output_pt/requan_factor/requan_res.pt"))
        out["res_requant_n"] = np.int64(torch.load("output_pt/requan_factor/n_res.pt"))
        out["num_convs"] = np.int64(L)
        out["task"] = np.bytes_(task.encode())
        if task in ("nr_qat", "dm_qat", "nrdm_3_qat"):
            # the union observer bounds the fx trace froze into the
            # QuantAdd scale (quant/qat.py quant_add_frozen)
            ck = torch.load(
                f"{REFERENCE}/model_params/{task[:-4]}_qat_G.pth",
                map_location="cpu")
            out["qat_add_lo"] = np.float64(min(
                float(ck["add_residual.observer_res.min_val"]),
                float(ck["add_residual.observer_shortcut.min_val"])))
            out["qat_add_hi"] = np.float64(max(
                float(ck["add_residual.observer_res.max_val"]),
                float(ck["add_residual.observer_shortcut.max_val"])))
        elif task in ("sr_x4_qat", "sr_x2_qat"):
            # qatf="qat_" on MFLAG 5/6 loads the FLOAT checkpoint (test.py:
            # 64-69 ignores qatf when picking the checkpoint), which has no
            # quantizer buffers — load_state_dict(strict=False) leaves the
            # QuantAdd union observers at INIT state (zeros,
            # quantize_utils_pt.py:90-92), so the trace freezes
            # scale = max(eps, 0/127.5) = f32 eps. Record the init bounds
            # the trace actually read.
            out["qat_add_lo"] = np.float64(0.0)
            out["qat_add_hi"] = np.float64(0.0)
        out["fixture"] = fixture
        out["gfake"] = gfake
        for j, img in enumerate(calib_images):
            out[f"calib_img_{j}"] = img
            out[f"fake_out_{j}"] = fake_outputs[j]
        out["n_calib"] = np.int64(n_calib)

        # ---- run the reference hex exporters in the same workdir ---------
        import subprocess
        env = dict(os.environ, PYTHONPATH=REFERENCE)

        def _run_exporter(script):
            r = subprocess.run([sys.executable, os.path.join(REFERENCE, script)],
                               cwd=workdir, env=env, capture_output=True,
                               text=True)
            if r.returncode == 0:
                return
            if (task == "sr_x2_qat" and script == "output.py"
                    and "Unknown format code 'x'" in r.stderr):
                # UPSTREAM BUG exposed only by this composition: the
                # degenerate eps scales make s_1/s_4 > 2^16, so n_res is
                # NEGATIVE (-1 here). output.py:245 passes the float
                # bit_width math.log2(REQUAN_N_MAX)=5.0 to float_to_hex, so
                # the negative branch computes int_res = 32.0 + (-1) = 31.0
                # (a float) and '{:02x}'.format crashes. The write is the
                # LAST statement of the script, so every other stream (and
                # the 5 shift entries of requan_shift_n.txt) is complete on
                # disk; record the crash and keep the partial tree. Our
                # exporter writes the value the upstream arithmetic
                # intended: two's complement 31 -> "1f".
                out["upstream_output_crash"] = np.bytes_(
                    r.stderr[-500:].encode())
                return
            raise RuntimeError(f"{script} failed: {r.stderr[-2000:]}")

        for script in ("output.py", "output_end2end.py"):
            _run_exporter(script)
        # output_end2end.py overwrites output_txt/input/input.{0,5}.txt, so
        # snapshot its two files under a separate key prefix ("e2e").
        # Run order above matches the fact that output.py's input-tile files
        # for layers 1..4 survive; re-run output.py's input target by
        # re-executing output.py afterwards to restore the tile format.
        for root, _, files in os.walk(os.path.join(workdir, "output_txt")):
            for f in files:
                rel = os.path.relpath(os.path.join(root, f), workdir)
                with open(os.path.join(root, f)) as fh:
                    out["e2e_txt:" + rel] = np.bytes_(fh.read().encode())
        _run_exporter("output.py")
        for root, _, files in os.walk(os.path.join(workdir, "output_txt")):
            for f in files:
                rel = os.path.relpath(os.path.join(root, f), workdir)
                with open(os.path.join(root, f)) as fh:
                    out["txt:" + rel] = np.bytes_(fh.read().encode())

        # ---- reference strict whole-net run (sesr_forward_sim) -----------
        # quan_modules.sesr_forward_sim is the reference's hand-unrolled
        # per-MAC-saturating integer forward (quan_modules.py:101-201). It is
        # hard-coded to the 5-conv PixelShuffle(4) net, so only sr_x4 can run
        # it. It OVERWRITES output_pt dumps (input.*.pt, pe_out, shortcut),
        # so it must run after every txt/pt capture above. Its python-loop
        # conv is ~O(HW * k^2 * C * F) torch scalar ops — use a tiny fixture.
        if task == "sr_x4":
            sys.path.insert(0, REFERENCE)
            try:
                from myQL import quan_modules
            finally:
                sys.path.remove(REFERENCE)
            strict_fix = rng.random((1, in_ch, 12, 16)).astype(np.float32)
            orig_cuda = torch.Tensor.cuda
            torch.Tensor.cuda = lambda self, *a, **k: self
            try:
                with torch.no_grad():
                    strict_out = quan_modules.sesr_forward_sim(
                        torch.from_numpy(strict_fix))
            finally:
                torch.Tensor.cuda = orig_cuda
            out["strict_fixture"] = strict_fix
            out["strict_gfake"] = strict_out.numpy()

        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        np.savez_compressed(out_path, **out)
        print(f"[gen_golden] {task}: wrote {out_path} "
              f"({os.path.getsize(out_path)/1e6:.2f} MB)")
    finally:
        os.chdir(cwd)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", choices=list(TASK_MFLAG), default=None)
    ap.add_argument("--full", action="store_true",
                    help="use the reference 80x960 fixtures (large output)")
    ap.add_argument("--out-dir", default=os.path.join(REPO, "tests", "goldens"))
    args = ap.parse_args()
    tasks = [args.task] if args.task else list(TASK_MFLAG)
    for t in tasks:
        suffix = "_full" if args.full else ""
        generate(t, os.path.join(args.out_dir, f"{t}{suffix}.npz"),
                 full_fixture=args.full)
