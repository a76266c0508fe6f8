"""Measure the REFERENCE pipeline's throughput on this host CPU.

Runs the reference's own exe_mode=1 fx-instrumented integer sim (the
bit-exact INT8 path, sim.py:81-114) end-to-end on synthetic inputs and
reports pixels/second. The resulting numbers are the `vs_baseline`
denominators hardcoded in bench.py (re-run this tool to refresh them).

Usage: python tools/bench_reference.py [--task sr_x2|sr_x4|nrdm_3] [--hw 80x960]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
from tools.gen_golden import (_install_define_stub, _fx_calibration_model,
                              _fx_sim_model, _finalize_scales)

REFERENCE = "/root/reference"
TASK_MFLAG = {"nrdm_3": 3, "sr_x4": 5, "sr_x2": 6}


def build(task: str):
    import torch
    mflag = TASK_MFLAG[task]
    _install_define_stub(mflag)
    sys.path.insert(0, REFERENCE)
    if task == "sr_x4":
        from models import sesr, sesr_sim
        calib_m, sim_m = sesr.sesr(), sesr_sim.sesr()
        ckpt = torch.load(f"{REFERENCE}/model_params/x4sesr.pth", map_location="cpu")
    elif task == "sr_x2":
        from models import sesr_arch, sesr_arch_sim
        calib_m, sim_m = sesr_arch.sesr(), sesr_arch_sim.sesr()
        ckpt = torch.load(f"{REFERENCE}/model_params/x2sesr.pth.tar",
                          map_location="cpu", weights_only=False)["state_dict"]
    else:
        from models import nrdm_3, nrdm_3_sim
        calib_m, sim_m = nrdm_3.nr(), nrdm_3_sim.nr()
        ckpt = torch.load(f"{REFERENCE}/model_params/nrdm_3_raw_G.pth",
                          map_location="cpu")
    for m in (calib_m, sim_m):
        m.float()
        m.load_state_dict(ckpt, strict=False)
        m.collapse()
    return calib_m, sim_m, mflag


def main():
    import torch
    ap = argparse.ArgumentParser()
    ap.add_argument("--task", default="sr_x2", choices=list(TASK_MFLAG))
    ap.add_argument("--hw", default="80x960")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--no-dumps", action="store_true",
                    help="turn the reference's export flags off (fastest case)")
    args = ap.parse_args()
    h, w = (int(v) for v in args.hw.split("x"))

    calib_m, sim_m, mflag = build(args.task)
    if args.no_dumps:
        import myQL.quan_func as qf
        for flag in ["WEIGHT_W_FLG", "INPUT_W_FLG", "BIAS_W_FLG", "BIAS_QUAN_W_FLG",
                     "OUTPUT_PE_W_FLG", "OUTPUT_PE_ADD_W_FLG", "REQUAN_FACTOR_W_FLG"]:
            setattr(qf, flag, False)
    in_ch = 1 if args.task == "sr_x4" else 3

    workdir = tempfile.mkdtemp(prefix=f"benchref_{args.task}_")
    cwd = os.getcwd()
    os.chdir(workdir)
    try:
        rng = np.random.default_rng(0)
        fx_calib = _fx_calibration_model(calib_m, mflag)
        with torch.no_grad():
            for _ in range(2):
                fx_calib(torch.from_numpy(
                    rng.random((1, in_ch, 48, 64)).astype(np.float32)))
        _finalize_scales(5)

        fx_sim = _fx_sim_model(sim_m)
        x = torch.from_numpy(rng.random((1, in_ch, h, w)).astype(np.float32))
        with torch.no_grad():
            fx_sim(x)  # warm (also writes dump files)
            t0 = time.time()
            for _ in range(args.iters):
                fx_sim(x)
            dt = (time.time() - t0) / args.iters
        px = h * w
        print(f"reference {args.task} integer sim (torch CPU, incl. its "
              f"output_pt/ disk I/O): {dt*1e3:.0f} ms for {h}x{w} "
              f"-> {px/dt/1e6:.4f} Mpx/s")
    finally:
        os.chdir(cwd)


if __name__ == "__main__":
    main()
