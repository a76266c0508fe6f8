"""Command-line entry points — the reference's L6 scripts, with a real CLI.

The reference has no CLI: behaviour is selected by editing MFLAG in
define.py:1 and a qatf string inside each script (test.py:26-28). Here:

    python -m sesr_tpu eval-float --task sr_x4 [--data DIR]    # test_float.py
    python -m sesr_tpu calibrate  --task sr_x4 --out qp.npz    # test.py
    python -m sesr_tpu sim        --task sr_x4 --qparams qp.npz --dump-dir D
                                                               # sim.py
    python -m sesr_tpu export     --task sr_x4 --qparams qp.npz --out-dir D
                                                               # output*.py
    python -m sesr_tpu train      --task nrdm_3 [--qat] --steps N
                                                               # train.py
    python -m sesr_tpu bench                                    # bench.py

Data: --data points at a Set5/Set14-style GTmod12 dir (SR) or a DIV2K-RAW
style raw dir (NR/DM/NRDM); without it a procedural synthetic set is used
(the reference's datasets are absolute paths on its author's machine and do
not ship — self_dataset.py:108,212).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def _save_png(y_hwc: np.ndarray, path: str) -> None:
    """Write an HWC (or HW1) float [0,1] output as an 8-bit PNG — the
    clip/round convention shared by training previews and infer --save-dir
    (reference train.py:80-86 uses the same 255-scale rounding)."""
    from PIL import Image
    img = np.clip(y_hwc, 0.0, 1.0)
    if img.shape[-1] == 1:
        img = img[:, :, 0]
    Image.fromarray((img * 255.0 + 0.5).astype(np.uint8)).save(path)


def _dataset(task, args):
    from sesr_tpu.data.datasets import (SRFolderDataset, RawBayerDataset,
                                        SyntheticDataset, RealImageDataset)
    if args.data == "real":
        # offline real-photo crops through the task degradation
        # (data/datasets.py builtin_real_images)
        return RealImageDataset(task, n=args.n_images)
    if args.data:
        if task in ("sr_x4", "sr_x2"):
            return SRFolderDataset(args.data, scale=4 if task == "sr_x4" else 2)
        return RawBayerDataset(args.data)
    return SyntheticDataset(task, n=args.n_images)


def _load_params(task, args):
    from sesr_tpu.io.torch_import import load_reference_checkpoint
    return load_reference_checkpoint(task, path=args.checkpoint or None)


def cmd_eval_float(args):
    import jax.numpy as jnp
    from sesr_tpu.config import spec_for_task
    from sesr_tpu.models.sesr import forward_float
    from sesr_tpu.metrics import evaluate_pair

    spec = spec_for_task(args.task)
    params = _load_params(args.task, args)
    tot_p = tot_s = n = 0
    for inp, gt, *_ in _dataset(args.task, args):
        y = np.asarray(forward_float(spec, params, jnp.asarray(inp)))
        p, s = evaluate_pair(args.task, y[0], gt[0], inp[0])
        print(f"psnr={p:.4f} ssim={s:.4f}")
        tot_p, tot_s, n = tot_p + p, tot_s + s, n + 1
    print(f"{args.task} mean psnr: {tot_p/n:.4f}  ssim: {tot_s/n:.4f}")


def cmd_calibrate(args):
    import warnings
    import jax.numpy as jnp
    from sesr_tpu.config import spec_for_task
    from sesr_tpu.quant.calibrate import (guarded_calibrate,
                                          fake_quant_forward,
                                          ObserverRegressionWarning)
    from sesr_tpu.metrics import evaluate_pair

    spec = spec_for_task(args.task)
    params = _load_params(args.task, args)
    data = list(_dataset(args.task, args))
    extra = {}
    if getattr(args, "weight_rounding", "nearest") == "adaround":
        # AdaRound (quant/adaround.py): phase-1 nearest calibration drives
        # the per-layer rounding optimization; the guarded final
        # calibration (and its minmax control arm) then both run at the
        # optimized w_int, so the observer comparison stays fair
        from sesr_tpu.quant.calibrate import calibrate as _plain_calibrate
        from sesr_tpu.quant.adaround import adaround_weights
        images = [d[0] for d in data]
        qp0 = _plain_calibrate(spec, params, images, observer=args.observer)
        extra["w_int_override"] = adaround_weights(
            spec, params, qp0, images, steps=args.adaround_steps)
    # observer guardrail (round-3 ablation: KL silently loses ~12 dB on the
    # raw-domain tasks): a >1 dB ground-truth-PSNR regression vs minmax is
    # an error unless --force acknowledges it
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always", ObserverRegressionWarning)
        qp = guarded_calibrate(spec, params, data, args.task,
                               observer=args.observer, **extra)
    for w in caught:
        if issubclass(w.category, ObserverRegressionWarning):
            if args.force:
                print(f"WARNING (forced): {w.message}", file=sys.stderr)
            else:
                raise SystemExit(f"calibrate: {w.message}\n"
                                 f"(re-run with --force to keep this "
                                 f"observer anyway)")
        else:
            warnings.warn_explicit(w.message, w.category, w.filename,
                                   w.lineno)
    qp.save(args.out)
    print(f"saved {args.out}")
    if not args.no_eval:
        tot_p = tot_s = n = 0
        for inp, gt, *_ in data:
            y = np.asarray(fake_quant_forward(spec, params, jnp.asarray(inp)))
            p, s = evaluate_pair(args.task, y[0], gt[0], inp[0])
            tot_p, tot_s, n = tot_p + p, tot_s + s, n + 1
        print(f"{args.task} fake-quant mean psnr: {tot_p/n:.4f}  ssim: {tot_s/n:.4f}")
    for d in range(spec.num_convs + 1):
        print(f"domain {d}: scale={qp.a_scale[d]:.6g} zero={qp.a_zero[d]}")


def cmd_sim(args):
    import jax.numpy as jnp
    from sesr_tpu.config import spec_for_task
    from sesr_tpu.quant.params import QuantParams
    from sesr_tpu.quant.integer import integer_forward
    from sesr_tpu.data.datasets import load_reference_fixture

    spec = spec_for_task(args.task)
    qp = QuantParams.load(args.qparams)
    if args.fixture:
        x = np.load(args.fixture)
    else:
        x = load_reference_fixture(args.task)
    y, dumps = integer_forward(spec, qp, jnp.asarray(x), collect_dumps=True,
                               corrected=args.corrected)
    print(f"sim: input {x.shape} -> output {y.shape}")
    print("overflow counts per layer:", [int(v) for v in dumps["overflow_counts"]])
    print(f"QUAN_BIT: {qp.hw.quan_bits}\nBIAS_BIT: {qp.hw.bias_bits}\n"
          f"PE_ACC_BIT: {qp.hw.pe_acc_bits}\nPE_ADD_BIT: {qp.hw.pe_add_bits}\n"
          f"REQUAN_BIT: {qp.hw.requant_bits}\nREQUAN_N_MAX: {qp.hw.requant_n_max}")
    if args.dump_dir:
        os.makedirs(args.dump_dir, exist_ok=True)
        np.savez_compressed(os.path.join(args.dump_dir, "dumps.npz"),
                            y=np.asarray(y),
                            **{k: np.asarray(v) for k, v in dumps.items()})
        print(f"dumps -> {args.dump_dir}/dumps.npz")


def cmd_export(args):
    import jax.numpy as jnp
    from sesr_tpu.config import spec_for_task
    from sesr_tpu.quant.params import QuantParams
    from sesr_tpu.quant.integer import integer_forward
    from sesr_tpu.export.vectors import export_all
    from sesr_tpu.data.datasets import load_reference_fixture

    spec = spec_for_task(args.task)
    qp = QuantParams.load(args.qparams)
    x = np.load(args.fixture) if args.fixture else load_reference_fixture(args.task)
    _, dumps = integer_forward(spec, qp, jnp.asarray(x), collect_dumps=True)
    export_all(qp, dumps, list(spec.kernel_sizes), args.out_dir)
    print(f"hex vectors -> {args.out_dir}/")


def cmd_train(args):
    import jax
    import jax.numpy as jnp
    import optax
    from sesr_tpu.config import spec_for_task
    from sesr_tpu.models.expanded import init_expanded, collapse_expanded
    from sesr_tpu.quant.qat import QATConfig, prepare, make_train_step
    from sesr_tpu.io.checkpoint import save_training_state, load_training_state

    spec = spec_for_task(args.task)
    if getattr(args, "init_checkpoint", None):
        # the reference's actual training recipe is a warm-start fine-tune
        # from a float checkpoint (train.py:51-52 loads *_raw_G.pth into
        # the uncollapsed model); load the torch state dict into
        # ExpandedParams (expand/squeeze shapes required)
        from sesr_tpu.config import REFERENCE_CHECKPOINTS
        from sesr_tpu.io.torch_import import _to_numpy_state
        from sesr_tpu.models.expanded import expanded_from_state_dict
        ckpt = args.init_checkpoint
        if ckpt == "reference":
            ckpt = ("/root/reference/model_params/"
                    + REFERENCE_CHECKPOINTS[args.task])
        try:
            params = expanded_from_state_dict(spec, _to_numpy_state(ckpt))
        except KeyError as e:
            raise SystemExit(
                f"--init-checkpoint {ckpt}: missing {e} — warm start needs "
                "an UNCOLLAPSED (expand/squeeze) float checkpoint like the "
                "reference's *_raw_G.pth / *_G.pth files")
        print(f"warm start from {ckpt}")
    else:
        params = init_expanded(spec, jax.random.PRNGKey(args.seed))
    cfg = QATConfig() if args.qat else None
    qstate = prepare(spec, cfg or QATConfig())
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)
    start = 0
    if args.resume and os.path.exists(args.resume):
        params, qstate, opt_state, start = load_training_state(
            args.resume, params, qstate, opt_state)
        print(f"resumed from {args.resume} at step {start}")
    step = jax.jit(make_train_step(spec, cfg, opt))

    if args.data and args.task in ("nr", "dm", "nrdm_3", "nrdm_6"):
        # raw training tree: 3-tuple loader with the variance channel
        from sesr_tpu.data.datasets import TrainBayerDataset
        data = list(TrainBayerDataset(args.data))
    else:
        data = list(_dataset(args.task, args))
    def preview(it):
        # training observability: dump the current model's output on the
        # first training sample as a PNG (reference train.py:80-86, its
        # only training-time observability — every 10 epochs there)
        if not args.preview_dir or args.preview_every <= 0:
            return
        from sesr_tpu.models.expanded import forward_expanded
        os.makedirs(args.preview_dir, exist_ok=True)
        y = np.asarray(forward_expanded(spec, params,
                                        jnp.asarray(data[0][0])))[0]
        if spec.global_input_skip:
            # sr_x2 predicts a residual; preview the image, not the residual
            y = y + np.repeat(np.repeat(data[0][0][0], spec.scaling_factor,
                                        axis=0), spec.scaling_factor, axis=1)
        _save_png(y, os.path.join(args.preview_dir, f"preview_{it:06d}.png"))

    t0 = time.time()
    for it in range(start, start + args.steps):
        # loaders may yield (inp, gt) or (inp, gt, variance); training
        # discards the variance exactly like the reference (train.py:66)
        inp, gt = data[it % len(data)][:2]
        params, qstate, opt_state, loss = step(
            params, qstate, opt_state, (jnp.asarray(inp), jnp.asarray(gt)))
        if (it - start) % max(1, args.steps // 10) == 0:
            print(f"step {it}: loss {float(loss):.6f}")
        if args.preview_every > 0 and (it + 1) % args.preview_every == 0:
            preview(it + 1)
        if args.resume and (it + 1) % args.save_every == 0:
            save_training_state(args.resume, params, qstate, opt_state, it + 1)
    if args.resume:
        save_training_state(args.resume, params, qstate, opt_state,
                            start + args.steps)
    print(f"{args.steps} steps in {time.time()-t0:.1f}s")
    if args.out:
        if args.qat:
            # QAT-trained weights must collapse THROUGH the fake-quant
            # delta response (the reference's own qat deployment
            # composition, quantize_utils_cuda.py:801-834 -> collapse):
            # the float analytic contraction forfeits the gap elimination
            # QAT buys (~0.4 dB on sr_x4 — tools/qat_value.py, pinned in
            # tests/test_qat.py)
            from sesr_tpu.models.expanded import collapse_expanded_qat
            collapsed = collapse_expanded_qat(spec, params)
        else:
            collapsed = collapse_expanded(spec, params)
        np.savez(args.out,
                 **{f"w_{i}": np.asarray(w) for i, w in enumerate(collapsed.weights)},
                 **{f"b_{i}": np.asarray(b) for i, b in enumerate(collapsed.biases)})
        print(f"collapsed checkpoint -> {args.out}"
              + (" (fake-quant-delta collapse)" if args.qat else ""))


def cmd_infer(args):
    """Deployment inference: the channel-packed certified datapath (the
    bench.py configuration), with optional PSNR scoring against a dataset.
    Artifacts whose certificate refuses full fast mode (saturating tasks:
    nr, nrdm_6) fall back to the layer-hybrid lowering automatically."""
    import jax.numpy as jnp
    from sesr_tpu.config import spec_for_task
    from sesr_tpu.metrics import evaluate_pair
    from sesr_tpu.ops.packed import select_packed_forward
    from sesr_tpu.quant.params import QuantParams

    from sesr_tpu.ops.packed import default_cells

    spec = spec_for_task(args.task)
    qp = QuantParams.load(args.qparams)
    mode, fwd = select_packed_forward(qp)
    # the fast/hybrid lowerings are belt-and-braces verified on exactly
    # the geometry set the ARTIFACT's certification executed (stamped as
    # qp.cert_cells — an artifact stamped before a geometry entered
    # CERTIFIED_CELLS must not silently serve it); the PE-exact lowering
    # needs no certificate and accepts any cells
    cert_set = qp.cert_cells or ()
    if args.cells is None:
        s = default_cells(mode)       # measured per-mode winners
        if mode != "pe-exact" and cert_set and s not in cert_set:
            s = cert_set[0]           # older artifact: first certified geom
        args.cells = "x".join(map(str, s))
    else:
        s = tuple(int(v) for v in args.cells.split("x"))
    if mode != "pe-exact" and s not in cert_set:
        raise SystemExit(
            f"--cells {args.cells} is outside this artifact's certified "
            f"geometry set {['x'.join(map(str, c)) for c in cert_set]} for "
            f"the '{mode}' lowering; use one of those, re-certify "
            f"(python -m sesr_tpu certify --out), or use a PE-exact "
            f"artifact")
    if args.out_dtype is None:
        # int8 is the output contract where it is free: PNG output is 8-bit
        # regardless (and the reference's own output domain is int8,
        # test.py:205-217), so --save-dir skips the full-resolution f32
        # HBM write by default; array consumers keep f32 unless asked
        args.out_dtype = "int8" if args.save_dir else "f32"
    data = list(_dataset(args.task, args))
    zero_L = float(qp.a_zero[spec.num_convs])
    scale_L = float(qp.a_scale[spec.num_convs])
    # --audit N: every Nth dispatch shadow-runs the sound PE-exact
    # interpreter with the overflow counters (quant/audit.py); an 18-bit
    # event on an empirically-stamped layer (the OOD case the stamps
    # cannot cover) warns and degrades the rest of the run to the
    # PE-exact lowering — the reference's always-on sentinel
    # (quan_func.py:357-361), productized for a datapath that
    # structurally lacks it
    audit_trusted = ()
    if args.audit > 0:
        from sesr_tpu.quant.audit import empirically_trusted_layers
        audit_trusted = empirically_trusted_layers(qp, mode)
        if not audit_trusted:
            print(f"audit: '{mode}' serving of this artifact carries no "
                  "empirical trust (statically proven or PE-exact) — "
                  "nothing to audit", file=sys.stderr)
    n_audited = n_viol = 0
    tot_p = tot_s = n = 0
    i = dispatch = 0
    while i < len(data):
        # --batch B: per-chip frame batching, the THROUGHPUT serving mode
        # (r3i/r4: batch-8 beats single-frame at the (1,8) default); equal
        # shapes batch together, a shape change flushes early
        batch = [data[i]]
        while (len(batch) < args.batch and i + len(batch) < len(data)
               and data[i + len(batch)][0].shape == batch[0][0].shape):
            batch.append(data[i + len(batch)])
        x = jnp.asarray(np.concatenate([b[0] for b in batch], axis=0))
        y = np.asarray(fwd(spec, qp, x, s=s, out_dtype=args.out_dtype))
        if audit_trusted and dispatch % args.audit == 0:
            from sesr_tpu.quant.audit import audit_frame
            res = audit_frame(spec, qp, x,
                              y_served=y if args.out_dtype == "f32" else None,
                              mode=mode, warn=False)
            n_audited += 1
            if not res.ok:
                n_viol += 1
                print(f"audit: OOD saturation on dispatch {dispatch} — "
                      f"empirically-stamped layer(s) {list(res.violations)} "
                      f"fired 18-bit events (counts {res.ovf18.tolist()}); "
                      f"degrading to pe-exact serving", file=sys.stderr)
                from sesr_tpu.ops.packed import packed_exact_forward

                def fwd(spec, qp, x, s=(2, 4), out_dtype="f32"):  # noqa: F811
                    return packed_exact_forward(spec, qp, x, s,
                                                corrected=True,
                                                out_dtype=out_dtype)
                mode = "pe-exact"
                audit_trusted = ()
                y = np.asarray(fwd(spec, qp, x, s=s,
                                   out_dtype=args.out_dtype))
        if args.out_dtype == "int8":
            # the int8 output contract: the raw quantized image; the
            # scoring/PNG consumer dequantizes with (zero_L, scale_L)
            y = (y.astype(np.float32) - zero_L) * scale_L
        for j, (inp, gt, *_) in enumerate(batch):
            p, ss = evaluate_pair(args.task, y[j], gt[0], inp[0])
            if args.save_dir:
                os.makedirs(args.save_dir, exist_ok=True)
                _save_png(y[j], os.path.join(args.save_dir,
                                             f"out_{n:04d}.png"))
            tot_p, tot_s, n = tot_p + p, tot_s + ss, n + 1
        i += len(batch)
        dispatch += 1
    print(f"{args.task} packed({args.cells}, {mode}"
          f"{', ' + args.out_dtype if args.out_dtype != 'f32' else ''}"
          f"{f', batch {args.batch}' if args.batch > 1 else ''}) "
          f"mean psnr: {tot_p/n:.4f}  ssim: {tot_s/n:.4f}  ({n} images)")
    if args.audit > 0:
        print(f"audit: {n_audited} dispatch(es) audited, {n_viol} OOD "
              f"saturation violation(s)"
              + (" — stream degraded to pe-exact" if n_viol else ""))
    if args.save_dir:
        print(f"outputs -> {args.save_dir}/")


def cmd_certify(args):
    """Re-run the fast-mode certification of an artifact on a chosen data
    source and print the per-layer stamps (S = statically proven for ALL
    inputs, F = empirically fast-safe on this set, x = saturates)."""
    from sesr_tpu.config import spec_for_task
    from sesr_tpu.quant.certify import (certify_fast, static_layer_stamps,
                                        static_shortcut_safe)
    from sesr_tpu.quant.params import QuantParams

    spec = spec_for_task(args.task)
    qp = QuantParams.load(args.qparams)
    images = [inp for inp, *_ in _dataset(args.task, args)]
    if not images and not (all(static_layer_stamps(qp))
                           and static_shortcut_safe(qp)):
        # certify_fast itself refuses zero-evidence empirical stamps; fail
        # loudly here instead of silently emitting a refused artifact
        raise SystemExit(
            "certify: zero images can only certify a fully STATIC artifact "
            "(every layer and the int16 shortcut store proven by interval "
            "arithmetic); this artifact needs empirical evidence — use "
            "--n-images > 0 or point --data at a calibration set")
    qp2 = certify_fast(spec, qp, images)
    print(f"{args.task}: grade={qp2.cert_grade} layers={qp2.cert_stamps} "
          f"over {qp2.fast_cert_images} images")
    static_n = sum(qp2.fast_cert_static)
    emp_n = sum(f and not s
                for f, s in zip(qp2.fast_cert_layers, qp2.fast_cert_static))
    print(f"  {static_n}/{qp2.num_convs} layers statically proven "
          f"(input-independent interval bound); "
          f"{emp_n} empirically safe; "
          f"{qp2.num_convs - sum(qp2.fast_cert_layers)} saturate "
          f"(PE-exact lowering only)")
    print(f"  int16 shortcut store: "
          f"{'statically proven wrap-free' if qp2.shortcut_static else 'empirical bound only'}")
    if args.out:
        qp2.save(args.out)
        print(f"stamped artifact -> {args.out}")


def cmd_hist(args):
    from sesr_tpu.config import spec_for_task
    from sesr_tpu.quant.observers import dump_histograms

    spec = spec_for_task(args.task)
    params = _load_params(args.task, args)
    data = list(_dataset(args.task, args))
    files = dump_histograms(spec, params, [d[0] for d in data], args.out)
    print(f"wrote {len(files)} histogram PNGs under {args.out}")


def cmd_profile(args):
    """Compile a deployment/interpreter path and print XLA's cost analysis
    (FLOPs, bytes accessed, peak memory) — the compiler-native replacement
    for the reference's nonexistent profiling (SURVEY §5: torch.fx was its
    only 'tracing'; jaxpr/XLA is ours, and the numbers here are what the
    roofline analyses in BASELINE.md are built from)."""
    import jax
    import jax.numpy as jnp
    from sesr_tpu.config import spec_for_task
    from sesr_tpu.models.sesr import forward_float
    from sesr_tpu.ops.packed import select_packed_forward
    from sesr_tpu.quant.integer import integer_forward
    from sesr_tpu.quant.params import QuantParams

    spec = spec_for_task(args.task)
    shape = jax.ShapeDtypeStruct((1, args.height, args.width,
                                  spec.in_channels), jnp.float32)
    if args.path in ("deployment", "interpreter") and not args.qparams:
        raise SystemExit(f"--path {args.path} requires --qparams "
                         "(e.g. artifacts/qparams_<task>.npz)")
    if args.path == "deployment":
        from sesr_tpu.ops.packed import default_cells
        qp = QuantParams.load(args.qparams)
        mode, fwd = select_packed_forward(qp)
        if args.cells is None:
            args.cells = "x".join(map(str, default_cells(mode)))
        s = tuple(int(v) for v in args.cells.split("x"))
        fn = lambda x: fwd(spec, qp, x, s=s)                # noqa: E731
        label = f"deployment ({mode}, cells {args.cells})"
    elif args.path == "interpreter":
        qp = QuantParams.load(args.qparams)
        fn = lambda x: integer_forward(spec, qp, x,          # noqa: E731
                                       corrected=True)[0]
        label = "integer interpreter (corrected)"
    else:
        params = _load_params(args.task, args)
        fn = lambda x: forward_float(spec, params, x)       # noqa: E731
        label = "float"
    compiled = jax.jit(fn).lower(shape).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    bytes_acc = float(ca.get("bytes accessed", 0.0))
    px = args.height * args.width
    print(f"{args.task} {label} @ {args.height}x{args.width}:")
    print(f"  flops/frame:          {flops:.3e}  ({flops / px:.0f}/px)")
    print(f"  bytes accessed/frame: {bytes_acc:.3e}  "
          f"(arithmetic intensity {flops / max(bytes_acc, 1):.1f})")
    try:
        mem = compiled.memory_analysis()
        print(f"  peak temp allocation: "
              f"{mem.temp_size_in_bytes / 1e6:.1f} MB; "
              f"argument {mem.argument_size_in_bytes / 1e6:.1f} MB; "
              f"output {mem.output_size_in_bytes / 1e6:.1f} MB")
    except Exception:
        pass


def cmd_bench(args):
    import subprocess
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    extra = (["--all-paths"] if args.all_paths else []) \
        + (["--per-task"] if args.per_task else [])
    subprocess.run([sys.executable, os.path.join(repo, "bench.py")] + extra,
                   check=True)


def main(argv=None):
    ap = argparse.ArgumentParser(prog="sesr_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    def common(p):
        p.add_argument("--task", required=True,
                       choices=["nr", "dm", "nrdm_3", "nrdm_6", "sr_x4", "sr_x2"])
        p.add_argument("--data", default=None,
                       help="dataset dir (GTmod12/LRbicx or .raw tree), "
                            "'real' for offline real-photo crops, or omit "
                            "for the synthetic pipeline")
        p.add_argument("--checkpoint", default=None)
        p.add_argument("--n-images", type=int, default=4)

    p = sub.add_parser("eval-float", help="FP32 PSNR/SSIM baseline (test_float.py)")
    common(p)
    p.set_defaults(fn=cmd_eval_float)

    p = sub.add_parser("calibrate", help="PTQ calibration + fake-quant eval (test.py)")
    common(p)
    p.add_argument("--out", required=True)
    p.add_argument("--observer", default="minmax",
                   choices=["minmax", "percentile", "kl"])
    p.add_argument("--force", action="store_true",
                   help="keep the chosen observer even when it regresses "
                        ">1 dB vs minmax on the calibration set (the "
                        "guardrail for KL on raw-domain tasks)")
    p.add_argument("--no-eval", action="store_true")
    p.add_argument("--weight-rounding", default="nearest",
                   choices=["nearest", "adaround"],
                   help="adaround = adaptive per-weight rounding "
                        "(quant/adaround.py; +0.17..0.33 dB on sr_x4, the "
                        "shipped default there via tools/make_qparams.py — "
                        "value-studied per task, see BASELINE.md)")
    p.add_argument("--adaround-steps", type=int, default=800)
    p.set_defaults(fn=cmd_calibrate)

    p = sub.add_parser("sim", help="bit-exact integer sim (sim.py)")
    common(p)
    p.add_argument("--qparams", required=True)
    p.add_argument("--fixture", default=None, help=".npy NHWC input")
    p.add_argument("--dump-dir", default=None)
    p.add_argument("--corrected", action="store_true",
                   help="deployment-quality datapath (fixes the reference's "
                        "16-bit zero-correction truncation; not RTL-parity)")
    p.set_defaults(fn=cmd_sim)

    p = sub.add_parser("export", help="RTL hex vectors (output.py / output_end2end.py)")
    common(p)
    p.add_argument("--qparams", required=True)
    p.add_argument("--fixture", default=None)
    p.add_argument("--out-dir", required=True)
    p.set_defaults(fn=cmd_export)

    p = sub.add_parser("train", help="float / QAT training (train.py)")
    common(p)
    p.add_argument("--qat", action="store_true")
    p.add_argument("--init-checkpoint", default=None,
                   help="warm-start fine-tune from a reference .pth "
                        "(uncollapsed expand/squeeze shapes; 'reference' = "
                        "the task's shipped checkpoint — train.py:51-52)")
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--lr", type=float, default=1e-5)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out", default=None)
    p.add_argument("--resume", default=None,
                   help="training-state file to checkpoint to / resume from")
    p.add_argument("--save-every", type=int, default=50)
    p.add_argument("--preview-dir", default=None,
                   help="dump progress PNGs here (train.py:80-86 analog)")
    p.add_argument("--preview-every", type=int, default=0,
                   help="steps between preview PNGs (0 = off)")
    p.set_defaults(fn=cmd_train)

    p = sub.add_parser("infer", help="deployment inference on the certified "
                                     "channel-packed datapath")
    common(p)
    p.add_argument("--qparams", required=True)
    p.add_argument("--cells", default=None,
                   help="packing cell size s_h x s_w (default: 1x8 for the "
                        "certified fast/hybrid lowerings, 2x4 for pe-exact "
                        "— the measured winners, ops/packed.py)")
    p.add_argument("--out-dtype", default=None, choices=["f32", "int8"],
                   help="int8 = the raw quantized image contract (skips "
                        "the full-resolution f32 write; +12-29%% at "
                        "1080p/4K); scoring dequantizes client-side. "
                        "Default: int8 when --save-dir is set (PNGs are "
                        "8-bit regardless), f32 otherwise")
    p.add_argument("--batch", type=int, default=1,
                   help="frames per dispatch — the throughput serving "
                        "mode (batch 8 measured above single-frame rate "
                        "at the (1,8) default); batch 1 = latency mode")
    p.add_argument("--save-dir", default=None,
                   help="write the model outputs as PNGs here")
    p.add_argument("--audit", type=int, default=0,
                   help="shadow-audit every Nth dispatch against the sound "
                        "PE-exact path (overflow counters): detects OOD "
                        "inputs that void empirical certificate stamps and "
                        "degrades serving to pe-exact (0 = off)")
    p.set_defaults(fn=cmd_infer)

    p = sub.add_parser("certify", help="fast-mode certification stamps "
                                       "(quant/certify.py)")
    common(p)
    p.add_argument("--qparams", required=True)
    p.add_argument("--out", default=None,
                   help="save the re-stamped artifact here")
    p.set_defaults(fn=cmd_certify)

    p = sub.add_parser("hist", help="weight/activation histogram PNGs "
                                    "(define.py:34-36 debug dumps)")
    common(p)
    p.add_argument("--out", default="output_png")
    p.set_defaults(fn=cmd_hist)

    p = sub.add_parser("profile", help="XLA cost analysis of a compiled "
                                       "path (FLOPs, bytes, peak memory)")
    common(p)
    p.add_argument("--qparams", default=None)
    p.add_argument("--path", default="deployment",
                   choices=["deployment", "interpreter", "float"])
    p.add_argument("--cells", default=None,
                   help="cell geometry (default: the lowering mode's "
                        "measured winner, ops/packed.py default_cells)")
    p.add_argument("--height", type=int, default=540)
    p.add_argument("--width", type=int, default=960)
    p.set_defaults(fn=cmd_profile)

    p = sub.add_parser("bench", help="single-chip throughput benchmark")
    p.add_argument("--all-paths", action="store_true",
                   help="also measure the alternative lowerings "
                        "(stderr rows)")
    p.add_argument("--per-task", action="store_true",
                   help="also measure every task through its "
                        "certificate-selected lowering (stderr rows)")
    p.set_defaults(fn=cmd_bench)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
