"""Import reference .pth checkpoints and collapse them at load time.

The reference loads torch state dicts into live nn.Modules and then mutates
them in place via model.collapse() (test.py:64-75). Here import is a pure
function: state dict -> CollapsedParams (numpy arrays, NHWC/HWIO layouts).
Arrays stay host-side numpy — device placement happens lazily at first use, so
importing checkpoints never triggers device transfers (important: on the axon
remote backend, any device->host readback permanently degrades dispatch).
torch is used only as a deserializer on the host; nothing torch touches the
compute path.

Handles all three checkpoint flavours shipped with the reference:
- plain float checkpoints (uncollapsed expand/squeeze shapes), e.g.
  nrdm_3_raw_G.pth, x4sesr.pth
- the x2sesr.pth.tar dict with a 'state_dict' key (test.py:64-65)
- QAT checkpoints carrying extra quantizer buffers (loaded with
  strict=False upstream, test.py:72) — extra keys are ignored here.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
from sesr_tpu.config import SESRSpec, spec_for_task, REFERENCE_CHECKPOINTS
from sesr_tpu.models.blocks import collapse_block, fold_residual_identity, oihw_to_hwio
from sesr_tpu.models.sesr import CollapsedParams


def _to_numpy_state(path: str) -> Dict[str, np.ndarray]:
    import torch  # host-side deserializer only

    state = torch.load(path, map_location="cpu", weights_only=False)
    if "state_dict" in state and not any(k.endswith(".weight") for k in state):
        state = state["state_dict"]
    return {k: v.detach().cpu().numpy() for k, v in state.items()
            if hasattr(v, "detach")}


def _block_names(spec: SESRSpec):
    names = ["conv_first"]
    names += [f"residual_block.{i}" for i in range(spec.num_lblocks)]
    names += ["conv_last"]
    return names


def collapse_state_dict(spec: SESRSpec, state: Dict[str, np.ndarray]) -> CollapsedParams:
    """Collapse an (uncollapsed) reference state dict into CollapsedParams."""
    weights, biases = [], []
    for i, name in enumerate(_block_names(spec)):
        w_exp = state[f"{name}.conv_expand.weight"]
        if w_exp.ndim != 4:
            raise ValueError(f"unexpected shape for {name}: {w_exp.shape}")
        if f"{name}.conv_squeeze.weight" in state:
            w_sq = state[f"{name}.conv_squeeze.weight"]
            b_sq = state[f"{name}.conv_squeeze.bias"]
            w, b = collapse_block(w_exp, w_sq, b_sq)
        else:
            # already-collapsed checkpoint: conv_expand holds the final conv
            w = w_exp.astype(np.float32)
            b = state[f"{name}.conv_expand.bias"].astype(np.float32)
        is_residual_block = 0 < i < spec.num_convs - 1
        if is_residual_block and f"{name}.conv_squeeze.weight" in state:
            w = fold_residual_identity(w)
        weights.append(np.ascontiguousarray(oihw_to_hwio(w)))
        biases.append(np.asarray(b))
    return CollapsedParams(weights, biases)


# --------------------------------------------------------------------------
# the qatf="qat_" composition (reference test.py:27-28,61-75 / sim.py):
# prepare() swaps every block conv for QuantConv2d BEFORE the checkpoint
# load, and model.collapse() then evaluates the delta-basis response of the
# fake-quant conv chain. Because `num_flag` on the observers is a plain
# Python attribute (NOT a buffer), load_state_dict does not restore it, so
# the first observation during collapse OVERWRITES the loaded observer state
# with the delta/weight statistics themselves — the collapse is
# self-calibrating and only the checkpoint's WEIGHTS matter. Verified by
# executing the reference composition (tools/gen_golden.py nr_qat).

_F32EPS = np.float32(np.finfo(np.float32).eps)


def _sym_fq_np(x: np.ndarray, bits: int, is_weight: bool) -> np.ndarray:
    """SymmetricQuantizer.forward in train mode with a fresh layer-level
    observer (quantize_utils_cuda.py:220-246, 298-311): the observer range
    IS the tensor's own min/max. float32 op-for-op as torch."""
    x = np.asarray(x, np.float32)
    if is_weight:
        qmin, qmax = -((1 << (bits - 1)) - 1), (1 << (bits - 1)) - 1
    else:
        qmin, qmax = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
    quant_range = np.float32((qmax - qmin) / 2.0)
    float_range = np.float32(max(abs(np.float32(x.min())),
                                 abs(np.float32(x.max()))))
    scale = np.maximum(np.float32(float_range / quant_range), _F32EPS)
    t = (x / scale).astype(np.float32)
    q = np.sign(t) * np.floor(np.abs(t) + np.float32(0.5))
    q = np.clip(q, qmin, qmax).astype(np.float32)
    return (q * scale).astype(np.float32)


def qat_collapse_block(w_exp: np.ndarray, w_sq: np.ndarray,
                       b_sq: np.ndarray) -> tuple:
    """Delta-basis collapse of QuantConv2d(expand) -> QuantConv2d(squeeze)
    (model_utils_pt.py:29-66 executed on prepared modules in train mode).

    The expand conv sees the padded delta basis (values {0, 1}); its
    activation fake-quant turns the 1 into fq(1) = 127/127.5, and the conv
    of a delta with kernel K is the flipped kernel — each output element is
    ONE float product, so the response is exact without modeling the conv's
    accumulation. The squeeze conv fake-quants that intermediate and its
    own weights, then contracts the 256-channel axis (f32; torch's sgemm
    order differs in the last ulp — parity is tolerance-tested in
    tests/test_models_float.py::test_qat_collapse_parity_nrdm_6, and the composed
    pipeline byte-exactly by the *_qat goldens in
    tests/test_integer_bitexact.py). Returns (kernel OIHW, bias)."""
    w_exp = np.asarray(w_exp, np.float32)       # (tmp, in, k, k)
    w_sq = np.asarray(w_sq, np.float32)         # (out, tmp, 1, 1)
    b_sq = np.asarray(b_sq, np.float32)
    fq_one = _sym_fq_np(np.array([0.0, 1.0], np.float32), 8, False)[1]
    fq_we = _sym_fq_np(w_exp, 8, True)
    # conv_expand(fq(delta)): inter[n, t, y, x] = fq1 * fq_we[t, n, 2p-y, 2p-x]
    inter = (np.float32(fq_one)
             * fq_we[:, :, ::-1, ::-1]).transpose(1, 0, 2, 3)  # (in, tmp, k, k)
    inter_fq = _sym_fq_np(inter, 8, False)      # squeeze's activation fq
    fq_ws = _sym_fq_np(w_sq, 8, True)[:, :, 0, 0]              # (out, tmp)
    out = np.einsum("ot,ntyx->noyx", fq_ws, inter_fq,
                    dtype=np.float32).astype(np.float32)
    # the reference's conv ADDS the bias and collapse() then subtracts it
    # (model_utils_pt.py:50-52); replicate both f32 roundings — (x+b)-b
    # is NOT exactly x in float32 when |b| >> |x|
    out_b = (out + b_sq[None, :, None, None]).astype(np.float32)
    kernel = (out_b - b_sq[None, :, None, None]).astype(np.float32)
    kernel = kernel[:, :, ::-1, ::-1]           # torch.flip([2, 3])
    kernel = kernel.transpose(1, 0, 2, 3)       # permute([1, 0, 2, 3])
    return np.ascontiguousarray(kernel), b_sq.copy()


def collapse_state_dict_qat(spec: SESRSpec,
                            state: Dict[str, np.ndarray]) -> CollapsedParams:
    """collapse_state_dict for the qatf="qat_" composition: every block is
    collapsed through the fake-quant delta response instead of the exact
    analytic contraction."""
    weights, biases = [], []
    for i, name in enumerate(_block_names(spec)):
        w, b = qat_collapse_block(state[f"{name}.conv_expand.weight"],
                                  state[f"{name}.conv_squeeze.weight"],
                                  state[f"{name}.conv_squeeze.bias"])
        if 0 < i < spec.num_convs - 1:
            w = fold_residual_identity(w)
        weights.append(np.ascontiguousarray(oihw_to_hwio(w)))
        biases.append(np.asarray(b))
    return CollapsedParams(weights, biases)


# qatf="qat_" checkpoint selection (test.py:29-52,64-69): mflag 1/2/4 swap
# in the *_qat_G.pth weights; mflag 5/6 still load the FLOAT checkpoints
# (the qatf string never reaches their paths — upstream quirk); mflag 3
# composes "nrdm_3_raw_qat_G.pth", which does not exist in the shipped
# model_params — mapped here to the shipped nrdm_3_qat_G.pth.
QAT_CHECKPOINTS = {
    "nr": "nr_qat_G.pth",
    "dm": "dm_qat_G.pth",
    "nrdm_3": "nrdm_3_qat_G.pth",
    "nrdm_6": "nrdm_6_qat_G.pth",
    "sr_x4": None,
    "sr_x2": None,
}


def load_qat_add_bounds(task: str,
                        reference_root: str = "/root/reference"):
    """(union_lo, union_hi) of the QAT checkpoint's add_residual observers —
    the values the fx trace freezes into the QuantAdd scale (see
    quant/qat.py quant_add_frozen).

    For sr_x4/sr_x2 the composition loads the FLOAT checkpoint (upstream
    quirk, test.py:64-69), which carries no observer buffers, so the
    QuantAdd observers keep their INIT state — zeros. Returning (0.0, 0.0)
    reproduces exactly what the fx trace freezes there (the scale then
    degenerates to the f32 eps floor; pinned end to end by the
    sr_x4_qat/sr_x2_qat goldens). That quirk is ONLY for tasks explicitly
    mapped to None — an unknown task name is an error, not a degenerate
    eps-floor scale."""
    if task not in QAT_CHECKPOINTS:
        raise ValueError(f"no QAT checkpoint mapping for task {task!r} "
                         f"(known: {sorted(QAT_CHECKPOINTS)})")
    name = QAT_CHECKPOINTS[task]
    if name is None:
        return 0.0, 0.0
    import torch
    ck = torch.load(f"{reference_root}/model_params/{name}",
                    map_location="cpu")
    lo = min(float(ck["add_residual.observer_res.min_val"]),
             float(ck["add_residual.observer_shortcut.min_val"]))
    hi = max(float(ck["add_residual.observer_res.max_val"]),
             float(ck["add_residual.observer_shortcut.max_val"]))
    return lo, hi


def load_reference_checkpoint(task: str,
                              path: Optional[str] = None,
                              reference_root: str = "/root/reference",
                              qat: bool = False) -> CollapsedParams:
    """Load + collapse the reference checkpoint for ``task``.

    qat=True replicates the qatf="qat_" composition: the QAT checkpoint's
    weights (where the reference uses them — QAT_CHECKPOINTS) collapsed
    through the fake-quant delta response (collapse_state_dict_qat).

    A ``path`` ending in .npz is read as an ALREADY-COLLAPSED checkpoint
    in the w_{i}/b_{i} layout that `train --out` and
    tools/make_qparams.py write (e.g. artifacts/sr_x4_qat_collapsed.npz)
    — so `eval-float --checkpoint x.npz` can score this framework's own
    trained models, not only reference .pth files."""
    spec = spec_for_task(task)
    if path is not None and path.endswith(".npz"):
        import numpy as np
        if qat:
            raise ValueError(
                "qat=True is meaningless for a .npz checkpoint: the "
                "fake-quant-delta composition happens at collapse time, "
                "and an .npz is already collapsed (train --qat --out "
                "applies it before writing)")
        ck = np.load(path)
        missing = [k for i in range(spec.num_convs)
                   for k in (f"w_{i}", f"b_{i}") if k not in ck]
        if missing or f"w_{spec.num_convs}" in ck:
            raise ValueError(
                f"{path} is not a collapsed {task} checkpoint "
                f"(expected exactly w_0..w_{spec.num_convs-1}/b_* HWIO; "
                f"missing {missing})")
        ws = [ck[f"w_{i}"] for i in range(spec.num_convs)]
        for i, (w, k) in enumerate(zip(ws, spec.kernel_sizes)):
            if w.ndim != 4 or w.shape[0] != k or w.shape[1] != k:
                raise ValueError(
                    f"{path}: w_{i} has shape {w.shape}, expected HWIO "
                    f"with kernel {k}x{k} for {task} (torch OIHW "
                    f"checkpoints go through the .pth loader)")
        if ws[0].shape[2] != spec.in_channels:
            raise ValueError(
                f"{path}: w_0 expects {ws[0].shape[2]} input channels but "
                f"task {task} has {spec.in_channels} — wrong task?")
        return CollapsedParams(
            ws, [ck[f"b_{i}"] for i in range(spec.num_convs)])
    if path is None:
        name = (QAT_CHECKPOINTS.get(task) if qat else None) \
            or REFERENCE_CHECKPOINTS[task]
        path = f"{reference_root}/model_params/{name}"
    state = _to_numpy_state(path)
    if qat:
        return collapse_state_dict_qat(spec, state)
    return collapse_state_dict(spec, state)
