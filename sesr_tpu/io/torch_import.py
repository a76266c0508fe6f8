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


def load_reference_checkpoint(task: str,
                              path: Optional[str] = None,
                              reference_root: str = "/root/reference") -> CollapsedParams:
    """Load + collapse the reference checkpoint for ``task``."""
    spec = spec_for_task(task)
    if path is None:
        path = f"{reference_root}/model_params/{REFERENCE_CHECKPOINTS[task]}"
    return collapse_state_dict(spec, _to_numpy_state(path))
