"""Training checkpoint save/resume.

The reference overwrites a single state-dict file every 10 epochs
(train.py:80-86) and warm-starts from it (:51-52); there is no optimizer or
step state, so interrupted runs lose their schedule. Here the full training
state — expanded params, QAT observer state, optimizer state, step counter —
is serialized as one msgpack blob (flax.serialization) and restored
losslessly.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import numpy as np


def save_training_state(path: str, params, qstate, opt_state, step: int) -> None:
    from flax import serialization

    state = {
        "params": params,
        "qstate": qstate,
        "opt_state": opt_state,
        "step": np.int64(step),
    }
    blob = serialization.to_bytes(state)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)          # atomic: a crash never corrupts the file


def load_training_state(path: str, params_like, qstate_like, opt_state_like):
    """Restore into templates of the same pytree structure. Returns
    (params, qstate, opt_state, step)."""
    from flax import serialization

    with open(path, "rb") as f:
        blob = f.read()
    template = {
        "params": params_like,
        "qstate": qstate_like,
        "opt_state": opt_state_like,
        "step": np.int64(0),
    }
    state = serialization.from_bytes(template, blob)
    return (state["params"], state["qstate"], state["opt_state"],
            int(state["step"]))
