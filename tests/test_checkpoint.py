"""Training-state checkpoint round trip + overflow sanitizer."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from sesr_tpu.config import spec_for_task
from sesr_tpu.io.checkpoint import save_training_state, load_training_state
from sesr_tpu.models.expanded import init_expanded
from sesr_tpu.quant.qat import QATConfig, prepare, make_train_step
from sesr_tpu.quant.integer import integer_forward
from tests.test_integer_bitexact import _load_golden, _golden_qparams


def test_training_state_roundtrip(tmp_path, rng):
    import optax

    spec = spec_for_task("nrdm_3")
    cfg = QATConfig()
    params = init_expanded(spec, jax.random.PRNGKey(0))
    qstate = prepare(spec, cfg)
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)
    step = jax.jit(make_train_step(spec, cfg, opt))
    batch = (jnp.asarray(rng.random((1, 16, 16, 3), dtype=np.float32)),
             jnp.asarray(rng.random((1, 16, 16, 3), dtype=np.float32)))
    for _ in range(3):
        params, qstate, opt_state, loss = step(params, qstate, opt_state, batch)

    path = os.path.join(tmp_path, "state.msgpack")
    save_training_state(path, params, qstate, opt_state, 3)

    p2 = init_expanded(spec, jax.random.PRNGKey(1))
    q2 = prepare(spec, cfg)
    o2 = opt.init(p2)
    p2, q2, o2, s = load_training_state(path, p2, q2, o2)
    assert s == 3
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # continuing from the restored state is deterministic vs the original
    na = step(params, qstate, opt_state, batch)
    nb = step(p2, q2, o2, batch)
    np.testing.assert_allclose(float(na[3]), float(nb[3]), rtol=1e-7)


def test_overflow_counts_zero_on_golden():
    g = _load_golden("nrdm_3")
    spec, params, qp = _golden_qparams("nrdm_3", g)
    x = jnp.asarray(g["fixture"].transpose(0, 2, 3, 1))
    _, dumps = integer_forward(spec, qp, x, collect_dumps=True)
    counts = np.asarray(dumps["overflow_counts"])
    assert counts.shape == (spec.num_convs,)
    # the golden run triggered no accumulator saturation (the reference
    # would have printed its overflow sentinel otherwise)
    assert counts.sum() == 0
