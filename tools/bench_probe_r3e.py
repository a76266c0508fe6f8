"""Round-3 probe E: slab assembly WITHOUT output-concat.

r3d isolated the pathology: concatenating the outputs of separate
packed-net subgraphs costs ~7.6 ms per piece (like extra dispatches),
while ADD-combining subgraph outputs scales perfectly (dup_add ~2x mono
cost), and host-level dispatches cost ~8 ms each in the post-readback
sync mode. Hence: assemble H-slabs by zero-padding each emitted piece to
the full output and SUMMING. Also probed: dynamic_update_slice assembly,
and the int8-output contract at 1080p (smaller pad+add traffic).

Usage: timeout 3600 python tools/bench_probe_r3e.py
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def measure(fn, x, state, name, k_long=22):
    import jax
    import jax.numpy as jnp
    from jax import lax

    def chained(K):
        @jax.jit
        def f(x):
            def body(i, c):
                y = fn(c)
                return c + 1e-12 * jnp.mean(y * y)
            return lax.fori_loop(0, K, body, x)
        return f

    times = {}
    for K in (2, k_long):
        f = chained(K)
        y = f(x)
        _ = float(jnp.sum(y[:1, :2, 0, 0]))
        t0 = time.perf_counter()
        y = f(x)
        _ = float(jnp.sum(y[:1, :2, 0, 0]))
        times[K] = time.perf_counter() - t0
    per = (times[k_long] - times[2]) / (k_long - 2)
    mpxs = x.shape[0] * x.shape[1] * x.shape[2] / per / 1e6
    state.setdefault(name, []).append(mpxs)
    print(f"    {name}: {mpxs:.1f} Mpx/s", flush=True)
    return mpxs


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from sesr_tpu.config import spec_for_task
    from sesr_tpu.ops.packed import _packed_fast_impl
    from sesr_tpu.quant.integer import _hashable
    from sesr_tpu.quant.params import QuantParams

    spec = spec_for_task("sr_x2")
    qp = QuantParams.load(os.path.join(REPO, "artifacts",
                                       "qparams_sr_x2.npz"))
    qph = _hashable(qp)
    raw_impl = _packed_fast_impl.__wrapped__

    t0 = time.time()
    print("warmup readback...", flush=True)
    y = jax.jit(lambda x: x * 2.0)(jnp.ones((8, 128)))
    _ = float(jnp.sum(y))
    print(f"done in {time.time() - t0:.0f}s", flush=True)

    rng = np.random.default_rng(0)
    x_hd = jax.device_put(jnp.asarray(
        rng.random((1, 1080, 1920, 3), dtype=np.float32)))

    R, slab_h, H, r = 7, 270, 1080, 2
    n_slabs = 4

    def slab_pieces(c, out_dtype="f32"):
        pieces = []
        for i in range(n_slabs):
            g = min(i * slab_h, H - slab_h)
            start = min(max(g - R, 0), H - (slab_h + 2 * R))
            y = raw_impl(spec, c[:, start:start + slab_h + 2 * R], qph,
                         (2, 4), True, None, out_dtype)
            off = (g - start) * r
            pieces.append((g * r, y[:, off:off + slab_h * r]))
        return pieces

    def slab_padadd(c):
        total = None
        for g_out, piece in slab_pieces(c):
            padded = jnp.pad(piece, ((0, 0),
                                     (g_out, H * r - g_out - piece.shape[1]),
                                     (0, 0), (0, 0)))
            total = padded if total is None else total + padded
        return total

    def slab_padadd_int8(c):
        total = None
        for g_out, piece in slab_pieces(c, "int8"):
            padded = jnp.pad(piece, ((0, 0),
                                     (g_out, H * r - g_out - piece.shape[1]),
                                     (0, 0), (0, 0)))
            p32 = padded.astype(jnp.int32)
            total = p32 if total is None else total + p32
        return total.astype(jnp.float32)

    def slab_dus(c):
        out = jnp.zeros((1, H * r, 1920 * r, 3), jnp.float32)
        for g_out, piece in slab_pieces(c):
            out = lax.dynamic_update_slice_in_dim(out, piece, g_out, 1)
        return out

    cands = {
        "hd_mono": (x_hd, lambda c: _packed_fast_impl(spec, c, qph, (2, 4))),
        "hd_mono_int8out": (x_hd, lambda c: _packed_fast_impl(
            spec, c, qph, (2, 4), True, None, "int8").astype(jnp.float32)),
        "hd_slab_padadd": (x_hd, slab_padadd),
        "hd_slab_padadd_int8": (x_hd, slab_padadd_int8),
        "hd_slab_dus": (x_hd, slab_dus),
    }
    state = {}
    print("interleaved 1080p probes, 4 reps:", flush=True)
    for rep in range(4):
        print(f"  rep {rep}:", flush=True)
        for name, (xx, fn) in cands.items():
            try:
                measure(fn, xx, state, name)
            except Exception as e:
                print(f"    {name}: FAILED {type(e).__name__}: "
                      f"{str(e)[:160]}", flush=True)
    for name, vals in state.items():
        print(f"  median {name}: {np.median(vals):.1f} "
              f"({[round(v, 1) for v in vals]})", flush=True)


if __name__ == "__main__":
    main()
