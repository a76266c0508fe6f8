"""Round-4 probe A — the verdict-1 perf campaign, ONE process, interleaved:

  (a) Pallas packed kernel retuned at (1,8) (per-axis-tap kernel: pure-
      reshape entry, W-only packed extent; the 419 figure and its 40x64/g=8
      tile tuning are all (2,4)-era) — 3 tile configs + the (2,4) control;
  (b) (1,16) / (2,8) cells — 256-lane packed convs: 2 MXU passes per dot
      but half the boundary/cell count, 2x the k=3 FLOP inflation of s=8
      cells (16x vs 8x) — at 540p AND 1080p (r3h showed 540p ties hide
      1080p blowouts);
  (c) pe-exact (1,8) vs (2,4) — the A/B that decides default_cells("pe-exact")
      (ops/packed.py:85 concedes it was never measured);
  (d) batch-8 at the s=8 and s=16 geometries.

Protocol per CLAUDE.md: one process, candidates interleaved round-robin,
REPS reps each, compare medians; K-difference timing synced by a scalar
readback, full-tensor NONLINEAR consumer. Compiles are hoisted out of the
rep loop (the chained fns are built once per candidate; reps re-execute).

Usage: timeout 3600 python tools/bench_probe_r4a.py
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np

K_SHORT, K_LONG = 2, 22
REPS = 5


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from sesr_tpu.config import spec_for_task
    from sesr_tpu.ops.packed import _packed_exact_impl, _packed_fast_impl
    from sesr_tpu.ops.pallas_packed import build_pallas_packed_forward
    from sesr_tpu.quant.integer import _hashable
    from sesr_tpu.quant.params import QuantParams

    spec = spec_for_task("sr_x2")
    qp = _hashable(QuantParams.load(
        os.path.join(REPO, "artifacts", "qparams_sr_x2.npz")))

    t0 = time.time()
    log("probe: eating first-readback stall...")
    y = jax.jit(lambda x: x * 2.0)(jnp.ones((8, 128)))
    _ = float(jnp.sum(y))
    log(f"probe: stall eaten in {time.time()-t0:.0f}s")

    rng = np.random.default_rng(0)
    x_1 = jax.device_put(jnp.asarray(
        rng.random((1, 540, 960, 3), dtype=np.float32)))
    x_8 = jax.device_put(jnp.asarray(
        rng.random((8, 540, 960, 3), dtype=np.float32)))
    x_hd = jax.device_put(jnp.asarray(
        rng.random((1, 1080, 1920, 3), dtype=np.float32)))

    def fast(s):
        return lambda c: _packed_fast_impl(spec, c, qp, s)

    def pe(s):
        return lambda c: _packed_exact_impl(spec, c, qp, s, True)

    def pallas(s, th, tw, H=540, W=960):
        return build_pallas_packed_forward(spec, qp.qp, H, W, s=s,
                                           tile_h=th, tile_w=tw)

    candidates = {
        # (b) cell geometries, 540p
        "f18_540": (x_1, fast((1, 8))),
        "f116_540": (x_1, fast((1, 16))),
        "f28_540": (x_1, fast((2, 8))),
        # (b) 1080p
        "f18_hd": (x_hd, fast((1, 8))),
        "f116_hd": (x_hd, fast((1, 16))),
        "f28_hd": (x_hd, fast((2, 8))),
        # (c) pe-exact A/B
        "pe18_540": (x_1, pe((1, 8))),
        "pe24_540": (x_1, pe((2, 4))),
        # (d) batch-8
        "f18_b8": (x_8, fast((1, 8))),
        "f116_b8": (x_8, fast((1, 16))),
    }
    # (a) Pallas tile sweep at (1,8) + the (2,4)-era control; built lazily
    # (remote Mosaic compile can HTTP-500 — a dead config is skipped)
    for name, (s, th, tw) in {
        "pal18_t32x64": ((1, 8), 32, 64),
        "pal18_t56x40": ((1, 8), 56, 40),
        "pal18_t104x24": ((1, 8), 104, 24),
        "pal24_t40x64": ((2, 4), 40, 64),
    }.items():
        try:
            fwd = pallas(s, th, tw)
            candidates[name] = (x_1, fwd)
        except Exception as e:
            log(f"probe: {name}: build FAILED {type(e).__name__}: "
                f"{str(e)[:140]}")

    def make_runner(x, fn):
        fns = {}
        for K in (K_SHORT, K_LONG):
            @jax.jit
            def f(x, K=K):
                def body(i, c):
                    y = fn(c)
                    return c + 1e-12 * jnp.mean(y * y)
                return lax.fori_loop(0, K, body, x)
            fns[K] = f

        def run():
            times = {}
            for K in (K_SHORT, K_LONG):
                y = fns[K](x)
                _ = float(jnp.sum(y[:1, :2, 0, 0]))
                t0 = time.perf_counter()
                y = fns[K](x)
                _ = float(jnp.sum(y[:1, :2, 0, 0]))
                times[K] = time.perf_counter() - t0
            per = (times[K_LONG] - times[K_SHORT]) / (K_LONG - K_SHORT)
            return x.shape[0] * x.shape[1] * x.shape[2] / per / 1e6
        return run

    runners, results, dead = {}, {}, set()
    for name, (x, fn) in candidates.items():
        runners[name] = make_runner(x, fn)
        results[name] = []

    for rep in range(REPS):
        for name in candidates:
            if name in dead:
                continue
            try:
                t0 = time.time()
                v = runners[name]()
                results[name].append(v)
                log(f"rep {rep} {name}: {v:.1f} Mpx/s "
                    f"({time.time()-t0:.0f}s)")
            except Exception as e:
                log(f"rep {rep} {name}: FAILED {type(e).__name__}: "
                    f"{str(e)[:140]}")
                dead.add(name)

    import statistics
    summary = {}
    for name, vals in results.items():
        if vals:
            summary[name] = {
                "median": round(statistics.median(vals), 1),
                "reps": [round(v, 1) for v in vals],
            }
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
