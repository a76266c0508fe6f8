"""In-chip slab tiling: process large frames as overlapping H-slabs so the
packed working set stays resident.

At 540x960 the channel-packed deployment path keeps its inter-layer
activations in the chip's fast memory; at 1080p they are 4x larger, spill,
and throughput drops ~31% (BASELINE.md "Resolution scaling", round 2).
This module re-applies the repo's halo machinery WITHIN one chip: the frame
is cut into H-slabs, each extended by the network's total receptive-field
radius R = sum(k_i // 2), and a sequential `lax.map` runs the ordinary
packed forward per slab, emitting only the interior rows. It is the
single-chip analog of the reference's own 32-wide export tile walk whose
valid region shrinks by kernel//2 per layer (/root/reference/output.py:
42-65) and of parallel/tiling.py's cross-chip halos — except here the halo
is plain overlap (recompute), not communication.

Bit-exactness argument (asserted in tests/test_slab.py): an output row at
distance >= R from a slab's CUT edge cannot be influenced by anything
beyond that edge, because each conv propagates influence k_i//2 rows —
so cut-edge zero padding never reaches the emitted interior. TRUE image
boundaries are different: the monolithic network zero-pads EVERY layer's
input there, while rows beyond a pre-fetched halo would carry computed
values (relu(bias) leaks in — the same reason ops/halo.py exchanges per
layer, not once upfront). Slabs are therefore CLAMPED inside the image:
a slab near the top/bottom shifts inward until its edge coincides with
the image edge, where the packed forward's own SAME padding is exactly
the monolithic padding, and its emit window shifts correspondingly (the
emitted rows stay >= R from every cut edge). The residual shortcut is
spatially local, so the argument covers it (its path's radius is part of
R).

Recompute overhead: 2R extra rows per slab (R = 7 for the 5-conv k=[5,3,3,
3,5] nets), ~5% at slab_h = 270.

STATUS (round 3, TPU v5e via the tunneled backend): the machinery is
bit-exact (tests/test_slab.py, both loop forms) but NOT a throughput win
on THIS backend — every multi-piece composition measured a ~7.6 ms-per-
piece pathology regardless of form: lax.map 86, unrolled+concat 85,
zero-pad+ADD 85 (f32) / 118 (int8), dynamic_update_slice 85 Mpx/s at
1080p vs 390-450 monolithic, while a single slab-shaped program runs 514
and two net outputs combined by plain ADD scale perfectly (r3d). The
cost attaches to each conv-net subgraph over a distinct input slice, not
to the assembly op, and host-level dispatches cost the same ~8 ms in
post-readback sync mode — so 1080p+ frames stay MONOLITHIC here (the
int8 output contract buys +12% instead), and this module remains for
backends without the dispatch pathology. Probes:
tools/bench_probe_r3{a,c,d,e}.py; protocol note in CLAUDE.md.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

from sesr_tpu.config import SESRSpec
from sesr_tpu.ops.packed import select_packed_forward, _s2
from sesr_tpu.quant.params import QuantParams


def receptive_radius(spec: SESRSpec) -> int:
    """Total receptive-field radius of the conv stack in input pixels."""
    return sum(k // 2 for k in spec.kernel_sizes)


def pick_slab_h(spec: SESRSpec, H: int, target: int = 272) -> int:
    """A slab height near `target` (cell-aligned for tidy packing) such
    that slabs cover H; frames at or below 2x target run monolithic (the
    540-row deployment config measures fastest un-slabbed — its working
    set is already resident)."""
    if H <= 2 * target:
        return H
    n_slabs = -(-H // target)                      # ceil(H / target)
    per_slab = -(-H // n_slabs)                    # ceil(H / n_slabs)
    sh = _s2((2, 4))[0]
    return -(-per_slab // sh) * sh                 # cell-aligned, covers H


def packed_slab_forward(spec: SESRSpec, qp: QuantParams, x, s=(2, 4),
                        slab_h: Optional[int] = None, fwd=None,
                        batch_serial: bool = False, unroll: bool = True):
    """Channel-packed deployment forward over H-slabs. x: NHWC float in
    [0, 1]. Bit-identical to the monolithic packed forward
    (tests/test_slab.py).

    slab_h: interior rows per slab (None: pick_slab_h; pass H or more to
    disable slabbing). fwd: packed lowering fn(spec, qp, x, s) — defaults
    to the certificate-selected one (ops/packed.py select_packed_forward).
    batch_serial: run frames of a batch one at a time.
    unroll: emit slabs as independent unrolled subgraphs (default)
    instead of a lax.map while-loop. NOTE: on the tunneled v5e
    BOTH forms hit the per-subgraph dispatch pathology (~85 Mpx/s at
    1080p vs 390+ monolithic — see the module STATUS); use the
    monolithic path there and keep this for backends without it.
    """
    if fwd is None:
        _mode, fwd = select_packed_forward(qp)
    x = jnp.asarray(x, jnp.float32)
    n, H, W, _C = x.shape
    if slab_h is None:
        slab_h = pick_slab_h(spec, H)

    if batch_serial and n > 1:
        if unroll:
            return jnp.concatenate(
                [packed_slab_forward(spec, qp, x[i:i + 1], s, slab_h, fwd,
                                     batch_serial=False, unroll=True)
                 for i in range(n)], axis=0)

        def one_frame(xf):
            return packed_slab_forward(spec, qp, xf[None], s, slab_h, fwd,
                                       batch_serial=False, unroll=False)[0]
        return lax.map(one_frame, x)

    R = receptive_radius(spec)
    h_s = slab_h + 2 * R                           # uniform slice height
    if slab_h >= H or h_s > H:
        return fwd(spec, qp, x, s=s)

    r = spec.scaling_factor if spec.has_pixel_shuffle else 1
    n_slabs = -(-H // slab_h)
    # slab i emits global rows [g_i, g_i + slab_h) from slice rows
    # [off_i, off_i + slab_h) of xp[start_i : start_i + h_s]. Slabs CLAMP
    # to the image so true boundaries coincide with slab edges (monolithic
    # SAME padding applies there); emitted rows stay >= R from cut edges.
    starts, offs, gs = [], [], []
    for i in range(n_slabs):
        g = min(i * slab_h, H - slab_h)
        start = min(max(g - R, 0), H - h_s)
        starts.append(start)
        offs.append(g - start)
        gs.append(g)
        assert 0 <= g - start and g - start + slab_h <= h_s
        assert start == 0 or g - start >= R            # cut top far enough
        assert start + h_s == H or h_s - (g - start + slab_h) >= R

    overlap = (gs[-2] + slab_h - gs[-1]) if n_slabs > 1 else 0
    if unroll:
        # static slices, one subgraph per slab, concatenated
        pieces = []
        for i in range(n_slabs):
            y = fwd(spec, qp, x[:, starts[i]:starts[i] + h_s], s=s)
            lo = offs[i] * r + (overlap * r if i == n_slabs - 1 else 0)
            pieces.append(y[:, lo:(offs[i] + slab_h) * r])
        return jnp.concatenate(pieces, axis=1)

    def one_slab(args):
        start, off = args
        slab = lax.dynamic_slice_in_dim(x, start, h_s, axis=1)
        y = fwd(spec, qp, slab, s=s)
        return lax.dynamic_slice_in_dim(y, off * r, slab_h * r, axis=1)

    ys = lax.map(one_slab, (jnp.asarray(starts), jnp.asarray(offs)))
    # consecutive emits tile [0, H): only the LAST slab overlaps its
    # predecessor (g_{S-1} = H - slab_h), by identical values — drop the
    # overlapping rows when concatenating
    pieces = [ys[i] for i in range(n_slabs - 1)]
    pieces.append(ys[n_slabs - 1][:, overlap * r:])
    return jnp.concatenate(pieces, axis=1)
