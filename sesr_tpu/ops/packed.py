"""Space-to-depth channel packing: MXU-shaped deployment datapath.

The SESR nets carry C=16 feature maps, so every conv's matmul has a
16-wide contraction/output dimension — filling 16 of the MXU's 128 lanes
(~12% ceiling before any other loss; measured round 1: the whole deployment
path ran at ~1% of the chip's MACs). Packing s_h x s_w spatial cells into
channels rewrites the SAME network on a coarser grid with s_h*s_w x the
channels: the interior convs become 64..256-channel convs and the MXU lane
fill multiplies, at the cost of a sparse-in-dense weight inflation (the
packed kernel's zeros) of T^2 * s_h*s_w / k^2 — e.g. 4x for the k=3 convs
at 2x2 and 16x at 4x4 — a trade the MXU wins by a large margin (measured
on a v5e: 79 Mpx/s unpacked -> 250 Mpx/s at 2x2 -> 414 Mpx/s at 4x4 for
SESR-x2 540x960).

The rewrite is exact, not approximate. With
x_p[Y, X, (dy*s_w+dx)*C + c] = x[s_h*Y+dy, s_w*X+dx, c], a stride-1 k x k
SAME conv y = K * x becomes a stride-1 T_y x T_x conv in packed space:

    y_p[Y, X, (ey*s_w+ex)*OC + o]
      = sum_{qy,qx,dy,dx,c} Kp[qy, qx, (dy*s_w+dx)*IC + c, (ey*s_w+ex)*OC + o]
                            * x_p[Y+qy, X+qx, (dy*s_w+dx)*IC + c]
    Kp[qy, qx, ...] = K[s_h*qy + dy - ey + r, s_w*qx + dx - ex + r, c, o]
                      (zero where the index falls outside [0, k))

with r = k//2 and qy, qx ranging over the few cell offsets the receptive
field touches (3 per axis for k in {3,5} at s in {2,4}). Zero padding of
the packed tensor equals the original SAME zero padding because a padded
cell is all padded pixels (H, W padded up to multiples of s; the pad cells
are masked to the shifted-domain zero each layer, exactly like the
out-of-image mask of ops/pallas_pipeline.py).

Every arithmetic value is the same exact integer-in-float32 as the
unpacked fast path (quant/integer.py compute="fast"): the packed conv's
extra terms are exact zeros and all partial sums stay below 2^24, so
bf16 x bf16 -> f32 remains bit-exact (tests/test_packed.py asserts
array-equality against integer_forward on every task).

Reference capability matched: the conv datapath of quan_func.py:298-493 in
its certified saturation-free regime (see quant/certify.py) at MXU rate.
"""

from __future__ import annotations

import functools
from typing import Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from sesr_tpu.config import SESRSpec
from sesr_tpu.ops.fixedpoint import apply_requant_f32, saturate
from sesr_tpu.quant.params import QuantParams

SLike = Union[int, Tuple[int, int]]

# The cell geometries the deployment surface exposes (CLI `infer --cells`,
# bench.py, the sharded builders). quant/certify.py mechanically verifies
# the fast/hybrid lowerings on EXACTLY this set, so a certified artifact is
# belt-and-braces-checked for every geometry a user can select; cli.py
# rejects other geometries for the certificate-dependent modes (the PE-exact
# lowering needs no certificate and accepts any cell size).
CERTIFIED_CELLS: Tuple[Tuple[int, int], ...] = ((1, 8), (2, 4), (4, 2),
                                                (2, 2), (4, 4))

# deployment default for the certified fast AND hybrid lowerings: W-ONLY
# packing — its space_to_depth is a pure reshape (W and C are memory-
# adjacent in NHWC, no transpose at all), with the same 128-lane fill and
# the same 8x k=3 inflation as (2, 4). r3h interleaved medians: 540p 612
# (1,8) vs 604 (2,4) — a tie — but 1080p 618 vs 389, +59%, erasing the
# resolution-scaling regression (flat 540p -> 1080p); hybrid medians also
# favor (1,8) (r3i/r3l, see default_cells). Only the PE-exact lowering
# keeps (2, 4), settled by its own A/B in round 4 (see default_cells).
# 256-lane cells were probed and CLOSED round 4 (tools/bench_probe_r4a.py,
# interleaved medians): (1,16) 401 / (2,8) 432 vs (1,8) 836* at 540p,
# 374 / 294 vs 632 at 1080p, and (1,16) 453 vs 763 at batch 8 — the 2x
# k=3 FLOP inflation (16x vs 8x) buys no MXU-efficiency win at 256
# channels. (*that session had throughput episodes; the stable 1080p and
# batch-8 rows carry the conclusion.)
FAST_DEFAULT_CELLS: Tuple[int, int] = (1, 8)


def default_cells(mode: str) -> Tuple[int, int]:
    """The measured default cell geometry per lowering mode — the ONE
    policy point shared by the CLI, bench.py, and every sharded/multihost
    builder (parallel/tiling.py, parallel/multihost.py route through
    resolve_cells below).
    fast AND hybrid: FAST_DEFAULT_CELLS — the hybrid medians also favor
    (1,8) in two independent interleaved sessions (r3i nr 899 vs 657;
    r3l nr 718 vs 618, nrdm_6 464 vs 451 — reps overlap, medians agree;
    the OC-concat lane-fill logic depends on cell COUNT, identical at 8).
    pe-exact keeps (2, 4): measured round 4 (tools/bench_probe_r4a.py,
    interleaved medians 202 vs 186 at (1,8) — the per-PE channel split
    quarters the per-conv channel count, so the packing transpose cost
    the W-only cells avoid no longer dominates)."""
    return (2, 4) if mode == "pe-exact" else FAST_DEFAULT_CELLS


def resolve_cells(mode: str, h_local: int, w_local: int,
                  cert_cells=None, h_sharded: bool = False,
                  w_sharded: bool = True,
                  k_max: int = 5) -> Tuple[int, int]:
    """Serving-geometry policy for CELL-ALIGNED execution (the sharded
    paths, which cannot pad): the measured default for this lowering mode
    when the local shard admits it, else the first certified geometry
    that does. A geometry is admissible when (a) the local shard is
    cell-aligned along both axes and (b) each SHARDED axis's packed tap
    reach fits a single-hop neighbour exchange — the halo machinery
    exchanges the per-layer reach (1 cell for s >= 2; 2 cells along an
    s = 1 axis under k=5), so the local shard must own at least that many
    cells (round 5: this let the (1,8) default serve H-sharded 2D meshes,
    which previously fell back to (2,4) and lost ~40% at 1080p+).
    cert_cells: the artifact's stamped geometry set (qp.cert_cells) —
    candidates outside it are skipped for the certificate-gated modes so
    a sharded builder can never silently serve a geometry the artifact's
    certification never executed. An artifact with NO stamped set (saved
    before cert_cells existed) is REFUSED for the gated modes — the same
    policy `infer --cells` enforces (cli.py: `cert_set = qp.cert_cells or
    ()`); re-certify with `python -m sesr_tpu certify`. k_max: the
    largest kernel in the net (5 for the whole SESR zoo)."""
    if mode != "pe-exact" and not cert_cells:
        raise ValueError(
            f"the {mode!r} lowering is certificate-gated but the artifact "
            f"carries no cert_cells geometry stamps (pre-geometry-stamp "
            f"artifact?) — re-certify it (python -m sesr_tpu certify) or "
            f"serve pe-exact")
    gate = tuple(tuple(c) for c in cert_cells) if cert_cells \
        else CERTIFIED_CELLS
    cands = [default_cells(mode)]
    cands += [c for c in CERTIFIED_CELLS if c not in cands]

    def halo_fits(local_px: int, s: int) -> bool:
        lo, hi = packed_tap_range(k_max, s)
        return local_px // s >= max(-lo, hi)

    for sh, sw in cands:
        if mode != "pe-exact" and (sh, sw) not in gate:
            continue
        if h_local % sh or w_local % sw:
            continue
        if (h_sharded and not halo_fits(h_local, sh)) or \
                (w_sharded and not halo_fits(w_local, sw)):
            continue
        return (sh, sw)
    raise ValueError(
        f"no certified cell geometry fits the local shard "
        f"{h_local}x{w_local} (candidates {cands}, certified {gate}, "
        f"h_sharded={h_sharded}, w_sharded={w_sharded})")


def _s2(s: SLike) -> Tuple[int, int]:
    return (s, s) if isinstance(s, int) else (int(s[0]), int(s[1]))


def space_to_depth_nhwc(x, s: SLike):
    """(N, H, W, C) -> (N, H/s_h, W/s_w, s_h*s_w*C), channels (dy, dx, c)."""
    sh, sw = _s2(s)
    n, h, w, c = x.shape
    assert h % sh == 0 and w % sw == 0, (h, w, s)
    if sh == 1:
        # W-only packing: W and C are memory-adjacent in NHWC, so this is
        # a PURE RESHAPE. Perf-neutral vs the general singleton-transpose
        # form (XLA already elides it: r3k interleaved medians 626 vs 626
        # at 1080p, 762 vs 751 at b8 — an apparent 0.1 ms r3j gap did not
        # reproduce); kept for clarity and layout certainty.
        return x.reshape(n, h, w // sw, sw * c)
    x = x.reshape(n, h // sh, sh, w // sw, sw, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h // sh, w // sw, sh * sw * c)


def depth_to_space_nhwc(x, s: SLike):
    """Inverse of space_to_depth_nhwc (cell-major channel order — NOT the
    torch PixelShuffle c-major order of ops/conv.py:pixel_shuffle_nhwc)."""
    sh, sw = _s2(s)
    n, hs, ws, csq = x.shape
    c = csq // (sh * sw)
    if sh == 1:
        # pure reshape (see space_to_depth_nhwc)
        return x.reshape(n, hs, ws * sw, c)
    x = x.reshape(n, hs, ws, sh, sw, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, hs * sh, ws * sw, c)


def packed_to_image_nhwc(x, s: SLike, r: int = 1):
    """Fused depth_to_space(s) ∘ pixel_shuffle(r): one transpose from the
    packed cell layout straight to the final full-resolution image.

    Composing the two index permutations (cell-major (dy, dx, c) channels
    from space_to_depth_nhwc, then torch PixelShuffle's (c, i, j) order,
    ops/conv.py:pixel_shuffle_nhwc) avoids materializing the intermediate
    unpacked tensor — at 1080p output that intermediate is a ~25 MB f32
    HBM round-trip, worth ~0.06 ms/frame of the deployment path (before/
    after bench.py runs: 603 -> 626 Mpx/s; the boundary-cost bracketing is
    in tools/bench_probe_r2d.py). With r=1 this is exactly
    depth_to_space_nhwc."""
    sh, sw = _s2(s)
    n, hs, ws, cp = x.shape
    c = cp // (sh * sw * r * r)
    if sh == 1 and r == 1:
        # pure reshape (see space_to_depth_nhwc)
        return x.reshape(n, hs, ws * sw, c)
    x = x.reshape(n, hs, ws, sh, sw, c, r, r)
    # (n, Y, X, dy, dx, c, i, j) -> (n, Y, dy, i, X, dx, j, c)
    x = x.transpose(0, 1, 3, 6, 2, 4, 7, 5)
    return x.reshape(n, hs * sh * r, ws * sw * r, c)


def packed_tap_range(k: int, s: int):
    """Cell-offset tap range [q_lo, q_hi] of the packed conv along one axis
    with cell size ``s`` (scalar)."""
    r = k // 2
    q_lo = -((r + s - 1) // s)
    q_hi = (s - 1 + k - 1 - r) // s
    return q_lo, q_hi


def pack_weight_hwio(w: np.ndarray, s: SLike) -> np.ndarray:
    """Dense packed kernel (T_y, T_x, s_h*s_w*IC, s_h*s_w*OC) for a k x k
    HWIO kernel. Host-side numpy; the few hundred (T^2 * (s_h*s_w)^2) block
    assignments are trivially cheap next to any compile."""
    sh, sw = _s2(s)
    k, k2, ic, oc = w.shape
    assert k == k2, "square kernels only"
    r = k // 2
    qy_lo, qy_hi = packed_tap_range(k, sh)
    qx_lo, qx_hi = packed_tap_range(k, sw)
    ty, tx = qy_hi - qy_lo + 1, qx_hi - qx_lo + 1
    wp = np.zeros((ty, tx, sh * sw * ic, sh * sw * oc), dtype=w.dtype)
    for qy in range(qy_lo, qy_hi + 1):
        for qx in range(qx_lo, qx_hi + 1):
            for ey in range(sh):
                for ex in range(sw):
                    for dy in range(sh):
                        for dx in range(sw):
                            u = sh * qy + dy - ey + r
                            v = sw * qx + dx - ex + r
                            if 0 <= u < k and 0 <= v < k:
                                ci = (dy * sw + dx) * ic
                                co = (ey * sw + ex) * oc
                                wp[qy - qy_lo, qx - qx_lo,
                                   ci:ci + ic, co:co + oc] = w[u, v]
    return wp


def strided_entry_weight(w0: np.ndarray, s: SLike) -> np.ndarray:
    """Fold quantize+pad+space_to_depth+conv0 into ONE strided conv: the
    packed layer-0 output (Y, X, (ey, ex, oc)) equals the original conv0
    output at pixel (s_h*Y + ey, s_w*X + ex), i.e. a stride-(s_h, s_w) conv
    on the FULL-RESOLUTION shifted input with an expanded
    (k+s_h-1, k+s_w-1) kernel — no explicit entry transpose at all.

    Ws[ey+du, ex+dv, c, (ey*s_w+ex)*OC + o] = w0[du, dv, c, o]; apply with
    padding ((r, Hp-H+r), (r, Wp-W+r)), stride (s_h, s_w) (r = k//2,
    Hp/Wp = cell-rounded-up sizes). Exact: layer 0 has <= 3 input channels,
    so every f32 partial sum is bounded by
    (k+s_h-1)(k+s_w-1)*IC*127*255 < 2^24 and the accumulation is
    order-independent (round-3 probe r3f measured the explicit entry
    transform at ~0.20 ms/frame of the 0.85 ms total — the largest
    non-conv block)."""
    sh, sw = _s2(s)
    k, k2, ic, oc = w0.shape
    assert k == k2
    ws = np.zeros((k + sh - 1, k + sw - 1, ic, sh * sw * oc), w0.dtype)
    for ey in range(sh):
        for ex in range(sw):
            ws[ey:ey + k, ex:ex + k, :,
               (ey * sw + ex) * oc:(ey * sw + ex + 1) * oc] += w0
    return ws


def strided_entry_conv(x_shift, ws, spec_k: int, s: SLike,
                       preferred_element_type=jnp.float32):
    """Apply the strided entry kernel (strided_entry_weight) to the
    full-resolution shifted input. Output: the packed layer-0 conv result
    (N, Hp/s_h, Wp/s_w, s_h*s_w*OC), pad cells included (their zero-padded
    windows equal the masked packed path's values exactly)."""
    sh, sw = _s2(s)
    r = spec_k // 2
    n, H, W, _ = x_shift.shape
    hp, wp = -(-H // sh) * sh, -(-W // sw) * sw
    return jax.lax.conv_general_dilated(
        x_shift, ws, window_strides=(sh, sw),
        padding=[(r, hp - H + r), (r, wp - W + r)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=preferred_element_type)


def packed_conv_same(x_p, wp, q_lo_hw, q_hi_hw,
                     preferred_element_type=jnp.float32,
                     w_valid: bool = False, h_valid: bool = False):
    """Stride-1 packed conv with the (possibly asymmetric) zero padding that
    reproduces the original SAME conv. q_lo_hw/q_hi_hw: per-axis (H, W) tap
    bounds (ints accepted for the symmetric-cell case). ``w_valid`` /
    ``h_valid``: no padding along that axis — the caller pre-extended it
    with a cell halo (sharded mode)."""
    ql = _s2(q_lo_hw)
    qh = _s2(q_hi_hw)
    return jax.lax.conv_general_dilated(
        x_p, wp, window_strides=(1, 1),
        padding=[(0, 0) if h_valid else (-ql[0], qh[0]),
                 (0, 0) if w_valid else (-ql[1], qh[1])],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=preferred_element_type)


def _halo_extend(x_c, q_lo, q_hi, halo_axis):
    """Per-layer halo exchange for sharded packed execution; returns
    (extended, h_valid, w_valid). halo_axis: a single mesh axis name (W
    sharding), or an (h_axis, w_axis) pair for the 2D spatial mesh — the
    packed analog of the integer interpreter's halo_exchange_2d wiring
    (corner values arrive via the two-hop H-then-W exchange). The exchange
    width per sharded axis is the layer's packed tap reach: 1 cell for
    every s >= 2 geometry, but an UNPACKED (s = 1) axis under a k=5 kernel
    reaches +-2 cells — the (1,8) W-only default on an H-sharded mesh
    exchanges a 2-cell H halo (round 5; previously this forced a (2,4)
    fallback that lost ~40% at 1080p+). Odd kernels give symmetric tap
    ranges (asserted). Zeros delivered at mesh edges by the non-wrapping
    ppermute equal the packed SAME padding in the shifted domain."""
    if halo_axis is None:
        return x_c, False, False
    from sesr_tpu.ops.halo import halo_exchange, halo_exchange_2d
    assert q_hi[0] == -q_lo[0] and q_hi[1] == -q_lo[1], (q_lo, q_hi)
    hy, hx = q_hi[0], q_hi[1]
    if isinstance(halo_axis, tuple):
        h_ax, w_ax = halo_axis
        if h_ax is None:
            # W sharded over a COMBINED axis group (e.g. ("dp", "sp") in
            # the multihost tail forward) — a plain W exchange whose
            # ppermute rides the flattened axis
            return halo_exchange(x_c, hx, w_ax, dim=2), False, True
        return halo_exchange_2d(x_c, (hy, hx), h_ax, w_ax), True, True
    return halo_exchange(x_c, hx, halo_axis, dim=2), False, True


def _pad_mask(spec: SESRSpec, H: int, W: int, s: SLike):
    """(Hs, Ws, s_h*s_w) float32 mask, 1 where the original pixel is
    in-image. None when H, W are multiples of the cell (all-ones)."""
    sh, sw = _s2(s)
    if H % sh == 0 and W % sw == 0:
        return None
    hp, wp = -(-H // sh) * sh, -(-W // sw) * sw
    rows = np.arange(hp).reshape(hp // sh, sh)
    cols = np.arange(wp).reshape(wp // sw, sw)
    valid = (rows[:, None, :, None] < H) & (cols[None, :, None, :] < W)
    return jnp.asarray(valid.reshape(hp // sh, wp // sw, sh * sw)
                       .astype(np.float32))


def packed_layer_taps(spec: SESRSpec, i: int, s: SLike):
    """Per-axis (q_lo, q_hi) of conv i's packed kernel."""
    sh, sw = _s2(s)
    k = spec.kernel_sizes[i]
    return packed_tap_range(k, sh), packed_tap_range(k, sw)


# input-pixel count above which the strided entry conv beats the explicit
# entry transform (r3g interleaved medians: 540x960 packed 637 > strided
# 490 Mpx/s, but 1080x1920 strided 439 > packed 396 — the transpose cost
# grows super-linearly with the frame while the strided conv's overhead is
# roughly proportional)
STRIDED_ENTRY_MIN_PIXELS = 1_500_000


@functools.partial(jax.jit, static_argnums=(0, 2, 3, 4, 5, 6, 7))
def _packed_fast_impl(spec: SESRSpec, x, qp_static, s: SLike,
                      narrow_store: bool = True, halo_axis=None,
                      out_dtype: str = "f32", entry: str = "auto"):
    """narrow_store: materialize the inter-layer boundary as the EXACT
    integer-valued tensors (int8 conv inputs, int16 rounded shortcut)
    instead of the f32 requant outputs — 4x less HBM traffic per layer.
    Bit-exact by construction: x_q IS the quantized intermediate (<= 8
    bits), and the int16 shortcut stores round(relu(h)) — exactly what the
    residual add consumes — with its magnitude bounded against 2^15 by the
    certificate (quant/certify.py). Layer 1 reads the UNROUNDED layer-0
    output (see the in-loop comment: banker's rounding does not commute
    with the integer zero shift at .5 boundaries).

    halo_axis: mesh axis name for W-sharded execution inside shard_map —
    each layer's packed conv then exchanges its ONE-cell W halo
    (ops/halo.py; zeros delivered at image edges == the packed SAME
    padding) and convolves valid-W. Requires the local W to be a multiple
    of s_w (cell-aligned shards).

    entry: "strided" folds quantize + pad + space_to_depth + conv0 into
    one stride-(s_h, s_w) conv on the full-resolution input
    (strided_entry_weight — bit-exact); "packed" is the explicit
    transform (always used under halo_axis, where layer 0 must consume
    the same sharded packed layout as the rest); "auto" (default) picks
    strided for frames >= STRIDED_ENTRY_MIN_PIXELS — r3f/r3g measured the
    explicit entry transform at ~0.20 ms of the 0.85 ms 540p frame yet
    the strided conv only wins at 1080p+ (interleaved medians above)."""
    qp = qp_static
    hw = qp.hw
    L = spec.num_convs
    sh, sw = _s2(s)
    bits = hw.quan_bits
    qmin, qmax = float(-(1 << (bits - 1))), float((1 << (bits - 1)) - 1)
    bias_hi = (1 << (hw.bias_bits - 1)) - 1

    assert entry in ("auto", "packed", "strided"), entry
    n, H, W, c_in = x.shape
    if entry == "auto":
        # strided pays off only where the explicit entry transform is a
        # real transpose (s_h > 1: H-interleave) AND the frame is large
        # (r3g); W-only cells pack by pure reshape, nothing to save (r3h:
        # (1,8)+strided measured 411 vs 612 Mpx/s at 540p)
        entry = ("strided" if sh > 1 and H * W >= STRIDED_ENTRY_MIN_PIXELS
                 else "packed")
    if halo_axis is not None:
        assert H % sh == 0 and W % sw == 0, (
            "sharded packed execution needs cell-aligned local shards")
        entry = "packed"     # layer 0 must consume the sharded packed layout
    hp, wpad = -(-H // sh) * sh, -(-W // sw) * sw
    mask = _pad_mask(spec, H, W, (sh, sw))

    # domain 0 quantization at original resolution
    x_q = jnp.clip(jnp.round(x / jnp.float32(qp.a_scale[0])
                             + jnp.float32(qp.a_zero[0])), qmin, qmax)
    if entry == "strided":
        # no explicit transform: the strided entry conv consumes the
        # full-resolution shifted input directly (layer 0 below)
        h = x_q
    else:
        # pack once — in int8, so the entry transpose moves 4x fewer bytes
        # (pad cells are int 0 exactly as before; the mask handles them
        # either way)
        x_q = jnp.pad(x_q.astype(jnp.int8),
                      ((0, 0), (0, hp - H), (0, wpad - W), (0, 0)))
        h = space_to_depth_nhwc(x_q, (sh, sw))

    packed_w = []
    for i in range(L):
        if i == 0 and entry == "strided":
            ws = strided_entry_weight(np.asarray(qp.w_int[0], np.float32),
                                      (sh, sw))
            packed_w.append((jnp.asarray(ws, jnp.bfloat16), None, None))
            continue
        wp = pack_weight_hwio(np.asarray(qp.w_int[i], np.float32), (sh, sw))
        (qy_lo, qy_hi), (qx_lo, qx_hi) = packed_layer_taps(spec, i, (sh, sw))
        packed_w.append((jnp.asarray(wp, jnp.bfloat16),
                         (qy_lo, qx_lo), (qy_hi, qx_hi)))

    shortcut = None
    for i in range(L):
        z_eff = float(qp.effective_zero(i))
        if i == 0:
            x_qi = h.astype(jnp.float32)
        elif i < L - 1:
            x_qi = jnp.clip(jnp.round(h + jnp.float32(qp.a_zero[i])),
                            qmin, qmax)
        else:
            # corrected integer residual add (quant/integer.py
            # _quantize_domain_in, corrected=True); with narrow_store the
            # shortcut is already its rounded value (round is idempotent)
            t = jnp.round(shortcut) + jnp.round(h)
            t = apply_requant_f32(t, qp.res_requant_m, qp.res_requant_n)
            x_qi = jnp.clip(jnp.round(t + jnp.float32(qp.a_zero[i])),
                            qmin, qmax)
        if narrow_store and i > 0:
            # int8 layer boundary: exact, and the tensor XLA materializes
            # in HBM between the conv fusions shrinks 4x
            x_qi = x_qi.astype(jnp.int8).astype(jnp.float32)
        x_shift = x_qi - jnp.float32(z_eff)
        if i == 0 and entry == "strided":
            # full-resolution strided entry conv: its zero padding IS the
            # masked packed path's pad-cell handling (both convolve the
            # same zero-extended shifted field), so no mask here
            y = strided_entry_conv(x_shift.astype(jnp.bfloat16),
                                   packed_w[0][0], spec.kernel_sizes[0],
                                   (sh, sw)).astype(jnp.int32)
        else:
            if mask is not None:
                cpl = x_shift.shape[-1] // (sh * sw)
                x_shift = x_shift * jnp.repeat(mask, cpl, axis=-1)[None]

            wp, q_lo, q_hi = packed_w[i]
            x_c, h_v, w_v = _halo_extend(x_shift.astype(jnp.bfloat16),
                                         q_lo, q_hi, halo_axis)
            y = packed_conv_same(x_c, wp, q_lo, q_hi,
                                 w_valid=w_v, h_valid=h_v).astype(jnp.int32)
        y = saturate(y, hw.pe_add_bits)
        fused = np.clip(np.asarray(qp.bias_int[i]), -bias_hi - 1, bias_hi)
        fused_p = jnp.asarray(np.tile(fused, sh * sw), jnp.int32)
        y = y + fused_p
        h = apply_requant_f32(y, qp.requant_m[i], qp.requant_n[i])
        if i == 0:
            h = jax.nn.relu(h)
            # the residual add only consumes round(shortcut)
            # (quan_func.py:250 semantics, corrected form), so the int16
            # store of the ROUNDED value is exact for it (round is
            # idempotent; the certified branch magnitude is bounded
            # against 2^15 by quant/certify.py). Layer 1, however, must
            # see the UNROUNDED requant output: banker's rounding does
            # not commute with the integer zero shift at .5 boundaries
            # (round(y+z) != round(y)+z for odd z when frac(y)=0.5 —
            # caught by the certify packed-equality obligation on
            # nrdm_3), so h stays wide here and layer 1's int8 x_q store
            # remains the materialized boundary.
            shortcut = jnp.round(h)
            if narrow_store:
                shortcut = shortcut.astype(jnp.int16).astype(jnp.float32)
        elif i < L - 1:
            h = jax.nn.relu(h)

    zero_L, scale_L = qp.a_zero[L], qp.a_scale[L]
    out_q = jnp.clip(jnp.round(h + jnp.float32(zero_L)), qmin, qmax)
    # int8 through the (fused) output transpose: 4x less relayout traffic,
    # and d2s ∘ PixelShuffle is one permutation instead of two round-trips
    r = spec.scaling_factor if spec.has_pixel_shuffle else 1
    img = packed_to_image_nhwc(out_q.astype(jnp.int8), (sh, sw), r)
    img = img[:, :H * r, :W * r, :]
    if out_dtype == "int8":
        # deployment output contract: the quantized image itself (the
        # caller dequantizes with (qp.a_zero[L], qp.a_scale[L]) — or feeds
        # a display/encoder path directly); skips the 4x-wider f32
        # full-resolution HBM write of the default contract
        return img
    return (img.astype(jnp.float32) - jnp.float32(zero_L)) \
        * jnp.float32(scale_L)


def packed_fast_forward(spec: SESRSpec, qp: QuantParams, x,
                        s: SLike = FAST_DEFAULT_CELLS,
                        halo_axis=None, out_dtype: str = "f32",
                        entry: str = "auto"):
    """Channel-packed deployment forward (XLA). x: NHWC float in [0, 1].

    ``out_dtype``: "f32" (default — dequantized image, the scoring
    contract) or "int8" (the raw quantized image; dequantize with
    (qp.a_zero[L], qp.a_scale[L]) — skips the full-resolution f32 HBM
    write for consumers that want bytes anyway).

    Bit-identical to integer_forward(..., corrected=True, compute="fast")
    — the certified saturation-free deployment datapath — with every conv
    running on an (s_h*s_w)-wider channel axis. Requires a certified
    artifact for the same reason the fast path does (quant/certify.py).

    ``s``: cell size, an int (square) or (s_h, s_w). Default
    FAST_DEFAULT_CELLS = (1, 8): W-only cells, 128-channel interior
    convs, entry/exit packing by pure reshape — ties (2, 4) at 540p and
    wins +44-71% at 1080p/4K/batch>1 on a TPU v5e (interleaved medians,
    tools/bench_probe_r3{h,i}.py; earlier A/Bs: 2x4 621 > 4x2 587 >
    4x4 416).

    ``halo_axis``: mesh axis name for W-sharded execution inside shard_map
    (see parallel/tiling.py sharded_packed_forward).
    """
    from sesr_tpu.quant.integer import _hashable

    if not getattr(qp, "fast_cert_ok", False):
        raise ValueError(
            "packed_fast_forward requires a certified QuantParams "
            "(quant/certify.py): it lowers the certified fast datapath.")
    x = jnp.asarray(x, jnp.float32)
    return _packed_fast_impl(spec, x, _hashable(qp), _s2(s), True, halo_axis,
                             out_dtype, entry)


@functools.partial(jax.jit, static_argnums=(0, 2, 3, 4, 5, 6, 7, 8))
def _packed_exact_impl(spec: SESRSpec, x, qp_static, s: SLike,
                       corrected: bool, fast_layers=None, halo_axis=None,
                       out_dtype: str = "f32", narrow_store: bool = False):
    """PE-EXACT packed forward: the full ASIC datapath — per-PE channel
    round-robin split, zero restoration, 18-bit per-PE saturation, 20-bit
    adder, unfloored-zero fused bias (quan_func.py:298-491) — with every
    conv on the packed channel axis. Unlike the fast path this needs NO
    saturation-freedom certificate: the clamps are computed, not assumed,
    so it is bit-exact with quant/integer.py on EVERY task including the
    ones that genuinely saturate (nr, nrdm_6).

    The PE split commutes with packing: PE p owns original input channels
    c % PE == p, so masking the original HWIO kernel before pack_weight_hwio
    yields the packed kernel of exactly PE p's partial conv, and summing a
    channel subset in f32 equals the masked conv exactly.

    fast_layers (static tuple of bool, or None): the LAYER-HYBRID mode.
    Layers flagged True run the fast lowering (ONE dense conv, no per-PE
    18-bit stage — 4x fewer matmuls); layers flagged False keep the full
    per-PE split. Bit-identical to the all-exact path whenever every True
    layer is certified 18-bit-saturation-free at its actual inputs
    (quant/certify.py stamps qp.fast_cert_layers; the 20-bit adder clamp is
    applied identically either way, so 20-bit events don't disqualify).

    narrow_store (corrected mode only): materialize the inter-layer
    boundaries as int8 (x_q IS integral in [-2^7, 2^7-1] by construction —
    exact for EVERY layer, stamped or not) and the residual shortcut as
    int16 round(shortcut). The int8 stores need no certificate; the int16
    shortcut store is only requested by callers holding the static
    wrap-free proof (qp.shortcut_static; quant/certify.py
    static_shortcut_bound hulls both lowering forms) — the fast path's
    measured HBM win (round-2) extended to the hybrid lowering
    (round-3 verdict item 4).
    """
    from sesr_tpu.quant.integer import (_pe_weight_masks, _quantize_domain_in,
                                        _requant_out)

    qp = qp_static
    hw = qp.hw
    L = spec.num_convs
    sh, sw = _s2(s)
    cells = sh * sw

    n, H, W, c_in = x.shape
    if halo_axis is not None:
        assert H % sh == 0 and W % sw == 0, (
            "sharded packed execution needs cell-aligned local shards")
    hp, wpad = -(-H // sh) * sh, -(-W // sw) * sw
    mask = _pad_mask(spec, H, W, (sh, sw))

    x = jnp.pad(x, ((0, 0), (0, hp - H), (0, wpad - W), (0, 0)))
    h = space_to_depth_nhwc(x, (sh, sw))

    layer_consts = []
    for i in range(L):
        z_eff = qp.effective_zero(i)
        (qy_lo, qy_hi), (qx_lo, qx_hi) = packed_layer_taps(spec, i, (sh, sw))
        is_fast = fast_layers is not None and fast_layers[i]
        if is_fast:
            # hybrid fast layer: one dense conv, skip the 18-bit stage
            splits = [np.asarray(qp.w_int[i])]
        else:
            splits = _pe_weight_masks(np.asarray(qp.w_int[i]), hw.pe)
        # Exact layers whose per-PE packed OC underfills the MXU's 128
        # output lanes (nr/nrdm_6 last convs: Cp_out=24 -> 19% fill) run as
        # ONE conv with the PE kernels concatenated along OC
        # ([PE0|PE1|...]) and the partial sums recovered by channel
        # slicing — identical values at ~4x the lane fill (measured: nr
        # hybrid 416 -> 543 Mpx/s). Full-width layers (Cp_out >= 128) keep
        # the per-PE conv loop: concatenating them materializes a 4x-wider
        # int32 intermediate (~133 MB at 540x960) that XLA cannot fuse
        # into the accumulate, measured 30% SLOWER.
        packed_splits = [pack_weight_hwio(w_p.astype(np.float32), (sh, sw))
                         for w_p in splits]
        zsums = [np.tile(w_p.sum(axis=(0, 1, 2)) * z_eff, cells)
                 for w_p in splits]
        cp_out = packed_splits[0].shape[3]
        if len(splits) > 1 and cp_out * len(splits) <= 128:
            pe = ("cat", len(splits),
                  jnp.asarray(np.concatenate(packed_splits, axis=3),
                              jnp.bfloat16),
                  jnp.asarray(np.concatenate(zsums), jnp.int32))
        else:
            pe = ("loop", [(jnp.asarray(w, jnp.bfloat16),
                            jnp.asarray(z, jnp.int32))
                           for w, z in zip(packed_splits, zsums)])
        if corrected:
            hi = (1 << (hw.bias_bits - 1)) - 1
            fused = np.clip(np.asarray(qp.bias_int[i]), -hi - 1, hi)
        else:
            fused = qp.fused_bias(i)
        layer_consts.append((pe, is_fast, (qy_lo, qx_lo), (qy_hi, qx_hi),
                             jnp.asarray(np.tile(fused, cells), jnp.int32)))

    assert not (narrow_store and not corrected), \
        "narrow stores are a corrected-datapath feature"
    shortcut = None
    for i in range(L):
        x_q, x_shift = _quantize_domain_in(h, i, L, qp, shortcut, corrected)
        if narrow_store:
            # int8 layer boundary (exact: x_q is clip(round(.)) into the
            # int8 range); the tensor XLA materializes between the conv
            # fusions shrinks 4x — same store as _packed_fast_impl's
            x_q = x_q.astype(jnp.int8).astype(jnp.float32)
            x_shift = x_q - jnp.float32(qp.effective_zero(i))
        if mask is not None:
            cpl = x_shift.shape[-1] // cells
            x_shift = x_shift * jnp.repeat(mask, cpl, axis=-1)[None]

        pe, is_fast, q_lo, q_hi, fused = layer_consts[i]
        x_c, h_v, w_v = _halo_extend(x_shift.astype(jnp.bfloat16),
                                     q_lo, q_hi, halo_axis)
        if pe[0] == "cat":
            _, n_pe, wp_cat, zsum_cat = pe
            y_all = packed_conv_same(x_c, wp_cat, q_lo, q_hi,
                                     w_valid=w_v, h_valid=h_v
                                     ).astype(jnp.int32)
            if not corrected:
                y_all = y_all + zsum_cat
            # cat is only selected for multi-split (exact) layers, so the
            # per-PE 18-bit stage always applies here
            y_all = saturate(y_all, hw.pe_acc_bits)
            co = y_all.shape[-1] // n_pe
            total = sum(y_all[..., p * co:(p + 1) * co] for p in range(n_pe))
        else:
            total = None
            for (wp, zsum) in pe[1]:
                y_p = packed_conv_same(x_c, wp, q_lo, q_hi,
                                       w_valid=w_v, h_valid=h_v
                                       ).astype(jnp.int32)
                if not corrected:
                    y_p = y_p + zsum
                if not is_fast:      # per-PE 18-bit stage (exact layers,
                    y_p = saturate(y_p, hw.pe_acc_bits)  # incl. pe=1)
                total = y_p if total is None else total + y_p
        y = saturate(total, hw.pe_add_bits) + fused
        h, extras = _requant_out(y, i, L, qp)
        if i == 0:
            shortcut = extras["shortcut"]
            if narrow_store:
                # the residual add only consumes round(shortcut) (both
                # _quantize_domain_in forms; round is idempotent and
                # round(x - 128) == round(x) - 128), so the int16 store of
                # the ROUNDED value is exact given the static wrap-free
                # proof the caller checked (qp.shortcut_static)
                shortcut = jnp.round(shortcut).astype(jnp.int16) \
                    .astype(jnp.float32)
        if i < L - 1:
            h = jax.nn.relu(h)

    r = spec.scaling_factor if spec.has_pixel_shuffle else 1
    if out_dtype == "int8":
        # same output contract as the fast lowering: the raw quantized
        # image (dequantize with (qp.a_zero[L], qp.a_scale[L])); the final
        # relayout moves 4x fewer bytes and the full-resolution f32 HBM
        # write disappears
        out_q = extras["out_int8"].astype(jnp.int8)
        return packed_to_image_nhwc(out_q, (sh, sw), r)[:, :H * r, :W * r, :]
    return packed_to_image_nhwc(h, (sh, sw), r)[:, :H * r, :W * r, :]


def packed_exact_forward(spec: SESRSpec, qp: QuantParams, x,
                         s: SLike = (2, 4), corrected: bool = False,
                         halo_axis=None, out_dtype: str = "f32",
                         narrow_store: bool = False):
    """PE-exact integer forward on the packed channel axis.

    Bit-identical to integer_forward(spec, qp, x, corrected=corrected)
    (the reference-exact ASIC sim when corrected=False) at channel-packed
    MXU speed; needs no fast-mode certificate. x: NHWC float in [0, 1].
    ``halo_axis``: mesh axis name for W-sharded execution inside shard_map.
    ``out_dtype``: "f32" (dequantized, the scoring contract) or "int8"
    (the raw quantized image — same contract as packed_fast_forward's).
    ``narrow_store`` (corrected only): int8 inter-layer + int16 shortcut
    boundary stores — the int8 stores are exact unconditionally; the int16
    shortcut store needs the static wrap-free proof (qp.shortcut_static),
    which the caller is responsible for checking.
    """
    from sesr_tpu.quant.integer import _hashable

    if narrow_store and not corrected:
        raise ValueError("narrow_store requires the corrected datapath")
    x = jnp.asarray(x, jnp.float32)
    return _packed_exact_impl(spec, x, _hashable(qp), _s2(s), corrected,
                              None, halo_axis, out_dtype, narrow_store)


def packed_hybrid_forward(spec: SESRSpec, qp: QuantParams, x,
                          s: SLike = FAST_DEFAULT_CELLS, halo_axis=None,
                          out_dtype: str = "f32"):
    """LAYER-HYBRID packed deployment forward: the deployment path for
    tasks the fast mode must refuse because they genuinely saturate.

    Per-layer, runs the fast lowering (one dense conv) on layers the
    certificate proves 18-bit-saturation-free, and the full per-PE
    PE-exact split only on the saturating layers. nr and nrdm_6 saturate
    ONLY in their last conv (measured over the calibration set), so they
    run at near-fast speed while staying bit-identical to
    integer_forward(..., corrected=True) — certified end-to-end per
    calibration image by quant/certify.py, which stamps
    qp.fast_cert_layers. Requires a stamped artifact; with all layers
    stamped safe prefer packed_fast_forward (narrow int8 boundaries make
    it faster still). x: NHWC float in [0, 1]. ``out_dtype``: "f32" or
    "int8" (the raw quantized image, packed_fast_forward's contract).
    """
    from sesr_tpu.quant.integer import _hashable

    if getattr(qp, "fast_cert_layers", None) is None:
        raise ValueError(
            "packed_hybrid_forward requires per-layer certification stamps "
            "(quant/certify.py fast_cert_layers): the fast lowering of each "
            "flagged layer is only exact when its 18-bit saturation "
            "freedom is proven.")
    x = jnp.asarray(x, jnp.float32)
    # narrow int8/int16 boundary stores (the fast path's measured HBM win)
    # when the int16 shortcut store is PROVEN wrap-free for all inputs —
    # true for every shipped artifact; certify_fast's hybrid equality
    # obligation executes whatever this lowering does, so the stamp covers
    # the narrow program too
    narrow = bool(getattr(qp, "shortcut_static", False))
    return _packed_exact_impl(spec, x, _hashable(qp), _s2(s), True,
                              tuple(qp.fast_cert_layers), halo_axis,
                              out_dtype, narrow)


def select_packed_forward(qp: QuantParams):
    """(mode, fn): the fastest certificate-SOUND packed lowering for this
    artifact — "fast" when fully certified, "hybrid" when saturation is
    confined to stamped-unsafe layers, "pe-exact" otherwise (always sound,
    never refuses). All three fns share the signature
    fn(spec, qp, x, s=..., halo_axis=None, out_dtype="f32") with their s
    DEFAULT = default_cells(mode) (fast/hybrid: FAST_DEFAULT_CELLS;
    pe-exact: (2, 4)); sharded callers that need cell-aligned shards
    should pick s via resolve_cells. Single decision point for the CLI,
    the sharded/multihost builders, and anything else that serves
    arbitrary artifacts."""
    if getattr(qp, "fast_cert_ok", False):
        return "fast", packed_fast_forward
    layers = getattr(qp, "fast_cert_layers", None)
    if layers is not None and any(layers):
        return "hybrid", packed_hybrid_forward

    def exact(spec, qp, x, s=(2, 4), halo_axis=None, out_dtype="f32"):
        return packed_exact_forward(spec, qp, x, s, corrected=True,
                                    halo_axis=halo_axis, out_dtype=out_dtype)

    return "pe-exact", exact
