"""Spatial tiling over a TPU device mesh with per-layer halo exchange.

The reference's only notion of tiling is its export format: images processed
as 32-wide tiles whose valid region shrinks by kernel//2 per layer
(output.py:42-65, tile_width at :11). That same structure — tiles + per-layer
halo — is what scales this workload across chips: shard W across the `sp`
mesh axis and batch across `dp`; before every conv each shard exchanges its
k//2-column halo with its W-neighbours via `lax.ppermute` (ICI neighbours on
a TPU torus; see ops/halo.py for why the exchange must be per-layer, not one
big upfront halo) and convolves in valid-W mode.

Bit-exactness: the non-wrapping ppermute delivers ZEROS to edge shards —
exactly the zero padding the monolithic SAME conv applies at image borders —
so the sharded integer path is bit-identical to the single-device result
(tests/test_sharding.py asserts array equality).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from sesr_tpu.config import SESRSpec
from sesr_tpu.models.sesr import CollapsedParams, forward_float
from sesr_tpu.quant.integer import integer_forward
from sesr_tpu.quant.params import QuantParams


def make_mesh(n_devices: Optional[int] = None, dp: int = 1,
              sp: Optional[int] = None) -> Mesh:
    """Build a (dp, sp) mesh over the first dp*sp devices."""
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    if sp is None:
        sp = n_devices // dp
    assert dp * sp <= len(devs), f"need {dp*sp} devices, have {len(devs)}"
    arr = np.array(devs[: dp * sp]).reshape(dp, sp)
    return Mesh(arr, axis_names=("dp", "sp"))


def make_mesh_2d(dp: int = 1, sp_h: int = 2, sp_w: int = 2) -> Mesh:
    """(dp, sp_h, sp_w) mesh: batch x 2D spatial grid — the pod-scale analog
    of the reference's 2D tile walk (output.py:42-65)."""
    devs = jax.devices()
    need = dp * sp_h * sp_w
    assert need <= len(devs), f"need {need} devices, have {len(devs)}"
    arr = np.array(devs[:need]).reshape(dp, sp_h, sp_w)
    return Mesh(arr, axis_names=("dp", "sph", "spw"))


def sharded_integer_forward_2d(spec: SESRSpec, qp: QuantParams, mesh: Mesh,
                               **fwd_kwargs):
    """Bit-exact integer forward sharded (dp=batch, sph=H, spw=W) with
    per-layer 2D halo exchange (ops/halo.py halo_exchange_2d).

    f(x) for global x (N, H, W, C) with N % dp == H % sp_h == W % sp_w == 0.
    """

    def local_fn(x):
        y, _ = integer_forward(spec, qp, x, halo_axis=("sph", "spw"),
                               **fwd_kwargs)
        return y

    inner = shard_map(
        local_fn, mesh=mesh,
        in_specs=P("dp", "sph", "spw", None),
        out_specs=P("dp", "sph", "spw", None),
    )
    return jax.jit(inner)


def sharded_float_forward_2d(spec: SESRSpec, params: CollapsedParams,
                             mesh: Mesh):
    """FP32 forward sharded (dp, sph, spw) with per-layer 2D halo exchange."""

    def local_fn(x):
        return forward_float(spec, params, x, halo_axis=("sph", "spw"))

    inner = shard_map(
        local_fn, mesh=mesh,
        in_specs=P("dp", "sph", "spw", None),
        out_specs=P("dp", "sph", "spw", None),
    )
    return jax.jit(inner)


def _shard_dp_sp(mesh: Mesh, local_fn):
    """jit(shard_map(local_fn)) over the (dp=batch, sp=W) layout shared by
    every per-frame forward in this module."""
    inner = shard_map(
        local_fn, mesh=mesh,
        in_specs=P("dp", None, "sp", None),
        out_specs=P("dp", None, "sp", None),
    )
    return jax.jit(inner)


def _packed_local_fn(spec: SESRSpec, qp: QuantParams, s, fwd, mode: str,
                     out_dtype: str = "f32", halo_axis="sp"):
    """local_fn for the packed sharded builders. s=None resolves the
    geometry per-shard via ops/packed.py resolve_cells — the measured
    default_cells(mode) when the local shard is cell-aligned, else the
    first certified geometry that divides it (the x shape is concrete at
    shard_map trace time, so the choice is static)."""
    from sesr_tpu.ops.packed import resolve_cells

    h_sharded = isinstance(halo_axis, tuple) and halo_axis[0] is not None

    def local_fn(x):
        s_eff = s if s is not None else resolve_cells(
            mode, x.shape[1], x.shape[2], getattr(qp, "cert_cells", None),
            h_sharded=h_sharded)
        return fwd(spec, qp, x, s=s_eff, halo_axis=halo_axis,
                   out_dtype=out_dtype)
    return local_fn


def sharded_deployment_forward_2d(spec: SESRSpec, qp: QuantParams,
                                  mesh: Mesh, s=None, out_dtype="f32"):
    """The channel-packed deployment datapath on the 2D spatial mesh
    (dp=batch, sph=H, spw=W) — the pod-scale layout for large frames,
    mirroring the reference's own 2D tile walk (output.py:42-65). Each
    layer's packed conv exchanges its tap-reach halo along BOTH spatial
    axes (one cell at s >= 2; TWO cells along an s=1 axis under k=5, so
    the (1,8) default serves this mesh since round 5 — corners via the
    two-hop H-then-W exchange, ops/halo.py). Requires
    cell-aligned local shards (H_local % s_h == W_local % s_w == 0);
    s=None picks the measured default for the certificate-selected
    lowering, falling back to the first certified geometry that divides
    the shard (resolve_cells); out_dtype="int8" serves the raw quantized
    image; bit-identical to the monolithic path (tests/test_sharding.py).
    """
    from sesr_tpu.ops.packed import select_packed_forward

    mode, fwd = select_packed_forward(qp)
    inner = shard_map(
        _packed_local_fn(spec, qp, s, fwd, mode, out_dtype,
                         halo_axis=("sph", "spw")),
        mesh=mesh,
        in_specs=P("dp", "sph", "spw", None),
        out_specs=P("dp", "sph", "spw", None),
    )
    return jax.jit(inner)


def sharded_deployment_forward(spec: SESRSpec, qp: QuantParams, mesh: Mesh,
                               s=None, out_dtype="f32"):
    """The channel-packed deployment datapath sharded (dp=batch, sp=W),
    through whatever lowering the artifact's certificate allows (fast /
    layer-hybrid / PE-exact — ops/packed.py select_packed_forward), with
    each layer's packed conv exchanging its one-cell W halo over ICI (vs
    k//2 pixels unpacked — packing also shrinks the collective payload).
    Requires cell-aligned shards; s=None resolves via resolve_cells (the
    measured default when it divides, certified fallback otherwise);
    out_dtype="int8" serves the raw quantized image; bit-identical to the
    monolithic path (tests/test_sharding.py)."""
    from sesr_tpu.ops.packed import select_packed_forward

    mode, fwd = select_packed_forward(qp)
    return _shard_dp_sp(mesh, _packed_local_fn(spec, qp, s, fwd, mode,
                                               out_dtype))


def sharded_packed_forward(spec: SESRSpec, qp: QuantParams, mesh: Mesh,
                           s=None, out_dtype="f32"):
    """sharded_deployment_forward pinned to the FAST lowering (refuses
    uncertified artifacts, like packed_fast_forward)."""
    from sesr_tpu.ops.packed import packed_fast_forward

    return _shard_dp_sp(mesh, _packed_local_fn(spec, qp, s,
                                               packed_fast_forward, "fast",
                                               out_dtype))


def sharded_hybrid_forward(spec: SESRSpec, qp: QuantParams, mesh: Mesh,
                           s=None, out_dtype="f32"):
    """sharded_deployment_forward pinned to the LAYER-HYBRID lowering (the
    saturating tasks nr/nrdm_6: PE-exact on the certificate's unsafe
    layers, fast elsewhere; requires per-layer stamps)."""
    from sesr_tpu.ops.packed import packed_hybrid_forward

    return _shard_dp_sp(mesh, _packed_local_fn(spec, qp, s,
                                               packed_hybrid_forward,
                                               "hybrid", out_dtype))


def sharded_integer_forward(spec: SESRSpec, qp: QuantParams, mesh: Mesh):
    """Build a jitted bit-exact integer forward sharded (dp=batch, sp=W).

    Returns f(x) for global x of shape (N, H, W, C) with N % dp == 0 and
    W % sp == 0; the output keeps the same sharding.
    """

    def local_fn(x):
        y, _ = integer_forward(spec, qp, x, halo_axis="sp")
        return y

    inner = shard_map(
        local_fn, mesh=mesh,
        in_specs=P("dp", None, "sp", None),
        out_specs=P("dp", None, "sp", None),
    )
    return jax.jit(inner)


def sharded_float_forward(spec: SESRSpec, params: CollapsedParams, mesh: Mesh):
    """FP32 forward sharded (dp=batch, sp=W) with per-layer halo exchange."""

    def local_fn(x):
        return forward_float(spec, params, x, halo_axis="sp")

    inner = shard_map(
        local_fn, mesh=mesh,
        in_specs=P("dp", None, "sp", None),
        out_specs=P("dp", None, "sp", None),
    )
    return jax.jit(inner)


def sharded_calibrate(spec: SESRSpec, params, images, mesh: Mesh,
                      hw=None, **finalize_kwargs):
    """Distributed PTQ calibration: the fake-quant forward runs sharded
    (dp=batch, sp=W) with per-layer halo exchange; observer min/max reduce
    over the whole mesh with pmin/pmax, so the resulting QuantParams match
    single-device calibration (tests/test_sharding.py asserts equality up to
    f32 conv reassociation).

    This is the pod-scale replacement for the reference's per-call
    torch.load/save observer files (quan_func.py:181-196): N chips calibrate
    N shards of each image concurrently, with two collectives per layer.
    """
    import numpy as np
    from sesr_tpu.config import DEFAULT_HW
    from sesr_tpu.quant.calibrate import (_calibration_forward_impl,
                                          _prep_fq_weights)
    from sesr_tpu.quant.params import CalibState, finalize

    hw = hw or DEFAULT_HW
    fq_weights, w_int, w_scale = _prep_fq_weights(params, hw)
    L = spec.num_convs

    def local_fn(x):
        _, minmax = _calibration_forward_impl(
            spec, fq_weights, x, hw, True, None, False, ("dp", "sp"))
        return minmax                                   # replicated across mesh

    inner = jax.jit(shard_map(
        local_fn, mesh=mesh,
        in_specs=P("dp", None, "sp", None),
        out_specs=P(),                                  # pmin/pmax replicate
        check_vma=False,
    ))

    calib = CalibState.fresh(L + 1)
    for img in images:
        mm = np.asarray(inner(jnp.asarray(img, jnp.float32)), np.float64)
        for d in range(L + 1):
            calib.update(d, mm[0, d], mm[1, d])
    return finalize(spec, w_int, w_scale,
                    [np.asarray(b) for b in params.biases], calib, hw,
                    **finalize_kwargs)
