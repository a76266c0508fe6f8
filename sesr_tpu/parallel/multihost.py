"""Multi-host frame/tile batching: DCN for data distribution, ICI for halos.

The scaling recipe (SURVEY §7 step 6, BASELINE "~linear at 1 chip -> 1 host
-> N hosts"): the mesh's outermost axis enumerates HOSTS in process-major
device order — JAX's `jax.devices()` is already process-major, so axis
"host" boundaries coincide with DCN boundaries. Work is laid out so that

- the "host" and "dp" axes carry only DATA PLACEMENT (each host feeds its
  own frames; no collective ever crosses them during inference), and
- the per-layer conv halo exchanges (ops/halo.py) run only over the
  innermost "sp" axis — chips within one host, i.e. pure ICI ppermutes.

That is the whole DCN story for this workload: inference needs zero
cross-host communication (weights are replicated once — a few KB of int8
per SESRSpec), so host scaling is embarrassingly parallel frame batching,
and the only latency-critical collectives ride ICI. Training reuses the
same mesh with gradient psum over ("host", "dp") — the standard
DCN-data-parallel / ICI-spatial split.

The reference has no distributed execution at all (SURVEY §2: torch
.distributed imported and never used, quantize_utils_cuda.py:6); its only
tiling notion is the single-device export walk (output.py:42-65).

Single-process validation: the host axis is logical — collectives and
shardings behave identically whether its boundaries are real DCN links or
a virtual grouping, so the 8-device CPU mesh tests (tests/test_sharding.py)
pin the exact communication pattern that runs on a real pod.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from sesr_tpu.config import SESRSpec
from sesr_tpu.quant.integer import integer_forward
from sesr_tpu.quant.params import QuantParams


def make_mesh_multihost(n_hosts: Optional[int] = None, dp: int = 1,
                        sp: Optional[int] = None) -> Mesh:
    """("host", "dp", "sp") mesh, host axis outermost (process-major).

    On a real multi-host platform n_hosts defaults to jax.process_count()
    and each host contributes its local devices; on a single process it
    defaults to 1 (pass an explicit n_hosts to validate the pattern on a
    virtual mesh).
    """
    devs = jax.devices()
    if n_hosts is None:
        n_hosts = jax.process_count()
    per_host = len(devs) // n_hosts
    if sp is None:
        sp = per_host // dp
    assert dp * sp <= per_host, (
        f"dp*sp={dp*sp} must fit within one host's {per_host} devices so "
        "halo exchanges never cross DCN")
    need = n_hosts * dp * sp
    assert need <= len(devs), f"need {need} devices, have {len(devs)}"
    arr = np.array(devs[:need]).reshape(n_hosts, dp, sp)
    return Mesh(arr, axis_names=("host", "dp", "sp"))


def multihost_integer_forward(spec: SESRSpec, qp: QuantParams, mesh: Mesh,
                              **fwd_kwargs):
    """Bit-exact integer forward with frames batched over (host, dp) and W
    sharded over sp. Halos ppermute over "sp" ONLY (ICI); the host axis is
    pure data placement — no cross-DCN collective exists in the program.
    """

    def local_fn(x):
        y, _ = integer_forward(spec, qp, x, halo_axis="sp", **fwd_kwargs)
        return y

    inner = shard_map(
        local_fn, mesh=mesh,
        in_specs=P(("host", "dp"), None, "sp", None),
        out_specs=P(("host", "dp"), None, "sp", None),
    )
    return jax.jit(inner)


def multihost_packed_forward(spec: SESRSpec, qp: QuantParams, mesh: Mesh,
                             s=None, out_dtype="f32", force_mode=None):
    """The DEPLOYMENT (channel-packed) datapath at pod scale: frames over
    (host, dp), W over sp with one-cell ICI halos. Picks the fastest sound
    lowering the artifact's certificate allows — fast when fully
    certified, layer-hybrid when saturation is confined to stamped layers,
    PE-exact otherwise (always sound, never refuses). s=None resolves the
    measured default_cells geometry against the local shard shape
    (ops/packed.py resolve_cells; certified fallback when it doesn't
    divide); out_dtype="int8" serves the raw quantized image.

    force_mode="pe-exact" overrides the certificate selection with the
    unconditionally-sound lowering — the degraded mode the OOD saturation
    audit (quant/audit.py) falls back to. Only the sound override is
    allowed: forcing a FASTER mode than the certificate grants would
    bypass the stamps."""
    from sesr_tpu.ops.packed import (packed_exact_forward, resolve_cells,
                                     select_packed_forward)

    if force_mode is None:
        mode, fwd = select_packed_forward(qp)
    elif force_mode == "pe-exact":
        mode = "pe-exact"

        def fwd(spec, qp, x, s=(2, 4), halo_axis=None, out_dtype="f32"):
            return packed_exact_forward(spec, qp, x, s, corrected=True,
                                        halo_axis=halo_axis,
                                        out_dtype=out_dtype)
    else:
        raise ValueError(f"force_mode={force_mode!r}: only the sound "
                         "'pe-exact' override is allowed")

    def local_fn(x):
        s_eff = s if s is not None else resolve_cells(
            mode, x.shape[1], x.shape[2], getattr(qp, "cert_cells", None))
        return fwd(spec, qp, x, s=s_eff, halo_axis="sp", out_dtype=out_dtype)

    inner = shard_map(
        local_fn, mesh=mesh,
        in_specs=P(("host", "dp"), None, "sp", None),
        out_specs=P(("host", "dp"), None, "sp", None),
    )
    return jax.jit(inner)


def make_mesh_multihost_2d(n_hosts: Optional[int] = None, dp: int = 1,
                           sp_h: int = 2, sp_w: int = 2) -> Mesh:
    """("host", "dp", "sph", "spw") mesh: hosts outermost (pure DCN data
    placement), 2D spatial grid innermost (ICI halos along both axes)."""
    devs = jax.devices()
    if n_hosts is None:
        n_hosts = jax.process_count()
    per_host = len(devs) // n_hosts
    assert dp * sp_h * sp_w <= per_host, (
        f"dp*sp_h*sp_w={dp * sp_h * sp_w} must fit within one host's "
        f"{per_host} devices so halo exchanges never cross DCN")
    need = n_hosts * dp * sp_h * sp_w
    assert need <= len(devs), f"need {need} devices, have {len(devs)}"
    arr = np.array(devs[:need]).reshape(n_hosts, dp, sp_h, sp_w)
    return Mesh(arr, axis_names=("host", "dp", "sph", "spw"))


def multihost_packed_forward_2d(spec: SESRSpec, qp: QuantParams, mesh: Mesh,
                                s=None, out_dtype="f32"):
    """The deployment datapath at pod scale on the 2D spatial mesh: frames
    over (host, dp), H over sph, W over spw; per-layer packed tap-reach
    halos ride ICI only (both axes live within a host), the host axis
    stays collective-free. Certificate-selected lowering; cell-aligned
    local shards required (s=None resolves the measured default with
    certified fallback, resolve_cells); out_dtype="int8" serves the raw
    quantized image."""
    from sesr_tpu.ops.packed import resolve_cells, select_packed_forward

    mode, fwd = select_packed_forward(qp)

    def local_fn(x):
        s_eff = s if s is not None else resolve_cells(
            mode, x.shape[1], x.shape[2], getattr(qp, "cert_cells", None),
            h_sharded=True)
        return fwd(spec, qp, x, s=s_eff, halo_axis=("sph", "spw"),
                   out_dtype=out_dtype)

    inner = shard_map(
        local_fn, mesh=mesh,
        in_specs=P(("host", "dp"), "sph", "spw", None),
        out_specs=P(("host", "dp"), "sph", "spw", None),
    )
    return jax.jit(inner)


def frame_batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for a global (N, H, W, C) frame batch on a multihost mesh."""
    return NamedSharding(mesh, P(("host", "dp"), None, "sp", None))


def multihost_tail_forward(spec: SESRSpec, qp: QuantParams, mesh: Mesh,
                           lowering: str = "interpreter", **fwd_kwargs):
    """The second compiled shape for PARTIAL final batches: frames are
    batched over the host axis only, and each frame's W is sharded over the
    COMBINED ("dp", "sp") axis group — every chip still does useful work,
    so a stream tail of k frames costs ceil(k/host) frame-times instead of
    a full padded host*dp batch of recompute. The combined axes live within
    one host (mesh layout make_mesh_multihost), so the wider halo ppermutes
    still ride ICI only and the host axis stays collective-free.

    Returns f(x) for global x (N, H, W, C) with N % host == 0 and
    W % (dp*sp) == 0 (cell-aligned per shard in deployment mode)."""
    w_axes = ("dp", "sp")
    if lowering == "deployment":
        from sesr_tpu.ops.packed import (packed_exact_forward, resolve_cells,
                                         select_packed_forward)
        fwd_kwargs = dict(fwd_kwargs)
        forced = fwd_kwargs.pop("force_mode", None)
        if forced is None:
            mode, pf = select_packed_forward(qp)
        elif forced == "pe-exact":
            # honor the caller-forced sound mode on the tail too — the
            # certificate-selected lowering would bypass it (round-5
            # review; same contract as multihost_packed_forward)
            mode = "pe-exact"

            def pf(spec, qp, x, s=(2, 4), halo_axis=None, out_dtype="f32"):
                return packed_exact_forward(spec, qp, x, s, corrected=True,
                                            halo_axis=halo_axis,
                                            out_dtype=out_dtype)
        else:
            raise ValueError(f"force_mode={forced!r}: only the sound "
                             "'pe-exact' override is allowed")
        s = fwd_kwargs.pop("s", None)

        def local_fn(x):
            # the tail's W shard is dp*sp-fine, so the measured default
            # geometry may not divide it — resolve against the ACTUAL
            # local shape (static at shard_map trace time), falling back
            # through the certified set instead of hard-pinning (2,4)
            s_eff = s if s is not None else resolve_cells(
                mode, x.shape[1], x.shape[2],
                getattr(qp, "cert_cells", None))
            return pf(spec, qp, x, s=s_eff, halo_axis=(None, w_axes),
                      **fwd_kwargs)
    else:
        def local_fn(x):
            y, _ = integer_forward(spec, qp, x, halo_axis=(None, w_axes),
                                   **fwd_kwargs)
            return y

    inner = shard_map(
        local_fn, mesh=mesh,
        in_specs=P("host", None, w_axes, None),
        out_specs=P("host", None, w_axes, None),
    )
    return jax.jit(inner)


def stream_frames(spec: SESRSpec, qp: QuantParams, mesh: Mesh, frames,
                  lowering: str = "interpreter", frames_per_chip: int = 1,
                  audit_every: int = 0, audit_log=None,
                  **fwd_kwargs):
    """Continuous frame batching: group the frame iterator into global
    batches of host*dp*frames_per_chip frames and run them through the
    multihost forward. Yields output batches. On a real pod each process
    only materializes its local shard (device_put to the global sharding);
    single-process, device_put shards the full array.

    lowering: "interpreter" (the bit-exact reference-semantics path,
    default — also accepts integer_forward kwargs like corrected=True) or
    "deployment" (the channel-packed MXU datapath via
    multihost_packed_forward, certificate-selected fast/hybrid/PE-exact;
    fwd_kwargs then takes `s=` cells and `out_dtype=`). Requires
    cell-aligned local W shards in deployment mode; with no explicit s
    the measured default geometry is resolved per shard (resolve_cells,
    certified fallback when it doesn't divide — no hard-pinned (2,4)).

    frames_per_chip > 1 is the THROUGHPUT serving mode: each chip batches
    that many frames per dispatch (r3i/r4 measured batch-8 ABOVE the
    single-frame rate at the (1,8) default — see BASELINE.md); batch 1
    stays the latency config.

    The final PARTIAL batch does NOT recompute padded frames: at
    frames_per_chip == 1 it runs through multihost_tail_forward (batch
    over hosts only, W over the combined (dp, sp) axes), padding at most
    host-1 frames instead of host*dp-1. When the frame cannot shard that
    finely (no certified cell geometry divides W/(dp*sp)), or in the
    batched mode (whose tail is at most one extra dispatch), it falls
    back to the padded full batch.

    audit_every=N (deployment lowering only): every Nth batch is ALSO run
    through the sound PE-exact interpreter with the overflow counters
    (quant/audit.py audit_frame). On an 18-bit event in an
    empirically-stamped layer — the out-of-distribution case the stamps
    cannot cover — the stream warns (OODSaturationWarning), RE-SERVES the
    failed batch through the PE-exact lowering, and degrades the rest of
    the stream to that sound path. A statically-graded artifact has no
    empirical trust, so its audit passes trivially and is skipped.
    ``audit_log``: optional list; (batch_index, serving_mode, AuditResult)
    tuples are appended for observability."""
    audit_trusted = ()
    serving_mode = lowering
    if lowering == "deployment":
        fwd = multihost_packed_forward(spec, qp, mesh, **fwd_kwargs)
        if audit_every > 0:
            from sesr_tpu.ops.packed import select_packed_forward
            from sesr_tpu.quant.audit import empirically_trusted_layers
            # a caller-forced mode (force_mode in fwd_kwargs) IS the
            # serving mode — auditing a forced pe-exact stream would be
            # spurious, and the degrade path below must not pass
            # force_mode twice
            forced = fwd_kwargs.get("force_mode")
            serving_mode = forced or select_packed_forward(qp)[0]
            audit_trusted = empirically_trusted_layers(qp, serving_mode)
    else:
        fwd = multihost_integer_forward(spec, qp, mesh, **fwd_kwargs)
    sh = frame_batch_sharding(mesh)
    n_host, dp, sp = (mesh.shape["host"], mesh.shape["dp"], mesh.shape["sp"])
    assert frames_per_chip >= 1
    n = n_host * dp * frames_per_chip

    batch_idx = 0
    degraded = False

    def serve(x_np):
        """One audited dispatch; may degrade self to the sound path."""
        nonlocal fwd, serving_mode, audit_trusted, degraded
        x = jax.device_put(jnp.asarray(x_np), sh)
        y = fwd(x)
        if audit_trusted and batch_idx % audit_every == 0:
            from sesr_tpu.quant.audit import audit_frame
            out_dtype = fwd_kwargs.get("out_dtype", "f32")
            res = audit_frame(spec, qp, x_np,
                              y_served=y if out_dtype == "f32" else None,
                              mode=serving_mode)
            if audit_log is not None:
                audit_log.append((batch_idx, serving_mode, res))
            if not res.ok:
                # degrade: the sound lowering for this and all later batches
                kw = {k: v for k, v in fwd_kwargs.items()
                      if k != "force_mode"}
                fwd = multihost_packed_forward(spec, qp, mesh,
                                               force_mode="pe-exact",
                                               **kw)
                serving_mode = "pe-exact"
                audit_trusted = ()
                degraded = True
                y = fwd(x)
        elif audit_log is not None and audit_every > 0 \
                and lowering == "deployment" \
                and batch_idx % audit_every == 0:
            # nothing left to audit (degraded, statically graded, or
            # pe-exact serving) — record the sound mode for observability
            audit_log.append((batch_idx, serving_mode, None))
        return y

    buf = []
    for f in frames:
        buf.append(np.asarray(f, np.float32))
        if len(buf) == n:
            yield serve(np.concatenate(buf, axis=0))
            batch_idx += 1
            buf = []
    if buf:
        k = len(buf)
        H, W = buf[0].shape[1], buf[0].shape[2]
        # an audit-degraded stream must not hand its tail back to the
        # certificate-selected tail program — the padded fallback below
        # reuses the degraded fwd
        tail_ok = (dp > 1 and frames_per_chip == 1 and W % (dp * sp) == 0
                   and not degraded)
        if tail_ok and lowering == "deployment":
            from sesr_tpu.ops.packed import (resolve_cells,
                                             select_packed_forward)
            s = fwd_kwargs.get("s")
            if s is not None:
                s_h, s_w = (s, s) if isinstance(s, int) else s
                tail_ok = W % (dp * sp * s_w) == 0 and H % s_h == 0
            else:
                mode, _ = select_packed_forward(qp)
                try:
                    resolve_cells(mode, H, W // (dp * sp),
                                  getattr(qp, "cert_cells", None))
                except ValueError:
                    tail_ok = False
        if tail_ok:
            tail_n = -(-k // n_host) * n_host
            while len(buf) < tail_n:
                buf.append(np.zeros_like(buf[-1]))
            tail_fwd = multihost_tail_forward(spec, qp, mesh, lowering,
                                              **fwd_kwargs)
            tail_sh = NamedSharding(mesh, P("host", None, ("dp", "sp"),
                                            None))
            x = jax.device_put(jnp.concatenate(buf, axis=0), tail_sh)
            yield tail_fwd(x)[:k]
        else:
            # fall back: pad to a full batch and let the caller's slice
            # discard the repeats (static shape for the compiled fwd)
            while len(buf) < n:
                buf.append(buf[-1])
            x = jax.device_put(jnp.concatenate(buf, axis=0), sh)
            yield fwd(x)[:k]
