"""RTL test-vector exporters, byte-compatible with the reference's formats.

Re-implements the accelerator's hex stimulus/expected-response streams
(reference output.py and output_end2end.py) as pure functions over a
QuantParams + the integer interpreter's dump dict, instead of a script over
an output_pt/ file tree. Byte-compatibility is asserted against
reference-generated files in tests/test_export.py, so every formatting quirk
below is deliberate:

- the "input" tile stream pads H/W up to the NEXT multiple of 32 even when
  already divisible (output.py:55-56) but allocates the expansion buffer
  with the ORIGINAL height (:58);
- the first tile row/column uses the shrunken overlap width (tile_width
  minus the cumulative kernel//2 halo, :64-65,74-84), the last height block
  the remaining rows (:86-90);
- pe_out/pe_add streams stop a 32-row block early when the true image height
  ends (:189-190, :231-232);
- the end-to-end stream indexes height blocks WITHOUT multiplying by the
  tile width (output_end2end.py:63,94) — an upstream bug kept for byte
  parity.

Weight hex export (the 4x4 oc/ic interleaved stream of quan_func.py:82-111)
lives here too.
"""

from __future__ import annotations

import math
import os
from typing import Dict, List

import numpy as np

from sesr_tpu.config import HardwareConfig
from sesr_tpu.ops.fixedpoint import int_to_hex
from sesr_tpu.quant.params import QuantParams

TILE = 32


def _nchw(a) -> np.ndarray:
    """Dump arrays are NHWC; the hex formats are channel-major."""
    a = np.asarray(a)
    return a.transpose(0, 3, 1, 2)


def export_weights(qp: QuantParams) -> Dict[str, str]:
    """conv.weight.{i}.txt: header line count, then 16-value lines covering
    4-oc x 4-ic blocks per (kh, kw) tap, ic-major inside the line
    (quan_func.py:82-111). oc/ic padded up to multiples of 4."""
    out = {}
    for i, w_hwio in enumerate(qp.w_int):
        w = np.transpose(w_hwio, (3, 2, 0, 1))          # OIHW
        oc_r, ic_r, kh, kw = w.shape
        oc = math.ceil(oc_r / 4) * 4
        ic = math.ceil(ic_r / 4) * 4
        buf = np.zeros((oc, ic, kh, kw), np.int64)
        buf[:oc_r, :ic_r] = w
        lines = ["{:02x}".format(int(oc * ic * kh * kw / 16))]
        for boc in range(0, oc, 4):
            for bic in range(0, ic, 4):
                for khi in range(kh):
                    for kwi in range(kw):
                        line = "".join(
                            int_to_hex(buf[boc + o, bic + c, khi, kwi],
                                       qp.hw.quan_bits)
                            for c in range(4) for o in range(4))
                        lines.append(line)
        out[f"conv.weight.{i}.txt"] = "\n".join(lines) + "\n"
    return out


def export_input_tiles(qp: QuantParams, dumps: Dict[str, np.ndarray],
                       kernel_sizes: List[int]) -> Dict[str, str]:
    """input.{d}.txt: 32-wide tile stream with per-layer halo shrink
    (output.py:41-119)."""
    out = {}
    hh_overlap = TILE
    ww_overlap = TILE
    ksched = [0] + list(kernel_sizes)
    L = len(kernel_sizes)
    for d in range(L + 1):
        data = _nchw(dumps[f"input.{d}"])
        b, c, h, w = data.shape
        exp_w = (w // TILE + 1) * TILE
        buf = np.zeros((b, c, h, exp_w))
        buf[:, :, :, :w] = data
        exp_h = (h // TILE + 1) * TILE
        nwb, nhb = exp_w // TILE, exp_h // TILE

        hh_overlap -= ksched[d] // 2
        ww_overlap -= ksched[d] // 2

        from sesr_tpu.export import native
        if native.available():
            text = native.input_tiles(data[0], qp.hw.quan_bits, TILE,
                                      hh_overlap, ww_overlap)
            if text is not None:
                out[f"input.{d}.txt"] = text
                continue

        parts = []
        bh = 0
        for hb in range(nhb):
            bw = 0
            cur_h = hh_overlap if hb == 0 else TILE
            for wb in range(nwb):
                cur_w = ww_overlap if wb == 0 else TILE
                if hb == nhb - 1:
                    cur_h = h - bh
                parts.append("{:02x}\n".format(int(cur_h)))
                parts.append("{:02x}\n".format(int(c)))
                for ci in range(c):
                    parts.append("{:02x}\n".format(ci))
                    for hi in range(cur_h):
                        row = "".join(
                            int_to_hex(buf[0, ci, bh + hi, bw + wi],
                                       qp.hw.quan_bits)
                            for wi in range(cur_w))
                        row += int_to_hex(0, qp.hw.quan_bits) * (TILE - cur_w)
                        parts.append(row + "\n")
                bw += cur_w
            bh += cur_h
        out[f"input.{d}.txt"] = "".join(parts)
    return out


def export_param_buf(qp: QuantParams) -> str:
    """param_buf.txt: per-channel {fused bias16, requant16, requant_res16}
    records (output.py:121-141)."""
    parts = [int_to_hex(qp.num_convs, 8), "\n"]
    res_hex = int_to_hex(qp.res_requant_m, qp.hw.requant_bits)
    for i in range(qp.num_convs):
        fused = qp.fused_bias(i)
        parts.append(int_to_hex(len(fused), 8))
        parts.append("\n")
        for v in fused:
            parts.append(int_to_hex(v, qp.hw.bias_bits))
            parts.append(int_to_hex(qp.requant_m[i], qp.hw.requant_bits))
            parts.append(res_hex)
            parts.append("\n")
    return "".join(parts)


def _blocked_stream(data_chw: np.ndarray, bit_width: int) -> str:
    """The pe_out/pe_add 32x32 block walk (output.py:143-232).

    Dispatches to the native core (native/hexport.cpp) when built; this
    Python body is the executable spec and fallback."""
    from sesr_tpu.export import native
    if native.available():
        out = native.blocked_stream(data_chw, bit_width, TILE)
        if out is not None:
            return out
    c, h, w = data_chw.shape
    exp_h = h if h % TILE == 0 else (h // TILE + 1) * TILE
    exp_w = w if w % TILE == 0 else (w // TILE + 1) * TILE
    buf = np.zeros((c, h, exp_w))
    buf[:, :, :w] = data_chw
    parts = []
    for hb in range(exp_h // TILE):
        for wb in range(exp_w // TILE):
            bh, bw = hb * TILE, wb * TILE
            lines = h - bh if hb == exp_h // TILE - 1 else TILE
            parts.append("{:02x}\n".format(int(lines)))
            parts.append("{:02x}\n".format(int(c)))
            for ci in range(c):
                parts.append("{:02x}\n".format(ci))
                for hi in range(TILE):
                    parts.append("".join(
                        int_to_hex(buf[ci, bh + hi, bw + wi], bit_width)
                        for wi in range(TILE)) + "\n")
                    if bh + hi == h - 1:
                        break
    return "".join(parts)


def export_pe_out(qp: QuantParams, dumps: Dict[str, np.ndarray]) -> Dict[str, str]:
    out = {}
    for i in range(qp.num_convs):
        pe = np.asarray(dumps[f"pe_out.{i}"])            # (PE, N, H, W, OC)
        for p in range(qp.hw.pe):
            data = _nchw(pe[p])[0]
            out[f"pe_output{i}_{p}.txt"] = _blocked_stream(data, qp.hw.pe_acc_bits)
    return out


def export_pe_add(qp: QuantParams, dumps: Dict[str, np.ndarray]) -> Dict[str, str]:
    out = {}
    for i in range(qp.num_convs):
        data = _nchw(dumps[f"pe_add.{i}"])[0]
        out[f"pe_add_output{i}.txt"] = _blocked_stream(data, qp.hw.pe_add_bits)
    return out


def export_requant_shifts(qp: QuantParams) -> str:
    """requan_shift_n.txt (output.py:234-245)."""
    width = int(math.log2(qp.hw.requant_n_max))
    parts = []
    for i in range(qp.num_convs):
        parts.append(int_to_hex(qp.requant_n[i], width))
        parts.append("\n")
    parts.append(int_to_hex(qp.res_requant_n, width))
    return "".join(parts)


def export_end2end(qp: QuantParams, dumps: Dict[str, np.ndarray],
                   domains=(0, None)) -> Dict[str, str]:
    """Layer-0 input and final-domain output in the full-chip end-to-end
    row-major format (output_end2end.py:38-101). Keeps the upstream
    height-block indexing bug (see module docstring) for byte parity."""
    L = qp.num_convs
    ds = [0, L] if domains == (0, None) else list(domains)
    out = {}
    for d in ds:
        data = _nchw(dumps[f"input.{d}"])
        b, c, h, w = data.shape
        exp_h = h if h % TILE == 0 else (h // TILE + 1) * TILE
        buf = np.zeros((b, c, exp_h, w))
        buf[:, :, :h, :] = data
        parts = []
        for hb in range(exp_h // TILE):
            parts.append("{:02x}\n".format(hb))
            for ci in range(c):
                parts.append("{:02x}\n".format(ci))
                n_in_line = 0
                row = []
                for hi in range(TILE):
                    for wi in range(w):
                        # upstream bug kept: hb not scaled by TILE
                        row.append(int_to_hex(buf[0, ci, hb + hi, wi],
                                              qp.hw.quan_bits))
                        n_in_line += 1
                        if n_in_line == 4:
                            row.append("\n")
                            n_in_line = 0
                    if n_in_line != 0:
                        row.append("\n")
                parts.append("".join(row))
        out[f"input.{d}.txt"] = "".join(parts)
    return out


def export_all(qp: QuantParams, dumps: Dict[str, np.ndarray],
               kernel_sizes: List[int], out_dir: str) -> None:
    """Write the full output_txt/ tree (the reference's export layout)."""
    tree = {
        "weight": export_weights(qp),
        "input": export_input_tiles(qp, dumps, kernel_sizes),
        "bias": {"param_buf.txt": export_param_buf(qp)},
        "pe_out": export_pe_out(qp, dumps),
        "pe_add": export_pe_add(qp, dumps),
        "requan_shift_n": {"requan_shift_n.txt": export_requant_shifts(qp)},
        "end2end": export_end2end(qp, dumps),
    }
    for sub, files in tree.items():
        d = os.path.join(out_dir, sub)
        os.makedirs(d, exist_ok=True)
        for name, text in files.items():
            with open(os.path.join(d, name), "w") as f:
                f.write(text)
