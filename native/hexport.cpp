// Native core for the RTL hex test-vector exporters.
//
// The reference emits its vectors with per-element Python string formatting
// (output.py:143-232 loops over every pixel of every PE of every layer);
// our Python port (sesr_tpu/export/vectors.py) is faithful but equally
// element-at-a-time. These loops are the only part of the export path whose
// cost scales with image size, so they are implemented natively and loaded
// via ctypes (sesr_tpu/export/native.py); the Python implementations remain
// as the executable spec and fallback.
//
// Byte-compatibility contract is identical to the Python path (and thus to
// the reference): two's-complement hex at ceil(bits/4) digits (min 2),
// 32x32 blocks, early row-break at the true image height, zero column
// padding to the tile width.

#include <cstdint>
#include <cstring>

namespace {

const char kDigits[] = "0123456789abcdef";

// Append `value` as two's-complement hex of `bits` width. Returns chars written.
inline long put_hex(char* out, int64_t value, int bits, int digits) {
    if (value < 0) value += (int64_t(1) << bits);
    for (int d = digits - 1; d >= 0; --d) {
        out[d] = kDigits[value & 0xf];
        value >>= 4;
    }
    return digits;
}

inline int hex_digits(int bits) {
    int d = (bits + 3) / 4;
    return d < 2 ? 2 : d;
}

// "%02x\n"
inline long put_hdr(char* out, long v) {
    out[0] = kDigits[(v >> 4) & 0xf];
    out[1] = kDigits[v & 0xf];
    out[2] = '\n';
    return 3;
}

}  // namespace

extern "C" {

// The pe_out / pe_add 32x32 block walk (reference output.py:143-232).
// data: (C, H, W) int32, row-major. Writes into `out` (caller-sized via
// blocked_stream_size). Returns bytes written, or -1 if out_cap too small.
long blocked_stream(const int32_t* data, long c, long h, long w,
                    int bits, int tile, char* out, long out_cap) {
    const int digits = hex_digits(bits);
    const long exp_h = (h % tile == 0) ? h : (h / tile + 1) * tile;
    const long exp_w = (w % tile == 0) ? w : (w / tile + 1) * tile;
    const long nhb = exp_h / tile, nwb = exp_w / tile;
    char* p = out;
    char* end = out + out_cap;
    for (long hb = 0; hb < nhb; ++hb) {
        for (long wb = 0; wb < nwb; ++wb) {
            const long bh = hb * tile, bw = wb * tile;
            const long lines = (hb == nhb - 1) ? (h - bh) : tile;
            if (end - p < 6 + c * (3 + tile * (tile * digits + 1))) return -1;
            p += put_hdr(p, lines);
            p += put_hdr(p, c);
            for (long ci = 0; ci < c; ++ci) {
                p += put_hdr(p, ci);
                for (long hi = 0; hi < tile; ++hi) {
                    const long row = bh + hi;
                    const int32_t* src =
                        (row < h) ? data + (ci * h + row) * w : nullptr;
                    for (long wi = 0; wi < tile; ++wi) {
                        const long col = bw + wi;
                        const int64_t v =
                            (src != nullptr && col < w) ? src[col] : 0;
                        p += put_hex(p, v, bits, digits);
                    }
                    *p++ = '\n';
                    if (row == h - 1) break;
                }
            }
        }
    }
    return p - out;
}

// Worst-case output size for blocked_stream.
long blocked_stream_size(long c, long h, long w, int bits, int tile) {
    const int digits = hex_digits(bits);
    const long exp_h = (h % tile == 0) ? h : (h / tile + 1) * tile;
    const long exp_w = (w % tile == 0) ? w : (w / tile + 1) * tile;
    const long blocks = (exp_h / tile) * (exp_w / tile);
    return blocks * (6 + c * (3 + tile * (tile * digits + 1))) + 64;
}

// The per-layer input tile stream with halo-shrunken first row/column
// (reference output.py:41-119). data: (C, H, W) int32.
long input_tiles(const int32_t* data, long c, long h, long w,
                 int bits, int tile, int h_overlap, int w_overlap,
                 char* out, long out_cap) {
    const int digits = hex_digits(bits);
    const long exp_w = (w / tile + 1) * tile;   // unconditional pad, as upstream
    const long exp_h = (h / tile + 1) * tile;
    const long nwb = exp_w / tile, nhb = exp_h / tile;
    char* p = out;
    char* end = out + out_cap;
    long bh = 0;
    for (long hb = 0; hb < nhb; ++hb) {
        long bw = 0;
        long cur_h = (hb == 0) ? h_overlap : tile;
        for (long wb = 0; wb < nwb; ++wb) {
            const long cur_w = (wb == 0) ? w_overlap : tile;
            if (hb == nhb - 1) cur_h = h - bh;
            if (end - p < 6 + c * (3 + (cur_h > 0 ? cur_h : 0) *
                                   (tile * digits + 1))) return -1;
            p += put_hdr(p, cur_h);
            p += put_hdr(p, c);
            for (long ci = 0; ci < c; ++ci) {
                p += put_hdr(p, ci);
                for (long hi = 0; hi < cur_h; ++hi) {
                    const long row = bh + hi;
                    for (long wi = 0; wi < cur_w; ++wi) {
                        const long col = bw + wi;
                        const int64_t v =
                            (row < h && col < w)
                                ? data[(ci * h + row) * w + col] : 0;
                        p += put_hex(p, v, bits, digits);
                    }
                    for (long wi = cur_w; wi < tile; ++wi)
                        p += put_hex(p, 0, bits, digits);
                    *p++ = '\n';
                }
            }
            bw += cur_w;
        }
        bh += cur_h;
    }
    return p - out;
}

long input_tiles_size(long c, long h, long w, int bits, int tile) {
    const int digits = hex_digits(bits);
    const long exp_w = (w / tile + 1) * tile;
    const long exp_h = (h / tile + 1) * tile;
    const long blocks = (exp_h / tile) * (exp_w / tile);
    return blocks * (6 + c * (3 + tile * (tile * digits + 1))) + 64;
}

}  // extern "C"
