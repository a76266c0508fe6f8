// Native raw-Bayer IO core: the hot input path of the deployment data
// pipeline (reference self_dataset.py raw loaders) in C++.
//
// Semantics are pinned to the Python executable spec in
// sesr_tpu/data/bayer.py (which remains the reference implementation;
// tests/test_native.py asserts bit-identical float32 output):
//  - sparse expansion (test loader, self_dataset.py:259-263): each Bayer
//    site lands at its own position of its channel, zeros elsewhere.
//  - dense expansion (train loader, self_dataset.py:150-166): R and B
//    replicate into all 4 sites of their 2x2 cell, G_r fills its row-0
//    pair, G_b its row-1 pair.
// Values are raw_u16 / (2^12 - 1), computed in float32 exactly as numpy.
//
// Build: make -C native (produces libbayerio.so); loaded via ctypes with
// a silent pure-Python fallback (sesr_tpu/data/native.py).

#include <cstdint>
#include <cstdio>
#include <cstring>

extern "C" {

// Read a uint16 .raw plane of W*H entries from `path` into `raw` (caller
// allocates). Returns the number of entries read (W*H on success), or -2
// when the file size is not exactly n entries — the numpy executable spec
// (np.fromfile().reshape(w, h)) rejects over- and under-sized files alike,
// so a trailing-garbage file must not be silently truncated here.
long read_raw_u16(const char* path, long n, uint16_t* raw) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return -1;
    if (std::fseek(f, 0, SEEK_END) != 0) { std::fclose(f); return -1; }
    long bytes = std::ftell(f);
    if (bytes != n * (long)sizeof(uint16_t)) { std::fclose(f); return -2; }
    std::rewind(f);
    long got = (long)std::fread(raw, sizeof(uint16_t), (size_t)n, f);
    std::fclose(f);
    return got;
}

// Sparse 3-channel expansion, CHW float32 out (3, H, W), normalized by
// `denom` (the 12-bit 4095.0f). out must be zero... we zero it here.
void expand_sparse(const uint16_t* raw, long H, long W, float denom,
                   float* out) {
    std::memset(out, 0, sizeof(float) * 3 * H * W);
    float* r = out;
    float* g = out + H * W;
    float* b = out + 2 * H * W;
    for (long i = 0; i < H; i += 2) {
        for (long j = 0; j < W; j += 2) {
            long o = i * W + j;
            r[o] = (float)raw[o] / denom;                       // R @ even/even
            if (j + 1 < W) g[o + 1] = (float)raw[o + 1] / denom;  // G_r
            if (i + 1 < H) {
                g[o + W] = (float)raw[o + W] / denom;             // G_b
                if (j + 1 < W)
                    b[o + W + 1] = (float)raw[o + W + 1] / denom; // B
            }
        }
    }
}

// Dense 2x2-replication expansion (train packing), CHW float32 out.
void expand_dense(const uint16_t* raw, long H, long W, float denom,
                  float* out) {
    std::memset(out, 0, sizeof(float) * 3 * H * W);
    float* r = out;
    float* g = out + H * W;
    float* b = out + 2 * H * W;
    for (long i = 0; i + 1 < H; i += 2) {
        for (long j = 0; j + 1 < W; j += 2) {
            long o = i * W + j;
            float rv = (float)raw[o] / denom;
            float grv = (float)raw[o + 1] / denom;
            float gbv = (float)raw[o + W] / denom;
            float bv = (float)raw[o + W + 1] / denom;
            r[o] = rv; r[o + 1] = rv; r[o + W] = rv; r[o + W + 1] = rv;
            g[o] = grv; g[o + 1] = grv;                   // row 0 <- G_r
            g[o + W] = gbv; g[o + W + 1] = gbv;           // row 1 <- G_b
            b[o] = bv; b[o + 1] = bv; b[o + W] = bv; b[o + W + 1] = bv;
        }
    }
}

}  // extern "C"
