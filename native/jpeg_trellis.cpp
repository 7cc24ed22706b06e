// Trellis quantization DP: the host hot loop of tpujpeg's trellis mode.
//
// Exact C++ mirror of kernels/jpeg_enc.py trellis_quantize_blocks (the
// numpy implementation stays as the executable reference; tests assert the
// two produce identical coefficients).  Per block: DP over the 63 AC
// zigzag positions with state = previous nonzero position, candidates =
// round-to-nearest magnitude and one step toward zero, cost =
// (|F|/q - c)^2 + lambda * bits, bits from a (16, 11) optimized-Huffman
// (run, size) length model plus appended magnitude bits and ZRL chains.
//
// All float arithmetic is single-precision in the same operation order as
// the numpy path so decisions match bit-for-bit.  ~10x faster than numpy:
// the python DP allocates (2, k, n_blocks) temporaries per position, this
// loop keeps one block's state in L1.

#include <cmath>
#include <cstdint>
#include <cstring>

namespace {

inline int bit_size(int v) {
    int n = 0;
    while (v > 0) { ++n; v >>= 1; }
    return n;
}

}  // namespace

extern "C" {

// dct_zz: (n_blocks, 64) f32 zigzag coefficients; q_zz: (64,) f32 zigzag
// quantizer steps; ac_lengths: (16, 11) f32 row-major; out: (n_blocks, 64)
// int16.  Returns 0 on success.
int64_t ce_trellis_quantize(const float* dct_zz, size_t n_blocks,
                            const float* q_zz, const float* ac_lengths,
                            float lmbda, int16_t* out) {
    const float l_zrl = ac_lengths[15 * 11 + 0];
    const float l_eob = ac_lengths[0 * 11 + 0];

    float x[64], sgn[64], P[64];
    float best[64];
    int8_t prev[64];
    int16_t vals[64];

    for (size_t b = 0; b < n_blocks; ++b) {
        const float* F = dct_zz + b * 64;
        int16_t* o = out + b * 64;

        for (int k = 0; k < 64; ++k) {
            float f = F[k];
            sgn[k] = (f > 0.0f) - (f < 0.0f);
            x[k] = std::fabs(f) / q_zz[k];
        }
        P[0] = 0.0f;
        for (int k = 1; k < 64; ++k) P[k] = P[k - 1] + x[k] * x[k];

        best[0] = 0.0f;
        for (int k = 1; k < 64; ++k) {
            float c0 = std::floor(x[k] + 0.5f);
            if (c0 > 1023.0f) c0 = 1023.0f;
            float c1 = c0 - 1.0f;
            if (c1 < 0.0f) c1 = 0.0f;
            const float cand[2] = {c0, c1};

            float bk = INFINITY;
            int pj = 0;
            int16_t pv = 0;
            // Same tie-breaking as numpy argmin over the flattened
            // (candidate, j) axis: candidate 0 first, then ascending j,
            // strict < keeps the first minimum.
            for (int ci = 0; ci < 2; ++ci) {
                float c = cand[ci];
                if (c <= 0.0f) continue;
                int s = bit_size(static_cast<int>(c));
                float d = (x[k] - c) * (x[k] - c);
                for (int j = 0; j < k; ++j) {
                    int r = k - 1 - j;
                    float runbits = static_cast<float>(r / 16) * l_zrl;
                    float sym = ac_lengths[(r % 16) * 11 + s] +
                                static_cast<float>(s);
                    float base = best[j] + (P[k - 1] - P[j]);
                    float t = base + lmbda * (runbits + sym) + d;
                    if (t < bk) {
                        bk = t;
                        pj = j;
                        pv = static_cast<int16_t>(c);
                    }
                }
            }
            best[k] = bk;
            prev[k] = static_cast<int8_t>(pj);
            vals[k] = pv;
        }

        // Termination: zero tail + EOB (unless the last nonzero is 63).
        float tbest = INFINITY;
        int jlast = 0;
        for (int j = 0; j < 64; ++j) {
            float t = best[j] + (P[63] - P[j]) + lmbda * (j < 63 ? l_eob : 0.0f);
            if (t < tbest) {
                tbest = t;
                jlast = j;
            }
        }

        std::memset(o, 0, 64 * sizeof(int16_t));
        float dc = std::floor(x[0] + 0.5f);
        if (dc > 2047.0f) dc = 2047.0f;
        o[0] = static_cast<int16_t>(sgn[0] * dc);
        for (int k = jlast; k > 0; k = prev[k])
            o[k] = static_cast<int16_t>(sgn[k] * static_cast<float>(vals[k]));
    }
    return 0;
}

}  // extern "C"
