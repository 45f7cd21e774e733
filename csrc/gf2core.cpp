// gf2core — native host-side runtime: bit-packed GF(2) linear algebra and a
// reference-semantics CPU min-sum decoder.
//
// Role in the framework (the TPU does the hot Monte-Carlo path; this is the
// native host runtime around it):
//   * word-parallel GF(2) elimination used by preprocessing (rank/RREF/
//     nullspace of parity-check matrices, logical-operator extraction) —
//     replaces the reference's per-element Python loops (qLDPCsim/gf2math.py)
//     at native speed for large codes;
//   * a batched CPU min-sum decoder with the exact reference update rules
//     (qLDPCsim/decoders.py:110-182 semantics: beta-normalized, min/min2 with
//     value-equality ties, layered CN + global VN update, per-layer early
//     exit) used for host-side validation of qBLER curves at scale and as the
//     measured "reference CPU simulator" class baseline.
//
// C ABI only; bound from Python via ctypes (qldpcsim_tpu/gf2/native.py).

#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>
#include <algorithm>
#include <thread>

extern "C" {

// ---------------------------------------------------------------------------
// Bit-packed GF(2) elimination. Rows are ceil(n/64) uint64 words, LSB-first.
// Returns rank; fills pivots[] (size >= min(m,n)) with pivot column indices.
// If T != nullptr it must be an m x twords identity and receives the row ops
// (so R_out = T * R_in over GF(2)). reduced != 0 => RREF, else REF.
// ---------------------------------------------------------------------------
int gf2_eliminate(uint64_t* R, int m, int n, int words,
                  uint64_t* T, int twords, int reduced, int* pivots) {
    int row = 0;
    int rank = 0;
    for (int col = 0; col < n && row < m; ++col) {
        const int w = col >> 6;
        const uint64_t mask = 1ULL << (col & 63);
        int piv = -1;
        for (int r = row; r < m; ++r) {
            if (R[(size_t)r * words + w] & mask) { piv = r; break; }
        }
        if (piv < 0) continue;
        if (piv != row) {
            for (int k = 0; k < words; ++k)
                std::swap(R[(size_t)piv * words + k], R[(size_t)row * words + k]);
            if (T) for (int k = 0; k < twords; ++k)
                std::swap(T[(size_t)piv * twords + k], T[(size_t)row * twords + k]);
        }
        const uint64_t* src = &R[(size_t)row * words];
        const uint64_t* tsrc = T ? &T[(size_t)row * twords] : nullptr;
        const int r0 = reduced ? 0 : row + 1;
        for (int r = r0; r < m; ++r) {
            if (r == row) continue;
            if (R[(size_t)r * words + w] & mask) {
                uint64_t* dst = &R[(size_t)r * words];
                for (int k = 0; k < words; ++k) dst[k] ^= src[k];
                if (T) {
                    uint64_t* tdst = &T[(size_t)r * twords];
                    for (int k = 0; k < twords; ++k) tdst[k] ^= tsrc[k];
                }
            }
        }
        if (pivots) pivots[rank] = col;
        ++row;
        ++rank;
    }
    return rank;
}

int gf2_rank(const uint64_t* rows, int m, int n, int words) {
    std::vector<uint64_t> R(rows, rows + (size_t)m * words);
    return gf2_eliminate(R.data(), m, n, words, nullptr, 0, 0, nullptr);
}

// ---------------------------------------------------------------------------
// Batched CPU min-sum decoder, reference semantics (decoders.py:110-182).
// H: m*n int8 row-major. syndromes: B*m int8. layers: contiguous ranges
// [starts[l], ends[l]). Outputs e_out (B*n int8), iters_out (B int32),
// conv_out (B int8). Returns 0.
// ---------------------------------------------------------------------------
int ms_decode_cpu(const int8_t* H, int m, int n,
                  const int8_t* syndromes, int B,
                  float p, int max_iter, float beta,
                  const int32_t* starts, const int32_t* ends, int n_layers,
                  int8_t* e_out, int32_t* iters_out, int8_t* conv_out) {
    // CSR-style row adjacency.
    std::vector<int> row_ptr(m + 1, 0);
    for (int i = 0; i < m; ++i) {
        int cnt = 0;
        for (int j = 0; j < n; ++j) cnt += H[(size_t)i * n + j] != 0;
        row_ptr[i + 1] = row_ptr[i] + cnt;
    }
    const int E = row_ptr[m];
    std::vector<int> cols(E);
    for (int i = 0, e = 0; i < m; ++i)
        for (int j = 0; j < n; ++j)
            if (H[(size_t)i * n + j]) cols[e++] = j;

    const float eps = 1e-9f;
    const float L_ch = std::log((1.0f - p) / std::max(p, eps));

    std::vector<float> c2v(E), v2c(E), posterior(n);
    std::vector<int8_t> e_hat(n);

    for (int b = 0; b < B; ++b) {
        const int8_t* syn = &syndromes[(size_t)b * m];
        std::fill(c2v.begin(), c2v.end(), 0.0f);
        std::fill(v2c.begin(), v2c.end(), L_ch);
        std::fill(posterior.begin(), posterior.end(), L_ch);
        int used = max_iter;
        bool conv = false;

        for (int it = 0; it < max_iter && !conv; ++it) {
            for (int l = 0; l < n_layers && !conv; ++l) {
                // CN update on layer rows.
                for (int i = starts[l]; i < ends[l]; ++i) {
                    const int e0 = row_ptr[i], e1 = row_ptr[i + 1];
                    if (e0 == e1) continue;
                    float min1 = INFINITY, min2 = INFINITY;
                    int sgn_parity = 0;
                    for (int e = e0; e < e1; ++e) {
                        const float v = v2c[e];
                        const float a = std::fabs(v);
                        if (v < 0.0f) sgn_parity ^= 1;
                        if (a < min1) { min2 = min1; min1 = a; }
                        else if (a < min2) { min2 = a; }
                    }
                    if (!std::isfinite(min2)) min2 = 0.0f;
                    const float ssign = syn[i] ? -1.0f : 1.0f;
                    const float psign = sgn_parity ? -1.0f : 1.0f;
                    for (int e = e0; e < e1; ++e) {
                        const float v = v2c[e];
                        const float a = std::fabs(v);
                        const float s = (v < 0.0f) ? -1.0f : 1.0f; // sign(0)=+1
                        const float mag = (a == min1) ? min2 : min1;
                        c2v[e] = beta * ssign * psign * s * mag;
                    }
                }
                // Global VN update: posterior = L_ch + column sums of c2v.
                std::fill(posterior.begin(), posterior.end(), L_ch);
                for (int i = 0; i < m; ++i)
                    for (int e = row_ptr[i]; e < row_ptr[i + 1]; ++e)
                        posterior[cols[e]] += c2v[e];
                for (int j = 0; j < n; ++j) e_hat[j] = posterior[j] < 0.0f;
                // Early exit: H e_hat == syndrome (mod 2).
                bool ok = true;
                for (int i = 0; i < m && ok; ++i) {
                    int par = 0;
                    for (int e = row_ptr[i]; e < row_ptr[i + 1]; ++e)
                        par ^= e_hat[cols[e]];
                    ok = (par == (syn[i] != 0));
                }
                if (ok) { conv = true; used = it + 1; break; }
                // Global v2c refresh.
                for (int i = 0; i < m; ++i)
                    for (int e = row_ptr[i]; e < row_ptr[i + 1]; ++e)
                        v2c[e] = posterior[cols[e]] - c2v[e];
            }
        }
        std::memcpy(&e_out[(size_t)b * n], e_hat.data(), n);
        iters_out[b] = used;
        conv_out[b] = conv ? 1 : 0;
    }
    return 0;
}


// ---------------------------------------------------------------------------
// Multithreaded batch wrapper: splits shots across up to `threads` workers
// (0 = hardware concurrency). Each worker runs the single-threaded decoder
// on its contiguous shot range — embarrassingly parallel, bit-identical to
// the sequential version.
// ---------------------------------------------------------------------------
int ms_decode_cpu_mt(const int8_t* H, int m, int n,
                     const int8_t* syndromes, int B,
                     float p, int max_iter, float beta,
                     const int32_t* starts, const int32_t* ends, int n_layers,
                     int8_t* e_out, int32_t* iters_out, int8_t* conv_out,
                     int threads) {
    int T = threads > 0 ? threads
                        : (int)std::thread::hardware_concurrency();
    if (T < 1) T = 1;
    if (T > B) T = B;
    if (T == 1)
        return ms_decode_cpu(H, m, n, syndromes, B, p, max_iter, beta,
                             starts, ends, n_layers, e_out, iters_out,
                             conv_out);
    std::vector<std::thread> pool;
    pool.reserve(T);
    const int per = (B + T - 1) / T;
    for (int t = 0; t < T; ++t) {
        const int b0 = t * per;
        const int b1 = std::min(B, b0 + per);
        if (b0 >= b1) break;
        pool.emplace_back([=] {
            ms_decode_cpu(H, m, n, &syndromes[(size_t)b0 * m], b1 - b0,
                          p, max_iter, beta, starts, ends, n_layers,
                          &e_out[(size_t)b0 * n], &iters_out[b0],
                          &conv_out[b0]);
        });
    }
    for (auto& th : pool) th.join();
    return 0;
}

}  // extern "C"
