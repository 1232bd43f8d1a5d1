// telr_tpu native host runtime: fast sequence IO + minimizer sketching.
//
// The device compute path is JAX/Pallas; this module is the C++ host-side
// data layer replacing the role of samtools/seqtk/Biopython parsing in the
// reference toolchain (reference TELR_input.py:329-361,
// TELR_assembly.py:418-431) and the index-build inner loop (minimizer
// extraction feeding kernels/index.py).
//
// Exposed as a plain C ABI consumed via ctypes (telr_tpu/io/native.py);
// all buffers are caller-allocated numpy arrays.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libtelr_native.so telr_native.cpp

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <vector>
#include <cmath>

extern "C" {

// ---------------------------------------------------------------------------
// sequence encoding
// ---------------------------------------------------------------------------

// ASCII -> code (A=0 C=1 G=2 T=3, other=4), case-insensitive
static int8_t LUT[256];
static bool lut_init = false;

static void init_lut() {
    if (lut_init) return;
    memset(LUT, 4, sizeof(LUT));
    LUT[(unsigned)'A'] = 0; LUT[(unsigned)'a'] = 0;
    LUT[(unsigned)'C'] = 1; LUT[(unsigned)'c'] = 1;
    LUT[(unsigned)'G'] = 2; LUT[(unsigned)'g'] = 2;
    LUT[(unsigned)'T'] = 3; LUT[(unsigned)'t'] = 3;
    lut_init = true;
}

void telr_encode(const char* seq, int64_t n, int8_t* out) {
    init_lut();
    for (int64_t i = 0; i < n; i++) out[i] = LUT[(unsigned char)seq[i]];
}

// ---------------------------------------------------------------------------
// fasta scanning: find record boundaries in a loaded buffer
// ---------------------------------------------------------------------------

// Scans a fasta buffer; writes per-record (header_start, header_end,
// seq_len) into offsets (3*max_records int64) and encodes all residues
// concatenated into codes (which must hold >= n bytes).  seq_starts gets
// the per-record offset into codes.  Returns the number of records, or -1
// if max_records is too small.
int64_t telr_scan_fasta(const char* buf, int64_t n,
                        int64_t* header_start, int64_t* header_end,
                        int64_t* seq_start, int64_t* seq_len,
                        int8_t* codes, int64_t max_records) {
    init_lut();
    int64_t nrec = 0;
    int64_t cpos = 0;
    int64_t i = 0;
    while (i < n) {
        if (buf[i] != '>') { i++; continue; }
        if (nrec >= max_records) return -1;
        int64_t hs = i + 1;
        while (i < n && buf[i] != '\n') i++;
        int64_t he = i;
        header_start[nrec] = hs;
        header_end[nrec] = he;
        seq_start[nrec] = cpos;
        i++;  // skip newline
        while (i < n && buf[i] != '>') {
            char c = buf[i];
            if (c != '\n' && c != '\r') codes[cpos++] = LUT[(unsigned char)c];
            i++;
        }
        seq_len[nrec] = cpos - seq_start[nrec];
        nrec++;
    }
    return nrec;
}

// ---------------------------------------------------------------------------
// minimizer sketching (canonical, invertible-hash, leftmost-tie window min)
// ---------------------------------------------------------------------------

static inline uint64_t splitmix64(uint64_t x) {
    x += 0x9E3779B97F4A7C15ULL;
    x ^= x >> 30; x *= 0xBF58476D1CE4E5B9ULL;
    x ^= x >> 27; x *= 0x94D049BB133111EBULL;
    x ^= x >> 31;
    return x;
}

// Computes canonical minimizers of codes[0..n); writes positions, hashes,
// strands.  Returns count (<= n).  Semantics match
// telr_tpu/kernels/minimizer.py: invalid (ambiguous or palindromic) k-mers
// are never selected; ties keep the leftmost; consecutive duplicate
// selections are collapsed.
int64_t telr_minimizers(const int8_t* codes, int64_t n, int32_t k, int32_t w,
                        int64_t* pos_out, uint64_t* hash_out,
                        int8_t* strand_out) {
    if (n < k) return 0;
    const int64_t m = n - k + 1;
    const uint64_t mask = (k < 32) ? ((1ULL << (2 * k)) - 1) : ~0ULL;
    std::vector<uint64_t> hcan(m);
    std::vector<int8_t> strand(m);
    const uint64_t INVALID = ~0ULL;

    uint64_t fwd = 0, rc = 0;
    int64_t bad_run = 0;  // positions since last ambiguous base
    for (int64_t i = 0; i < n; i++) {
        int8_t c = codes[i];
        if (c >= 4) {
            bad_run = 0;
            fwd = 0; rc = 0;
        } else {
            bad_run++;
            fwd = ((fwd << 2) | (uint64_t)c) & mask;
            rc = (rc >> 2) | (((uint64_t)(3 - c)) << (2 * (k - 1)));
        }
        int64_t p = i - k + 1;
        if (p < 0) continue;
        if (bad_run < k) { hcan[p] = INVALID; strand[p] = 0; continue; }
        uint64_t hf = splitmix64(fwd);
        uint64_t hr = splitmix64(rc);
        if (hf == hr) { hcan[p] = INVALID; strand[p] = 0; continue; }
        hcan[p] = hf < hr ? hf : hr;
        strand[p] = hr < hf ? 1 : 0;
    }

    // sliding window minimum (monotonic deque), leftmost tie
    std::vector<int64_t> deque(m);
    int64_t head = 0, tail = 0;
    int64_t count = 0;
    int64_t last_sel = -1;
    const int64_t nwin = (m >= w) ? (m - w + 1) : 1;
    const int64_t weff = (m >= w) ? w : m;
    for (int64_t i = 0; i < m; i++) {
        while (tail > head && hcan[deque[tail - 1]] > hcan[i]) tail--;
        deque[tail++] = i;
        int64_t wstart = i - weff + 1;
        if (deque[head] < wstart) head++;
        if (i >= weff - 1) {
            int64_t sel = deque[head];
            if (sel != last_sel && hcan[sel] != INVALID) {
                pos_out[count] = sel;
                hash_out[count] = hcan[sel];
                strand_out[count] = strand[sel];
                count++;
                last_sel = sel;
            }
        }
    }
    return count;
}

// ---------------------------------------------------------------------------
// wavefront schedule walk (see telr_tpu/kernels/wavefront.py)
// ---------------------------------------------------------------------------

// Given the parity-free target band base per step (target_m, S+1 entries)
// and the sequences, emit drift bits and entering window codes.
// m0 (even, caller-chosen) is the base at s=0.  Returns 0.
int32_t telr_wave_schedule(const int8_t* q, int64_t lq,
                           const int8_t* t, int64_t lt,
                           const int64_t* target_m, int64_t S,
                           int64_t m0, int32_t width,
                           int8_t* drift_out, int8_t* qin_out,
                           int8_t* tin_out) {
    int64_t m_prev = m0;
    int64_t i0 = (0 - m0) / 2;
    int64_t j0 = (0 + m0) / 2;
    for (int64_t s = 1; s <= S; s++) {
        int64_t m;
        if (target_m[s] >= m_prev + 1) m = m_prev + 1;
        else if (target_m[s] <= m_prev - 1) m = m_prev - 1;
        else m = m_prev + ((target_m[s] - m_prev) >= 0 ? 1 : -1);
        int8_t d = (int8_t)(m - m_prev);
        drift_out[s - 1] = d;
        qin_out[s - 1] = 4;
        tin_out[s - 1] = 4;
        if (d == -1) {
            i0 += 1;
            int64_t idx = i0 - 1;
            if (idx >= 0 && idx < lq) qin_out[s - 1] = q[idx];
        } else {
            j0 += 1;
            int64_t idx = j0 - 1 + (width - 1);
            if (idx >= 0 && idx < lt) tin_out[s - 1] = t[idx];
        }
        m_prev = m;
    }
    return 0;
}

// ---------------------------------------------------------------------------
// anchor-chaining DP (see telr_tpu/kernels/chain.py — same objective)
// ---------------------------------------------------------------------------

// Anchors must be pre-sorted by (tpos, qpos).  Writes per-anchor best
// score f and parent index (-1 = chain start).  O(n * lookback).
void telr_chain_dp(const int64_t* q, const int64_t* t, int64_t n,
                   int32_t k, int64_t max_gap, int64_t max_target_skew,
                   int32_t lookback, double gap_cap,
                   double* f, int64_t* parent) {
    for (int64_t i = 0; i < n; i++) {
        f[i] = (double)k;
        parent[i] = -1;
    }
    for (int64_t i = 1; i < n; i++) {
        int64_t j0 = i - lookback;
        if (j0 < 0) j0 = 0;
        double best = -1e300;
        int64_t best_j = -1;
        for (int64_t j = j0; j < i; j++) {
            int64_t dq = q[i] - q[j];
            int64_t dt = t[i] - t[j];
            if (dq < 1 || dt < 0 || dq > max_gap || dt > max_gap ||
                (dt - dq) > max_target_skew)
                continue;
            int64_t a = dq < dt ? dq : dt;
            if (a > k) a = k;
            int64_t dd = dq - dt;
            if (dd < 0) dd = -dd;
            double beta = 0.0;
            if (dd > 0) {
                beta = 0.01 * k * (double)dd +
                       0.5 * std::log2((double)dd + 1.0);
                if (beta > gap_cap) beta = gap_cap;
            }
            double cand = f[j] + (double)a - beta;
            if (cand > best) {
                best = cand;
                best_j = j;
            }
        }
        if (best_j >= 0 && best > f[i]) {
            f[i] = best;
            parent[i] = best_j;
        }
    }
}

}  // extern "C"
