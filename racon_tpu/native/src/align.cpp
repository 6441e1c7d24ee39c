// Pairwise alignment for the host runtime (the reference's edlib/spoa-engine
// roles, re-implemented from scratch):
//
//  - banded edit-distance NW with adaptive band doubling (exactness check:
//    a banded optimum D <= x cannot be beaten by any path leaving the band,
//    since leaving costs > x). Divide-and-conquer splitting keeps traceback
//    memory bounded for very long overlaps.
//  - full-matrix linear-gap NW (maximize) for layer-vs-backbone alignment.
//
// Tie-breaking is standardized across python/native/device backends:
// DIAG > UP (consume query) > LEFT (consume target).

#include "align.hpp"

#include <algorithm>
#include <climits>

namespace rt {

static const int32_t kInf = INT32_MAX / 4;

static inline void push_op(std::vector<OpRun>& ops, int32_t op, int32_t run) {
    if (run <= 0) return;
    if (!ops.empty() && ops.back().op == op) {
        ops.back().run += run;
    } else {
        ops.push_back({op, run});
    }
}

// ---------------------------------------------------------------------- //
// banded edit distance, distance-only; optionally captures the score row at
// query row `capture_i` (band-local, size W) for divide-and-conquer splits.
// Returns the distance for the fixed margin x, or -1 if the band proved
// insufficient (result > x and band not full).
// ---------------------------------------------------------------------- //

struct Band {
    int64_t dlo;  // lowest diagonal j - i in band
    int64_t W;    // band width
};

static Band make_band(int64_t m, int64_t n, int64_t x) {
    int64_t dlo = std::min<int64_t>(0, n - m) - x;
    int64_t dhi = std::max<int64_t>(0, n - m) + x;
    dlo = std::max(dlo, -m);
    dhi = std::min(dhi, n);
    return {dlo, dhi - dlo + 1};
}

static int64_t banded_distance_fixed(const uint8_t* q, int64_t m,
                                     const uint8_t* t, int64_t n, int64_t x,
                                     int64_t capture_i, int32_t* capture_row,
                                     std::vector<int32_t>& cur,
                                     std::vector<int32_t>& prev) {
    Band b = make_band(m, n, x);
    const int64_t W = b.W, dlo = b.dlo;
    prev.assign(W + 2, kInf);
    cur.assign(W + 2, kInf);
    // rows are padded by one sentinel on each side so k-1 / k+1 never branch
    // row 0: H[0][j] = j for j in [max(0,dlo), min(n,dhi)]
    for (int64_t k = 0; k < W; ++k) {
        int64_t j = dlo + k;
        prev[k + 1] = (j >= 0 && j <= n) ? static_cast<int32_t>(j) : kInf;
    }
    if (capture_i == 0 && capture_row) {
        for (int64_t k = 0; k < W; ++k) capture_row[k] = prev[k + 1];
    }
    for (int64_t i = 1; i <= m; ++i) {
        const uint8_t qc = q[i - 1];
        const int64_t jlo = std::max<int64_t>(0, i + dlo);
        const int64_t jhi = std::min<int64_t>(n, i + dlo + W - 1);
        std::fill(cur.begin(), cur.end(), kInf);
        for (int64_t j = jlo; j <= jhi; ++j) {
            const int64_t k = j - i - dlo;  // band-local index
            int32_t best;
            if (j == 0) {
                best = static_cast<int32_t>(i);
            } else {
                // diag: prev[k+1] (same k), up: prev[k+2], left: cur[k]
                const int32_t diag =
                    prev[k + 1] + (qc == t[j - 1] ? 0 : 1);
                const int32_t up = prev[k + 2] >= kInf ? kInf : prev[k + 2] + 1;
                const int32_t left = cur[k] >= kInf ? kInf : cur[k] + 1;
                best = std::min(diag, std::min(up, left));
            }
            cur[k + 1] = best;
        }
        std::swap(prev, cur);
        if (capture_i == i && capture_row) {
            for (int64_t k = 0; k < W; ++k) capture_row[k] = prev[k + 1];
        }
    }
    const int64_t k_end = n - m - dlo;
    if (k_end < 0 || k_end >= W) return -1;
    int64_t d = prev[k_end + 1];
    if (d >= kInf) return -1;
    const bool full_band = (b.dlo == -m && b.dlo + W - 1 == n);
    if (d > x && !full_band) return -1;  // band may have clipped the optimum
    return d;
}

int64_t edit_distance(const uint8_t* q, int64_t m, const uint8_t* t,
                      int64_t n) {
    if (m == 0) return n;
    if (n == 0) return m;
    std::vector<int32_t> cur, prev;
    int64_t x = 64;
    while (true) {
        int64_t d = banded_distance_fixed(q, m, t, n, x, -1, nullptr, cur, prev);
        if (d >= 0) return d;
        x *= 2;
    }
}

// ---------------------------------------------------------------------- //
// banded edit alignment with traceback (adaptive band + D&C for memory)
// ---------------------------------------------------------------------- //

static const int64_t kMovesBudget = int64_t(64) << 20;  // bytes per call

// direct banded alignment with a byte move matrix; x is trusted (caller
// verified the distance fits)
static void banded_align_direct(const uint8_t* q, int64_t m, const uint8_t* t,
                                int64_t n, int64_t x, std::vector<OpRun>& ops) {
    Band b = make_band(m, n, x);
    const int64_t W = b.W, dlo = b.dlo;
    std::vector<int32_t> prev(W + 2, kInf), cur(W + 2, kInf);
    std::vector<uint8_t> moves(static_cast<size_t>(m + 1) * W, 3);
    for (int64_t k = 0; k < W; ++k) {
        int64_t j = dlo + k;
        prev[k + 1] = (j >= 0 && j <= n) ? static_cast<int32_t>(j) : kInf;
        if (j > 0 && j <= n) moves[k] = 2;  // row 0: all LEFT
    }
    for (int64_t i = 1; i <= m; ++i) {
        const uint8_t qc = q[i - 1];
        const int64_t jlo = std::max<int64_t>(0, i + dlo);
        const int64_t jhi = std::min<int64_t>(n, i + dlo + W - 1);
        std::fill(cur.begin(), cur.end(), kInf);
        uint8_t* mrow = moves.data() + static_cast<size_t>(i) * W;
        for (int64_t j = jlo; j <= jhi; ++j) {
            const int64_t k = j - i - dlo;
            int32_t best;
            uint8_t mv;
            if (j == 0) {
                best = static_cast<int32_t>(i);
                mv = 1;  // UP column
            } else {
                const int32_t diag = prev[k + 1] + (qc == t[j - 1] ? 0 : 1);
                const int32_t up = prev[k + 2] >= kInf ? kInf : prev[k + 2] + 1;
                const int32_t left = cur[k] >= kInf ? kInf : cur[k] + 1;
                best = std::min(diag, std::min(up, left));
                mv = (diag == best) ? 0 : (up == best ? 1 : 2);
            }
            cur[k + 1] = best;
            mrow[k] = mv;
        }
        std::swap(prev, cur);
    }
    // traceback
    std::vector<OpRun> rev;
    int64_t i = m, j = n;
    while (i > 0 || j > 0) {
        const int64_t k = j - i - dlo;
        const uint8_t mv = moves[static_cast<size_t>(i) * W + k];
        if (mv == 0) {
            push_op(rev, OP_MATCH, 1);
            --i;
            --j;
        } else if (mv == 1) {
            push_op(rev, OP_INS, 1);
            --i;
        } else {
            push_op(rev, OP_DEL, 1);
            --j;
        }
    }
    // rev holds runs back-to-front; append reversed
    for (auto it = rev.rbegin(); it != rev.rend(); ++it) {
        push_op(ops, it->op, it->run);
    }
}

// find the column where an optimal path crosses query row `mid` by combining
// forward scores (row mid) with backward scores of the reversed problem
static int64_t split_column(const uint8_t* q, int64_t m, const uint8_t* t,
                            int64_t n, int64_t x, int64_t mid) {
    Band fb = make_band(m, n, x);
    std::vector<int32_t> frow(fb.W, kInf), brow(fb.W, kInf);
    std::vector<int32_t> cur, prev;
    banded_distance_fixed(q, m, t, n, x, mid, frow.data(), cur, prev);
    std::vector<uint8_t> qr(m), tr(n);
    for (int64_t i = 0; i < m; ++i) qr[i] = q[m - 1 - i];
    for (int64_t j = 0; j < n; ++j) tr[j] = t[n - 1 - j];
    // backward: align qr (rows) vs tr; row (m - mid) of the reverse problem
    // corresponds to query row mid; its column j' = n - j.
    Band bb = make_band(m, n, x);
    banded_distance_fixed(qr.data(), m, tr.data(), n, x, m - mid, brow.data(),
                          cur, prev);
    int64_t best_j = -1;
    int64_t best = INT64_MAX;
    for (int64_t k = 0; k < fb.W; ++k) {
        const int64_t j = mid + fb.dlo + k;
        if (j < 0 || j > n) continue;
        const int64_t ir = m - mid;          // reverse row
        const int64_t jr = n - j;            // reverse column
        const int64_t kr = jr - ir - bb.dlo;
        if (kr < 0 || kr >= bb.W) continue;
        if (frow[k] >= kInf || brow[kr] >= kInf) continue;
        const int64_t total = int64_t(frow[k]) + brow[kr];
        if (total < best) {
            best = total;
            best_j = j;
        }
    }
    return best_j;
}

static void banded_align_rec(const uint8_t* q, int64_t m, const uint8_t* t,
                             int64_t n, int64_t x, std::vector<OpRun>& ops) {
    if (m == 0) {
        push_op(ops, OP_DEL, static_cast<int32_t>(n));
        return;
    }
    if (n == 0) {
        push_op(ops, OP_INS, static_cast<int32_t>(m));
        return;
    }
    Band b = make_band(m, n, x);
    if ((m + 1) * b.W <= kMovesBudget) {
        banded_align_direct(q, m, t, n, x, ops);
        return;
    }
    const int64_t mid = m / 2;
    int64_t jsplit = split_column(q, m, t, n, x, mid);
    if (jsplit < 0) {  // should not happen with a verified band; be safe
        banded_align_direct(q, m, t, n, x, ops);
        return;
    }
    banded_align_rec(q, mid, t, jsplit, x, ops);
    banded_align_rec(q + mid, m - mid, t + jsplit, n - jsplit, x, ops);
}

int64_t edit_align(const uint8_t* q, int64_t m, const uint8_t* t, int64_t n,
                   std::vector<OpRun>& ops) {
    ops.clear();
    if (m == 0) {
        push_op(ops, OP_DEL, static_cast<int32_t>(n));
        return n;
    }
    if (n == 0) {
        push_op(ops, OP_INS, static_cast<int32_t>(m));
        return m;
    }
    std::vector<int32_t> cur, prev;
    // the band must at least absorb the length difference; starting the
    // doubling there skips the guaranteed-futile small-band passes
    int64_t x = 64;
    const int64_t drift = m > n ? m - n : n - m;
    while (x <= drift) x *= 2;
    int64_t d;
    while ((d = banded_distance_fixed(q, m, t, n, x, -1, nullptr, cur, prev)) < 0) {
        x *= 2;
    }
    banded_align_rec(q, m, t, n, x, ops);
    return d;
}

// ---------------------------------------------------------------------- //
// full-matrix linear-gap NW (maximize), for layer-vs-backbone alignment
// ---------------------------------------------------------------------- //

int64_t nw_score_align(const uint8_t* q, int64_t m, const uint8_t* t,
                       int64_t n, int32_t match, int32_t mismatch, int32_t gap,
                       std::vector<OpRun>& ops, std::vector<uint8_t>& moves,
                       std::vector<int32_t>& h_prev, std::vector<int32_t>& h_cur) {
    ops.clear();
    if (m == 0) {
        push_op(ops, OP_DEL, static_cast<int32_t>(n));
        return static_cast<int64_t>(n) * gap;
    }
    if (n == 0) {
        push_op(ops, OP_INS, static_cast<int32_t>(m));
        return static_cast<int64_t>(m) * gap;
    }
    moves.resize(static_cast<size_t>(m + 1) * (n + 1));
    h_prev.resize(n + 1);
    h_cur.resize(n + 1);
    for (int64_t j = 0; j <= n; ++j) {
        h_prev[j] = static_cast<int32_t>(j) * gap;
        moves[j] = 2;
    }
    for (int64_t i = 1; i <= m; ++i) {
        const uint8_t qc = q[i - 1];
        h_cur[0] = static_cast<int32_t>(i) * gap;
        uint8_t* mrow = moves.data() + static_cast<size_t>(i) * (n + 1);
        mrow[0] = 1;
        for (int64_t j = 1; j <= n; ++j) {
            const int32_t diag =
                h_prev[j - 1] + (qc == t[j - 1] ? match : mismatch);
            const int32_t up = h_prev[j] + gap;
            const int32_t left = h_cur[j - 1] + gap;
            int32_t best = std::max(diag, std::max(up, left));
            mrow[j] = (diag == best) ? 0 : (up == best ? 1 : 2);
            h_cur[j] = best;
        }
        std::swap(h_prev, h_cur);
    }
    const int64_t score = h_prev[n];
    std::vector<OpRun> rev;
    int64_t i = m, j = n;
    while (i > 0 || j > 0) {
        const uint8_t mv = moves[static_cast<size_t>(i) * (n + 1) + j];
        if (mv == 0) {
            push_op(rev, OP_MATCH, 1);
            --i;
            --j;
        } else if (mv == 1) {
            push_op(rev, OP_INS, 1);
            --i;
        } else {
            push_op(rev, OP_DEL, 1);
            --j;
        }
    }
    for (auto it = rev.rbegin(); it != rev.rend(); ++it) {
        push_op(ops, it->op, it->run);
    }
    return score;
}

// ---------------------------------------------------------------------- //
// breaking-point walk (reference semantics: src/overlap.cpp:226-292)
// ---------------------------------------------------------------------- //

int64_t breaking_points(const OpRun* ops, int64_t n_ops, bool strand,
                        int64_t q_begin, int64_t q_end, int64_t q_length,
                        int64_t t_begin, int64_t t_end, int32_t window_length,
                        int64_t* out /* quads */, int64_t max_quads) {
    // window ends: i-1 for every multiple i of w in (t_begin, t_end), then
    // t_end-1
    std::vector<int64_t> window_ends;
    for (int64_t i = 0; i < t_end; i += window_length) {
        if (i > t_begin) window_ends.push_back(i - 1);
    }
    window_ends.push_back(t_end - 1);

    int64_t n_out = 0;
    size_t w = 0;
    bool found = false;
    int64_t fm_t = 0, fm_q = 0, lm_t = 0, lm_q = 0;
    int64_t q_ptr = (strand ? (q_length - q_end) : q_begin) - 1;
    int64_t t_ptr = t_begin - 1;

    for (int64_t k = 0; k < n_ops; ++k) {
        const int32_t op = ops[k].op;
        const int32_t num = ops[k].run;
        if (op == OP_MATCH) {
            for (int32_t u = 0; u < num; ++u) {
                ++q_ptr;
                ++t_ptr;
                if (!found) {
                    found = true;
                    fm_t = t_ptr;
                    fm_q = q_ptr;
                }
                lm_t = t_ptr + 1;
                lm_q = q_ptr + 1;
                if (w < window_ends.size() && t_ptr == window_ends[w]) {
                    if (found && n_out < max_quads) {
                        out[n_out * 4 + 0] = fm_t;
                        out[n_out * 4 + 1] = fm_q;
                        out[n_out * 4 + 2] = lm_t;
                        out[n_out * 4 + 3] = lm_q;
                        ++n_out;
                    }
                    found = false;
                    ++w;
                }
            }
        } else if (op == OP_INS) {
            q_ptr += num;
        } else if (op == OP_DEL) {
            for (int32_t u = 0; u < num; ++u) {
                ++t_ptr;
                if (w < window_ends.size() && t_ptr == window_ends[w]) {
                    if (found && n_out < max_quads) {
                        out[n_out * 4 + 0] = fm_t;
                        out[n_out * 4 + 1] = fm_q;
                        out[n_out * 4 + 2] = lm_t;
                        out[n_out * 4 + 3] = lm_q;
                        ++n_out;
                    }
                    found = false;
                    ++w;
                }
            }
        }
    }
    return n_out;
}

// ---------------------------------------------------------------------- //
// device traceback walk: unpack the TPU kernel's packed move planes
// (racon_tpu/ops/nw_kernel.py layout: 16 query rows per int32 lane, band of
// width W, j = i + dlo + k) and rebuild op lists, skipping pad ops.
// ---------------------------------------------------------------------- //

int64_t walk_moves(const int32_t* moves /* (m_cap/16, W) */, int64_t m,
                   int64_t n, int64_t m_cap, int64_t n_cap, int64_t w_band,
                   std::vector<OpRun>& ops) {
    ops.clear();
    const int64_t dlo = n_cap - m_cap - w_band / 2;
    int64_t i = m_cap, j = n_cap;
    std::vector<OpRun> rev;
    auto push = [&rev](int32_t op) {
        if (!rev.empty() && rev.back().op == op) {
            rev.back().run += 1;
        } else {
            rev.push_back({op, 1});
        }
    };
    while (i > 0 || j > 0) {
        int32_t mv;
        if (i == 0) {
            mv = 2;
        } else if (j == 0) {
            mv = 1;
        } else {
            const int64_t k = j - i - dlo;
            if (k < 0 || k >= w_band) return -1;  // path left the band
            const int32_t word = moves[((i - 1) / 16) * w_band + k];
            mv = (word >> (2 * ((i - 1) % 16))) & 3;
            if (mv == 3) return -1;
        }
        if (mv == 0) {
            if (i <= m && j <= n) push(OP_MATCH);
            --i;
            --j;
        } else if (mv == 1) {
            if (i <= m) push(OP_INS);
            --i;
        } else {
            if (j <= n) push(OP_DEL);
            --j;
        }
    }
    for (auto it = rev.rbegin(); it != rev.rend(); ++it) {
        if (!ops.empty() && ops.back().op == it->op) {
            ops.back().run += it->run;
        } else {
            ops.push_back(*it);
        }
    }
    return static_cast<int64_t>(ops.size());
}

}  // namespace rt
