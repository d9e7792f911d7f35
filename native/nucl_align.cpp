// Banded nucleotide extension alignment: exact scalar replica of the
// ksw2 extension DP (lib/mmseqs/lib/ksw2/ksw2_extz2_sse.cpp) that the
// reference's BandedNucleotideAligner drives. The SSE version computes a
// 16-lane-padded band with difference-encoded int8 state; outputs depend
// on that padding (boundary reads use the block-rounded ranges), so this
// transcription keeps the block arithmetic, carries, unsigned reads and
// tie-breaking of the vectorized max scan.

#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>

namespace {

const int32_t KSW_NEG_INF = -0x40000000;

inline int8_t i8(int v) { return (int8_t)(uint8_t)(v & 0xff); }

struct Ez {
    int32_t max, max_q, max_t, mqe, mqe_t, mte, mte_q, score;
    int zdropped;
};

inline int apply_zdrop(Ez *ez, int32_t H, int r, int t, int zdrop, int8_t e) {
    // ksw_apply_zdrop, is_rot=1 (ksw2.h:186-202)
    if (H > ez->max) {
        ez->max = H;
        ez->max_t = t;
        ez->max_q = r - t;
    } else if (t >= ez->max_t && r - t >= ez->max_q) {
        int tl = t - ez->max_t, ql = (r - t) - ez->max_q;
        int l = tl > ql ? tl - ql : ql - tl;
        if (zdrop >= 0 && ez->max - H > zdrop + l * e) {
            ez->zdropped = 1;
            return 1;
        }
    }
    return 0;
}

void push_cigar(std::vector<uint32_t> &cigar, uint32_t op, uint32_t len) {
    if (cigar.empty() || op != (cigar.back() & 0xf)) {
        cigar.push_back(len << 4 | op);
    } else {
        cigar.back() += len << 4;
    }
}

}  // namespace

extern "C" {

// Returns n_cigar (0 when score_only). out[0..7] = max, max_q, max_t,
// zdropped, score, mqe, mqe_t, mte. cigar ops: 0=M 1=I(query) 2=D(target).
int64_t mtpu_ksw_extz(int64_t qlen_, const uint8_t *query, int64_t tlen_in,
                 const uint8_t *target, int64_t m_, const int8_t *mat,
                 int64_t q_, int64_t e_, int64_t w_, int64_t zdrop_,
                 int64_t score_only, int32_t *out, uint32_t *cigar_out,
                 int64_t cigar_cap) {
    const int qlen = (int)qlen_, tlen = (int)tlen_in, m = (int)m_;
    const int8_t q = (int8_t)q_, e = (int8_t)e_;
    int w = (int)w_;
    const int zdrop = (int)zdrop_;
    const int with_cigar = !score_only;

    Ez ez;
    ez.max_q = ez.max_t = ez.mqe_t = ez.mte_q = -1;
    ez.max = 0;
    ez.score = ez.mqe = ez.mte = KSW_NEG_INF;
    ez.zdropped = 0;

    std::vector<uint32_t> cigar;

    auto finish = [&]() -> int64_t {
        out[0] = ez.max;
        out[1] = ez.max_q;
        out[2] = ez.max_t;
        out[3] = ez.zdropped;
        out[4] = ez.score;
        out[5] = ez.mqe;
        out[6] = ez.mqe_t;
        out[7] = ez.mte;
        int64_t n = (int64_t)cigar.size();
        for (int64_t i = 0; i < n && i < cigar_cap; i++) cigar_out[i] = cigar[i];
        return n;
    };

    if (m <= 0 || qlen <= 0 || tlen <= 0) return finish();

    const int8_t qe2 = i8((q + e) * 2);
    const int8_t sc_mch = mat[0], sc_mis = mat[1];
    const uint8_t wildcard = (uint8_t)(m - 1);
    const uint8_t max_sc_u = (uint8_t)(mat[0] + (q + e) * 2);

    if (w < 0) w = tlen > qlen ? tlen : qlen;
    const int wl = w, wr = w;
    const int tlen16 = (tlen + 15) / 16;
    int n_col_ = qlen < tlen ? qlen : tlen;
    n_col_ = ((n_col_ < w + 1 ? n_col_ : w + 1) + 15) / 16 + 1;
    const int qlen16 = (qlen + 15) / 16;

    int max_sc = mat[0], min_sc = mat[1];
    for (int t = 1; t < m * m; ++t) {
        max_sc = max_sc > mat[t] ? max_sc : mat[t];
        min_sc = min_sc < mat[t] ? min_sc : mat[t];
    }
    if (-min_sc > 2 * (q + e)) return finish();

    const int NB = tlen16 * 16;
    // u,v,x,y,s as raw bytes; sf zero-padded target; qr zero-padded
    // reversed query (kcalloc zero-init semantics)
    // s/sf carry +16 slack: the SSE stores/loads spill past tlen_ blocks
    // into adjacent buffers; the spilled cells are never read back
    std::vector<uint8_t> u(NB, 0), v(NB, 0), x(NB, 0), y(NB, 0), s(NB + 16, 0);
    std::vector<uint8_t> sf(NB + 16, 0), qr(qlen16 * 16 + 16, 0);
    std::vector<int32_t> H(NB, KSW_NEG_INF);
    std::vector<uint8_t> p;
    std::vector<int> off, off_end;
    if (with_cigar) {
        p.assign((size_t)(qlen + tlen - 1) * n_col_ * 16, 0);
        off.assign(qlen + tlen - 1, 0);
        off_end.assign(qlen + tlen - 1, 0);
    }
    for (int t = 0; t < qlen; ++t) qr[t] = query[qlen - 1 - t];
    memcpy(sf.data(), target, tlen);

    int last_st = -1, last_en = -1;
    for (int r = 0; r < qlen + tlen - 1; ++r) {
        int st = 0, en = tlen - 1;
        if (st < r - qlen + 1) st = r - qlen + 1;
        if (en > r) en = r;
        if (st < ((r - wr + 1) >> 1)) st = (r - wr + 1) >> 1;
        if (en > ((r + wl) >> 1)) en = (r + wl) >> 1;
        if (st > en) {
            ez.zdropped = 1;
            break;
        }
        const int st0 = st, en0 = en;
        st = st / 16 * 16;
        en = (en + 16) / 16 * 16 - 1;

        int8_t x1, v1;
        if (st > 0) {
            if (st - 1 >= last_st && st - 1 <= last_en) {
                x1 = (int8_t)x[st - 1];
                v1 = (int8_t)v[st - 1];
            } else {
                x1 = v1 = 0;
            }
        } else {
            x1 = 0;
            v1 = r ? q : 0;
        }
        if (en >= r) {
            y[r] = 0;
            u[r] = r ? (uint8_t)q : 0;
        }

        // loop fission: per-16 s[] stores starting at st0
        const int qoff = qlen - 1 - r;  // qrr[t] = qr[qoff + t]
        for (int t = st0; t <= en0; t += 16) {
            for (int lane = 0; lane < 16; ++lane) {
                const int tt = t + lane;
                const uint8_t sq = sf[tt];
                const int qi = qoff + tt;
                const uint8_t stq = (qi >= 0 && qi < (int)qr.size()) ? qr[qi] : 0;
                uint8_t sc = (sq == stq) ? (uint8_t)sc_mch : (uint8_t)sc_mis;
                if (sq == wildcard || stq == wildcard) sc = 0;
                s[tt] = sc;
            }
        }

        const int st_ = st / 16, en_ = en / 16;
        int8_t x1c = x1, v1c = v1;
        for (int tb = st_; tb <= en_; ++tb) {
            uint8_t xt1[16], vt1[16], uold[16], yold[16];
            // load with one-lane shift (slli + carry)
            for (int lane = 0; lane < 16; ++lane) {
                const int idx = tb * 16 + lane;
                xt1[lane] = (lane == 0) ? (uint8_t)x1c : x[idx - 1];
                vt1[lane] = (lane == 0) ? (uint8_t)v1c : v[idx - 1];
                uold[lane] = u[idx];
                yold[lane] = y[idx];
            }
            x1c = (int8_t)x[tb * 16 + 15];
            v1c = (int8_t)v[tb * 16 + 15];
            for (int lane = 0; lane < 16; ++lane) {
                const int idx = tb * 16 + lane;
                int8_t z = i8((int8_t)s[idx] + qe2);
                const int8_t a = i8((int8_t)xt1[lane] + (int8_t)vt1[lane]);
                const int8_t b = i8((int8_t)yold[lane] + (int8_t)uold[lane]);
                uint8_t d = 0;
                if (with_cigar) {
                    d = (a > z) ? 1 : 0;              // cmpgt before max
                }
                z = std::max(z, a);                   // signed max
                if (with_cigar && (int8_t)b > z) d = 2;
                // block2: unsigned max with b, unsigned min with cap
                uint8_t zu = std::max((uint8_t)z, (uint8_t)b);
                zu = std::min(zu, max_sc_u);
                u[idx] = (uint8_t)i8((int8_t)zu - (int8_t)vt1[lane]);
                v[idx] = (uint8_t)i8((int8_t)zu - (int8_t)uold[lane]);
                const int8_t z2 = i8((int8_t)zu - q);
                const int8_t a2 = i8(a - z2);
                const int8_t b2 = i8(b - z2);
                if (!with_cigar) {
                    x[idx] = (uint8_t)std::max(a2, (int8_t)0);
                    y[idx] = (uint8_t)std::max(b2, (int8_t)0);
                } else {
                    // gap left-alignment branch
                    if (a2 > 0) {
                        x[idx] = (uint8_t)a2;
                        d |= 0x08;
                    } else {
                        x[idx] = 0;
                    }
                    if (b2 > 0) {
                        y[idx] = (uint8_t)b2;
                        d |= 0x10;
                    } else {
                        y[idx] = 0;
                    }
                    p[(size_t)(r * n_col_ + (tb - st_)) * 16 + lane] = d;
                }
            }
        }
        if (with_cigar) {
            off[r] = st;
            off_end[r] = en;
        }

        // exact max with the 32-bit H array (4-lane SSE scan semantics)
        const int qe = q + e;
        int32_t max_H, max_t;
        if (r > 0) {
            const int en1 = st0 + (en0 - st0) / 4 * 4;
            max_H = H[en0] = en0 > 0 ? H[en0 - 1] + (int32_t)u[en0] - qe
                                     : H[en0] + (int32_t)v[en0] - qe;
            max_t = en0;
            int32_t laneH[4] = {max_H, max_H, max_H, max_H};
            int32_t laneT[4] = {max_t, max_t, max_t, max_t};
            int t;
            for (t = st0; t < en1; t += 4) {
                for (int i = 0; i < 4; ++i) {
                    H[t + i] += (int32_t)v[t + i] - qe;
                    if (H[t + i] > laneH[i]) {
                        laneH[i] = H[t + i];
                        laneT[i] = t;
                    }
                }
            }
            for (int i = 0; i < 4; ++i) {
                if (max_H < laneH[i]) {
                    max_H = laneH[i];
                    max_t = laneT[i] + i;
                }
            }
            for (; t < en0; ++t) {
                H[t] += (int32_t)v[t] - qe;
                if (H[t] > max_H) {
                    max_H = H[t];
                    max_t = t;
                }
            }
        } else {
            H[0] = (int32_t)v[0] - qe - qe;
            max_H = H[0];
            max_t = 0;
        }
        if (en0 == tlen - 1 && H[en0] > ez.mte) {
            ez.mte = H[en0];
            ez.mte_q = r - en;
        }
        if (r - st0 == qlen - 1 && H[st0] > ez.mqe) {
            ez.mqe = H[st0];
            ez.mqe_t = st0;
        }
        if (apply_zdrop(&ez, max_H, r, max_t, zdrop, e)) break;
        if (r == qlen + tlen - 2 && en0 == tlen - 1) ez.score = H[tlen - 1];
        last_st = st;
        last_en = en;
    }

    if (with_cigar && ez.max_t >= 0 && ez.max_q >= 0) {
        // ksw_backtrack, is_rot=1, rev=0, with_N=0, from (max_t, max_q)
        int i = ez.max_t, j = ez.max_q, state = 0;
        while (i >= 0 && j >= 0) {
            int force_state = -1;
            const int r = i + j;
            if (i < off[r]) force_state = 2;
            if (i > off_end[r]) force_state = 1;
            const uint32_t tmp =
                force_state < 0 ? p[(size_t)r * n_col_ * 16 + i - off[r]] : 0;
            if (state == 0) state = tmp & 7;
            else if (!(tmp >> (state + 2) & 1)) state = 0;
            if (state == 0) state = tmp & 7;
            if (force_state >= 0) state = force_state;
            if (state == 0) { push_cigar(cigar, 0, 1); --i; --j; }
            else if (state == 1 || state == 3) { push_cigar(cigar, 2, 1); --i; }
            else { push_cigar(cigar, 1, 1); --j; }
        }
        if (i >= 0) push_cigar(cigar, 2, i + 1);
        if (j >= 0) push_cigar(cigar, 1, j + 1);
        std::reverse(cigar.begin(), cigar.end());
    }
    return finish();
}

}  // extern "C"
