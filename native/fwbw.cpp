// fwbw.cpp — forward-backward posterior-probability pair aligner.
//
// Scalar re-implementation of the reference fwbw command
// (lib/mmseqs/src/alignment/Fwbw.cpp) matching its SSE build
// bit-for-bit: the reference's SSE4.1 target has no FMA (fmadd is
// mul+add, simd.h:561), so every operation here is a plain IEEE
// float32 mul/add/div executed in the same order, including
//  - the vectorized exp/log polynomial approximations (simd.h:807-905),
//  - the 4-lane chunked prefix sum used by the ZE recurrence
//    (carry added as one vector add per chunk),
//  - the per-row rescaling by the row block maximum with scalar libm
//    exp/log at block boundaries (double-rounded to float),
//  - the 16-column block structure with FLT_MIN_EXP (-125) padding.
// MUST be compiled with -ffp-contract=off (no FMA contraction).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>

namespace {

constexpr float NEG_MAX = -std::numeric_limits<float>::max();
constexpr float PAD = -125.0f;  // FLT_MIN_EXP fill value

inline float f_from_bits(int32_t v) { float f; memcpy(&f, &v, 4); return f; }
inline int32_t bits_from_f(float v) { int32_t i; memcpy(&i, &v, 4); return i; }

// simdf32_exp polynomial (simd.h:807-840), one lane.
float vexpf(float x0) {
    const float P0 = 1.0f / 2.0f, P1 = 1.0f / 6.0f, P2 = 1.0f / 24.0f;
    const float P3 = 1.0f / 120.0f, P4 = 1.0f / 720.0f, P5 = 1.0f / 5040.0f;
    const float NEG_LN2_HI = -0.693359375f;
    const float NEG_LN2_LO = 2.12194440e-4f;
    const float LOG2E = (float)1.44269504088896340736;

    float x = x0;
    float r = rintf(x0 * LOG2E);
    x = r * NEG_LN2_HI + x;
    x = r * NEG_LN2_LO + x;
    float x2 = x * x;
    float x4 = x2 * x2;
    // polynomial_5 (simd.h:766-770)
    float z = ((P3 * x + P2) * x2) + (((P5 * x + P4) * x4) + (P1 * x + P0));
    z = z * x2 + x;
    // pow2n (simd.h:781-786)
    float a = r + (127.0f + 8388608.0f);
    float n2 = f_from_bits(bits_from_f(a) << 23);
    z = z * n2 + n2;
    if (!(fabsf(x0) < 87.3f)) {
        z = (bits_from_f(x0) >> 31) ? 0.0f
                                    : std::numeric_limits<float>::infinity();
    }
    if (x0 != x0) {
        z = x0;
    }
    return z;
}

// simdf32_log polynomial (simd.h:842-905), one lane.
float vlogf(float x0) {
    const float LN2_HI = 0.693359375f;
    const float LN2_LO = -2.12194440e-4f;
    const float C0 = 3.3333331174E-1f, C1 = -2.4999993993E-1f;
    const float C2 = 2.0000714765E-1f, C3 = -1.6668057665E-1f;
    const float C4 = 1.4249322787E-1f, C5 = -1.2420140846E-1f;
    const float C6 = 1.1676998740E-1f, C7 = -1.1514610310E-1f;
    const float C8 = 7.0376836292E-2f;
    const float SQRT2_HALF = (float)(1.41421356237309504880 * 0.5);

    int32_t xi = bits_from_f(x0);
    int32_t mi = (xi & 0x007FFFFF) | 0x3F000000;
    float m = f_from_bits(mi);
    int32_t ei = (int32_t)(((uint32_t)(xi << 1)) >> 24) - 0x7F;
    float e = (float)ei;
    bool gt = m > SQRT2_HALF;
    if (!gt) {
        m = m + m;
    }
    m = m - 1.0f;
    if (gt) {
        e = e + 1.0f;
    }
    float m2 = m * m;
    float m4 = m2 * m2;
    float m8 = m4 * m4;
    // polynomial_8 (simd.h:772-779)
    float res = (((C7 * m + C6) * m2) + (C5 * m + C4)) * m4 +
                (((C3 * m + C2) * m2) + ((C1 * m + C0) + m8 * C8));
    res = res * (m2 * m);
    res = e * LN2_LO + res;
    res = res + (m - m2 * 0.5f);
    res = e * LN2_HI + res;
    uint32_t exp_field = (uint32_t)xi & 0x7F800000u;
    if (exp_field == 0x7F800000u) {  // inf / nan pass through
        res = x0;
    }
    if (x0 < 1.17549435e-38f) {  // below smallest normal -> -nan
        res = -std::numeric_limits<float>::quiet_NaN();
    }
    if (exp_field == 0) {  // zero / subnormal -> -inf
        res = -std::numeric_limits<float>::infinity();
    }
    return res;
}

struct Workspace {
    long rows, cols, cols_pad, blocklen, blocks;
    float *zm;            // rows x cols_pad: fw logs, then fw+bw, then P
    float *prof;          // 21 x cols_pad: blosum/T with PAD padding
    float *prof_exp;      // vexpf(prof)
    float *prof_exp_rev;  // reversed per row, zero padding
    float *zm_first, *ze_first, *zf_first;  // rows+2
    float *zm_prev, *zm_curr, *ze_b, *zf_b;  // blocklen+1
    float *z_init;  // 3 x rows
    float *vj, *wj, *ge_arr;  // blocklen
    float exp_go, exp_ge;
    float max_zm, sum_exp;
};

void init_profile(Workspace &w, const float *blosum, const uint8_t *col_aa,
                  float temperature) {
    for (long i = 0; i < 21; ++i) {
        float *row = w.prof + i * w.cols_pad;
        for (long j = 0; j < w.cols; ++j) {
            row[j] = blosum[i * 21 + col_aa[j]] / temperature;
        }
        for (long j = w.cols; j < w.cols_pad; ++j) {
            row[j] = PAD;
        }
        float *erow = w.prof_exp + i * w.cols_pad;
        for (long j = 0; j < w.cols_pad; ++j) {
            erow[j] = vexpf(row[j]);
        }
        float *rrow = w.prof_exp_rev + i * w.cols_pad;
        for (long j = 0; j < w.cols; ++j) {
            rrow[w.cols - 1 - j] = erow[j];
        }
        for (long j = w.cols; j < w.cols_pad; ++j) {
            rrow[j] = 0.0f;
        }
    }
}

// One direction of the rescaled forward/backward recurrence
// (Fwbw.cpp:417-606/622-835). forward: writes zm rows; backward: adds
// reversed log values into zm.
void run_pass(Workspace &w, const uint8_t *row_aa, bool forward) {
    const long L = w.blocklen;
    for (long s = 0; s < 3; ++s) {
        std::fill(w.z_init + s * w.rows, w.z_init + (s + 1) * w.rows, PAD);
    }
    if (forward) {
        w.max_zm = NEG_MAX;
    }
    float *zm_prev = w.zm_prev;
    float *zm_curr = w.zm_curr;
    for (long b = 0; b < w.blocks; ++b) {
        long start = b * L;
        long mc = std::min((b + 1) * L, w.cols) - start;
        long cols = (mc == L) ? L : ((mc + 3) / 4) * 4;
        memset(zm_prev, 0, (L + 1) * sizeof(float));
        memset(w.ze_b, 0, (L + 1) * sizeof(float));
        memset(w.zf_b, 0, (L + 1) * sizeof(float));
        memcpy(w.zm_first + 1, w.z_init, w.rows * sizeof(float));
        memcpy(w.ze_first + 1, w.z_init + w.rows, w.rows * sizeof(float));
        memcpy(w.zf_first + 1, w.z_init + 2 * w.rows, w.rows * sizeof(float));
        zm_curr[0] = (float)exp((double)w.zm_first[1]);
        float ze_i0 = expf(w.ze_first[1]);
        float current_max = 0.0f;
        float log_zm_max = 0.0f;
        for (long i = 1; i <= w.rows; ++i) {
            float exp_max = (float)exp((double)(-current_max));
            const float *se;
            if (forward) {
                se = w.prof_exp + (long)row_aa[i - 1] * w.cols_pad + start;
            } else {
                se = w.prof_exp_rev +
                     (long)row_aa[w.rows - i] * w.cols_pad + start;
            }
            float zmax = NEG_MAX;
            for (long j = 1; j <= cols; ++j) {
                zm_curr[j] = ((zm_prev[j - 1] + w.ze_b[j - 1]) +
                              (w.zf_b[j - 1] + exp_max)) * se[j - 1];
                zmax = std::max(zmax, zm_curr[j]);
            }
            for (long j = 1; j <= cols; ++j) {
                w.zf_b[j] = (zm_prev[j] * w.exp_go + w.zf_b[j] * w.exp_ge) /
                            zmax;
            }
            float carry = 0.0f;
            for (long j = 0; j < cols; j += 4) {
                float t[4];
                for (int k = 0; k < 4; ++k) {
                    t[k] = zm_curr[j + k] * w.vj[j + k];
                }
                t[1] += t[0];
                t[2] += t[1];
                t[3] += t[2];
                for (int k = 0; k < 4; ++k) {
                    t[k] += carry;
                }
                carry = t[3];
                for (int k = 0; k < 4; ++k) {
                    w.ze_b[j + 1 + k] =
                        (ze_i0 * w.ge_arr[j + k] + t[k] / w.wj[j + k]) / zmax;
                }
            }
            log_zm_max = (float)log((double)zmax);
            current_max += log_zm_max;
            if (forward) {
                float *out = w.zm + (i - 1) * w.cols_pad + start;
                for (long j = 1; j <= cols; ++j) {
                    zm_curr[j] = zm_curr[j] / zmax;
                    float v = vlogf(zm_curr[j]) + current_max;
                    out[j - 1] = v;
                    w.max_zm = std::max(w.max_zm, v);
                }
            } else {
                long adjusted = mc - mc % 4;
                long fbs = w.cols - start;
                float *out = w.zm + (w.rows - i) * w.cols_pad;
                for (long j = 1; j <= adjusted; j += 4) {
                    fbs -= 4;
                    float lv[4];
                    for (int k = 0; k < 4; ++k) {
                        zm_curr[j + k] = zm_curr[j + k] / zmax;
                        lv[k] = vlogf(zm_curr[j + k]) + current_max;
                    }
                    for (int k = 0; k < 4; ++k) {
                        out[fbs + k] += lv[3 - k];
                    }
                }
                if (mc != L) {
                    long rem = mc % 4;
                    float lv[4];
                    for (int k = 0; k < 4; ++k) {
                        zm_curr[adjusted + 1 + k] =
                            zm_curr[adjusted + 1 + k] / zmax;
                        lv[k] = vlogf(zm_curr[adjusted + 1 + k]) +
                                current_max;
                    }
                    for (long k = 0; k < rem; ++k) {
                        out[rem - 1 - k] += lv[k];
                    }
                }
            }
            w.z_init[i - 1] = vlogf(zm_curr[mc]) + current_max;
            w.z_init[w.rows + i - 1] = vlogf(w.ze_b[mc]) + current_max;
            w.z_init[2 * w.rows + i - 1] = vlogf(w.zf_b[mc]) + current_max;
            std::swap(zm_curr, zm_prev);
            if (i < w.rows) {
                w.zm_first[i + 1] -= current_max;
                w.ze_first[i + 1] -= current_max;
                zm_curr[0] = vexpf(w.zm_first[i + 1]);
                ze_i0 = vexpf(w.ze_first[i + 1]);
                zm_prev[0] = vexpf(w.zm_first[i] - log_zm_max);
                w.ze_b[0] = vexpf(w.ze_first[i] - log_zm_max);
                w.zf_b[0] = vexpf(w.zf_first[i] - current_max);
            }
        }
    }
    if (forward) {
        float lanes[4] = {0.0f, 0.0f, 0.0f, 0.0f};
        for (long i = 0; i < w.rows; ++i) {
            const float *row = w.zm + i * w.cols_pad;
            for (long j = 0; j < w.cols_pad; j += 4) {
                for (int k = 0; k < 4; ++k) {
                    lanes[k] = lanes[k] + vexpf(row[j + k] - w.max_zm);
                }
            }
        }
        w.sum_exp = (lanes[0] + lanes[1]) + (lanes[2] + lanes[3]);
    }
}

// P = exp(zm_fw+bw - score - logsumexp), in place (Fwbw.cpp:897-940).
float compute_probability(Workspace &w, const uint8_t *row_aa) {
    float logsumexp = (float)((double)w.max_zm + log((double)w.sum_exp));
    long col_end = (w.cols / 4) * 4;
    float max_p = 0.0f;
    for (long i = 0; i < w.rows; ++i) {
        float *row = w.zm + i * w.cols_pad;
        const float *sp = w.prof + (long)row_aa[i] * w.cols_pad;
        for (long j = 0; j < col_end; ++j) {
            float p = vexpf(row[j] - (sp[j] + logsumexp));
            row[j] = p;
            max_p = std::max(max_p, p);
        }
        for (long j = col_end; j < w.cols; ++j) {
            float p = (float)exp((double)row[j] - (double)sp[j] -
                                 (double)logsumexp);
            row[j] = p;
            max_p = std::max(max_p, p);
        }
    }
    return max_p;
}

}  // namespace

// MAC decoding (backtrace mode 1, local) + traceback
// (Fwbw.cpp:943-1064). Returns cigar length; coords/score via pointers.
extern "C" long fwbw_align(
        const uint8_t *col_aa, long col_len,  // query
        const uint8_t *row_aa, long row_len,  // target
        const float *blosum21,                // 21x21 float scores
        float gap_open, float gap_extend,     // already negated
        float temperature, float mact, long blocklen,
        long *out_qstart, long *out_qend, long *out_tstart,
        long *out_tend, float *out_score_mac, long *out_aa_ids,
        char *out_cigar) {
    Workspace w;
    w.rows = row_len;
    w.cols = col_len;
    w.cols_pad = ((col_len + 3) / 4) * 4;
    w.blocklen = blocklen;
    w.blocks = col_len / blocklen + (col_len % blocklen != 0);
    w.zm = new float[w.rows * w.cols_pad]();
    w.prof = new float[21 * w.cols_pad];
    w.prof_exp = new float[21 * w.cols_pad];
    w.prof_exp_rev = new float[21 * w.cols_pad];
    w.zm_first = new float[w.rows + 2]();
    w.ze_first = new float[w.rows + 2]();
    w.zf_first = new float[w.rows + 2]();
    w.zm_prev = new float[blocklen + 1];
    w.zm_curr = new float[blocklen + 1];
    w.ze_b = new float[blocklen + 1];
    w.zf_b = new float[blocklen + 1];
    w.z_init = new float[3 * w.rows];
    w.vj = new float[blocklen];
    w.wj = new float[blocklen];
    w.ge_arr = new float[blocklen];
    for (long i = 0; i < blocklen; ++i) {
        w.vj[i] = (float)exp(
            ((blocklen - 1) * gap_extend + gap_open - i * gap_extend) /
            temperature);
        w.wj[i] = (float)exp(
            ((blocklen - 1) * gap_extend - i * gap_extend) / temperature);
        w.ge_arr[i] = (float)exp((i * gap_extend + gap_extend) / temperature);
    }
    w.exp_go = (float)exp(gap_open / temperature);
    w.exp_ge = (float)exp(gap_extend / temperature);

    init_profile(w, blosum21, col_aa, temperature);
    run_pass(w, row_aa, true);
    run_pass(w, row_aa, false);
    compute_probability(w, row_aa);

    // MAC
    uint8_t *bt = new uint8_t[(row_len + 1) * (col_len + 1)];
    float *s_prev = new float[col_len + 1]();
    float *s_curr = new float[col_len + 1]();
    for (long i = 0; i <= row_len; ++i) {
        bt[i * (col_len + 1)] = 0;
    }
    for (long j = 0; j <= col_len; ++j) {
        bt[j] = 0;
    }
    float score_mac = NEG_MAX;
    long max_i = 0, max_j = 0;
    for (long i = 1; i <= row_len; ++i) {
        const float *p_row = w.zm + (i - 1) * w.cols_pad;
        for (long j = 1; j <= col_len; ++j) {
            float term1 = p_row[j - 1] - mact;
            float term2 = s_prev[j - 1] + p_row[j - 1] - mact;
            float term4 = s_prev[j] - 0.5 * mact;
            float term3 = s_curr[j - 1] - 0.5 * mact;
            float best;
            uint8_t state;
            if (term1 > term2) { best = term1; state = 0; }
            else { best = term2; state = 1; }
            if (term3 > best) { best = term3; state = 2; }
            if (term4 > best) { best = term4; state = 3; }
            s_curr[j] = best;
            bt[i * (col_len + 1) + j] = state;
            if (best > score_mac) {
                max_i = i;
                max_j = j;
                score_mac = best;
            }
        }
        std::swap(s_prev, s_curr);
    }
    *out_qend = max_j - 1;
    *out_tend = max_i - 1;
    *out_score_mac = score_mac;
    long qstart = 0, tstart = 0;
    long aa_ids = 0;
    long n = 0;
    bool stop = false;
    while (max_i > 0 && max_j > 0 && !stop) {
        switch (bt[max_i * (col_len + 1) + max_j]) {
            case 1:
                --max_i;
                --max_j;
                qstart = max_j;
                tstart = max_i;
                out_cigar[n++] = 'M';
                aa_ids += (row_aa[max_i] == col_aa[max_j]);
                break;
            case 2:
                --max_j;
                out_cigar[n++] = 'I';
                break;
            case 3:
                --max_i;
                out_cigar[n++] = 'D';
                break;
            default:
                stop = true;
                break;
        }
    }
    while (n > 0 && out_cigar[n - 1] != 'M') {
        --n;
    }
    std::reverse(out_cigar, out_cigar + n);
    *out_qstart = qstart;
    *out_tstart = tstart;
    *out_aa_ids = aa_ids;

    delete[] bt;
    delete[] s_prev;
    delete[] s_curr;
    delete[] w.zm;
    delete[] w.prof;
    delete[] w.prof_exp;
    delete[] w.prof_exp_rev;
    delete[] w.zm_first;
    delete[] w.ze_first;
    delete[] w.zf_first;
    delete[] w.zm_prev;
    delete[] w.zm_curr;
    delete[] w.ze_b;
    delete[] w.zf_b;
    delete[] w.z_init;
    delete[] w.vj;
    delete[] w.wj;
    delete[] w.ge_arr;
    return n;
}
