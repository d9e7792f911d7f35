// Nucleotide k-mer prefilter (the reference's --search-type 3 prefilter
// configuration): exact spaced 15-mers over a 4-letter index
// (Prefiltering.cpp:530-533 adjustAlphabetSize, setNuclSearchDefaults
// kmerSize 15 + exactKmerMatching), kmerThr 0, no composition bias,
// diagonal dedup + ungapped rescore with the scale-1.0 nucleotide matrix,
// and the isNucleotide best-diagonal-per-target consolidation
// (QueryMatcher.cpp:109-149). Own structure: the inverted index is a
// sorted (kmer, seqId, pos) array instead of a 4^15 offset table.

#include <cstdint>
#include <cstring>
#include <vector>
#include <algorithm>
#include <unistd.h>

namespace {

const int NUCL_ALPH = 5;   // ACTGX
const int NUCL_X = 4;

struct IndexEntry {
    uint32_t seqId;
    uint16_t pos_j;
};

struct Counter {
    uint32_t id;
    uint16_t diagonal;
    uint8_t count;
};

struct Hit {
    uint32_t seqId;
    int32_t prefScore;
    uint16_t diagonal;
};

struct Tuple {
    uint32_t kmer;
    uint32_t seqId;
    uint16_t pos;
};

struct PFN {
    int8_t mat[NUCL_ALPH * NUCL_ALPH];
    std::vector<int> pat;                 // informative k-mer positions
    int span = 0;                         // pattern span
    std::vector<Tuple> tuples;            // staging until finalize
    std::vector<uint32_t> ukmer;          // unique kmers, sorted
    std::vector<uint32_t> ustart;         // start into entries
    std::vector<IndexEntry> entries;
    std::vector<uint8_t> tdata;
    std::vector<int64_t> toff;
    int64_t nseq = 0;
    bool finalized = false;
    uint32_t bincount = 2;
    uint32_t binbits = 1;
    std::vector<int8_t> byteArr;
    std::vector<int8_t> qprof;            // stride NUCL_ALPH
};

uint64_t l2_cache_size_n() {
#ifdef _SC_LEVEL2_CACHE_SIZE
    long sz = sysconf(_SC_LEVEL2_CACHE_SIZE);
    if (sz > 0) return (uint64_t)sz;
#endif
    return 262144;
}

uint32_t pick_bincount_n(size_t dbsize) {
    uint64_t l2 = l2_cache_size_n();
    for (uint32_t bc = 2; bc <= 1024; bc *= 2) {
        if (dbsize / bc < l2) return bc;
    }
    return 2048;
}

// Indexer::int2index over alphabet 4, LSB-first powers
inline bool kmer_code(const PFN *pf, const uint8_t *seq, int64_t pos,
                      uint32_t *code) {
    uint32_t c = 0;
    for (int k = (int)pf->pat.size() - 1; k >= 0; --k) {
        const uint8_t r = seq[pos + pf->pat[k]];
        if (r >= NUCL_X) return false;
        c = c * 4 + r;
    }
    *code = c;
    return true;
}

void finalize(PFN *pf) {
    if (pf->finalized) return;
    std::stable_sort(pf->tuples.begin(), pf->tuples.end(),
                     [](const Tuple &a, const Tuple &b) {
                         return a.kmer < b.kmer;
                     });
    // entries within one kmer are already in (seqId, pos) order thanks to
    // insertion order + stable sort (IndexTable::sortDBSeqLists outcome)
    for (size_t i = 0; i < pf->tuples.size(); i++) {
        if (i == 0 || pf->tuples[i].kmer != pf->tuples[i - 1].kmer) {
            pf->ukmer.push_back(pf->tuples[i].kmer);
            pf->ustart.push_back((uint32_t)i);
        }
        pf->entries.push_back({pf->tuples[i].seqId, pf->tuples[i].pos});
    }
    pf->ustart.push_back((uint32_t)pf->tuples.size());
    pf->tuples.clear();
    pf->tuples.shrink_to_fit();
    pf->bincount = pick_bincount_n((size_t)pf->nseq);
    pf->binbits = 0;
    while ((1u << pf->binbits) < pf->bincount) pf->binbits++;
    pf->byteArr.assign(((size_t)pf->nseq >> pf->binbits) + 1, 0);
    pf->finalized = true;
}

int diag_score_nucl(const PFN *pf, const int8_t *qprof, int qlen,
                    const uint8_t *t, int tlen, uint16_t diag_u16,
                    bool clamp255) {
    const int16_t d = (int16_t)diag_u16;
    const uint16_t dist1 = (uint16_t)(0 - diag_u16);
    const uint16_t dist2 = diag_u16;
    const uint16_t minDist = std::min(dist1, dist2);
    int maxs = 0;
    if (d >= 0 && minDist < (uint16_t)qlen) {
        const int len = std::min(tlen, qlen - (int)minDist);
        const int8_t *p = qprof + (size_t)minDist * NUCL_ALPH;
        int score = 0;
        for (int pos = 0; pos < len; pos++) {
            score += p[(size_t)pos * NUCL_ALPH + t[pos]];
            score = score < 0 ? 0 : score;
            maxs = score > maxs ? score : maxs;
        }
    } else if (d < 0 && minDist < (uint16_t)tlen) {
        const int len = std::min(tlen - (int)minDist, qlen);
        const uint8_t *tt = t + minDist;
        int score = 0;
        for (int pos = 0; pos < len; pos++) {
            score += qprof[(size_t)pos * NUCL_ALPH + tt[pos]];
            score = score < 0 ? 0 : score;
            maxs = score > maxs ? score : maxs;
        }
    }
    return clamp255 ? std::min(255, maxs) : maxs;
}

// CacheFriendlyOperations::findDuplicates (see prefilter.cpp port)
size_t find_duplicates_n(PFN *pf, const std::vector<IndexEntry> &hits,
                         const std::vector<uint16_t> &hitDiag,
                         std::vector<Counter> &out) {
    const uint32_t mask = pf->bincount - 1;
    int8_t *ba = pf->byteArr.data();
    std::vector<std::pair<uint32_t, uint16_t>> tmp;
    size_t cnt = 0;
    for (uint32_t bin = 0; bin < pf->bincount; bin++) {
        tmp.clear();
        for (size_t n = 0; n < hits.size(); n++) {
            const uint32_t id = hits[n].seqId;
            if ((id & mask) != bin) continue;
            const uint32_t key = id >> pf->binbits;
            const uint8_t currDiag = (uint8_t)hitDiag[n];
            const uint8_t prevDiag = (uint8_t)ba[key];
            if (currDiag == prevDiag) tmp.push_back({id, hitDiag[n]});
            ba[key] = (int8_t)currDiag;
        }
        for (size_t n = tmp.size(); n-- > 0;) {
            ba[tmp[n].first >> pf->binbits] = (int8_t)((uint8_t)tmp[n].second + 1);
        }
        for (size_t n = 0; n < tmp.size(); n++) {
            const uint32_t key = tmp[n].first >> pf->binbits;
            out[cnt].id = tmp[n].first;
            out[cnt].count = 0;
            out[cnt].diagonal = tmp[n].second;
            cnt += ((uint8_t)ba[key] != (uint8_t)tmp[n].second) ? 1 : 0;
            ba[key] = (int8_t)(uint8_t)tmp[n].second;
        }
        for (size_t n = 0; n < hits.size(); n++) {
            const uint32_t id = hits[n].seqId;
            if ((id & mask) != bin) continue;
            ba[id >> pf->binbits] = 0;
        }
    }
    return cnt;
}

size_t keep_max_only_n(PFN *pf, std::vector<Counter> &arr, size_t n) {
    const uint32_t mask = pf->bincount - 1;
    int8_t *ba = pf->byteArr.data();
    std::vector<Counter> binned;
    binned.reserve(n);
    std::vector<Counter> out(n);
    size_t cnt = 0;
    for (uint32_t bin = 0; bin < pf->bincount; bin++) {
        binned.clear();
        for (size_t i = 0; i < n; i++) {
            if ((arr[i].id & mask) == bin) binned.push_back(arr[i]);
        }
        for (auto &e : binned) {
            const uint32_t key = e.id >> pf->binbits;
            const uint8_t cur = e.count, db = (uint8_t)ba[key];
            ba[key] = (int8_t)(cur > db ? cur : db);
        }
        for (auto &e : binned) {
            const uint32_t key = e.id >> pf->binbits;
            out[cnt] = e;
            const bool found = ((uint8_t)ba[key] == e.count);
            cnt += found;
            ba[key] = found ? 0 : ba[key];
        }
    }
    std::copy(out.begin(), out.begin() + cnt, arr.begin());
    return cnt;
}

}  // namespace

extern "C" {

void *pfn_create(const int64_t *pattern_pos, int64_t k) {
    PFN *pf = new PFN();
    for (int i = 0; i < NUCL_ALPH; i++) {
        for (int j = 0; j < NUCL_ALPH; j++) {
            pf->mat[i * NUCL_ALPH + j] = (i == j && i != NUCL_X) ? 2 : -3;
        }
    }
    for (int64_t i = 0; i < k; i++) pf->pat.push_back((int)pattern_pos[i]);
    pf->span = pf->pat.back() + 1;
    pf->toff.push_back(0);
    return pf;
}

void pfn_destroy(void *h) { delete static_cast<PFN *>(h); }

// add masked target sequences (concatenated encs + offsets)
void pfn_add_targets(void *h, const uint8_t *data, const int64_t *offsets,
                     int64_t nseq) {
    PFN *pf = static_cast<PFN *>(h);
    for (int64_t s = 0; s < nseq; s++) {
        const uint8_t *seq = data + offsets[s];
        const int64_t L = offsets[s + 1] - offsets[s];
        const uint32_t sid = (uint32_t)pf->nseq;
        pf->tdata.insert(pf->tdata.end(), seq, seq + L);
        pf->toff.push_back((int64_t)pf->tdata.size());
        pf->nseq++;
        // per-sequence: unique k-mers only, first (smallest) position
        // (IndexTable::addSequence comapreByIdAndPos dedup)
        std::vector<std::pair<uint32_t, uint16_t>> kmers;
        for (int64_t i = 0; i + pf->span <= L; i++) {
            uint32_t code;
            if (!kmer_code(pf, seq, i, &code)) continue;
            kmers.push_back({code, (uint16_t)i});
        }
        std::stable_sort(kmers.begin(), kmers.end());
        for (size_t i = 0; i < kmers.size(); i++) {
            if (i > 0 && kmers[i].first == kmers[i - 1].first) continue;
            pf->tuples.push_back({kmers[i].first, sid, kmers[i].second});
        }
    }
    pf->finalized = false;
}

int64_t pfn_match(void *h, const uint8_t *q, int64_t qlen, int64_t max_hits,
                  int64_t min_diag_thr, uint32_t identity_id,
                  uint32_t *out_id, int32_t *out_score, int16_t *out_diag) {
    PFN *pf = static_cast<PFN *>(h);
    finalize(pf);
    max_hits = std::min(max_hits, pf->nseq);

    // nucl query profile: plain matrix rows, zero bias
    std::vector<int8_t> &qprof = pf->qprof;
    qprof.resize((size_t)qlen * NUCL_ALPH);
    for (int64_t pos = 0; pos < qlen; pos++) {
        memcpy(&qprof[(size_t)pos * NUCL_ALPH], &pf->mat[q[pos] * NUCL_ALPH],
               NUCL_ALPH);
    }

    std::vector<IndexEntry> hits;
    std::vector<uint16_t> hitDiag;
    for (int64_t i = 0; i + pf->span <= qlen; i++) {
        uint32_t code;
        if (!kmer_code(pf, q, i, &code)) continue;
        auto it = std::lower_bound(pf->ukmer.begin(), pf->ukmer.end(), code);
        if (it == pf->ukmer.end() || *it != code) continue;
        const size_t u = it - pf->ukmer.begin();
        for (uint32_t e = pf->ustart[u]; e < pf->ustart[u + 1]; e++) {
            hits.push_back(pf->entries[e]);
            hitDiag.push_back((uint16_t)((uint16_t)i - pf->entries[e].pos_j));
        }
    }

    std::vector<Counter> found(std::max((size_t)1, hits.size()));
    size_t resultSize =
        hits.empty() ? 0 : find_duplicates_n(pf, hits, hitDiag, found);

    // ungapped diagonal scoring (clamped at 255)
    for (size_t i = 0; i < resultSize; i++) {
        const uint32_t id = found[i].id;
        const uint8_t *t = pf->tdata.data() + pf->toff[id];
        const int tlen = (int)(pf->toff[id + 1] - pf->toff[id]);
        found[i].count = (uint8_t)diag_score_nucl(pf, qprof.data(), (int)qlen,
                                                  t, tlen, found[i].diagonal,
                                                  true);
    }

    // isNucleotide consolidation (QueryMatcher.cpp:109-149):
    // bucket-sort desc >= minDiagScoreThr, resolve best diagonal among
    // saturated (>=255) same-id entries, then keep max per id
    std::vector<Counter> sorted;
    sorted.reserve(resultSize);
    for (int s = 255; s >= (int)min_diag_thr; s--) {
        for (size_t i = 0; i < resultSize; i++) {
            if (found[i].count == (uint8_t)s) sorted.push_back(found[i]);
        }
    }
    size_t len255 = 0;
    while (len255 < sorted.size() && sorted[len255].count >= 255) len255++;
    std::sort(sorted.begin(), sorted.begin() + len255,
              [](const Counter &a, const Counter &b) { return a.id < b.id; });
    {
        uint32_t prevId = UINT32_MAX;
        int maxScore = 0;
        size_t firstPos = 0;
        for (size_t i = 0; i < len255; i++) {
            const uint32_t id = sorted[i].id;
            const uint8_t *t = pf->tdata.data() + pf->toff[id];
            const int tlen = (int)(pf->toff[id + 1] - pf->toff[id]);
            if (prevId == id) {
                const int ns = diag_score_nucl(pf, qprof.data(), (int)qlen, t,
                                               tlen, sorted[i].diagonal, false);
                if (ns > maxScore) {
                    maxScore = ns;
                    sorted[firstPos].diagonal = sorted[i].diagonal;
                }
            } else {
                maxScore = (i + 1 < len255 && sorted[i + 1].id == id)
                               ? diag_score_nucl(pf, qprof.data(), (int)qlen,
                                                 t, tlen, sorted[i].diagonal,
                                                 false)
                               : 0;
                firstPos = i;
            }
            prevId = id;
        }
    }
    resultSize = keep_max_only_n(pf, sorted, sorted.size());
    sorted.resize(resultSize);

    // threshold from histogram (computeScoreThreshold)
    uint64_t hist[256] = {0};
    for (size_t i = 0; i < resultSize; i++) hist[sorted[i].count]++;
    uint64_t acc = 0;
    unsigned int thr = 0;
    for (unsigned int s = 255; s > 0; s--) {
        acc += hist[s];
        if (acc >= (uint64_t)max_hits) { thr = s; break; }
    }
    thr = std::max((unsigned int)min_diag_thr, thr);

    std::vector<Counter> sorted2;
    sorted2.reserve(resultSize);
    const bool truncated = thr >= 255;
    for (int s = 255; s >= (int)thr; s--) {
        for (size_t i = 0; i < resultSize; i++) {
            if (sorted[i].count == (uint8_t)s) sorted2.push_back(sorted[i]);
        }
    }

    int rescale = 0;
    if (truncated) {
        int maxSelf = diag_score_nucl(pf, qprof.data(), (int)qlen, q,
                                      (int)qlen, 0, false);
        maxSelf = std::max(1, std::min(maxSelf - 255, (int)UINT16_MAX));
        rescale = maxSelf;
        std::vector<Counter> rescored;
        for (size_t i = 0; i < sorted2.size() && sorted2[i].count >= 255;
             i++) {
            const uint32_t id = sorted2[i].id;
            const uint8_t *t = pf->tdata.data() + pf->toff[id];
            const int tlen = (int)(pf->toff[id + 1] - pf->toff[id]);
            unsigned int ns = (unsigned int)diag_score_nucl(
                pf, qprof.data(), (int)qlen, t, tlen, sorted2[i].diagonal,
                false);
            ns -= 255;
            const float score = (float)std::min(ns, (unsigned int)UINT16_MAX);
            Counter c = sorted2[i];
            c.count = (uint8_t)((score / (float)maxSelf) * 255.0f + 0.5f);
            rescored.push_back(c);
        }
        sorted2.clear();
        for (int s = 255; s >= 0; s--) {
            for (auto &c : rescored) {
                if (c.count == (uint8_t)s) sorted2.push_back(c);
            }
        }
        thr = 0;
    }

    std::vector<Hit> res;
    if (identity_id != UINT32_MAX) {
        res.push_back({identity_id, UINT16_MAX, 0});
    }
    for (size_t i = 0; i < sorted2.size() && (int64_t)res.size() < max_hits;
         i++) {
        const uint32_t id = sorted2[i].id;
        const unsigned int sc = sorted2[i].count;
        if (sc < thr || id == identity_id) continue;
        Hit hh{id, (int32_t)sc, sorted2[i].diagonal};
        if (rescale != 0) {
            hh.prefScore = (int32_t)(255u + (sc * (unsigned int)rescale / 255u));
        } else if ((int)sc >= 255) {
            const uint8_t *t = pf->tdata.data() + pf->toff[id];
            const int tlen = (int)(pf->toff[id + 1] - pf->toff[id]);
            hh.prefScore = diag_score_nucl(pf, qprof.data(), (int)qlen, t,
                                           tlen, sorted2[i].diagonal, false);
        }
        res.push_back(hh);
    }
    const size_t from = (identity_id != UINT32_MAX) ? 1 : 0;
    if (res.size() > 1) {
        std::sort(res.begin() + from, res.end(), [](const Hit &a, const Hit &b) {
            if (std::abs(a.prefScore) > std::abs(b.prefScore)) return true;
            if (std::abs(b.prefScore) > std::abs(a.prefScore)) return false;
            return a.seqId < b.seqId;
        });
    }
    for (size_t i = 0; i < res.size(); i++) {
        out_id[i] = res[i].seqId;
        out_score[i] = res[i].prefScore;
        out_diag[i] = (int16_t)res[i].diagonal;
    }
    return (int64_t)res.size();
}

}  // extern "C"
