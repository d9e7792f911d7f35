"""Batched translated-fragment → target-DB search.

Replaces the reference's search workflow (prefilter + Alignment::run,
lib/mmseqs/src/workflow/Search.cpp + alignment/Alignment.cpp:244-312) with a
TPU-batched driver: candidate (fragment, target) pairs are length-bucketed,
padded, and aligned in dense device batches (ops/sw_jax.py). The hit
contract matches Matcher::result_t + Alignment::checkCriteria +
Matcher::compareHits ordering so downstream stages see exactly what the
reference's align module produces.

The default candidate generator is exhaustive (every fragment × every
target) — equivalent to the reference's --exhaustive-search "fake_pref"
path (data/workflow/blastp.sh:22-33); the k-mer prefilter plugs in as an
alternative generator with the same contract.
"""

import jax
import numpy as np

from ..data.submat import composition_bias_rounded, encode_aa
from ..ops.sw_jax import sw_align_batch
from ..ops.sw_pallas import sw_pallas_align_batch
from .evalue import EvalueComputation

HIT_DTYPE = np.dtype([
    ("orf_idx", np.int64),
    ("target_idx", np.int64),
    ("score_raw", np.int32),
    ("bit_score", np.int32),
    ("seq_id", np.float32),
    ("evalue", np.float64),
    ("q_start", np.int32),
    ("q_end", np.int32),
    ("q_len", np.int32),
    ("t_start", np.int32),
    ("t_end", np.int32),
    ("t_len", np.int32),
])

# device batch budget in DP cells per launch (S tensor = cells * 4 bytes)
CELL_BUDGET = 1 << 24


def _bucket(n, lo=32):
    b = lo
    while b < n:
        b *= 2
    return b


def estimate_seq_id(score, q_aln_len, t_aln_len):
    """Matcher::estimateSeqIdByScorePerCol (Matcher.cpp:284-288), float32."""
    m = np.maximum(np.maximum(q_aln_len, t_aln_len), 1).astype(np.float32)
    est = (np.float64(np.float32(score).astype(np.float32) / m)
           * 0.1656 + 0.1141).astype(np.float32)
    return np.clip(est, np.float32(0.0), np.float32(1.0))


class SearchDriver:
    """Aligns encoded fragments against an encoded target DB."""

    def __init__(self, params, target_db):
        self.params = params
        self.targets_enc = [encode_aa(target_db.seq_bytes(i))
                            for i in range(len(target_db))]
        self.target_lens = np.array([len(t) for t in self.targets_enc], np.int64)
        self.evaluer = EvalueComputation(target_db.total_residues(), gapped=True)

    def search(self, orf_aa_seqs, pair_generator=None):
        """Align fragments; returns a HIT_DTYPE array sorted per fragment.

        orf_aa_seqs: list of AA byte strings (translated fragments).
        pair_generator: optional iterable of (orf_idx, target_idx) candidate
          pairs; None = exhaustive.
        """
        p = self.params
        orfs_enc = [encode_aa(s) for s in orf_aa_seqs]
        orf_bias = [composition_bias_rounded(e, p.comp_bias_correction_scale)
                    if p.comp_bias_correction else np.zeros(len(e), np.int8)
                    for e in orfs_enc]
        n_orfs = len(orfs_enc)
        n_targets = len(self.targets_enc)

        if pair_generator is None:
            oi = np.repeat(np.arange(n_orfs, dtype=np.int64), n_targets)
            ti = np.tile(np.arange(n_targets, dtype=np.int64), n_orfs)
        else:
            pairs = np.asarray(list(pair_generator), dtype=np.int64)
            if len(pairs) == 0:
                return np.zeros(0, dtype=HIT_DTYPE)
            oi, ti = pairs[:, 0], pairs[:, 1]

        orf_lens = np.array([len(e) for e in orfs_enc], np.int64)
        # drop pairs with empty sequences
        keep = (orf_lens[oi] > 0) & (self.target_lens[ti] > 0)
        oi, ti = oi[keep], ti[keep]
        if len(oi) == 0:
            return np.zeros(0, dtype=HIT_DTYPE)

        # bucket by padded shapes
        lq_b = np.array([_bucket(l) for l in orf_lens])[oi]
        lt_b = np.array([_bucket(l) for l in self.target_lens])[ti]
        hits_parts = []
        for (Lq, Lt) in sorted(set(zip(lq_b.tolist(), lt_b.tolist()))):
            sel = np.flatnonzero((lq_b == Lq) & (lt_b == Lt))
            batch_cap = max(8, CELL_BUDGET // (Lq * Lt))
            for s in range(0, len(sel), batch_cap):
                chunk = sel[s:s + batch_cap]
                hits_parts.append(self._align_chunk(
                    oi[chunk], ti[chunk], orfs_enc, orf_bias, Lq, Lt))
        if not hits_parts:
            return np.zeros(0, dtype=HIT_DTYPE)
        hits = np.concatenate(hits_parts)
        return self._filter_and_sort(hits)

    def _align_chunk(self, oi, ti, orfs_enc, orf_bias, Lq, Lt):
        B = len(oi)
        q_enc = np.zeros((B, Lq), np.int32)
        q_bias = np.zeros((B, Lq), np.int32)
        t_enc = np.zeros((B, Lt), np.int32)
        q_len = np.zeros(B, np.int32)
        t_len = np.zeros(B, np.int32)
        for k in range(B):
            qe = orfs_enc[oi[k]]
            te = self.targets_enc[ti[k]]
            q_len[k] = len(qe)
            t_len[k] = len(te)
            q_enc[k, :len(qe)] = qe
            q_bias[k, :len(qe)] = orf_bias[oi[k]]
            t_enc[k, :len(te)] = te
        # Pallas kernel on TPU; XLA column scan elsewhere (CPU tests)
        align = (sw_align_batch if jax.default_backend() == "cpu"
                 else sw_pallas_align_batch)
        score, q_start, q_end, t_start, t_end = align(
            q_enc, q_bias, q_len, t_enc, t_len)
        out = np.zeros(B, dtype=HIT_DTYPE)
        out["orf_idx"] = oi
        out["target_idx"] = ti
        out["score_raw"] = score
        out["q_start"], out["q_end"], out["q_len"] = q_start, q_end, q_len
        out["t_start"], out["t_end"], out["t_len"] = t_start, t_end, t_len
        return out

    def _filter_and_sort(self, hits):
        p = self.params
        ev = self.evaluer
        score = hits["score_raw"].astype(np.float64)
        # evalue over the full query length (ssw_align_private:391)
        hits["evalue"] = ev.compute_evalue(score, hits["q_len"].astype(np.float64))
        hits["bit_score"] = ev.compute_bit_score_int(score)
        q_aln = np.maximum(hits["q_end"] - hits["q_start"], 1)
        t_aln = np.maximum(hits["t_end"] - hits["t_start"], 1)
        hits["seq_id"] = estimate_seq_id(hits["score_raw"], q_aln, t_aln)

        aligned = (hits["t_end"] >= 0) & (hits["score_raw"] > 0) & (hits["t_start"] >= 0)
        # Alignment::checkCriteria (Alignment.cpp:548-567)
        aln_len = np.maximum(np.abs(hits["q_end"] - hits["q_start"]),
                             np.abs(hits["t_end"] - hits["t_start"])) + 1
        ok = (aligned
              & (hits["evalue"] <= p.search_evalue_thr)
              & (hits["seq_id"] >= p.seq_id_thr)
              & (aln_len >= p.aln_len_thr))
        hits = hits[ok]
        # Matcher::compareHits order per query (Matcher.h:157-168):
        # evalue asc, score desc, dbLen asc, dbKey asc; grouped by orf
        order = np.lexsort((hits["target_idx"], hits["t_len"],
                            -hits["bit_score"], hits["evalue"], hits["orf_idx"]))
        return hits[order]
