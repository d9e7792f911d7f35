"""Profile-query gapped alignment (the align module with an HMM-profile
query DB, as run by iterative searches: blastpgp.sh steps >= 1).

Mirrors Alignment::run for querySeqType HMM_PROFILE
(lib/mmseqs/src/alignment/Alignment.cpp:244-312 + Matcher::getSWResult
with the PROFILE_SEQ ssw path, StripedSmithWaterman.cpp:296-299,1474):
the query's position-specific scores come from the stored PSSM (/4), no
composition bias, targets are plain sequences. Output rows follow
Matcher::compareHits order and resultToBuffer formatting; backtraces via
the banded PROFILE_SEQ traceback; seqId counts target residues equal to
the profile's query letters (computerBacktrace,
StripedSmithWaterman.cpp:558).
"""

import numpy as np

from ..data.submat import encode_aa
from ..ops.sw_jax import sw_align_batch_prof
from .driver import HIT_DTYPE, _bucket
from .evalue import EvalueComputation

CELL_BUDGET = 1 << 24


class ProfileQueryAligner:
    """Aligns an HMM-profile query DB against an encoded sequence target
    set given (profile_idx, target_idx) candidate pairs."""

    def __init__(self, params, profile_db, target_db):
        self.params = params
        self.profiles = profile_db
        self.prof_lens = np.array([len(p) for p in profile_db.pssms],
                                  np.int64)
        self.targets_enc = [encode_aa(target_db.seq_bytes(i))
                            for i in range(len(target_db))]
        self.target_lens = np.array([len(t) for t in self.targets_enc],
                                    np.int64)
        self.evaluer = EvalueComputation(target_db.total_residues(),
                                         gapped=True)

    def search(self, pair_generator, eval_thr=None):
        """HIT_DTYPE rows (orf_idx = profile index) in compareHits order."""
        p = self.params
        pairs = np.asarray(list(pair_generator), dtype=np.int64)
        if len(pairs) == 0:
            return np.zeros(0, dtype=HIT_DTYPE)
        pi, ti = pairs[:, 0], pairs[:, 1]
        keep = (self.prof_lens[pi] > 0) & (self.target_lens[ti] > 0)
        pi, ti = pi[keep], ti[keep]
        if len(pi) == 0:
            return np.zeros(0, dtype=HIT_DTYPE)

        lq_b = np.array([_bucket(max(l, 1)) for l in self.prof_lens])[pi]
        lt_b = np.array([_bucket(max(l, 1)) for l in self.target_lens])[ti]
        out_parts = []
        for (Lq, Lt) in sorted(set(zip(lq_b.tolist(), lt_b.tolist()))):
            sel = np.flatnonzero((lq_b == Lq) & (lt_b == Lt))
            batch_cap = max(4, CELL_BUDGET // (Lq * Lt))
            for s in range(0, len(sel), batch_cap):
                chunk = sel[s:s + batch_cap]
                B = len(chunk)
                prof_mat = np.zeros((B, Lq, 21), np.int32)
                ql = np.zeros(B, np.int32)
                t_mat = np.zeros((B, Lt), np.int32)
                tl = np.zeros(B, np.int32)
                for row, idx in enumerate(chunk):
                    pm = self.profiles.pssms[pi[idx]]
                    prof_mat[row, :len(pm)] = pm
                    ql[row] = len(pm)
                    t = self.targets_enc[ti[idx]]
                    t_mat[row, :len(t)] = t
                    tl[row] = len(t)
                score, qs, qe, ts, te = sw_align_batch_prof(
                    prof_mat, ql, t_mat, tl)
                part = np.zeros(B, dtype=HIT_DTYPE)
                part["orf_idx"] = pi[chunk]
                part["target_idx"] = ti[chunk]
                part["score_raw"] = score
                part["q_start"], part["q_end"] = qs, qe
                part["q_len"] = ql
                part["t_start"], part["t_end"] = ts, te
                part["t_len"] = tl
                out_parts.append(part)
        hits = np.concatenate(out_parts)
        ev = self.evaluer
        score = hits["score_raw"].astype(np.float64)
        hits["evalue"] = ev.compute_evalue(score,
                                           hits["q_len"].astype(np.float64))
        hits["bit_score"] = ev.compute_bit_score_int(score)

        thr = p.search_evalue_thr if eval_thr is None else eval_thr
        aligned = (hits["t_end"] >= 0) & (hits["score_raw"] > 0) \
            & (hits["t_start"] >= 0)
        aln_len = np.maximum(np.abs(hits["q_end"] - hits["q_start"]),
                             np.abs(hits["t_end"] - hits["t_start"])) + 1
        q_cov = (np.abs(hits["q_end"] - hits["q_start"]) + 1) \
            / np.maximum(hits["q_len"], 1)
        t_cov = (np.abs(hits["t_end"] - hits["t_start"]) + 1) \
            / np.maximum(hits["t_len"], 1)
        if p.cov_mode == 1:  # COV_MODE_TARGET (Util.cpp:496-511)
            has_cov = t_cov >= p.cov_thr
        elif p.cov_mode == 2:  # COV_MODE_QUERY
            has_cov = q_cov >= p.cov_thr
        else:
            has_cov = (q_cov >= p.cov_thr) & (t_cov >= p.cov_thr)
        ok = (aligned & (hits["evalue"] <= thr) & has_cov
              & (aln_len >= p.aln_len_thr))
        hits = hits[ok]
        order = np.lexsort((hits["target_idx"], hits["t_len"],
                            -hits["bit_score"], hits["evalue"],
                            hits["orf_idx"]))
        return hits[order]

    def backtraces(self, hits):
        """(backtrace strings, exact seqIds) for accepted hits — the
        PROFILE_SEQ banded traceback; identity counts target residues
        matching the profile's query letters."""
        from .. import native

        p = self.params
        bts = []
        seq_ids = np.zeros(len(hits), np.float32)
        for idx, h in enumerate(hits):
            pidx = int(h["orf_idx"])
            pssm = np.asarray(self.profiles.pssms[pidx], np.int32)
            qseq = self.profiles.query_seqs[pidx]
            t_enc = self.targets_enc[int(h["target_idx"])]
            qs, qe = int(h["q_start"]), int(h["q_end"])
            ts, te = int(h["t_start"]), int(h["t_end"])
            band = abs((te - ts + 1) - (qe - qs + 1)) + 1
            bt = native.banded_sw_traceback_prof(
                pssm[qs:qe + 1], t_enc[ts:te + 1], int(h["score_raw"]),
                band, p.gap_open, p.gap_extend)
            if bt is None:
                bt = ""
            bts.append(bt)
            if bt:
                qp, tp, ids = qs, ts, 0
                for op in bt:
                    if op == "M":
                        ids += int(qseq[qp] == t_enc[tp])
                        qp += 1
                        tp += 1
                    elif op == "I":
                        qp += 1
                    else:
                        tp += 1
                seq_ids[idx] = np.float32(ids) / np.float32(len(bt))
        return bts, seq_ids
