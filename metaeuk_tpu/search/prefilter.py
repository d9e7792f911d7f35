"""Ungapped prefilter driver: candidate (fragment, target) pair selection.

Mirrors the contract of the reference's ungapped prefilter
(lib/mmseqs/src/prefiltering/ungappedprefilter.cpp:358-470): per query,
targets with max-gapless-diagonal score > --min-ungapped-score are kept,
sorted by (score desc, targetKey asc), truncated to --max-seqs. The scores
come from the TPU gapless kernel (ops/ungapped.py) over blocked
query x target cross products.
"""

import numpy as np

from ..data.submat import composition_bias_rounded, encode_aa
from ..ops.ungapped import gapless_scores


def _bucket(n, lo=32):
    b = lo
    while b < n:
        b *= 2
    return b


class UngappedPrefilter:
    """Produces candidate pairs for SearchDriver.search(pair_generator=...)."""

    def __init__(self, params, target_db, min_diag_score=15):
        self.params = params
        self.min_diag_score = min_diag_score
        self.targets_enc = [encode_aa(target_db.seq_bytes(i))
                            for i in range(len(target_db))]
        self.target_lens = np.array([len(t) for t in self.targets_enc], np.int64)

    def candidate_pairs(self, orf_aa_seqs, block_cells=1 << 24):
        """Returns an (n_pairs, 2) int64 array of (orf_idx, target_idx),
        ordered per fragment by (score desc, target_idx asc), top max-seqs."""
        p = self.params
        orfs_enc = [encode_aa(s) for s in orf_aa_seqs]
        orf_bias = [composition_bias_rounded(e, p.comp_bias_correction_scale)
                    if p.comp_bias_correction else np.zeros(len(e), np.int8)
                    for e in orfs_enc]
        n_orfs = len(orfs_enc)
        n_targets = len(self.targets_enc)
        if n_orfs == 0 or n_targets == 0:
            return np.zeros((0, 2), dtype=np.int64)

        orf_lens = np.array([len(e) for e in orfs_enc], np.int64)
        scores = np.zeros((n_orfs, n_targets), dtype=np.int32)

        # group by padded length buckets, then run blocked cross products
        q_buckets = np.array([_bucket(max(l, 1)) for l in orf_lens])
        t_buckets = np.array([_bucket(max(l, 1)) for l in self.target_lens])
        for Lq in np.unique(q_buckets):
            qi_all = np.flatnonzero(q_buckets == Lq)
            for Lt in np.unique(t_buckets):
                ti_all = np.flatnonzero(t_buckets == Lt)
                # block sizes bounded by the device cell budget
                per_pair = Lq * Lt
                max_pairs = max(8, block_cells // per_pair)
                nq_blk = max(1, int(np.sqrt(max_pairs)))
                nt_blk = max(1, max_pairs // nq_blk)
                for qs in range(0, len(qi_all), nq_blk):
                    q_blk = qi_all[qs:qs + nq_blk]
                    q_enc = np.zeros((len(q_blk), Lq), np.int32)
                    q_bias = np.zeros((len(q_blk), Lq), np.int32)
                    for k, qi in enumerate(q_blk):
                        q_enc[k, :orf_lens[qi]] = orfs_enc[qi]
                        q_bias[k, :orf_lens[qi]] = orf_bias[qi]
                    for ts in range(0, len(ti_all), nt_blk):
                        t_blk = ti_all[ts:ts + nt_blk]
                        t_enc = np.zeros((len(t_blk), Lt), np.int32)
                        for k, ti in enumerate(t_blk):
                            t_enc[k, :self.target_lens[ti]] = self.targets_enc[ti]
                        # cross product
                        oi = np.repeat(np.arange(len(q_blk)), len(t_blk))
                        ti2 = np.tile(np.arange(len(t_blk)), len(q_blk))
                        s = gapless_scores(
                            q_enc[oi], q_bias[oi], orf_lens[q_blk][oi],
                            t_enc[ti2], self.target_lens[t_blk][ti2])
                        scores[np.ix_(q_blk, t_blk)] = s.reshape(
                            len(q_blk), len(t_blk))

        pairs = []
        max_seqs = p.max_res_list_len
        for qi in range(n_orfs):
            row = scores[qi]
            keep = np.flatnonzero(row > self.min_diag_score)
            if len(keep) == 0:
                continue
            # (score desc, target key asc), truncate to max-seqs
            order = np.lexsort((keep, -row[keep]))[:max_seqs]
            for ti in keep[order]:
                pairs.append((qi, ti))
        return np.asarray(pairs, dtype=np.int64).reshape(-1, 2)
