"""Nucleotide-vs-nucleotide search (the blastn.sh path role).

Contract-level equivalent of the reference's nucleotide search mode
(Search.cpp search-type 3 -> data/workflow/blastn.sh: nucleotide
prefilter with canonical k-mers over both strands + banded alignment).
This framework's own design: exact 15-mer seeding on the host, then the
batched TPU Smith-Waterman kernels (ops/sw_jax.py) with the nucleotide
matrix (+4/-5 at 2 bit) and gap costs 7/1 (matching the precomputed
nucleotide Gumbel table, EvalueComputation.h:57-63).

Minus-strand hits align revcomp(query) vs target; coordinates are
reported in revcomp-query space with strand=-1 (callers may re-map to
plus-query coordinates with L-1-x, the blastn convention).
"""

import numpy as np

from ..data.nucl import NUCL_SCORES, encode_nucl, revcomp_enc
from .evalue import EvalueComputation

KMER = 15
NUCL_GO, NUCL_GE = 7, 1


def _kmer_codes(enc, k=KMER):
    """Packed 2-bit codes of X-free k-mers + their start positions."""
    enc = np.asarray(enc, np.int64)
    if len(enc) < k:
        return np.zeros(0, np.int64), np.zeros(0, np.int64)
    win = np.lib.stride_tricks.sliding_window_view(enc, k)
    valid = (win < 4).all(axis=1)
    pows = (4 ** np.arange(k)).astype(np.int64)
    codes = (win * pows).sum(axis=1)
    pos = np.flatnonzero(valid)
    return codes[valid], pos


def _align_batch(qs_enc, targets, cand, q_len):
    """Batched full SW (nucl matrix/gaps) of one query vs candidate
    targets; returns (score, q_start, q_end, t_start, t_end) arrays."""
    from ..ops.sw_jax import sw_batch_ends, sw_batch_starts
    import jax.numpy as jnp
    Lq = 1 << max(4, int(np.ceil(np.log2(max(2, q_len)))))
    Lt = 1 << max(4, int(np.ceil(np.log2(
        max(2, max(len(targets[t]) for t in cand))))))
    B = len(cand)
    qe = np.zeros((B, Lq), np.int32)
    qb = np.zeros((B, Lq), np.int32)
    ql = np.full(B, q_len, np.int32)
    te = np.zeros((B, Lt), np.int32)
    tl = np.zeros(B, np.int32)
    for i, ti in enumerate(cand):
        qe[i, :q_len] = qs_enc
        t = targets[ti]
        te[i, :len(t)] = t
        tl[i] = len(t)
    sm = NUCL_SCORES
    score, q_end, t_end = sw_batch_ends(
        qe, qb, ql, te, Lq, Lt, t_len=tl, go=NUCL_GO, ge=NUCL_GE, submat=sm)
    qend_c = jnp.maximum(q_end, 0)
    tend_c = jnp.maximum(t_end, 0)
    s2, qr_end, tr_end = sw_batch_starts(
        qe, qb, ql, te, Lq, Lt, t_len=tl, q_end=qend_c, t_end=tend_c,
        go=NUCL_GO, ge=NUCL_GE, submat=sm)
    score = np.asarray(score)
    q_end = np.asarray(q_end)
    t_end = np.asarray(t_end)
    q_start = np.asarray(qend_c) - np.asarray(qr_end)
    t_start = np.asarray(tend_c) - np.asarray(tr_end)
    return score, q_start, q_end, t_start, t_end


class NuclSearch:
    """Index targets once; search nucleotide queries on both strands."""

    def __init__(self, target_encs, max_evalue=1e-3, max_seqs=300):
        self.targets = [np.asarray(t, np.uint8) for t in target_encs]
        self.max_evalue = max_evalue
        self.max_seqs = max_seqs
        self.evaluer = EvalueComputation(
            sum(len(t) for t in self.targets), nucl=True)
        self.index = {}
        for ti, t in enumerate(self.targets):
            codes, _ = _kmer_codes(t)
            for c in np.unique(codes):
                self.index.setdefault(int(c), set()).add(ti)

    def _candidates(self, enc):
        codes, _ = _kmer_codes(enc)
        hits = set()
        for c in np.unique(codes):
            hits |= self.index.get(int(c), set())
        return sorted(hits)

    def search(self, query_encs):
        """Per query: list of hit dicts (target, strand, score, evalue,
        q/t coords), sorted by (evalue asc, target asc)."""
        results = []
        for q in query_encs:
            q = np.asarray(q, np.uint8)
            hits = []
            for strand, qs_enc in ((1, q), (-1, revcomp_enc(q))):
                cand = self._candidates(qs_enc)
                if not cand:
                    continue
                score, q_start, q_end, t_start, t_end = _align_batch(
                    qs_enc, self.targets, cand, len(q))
                for i, ti in enumerate(cand):
                    sc = int(score[i])
                    if sc <= 0 or int(t_end[i]) < 0:
                        continue
                    ev = self.evaluer.compute_evalue(sc, len(q))
                    if ev > self.max_evalue:
                        continue
                    hits.append(dict(
                        target=ti, strand=strand, score=sc, evalue=ev,
                        bit_score=int(self.evaluer.compute_bit_score_int(sc)),
                        q_start=int(q_start[i]), q_end=int(q_end[i]),
                        t_start=int(t_start[i]), t_end=int(t_end[i])))
            hits.sort(key=lambda h: (h["evalue"], h["target"]))
            results.append(hits[:self.max_seqs])
        return results


def nucl_search_fasta(query_path, target_path, max_evalue=1e-3):
    """FASTA convenience wrapper returning (results, query_names,
    target_names)."""
    from ..io.fasta import read_fasta
    t_names, t_encs = [], []
    for name, seq in read_fasta(target_path):
        t_names.append(name if isinstance(name, str) else name.decode())
        t_encs.append(encode_nucl(seq))
    q_names, q_encs = [], []
    for name, seq in read_fasta(query_path):
        q_names.append(name if isinstance(name, str) else name.decode())
        q_encs.append(encode_nucl(seq))
    return NuclSearch(t_encs, max_evalue).search(q_encs), q_names, t_names
