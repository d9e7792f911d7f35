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
CELL_BUDGET = 1 << 27


def _bucket(n, lo=256):
    """Coarse length buckets (x4 steps). Deliberately very coarse: each
    distinct jit shape costs seconds of executable load over a tunneled
    TPU link, while padded DP cells are nearly free (the fused kernel
    runs at ~23 Gcells/s), so few big shapes beat many tight ones."""
    b = lo
    while b < n:
        b *= 4
    return b


def pad_rows(seqs, width, dtype=np.int32):
    """Stack variable-length rows into one padded matrix (vectorized)."""
    n = len(seqs)
    out = np.zeros((n, width), dtype)
    if n == 0:
        return out
    lens = np.fromiter((len(s) for s in seqs), np.int64, n)
    flat = np.concatenate([np.asarray(s) for s in seqs]) if lens.sum() else \
        np.zeros(0, dtype)
    mask = np.arange(width)[None, :] < lens[:, None]
    out[mask] = flat
    return out


def _pad_rows_to(mat, n_rows):
    """Pad a (n, W) matrix with zero rows up to n_rows (shape tiering)."""
    if mat.shape[0] >= n_rows:
        return mat
    return np.pad(mat, ((0, n_rows - mat.shape[0]), (0, 0)))


def estimate_seq_id(score, q_aln_len, t_aln_len):
    """Matcher::estimateSeqIdByScorePerCol (Matcher.cpp:284-288), float32."""
    m = np.maximum(np.maximum(q_aln_len, t_aln_len), 1).astype(np.float32)
    est = (np.float64(np.float32(score).astype(np.float32) / m)
           * 0.1656 + 0.1141).astype(np.float32)
    return np.clip(est, np.float32(0.0), np.float32(1.0))


import functools

import jax.numpy as jnp


@functools.partial(jax.jit, static_argnums=(7, 8, 9))
def _gathered_align_jit(q_mat, qb_mat, q_lens, t_mat, t_lens, li, lj,
                        Lq, Lt, use_pallas):
    """Device-side pair gather + full alignment in one dispatch."""
    # padded tail pairs are flagged by li < 0
    valid = li >= 0
    li = jnp.maximum(li, 0)
    q_enc = q_mat[li]
    q_bias = qb_mat[li]
    q_len = q_lens[li]
    t_enc = t_mat[lj]
    t_len = t_lens[lj]
    q_len = jnp.where(valid, q_len, 0)
    t_len = jnp.where(valid, t_len, 0)
    if use_pallas:
        from ..ops.sw_pallas import _align_full
        return _align_full(q_enc, q_bias, q_len, t_enc, t_len, Lq, Lt, False)
    from ..ops.sw_jax import sw_batch_ends, sw_batch_starts
    score, q_end, t_end = sw_batch_ends(q_enc, q_bias, q_len, t_enc, Lq, Lt,
                                        t_len=t_len)
    qe = jnp.maximum(q_end, 0)
    te = jnp.maximum(t_end, 0)
    score2, qr_end, tr_end = sw_batch_starts(
        q_enc, q_bias, q_len, t_enc, Lq, Lt, t_len=t_len, q_end=qe, t_end=te)
    aligned = (t_end >= 0) & (score > 0)
    q_start = jnp.where(aligned, qe - qr_end, -1)
    t_start = jnp.where(aligned, te - tr_end, -1)
    return score, q_start, q_end, t_start, t_end


def _gathered_align(q_mat, qb_mat, q_lens, t_mat, t_lens, li, lj,
                    fixed_b=None):
    # very long queries overflow the Pallas kernel's VMEM scratch
    # ((Lq, TB) int32 x4 carries); fall back to the XLA scan there
    use_pallas = jax.default_backend() != "cpu" and q_mat.shape[1] <= 4096
    if use_pallas:
        from ..ops.sw_pallas import TB
        mult = TB
    else:
        mult = 8
    B = len(li)
    Bp = ((max(B, fixed_b or 0) + mult - 1) // mult) * mult
    li_p = np.full(Bp, -1, np.int32)
    lj_p = np.zeros(Bp, np.int32)
    li_p[:B] = li
    lj_p[:B] = lj
    Lq, Lt = int(q_mat.shape[1]), int(t_mat.shape[1])
    outs = _gathered_align_jit(
        q_mat, qb_mat, jnp.asarray(q_lens, jnp.int32), t_mat,
        jnp.asarray(t_lens, jnp.int32), jnp.asarray(li_p),
        jnp.asarray(lj_p), Lq, Lt, use_pallas)
    return outs


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

        # bias only for fragments that actually align (after a selective
        # prefilter most fragments have no candidates)
        orf_bias = {}
        for i in np.unique(oi):
            e = orfs_enc[i]
            orf_bias[i] = (composition_bias_rounded(
                e, p.comp_bias_correction_scale)
                if p.comp_bias_correction else np.zeros(len(e), np.int8))

        orf_lens = np.array([len(e) for e in orfs_enc], np.int64)
        # drop pairs with empty sequences
        keep = (orf_lens[oi] > 0) & (self.target_lens[ti] > 0)
        oi, ti = oi[keep], ti[keep]
        if len(oi) == 0:
            return np.zeros(0, dtype=HIT_DTYPE)

        # stage per-bucket padded matrices ONCE (device-side gather per
        # chunk keeps the host out of the per-pair path)
        lq_of = np.array([_bucket(max(l, 1)) for l in orf_lens])
        lt_of = np.array([_bucket(max(l, 1)) for l in self.target_lens])
        lq_b, lt_b = lq_of[oi], lt_of[ti]
        hits_parts = []
        for (Lq, Lt) in sorted(set(zip(lq_b.tolist(), lt_b.tolist()))):
            sel = np.flatnonzero((lq_b == Lq) & (lt_b == Lt))
            q_ids = np.unique(oi[sel])
            t_ids = np.unique(ti[sel])
            # stage on device once per bucket (repeated host->device
            # uploads dominate on high-latency links otherwise); row
            # counts are padded to power-of-two tiers so the jit shapes
            # are dataset-independent — any workload reuses the same
            # compiled executables (XLA persistent cache hits)
            nq_pad = _bucket(max(len(q_ids), 1), lo=8)
            nt_pad = _bucket(max(len(t_ids), 1), lo=8)
            q_mat = jnp.asarray(_pad_rows_to(
                pad_rows([orfs_enc[i] for i in q_ids], Lq), nq_pad))
            qb_mat = jnp.asarray(_pad_rows_to(
                pad_rows([orf_bias[i] for i in q_ids], Lq), nq_pad))
            q_lens = orf_lens[q_ids].astype(np.int32)
            q_lens_dev = jnp.asarray(np.pad(q_lens,
                                            (0, nq_pad - len(q_ids))))
            t_mat = jnp.asarray(_pad_rows_to(
                pad_rows([self.targets_enc[i] for i in t_ids], Lt), nt_pad))
            t_lens = self.target_lens[t_ids].astype(np.int32)
            t_lens_dev = jnp.asarray(np.pad(t_lens,
                                            (0, nt_pad - len(t_ids))))
            q_remap = np.zeros(int(q_ids.max()) + 1, np.int32)
            q_remap[q_ids] = np.arange(len(q_ids), dtype=np.int32)
            t_remap = np.zeros(int(t_ids.max()) + 1, np.int32)
            t_remap[t_ids] = np.arange(len(t_ids), dtype=np.int32)
            batch_cap = max(8, CELL_BUDGET // (Lq * Lt))
            for s in range(0, len(sel), batch_cap):
                chunk = sel[s:s + batch_cap]
                # fixed chunk shape per bucket -> exactly one compile
                fixed = batch_cap if len(sel) > batch_cap else None
                hits_parts.append(self._align_chunk(
                    oi[chunk], ti[chunk], q_remap, t_remap,
                    q_mat, qb_mat, q_lens, q_lens_dev, t_mat, t_lens,
                    t_lens_dev, fixed_b=fixed))
        if not hits_parts:
            return np.zeros(0, dtype=HIT_DTYPE)
        # one concatenated device->host fetch for all chunks
        cat = [np.asarray(jnp.concatenate([p[4][k] for p in hits_parts]))
               for k in range(5)]
        offs = np.cumsum([0] + [p[4][0].shape[0] for p in hits_parts])
        resolved = []
        for idx, (oi_c, ti_c, q_len_c, t_len_c, _outs) in enumerate(hits_parts):
            B = len(oi_c)
            sl = slice(offs[idx], offs[idx] + B)
            out = np.zeros(B, dtype=HIT_DTYPE)
            out["orf_idx"] = oi_c
            out["target_idx"] = ti_c
            out["score_raw"] = cat[0][sl]
            out["q_start"], out["q_end"] = cat[1][sl], cat[2][sl]
            out["q_len"] = q_len_c
            out["t_start"], out["t_end"] = cat[3][sl], cat[4][sl]
            out["t_len"] = t_len_c
            resolved.append(out)
        hits = np.concatenate(resolved)
        return self._filter_and_sort(hits)

    def _align_chunk(self, oi, ti, q_remap, t_remap,
                     q_mat, qb_mat, q_lens, q_lens_dev, t_mat, t_lens,
                     t_lens_dev, fixed_b=None):
        """Submit one chunk; returns deferred device outputs (no fetch)."""
        li = q_remap[oi]
        lj = t_remap[ti]
        outs = _gathered_align(q_mat, qb_mat, q_lens_dev, t_mat, t_lens_dev,
                               li, lj, fixed_b=fixed_b)
        return oi, ti, q_lens[li], t_lens[lj], outs

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
        ok = (aligned
              & (hits["evalue"] <= p.search_evalue_thr)
              & (hits["seq_id"] >= p.seq_id_thr)
              & has_cov
              & (aln_len >= p.aln_len_thr))
        hits = hits[ok]
        # Matcher::compareHits order per query (Matcher.h:157-168):
        # evalue asc, score desc, dbLen asc, dbKey asc; grouped by orf
        order = np.lexsort((hits["target_idx"], hits["t_len"],
                            -hits["bit_score"], hits["evalue"], hits["orf_idx"]))
        return hits[order]

    def realign(self, hits, orf_aa_seqs, realign_score_bias=-0.2,
                realign_max_seqs=None, realign_cov=0.0, cov_mode=0):
        """--realign pass (Alignment.cpp:298-446): recompute alignment
        boundaries and backtraces with the scoreBias-shifted matrix
        (default -0.2, Parameters.cpp:2437); scores and E-values keep
        the first-pass values. Composition bias is recomputed with the
        realign matrix (the realigner Matcher owns realign_m,
        Alignment.cpp:158-162, 303).

        Returns (hits_out, backtraces, seq_ids): coords replaced by the
        realign pass; rows dropped only by the realign coverage gate,
        and per query at most realign_max_seqs rows survive."""
        from ..data.submat import scores_with_bias
        from .. import native

        p = self.params
        sub = scores_with_bias(2.0, realign_score_bias)
        enc_cache = {}

        def q_arrays(oi):
            if oi not in enc_cache:
                e = encode_aa(orf_aa_seqs[oi])
                b = composition_bias_rounded(
                    e, p.comp_bias_correction_scale, scores=sub) \
                    if p.comp_bias_correction else np.zeros(len(e), np.int8)
                enc_cache[oi] = (e, b)
            return enc_cache[oi]

        n = len(hits)
        score2 = np.zeros(n, np.int32)
        qs2 = np.zeros(n, np.int32)
        qe2 = np.zeros(n, np.int32)
        ts2 = np.zeros(n, np.int32)
        te2 = np.zeros(n, np.int32)
        # bucket hit pairs and realign in dense batches
        ol = np.array([len(q_arrays(int(h["orf_idx"]))[0]) for h in hits],
                      np.int64)
        tl = hits["t_len"].astype(np.int64)
        lq_b = np.array([_bucket(max(l, 1)) for l in ol])
        lt_b = np.array([_bucket(max(l, 1)) for l in tl])
        for (Lq, Lt) in sorted(set(zip(lq_b.tolist(), lt_b.tolist()))):
            sel = np.flatnonzero((lq_b == Lq) & (lt_b == Lt))
            qm = pad_rows([q_arrays(int(hits[i]["orf_idx"]))[0]
                           for i in sel], Lq)
            qb = pad_rows([q_arrays(int(hits[i]["orf_idx"]))[1]
                           for i in sel], Lq)
            tm = pad_rows([self.targets_enc[int(hits[i]["target_idx"])]
                           for i in sel], Lt)
            sc, qs, qe, ts, te = sw_align_batch(
                qm, qb, ol[sel].astype(np.int32), tm,
                tl[sel].astype(np.int32), submat=sub)
            score2[sel], qs2[sel], qe2[sel] = sc, qs, qe
            ts2[sel], te2[sel] = ts, te

        keep = np.zeros(n, bool)
        bts, seq_ids = [], []
        per_query = {}
        cap = realign_max_seqs if realign_max_seqs is not None else 1 << 62
        for i in range(n):
            oi = int(hits[i]["orf_idx"])
            if per_query.get(oi, 0) >= cap:
                continue
            if score2[i] <= 0 or te2[i] < 0:
                continue
            q_cov = (abs(int(qe2[i]) - int(qs2[i])) + 1) / max(int(ol[i]), 1)
            t_cov = (abs(int(te2[i]) - int(ts2[i])) + 1) / max(int(tl[i]), 1)
            if cov_mode == 1:  # COV_MODE_TARGET
                cov_ok = t_cov >= realign_cov
            elif cov_mode == 2:  # COV_MODE_QUERY
                cov_ok = q_cov >= realign_cov
            else:
                cov_ok = q_cov >= realign_cov and t_cov >= realign_cov
            if not cov_ok:
                continue
            per_query[oi] = per_query.get(oi, 0) + 1
            keep[i] = True
            q_enc, q_bias = q_arrays(oi)
            t_enc = self.targets_enc[int(hits[i]["target_idx"])]
            qs, qe = int(qs2[i]), int(qe2[i])
            ts, te = int(ts2[i]), int(te2[i])
            band = abs((te - ts + 1) - (qe - qs + 1)) + 1
            bt = native.banded_sw_traceback(
                q_enc[qs:qe + 1], q_bias[qs:qe + 1], t_enc[ts:te + 1],
                int(score2[i]), band, p.gap_open, p.gap_extend, submat=sub)
            if bt is None:
                bt = ""
            bts.append(bt)
            if bt:
                qp, tp, ids = qs, ts, 0
                for op in bt:
                    if op == "M":
                        ids += int(q_enc[qp] == t_enc[tp])
                        qp += 1
                        tp += 1
                    elif op == "I":
                        qp += 1
                    else:
                        tp += 1
                seq_ids.append(np.float32(ids) / np.float32(len(bt)))
            else:
                seq_ids.append(np.float32(0.0))
        out = hits[keep].copy()
        out["q_start"], out["q_end"] = qs2[keep], qe2[keep]
        out["t_start"], out["t_end"] = ts2[keep], te2[keep]
        return out, bts, np.asarray(seq_ids, np.float32)

    def backtraces(self, hits, orf_aa_seqs):
        """M/I/D backtraces + exact seqIds for accepted hits — the reference's
        alignment-mode-3 path (banded_sw on the alignment window +
        computerBacktrace, StripedSmithWaterman.cpp:498-581). Returns
        (list[str], float32 seqIds by alnLen)."""
        from .. import native
        from ..data.submat import composition_bias_rounded

        p = self.params
        enc_cache = {}
        bts = []
        seq_ids = np.zeros(len(hits), np.float32)
        for idx, h in enumerate(hits):
            oi = int(h["orf_idx"])
            if oi not in enc_cache:
                e = encode_aa(orf_aa_seqs[oi])
                b = composition_bias_rounded(e, p.comp_bias_correction_scale) \
                    if p.comp_bias_correction else np.zeros(len(e), np.int8)
                enc_cache[oi] = (e, b)
            q_enc, q_bias = enc_cache[oi]
            t_enc = self.targets_enc[int(h["target_idx"])]
            qs, qe = int(h["q_start"]), int(h["q_end"])
            ts, te = int(h["t_start"]), int(h["t_end"])
            band = abs((te - ts + 1) - (qe - qs + 1)) + 1
            bt = native.banded_sw_traceback(
                q_enc[qs:qe + 1], q_bias[qs:qe + 1], t_enc[ts:te + 1],
                int(h["score_raw"]), band, p.gap_open, p.gap_extend)
            if bt is None:
                bt = ""
            bts.append(bt)
            if bt:
                qp, tp, ids = qs, ts, 0
                for op in bt:
                    if op == "M":
                        ids += int(q_enc[qp] == t_enc[tp])
                        qp += 1
                        tp += 1
                    elif op == "I":
                        qp += 1
                    else:
                        tp += 1
                seq_ids[idx] = np.float32(ids) / np.float32(len(bt))
        return bts, seq_ids
