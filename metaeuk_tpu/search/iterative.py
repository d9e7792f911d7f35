"""Iterative profile search (the blastpgp.sh role; PSI-BLAST-like).

Contract-level implementation of workflow/blastpgp.sh: per iteration,
search the current query (sequence DB, then profile DBs built by
result2profile) against the target DB, subtract previously accepted
targets from the new prefilter space (subtractdbs semantics), align,
merge with the accumulated alignments, and rebuild profiles. The final
iteration's merged alignment DB is the output.

Stages reuse the byte-parity modules (search driver with backtraces,
result2profile, subtractdbs/mergedbs); the profile-query alignment runs
on the PROFILE_SEQ kernel (ops/sw_jax.sw_align_batch_prof), matching the
reference's query-profile Smith-Waterman role. Intermediate E-value gate
follows Search.cpp:483-486 (min(evalThr, evalProfile) until the last
iteration).
"""

import os

import numpy as np

from ..io import mmseqsdb
from ..pipeline.dbtools import mergedbs
from ..pipeline.dbtools2 import subtractdbs
from ..pipeline.result2profile import result2profile_db


def _align_seq_queries(params, query_db, target_db, out_db):
    """Iteration 0: plain sequence search with backtraces."""
    from ..pipeline.alnformat import hits_to_aln_db_entries
    from .driver import SearchDriver

    qdb = mmseqsdb.read_seqdb(query_db)
    tdb = mmseqsdb.read_seqdb(target_db)
    seqs = [qdb.seq_bytes(i) for i in range(len(qdb))]
    driver = SearchDriver(params, tdb)
    hits = driver.search(seqs)
    bts, seq_ids = driver.backtraces(hits, seqs)
    entries = hits_to_aln_db_entries(hits, len(qdb), backtraces=bts,
                                     seq_ids=seq_ids)
    key_of = {i: int(k) for i, k in enumerate(qdb.keys)}
    tkey_of = {i: int(k) for i, k in enumerate(tdb.keys)}
    remapped = []
    for qi, payload in entries:
        text = payload.decode()
        fixed = []
        for ln in text.split("\n"):
            if not ln:
                continue
            c = ln.split("\t")
            c[0] = str(tkey_of[int(c[0])])
            fixed.append("\t".join(c))
        remapped.append((key_of[qi],
                         "".join(l + "\n" for l in fixed).encode()))
    mmseqsdb.write_db(out_db, remapped, mmseqsdb.DBTYPE_ALIGNMENT_RES)
    return out_db


def _align_profile_queries(params, profile_db, target_db, out_db,
                           eval_thr):
    """Iterations >= 1: profile queries vs sequence targets."""
    from ..data.submat import encode_aa
    from ..io.profiledb import ProfileDB
    from ..ops.sw_jax import sw_align_batch_prof
    from .evalue import EvalueComputation
    from .profile_search import _bucket, CELL_BUDGET

    profiles = ProfileDB.from_db(profile_db)
    tdb = mmseqsdb.read_seqdb(target_db)
    t_encs = [encode_aa(tdb.seq_bytes(i)) for i in range(len(tdb))]
    t_lens = np.array([len(t) for t in t_encs], np.int64)
    p_lens = np.array([len(p) for p in profiles.pssms], np.int64)
    total_t = tdb.total_residues()
    ev = EvalueComputation(total_t, gapped=True)

    n_p, n_t = len(p_lens), len(t_encs)
    pi = np.repeat(np.arange(n_p, dtype=np.int64), n_t)
    ti = np.tile(np.arange(n_t, dtype=np.int64), n_p)
    results = {int(k): [] for k in profiles.keys}

    lq_b = np.array([_bucket(max(l, 1)) for l in p_lens])[pi]
    lt_b = np.array([_bucket(max(l, 1)) for l in t_lens])[ti]
    order = np.lexsort((ti, pi, lt_b, lq_b))
    pos = 0
    while pos < len(order):
        li, lj = lq_b[order[pos]], lt_b[order[pos]]
        max_b = max(1, CELL_BUDGET // int(li * lj))
        sel = [order[pos]]
        pos += 1
        while pos < len(order) and len(sel) < max_b \
                and lq_b[order[pos]] == li and lt_b[order[pos]] == lj:
            sel.append(order[pos])
            pos += 1
        sel = np.array(sel)
        prof_mat = np.zeros((len(sel), li, 21), np.int32)
        ql = np.zeros(len(sel), np.int32)
        t_mat = np.zeros((len(sel), lj), np.int32)
        tl = np.zeros(len(sel), np.int32)
        for row, idx in enumerate(sel):
            p = profiles.pssms[pi[idx]]
            prof_mat[row, :len(p)] = p
            ql[row] = len(p)
            t = t_encs[ti[idx]]
            t_mat[row, :len(t)] = t
            tl[row] = len(t)
        score, q_start, q_end, t_start, t_end = sw_align_batch_prof(
            prof_mat, ql, t_mat, tl)
        for row, idx in enumerate(sel):
            sc = int(score[row])
            evalue = float(ev.compute_evalue(sc, p_lens[pi[idx]]))
            if evalue > eval_thr:
                continue
            bit = int(ev.compute_bit_score(sc) + 0.5)
            key = int(profiles.keys[pi[idx]])
            results[key].append(
                (evalue, -bit, int(t_lens[ti[idx]]), int(tdb.keys[ti[idx]]),
                 f"{int(tdb.keys[ti[idx]])}\t{bit}\t0.000\t{'%.3E' % evalue}"
                 f"\t{max(int(q_start[row]), 0)}\t{int(q_end[row])}"
                 f"\t{int(p_lens[pi[idx]])}"
                 f"\t{max(int(t_start[row]), 0)}\t{int(t_end[row])}"
                 f"\t{int(t_lens[ti[idx]])}\n"))
    out = []
    for key in sorted(results):
        rows = sorted(results[key])
        out.append((key, "".join(r[-1] for r in rows).encode()))
    mmseqsdb.write_db(out_db, out, mmseqsdb.DBTYPE_ALIGNMENT_RES)
    return out_db


def iterative_search(query_db, target_db, out_db, tmp_dir,
                     num_iterations=3, evalue=0.001, e_profile=0.1,
                     params=None):
    """blastpgp.sh loop (contract-level)."""
    from ..params import Params

    os.makedirs(tmp_dir, exist_ok=True)
    p = params or Params()
    inter_eval = min(evalue, e_profile)
    current_query = query_db
    prev_aln = None
    for step in range(num_iterations):
        step_eval = evalue if step == num_iterations - 1 else inter_eval
        aln_tmp = os.path.join(tmp_dir, f"aln_tmp_{step}")
        if step == 0:
            import dataclasses
            p0 = dataclasses.replace(p, search_evalue_thr=step_eval,
                                     aln_len_thr=0)
            _align_seq_queries(p0, current_query, target_db, aln_tmp)
            aln = aln_tmp
        else:
            _align_profile_queries(p, current_query, target_db, aln_tmp,
                                   step_eval)
            # subtract already-accepted targets (subtractdbs on prefilter
            # space; here applied on the alignment space directly)
            sub = os.path.join(tmp_dir, f"aln_sub_{step}")
            subtractdbs(aln_tmp, prev_aln, sub, eval_thr=inter_eval)
            merged = out_db if step == num_iterations - 1 else \
                os.path.join(tmp_dir, f"aln_{step}")
            mergedbs(query_db, merged, [prev_aln, sub])
            aln = merged
        if step == num_iterations - 1:
            if aln != out_db:
                from ..pipeline.dbtools2 import cpdb
                cpdb(aln, out_db)
            break
        profile = os.path.join(tmp_dir, f"profile_{step}")
        # profiles rebuilt around the original sequence centers (the
        # reference recenters on the previous profile's consensus; the
        # center length — and thus all coordinates — is identical)
        result2profile_db(query_db, target_db, aln, profile,
                          eval_profile=e_profile)
        current_query = profile
        prev_aln = aln
    return out_db
