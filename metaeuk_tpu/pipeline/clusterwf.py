"""Cascaded clustering workflow + easy-cluster/easy-linclust.

Port of lib/mmseqs/src/workflow/Cluster.cpp (protein cascaded branch of
data/workflow/cascaded_clustering.sh) and EasyCluster.cpp /
easycluster.sh. The cascade: linclust redundancy pre-step, then
clusterSteps rounds of prefilter -> align -> set-cover clust over the
shrinking representative set, merged by mergeclusters.

Automagic parameters (Cluster.cpp:22-105): sensitivity from --min-seq-id
(<=0.3 -> 6, >0.8 -> 1, else 1+(0.7-seqId)*10), steps from sensitivity
(<=2 -> 1 else 3), comp-bias off + min-ungapped-score 60 at
seqId >= 0.7. Step 0 runs the count-mode prefilter (-s 1 for multi-step,
--diag-score 0, no comp-bias, min-ungapped 0, Cluster.cpp:195-199);
later steps ramp sensitivity 1 + (target-1)/(steps-1)*step with the
diagonal-scoring prefilter.
"""

import os
import shutil

from ..io import mmseqsdb


def _auto_sensitivity(seq_id):
    if seq_id <= 0.3:
        return 6.0
    if seq_id > 0.8:
        return 1.0
    return 1.0 + (1.0 * (0.7 - seq_id) * 10)


def _copy_headers(src_db, dst_db):
    for suf in ("_h", "_h.index", "_h.dbtype"):
        if os.path.exists(f"{src_db}{suf}"):
            shutil.copy(f"{src_db}{suf}", f"{dst_db}{suf}")


def cluster_workflow(seq_db, out_db, tmp_dir, min_seq_id=0.0, cov=0.8,
                     cov_mode=0, evalue=0.001, sensitivity=None,
                     steps=None, max_seqs=20):
    """mmseqs cluster (cascaded; Cluster.cpp + cascaded_clustering.sh)."""
    from ..search.align_module import align_db
    from ..search.kmermatcher import linclust_exact
    from ..search.searchdb import prefilter_db
    from .clust import clust_db, mergeclusters
    from .dbtools import createsubdb

    os.makedirs(tmp_dir, exist_ok=True)
    t = lambda *p: os.path.join(tmp_dir, *p)  # noqa: E731

    # setClusterAutomagicParameters
    comp_bias = True
    min_diag = 15
    if min_seq_id >= 0.7:
        comp_bias = False
        min_diag = 60
    if sensitivity is None:
        sensitivity = _auto_sensitivity(min_seq_id)
    if steps is None:
        steps = 1 if sensitivity <= 2.0 else 3

    # linclust redundancy pre-step (LINCLUST_PAR: the cluster-level
    # seqId/cov thresholds, alignment mode 3)
    clu_red = t("clu_redundancy")
    if not os.path.exists(f"{clu_red}.dbtype"):
        # setWorkflowDefaults sets spacedKmer=true, which reaches
        # kmermatcher through LINCLUST_PAR (Cluster.cpp:15, 185-192)
        linclust_exact(seq_db, clu_red, t("linclust"),
                       min_seq_id=min_seq_id, cov=cov, cov_mode=cov_mode,
                       alignment_mode=3, spaced=True, comp_bias=comp_bias)
    red = t("input_step_redundancy")
    if not os.path.exists(f"{red}.dbtype"):
        with open(f"{clu_red}.index") as f:
            order = [int(ln.split("\t")[0]) for ln in f]
        createsubdb(order, seq_db, red)
        _copy_headers(seq_db, red)

    inp = red
    clusterings = [clu_red]
    for step in range(steps):
        pref = t(f"pref_step{step}")
        if step == 0:
            # count-mode prefilter (Cluster.cpp:195-199)
            s0 = sensitivity if steps == 1 else 1.0
            if not os.path.exists(f"{pref}.dbtype"):
                prefilter_db(inp, inp, pref, sensitivity=s0,
                             max_seqs=max_seqs, min_ungapped_score=0,
                             comp_bias_correction=False,
                             diagonal_scoring=False,
                             cov=cov, cov_mode=cov_mode)
            step_comp_bias = False
        else:
            s = 1.0 + (sensitivity - 1.0) / (steps - 1) * step
            if not os.path.exists(f"{pref}.dbtype"):
                prefilter_db(inp, inp, pref, sensitivity=s,
                             max_seqs=max_seqs,
                             min_ungapped_score=min_diag,
                             comp_bias_correction=True,
                             cov=cov, cov_mode=cov_mode)
            step_comp_bias = True
        aln = t(f"aln_step{step}")
        if not os.path.exists(f"{aln}.dbtype"):
            align_db(inp, inp, pref, aln, evalue=evalue,
                     min_seq_id=min_seq_id, cov=cov, cov_mode=cov_mode,
                     comp_bias_corr=step_comp_bias, alignment_mode=3)
        clu = t(f"clu_step{step}")
        if not os.path.exists(f"{clu}.dbtype"):
            clust_db(inp, aln, clu)
        clusterings.append(clu)

        if step < steps - 1:
            nxt = t(f"input_step{step + 1}")
            if not os.path.exists(f"{nxt}.dbtype"):
                with open(f"{clu}.index") as f:
                    order = [int(ln.split("\t")[0]) for ln in f]
                createsubdb(order, inp, nxt)
                _copy_headers(inp, nxt)
            inp = nxt

    mergeclusters(seq_db, out_db, clusterings)
    return out_db


def easy_cluster(query, out_prefix, tmp_dir, min_seq_id=0.0, cov=0.8,
                 cov_mode=0, evalue=0.001, use_linclust=False,
                 linclust_min_seq_id=0.9):
    """easy-cluster / easy-linclust (easycluster.sh): createdb ->
    cluster module -> cluster.tsv + rep_seq.fasta + all_seqs.fasta."""
    from ..search.kmermatcher import linclust_exact
    from ..search.searchdb import _ensure_seqdb
    from .dbtools2 import createseqfiledb, result2flat
    from .dbtools3 import result2repseq

    os.makedirs(tmp_dir, exist_ok=True)
    inp = _ensure_seqdb(query, os.path.join(tmp_dir, "input"))
    clu = os.path.join(tmp_dir, "clu")
    if not os.path.exists(f"{clu}.dbtype"):
        if use_linclust:
            # setLinclustWorkflowDefaults: seqId 0.9, alignment mode 2
            linclust_exact(inp, clu, os.path.join(tmp_dir, "clu_tmp"),
                           min_seq_id=linclust_min_seq_id, cov=cov,
                           cov_mode=cov_mode)
        else:
            cluster_workflow(inp, clu, os.path.join(tmp_dir, "clu_tmp"),
                             min_seq_id=min_seq_id, cov=cov,
                             cov_mode=cov_mode, evalue=evalue)

    # cluster.tsv (createtsv input input clu)
    db = mmseqsdb.read_seqdb(inp)
    acc = {int(k): db.accession(i) for i, k in enumerate(db.keys)}
    with open(f"{out_prefix}_cluster.tsv", "w") as f:
        for key, payload in mmseqsdb.read_db(clu):
            for ln in payload.decode().splitlines():
                f.write(f"{acc[key]}\t{acc[int(ln)]}\n")

    # rep_seq.fasta (result2repseq + result2flat --use-fasta-header)
    clu_rep = os.path.join(tmp_dir, "clu_rep")
    result2repseq(inp, clu, clu_rep)
    result2flat(inp, inp, clu_rep, f"{out_prefix}_rep_seq.fasta",
                use_header=True)

    # all_seqs.fasta (createseqfiledb + result2flat)
    clu_seqs = os.path.join(tmp_dir, "clu_seqs")
    createseqfiledb(inp, clu, clu_seqs)
    result2flat(inp, inp, clu_seqs, f"{out_prefix}_all_seqs.fasta")
    return out_prefix
