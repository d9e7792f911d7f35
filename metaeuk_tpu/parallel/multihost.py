"""Multi-host data-parallel easy-predict (the reference's MPI role).

The reference decomposes queries across MPI ranks and merges per-rank
result files (Prefiltering::runMpiSplits, Prefiltering.cpp:575-770;
Alignment::run(mpiRank,...), Alignment.cpp:219-243;
DBReader::decomposeDomainByAminoAcid, DBReader.h:463).  Here the unit of
data parallelism is the contig: per-contig predictions are independent
(search E-values depend only on the target DB), so each host processes a
contiguous contig block against its (replicated or mesh-sharded) target
DB and the partition outputs concatenate byte-identically to a
single-host run.

Launch on each host with the usual jax.distributed environment
(coordinator address, process id/count), or drive partitions manually:

    metaeuk-tpu easy-predict ... --contig-split I:N     # on host I
    metaeuk-tpu mergepredictions out part0 part1 ...    # after a barrier

Within one host, the device mesh from parallel/dist.py splits the
alignment grid further (fragments data-parallel x target shards, ICI
all-gather).
"""

import pathlib


def contig_partition(n_contigs, process_index, process_count):
    """Contiguous block [lo, hi) for this process (the
    decomposeDomainByAminoAcid role, by count)."""
    base = n_contigs // process_count
    rem = n_contigs % process_count
    lo = process_index * base + min(process_index, rem)
    hi = lo + base + (1 if process_index < rem else 0)
    return lo, hi


def merge_predictions(out_prefix, partition_prefixes):
    """Concatenate partition outputs into the single-run files.

    All four easy-predict outputs are strictly per-contig in ascending
    contig order with no global counters, so block-partitioned outputs
    concatenate byte-identically."""
    for suffix in ("fas", "codon.fas", "headersMap.tsv", "gff"):
        with open(f"{out_prefix}.{suffix}", "wb") as out:
            for prefix in partition_prefixes:
                out.write(pathlib.Path(f"{prefix}.{suffix}").read_bytes())
    return out_prefix


def distributed_easy_predict(params, contigs_path, targets_path, out_prefix,
                             tmp_dir=None):
    """Run this process's contig partition; process 0 merges after all
    partitions exist (shared filesystem).  Works unchanged for a
    single-process run."""
    import jax
    from ..pipeline.predict import EasyPredict
    from ..io.seqdb import SeqDB, DBTYPE_NUCL

    import os

    pi, pc = jax.process_index(), jax.process_count()
    n = len(SeqDB.from_fasta(contigs_path, DBTYPE_NUCL))
    lo, hi = contig_partition(n, pi, pc)
    part_prefix = f"{out_prefix}.part{pi}" if pc > 1 else out_prefix
    # shared scratch for the distributed prefilter (splits fanned over
    # processes, parallel/dist_prefilter.py) when the run uses splits
    prev_dist = os.environ.get("METAEUK_DIST_TMP")
    if pc > 1:
        os.environ["METAEUK_DIST_TMP"] = (
            os.path.join(tmp_dir, "dist_pref") if tmp_dir
            else f"{out_prefix}.dist_pref")
    try:
        EasyPredict(params).run(contigs_path, targets_path, part_prefix,
                                tmp_dir=tmp_dir, contig_range=(lo, hi))
    finally:
        if pc > 1:
            if prev_dist is None:
                os.environ.pop("METAEUK_DIST_TMP", None)
            else:
                os.environ["METAEUK_DIST_TMP"] = prev_dist
    if pc > 1:
        # barrier over all processes, then rank 0 merges
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("metaeuk_predict_parts")
        if pi == 0:
            merge_predictions(out_prefix,
                              [f"{out_prefix}.part{i}" for i in range(pc)])
    return out_prefix
