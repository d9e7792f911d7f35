"""Alignment-result serialization: Matcher 10-column format and BLAST m8.

resultToBuffer port (lib/mmseqs/src/alignment/Matcher.cpp:280-327) for the
alignment DB payloads, and the convertalignments BLAST-tab export
(lib/mmseqs/src/util/convertalignments.cpp) — without backtraces the
mismatch/gapopen columns are estimates (identities from the estimated
sequence identity), which is a documented approximation.
"""

import numpy as np


def format_seq_id(seq_id):
    from .predict import format_seq_id as f
    return f(seq_id)


def hit_to_matcher_line(hit):
    """10-column alignment record for one HIT_DTYPE row."""
    return "\t".join([
        str(int(hit["target_idx"])),
        str(int(hit["bit_score"])),
        format_seq_id(hit["seq_id"]),
        "%.3E" % hit["evalue"],
        str(int(hit["q_start"])),
        str(int(hit["q_end"])),
        str(int(hit["q_len"])),
        str(int(hit["t_start"])),
        str(int(hit["t_end"])),
        str(int(hit["t_len"])),
    ]) + "\n"


def hits_to_aln_db_entries(hits, n_queries, key_of_target=None):
    """Group hits (already in compareHits order per query) into per-query
    alignment-DB payloads."""
    payloads = {qi: [] for qi in range(n_queries)}
    for hit in hits:
        payloads[int(hit["orf_idx"])].append(hit_to_matcher_line(hit))
    return [(qi, "".join(payloads[qi]).encode()) for qi in range(n_queries)]


def hit_to_m8_line(hit, q_acc, t_acc):
    """BLAST tab (m8): q, t, pident, alnLen, mismatch, gapopen,
    qstart, qend, tstart, tend, evalue, bits (1-based coords)."""
    aln_len = int(max(abs(hit["q_end"] - hit["q_start"]),
                      abs(hit["t_end"] - hit["t_start"])) + 1)
    pident_text = format_seq_id(hit["seq_id"])
    mismatch = int(round(aln_len * (1.0 - float(pident_text))))
    return (f"{q_acc}\t{t_acc}\t{pident_text}\t{aln_len}\t{mismatch}\t0\t"
            f"{int(hit['q_start']) + 1}\t{int(hit['q_end']) + 1}\t"
            f"{int(hit['t_start']) + 1}\t{int(hit['t_end']) + 1}\t"
            f"{'%.3E' % hit['evalue']}\t{int(hit['bit_score'])}\n")
