"""Deterministic fixture that drives the prefilter posting buffer into
the overflow regime (QueryMatcher::match, QueryMatcher.cpp:283-314).

maxDbMatches = max(1e6, nseq) * 2 = 2M entries here; every target is the
SAME random 600-mer (no internal repeats, so tantan masks nothing), so a
query equal to the motif gathers ~595 positions x 8000 postings = 4.76M
entries -> two chunk flushes plus the final merge.
"""

import numpy as np

AAS = "ACDEFGHIKLMNPQRSTVWY"


def make_ovf_seqs(n_targets=8000, motif_len=600, seed=99):
    rng = np.random.default_rng(seed)
    motif = "".join(AAS[i] for i in rng.integers(0, 20, motif_len))
    targets = [motif] * n_targets

    mut = list(motif)
    for i in rng.choice(motif_len, motif_len // 10, replace=False):
        mut[i] = AAS[int(rng.integers(0, 20))]
    rand_half = "".join(AAS[i] for i in rng.integers(0, 20, motif_len // 2))
    rand_q = "".join(AAS[i] for i in rng.integers(0, 20, 400))
    queries = [
        motif,                                   # full overflow (2 flushes)
        "".join(mut),                            # overflow with mutations
        motif[: motif_len // 2] + rand_half,     # one flush
        rand_q,                                  # no overflow
    ]
    return targets, queries


def write_fasta(path, seqs, prefix):
    with open(path, "w") as f:
        for i, s in enumerate(seqs):
            f.write(f">{prefix}{i}\n{s}\n")


if __name__ == "__main__":
    import sys
    targets, queries = make_ovf_seqs()
    write_fasta(sys.argv[1], targets, "t")
    write_fasta(sys.argv[2], queries, "q")
