"""UniRef-regime subsample parity check: per-contig output blocks of a
reference easy-predict run on a contig subsample vs the big (>=3.42G
residue, auto-k7 + forced-splits) target DB, compared against the same
contigs' blocks from this framework's run.

Per-contig blocks are byte-compared individually (each contig is one
writer unit on both sides); the reference's multithreaded flat-FASTA
writer permutes whole-contig blocks between threads, so block-level
comparison is the thread-count-independent form of the goldens'
--threads 1 methodology. Both runs must use the same --split count
(per-split hit budgets shape truncated candidate lists).

Usage: python tools/uniref_subsample_check.py OURS_PREFIX REF_PREFIX \
           N_CONTIGS
"""

import sys
from collections import defaultdict


def blocks_fasta(path):
    out = defaultdict(list)
    rec = []
    key = None
    for line in open(path):
        if line.startswith(">"):
            if rec:
                out[key].append("".join(rec))
            rec = [line]
            key = line[1:].split("|")[1]
        else:
            rec.append(line)
    if rec:
        out[key].append("".join(rec))
    return out


def blocks_lines(path, keyfn):
    out = defaultdict(list)
    for line in open(path):
        out[keyfn(line)].append(line)
    return out


def main():
    ours, ref, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
    # contig accessions come from the GFF of the reference run
    ref_gff = blocks_lines(f"{ref}.gff", lambda l: l.split("\t")[0])
    ours_gff = blocks_lines(f"{ours}.gff", lambda l: l.split("\t")[0])
    accs = sorted(ref_gff, key=lambda a: int(a[3:]))  # ctgN
    fails = 0
    checked = 0

    def cmp_group(tag, a, b, keys):
        nonlocal fails, checked
        for k in keys:
            checked += 1
            if a.get(k) != b.get(k):
                fails += 1
                print(f"MISMATCH {tag} contig {k}: ours "
                      f"{len(a.get(k, []))} records vs ref "
                      f"{len(b.get(k, []))}")

    cmp_group("gff", ours_gff, ref_gff, accs)
    for suffix in ("fas", "codon.fas"):
        cmp_group(suffix, blocks_fasta(f"{ours}.{suffix}"),
                  blocks_fasta(f"{ref}.{suffix}"), accs)
    # headersMap keys are internal contig keys (input order = identical
    # numbering on both unshuffled sides)
    keyn = [str(i) for i in range(n)]
    ours_hm = blocks_lines(f"{ours}.headersMap.tsv",
                           lambda l: l.split("\t")[0])
    ref_hm = blocks_lines(f"{ref}.headersMap.tsv",
                          lambda l: l.split("\t")[0])
    cmp_group("headersMap", ours_hm, ref_hm,
              [k for k in keyn if k in ref_hm or k in ours_hm])
    print(f"checked {checked} per-contig blocks over {len(accs)} "
          f"GFF contigs: {fails} mismatches")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
