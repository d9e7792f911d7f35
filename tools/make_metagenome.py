"""Deterministic synthetic-metagenome generator for benchmarks.

Scales the tests/two_contigs-style construction (tools/make_fixture.py)
to megabase contigs: multi-exon genes with mutations implanted on both
strands of variable-length contigs, a protein DB of implanted genes +
homolog families + decoys. Vectorized so generating tens of Mbp takes
seconds. Same-seed runs are byte-identical.
"""

import numpy as np

AA = np.frombuffer(b"ACDEFGHIKLMNPQRSTVWY", np.uint8)
DNA = np.frombuffer(b"ACGT", np.uint8)

# one codon per AA for the fast path + alternates for variety
CODON1 = {
    "A": "GCT", "C": "TGT", "D": "GAT", "E": "GAA", "F": "TTT",
    "G": "GGT", "H": "CAT", "I": "ATT", "K": "AAA", "L": "CTT",
    "M": "ATG", "N": "AAT", "P": "CCT", "Q": "CAA", "R": "CGT",
    "S": "TCT", "T": "ACT", "V": "GTT", "W": "TGG", "Y": "TAT",
}
CODON2 = {
    "A": "GCC", "C": "TGC", "D": "GAC", "E": "GAG", "F": "TTC",
    "G": "GGA", "H": "CAC", "I": "ATC", "K": "AAG", "L": "CTG",
    "M": "ATG", "N": "AAC", "P": "CCA", "Q": "CAG", "R": "AGA",
    "S": "AGC", "T": "ACC", "V": "GTG", "W": "TGG", "Y": "TAC",
}
_C1 = np.zeros((20, 3), np.uint8)
_C2 = np.zeros((20, 3), np.uint8)
for _i, _a in enumerate("ACDEFGHIKLMNPQRSTVWY"):
    _C1[_i] = np.frombuffer(CODON1[_a].encode(), np.uint8)
    _C2[_i] = np.frombuffer(CODON2[_a].encode(), np.uint8)


def _rand_prot(rng, n):
    return rng.integers(0, 20, n)


def _to_cds(rng, prot_idx):
    pick = rng.integers(0, 2, len(prot_idx))[:, None]
    return np.where(pick == 0, _C1[prot_idx], _C2[prot_idx]).reshape(-1)


def _rand_dna(rng, n):
    return DNA[rng.integers(0, 4, n)]


def _intron(rng, n):
    body = _rand_dna(rng, n)
    stops = np.frombuffer(b"TAGCTAATGA", np.uint8)
    return np.concatenate([np.frombuffer(b"GT", np.uint8), body[:n // 2],
                           stops, body[n // 2:],
                           np.frombuffer(b"AG", np.uint8)])


def _revcomp(s):
    comp = np.zeros(256, np.uint8)
    for a, b in zip(b"ACGT", b"TGCA"):
        comp[a] = b
    return comp[s][::-1]


def _mutate_dna(rng, cds, rate):
    cds = cds.copy()
    n_mut = int(len(cds) * rate)
    if n_mut:
        pos = rng.choice(len(cds), n_mut, replace=False)
        cds[pos] = DNA[rng.integers(0, 4, n_mut)]
    return cds


def make_metagenome(n_mbp=8.0, n_targets=8000, seed=20260820,
                    gene_density=0.55):
    """Returns (contigs, proteins): lists of (name, bytes).

    gene_density: fraction of contig bases covered by implanted genes;
    the rest is random intergenic DNA. ~30% of targets are implanted
    (with 2-12% DNA-level mutations and 1-3 introns), ~20% are mutated
    homolog family members of implanted genes, the rest decoys.
    """
    rng = np.random.default_rng(seed)
    total_nt = int(n_mbp * 1e6)

    # target protein pool
    n_implant = max(1, int(n_targets * 0.3))
    n_family = int(n_targets * 0.2)
    prots = []
    for i in range(n_targets):
        if i < n_implant:
            L = int(rng.integers(120, 500))
        else:
            L = int(rng.integers(60, 600))
        prots.append(_rand_prot(rng, L))
    # homolog families: mutate an implanted protein at the AA level
    for i in range(n_family):
        src = prots[int(rng.integers(0, n_implant))]
        p = src.copy()
        n_mut = max(1, int(len(p) * rng.uniform(0.1, 0.4)))
        pos = rng.choice(len(p), n_mut, replace=False)
        p[pos] = rng.integers(0, 20, n_mut)
        prots[n_implant + i] = p

    contigs = []
    nt_done = 0
    ci = 0
    gi = 0
    stopset = [b"TAA", b"TAG", b"TGA"]
    while nt_done < total_nt:
        clen_target = int(rng.integers(2000, 20000))
        parts = [_rand_dna(rng, int(rng.integers(60, 300)))]
        used = len(parts[0])
        while used < clen_target * gene_density:
            pi = int(rng.integers(0, n_implant))
            prot = prots[pi]
            n_ex = int(rng.integers(1, 4))
            cuts = np.sort(rng.choice(
                np.arange(20, len(prot) - 20), n_ex - 1,
                replace=False)) if n_ex > 1 else np.zeros(0, np.int64)
            bounds = [0, *cuts.tolist(), len(prot)]
            seg = []
            for e in range(n_ex):
                cds = _to_cds(rng, prot[bounds[e]:bounds[e + 1]])
                cds = _mutate_dna(rng, cds, rng.uniform(0.02, 0.12))
                seg.append(cds)
                if e + 1 < n_ex:
                    seg.append(_intron(rng, int(rng.integers(40, 400))))
            stop = np.frombuffer(stopset[int(rng.integers(0, 3))], np.uint8)
            gene = np.concatenate(
                [np.frombuffer(b"TAA", np.uint8), *seg, stop])
            if rng.random() < 0.5:
                gene = _revcomp(gene)
            parts.append(gene)
            parts.append(_rand_dna(rng, int(rng.integers(50, 400))))
            used += len(gene) + len(parts[-1])
            gi += 1
        seq = np.concatenate(parts)
        contigs.append((f"ctg{ci}", seq.tobytes()))
        nt_done += len(seq)
        ci += 1

    proteins = [(f"prot{i}", AA[p].tobytes()) for i, p in enumerate(prots)]
    return contigs, proteins


def write_fasta(path, entries):
    with open(path, "wb") as f:
        for name, seq in entries:
            f.write(b">" + name.encode() + b"\n" + seq + b"\n")


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--mbp", type=float, default=8.0)
    ap.add_argument("--targets", type=int, default=8000)
    ap.add_argument("--seed", type=int, default=20260820)
    ap.add_argument("--out-contigs", default="contigs_bench.fna")
    ap.add_argument("--out-proteins", default="proteins_bench.faa")
    args = ap.parse_args()
    contigs, proteins = make_metagenome(args.mbp, args.targets, args.seed)
    write_fasta(args.out_contigs, contigs)
    write_fasta(args.out_proteins, proteins)
    print(f"wrote {len(contigs)} contigs "
          f"({sum(len(s) for _, s in contigs)} nt), "
          f"{len(proteins)} proteins")


if __name__ == "__main__":
    main()
