"""Generate the deterministic two_contigs-style parity fixture.

Produces tests/data/contigs.fna + tests/data/proteins.faa: multi-exon genes
embedded on both strands of synthetic contigs, plus decoy proteins, in the
spirit of the reference's tests/two_contigs set (README.md:57). Golden
outputs come from running the reference binary on these files
(tools/run_reference.sh).
"""

import numpy as np

AA = "ACDEFGHIKLMNPQRSTVWY"
CODONS = {
    "A": ["GCT", "GCC", "GCA"], "C": ["TGT", "TGC"], "D": ["GAT", "GAC"],
    "E": ["GAA", "GAG"], "F": ["TTT", "TTC"], "G": ["GGT", "GGA"],
    "H": ["CAT", "CAC"], "I": ["ATT", "ATC"], "K": ["AAA", "AAG"],
    "L": ["CTT", "CTG"], "M": ["ATG"], "N": ["AAT", "AAC"],
    "P": ["CCT", "CCA"], "Q": ["CAA", "CAG"], "R": ["CGT", "AGA"],
    "S": ["TCT", "AGC"], "T": ["ACT", "ACC"], "V": ["GTT", "GTG"],
    "W": ["TGG"], "Y": ["TAT", "TAC"],
}


def revcomp(s):
    return s[::-1].translate(str.maketrans("ACGT", "TGCA"))


def main(out_dir="tests/data"):
    rng = np.random.default_rng(20260817)

    def rand_prot(n):
        return "".join(rng.choice(list(AA), n))

    def to_cds(prot):
        return "".join(CODONS[a][rng.integers(0, len(CODONS[a]))] for a in prot)

    def rand_dna(n):
        return "".join(rng.choice(list("ACGT"), n))

    def intron(n):
        # guarantee in-frame stops inside so exons are separate fragments
        body = rand_dna(n)
        return "GT" + body[:n // 2] + "TAGCTAATGA" + body[n // 2:] + "AG"

    prots = {}
    contigs = {}

    # gene 1: 3 exons, plus strand of contig A
    prots["P1"] = rand_prot(150)
    g1 = (to_cds(prots["P1"][:50]) + intron(80) + to_cds(prots["P1"][50:105])
          + intron(200) + to_cds(prots["P1"][105:]))
    # gene 2: 2 exons, minus strand of contig A
    prots["P2"] = rand_prot(100)
    g2 = to_cds(prots["P2"][:45]) + intron(120) + to_cds(prots["P2"][45:])
    # gene 3: single exon, plus strand of contig B (with ~10% mutations)
    prots["P3"] = rand_prot(120)
    g3 = list(to_cds(prots["P3"]))
    for i in rng.choice(len(g3), size=len(g3) // 30, replace=False):
        g3[i] = "ACGT"[rng.integers(0, 4)]
    g3 = "".join(g3)
    # gene 4: 2 exons on minus strand of contig B
    prots["P4"] = rand_prot(90)
    g4 = to_cds(prots["P4"][:40]) + intron(150) + to_cds(prots["P4"][40:])
    # decoy proteins with no contig support
    prots["D1"] = rand_prot(130)
    prots["D2"] = rand_prot(70)

    contigs["contigA"] = (rand_dna(150) + "TAA" + g1 + "TGA" + rand_dna(100)
                          + revcomp("TAA" + g2 + "TGA") + rand_dna(120))
    contigs["contigB"] = (rand_dna(80) + "TAG" + g3 + "TAA" + rand_dna(90)
                          + revcomp("TGA" + g4 + "TAA") + rand_dna(60))

    import os
    os.makedirs(out_dir, exist_ok=True)
    with open(f"{out_dir}/contigs.fna", "w") as f:
        for name, seq in contigs.items():
            f.write(f">{name}\n{seq}\n")
    with open(f"{out_dir}/proteins.faa", "w") as f:
        for name, seq in prots.items():
            f.write(f">{name}\n{seq}\n")
    print(f"wrote {out_dir}/contigs.fna ({sum(len(c) for c in contigs.values())}nt), "
          f"{out_dir}/proteins.faa ({sum(len(p) for p in prots.values())}aa)")


if __name__ == "__main__":
    main()
