"""Randomized end-to-end parity fuzzing against the reference binary.

Generates random contig/protein sets (genes with varying exon counts,
intron sizes, mutation rates, strand mixes, plus decoys), runs the
reference metaeuk (exhaustive prefilter, single-threaded, unshuffled) and
this framework on each, and byte-compares all four easy-predict outputs.

Usage: python tools/fuzz_parity.py <n_trials> [seed0]
(requires the reference binary at .refbuild/src/metaeuk)
"""

import pathlib
import subprocess
import sys
import tempfile

import numpy as np

REF = pathlib.Path(__file__).resolve().parent.parent / ".refbuild/src/metaeuk"

AA = "ACDEFGHIKLMNPQRSTVWY"
CODONS = {
    "A": ["GCT", "GCC"], "C": ["TGT", "TGC"], "D": ["GAT", "GAC"],
    "E": ["GAA", "GAG"], "F": ["TTT", "TTC"], "G": ["GGT", "GGA"],
    "H": ["CAT", "CAC"], "I": ["ATT", "ATC"], "K": ["AAA", "AAG"],
    "L": ["CTT", "CTG"], "M": ["ATG"], "N": ["AAT", "AAC"],
    "P": ["CCT", "CCA"], "Q": ["CAA", "CAG"], "R": ["CGT", "AGA"],
    "S": ["TCT", "AGC"], "T": ["ACT", "ACC"], "V": ["GTT", "GTG"],
    "W": ["TGG"], "Y": ["TAT", "TAC"],
}


def make_case(rng, out_dir):
    def rp(n):
        return "".join(rng.choice(list(AA), n))

    def cds(p):
        return "".join(CODONS[a][rng.integers(0, len(CODONS[a]))] for a in p)

    def dna(n):
        return "".join(rng.choice(list("ACGT"), n))

    def intron(n):
        return "GT" + dna(n // 2) + "TAGCTAA" + dna(n // 2) + "AG"

    prots = {}
    contigs = {}
    n_prots = int(rng.integers(3, 10))
    for i in range(n_prots):
        prots[f"P{i}"] = rp(int(rng.integers(40, 260)))
    n_contigs = int(rng.integers(1, 4))
    names = list(prots)
    for c in range(n_contigs):
        parts = [dna(int(rng.integers(30, 200)))]
        for _ in range(int(rng.integers(1, 4))):
            p = prots[names[int(rng.integers(0, n_prots))]]
            n_exons = int(rng.integers(1, 4))
            cuts = sorted(rng.choice(range(10, max(11, len(p) - 10)),
                                     size=n_exons - 1, replace=False)) \
                if n_exons > 1 else []
            segs = []
            prev = 0
            for cut in list(cuts) + [len(p)]:
                segs.append(p[prev:cut])
                prev = cut
            gene_parts = []
            for gi, seg in enumerate(segs):
                g = list(cds(seg))
                # mutations
                for mi in rng.choice(len(g), size=len(g) // 25, replace=False):
                    g[mi] = "ACGT"[rng.integers(0, 4)]
                gene_parts.append("".join(g))
                if gi < len(segs) - 1:
                    gene_parts.append(intron(int(rng.integers(30, 600))))
            gene = "TAA" + "".join(gene_parts) + "TGA"
            if rng.random() < 0.5:
                gene = gene[::-1].translate(str.maketrans("ACGT", "TGCA"))
            parts.append(gene)
            parts.append(dna(int(rng.integers(30, 300))))
        contigs[f"ctg{c}"] = "".join(parts)
    with open(f"{out_dir}/contigs.fna", "w") as f:
        for n, s in contigs.items():
            f.write(f">{n}\n{s}\n")
    with open(f"{out_dir}/prots.faa", "w") as f:
        for n, s in prots.items():
            f.write(f">{n}\n{s}\n")


def run_case(td, flags=()):
    subprocess.run([str(REF), "createdb", f"{td}/contigs.fna", f"{td}/cdb",
                    "--shuffle", "0", "-v", "0"], check=True)
    subprocess.run([str(REF), "createdb", f"{td}/prots.faa", f"{td}/tdb",
                    "--shuffle", "0", "-v", "0"], check=True)
    subprocess.run([str(REF), "easy-predict", f"{td}/cdb", f"{td}/tdb",
                    f"{td}/ref", f"{td}/tmp", "--threads", "1",
                    "-v", "0", *flags], check=True)
    from metaeuk_tpu.pipeline.predict import EasyPredict
    from metaeuk_tpu.params import Params
    EasyPredict(Params()).run(f"{td}/contigs.fna", f"{td}/prots.faa",
                              f"{td}/mine")
    diffs = []
    for s in ("fas", "codon.fas", "headersMap.tsv", "gff"):
        a = pathlib.Path(f"{td}/ref.{s}").read_bytes()
        b = pathlib.Path(f"{td}/mine.{s}").read_bytes()
        if a != b:
            diffs.append(s)
    return diffs


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    seed0 = int(sys.argv[2]) if len(sys.argv) > 2 else 1000
    failures = 0
    for trial in range(n):
        rng = np.random.default_rng(seed0 + trial)
        with tempfile.TemporaryDirectory() as td:
            make_case(rng, td)
            diffs = run_case(td)
            status = "OK" if not diffs else f"DIFFERS: {diffs}"
            print(f"trial {seed0 + trial}: {status}", flush=True)
            if diffs:
                failures += 1
                # keep the failing case for inspection
                keep = pathlib.Path(f"/tmp/fuzzfail_{seed0 + trial}")
                keep.mkdir(exist_ok=True)
                for f in pathlib.Path(td).iterdir():
                    if f.is_file():
                        keep.joinpath(f.name).write_bytes(f.read_bytes())
    print(f"{n - failures}/{n} cases byte-identical")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
