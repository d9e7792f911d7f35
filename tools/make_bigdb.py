"""Build a UniRef50-class target DB: >= 3.42G residues, the regime where
the reference's auto k-mer rule flips to k=7 (IndexTable.h:439-449,
threshold 3.35G) and memory-budgeted target splits engage
(Prefiltering::optimizeSplit, Prefiltering.cpp:1106).

Seeds the DB with an existing protein FASTA (the 500k-target scale set,
so implanted/homolog structure is preserved for the contig queries) and
appends vectorized random decoy proteins until the residue target is
reached.  Deterministic; streams to disk.

Usage: python tools/make_bigdb.py SEED_FAA OUT_FAA [--residues 3.42e9]
"""

import argparse
import sys

import numpy as np

AA = np.frombuffer(b"ACDEFGHIKLMNPQRSTVWY", np.uint8)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("seed_faa")
    ap.add_argument("out_faa")
    ap.add_argument("--residues", type=float, default=3.42e9)
    ap.add_argument("--seed", type=int, default=20260821)
    args = ap.parse_args()

    rng = np.random.default_rng(args.seed)
    total = 0
    n_seqs = 0
    with open(args.out_faa, "wb") as out:
        with open(args.seed_faa, "rb") as f:
            while True:
                chunk = f.read(1 << 24)
                if not chunk:
                    break
                out.write(chunk)
                total += sum(len(line) for line in chunk.splitlines()
                             if not line.startswith(b">"))
                n_seqs += chunk.count(b">")
        print(f"seeded {n_seqs} sequences, {total / 1e9:.3f}G residues",
              file=sys.stderr)
        # decoys in vectorized batches: lengths 60..600 like the scale
        # generator's decoy class
        batch = 100_000
        while total < args.residues:
            lens = rng.integers(60, 601, batch)
            flat = AA[rng.integers(0, 20, int(lens.sum()))]
            offs = np.concatenate([[0], np.cumsum(lens)])
            lines = []
            for i in range(batch):
                lines.append(b">D" + str(n_seqs + i).encode())
                lines.append(flat[offs[i]:offs[i + 1]].tobytes())
            out.write(b"\n".join(lines) + b"\n")
            n_seqs += batch
            total += int(lens.sum())
    print(f"wrote {n_seqs} sequences, {total / 1e9:.3f}G residues",
          file=sys.stderr)


if __name__ == "__main__":
    main()
