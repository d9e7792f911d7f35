"""Synthetic NCBI-scale taxonomy fixture generator (VERDICT item 5 /
BASELINE config 5): a >=1M-node taxdump (nodes.dmp / names.dmp /
merged.dmp / delnodes.dmp) plus a >=10M-entry taxid mapping — the size
class of the reference's published >88M-entry mapping DBs
(/root/reference/README.md:213; load path NcbiTaxonomy.cpp:91-181,
binary mapping MappingReader.h).

Tree shape: a root with `--fanout` children per node, filled
breadth-first until `--nodes`; ranks cycle through the NCBI ladder so
rank-based LCA modes are exercised.  The mapping assigns every key in
[0, --mappings) a leaf-ish taxid deterministically.

Usage:
  python tools/make_bigtax.py OUT_DIR [--nodes 1200000]
      [--mappings 10000000] [--fanout 8] [--seed 7]
"""

import argparse
import os

import numpy as np

RANKS = ["superkingdom", "phylum", "class", "order", "family", "genus",
         "species", "subspecies", "no rank"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("--nodes", type=int, default=1_200_000)
    ap.add_argument("--mappings", type=int, default=10_000_000)
    ap.add_argument("--fanout", type=int, default=8)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)
    n = args.nodes

    # breadth-first fanout tree: node ids 1..n, parent(i) for i>1 is
    # ((i - 2) // fanout) + 1; depth derives the rank
    ids = np.arange(1, n + 1, dtype=np.int64)
    parents = np.where(ids == 1, 1, (ids - 2) // args.fanout + 1)
    depth = np.zeros(n + 1, np.int32)
    for i in range(2, n + 1):
        depth[i] = depth[parents[i - 1]] + 1

    with open(os.path.join(args.out_dir, "nodes.dmp"), "w") as f:
        for i in range(n):
            rank = RANKS[min(depth[ids[i]], len(RANKS) - 1)]
            f.write(f"{ids[i]}\t|\t{parents[i]}\t|\t{rank}\t|\t\t|\n")
    with open(os.path.join(args.out_dir, "names.dmp"), "w") as f:
        for i in range(n):
            f.write(f"{ids[i]}\t|\tTaxon{ids[i]}\t|\t\t|\t"
                    f"scientific name\t|\n")
    rng = np.random.default_rng(args.seed)
    n_merged = min(1000, n // 100)
    merged_from = np.arange(n + 1, n + 1 + n_merged, dtype=np.int64)
    merged_to = rng.integers(1, n + 1, n_merged)
    with open(os.path.join(args.out_dir, "merged.dmp"), "w") as f:
        for a, b in zip(merged_from, merged_to):
            f.write(f"{a}\t|\t{b}\t|\n")
    with open(os.path.join(args.out_dir, "delnodes.dmp"), "w") as f:
        for d in range(n + n_merged + 1, n + n_merged + 101):
            f.write(f"{d}\t|\n")

    # mapping: key -> a deep node (biased to the leaf layers so LCA
    # walks real paths)
    m = args.mappings
    taxids = rng.integers(n // 2, n + 1, m)
    with open(os.path.join(args.out_dir, "mapping"), "w") as f:
        buf = []
        for k in range(m):
            buf.append(f"{k}\t{taxids[k]}\n")
            if len(buf) >= 1_000_000:
                f.write("".join(buf))
                buf.clear()
        f.write("".join(buf))
    print(f"wrote {args.out_dir}: {n} nodes, {m} mappings, "
          f"{n_merged} merged")


if __name__ == "__main__":
    main()
