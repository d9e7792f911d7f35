"""Scale-demo parity check: easy-predict on a contig subsample of the
50 Mbp scale set vs the full 500k-target DB, byte-compared against the
reference binary on the same inputs.

Usage: python tools/scale_subsample_check.py CONTIGS TARGETS OUTDIR
           [--n-contigs 150] [--ours-only | --ref-only]
"""

import argparse
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REF = os.path.join(os.path.dirname(__file__), "..", ".refbuild", "src",
                   "metaeuk")


def subsample(contigs, out_path, n):
    kept = 0
    with open(contigs) as f, open(out_path, "w") as o:
        write = False
        for line in f:
            if line.startswith(">"):
                if kept >= n:
                    break
                kept += 1
                write = True
            if write:
                o.write(line)
    return out_path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("contigs")
    ap.add_argument("targets")
    ap.add_argument("outdir")
    ap.add_argument("--n-contigs", type=int, default=150)
    ap.add_argument("--ours-only", action="store_true")
    ap.add_argument("--ref-only", action="store_true")
    args = ap.parse_args()
    os.makedirs(args.outdir, exist_ok=True)
    sub = os.path.join(args.outdir, "contigs_sub.fna")
    if not os.path.exists(sub):
        subsample(args.contigs, sub, args.n_contigs)

    if not args.ours_only:
        ref_out = os.path.join(args.outdir, "ref")
        if not os.path.exists(f"{ref_out}.fas"):
            # pre-create DBs with --shuffle 0: the reference's createdb
            # shuffles entries into 32 buckets by default, which only
            # permutes per-contig output blocks (record sets identical);
            # byte comparison needs the unshuffled key order our
            # input-order keys match
            cdb = os.path.join(args.outdir, "refContigsDB")
            tdb = os.path.join(args.outdir, "refTargetsDB")
            for src, db in ((sub, cdb), (args.targets, tdb)):
                if not os.path.exists(f"{db}.dbtype"):
                    r = subprocess.run([REF, "createdb", src, db,
                                        "--shuffle", "0", "-v", "0"])
                    assert r.returncode == 0, "createdb failed"
            # --threads 1: the reference's flat-FASTA writer merges
            # per-thread files in thread order, so multithreaded runs
            # permute per-contig blocks (record sets identical); the
            # committed goldens use the same single-thread methodology
            r = subprocess.run(
                [REF, "easy-predict", cdb, tdb, ref_out,
                 os.path.join(args.outdir, "reftmp"), "-v", "1",
                 "--threads", "1"])
            assert r.returncode == 0, "reference run failed"
    if not args.ref_only:
        from metaeuk_tpu.params import Params
        from metaeuk_tpu.pipeline.predict import EasyPredict
        ours = os.path.join(args.outdir, "ours")
        EasyPredict(Params()).run(sub, args.targets, ours,
                                  tmp_dir=os.path.join(args.outdir,
                                                       "ourstmp"))
    if args.ours_only or args.ref_only:
        return
    ok = True
    for ext in (".fas", ".codon.fas", ".headersMap.tsv", ".gff"):
        a = open(os.path.join(args.outdir, f"ours{ext}"), "rb").read()
        b = open(os.path.join(args.outdir, f"ref{ext}"), "rb").read()
        same = a == b
        ok = ok and same
        print(f"{ext}: {'BYTE-IDENTICAL' if same else 'DIFF'}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
