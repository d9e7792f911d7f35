"""Profile-target search scale demonstration (BASELINE.json config 3:
contigs vs a MERC/MMETSP-class HMM-profile DB through predictexons
--exhaustive-search, the reference's sliced inverted profile search —
workflow/PredictExons.cpp:22-26, lib/mmseqs/src/workflow/Search.cpp:
357-400, data/workflow/searchslicedtargetprofile.sh).

Runs this framework's easy-predict on (contigs, profileDB), optionally
the reference binary on the identical inputs, and a byte-parity check
on a contig-prefix subsample with the deterministic golden methodology
(--threads 1; profile DB is already key-ordered).  Emits a BENCH-style
JSON with both walls and per-stage seconds.

Usage:
  python tools/run_profile_scale.py CONTIGS PROFILE_DB OUT_PREFIX \
      [--tmp DIR] [--json PATH] [--ref] [--parity-contigs N]
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REF = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                   ".refbuild", "src", "metaeuk")


def run_ours(contigs, prof_db, out_prefix, tmp):
    from metaeuk_tpu.params import Params
    from metaeuk_tpu.pipeline.predict import EasyPredict
    t0 = time.perf_counter()
    ep = EasyPredict(Params())
    ep.run(contigs, prof_db, out_prefix, tmp_dir=tmp)
    wall = time.perf_counter() - t0
    stages = dict(getattr(ep, "predict_stage_seconds", {}))
    stages.update(getattr(ep, "stage_seconds", {}))
    return wall, {k: round(v, 2) for k, v in stages.items()}


def run_ref(contigs, prof_db, out_prefix, tmp, threads=2):
    t0 = time.perf_counter()
    r = subprocess.run(
        [REF, "easy-predict", contigs, prof_db, out_prefix, tmp,
         "-v", "1", "--threads", str(threads)],
        capture_output=True)
    wall = time.perf_counter() - t0
    if r.returncode != 0:
        sys.stderr.write(r.stderr.decode()[-2000:])
        return None
    return wall


def head_fasta(src, dst, n):
    """First n records of a FASTA."""
    cnt = 0
    with open(src, "rb") as f, open(dst, "wb") as o:
        for line in f:
            if line.startswith(b">"):
                cnt += 1
                if cnt > n:
                    break
            o.write(line)
    return min(cnt, n)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("contigs")
    ap.add_argument("profile_db")
    ap.add_argument("out_prefix")
    ap.add_argument("--tmp", default=None)
    ap.add_argument("--json", default=None)
    ap.add_argument("--ref", action="store_true")
    ap.add_argument("--parity-contigs", type=int, default=0,
                    help="byte-compare outputs on the first N contigs "
                         "(both sides --threads 1)")
    args = ap.parse_args()
    tmp = args.tmp or (args.out_prefix + "_tmp")
    os.makedirs(tmp, exist_ok=True)

    n_prof = sum(1 for _ in open(f"{args.profile_db}.index"))

    wall, stages = run_ours(args.contigs, args.profile_db,
                            args.out_prefix, os.path.join(tmp, "ours"))
    res = {"metric": "profile_predict_wall_s", "value": wall,
           "unit": "s", "n_profiles": n_prof,
           "stage_seconds": stages}

    if args.ref and os.path.exists(REF):
        rw = run_ref(args.contigs, args.profile_db,
                     args.out_prefix + "_ref", os.path.join(tmp, "ref"))
        res["ref_wall_s"] = rw
        res["vs_ref"] = (rw / wall) if (rw and wall) else None

    if args.parity_contigs and os.path.exists(REF):
        sub = os.path.join(tmp, "sub.fna")
        n = head_fasta(args.contigs, sub, args.parity_contigs)
        run_ours(sub, args.profile_db, os.path.join(tmp, "p_ours"),
                 os.path.join(tmp, "p_ours_tmp"))
        r = subprocess.run(
            [REF, "easy-predict", sub, args.profile_db,
             os.path.join(tmp, "p_ref"), os.path.join(tmp, "p_ref_tmp"),
             "-v", "0", "--threads", "1"], capture_output=True)
        parity = None
        if r.returncode == 0:
            parity = True
            for suf in ("fas", "codon.fas", "headersMap.tsv", "gff"):
                a = open(os.path.join(tmp, f"p_ours.{suf}"), "rb").read()
                b = open(os.path.join(tmp, f"p_ref.{suf}"), "rb").read()
                if a != b:
                    parity = False
                    sys.stderr.write(f"PARITY MISMATCH: {suf}\n")
        else:
            sys.stderr.write(r.stderr.decode()[-2000:])
        res["parity_contigs"] = n
        res["parity_ok"] = parity

    out = json.dumps(res)
    print(out)
    if args.json:
        with open(args.json, "w") as f:
            f.write(out + "\n")


if __name__ == "__main__":
    main()
