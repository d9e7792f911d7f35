"""Scale demonstration runner: easy-predict on a large synthetic
metagenome (default 50 Mbp contigs vs 500k targets), recording wall,
per-stage seconds, and peak RSS to a JSON summary.

Usage: python tools/run_scale.py CONTIGS TARGETS OUT_PREFIX [--tmp DIR]
           [--split N] [--contig-range LO HI] [--json PATH]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("contigs")
    ap.add_argument("targets")
    ap.add_argument("out_prefix")
    ap.add_argument("--tmp", default=None)
    ap.add_argument("--split", type=int, default=0)
    ap.add_argument("--split-memory-limit", default="0",
                    help="prefilter memory budget, e.g. 16G (forces "
                         "target splits like the reference flag)")
    ap.add_argument("--contig-range", type=int, nargs=2, default=None)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    from metaeuk_tpu.params import Params
    from metaeuk_tpu.pipeline.predict import EasyPredict
    from metaeuk_tpu.utils import log

    p = Params()
    mem = args.split_memory_limit.upper()
    if mem and mem != "0":
        mult = {"K": 1 << 10, "M": 1 << 20, "G": 1 << 30, "T": 1 << 40}
        p.split_memory_limit = (int(float(mem[:-1]) * mult[mem[-1]])
                                if mem[-1] in mult else int(mem))
    if args.split:
        p.split = args.split
    ep = EasyPredict(p)
    t0 = time.perf_counter()
    ep.run(args.contigs, args.targets, args.out_prefix, tmp_dir=args.tmp,
           contig_range=tuple(args.contig_range)
           if args.contig_range else None)
    wall = time.perf_counter() - t0
    stages = dict(getattr(ep, "predict_stage_seconds", {}))
    stages.update(getattr(ep, "stage_seconds", {}))
    from metaeuk_tpu.search import driver as drv
    cells = dict(drv.CELLS)
    summary = {
        "wall_s": round(wall, 1),
        "stage_seconds": {k: round(v, 2) for k, v in stages.items()},
        "peak_rss_gib": round(log.peak_rss_bytes() / 1024 ** 3, 2),
        "split": args.split,
        "aligned_cells": cells,
        "aligned_cells_per_s_e2e": round(sum(cells.values()) / wall, 1),
    }
    print(json.dumps(summary))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
