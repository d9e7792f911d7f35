"""Taxonomy-at-scale measurement (VERDICT item 5): loads a synthetic
NCBI-scale taxdump (tools/make_bigtax.py), builds the binary
`_taxonomy` / `_mapping` artifacts, and measures dmp-load time, binary
round-trip, RSS, and LCA throughput over millions of hit lists —
evidence the tax stack survives the reference's >10M-mapping regime
(NcbiTaxonomy.cpp:91-181 load path, MappingReader.h binary mapping,
aggregatetax.cpp:118 vote loop).

Usage: python tools/run_tax_scale.py TAXDIR [--queries 1000000]
           [--hits 8] [--json PATH] [--ref]
"""

import argparse
import json
import os
import resource
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REF = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                   ".refbuild", "src", "metaeuk")


def rss_gib():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / (1 << 20)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("taxdir")
    ap.add_argument("--queries", type=int, default=1_000_000)
    ap.add_argument("--hits", type=int, default=8)
    ap.add_argument("--json", default=None)
    ap.add_argument("--ref", action="store_true",
                    help="also time the reference createbintaxonomy")
    args = ap.parse_args()
    d = args.taxdir
    res = {}

    from metaeuk_tpu.tax import mmtax

    t0 = time.time()
    tax = mmtax.Taxonomy.from_dumps(os.path.join(d, "names.dmp"),
                                    os.path.join(d, "nodes.dmp"),
                                    os.path.join(d, "merged.dmp"))
    res["dmp_load_s"] = round(time.time() - t0, 2)
    res["nodes"] = len(tax.tax_ids)
    res["rss_after_load_gib"] = round(rss_gib(), 2)

    t0 = time.time()
    mmtax.createbintaxonomy(os.path.join(d, "names.dmp"),
                            os.path.join(d, "nodes.dmp"),
                            os.path.join(d, "merged.dmp"),
                            os.path.join(d, "taxonomy_bin"))
    res["createbintaxonomy_s"] = round(time.time() - t0, 2)
    res["taxonomy_bin_mb"] = round(
        os.path.getsize(os.path.join(d, "taxonomy_bin")) / 1e6, 1)

    # binary round trip (the reference's mmap'd `_taxonomy` load path)
    t0 = time.time()
    tax_b = mmtax.Taxonomy.from_binary(
        open(os.path.join(d, "taxonomy_bin"), "rb").read())
    res["binary_load_s"] = round(time.time() - t0, 2)
    assert len(tax_b.tax_ids) == len(tax.tax_ids)
    del tax_b

    t0 = time.time()
    mmtax.createbintaxmapping(os.path.join(d, "mapping"),
                              os.path.join(d, "mapping_bin"))
    res["createbintaxmapping_s"] = round(time.time() - t0, 2)
    res["mapping_bin_mb"] = round(
        os.path.getsize(os.path.join(d, "mapping_bin")) / 1e6, 1)

    # LCA throughput: --queries hit lists of --hits taxids each,
    # vectorized through the same path lca_db uses
    rng = np.random.default_rng(3)
    n_tax = max(int(tax.max_taxid) - 1, 2)
    lists = rng.integers(n_tax // 2, n_tax, (args.queries, args.hits))
    t0 = time.time()
    out = np.empty(args.queries, np.int64)
    for i in range(args.queries):
        out[i] = tax.lca_list([int(x) for x in lists[i]]) or 0
    dt = time.time() - t0
    res["lca_lists"] = args.queries
    res["lca_lists_per_s"] = round(args.queries / dt, 1)
    res["lca_wall_s"] = round(dt, 2)
    res["rss_peak_gib"] = round(rss_gib(), 2)

    if args.ref and os.path.exists(REF):
        t0 = time.time()
        r = subprocess.run(
            [REF, "createbintaxonomy", os.path.join(d, "names.dmp"),
             os.path.join(d, "nodes.dmp"), os.path.join(d, "merged.dmp"),
             os.path.join(d, "taxonomy_bin_ref"), "-v", "0"],
            capture_output=True)
        res["ref_createbintaxonomy_s"] = round(time.time() - t0, 2) \
            if r.returncode == 0 else None

    out_line = json.dumps(res)
    print(out_line)
    if args.json:
        with open(args.json, "w") as f:
            f.write(out_line + "\n")


if __name__ == "__main__":
    main()
