"""Benchmark: easy-predict end-to-end contigs/s on one TPU chip.

The primary metric is BASELINE.json's north star — contigs/s for
easy-predict on a mid-scale synthetic metagenome (deterministic,
generated at run time by tools/make_metagenome.py; default 4 Mbp of
contigs vs an 8k-protein target DB). `vs_baseline` divides by the
reference binary's contigs/s measured ON THIS HOST with all cores
(.refbuild/src/metaeuk, same inputs); when the binary is unavailable,
a recorded 2-core baseline rate for this config is used instead.

Secondary numbers (same JSON line, under "extra"): per-stage seconds,
the fused SW kernel's device cells/s (profiler events — wall clock over
a tunneled chip carries ~100ms/fetch link latency), and the wall times.

`python bench.py --selftest` runs the COMPILED Pallas kernels against
the numpy oracle (ops/sw.py) on randomized ragged batches spanning the
driver's bucket boundaries — the on-TPU parity check that interpret-mode
tests cannot give.
"""

import glob
import gzip
import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np

# reference easy-predict on this config, 2-core builder host (see
# BASELINE.md; the repo publishes no numbers — this is a measured local
# baseline used only when .refbuild is missing on the bench host)
FALLBACK_REF_CONTIGS_PER_S = None  # computed reference rate unavailable

BENCH_MBP = float(os.environ.get("METAEUK_BENCH_MBP", "4"))
BENCH_TARGETS = int(os.environ.get("METAEUK_BENCH_TARGETS", "8000"))


def device_time_of(trace_dir, name_substr):
    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    total = 0.0
    count = 0
    for f in files:
        for e in json.load(gzip.open(f))["traceEvents"]:
            if e.get("ph") == "X" and name_substr in e.get("name", "") \
                    and "dur" in e:
                total += e["dur"]
                count += 1
    return total / 1e6, count  # seconds


def kernel_rate():
    """Pair-batched fused-alignment device cells/s at B=1024, 256x256
    (fwd+rev; the small-candidate-list path)."""
    import jax
    from metaeuk_tpu.ops.sw_pallas import _align_full

    B, Lq, Lt = 1024, 256, 256
    rng = np.random.default_rng(0)
    q_enc = rng.integers(0, 20, (B, Lq)).astype(np.int32)
    q_bias = np.zeros((B, Lq), np.int32)
    q_len = np.full(B, Lq, np.int32)
    t_enc = rng.integers(0, 20, (B, Lt)).astype(np.int32)
    t_len = np.full(B, Lt, np.int32)

    def run():
        return np.asarray(
            _align_full(q_enc, q_bias, q_len, t_enc, t_len, Lq, Lt, False)[0])

    run()
    trace_dir = tempfile.mkdtemp(prefix="swbench")
    with jax.profiler.trace(trace_dir):
        for _ in range(10):
            run()
    dev_s, n = device_time_of(trace_dir, "jit__align_full(")
    if not n:
        return None
    return float(B) * Lq * Lt / (dev_s / n)


def kernel_rate_qm():
    """Query-major kernel device cells/s at 8 tiles x TB lanes, 256x256:
    (forward ends, fwd+rev complete) — the pipeline's hot path (forward
    on every candidate pair, reverse only on E-value survivors)."""
    import jax
    import jax.numpy as jnp
    from metaeuk_tpu.ops.sw_pallas import (
        TB, PCOLS, _align_ends_qm, _align_full_qm)

    Lq, Lt = 256, 256
    n_tiles = 8
    B = n_tiles * TB
    rng = np.random.default_rng(0)
    prof = rng.integers(-4, 12, (n_tiles, Lq, PCOLS)).astype(np.float32)
    prof[:, :, 21:] = -128
    prof = jnp.asarray(prof, jnp.bfloat16)
    tc = jnp.asarray(rng.integers(0, 20, (Lt, B)).astype(np.int32))

    rates = {}
    for name, fn, sub in [
            ("fwd", lambda: _align_ends_qm(prof, tc, Lq, Lt, False),
             "jit__align_ends_qm("),
            ("full", lambda: _align_full_qm(prof, tc, Lq, Lt, False),
             "jit__align_full_qm(")]:
        np.asarray(fn()[0])
        trace_dir = tempfile.mkdtemp(prefix="swbenchqm")
        with jax.profiler.trace(trace_dir):
            for _ in range(10):
                np.asarray(fn()[0])
        dev_s, n = device_time_of(trace_dir, sub)
        rates[name] = float(B) * Lq * Lt / (dev_s / n) if n else None
    return rates


def make_inputs(tmp):
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tools.make_metagenome import make_metagenome, write_fasta
    contigs, proteins = make_metagenome(BENCH_MBP, BENCH_TARGETS)
    cpath = os.path.join(tmp, "contigs.fna")
    ppath = os.path.join(tmp, "proteins.faa")
    write_fasta(cpath, contigs)
    write_fasta(ppath, proteins)
    return cpath, ppath, len(contigs)


N_STEADY = int(os.environ.get("METAEUK_BENCH_RUNS", "3"))


def run_ours(cpath, ppath, tmp, n_steady=N_STEADY):
    """(walls, cold_wall, stage_seconds, cells): one cold easy-predict
    then n_steady timed runs, all in one process. The cold run carries
    per-process one-time costs — XLA compiles on a cold cache and, on
    this tunneled dev chip, seconds of executable LOAD per jit shape
    (measured: 1 Mbp align stage 371 s cold vs 4.1 s steady on identical
    inputs). Production deployments are long-lived processes, and
    BASELINE.json's contigs/s is a throughput metric, so the steady-state
    median is the primary number; the cold wall is reported alongside.
    cells = per-run {fwd, rev} aligned residue-cell counts (true
    lengths) from the last steady run."""
    from metaeuk_tpu.params import Params
    from metaeuk_tpu.pipeline.predict import EasyPredict
    from metaeuk_tpu.search import driver as drv

    t0 = time.perf_counter()
    EasyPredict(Params()).run(cpath, ppath, os.path.join(tmp, "ours_cold"))
    cold = time.perf_counter() - t0
    walls = []
    cells = None
    stages = {}
    for i in range(n_steady):
        ep = EasyPredict(Params())
        drv.CELLS["fwd"] = drv.CELLS["rev"] = 0
        t0 = time.perf_counter()
        ep.run(cpath, ppath, os.path.join(tmp, "ours"))
        walls.append(time.perf_counter() - t0)
        cells = dict(drv.CELLS)
        stages = dict(getattr(ep, "predict_stage_seconds", {}))
        stages.update(getattr(ep, "stage_seconds", {}))
    return walls, cold, {k: round(v, 3) for k, v in stages.items()}, cells


def run_reference(cpath, ppath, tmp, n_steady=N_STEADY):
    """(walls, cold) reference walls: one cold run then n_steady timed
    runs (fresh tmp dirs each; the binary re-execs per run — page-cache
    warmth is the only steady-state it has), symmetric with run_ours."""
    ref = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       ".refbuild", "src", "metaeuk")
    if not os.path.exists(ref):
        return None, None
    walls = []
    for i in range(n_steady + 1):
        t0 = time.perf_counter()
        r = subprocess.run(
            [ref, "easy-predict", cpath, ppath,
             os.path.join(tmp, f"ref{i}"),
             os.path.join(tmp, f"reftmp{i}"), "-v", "0"],
            capture_output=True)
        if r.returncode != 0:
            return None, None
        walls.append(time.perf_counter() - t0)
    return walls[1:], walls[0]


def run_parity(cpath, ppath, tmp):
    """Byte-compare the bench's own outputs against the reference binary
    on the same inputs with the deterministic methodology the committed
    goldens use (createdb --shuffle 0 so key order matches input order,
    --threads 1 so per-thread writer merge order is fixed; both only
    permute per-record output blocks — record sets are identical either
    way). Returns True/False/None(binary missing)."""
    ref = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       ".refbuild", "src", "metaeuk")
    if not os.path.exists(ref):
        return None
    cdb = os.path.join(tmp, "parityContigsDB")
    tdb = os.path.join(tmp, "parityTargetsDB")
    for src, db in ((cpath, cdb), (ppath, tdb)):
        r = subprocess.run([ref, "createdb", src, db, "--shuffle", "0",
                            "-v", "0"], capture_output=True)
        if r.returncode != 0:
            return False
    refout = os.path.join(tmp, "parity_ref")
    r = subprocess.run(
        [ref, "easy-predict", cdb, tdb, refout,
         os.path.join(tmp, "parity_reftmp"), "-v", "0", "--threads", "1"],
        capture_output=True)
    if r.returncode != 0:
        return False
    ours = os.path.join(tmp, "ours")
    for suffix in ("fas", "codon.fas", "headersMap.tsv", "gff"):
        with open(f"{ours}.{suffix}", "rb") as a, \
                open(f"{refout}.{suffix}", "rb") as b:
            if a.read() != b.read():
                print(f"PARITY MISMATCH: {suffix}", file=sys.stderr)
                return False
    return True


def selftest_qm(light=False):
    """Compiled query-major kernels (fwd ends + survivors reverse) vs the
    numpy oracle, ragged candidate lists across tile boundaries.
    Returns (fails, checks)."""
    import jax.numpy as jnp
    from metaeuk_tpu.ops.sw import sw_align
    from metaeuk_tpu.ops.sw_pallas import (
        TB, _align_ends_qm, _align_starts_qm, build_prof_tiles,
        build_tcodes_T)
    from metaeuk_tpu.data.submat import composition_bias_rounded

    rng = np.random.default_rng(3)
    fails = 0
    checks = 0
    # (8192, 256) exercises the row-tiled long-query kernels
    configs = [(256, 256, 8), (1024, 512, 4), (512, 4096, 2),
               (8192, 256, 1)]
    if light:
        configs = [(256, 256, 8), (1024, 512, 4)]
    for Lq, Lt, n_tiles in configs:
        nq = n_tiles
        qs = [rng.integers(0, 20, int(rng.integers(Lq // 4, Lq + 1)))
              .astype(np.int32) for _ in range(nq)]
        biases = [composition_bias_rounded(q, 1.0) for q in qs]
        q_mat = np.zeros((nq, Lq), np.int32)
        qb_mat = np.zeros((nq, Lq), np.int32)
        q_lens = np.array([len(q) for q in qs], np.int32)
        for i in range(nq):
            q_mat[i, :q_lens[i]] = qs[i]
            qb_mat[i, :q_lens[i]] = biases[i]
        nt = 64
        ts = [rng.integers(0, 20, int(rng.integers(Lt // 4, Lt + 1)))
              .astype(np.int32) for _ in range(nt)]
        t_mat = np.zeros((nt, Lt), np.int32)
        t_lens = np.array([len(t) for t in ts], np.int32)
        for i in range(nt):
            t_mat[i, :t_lens[i]] = ts[i]
        qidx = np.arange(n_tiles, dtype=np.int32)
        lj = np.full((n_tiles, TB), -1, np.int32)
        for tile in range(n_tiles):
            # sparse lanes keep the host-side numpy oracle tractable;
            # the kernel computes all TB lanes either way
            k = int(rng.integers(1, 17))
            lj[tile, :k] = rng.integers(0, nt, k)
        prof = build_prof_tiles(jnp.asarray(q_mat), jnp.asarray(qb_mat),
                                jnp.asarray(q_lens), jnp.asarray(qidx), Lq)
        tc = build_tcodes_T(jnp.asarray(t_mat), jnp.asarray(t_lens),
                            jnp.asarray(lj), Lt)
        sc, qe, te = map(np.asarray, _align_ends_qm(prof, tc, Lq, Lt, False))
        qs_, ts_ = map(np.asarray, _align_starts_qm(
            prof, tc, np.maximum(qe, 0), np.maximum(te, 0),
            Lq, Lt, False)[1:])
        for tile in range(n_tiles):
            for lane in range(TB):
                tj = lj[tile, lane]
                if tj < 0:
                    continue
                b = tile * TB + lane
                ref = sw_align(qs[tile], ts[tj], bias=biases[tile])
                got = dict(score=int(sc[b]), q_start=int(qs_[b]),
                           q_end=int(qe[b]), t_start=int(ts_[b]),
                           t_end=int(te[b]))
                ok = (got["score"] == 0 if ref["score"] == 0
                      else all(got[k] == ref[k] for k in ref))
                checks += 1
                if not ok:
                    fails += 1
                    print(f"QM MISMATCH Lq{Lq}/Lt{Lt} tile {tile} lane "
                          f"{lane}: ref {ref} got {got}", file=sys.stderr)
    return fails, checks


def selftest(light=False):
    """Compiled Pallas kernels vs the numpy oracle on ragged batches
    spanning the driver bucket boundaries (Lq/Lt = 256/1024/4096 tiers).
    Returns (fails, checks); light mode runs a reduced config set so the
    main bench can embed a selftest pass without doubling its wall."""
    from metaeuk_tpu.ops.sw_pallas import sw_pallas_align_batch
    from metaeuk_tpu.ops.sw import sw_align
    from metaeuk_tpu.data.submat import composition_bias_rounded

    rng = np.random.default_rng(7)
    fails, checks = selftest_qm(light)
    configs = [(256, 256, 64), (1024, 256, 24),
               (256, 1024, 24), (1024, 4096, 6)]
    if light:
        configs = [(256, 256, 32), (256, 1024, 8)]
    for Lq_hi, Lt_hi, B in configs:
        q_lens = rng.integers(max(8, Lq_hi // 8), Lq_hi + 1, B)
        t_lens = rng.integers(max(8, Lt_hi // 8), Lt_hi + 1, B)
        qs = [rng.integers(0, 20, l).astype(np.int32) for l in q_lens]
        ts = [rng.integers(0, 20, l).astype(np.int32) for l in t_lens]
        bias = [composition_bias_rounded(q, 1.0) for q in qs]
        Lq = int(max(q_lens))
        Lt = int(max(t_lens))
        qm = np.zeros((B, Lq), np.int32)
        bm = np.zeros((B, Lq), np.int32)
        tm = np.zeros((B, Lt), np.int32)
        for i in range(B):
            qm[i, :q_lens[i]] = qs[i]
            bm[i, :q_lens[i]] = bias[i]
            tm[i, :t_lens[i]] = ts[i]
        sc, qsrt, qend, tsrt, tend = sw_pallas_align_batch(
            qm, bm, q_lens.astype(np.int32), tm, t_lens.astype(np.int32))
        for i in range(B):
            ref = sw_align(qs[i], ts[i], bias=bias[i])
            got = dict(score=int(sc[i]), q_start=int(qsrt[i]),
                       q_end=int(qend[i]), t_start=int(tsrt[i]),
                       t_end=int(tend[i]))
            if ref["score"] == 0:
                ok = got["score"] == 0
            else:
                ok = all(got[k] == ref[k] for k in ref)
            checks += 1
            if not ok:
                fails += 1
                print(f"MISMATCH Lq{Lq_hi}/Lt{Lt_hi} pair {i}: "
                      f"ref {ref} got {got}", file=sys.stderr)
    print(json.dumps({"selftest": "sw_pallas_compiled_vs_oracle",
                      "fails": fails, "checks": checks}))
    return fails, checks


def main():
    if "--selftest" in sys.argv:
        fails, _ = selftest()
        sys.exit(1 if fails else 0)

    tmp = tempfile.mkdtemp(prefix="meukbench")
    cpath, ppath, n_contigs = make_inputs(tmp)
    walls, cold_wall, stages, cells = run_ours(cpath, ppath, tmp)
    wall = float(np.median(walls))
    contigs_per_s = n_contigs / wall

    ref_walls, ref_cold_wall = (None, None) if "--no-ref" in sys.argv \
        else run_reference(cpath, ppath, tmp)
    ref_wall = float(np.median(ref_walls)) if ref_walls else None
    if ref_wall is not None:
        ref_rate = n_contigs / ref_wall
    else:
        ref_rate = FALLBACK_REF_CONTIGS_PER_S
    vs = contigs_per_s / ref_rate if ref_rate else None

    # the bench verifies the outputs it times: rerun the reference with
    # the goldens' deterministic methodology and byte-compare
    parity_ok = None if "--no-ref" in sys.argv \
        else run_parity(cpath, ppath, tmp)

    # compiled-kernel parity on the real chip, embedded in the artifact
    st_fails = st_checks = None
    if "--no-selftest" not in sys.argv:
        try:
            st_fails, st_checks = selftest(light=True)
        except Exception as e:
            print(f"selftest failed to run: {e}", file=sys.stderr)

    krate = None
    krate_qm = None
    try:
        krate = kernel_rate()
        krate_qm = kernel_rate_qm()
    except Exception as e:
        print(f"kernel bench failed: {e}", file=sys.stderr)

    total_cells = sum(cells.values()) if cells else 0
    # tunnel-stall detector: a timed window whose wall exceeds the
    # median by >3x is a link-side stall (the ~403 s artifacts of r03),
    # not a framework property — flag it so a poisoned median is visible
    def stalls(ws, med):
        return [round(w, 2) for w in ws if med and w > 3 * med]
    stalled = {"ours": stalls(walls, wall),
               "ref": stalls(ref_walls or [], ref_wall)}
    stall_suspected = bool(stalled["ours"] or stalled["ref"])
    if stall_suspected:
        print(f"WARNING: stall-suspect timed windows {stalled} "
              f"(>3x median); medians may be poisoned", file=sys.stderr)
    print(json.dumps({
        "metric": "easy_predict_contigs_per_s",
        "value": contigs_per_s,
        "unit": "contigs/s",
        "vs_baseline": vs,
        "extra": {
            "config": {"mbp": BENCH_MBP, "targets": BENCH_TARGETS,
                       "contigs": n_contigs},
            "ours_wall_s": round(wall, 2),
            "ours_walls_s": [round(w, 2) for w in walls],
            "ours_cold_wall_s": round(cold_wall, 2),
            "ref_wall_s": round(ref_wall, 2) if ref_wall else None,
            "ref_walls_s": [round(w, 2) for w in ref_walls]
            if ref_walls else None,
            "ref_cold_wall_s": round(ref_cold_wall, 2)
            if ref_cold_wall else None,
            "parity_ok": parity_ok,
            "stall_suspected": stall_suspected,
            "stall_windows": stalled if stall_suspected else None,
            "selftest": {"fails": st_fails, "checks": st_checks},
            "stage_seconds": stages,
            "aligned_cells": cells,
            # end-to-end aligned residue-cells/s over the whole easy-
            # predict wall (BASELINE.json metric). At bench scale this
            # is workload-limited: the prefilter keeps candidate pairs
            # sparse by design, so total aligned cells / wall is small
            # even with a zero-cost chip; the kernel-rate numbers below
            # are the chip-utilization view, and the 50 Mbp scale run
            # reports the same metric where it is meaningful.
            "aligned_cells_per_s_e2e": total_cells / wall if wall else None,
            "sw_kernel_cells_per_s": krate,
            "sw_kernel_qm_cells_per_s": krate_qm,
        },
    }))


if __name__ == "__main__":
    main()
