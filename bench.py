"""Benchmark: full Smith-Waterman alignment throughput on one chip.

Measures the device time of the single-dispatch Pallas alignment
(_align_full: forward ends + reversed-prefix starts) via the JAX profiler
— wall-clock on this host is dominated by the tunneled-TPU link latency
(~100 ms per host<->device fetch), so device events are the honest number.

Reports aligned residue-cells/s/chip for the forward DP problem size.
`vs_baseline` is the ratio against a 2.0 GCUPS single-CPU-core estimate
for the reference's striped SIMD SW (the repo publishes no numbers; see
BASELINE.md).
"""

import glob
import gzip
import json
import tempfile
import time

import numpy as np

BASELINE_CELLS_PER_S = 2.0e9


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


def main():
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
        out = _align_full(q_enc, q_bias, q_len, t_enc, t_len, Lq, Lt, False)
        return np.asarray(out[0])

    run()  # compile + warm up
    iters = 10
    trace_dir = tempfile.mkdtemp(prefix="swbench")
    t0 = time.perf_counter()
    with jax.profiler.trace(trace_dir):
        outs = [run() for _ in range(iters)]
    wall = (time.perf_counter() - t0) / iters

    dev_s, n = device_time_of(trace_dir, "jit__align_full(")
    per_batch = dev_s / max(n, 1) if n else wall
    cells = float(B) * Lq * Lt
    rate = cells / per_batch
    print(json.dumps({
        "metric": "sw_align_cells_per_s_per_chip",
        "value": rate,
        "unit": "cells/s",
        "vs_baseline": rate / BASELINE_CELLS_PER_S,
    }))


if __name__ == "__main__":
    main()
