"""Benchmark: Smith-Waterman throughput on one chip.

Reports aligned residue-cells/s/chip (GCUPS-style) for the batched SW
forward pass — the pipeline's dominant compute. `vs_baseline` is the ratio
against a 2.0 GCUPS single-CPU-core estimate for the reference's striped
SIMD SW (the repo publishes no numbers; see BASELINE.md).
"""

import json
import time

import numpy as np

BASELINE_CELLS_PER_S = 2.0e9


def main():
    from metaeuk_tpu.ops.sw_jax import sw_batch_ends

    B, Lq, Lt = 512, 256, 256
    rng = np.random.default_rng(0)
    q_enc = rng.integers(0, 20, (B, Lq)).astype(np.int32)
    q_bias = np.zeros((B, Lq), np.int32)
    q_len = np.full(B, Lq, np.int32)
    t_enc = rng.integers(0, 20, (B, Lt)).astype(np.int32)
    t_len = np.full(B, Lt, np.int32)

    def run():
        s, qe, te = sw_batch_ends(q_enc, q_bias, q_len, t_enc, Lq, Lt, t_len=t_len)
        return np.asarray(s)

    run()  # compile + warm up
    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        run()
    dt = (time.perf_counter() - t0) / iters
    cells = float(B) * Lq * Lt
    rate = cells / dt
    print(json.dumps({
        "metric": "sw_cells_per_s_per_chip",
        "value": rate,
        "unit": "cells/s",
        "vs_baseline": rate / BASELINE_CELLS_PER_S,
    }))


if __name__ == "__main__":
    main()
