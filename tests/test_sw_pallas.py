import numpy as np
import pytest

from metaeuk_tpu.ops.sw import sw_align
from metaeuk_tpu.ops.sw_pallas import sw_pallas_align_batch

rng = np.random.default_rng(11)


def test_pallas_matches_oracle_interpret():
    B, Lq, Lt = 8, 32, 48
    qs = [rng.integers(0, 20, int(rng.integers(4, Lq + 1))) for _ in range(B)]
    ts = [rng.integers(0, 20, int(rng.integers(4, Lt + 1))) for _ in range(B)]
    biases = [rng.integers(-2, 3, len(q)) for q in qs]
    q_enc = np.zeros((B, Lq), np.int32)
    q_bias = np.zeros((B, Lq), np.int32)
    t_enc = np.zeros((B, Lt), np.int32)
    q_len = np.array([len(q) for q in qs], np.int32)
    t_len = np.array([len(t) for t in ts], np.int32)
    for i in range(B):
        q_enc[i, :q_len[i]] = qs[i]
        q_bias[i, :q_len[i]] = biases[i]
        t_enc[i, :t_len[i]] = ts[i]
    score, q_start, q_end, t_start, t_end = sw_pallas_align_batch(
        q_enc, q_bias, q_len, t_enc, t_len, interpret=True)
    for i in range(B):
        ref = sw_align(qs[i], ts[i], biases[i])
        assert score[i] == ref["score"], i
        if ref["score"] > 0:
            assert (q_start[i], q_end[i], t_start[i], t_end[i]) == (
                ref["q_start"], ref["q_end"], ref["t_start"], ref["t_end"]), i


def test_pallas_qm_matches_oracle_interpret():
    """Query-major kernels (one query x TB candidate lanes, per-column
    MXU score delivery) == the numpy oracle: forward ends, then the
    survivors-only reverse starts."""
    import jax.numpy as jnp
    from metaeuk_tpu.ops.sw_pallas import (
        TB, _align_ends_qm, _align_starts_qm, build_prof_tiles,
        build_tcodes_T)

    Lq, Lt = 40, 56
    n_tiles = 2
    nq = 2
    qs = [rng.integers(0, 20, int(rng.integers(8, Lq + 1))) for _ in range(nq)]
    biases = [rng.integers(-2, 3, len(q)) for q in qs]
    q_mat = np.zeros((nq, Lq), np.int32)
    qb_mat = np.zeros((nq, Lq), np.int32)
    q_lens = np.array([len(q) for q in qs], np.int32)
    for i in range(nq):
        q_mat[i, :q_lens[i]] = qs[i]
        qb_mat[i, :q_lens[i]] = biases[i]
    nt = 5
    ts = [rng.integers(0, 20, int(rng.integers(8, Lt + 1))) for _ in range(nt)]
    t_mat = np.zeros((nt, Lt), np.int32)
    t_lens = np.array([len(t) for t in ts], np.int32)
    for i in range(nt):
        t_mat[i, :t_lens[i]] = ts[i]
    # tile 0: query 0 vs 3 targets (+ padding lanes); tile 1: query 1 vs 5
    qidx = np.array([0, 1], np.int32)
    lj = np.full((n_tiles, TB), -1, np.int32)
    lj[0, :3] = [0, 1, 2]
    lj[1, :5] = [4, 3, 2, 1, 0]
    prof = build_prof_tiles(jnp.asarray(q_mat), jnp.asarray(qb_mat),
                            jnp.asarray(q_lens), jnp.asarray(qidx), Lq)
    tc = build_tcodes_T(jnp.asarray(t_mat), jnp.asarray(t_lens),
                        jnp.asarray(lj), Lt)
    score, q_end, t_end = _align_ends_qm(prof, tc, Lq, Lt, True)
    score, q_end, t_end = map(np.asarray, (score, q_end, t_end))
    sc2, q_start, t_start = map(np.asarray, _align_starts_qm(
        prof, tc, np.maximum(q_end, 0), np.maximum(t_end, 0), Lq, Lt, True))
    for tile in range(n_tiles):
        for lane in range(TB):
            tj = lj[tile, lane]
            b = tile * TB + lane
            if tj < 0:
                assert score[b] == 0, (tile, lane)
                continue
            q = qidx[tile]
            ref = sw_align(qs[q], ts[tj], biases[q])
            assert score[b] == ref["score"], (tile, lane)
            if ref["score"] > 0:
                assert (q_start[b], q_end[b], t_start[b], t_end[b]) == (
                    ref["q_start"], ref["q_end"], ref["t_start"],
                    ref["t_end"]), (tile, lane)


def test_pallas_qm_multichunk_matches_oracle_interpret():
    """Query-major kernels across COLUMN-CHUNK boundaries (Lt > TJ=512):
    the reverse kernel must consume target-code chunks in reversed grid
    order."""
    import jax.numpy as jnp
    from metaeuk_tpu.ops.sw_pallas import (
        TB, _align_ends_qm, _align_starts_qm, build_prof_tiles,
        build_tcodes_T)

    Lq, Lt = 24, 1024
    q = rng.integers(0, 20, 20)
    bias = rng.integers(-2, 3, 20)
    q_mat = np.zeros((1, Lq), np.int32)
    qb_mat = np.zeros((1, Lq), np.int32)
    q_mat[0, :20] = q
    qb_mat[0, :20] = bias
    nt = 4
    ts = [rng.integers(0, 20, int(rng.integers(600, Lt + 1)))
          for _ in range(nt)]
    t_mat = np.zeros((nt, Lt), np.int32)
    t_lens = np.array([len(t) for t in ts], np.int32)
    for i in range(nt):
        t_mat[i, :t_lens[i]] = ts[i]
    lj = np.full((1, TB), -1, np.int32)
    lj[0, :nt] = np.arange(nt)
    prof = build_prof_tiles(jnp.asarray(q_mat), jnp.asarray(qb_mat),
                            jnp.asarray(np.array([20], np.int32)),
                            jnp.asarray(np.zeros(1, np.int32)), Lq)
    tc = build_tcodes_T(jnp.asarray(t_mat), jnp.asarray(t_lens),
                        jnp.asarray(lj), Lt)
    score, q_end, t_end = map(np.asarray, _align_ends_qm(
        prof, tc, Lq, Lt, True))
    sc2, q_start, t_start = map(np.asarray, _align_starts_qm(
        prof, tc, np.maximum(q_end, 0), np.maximum(t_end, 0), Lq, Lt, True))
    for lane in range(nt):
        ref = sw_align(q, ts[lane], bias)
        assert score[lane] == ref["score"], lane
        if ref["score"] > 0:
            assert (q_start[lane], q_end[lane], t_start[lane],
                    t_end[lane]) == (ref["q_start"], ref["q_end"],
                                     ref["t_start"], ref["t_end"]), lane


def test_pallas_qm_row_tiled_matches_oracle_interpret():
    """Row-tiled query-major kernels (long-query path, Lq > 2*QM_TQ) ==
    the numpy oracle; QM_TQ shrunk so the tiling logic runs at test
    sizes (4 row tiles over Lq=256)."""
    import jax.numpy as jnp
    import metaeuk_tpu.ops.sw_pallas as sp

    Lq, Lt = 256, 128
    n_tiles = 1
    qs = [rng.integers(0, 20, 250)]
    biases = [rng.integers(-2, 3, 250)]
    q_mat = np.zeros((1, Lq), np.int32)
    qb_mat = np.zeros((1, Lq), np.int32)
    q_lens = np.array([250], np.int32)
    q_mat[0, :250] = qs[0]
    qb_mat[0, :250] = biases[0]
    nt = 6
    ts = [rng.integers(0, 20, int(rng.integers(16, Lt + 1))) for _ in range(nt)]
    t_mat = np.zeros((nt, Lt), np.int32)
    t_lens = np.array([len(t) for t in ts], np.int32)
    for i in range(nt):
        t_mat[i, :t_lens[i]] = ts[i]
    qidx = np.zeros(1, np.int32)
    lj = np.full((n_tiles, sp.TB), -1, np.int32)
    lj[0, :nt] = np.arange(nt)
    prof = sp.build_prof_tiles(jnp.asarray(q_mat), jnp.asarray(qb_mat),
                               jnp.asarray(q_lens), jnp.asarray(qidx), Lq)
    tc = sp.build_tcodes_T(jnp.asarray(t_mat), jnp.asarray(t_lens),
                           jnp.asarray(lj), Lt)
    old_tq = sp.QM_TQ
    sp.QM_TQ = 64
    try:
        score, q_end, t_end = map(np.asarray, sp._qm_call_rt(
            sp._dp_kernel_qm_rt, 0, Lq, Lt, n_tiles, prof, tc, (), 3, True))
        qe = np.maximum(q_end, 0).reshape(1, -1)
        te = np.maximum(t_end, 0).reshape(1, -1)
        sc2, q_start, t_start = map(np.asarray, sp._qm_call_rt(
            sp._dp_kernel_qm_rev_rt, 2, Lq, Lt, n_tiles, prof, tc,
            (jnp.asarray(qe), jnp.asarray(te)), 3, True))
    finally:
        sp.QM_TQ = old_tq
    for lane in range(nt):
        ref = sw_align(qs[0], ts[lane], biases[0])
        assert score[lane] == ref["score"], lane
        if ref["score"] > 0:
            assert (q_start[lane], q_end[lane], t_start[lane],
                    t_end[lane]) == (ref["q_start"], ref["q_end"],
                                     ref["t_start"], ref["t_end"]), lane


def test_driver_qm_path_matches_pair_path():
    """SearchDriver with the query-major path forced (interpret mode)
    produces the identical hit array as the pair-batched XLA path."""
    import metaeuk_tpu.search.driver as drv
    from metaeuk_tpu.params import Params

    class _TDB:
        def __init__(self, seqs):
            self.seqs = seqs

        def __len__(self):
            return len(self.seqs)

        def seq_bytes(self, i):
            return self.seqs[i]

        def total_residues(self):
            return sum(len(s) for s in self.seqs)

    aas = b"ACDEFGHIKLMNPQRSTVWY"
    r = np.random.default_rng(5)
    targets = [bytes(aas[c] for c in r.integers(0, 20, int(n)))
               for n in r.integers(20, 90, 37)]
    orfs = [bytes(aas[c] for c in r.integers(0, 20, int(n)))
            for n in r.integers(20, 120, 9)]
    # make some orfs share substrings with targets so real hits exist
    orfs[0] = targets[3][:40] + orfs[0][:20]
    orfs[4] = targets[10][5:60]
    p = Params()
    p.search_evalue_thr = 1e5
    import os
    old = os.environ.get("METAEUK_QM")
    old_min = drv.QM_MIN_CANDS
    try:
        os.environ["METAEUK_QM"] = "off"
        ref = drv.SearchDriver(p, _TDB(targets)).search(orfs)
        os.environ["METAEUK_QM"] = "force"
        drv.QM_MIN_CANDS = 1
        got = drv.SearchDriver(p, _TDB(targets)).search(orfs)
    finally:
        drv.QM_MIN_CANDS = old_min
        if old is None:
            os.environ.pop("METAEUK_QM", None)
        else:
            os.environ["METAEUK_QM"] = old
    assert len(ref) == len(got)
    for name in ref.dtype.names:
        np.testing.assert_array_equal(ref[name], got[name], name)


def test_pallas_prof_matches_oracle_interpret():
    """PSSM-vs-sequence Pallas path (the inverted profile search's inner
    kernel) == the XLA sw_jax prof path: scores and all four endpoints,
    ragged lengths included."""
    import numpy as np
    from metaeuk_tpu.ops.sw_jax import sw_align_batch_prof
    from metaeuk_tpu.ops.sw_pallas import sw_pallas_align_batch_prof
    rng = np.random.default_rng(11)
    B, Lq, Lt = 144, 48, 64
    prof = rng.integers(-10, 12, (B, Lq, 21)).astype(np.int32)
    q_len = rng.integers(5, Lq + 1, B).astype(np.int32)
    t_enc = rng.integers(0, 21, (B, Lt)).astype(np.int32)
    t_len = rng.integers(5, Lt + 1, B).astype(np.int32)
    ref = sw_align_batch_prof(prof, q_len, t_enc, t_len)
    got = sw_pallas_align_batch_prof(prof, q_len, t_enc, t_len,
                                     interpret=True)
    for name, a, b in zip(("score", "q_start", "q_end", "t_start", "t_end"),
                          ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), name)
