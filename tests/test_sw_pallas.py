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
