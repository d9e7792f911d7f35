import numpy as np
import pytest

from metaeuk_tpu.data.submat import composition_bias_rounded, encode_aa
from metaeuk_tpu.ops.sw import sw_align, sw_score_naive
from metaeuk_tpu.ops.sw_jax import sw_align_batch

rng = np.random.default_rng(42)


def rand_seq(n):
    return rng.integers(0, 20, size=n).astype(np.int64)


def test_oracle_matches_naive():
    for _ in range(20):
        q = rand_seq(int(rng.integers(5, 60)))
        t = rand_seq(int(rng.integers(5, 60)))
        bias = rng.integers(-2, 3, size=len(q))
        res = sw_align(q, t, bias)
        assert res["score"] == sw_score_naive(q, t, bias)


def test_oracle_alignment_positions():
    # identical sequences: full-length diagonal
    q = encode_aa(b"MKTAYIAKQRQISFVKSHFSRQLEERLGLIEV")
    res = sw_align(q, q)
    assert res["q_start"] == 0 and res["t_start"] == 0
    assert res["q_end"] == len(q) - 1 and res["t_end"] == len(q) - 1


def test_oracle_substring():
    t = encode_aa(b"MKTAYIAKQRQISFVKSHFSRQLEERLGLIEV")
    q = t[8:20]
    res = sw_align(q, t)
    assert res["q_start"] == 0 and res["q_end"] == len(q) - 1
    assert res["t_start"] == 8 and res["t_end"] == 19


def test_jax_batch_matches_oracle():
    B = 24
    Lq, Lt = 48, 64
    qs, ts, biases = [], [], []
    for _ in range(B):
        qs.append(rand_seq(int(rng.integers(4, Lq + 1))))
        ts.append(rand_seq(int(rng.integers(4, Lt + 1))))
        biases.append(rng.integers(-2, 3, size=len(qs[-1])))
    q_enc = np.zeros((B, Lq), np.int32)
    q_bias = np.zeros((B, Lq), np.int32)
    t_enc = np.zeros((B, Lt), np.int32)
    q_len = np.array([len(q) for q in qs], np.int32)
    t_len = np.array([len(t) for t in ts], np.int32)
    for i in range(B):
        q_enc[i, :q_len[i]] = qs[i]
        q_bias[i, :q_len[i]] = biases[i]
        t_enc[i, :t_len[i]] = ts[i]
    score, q_start, q_end, t_start, t_end = sw_align_batch(
        q_enc, q_bias, q_len, t_enc, t_len)
    for i in range(B):
        ref = sw_align(qs[i], ts[i], biases[i])
        assert score[i] == ref["score"], i
        if ref["score"] > 0:
            assert q_end[i] == ref["q_end"], i
            assert t_end[i] == ref["t_end"], i
            assert q_start[i] == ref["q_start"], i
            assert t_start[i] == ref["t_start"], i
