import numpy as np
import pytest

import jax

from metaeuk_tpu.ops.sw import sw_align
from metaeuk_tpu.parallel.dist import make_mesh, sharded_search_step

rng = np.random.default_rng(3)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_search_matches_oracle():
    mesh = make_mesh(frags=2, targets=4)
    Bq, Nt, Lq, Lt = 4, 8, 32, 32
    q_enc = rng.integers(0, 20, (Bq, Lq)).astype(np.int32)
    q_bias = np.zeros((Bq, Lq), np.int32)
    q_len = np.full(Bq, Lq, np.int32)
    t_enc = rng.integers(0, 20, (Nt, Lt)).astype(np.int32)
    t_len = np.full(Nt, Lt, np.int32)
    step = sharded_search_step(mesh, Lq, Lt)
    score, q_end, t_end = step(q_enc, q_bias, q_len, t_enc, t_len)
    score = np.asarray(score)
    for i in range(Bq):
        for j in range(Nt):
            ref = sw_align(q_enc[i], t_enc[j])
            assert score[i, j] == ref["score"], (i, j)
