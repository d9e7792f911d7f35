"""linclust contract tests: near-duplicate families cluster under the
longest member; unrelated sequences stay singletons; thresholds respected.
(Contract-level vs lib/mmseqs/src/linclust/ -- own LSH design, see
search/linclust.py docstring.)"""

import numpy as np
import pytest

from metaeuk_tpu.search.linclust import candidate_pairs, linclust, \
    seq_selected_kmers
from metaeuk_tpu.data.submat import encode_aa

AA = "ACDEFGHIKLMNPQRSTVWY"


def _mk(seed=7):
    rng = np.random.default_rng(seed)

    def rp(n):
        return "".join(rng.choice(list(AA), n))

    def mutate(s, rate):
        l = list(s)
        for i in rng.choice(len(l), int(len(l) * rate), replace=False):
            l[i] = AA[rng.integers(20)]
        return "".join(l)
    base1, base2 = rp(200), rp(150)
    return [base1, mutate(base1, 0.03), mutate(base1, 0.05),
            base2, mutate(base2, 0.04), rp(180), rp(120)]


def test_families_cluster_and_decoys_stay_single():
    seqs = [s.encode() for s in _mk()]
    clusters = linclust(seqs, min_seq_id=0.9, cov_thr=0.8)
    assert sorted(clusters[0]) == [0, 1, 2]
    assert sorted(clusters[3]) == [3, 4]
    assert clusters[5] == [5] and clusters[6] == [6]


def test_min_seq_id_threshold_splits():
    seqs = [s.encode() for s in _mk()]
    clusters = linclust(seqs, min_seq_id=0.999, cov_thr=0.8)
    # at ~3-5% mutations nothing passes 99.9% identity
    assert all(len(v) == 1 for v in clusters.values())


def test_selected_kmers_deterministic_and_bounded():
    enc = encode_aa(_mk()[0].encode())
    a = seq_selected_kmers(enc)
    b = seq_selected_kmers(enc)
    assert np.array_equal(a, b)
    assert len(a) <= len(enc)


def test_candidate_pairs_center_is_longest():
    seqs = [s.encode() for s in _mk()]
    encs = [encode_aa(s) for s in seqs]
    pairs = candidate_pairs(encs)
    lens = np.array([len(e) for e in encs])
    for c, m in pairs:
        assert lens[c] >= lens[m]
