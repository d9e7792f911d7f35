"""Nucleotide search contract tests: plus/minus strand recovery with
exact coordinates, mutated-target sensitivity, decoy rejection.
(Contract-level vs the reference's blastn.sh path — own design, see
search/nucl_search.py docstring.)"""

import numpy as np
import pytest

from metaeuk_tpu.data.nucl import NUCL_SCORES, encode_nucl, revcomp_enc
from metaeuk_tpu.search.nucl_search import NuclSearch


def _mk(seed=11):
    rng = np.random.default_rng(seed)

    def dna(n):
        return "".join(rng.choice(list("ACGT"), n))

    def mutate(s, rate):
        l = list(s)
        for i in rng.choice(len(l), int(len(l) * rate), replace=False):
            l[i] = "ACGT"[rng.integers(4)]
        return "".join(l)

    def rc(s):
        return s[::-1].translate(str.maketrans("ACGT", "TGCA"))
    base = dna(400)
    targets = [base, dna(350), mutate(base, 0.1), dna(500)]
    queries = [mutate(base[50:300], 0.05), rc(mutate(base[100:350], 0.04)),
               dna(260)]
    return targets, queries


def test_nucl_matrix():
    assert NUCL_SCORES[0, 0] == 4 and NUCL_SCORES[0, 1] == -5
    assert np.array_equal(revcomp_enc(encode_nucl(b"ACGT")),
                          encode_nucl(b"ACGT"))  # ACGT is its own revcomp


def test_strand_recovery_and_coords():
    targets, queries = _mk()
    ns = NuclSearch([encode_nucl(t.encode()) for t in targets])
    res = ns.search([encode_nucl(q.encode()) for q in queries])
    # q0: plus strand, target 0 region [50, 299]
    h = res[0][0]
    assert h["target"] == 0 and h["strand"] == 1
    assert h["t_start"] == 50 and h["t_end"] == 299
    assert h["q_start"] == 0 and h["q_end"] == 249
    # also finds the 10%-mutated copy
    assert any(x["target"] == 2 for x in res[0])
    # q1: minus strand, target 0 region [100, 349]
    h = res[1][0]
    assert h["target"] == 0 and h["strand"] == -1
    assert h["t_start"] == 100 and h["t_end"] == 349
    # q2: decoy finds nothing
    assert res[2] == []


def test_evalue_threshold():
    targets, queries = _mk()
    ns = NuclSearch([encode_nucl(t.encode()) for t in targets],
                    max_evalue=1e-300)
    res = ns.search([encode_nucl(queries[0].encode())])
    # perfect-ish 250 nt hit passes even an extreme threshold
    assert res[0] and res[0][0]["evalue"] < 1e-300 or res[0] == []
