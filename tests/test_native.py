"""Native C++ host layer vs Python implementations (oracle cross-check)."""

import numpy as np
import pytest

from metaeuk_tpu import native
from metaeuk_tpu.ops.orf import _find_forward
from metaeuk_tpu.params import Params

rng = np.random.default_rng(21)

pytestmark = pytest.mark.skipif(native.get_lib() is None,
                                reason="native library unavailable")


def test_native_orf_scan_matches_python():
    stops = ["TAA", "TAG", "TGA"]
    codes = [(ord(c[0]) << 16) | (ord(c[1]) << 8) | ord(c[2]) for c in stops]
    for _ in range(30):
        n = int(rng.integers(3, 400))
        seq = rng.choice(np.frombuffer(b"ACGTN", dtype=np.uint8), n)
        py = _find_forward(seq, 1, 32734, 2**31 - 1, codes)
        nat = native.orf_scan_strand(seq, stops, 1, 32734, 2**31 - 1)
        for a, b in zip(py, nat):
            assert np.array_equal(np.asarray(a), np.asarray(b)), (seq.tobytes(),)


def test_native_chain_dp_matches_python():
    from metaeuk_tpu.ops.chain import PotentialExon, find_optimal_set
    p = Params()

    def random_exons(n):
        out = []
        pos = 0
        for _ in range(n):
            pos += int(rng.integers(16, 400))
            length = int(rng.integers(1, 40)) * 3
            ts = int(rng.integers(0, 100))
            te = ts + length // 3 - 1
            out.append(PotentialExon(
                exon_key=int(rng.integers(0, 1000)), target_key=1, strand=1,
                bit_score=int(rng.integers(10, 200)), seq_id_text="0.500",
                evalue_text="1.000E-05", target_match_start=ts,
                target_match_end=te, target_len=120, contig_start=pos,
                contig_end=pos + length - 1, nucleotide_len=length,
                contig_start_before_trim=pos, contig_end_before_trim=pos + length - 1))
            pos += length
        return out

    for trial in range(10):
        exons = random_exons(int(rng.integers(1, 25)))
        import copy
        a = copy.deepcopy(exons)
        b = copy.deepcopy(exons)
        # force python path by nulling the lib handle
        lib = native._LIB
        try:
            native._LIB = None
            native._TRIED = True
            score_py, set_py = find_optimal_set(a, p)
        finally:
            native._LIB = lib
        score_nat, set_nat = find_optimal_set(b, p)
        assert score_py == score_nat, trial
        assert [(e.contig_start, e.contig_end) for e in set_py] == \
               [(e.contig_start, e.contig_end) for e in set_nat], trial
