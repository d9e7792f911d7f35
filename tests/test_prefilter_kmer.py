"""k-mer prefilter byte parity vs the reference binary.

Goldens: reference `prefilter pfQ pfT <out>` on a mutated-protein-family
fixture (fam1-3 at 10-35%% mutation, a fragment, an insertion variant,
decoys, a tandem-repeat sequence, and sub-k-mer-length sequences), across
sensitivities 1/4/5.7/7.5, self-search with identity hits, --mask 0,
--comp-bias-corr 0, and --max-seqs 5.
"""

import pathlib

import numpy as np
import pytest

from metaeuk_tpu.data.submat import AA2NUM
from metaeuk_tpu.io import mmseqsdb
from metaeuk_tpu.search.prefilter_kmer import KmerPrefilter, \
    hits_to_pref_lines, kmer_threshold

GOLDEN = pathlib.Path(__file__).parent / "golden" / "pref"


def _encs(path):
    db = mmseqsdb.read_seqdb(str(path))
    return [AA2NUM[np.asarray(db.seq(i), np.uint8)] for i in range(len(db))]


@pytest.fixture(scope="module")
def seqs():
    return _encs(GOLDEN / "pfT"), _encs(GOLDEN / "pfQ")


def test_kmer_threshold_table():
    assert kmer_threshold(4.0) == 127
    assert kmer_threshold(5.7) == 112
    assert kmer_threshold(7.5) == 96
    assert kmer_threshold(1.0) == 154


@pytest.mark.parametrize("tag,kw,identity", [
    ("pfres_s4", {}, False),
    ("pfres_s5.7", dict(sensitivity=5.7), False),
    ("pfres_s7.5", dict(sensitivity=7.5), False),
    ("pfres_s1", dict(sensitivity=1.0), False),
    ("pfres_self", {}, True),
    ("pfres_nomask", dict(mask_targets=False), False),
    ("pfres_nobias", dict(comp_bias_correction=False), False),
    ("pfres_max5", dict(max_res_list_len=5), False),
])
def test_prefilter_byte_parity(seqs, tag, kw, identity):
    T, Q = seqs
    pf = KmerPrefilter(T, **kw)
    queries = T if identity else Q
    ref = dict(mmseqsdb.read_db(str(GOLDEN / tag)))
    for qi, q in enumerate(queries):
        ids, sc, dg = pf.match(q, identity_id=qi if identity else None)
        assert hits_to_pref_lines(ids, sc, dg).encode() == ref.get(qi, b""), \
            f"{tag} q{qi}"


def test_kmer_size_auto_rule():
    """IndexTable::computeKmerSize thresholds (IndexTable.h:439-449)."""
    from metaeuk_tpu.search.prefilter_kmer import compute_kmer_size
    assert compute_kmer_size(1_000_000) == 6
    assert compute_kmer_size(3_349_999_999) == 6
    assert compute_kmer_size(3_350_000_000) == 7
    assert compute_kmer_size(15_000_000_000) == 7


@pytest.mark.parametrize("tag,kw", [
    ("pfres_k7", dict(kmer_size=7)),
    ("pfres_k7_s7.5", dict(kmer_size=7, sensitivity=7.5)),
])
def test_prefilter_k7_byte_parity(seqs, tag, kw):
    """k=7 spaced seed (11010110011) + [2,2,3] similar-k-mer generator
    vs reference `prefilter -k 7` (KmerGenerator::setDivideStrategy
    kmerSize%3==1 branch)."""
    T, Q = seqs
    pf = KmerPrefilter(T, **kw)
    ref = dict(mmseqsdb.read_db(str(GOLDEN / tag)))
    for qi, q in enumerate(Q):
        ids, sc, dg = pf.match(q)
        assert hits_to_pref_lines(ids, sc, dg).encode() == ref.get(qi, b""), \
            f"{tag} q{qi}"


def test_index_save_load_roundtrip(seqs, tmp_path):
    """createindex artifact: saved+loaded index gives identical results
    and rejects threshold mismatches."""
    T, Q = seqs
    pf = KmerPrefilter(T)
    pf.save_index(tmp_path / "t.kidx")
    pf2 = KmerPrefilter(None, index_path=tmp_path / "t.kidx")
    ref = dict(mmseqsdb.read_db(str(GOLDEN / "pfres_s4")))
    for qi, q in enumerate(Q):
        assert hits_to_pref_lines(*pf2.match(q)).encode() == ref.get(qi, b"")
    with pytest.raises(RuntimeError):
        KmerPrefilter(None, sensitivity=7.5, index_path=tmp_path / "t.kidx")


def test_profile_query_prefilter_byte_parity():
    """Profile-query prefilter (blastpgp/profile-query role): reference
    `prefilter profileDB targetDB` vs match_profile over the committed
    profile fixture. Index built at threshold 0
    (Prefiltering.cpp:525-527), query threshold from the profile branch
    of getKmerThreshold."""
    from metaeuk_tpu.io.profiledb import ProfileDB
    from metaeuk_tpu.search.prefilter_kmer import profile_kmer_threshold

    from metaeuk_tpu.io.fasta import read_fasta

    here = pathlib.Path(__file__).parent
    # target DB = createdb --shuffle 0 over proteins.faa: keys in file order
    recs = read_fasta(str(here / "data" / "proteins.faa"))
    tencs = [AA2NUM[np.frombuffer(s.upper(), np.uint8)] for _, s in recs]
    pf = KmerPrefilter(tencs, kmer_score=0)
    pdb = ProfileDB.from_db(str(here / "golden" / "profile" / "profileDB"))
    assert profile_kmer_threshold() == 109
    thr = profile_kmer_threshold()
    ref = dict(mmseqsdb.read_db(str(GOLDEN / "profq_pref")))
    for i in range(len(pdb)):
        ids, sc, dg = pf.match_profile(pdb.raw_scores[i], pdb.query_seqs[i],
                                       kmer_thr=thr)
        lines = "".join(f"{int(t)}\t{int(s)}\t{int(d)}\n"
                        for t, s, d in zip(ids, sc, dg))
        assert lines.encode() == ref.get(pdb.keys[i], b""), f"profile {i}"


def test_prefilter_overflow_parity():
    """Chunked-overflow regime byte parity (QueryMatcher.cpp:283-340):
    the fixture drives ~4.76M gathered postings per query against
    maxDbMatches=2M, so hits flow through findDuplicates-per-chunk +
    mergeElementsByDiagonal + keepMaxScoreElementOnly; golden from the
    reference binary reports 3 overflowed queries."""
    from fixture_ovf import make_ovf_seqs

    targets, queries = make_ovf_seqs()
    enc = lambda s: AA2NUM[np.frombuffer(s.encode(), np.uint8)]
    pf = KmerPrefilter([enc(t) for t in targets])
    res = pf.match_batch([enc(q) for q in queries])
    ref = dict(mmseqsdb.read_db(str(GOLDEN.parent / "ovf" / "pfres_ovf")))
    for qi, (ids, sc, dg) in enumerate(res):
        assert hits_to_pref_lines(ids, sc, dg).encode() == ref.get(qi, b""), \
            f"ovf q{qi}"


def test_split_mode_selection(seqs, tmp_path):
    """--split-mode (Prefiltering.cpp:662-770): 1 forces query-split
    processing (one resident index, streamed query blocks), 0 forces
    target splits; outputs are identical either way."""
    from dataclasses import replace
    from metaeuk_tpu.io import mmseqsdb as mdb
    from metaeuk_tpu.io.seqdb import SeqDB, DBTYPE_AA
    from metaeuk_tpu.params import Params
    from metaeuk_tpu.search.prefilter_kmer import (ReferenceKmerPrefilter,
                                                   SplitKmerPrefilter)

    T, Q = seqs
    db = tmp_path / "tdb"

    class FakeDB:
        def __init__(self, encs):
            self.encs = encs

        def __len__(self):
            return len(self.encs)

        def seq_bytes(self, i):
            from metaeuk_tpu.data.submat import NUM2AA
            return bytes(NUM2AA[self.encs[i]])

        def total_residues(self):
            return sum(len(e) for e in self.encs)

    fdb = FakeDB(T)
    # query mode: even a tiny memory limit must not split targets
    p1 = Params(split_mode=1, split_memory_limit=1)
    pf1 = ReferenceKmerPrefilter(p1, fdb)
    assert not isinstance(pf1.pf, SplitKmerPrefilter)
    # target mode: forced to >= 2 splits even when one split fits
    p0 = Params(split_mode=0)
    pf0 = ReferenceKmerPrefilter(p0, fdb)
    assert isinstance(pf0.pf, SplitKmerPrefilter)
    assert pf0.pf.n_splits >= 2


def test_prefilter_overflow_single_query_parity():
    """Single-query match() flows through the same chunked-overflow
    native path as the batch (match_collect + finish_match) — no hard
    error, byte parity with the reference in the overflow regime."""
    from fixture_ovf import make_ovf_seqs

    targets, queries = make_ovf_seqs()
    enc = lambda s: AA2NUM[np.frombuffer(s.encode(), np.uint8)]
    pf = KmerPrefilter([enc(t) for t in targets])
    ref = dict(mmseqsdb.read_db(str(GOLDEN.parent / "ovf" / "pfres_ovf")))
    for qi, q in enumerate(queries):
        ids, sc, dg = pf.match(enc(q))
        assert hits_to_pref_lines(ids, sc, dg).encode() \
            == ref.get(qi, b""), f"ovf single q{qi}"


def test_split_prefilter_parity(seqs):
    """Target-DB-split prefilter byte parity vs a reference --split 3
    --split-mode 0 run: decomposeDomainByAminoAcid boundaries, per-split
    hit budget L/split + 4*sqrt(L/split), and the (|score| desc, id asc)
    merge without re-truncation (Prefiltering.cpp:357-466)."""
    from metaeuk_tpu.search.prefilter_kmer import SplitKmerPrefilter

    T, Q = seqs
    pf = SplitKmerPrefilter(T, n_splits=3)
    res = pf.match_batch(Q)
    ref = dict(mmseqsdb.read_db(str(GOLDEN / "pfres_split3")))
    for qi, (ids, sc, dg) in enumerate(res):
        assert hits_to_pref_lines(ids, sc, dg).encode() == ref.get(qi, b""), \
            f"split3 q{qi}"


def test_split_prefilter_self_parity(seqs):
    """Split self-search: the identity hit is forced only inside the
    split that contains the query (Prefiltering.cpp:828-829)."""
    from metaeuk_tpu.search.prefilter_kmer import SplitKmerPrefilter

    T, _ = seqs
    pf = SplitKmerPrefilter(T, n_splits=2)
    res = pf.match_batch(T, identity_ids=np.arange(len(T), dtype=np.uint32))
    ref = dict(mmseqsdb.read_db(str(GOLDEN / "pfres_split2_self")))
    for qi, (ids, sc, dg) in enumerate(res):
        assert hits_to_pref_lines(ids, sc, dg).encode() == ref.get(qi, b""), \
            f"split2self q{qi}"


def test_prefilter_run_statistics_emitted(capfd):
    """The reference's per-run prefilter statistics
    (Prefiltering::printStatistics) are collected natively and emitted
    at -v 3: k-mers/position, DB matches/sequence, overflows, median
    result-list size."""
    import numpy as np
    from metaeuk_tpu.search.prefilter_kmer import prefilter_db

    rng = np.random.default_rng(4)
    targets = [rng.integers(0, 20, 60).astype(np.uint8) for _ in range(40)]
    queries = [t.copy() for t in targets[:5]]
    res = prefilter_db(queries, targets)
    assert len(res) == 5
    err = capfd.readouterr().err
    assert "k-mers per position" in err
    assert "DB matches per sequence" in err
    assert "overflows" in err
    assert "passed prefiltering per query" in err
