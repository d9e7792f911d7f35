"""kmermatcher byte parity vs the reference binary.

Goldens: reference `kmermatcher` on the prefilter protein fixture (pfT)
and a 36-sequence family fixture (kmF), with default flags,
--kmer-per-seq 40, and -k 10."""

import pathlib

import pytest

from metaeuk_tpu.search.kmermatcher import kmermatcher_db, reduced_aa_mapping

G = pathlib.Path(__file__).parent / "golden" / "kmermatcher"
PREF = pathlib.Path(__file__).parent / "golden" / "pref"


def test_reduced_alphabet_is_13_letters():
    table, alpha = reduced_aa_mapping(13)
    assert len(alpha) == 13 and alpha.endswith("X")
    assert len(set(table[ord(c)] for c in "ACDEFGHIKLMNPQRSTVWY")) \
        == len(alpha) - 1


@pytest.mark.parametrize("src,tag,kw", [
    ("pfT", "refkm", {}),
    ("kmF", "refkm2", {}),
    ("kmF", "refkm3", dict(kmers_per_seq=40)),
    ("kmF", "refkm4", dict(kmer_size=10)),
])
def test_kmermatcher_byte_parity(tmp_path, src, tag, kw):
    in_db = (PREF if src == "pfT" else G) / src
    out = tmp_path / tag
    kmermatcher_db(str(in_db), str(out), **kw)
    assert out.read_bytes() == (G / tag).read_bytes()
    assert (tmp_path / f"{tag}.index").read_bytes() \
        == (G / f"{tag}.index").read_bytes()


def test_linclust_full_workflow_byte_parity(tmp_path):
    """Full linclust chain (kmermatcher -> Hamming rescore -> set-cover ->
    filtered ungapped rescore -> gapped align -> set-cover ->
    mergeclusters) vs the reference `linclust` final output."""
    from metaeuk_tpu.search.kmermatcher import linclust_exact
    out = tmp_path / "clu"
    linclust_exact(str(G / "kmF"), str(out), str(tmp_path / "tmp"))
    assert out.read_bytes() == (G / "reflc").read_bytes()
    assert (tmp_path / "clu.index").read_bytes() \
        == (G / "reflc.index").read_bytes()
    # spot-check intermediates
    for st in ("pref_rescore1", "pre_clust", "clust"):
        assert (tmp_path / "tmp" / st).read_bytes() \
            == (G / st).read_bytes(), st


def test_clust_deterministic(tmp_path):
    from metaeuk_tpu.pipeline.clust import clust_db
    clust_db(str(G / "kmF"), str(G / "refkm2"), str(tmp_path / "c"))
    a = (tmp_path / "c").read_bytes()
    clust_db(str(G / "kmF"), str(G / "refkm2"), str(tmp_path / "c2"))
    assert a == (tmp_path / "c2").read_bytes()
