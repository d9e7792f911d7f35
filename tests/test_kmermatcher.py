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
