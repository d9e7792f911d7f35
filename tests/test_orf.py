import numpy as np

from metaeuk_tpu.ops.orf import OrfExtractor, STRAND_PLUS, STRAND_MINUS
from metaeuk_tpu.params import Params


def make_extractor(**kw):
    defaults = dict(orf_min_length=1, orf_max_length=32734)
    defaults.update(kw)
    return OrfExtractor(Params(**defaults))


def test_simple_orf_plus():
    ex = make_extractor()
    # frame 0: ATG GCA TGG TAA -> orf [0..8], stop excluded
    contig = b"ATGGCATGGTAA"
    locs, frags = ex.extract_contig(contig)
    plus = [l for l in locs if l.strand == STRAND_PLUS and l.from_pos == 0]
    assert any(l.from_pos == 0 and l.to_pos == 8 for l in plus)
    f = [f for l, f in zip(locs, frags)
         if l.strand == STRAND_PLUS and l.from_pos == 0 and l.to_pos == 8][0]
    assert f == b"ATGGCATGG"


def test_orf_incomplete_edges():
    ex = make_extractor()
    # no stops anywhere: every frame yields one fragment with both edges incomplete
    contig = b"ATGGCAGGCGCAGCT"  # 15nt
    locs, frags = ex.extract_contig(contig)
    for l in locs:
        assert l.has_incomplete_start and l.has_incomplete_end
    # frame 0 plus: positions 0..14 (5 codons)
    p0 = [l for l in locs if l.strand == STRAND_PLUS and l.from_pos == 0][0]
    assert p0.to_pos == 14


def test_orf_min_length_filter():
    ex = make_extractor(orf_min_length=4)
    contig = b"ATGGCATGGTAA"  # frame0 has 3 codons -> filtered
    locs, _ = ex.extract_contig(contig)
    assert not any(l.strand == STRAND_PLUS and l.from_pos == 0 and l.to_pos == 8
                   for l in locs)


def test_orf_minus_strand_coords():
    ex = make_extractor()
    # revcomp of TTACCATGCCAT = ATGGCATGGTAA -> minus-strand orf
    contig = b"TTACCATGCCAT"
    locs, frags = ex.extract_contig(contig)
    minus = [(l, f) for l, f in zip(locs, frags) if l.strand == STRAND_MINUS]
    assert minus
    l, f = [(l, f) for l, f in minus if f == b"ATGGCATGG"][0]
    # scan coords 0..8 on revcomp; contig coords mirrored: from=11, to=3
    assert l.from_pos == 11 and l.to_pos == 3


def test_orf_stop_codon_runs():
    ex = make_extractor()
    # two ORFs in frame 0 separated by a stop: ATG GCA TAA GGG CCC TAG
    contig = b"ATGGCATAAGGGCCCTAG"
    locs, frags = ex.extract_contig(contig)
    f0 = [(l, f) for l, f in zip(locs, frags)
          if l.strand == STRAND_PLUS and l.from_pos % 3 == 0]
    seqs = [f for _, f in f0]
    assert b"ATGGCA" in seqs and b"GGGCCC" in seqs
    first = [l for l, f in f0 if f == b"ATGGCA"][0]
    second = [l for l, f in f0 if f == b"GGGCCC"][0]
    assert first.has_incomplete_start and not first.has_incomplete_end
    assert not second.has_incomplete_start and not second.has_incomplete_end


def test_translation_roundtrip():
    ex = make_extractor()
    assert ex.translate_fragment(b"ATGGCATGG") == b"MAW"
