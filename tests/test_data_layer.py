import numpy as np
import pytest

from metaeuk_tpu.data.gencode import GeneticCode, reverse_complement_ascii
from metaeuk_tpu.data.submat import (
    ALPHABET, BLOSUM62_SCORES, composition_bias_rounded, encode_aa)
from metaeuk_tpu.io.fasta import parse_fasta_header
from metaeuk_tpu.io.seqdb import SeqDB, DBTYPE_NUCL


def test_blosum62_known_values():
    # spot-check standard BLOSUM62 entries (A-A=4, W-W=11, X-any=-1)
    a = ALPHABET.index
    assert BLOSUM62_SCORES[a("A"), a("A")] == 4
    assert BLOSUM62_SCORES[a("W"), a("W")] == 11
    assert BLOSUM62_SCORES[a("L"), a("I")] == 2
    assert np.all(BLOSUM62_SCORES[a("X"), :] == -1)
    assert np.array_equal(BLOSUM62_SCORES, BLOSUM62_SCORES.T)


def test_encode_aa_mapping():
    enc = encode_aa(b"ACDJZBuoX*")
    a = ALPHABET.index
    assert list(enc) == [a("A"), a("C"), a("D"), a("L"), a("E"), a("D"),
                         a("X"), a("X"), a("X"), a("X")]


def test_translation_standard_table():
    gc = GeneticCode(1)
    assert gc.stop_codons == ["TAA", "TAG", "TGA"]
    assert gc.translate_ascii(b"ATGGCCTAA") == b"MA*"
    # lowercase propagation + N codon -> X
    assert gc.translate_ascii(b"atgNNNTGG") == b"mXW"
    # ambiguity resolution: GCN -> A
    assert gc.translate_ascii(b"GCN") == b"A"
    # RAY -> B-ish? AAT/AAC=N GAT/GAC=D -> B
    assert gc.translate_ascii(b"RAY") == b"B"


def test_reverse_complement():
    assert reverse_complement_ascii(b"ATGC") == b"GCAT"
    assert reverse_complement_ascii(b"AAAA") == b"TTTT"
    # unknowns -> N
    assert reverse_complement_ascii(b"A.A") == b"TNT"


def test_parse_fasta_header():
    assert parse_fasta_header("seq1 some description") == "seq1"
    assert parse_fasta_header("sp|P12345|NAME_HUMAN desc") == "P12345"
    assert parse_fasta_header("tr|Q99999|X") == "Q99999"
    assert parse_fasta_header("plain") == "plain"


def test_seqdb_roundtrip(tmp_path):
    p = tmp_path / "x.fna"
    p.write_text(">c1 desc\nACGT\nACGT\n>c2\nGGGG\n")
    db = SeqDB.from_fasta(p, DBTYPE_NUCL)
    assert len(db) == 2
    assert db.seq_bytes(0) == b"ACGTACGT"
    assert db.seq_bytes(1) == b"GGGG"
    assert db.accession(0) == "c1"
    assert db.total_residues() == 12
