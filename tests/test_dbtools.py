"""DB-toolkit + createdb byte parity vs the reference binary.

Goldens: reference reverseseq (seq + profile DBs), sortresult (alignment +
prefilter DBs), mergedbs (with prefixes), createsubdb (copy mode,
unordered key list -> sorted index), tsv2db, and createdb on the e2e
fixtures (nucleotide + protein, incl. .lookup/.source)."""

import pathlib
import shutil
import subprocess
import sys

from metaeuk_tpu.pipeline.dbtools import createsubdb, mergedbs, reverseseq, \
    sortresult, tsv2db

HERE = pathlib.Path(__file__).parent
G = HERE / "golden" / "dbtools"
PREF = HERE / "golden" / "pref"
R2P = HERE / "golden" / "r2p"
ALN = HERE / "golden" / "aln"
CDB = HERE / "golden" / "createdb"
DATA = HERE / "data"


def _eq(out, ref, suffixes=("", ".index")):
    for s in suffixes:
        assert pathlib.Path(f"{out}{s}").read_bytes() \
            == pathlib.Path(f"{ref}{s}").read_bytes(), s


def _targets_db(td):
    """Reconstruct the fixture targetsDB via my own createdb."""
    subprocess.run([sys.executable, "-m", "metaeuk_tpu.cli", "createdb",
                    str(DATA / "proteins.faa"), str(td / "targetsDB")],
                   check=True, capture_output=True)
    return td / "targetsDB"


def test_reverseseq_seq(tmp_path):
    tdb = _targets_db(tmp_path)
    reverseseq(str(tdb), str(tmp_path / "rev"))
    _eq(tmp_path / "rev", G / "refrev_seq")


def test_reverseseq_profile(tmp_path):
    reverseseq(str(R2P / "refr2p"), str(tmp_path / "revp"))
    _eq(tmp_path / "revp", G / "refrev_prof")


def test_sortresult_aln(tmp_path):
    sortresult(str(ALN / "search_a"), str(tmp_path / "sorted"))
    _eq(tmp_path / "sorted", G / "refsorted")


def test_sortresult_pref(tmp_path):
    sortresult(str(PREF / "pfres_s4"), str(tmp_path / "sortedp"))
    _eq(tmp_path / "sortedp", G / "refsortedpref")


def test_mergedbs(tmp_path):
    mergedbs(str(PREF / "pfQ"), str(tmp_path / "merged"),
             [str(PREF / "pfres_s4"), str(PREF / "pfres_s5.7")], ["A", "B"])
    _eq(tmp_path / "merged", G / "refmerged")


def test_createsubdb(tmp_path):
    tdb = _targets_db(tmp_path)
    createsubdb([3, 1, 5], str(tdb), str(tmp_path / "sub"))
    _eq(tmp_path / "sub", G / "refsubdb")


def test_tsv2db(tmp_path):
    tsv2db(str(G / "input.tsv"), str(tmp_path / "tsvdb"), output_dbtype=12)
    _eq(tmp_path / "tsvdb", G / "reftsvdb", ("", ".index", ".dbtype"))


def test_createdb_byte_parity(tmp_path):
    for fasta, ref, sufs in (
            (DATA / "contigs.fna", CDB / "cdb",
             ("", ".index", ".dbtype", "_h", "_h.index", "_h.dbtype",
              ".lookup", ".source")),
            (DATA / "proteins.faa", CDB / "tdb",
             ("", ".index", ".dbtype", "_h", "_h.index", ".lookup",
              ".source"))):
        out = tmp_path / ref.name
        subprocess.run([sys.executable, "-m", "metaeuk_tpu.cli", "createdb",
                        str(fasta), str(out)], check=True,
                       capture_output=True)
        _eq(out, ref, sufs)


def _contigs_db(td):
    subprocess.run([sys.executable, "-m", "metaeuk_tpu.cli", "createdb",
                    str(DATA / "contigs.fna"), str(td / "contigsDB")],
                   check=True, capture_output=True)
    return td / "contigsDB"


def test_extractframes(tmp_path):
    from metaeuk_tpu.pipeline.dbtools import extractframes
    cdb = _contigs_db(tmp_path)
    extractframes(str(cdb), str(tmp_path / "ef"))
    _eq(tmp_path / "ef", G / "refef", ("", ".index", "_h", "_h.index"))
    extractframes(str(cdb), str(tmp_path / "eft"), translate=True)
    _eq(tmp_path / "eft", G / "refeft", ("", ".index", "_h", "_h.index"))


def test_splitsequence(tmp_path):
    from metaeuk_tpu.pipeline.dbtools import splitsequence
    cdb = _contigs_db(tmp_path)
    splitsequence(str(cdb), str(tmp_path / "sp"), max_seq_len=500)
    _eq(tmp_path / "sp", G / "refsplit", ("", ".index", "_h", "_h.index"))


def test_convert2fasta(tmp_path):
    from metaeuk_tpu.pipeline.dbtools import convert2fasta
    tdb = _targets_db(tmp_path)
    convert2fasta(str(tdb), str(tmp_path / "o.faa"))
    _eq(tmp_path / "o.faa", G / "reffasta.faa", ("",))
