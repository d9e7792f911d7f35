"""Util batch 6 byte parity vs the reference.

Goldens (tests/golden/util6, tools/make_util6_goldens.sh):
profile2consensus/profile2repseq/profile2neff over a default
result2profile DB, convertmsa (Stockholm multi-block, ID/AC identifier
fields), filtera3m (incl. the readMSA last-column GAP clobber quirk),
alignall (score-only all-vs-all within sets), summarizetabs (domain
selection with map::lower_bound length lookups), result2dnamsa
(ORF-extended 15-column records, reverse-strand complementing).
"""

import pathlib
import shutil

import pytest

from metaeuk_tpu.pipeline import dbtools6 as d6

GOLDEN = pathlib.Path(__file__).parent / "golden" / "util6"
DATA = pathlib.Path(__file__).parent / "data"


def assert_db_equal(mine, golden, sufs=("", ".index", ".dbtype")):
    for s in sufs:
        a = pathlib.Path(f"{mine}{s}").read_bytes()
        b = pathlib.Path(f"{golden}{s}").read_bytes()
        assert a == b, f"{mine}{s} != {golden}{s}"


@pytest.fixture(scope="module")
def prof(tmp_path_factory):
    """Profile DB from the default (filter-msa on) result2profile."""
    td = tmp_path_factory.mktemp("util6")
    from metaeuk_tpu.cli import main
    from metaeuk_tpu.pipeline.result2profile import result2profile_db
    from metaeuk_tpu.search.align_module import align_db
    from metaeuk_tpu.search.searchdb import prefilter_db
    assert main(["createdb", str(DATA / "queries_lin.faa"),
                 str(td / "qdb")]) == 0
    assert main(["createdb", str(DATA / "proteins.faa"),
                 str(td / "tdb")]) == 0
    prefilter_db(str(td / "qdb"), str(td / "tdb"), str(td / "pref"),
                 sensitivity=4.0)
    align_db(str(td / "qdb"), str(td / "tdb"), str(td / "pref"),
             str(td / "aln"), evalue=1e-3, add_backtrace=True)
    result2profile_db(str(td / "qdb"), str(td / "tdb"), str(td / "aln"),
                      str(td / "prof"), filter_msa=1)
    return td / "prof"


def test_profile2consensus_and_repseq(prof, tmp_path):
    d6.profile2seq(str(prof), str(tmp_path / "p2c"), consensus=True)
    assert_db_equal(tmp_path / "p2c", GOLDEN / "p2c")
    d6.profile2seq(str(prof), str(tmp_path / "p2r"), consensus=False)
    assert_db_equal(tmp_path / "p2r", GOLDEN / "p2r")


def test_profile2neff(prof, tmp_path):
    d6.profile2neff(str(prof), str(tmp_path / "p2n.txt"))
    assert (tmp_path / "p2n.txt").read_text() == \
        (GOLDEN / "p2n.txt").read_text()


def test_convertmsa(tmp_path):
    d6.convertmsa(str(GOLDEN / "test.sto"), str(tmp_path / "msadb"))
    assert_db_equal(tmp_path / "msadb", GOLDEN / "msadb")
    d6.convertmsa(str(GOLDEN / "test.sto"), str(tmp_path / "msadb_ac"),
                  identifier_field=1)
    assert_db_equal(tmp_path / "msadb_ac", GOLDEN / "msadb_ac")


def test_filtera3m(tmp_path):
    d6.filtera3m(str(GOLDEN / "test.a3m"), str(tmp_path / "f.a3m"),
                 max_seq_id=0.99)
    assert (tmp_path / "f.a3m").read_text() == \
        (GOLDEN / "filtered.a3m").read_text()
    d6.filtera3m(str(GOLDEN / "test.a3m"), str(tmp_path / "f1.a3m"),
                 ndiff=1, max_seq_id=0.95)
    assert (tmp_path / "f1.a3m").read_text() == \
        (GOLDEN / "filtered_diff1.a3m").read_text()


def test_alignall(tmp_path):
    from metaeuk_tpu.cli import main
    with open(tmp_path / "all.faa", "wb") as f:
        f.write((DATA / "queries_lin.faa").read_bytes() +
                (DATA / "proteins.faa").read_bytes())
    assert main(["createdb", str(tmp_path / "all.faa"),
                 str(tmp_path / "alldb")]) == 0
    for s in ("", ".index", ".dbtype"):
        shutil.copyfile(GOLDEN / f"sets{s}", tmp_path / f"sets{s}")
    d6.alignall(str(tmp_path / "alldb"), str(tmp_path / "sets"),
                str(tmp_path / "allaln"))
    assert_db_equal(tmp_path / "allaln", GOLDEN / "allaln")


def test_summarizetabs(tmp_path):
    for s in ("", ".index", ".dbtype"):
        shutil.copyfile(GOLDEN / f"m8db{s}", tmp_path / f"m8db{s}")
    d6.summarizetabs(str(tmp_path / "m8db"), str(GOLDEN / "lengths.tsv"),
                     str(tmp_path / "sumtabs"))
    assert_db_equal(tmp_path / "sumtabs", GOLDEN / "sumtabs")


def test_result2dnamsa(tmp_path):
    from metaeuk_tpu.cli import main
    assert main(["createdb", str(DATA / "contigs.fna"),
                 str(tmp_path / "ndb")]) == 0
    for s in ("", ".index", ".dbtype"):
        shutil.copyfile(GOLDEN / f"nres{s}", tmp_path / f"nres{s}")
    d6.result2dnamsa(str(tmp_path / "ndb"), str(tmp_path / "ndb"),
                     str(tmp_path / "nres"), str(tmp_path / "dnamsa"))
    assert_db_equal(tmp_path / "dnamsa", GOLDEN / "dnamsa")
