"""Util batch 5 byte parity vs the reference.

Goldens (tests/golden/util5, tools/make_util5_goldens.sh):
extractalignedregion (query/target modes), summarizeheaders
(uniclust + metaclust incl. the libstdc++ make_heap order and the
unsigned-priority underflow), clusthash (default + --min-seq-id 0.9),
mergeresultsbyset, makepaddedseqdb, unpackdb, countkmer,
recoverlongestorf, filterresult (default + --diff 1 --max-seq-id 0.95),
ungappedprefilter/gappedprefilter, tar2db.
"""

import pathlib
import shutil

import pytest

from metaeuk_tpu.pipeline import dbtools5 as d5

GOLDEN = pathlib.Path(__file__).parent / "golden" / "util5"
DATA = pathlib.Path(__file__).parent / "data"


def assert_db_equal(mine, golden, sufs=("", ".index", ".dbtype")):
    for s in sufs:
        a = pathlib.Path(f"{mine}{s}").read_bytes()
        b = pathlib.Path(f"{golden}{s}").read_bytes()
        assert a == b, f"{mine}{s} != {golden}{s}"


@pytest.fixture(scope="module")
def dbs(tmp_path_factory):
    """query/target DBs + the -s 4 prefilter and -a alignment."""
    td = tmp_path_factory.mktemp("util5")
    from metaeuk_tpu.cli import main
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
    return td


def test_extractalignedregion(dbs, tmp_path):
    d5.extractalignedregion(str(dbs / "qdb"), str(dbs / "tdb"),
                            str(dbs / "aln"), str(tmp_path / "extq"),
                            extract_mode=1)
    assert_db_equal(tmp_path / "extq", GOLDEN / "extq")
    d5.extractalignedregion(str(dbs / "qdb"), str(dbs / "tdb"),
                            str(dbs / "aln"), str(tmp_path / "extt"),
                            extract_mode=2)
    assert_db_equal(tmp_path / "extt", GOLDEN / "extt")


def test_summarizeheaders(tmp_path):
    for s in ("", ".index", ".dbtype"):
        shutil.copyfile(GOLDEN / f"hdrdb{s}", tmp_path / f"hdrdb{s}")
        shutil.copyfile(GOLDEN / f"clu2{s}", tmp_path / f"clu2{s}")
    d5.summarizeheaders(str(tmp_path / "hdrdb"), str(tmp_path / "hdrdb"),
                        str(tmp_path / "clu2"), str(tmp_path / "sum"))
    assert_db_equal(tmp_path / "sum", GOLDEN / "sumhdr")
    d5.summarizeheaders(str(tmp_path / "hdrdb"), str(tmp_path / "hdrdb"),
                        str(tmp_path / "clu2"), str(tmp_path / "summc"),
                        header_type=2)
    assert_db_equal(tmp_path / "summc", GOLDEN / "sumhdr_mc")


@pytest.fixture(scope="module")
def alldb(tmp_path_factory):
    td = tmp_path_factory.mktemp("util5all")
    from metaeuk_tpu.cli import main
    with open(td / "all.faa", "wb") as f:
        f.write((DATA / "queries_lin.faa").read_bytes() +
                (DATA / "proteins.faa").read_bytes())
    assert main(["createdb", str(td / "all.faa"), str(td / "alldb")]) == 0
    return td / "alldb"


def test_clusthash(alldb, tmp_path):
    d5.clusthash(str(alldb), str(tmp_path / "chash"))
    assert_db_equal(tmp_path / "chash", GOLDEN / "chash")
    d5.clusthash(str(alldb), str(tmp_path / "chash90"), min_seq_id=0.9)
    assert_db_equal(tmp_path / "chash90", GOLDEN / "chash90")


def test_mergeresultsbyset(dbs, tmp_path):
    from metaeuk_tpu.io import mmseqsdb
    mmseqsdb.write_db(str(tmp_path / "sets"),
                      [(100, b"0\n2\n"), (101, b"1\n")], 5)
    d5.mergeresultsbyset(str(tmp_path / "sets"), str(dbs / "aln"),
                         str(tmp_path / "mrbs"))
    assert_db_equal(tmp_path / "mrbs", GOLDEN / "mrbs")


def test_makepaddedseqdb(dbs, tmp_path):
    d5.makepaddedseqdb(str(dbs / "tdb"), str(tmp_path / "padded"))
    assert_db_equal(tmp_path / "padded", GOLDEN / "padded",
                    sufs=("", ".index", ".dbtype",
                          "_h", "_h.index", "_h.dbtype"))


def test_unpackdb(dbs, tmp_path):
    d5.unpackdb(str(dbs / "tdb"), str(tmp_path / "unpacked"),
                name_mode=0, suffix=".seq")
    for p in (GOLDEN / "unpacked").iterdir():
        assert (tmp_path / "unpacked" / p.name).read_bytes() == \
            p.read_bytes(), p.name


def test_countkmer(dbs):
    assert d5.countkmer(str(dbs / "tdb"), k=2) == \
        (GOLDEN / "countkmer_k2.tsv").read_text()


def test_recoverlongestorf(tmp_path):
    from metaeuk_tpu.cli import main
    assert main(["createdb", str(DATA / "contigs.fna"),
                 str(tmp_path / "contigs")]) == 0
    assert main(["extractorfs", str(tmp_path / "contigs"),
                 str(tmp_path / "orfs"), "--min-length", "10"]) == 0
    for s in ("", ".index", ".dbtype"):
        shutil.copyfile(GOLDEN / f"orfres{s}", tmp_path / f"orfres{s}")
    d5.recoverlongestorf(str(tmp_path / "orfs"), str(tmp_path / "orfres"),
                         str(tmp_path / "lo"))
    assert (tmp_path / "lo").read_bytes() == \
        (GOLDEN / "longestorf").read_bytes()


def test_filterresult(dbs, tmp_path):
    from metaeuk_tpu.pipeline.result2profile import filterresult_db
    filterresult_db(str(dbs / "qdb"), str(dbs / "tdb"), str(dbs / "aln"),
                    str(tmp_path / "fres"))
    assert_db_equal(tmp_path / "fres", GOLDEN / "fres")
    filterresult_db(str(dbs / "qdb"), str(dbs / "tdb"), str(dbs / "aln"),
                    str(tmp_path / "fres2"), ndiff=1,
                    filter_max_seq_id=0.95)
    assert_db_equal(tmp_path / "fres2", GOLDEN / "fres2")


def test_ungapped_and_gapped_prefilter(dbs, tmp_path):
    from metaeuk_tpu.search.exhaustive import exhaustive_prefilter
    exhaustive_prefilter(str(dbs / "qdb"), str(dbs / "tdb"),
                         str(tmp_path / "upref"))
    assert_db_equal(tmp_path / "upref", GOLDEN / "upref")
    exhaustive_prefilter(str(dbs / "qdb"), str(dbs / "tdb"),
                         str(tmp_path / "gpref"), gapped=True)
    assert_db_equal(tmp_path / "gpref", GOLDEN / "gpref")


def test_tar2db_and_db2tar_roundtrip(tmp_path):
    d5.tar2db(str(GOLDEN / "src.tar"), str(tmp_path / "tardb"))
    assert_db_equal(tmp_path / "tardb", GOLDEN / "tardb")
    assert (tmp_path / "tardb.lookup").read_bytes() == \
        (GOLDEN / "tardb.lookup").read_bytes()
    assert (tmp_path / "tardb.source").read_bytes() == \
        (GOLDEN / "tardb.source").read_bytes()
    # db2tar -> tar2db round trip preserves entries and names
    d5.db2tar(str(tmp_path / "tardb"), str(tmp_path / "roundtrip.tar"))
    d5.tar2db(str(tmp_path / "roundtrip.tar"), str(tmp_path / "tardb2"))
    assert (tmp_path / "tardb2").read_bytes() == \
        (tmp_path / "tardb").read_bytes()
    assert (tmp_path / "tardb2.lookup").read_bytes() == \
        (tmp_path / "tardb.lookup").read_bytes()


def test_easy_linsearch_contract(tmp_path):
    """easy-linsearch = linsearch workflow + default convertalis (the
    reference's easysearch.sh linsearch branch builds a degenerate empty
    .linidx on this fixture, so the parity surface is the composed
    workflow: createdb -> linsearch (byte-parity stages, test_linsearch)
    -> write_blast_tab)."""
    from metaeuk_tpu.search.searchdb import easy_linsearch
    easy_linsearch(str(DATA / "queries_lin.faa"),
                   str(DATA / "proteins.faa"), str(tmp_path / "el.m8"),
                   str(tmp_path / "eltmp"))
    lines = (tmp_path / "el.m8").read_text().splitlines()
    assert len(lines) >= 6
    assert all(len(ln.split("\t")) == 12 for ln in lines)
