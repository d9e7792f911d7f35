"""Util batch 7 byte parity vs the reference.

Goldens (tests/golden/util7, tools/make_util7_goldens.sh): expandaln /
expand2profile (BacktraceTranslator + backtrace rescoring, incl. the
no-global-bias-correction profile path), multihitdb (full nucleotide set
chain) and multihitsearch (search -> besthitperset -> mergeresultsbyset)
on two single-contig set files.
"""

import pathlib
import shutil

import pytest

GOLDEN = pathlib.Path(__file__).parent / "golden" / "util7"
DATA = pathlib.Path(__file__).parent / "data"


def assert_db_equal(mine, golden, sufs=("", ".index", ".dbtype")):
    for s in sufs:
        a = pathlib.Path(f"{mine}{s}").read_bytes()
        b = pathlib.Path(f"{golden}{s}").read_bytes()
        assert a == b, f"{mine}{s} != {golden}{s}"


@pytest.fixture(scope="module")
def dbs(tmp_path_factory):
    td = tmp_path_factory.mktemp("util7")
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
    for s in ("", ".index", ".dbtype"):
        shutil.copyfile(GOLDEN / f"selfaln{s}", td / f"selfaln{s}")
    return td


def test_expandaln(dbs, tmp_path):
    from metaeuk_tpu.pipeline.expand import expandaln_db
    expandaln_db(str(dbs / "qdb"), str(dbs / "tdb"), str(dbs / "aln"),
                 str(dbs / "selfaln"), str(tmp_path / "expaln"))
    assert_db_equal(tmp_path / "expaln", GOLDEN / "expaln")


def test_expand2profile(dbs, tmp_path):
    from metaeuk_tpu.pipeline.expand import expandaln_db
    expandaln_db(str(dbs / "qdb"), str(dbs / "tdb"), str(dbs / "aln"),
                 str(dbs / "selfaln"), str(tmp_path / "expprof"),
                 return_aln=False)
    assert_db_equal(tmp_path / "expprof", GOLDEN / "expprof")


def test_multihitdb_and_search(tmp_path):
    from metaeuk_tpu.pipeline.multihit_wf import multihitdb, multihitsearch
    multihitdb([str(GOLDEN / "set0.fna"), str(GOLDEN / "set1.fna")],
               str(tmp_path / "mhdb"), str(tmp_path / "mhtmp"))
    for f in ("mhdb", "mhdb_member_to_set", "mhdb_set_to_member",
              "mhdb_set_size", "mhdb_nucl_contig_to_set",
              "mhdb_nucl_set_to_contig", "mhdb_nucl_orf_to_contig"):
        assert_db_equal(tmp_path / f, GOLDEN / f)
    multihitsearch(str(tmp_path / "mhdb"), str(tmp_path / "mhdb"),
                   str(tmp_path / "mhres"), str(tmp_path / "mhstmp"))
    assert_db_equal(tmp_path / "mhstmp" / "result", GOLDEN / "mh_result")
    assert_db_equal(tmp_path / "mhstmp" / "aggregate",
                    GOLDEN / "mh_aggregate")
    assert_db_equal(tmp_path / "mhres", GOLDEN / "mhres")


def test_expand2profile_pcmode1(dbs, tmp_path):
    """--pseudo-cnt-mode 1: CRF context-specific pseudocounts (golden
    from the reference rebuild with tests/data/tiny.crf as K4000.crf)."""
    from metaeuk_tpu.pipeline.expand import expandaln_db
    expandaln_db(str(dbs / "qdb"), str(dbs / "tdb"), str(dbs / "aln"),
                 str(dbs / "selfaln"), str(tmp_path / "expprof"),
                 return_aln=False, pcmode=1,
                 context_lib=str(DATA / "tiny.crf"))
    assert_db_equal(tmp_path / "expprof", GOLDEN / "expprof_pc1")
