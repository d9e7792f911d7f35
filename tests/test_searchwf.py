"""search-workflow family byte parity vs the reference.

Goldens (tests/golden/searchwf, tools/make_search_goldens.sh): reference
`search` at the workflow defaults (-s 5.7), `rbh` with every rbh.sh
intermediate, `result2rbh`, `map` (ungapped rescorediagonal align module
at the Map.cpp defaults), `easy-search` (plain + --greedy-best-hits) and
`easy-rbh` BLAST-tab outputs, on queries_lin.faa vs proteins.faa.

Reference: lib/mmseqs/src/workflow/{Search,Rbh,Map,EasySearch}.cpp,
data/workflow/{blastp,rbh,map,easysearch}.sh,
lib/mmseqs/src/util/result2rbh.cpp.
"""

import pathlib

import pytest

from metaeuk_tpu.search.searchdb import (easy_rbh, easy_search, map_db,
                                         rbh_db, result2rbh_db, search_db)

GOLDEN = pathlib.Path(__file__).parent / "golden" / "searchwf"
DATA = pathlib.Path(__file__).parent / "data"


def assert_db_equal(mine, golden):
    for s in ("", ".index", ".dbtype"):
        a = pathlib.Path(f"{mine}{s}").read_bytes()
        b = pathlib.Path(f"{golden}{s}").read_bytes()
        assert a == b, f"{mine}{s} != {golden}{s}"


@pytest.fixture(scope="module")
def dbs(tmp_path_factory):
    td = tmp_path_factory.mktemp("searchwf")
    from metaeuk_tpu.cli import main
    assert main(["createdb", str(DATA / "queries_lin.faa"),
                 str(td / "qdb")]) == 0
    assert main(["createdb", str(DATA / "proteins.faa"),
                 str(td / "tdb")]) == 0
    return td


def test_search_workflow_defaults(dbs, tmp_path):
    out = tmp_path / "res"
    search_db(str(dbs / "qdb"), str(dbs / "tdb"), str(out),
              str(tmp_path / "stmp"))
    assert_db_equal(tmp_path / "stmp" / "pref_0", GOLDEN / "search_pref")
    assert_db_equal(out, GOLDEN / "search")


def test_map_workflow(dbs, tmp_path):
    out = tmp_path / "map"
    map_db(str(dbs / "qdb"), str(dbs / "tdb"), str(out),
           str(tmp_path / "mtmp"))
    assert_db_equal(out, GOLDEN / "map")


def test_rbh_workflow_and_intermediates(dbs, tmp_path):
    out = tmp_path / "rbh"
    rbh_db(str(dbs / "qdb"), str(dbs / "tdb"), str(out),
           str(tmp_path / "rtmp"))
    for f in ("resAB", "resBA", "resA_best_B", "resB_best_A",
              "resB_best_A_swap", "res_best_merged",
              "res_best_merged_sorted"):
        assert_db_equal(tmp_path / "rtmp" / f, GOLDEN / f"rbh_{f}")
    assert_db_equal(out, GOLDEN / "rbh")


def test_result2rbh(tmp_path):
    result2rbh_db(str(GOLDEN / "rbh_res_best_merged_sorted"),
                  str(tmp_path / "r2rbh"))
    assert_db_equal(tmp_path / "r2rbh", GOLDEN / "r2rbh")


def test_easy_search(tmp_path):
    easy_search(str(DATA / "queries_lin.faa"), str(DATA / "proteins.faa"),
                str(tmp_path / "es.m8"), str(tmp_path / "estmp"))
    assert (tmp_path / "es.m8").read_bytes() == \
        (GOLDEN / "easysearch.m8").read_bytes()


def test_easy_search_greedy_best_hits(tmp_path):
    easy_search(str(DATA / "queries_lin.faa"), str(DATA / "proteins.faa"),
                str(tmp_path / "esg.m8"), str(tmp_path / "egtmp"),
                greedy_best_hits=True)
    assert (tmp_path / "esg.m8").read_bytes() == \
        (GOLDEN / "easysearch_greedy.m8").read_bytes()


def test_easy_rbh(tmp_path):
    easy_rbh(str(DATA / "queries_lin.faa"), str(DATA / "proteins.faa"),
             str(tmp_path / "er.m8"), str(tmp_path / "ertmp"))
    assert (tmp_path / "er.m8").read_bytes() == \
        (GOLDEN / "easyrbh.m8").read_bytes()
