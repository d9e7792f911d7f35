"""Increasing-sensitivity multi-pass search byte parity.

Goldens (tests/golden/senssteps, tools/make_senssteps_goldens.sh):
reference `search --start-sens/--sens-steps` on queries_steps.faa
(easy + heavily mutated + random queries, so later passes really run)
vs proteins.faa, including the per-step pref/aln intermediates.

Reference: lib/mmseqs/src/workflow/Search.cpp:520-546 and the STEPS
loop in data/workflow/blastp.sh.
"""

import pathlib

import pytest

from metaeuk_tpu.search.searchdb import search_db, step_sensitivities

GOLDEN = pathlib.Path(__file__).parent / "golden" / "senssteps"
DATA = pathlib.Path(__file__).parent / "data"


def assert_db_equal(mine, golden):
    for s in ("", ".index", ".dbtype"):
        a = pathlib.Path(f"{mine}{s}").read_bytes()
        b = pathlib.Path(f"{golden}{s}").read_bytes()
        assert a == b, f"{mine}{s} != {golden}{s}"


@pytest.fixture(scope="module")
def dbs(tmp_path_factory):
    td = tmp_path_factory.mktemp("senssteps")
    from metaeuk_tpu.cli import main
    assert main(["createdb", str(DATA / "queries_steps.faa"),
                 str(td / "qdb")]) == 0
    assert main(["createdb", str(DATA / "proteins.faa"),
                 str(td / "tdb")]) == 0
    return td


def test_step_schedule():
    # Search.cpp: SENSE_k = start + (s - start)/(steps-1)*k at %.1f
    assert step_sensitivities(1.0, 7.5, 3) == [1.0, 4.2, 7.5]
    assert step_sensitivities(4.0, 7.5, 1) == [7.5]
    with pytest.raises(ValueError):
        step_sensitivities(8.0, 7.5, 2)


def test_three_step_search_parity(dbs, tmp_path):
    out = tmp_path / "res"
    search_db(str(dbs / "qdb"), str(dbs / "tdb"), str(out),
              str(tmp_path / "stmp"), sensitivity=7.5, start_sens=1.0,
              sens_steps=3)
    # per-step intermediates: pass-0 prefilter+align over all queries,
    # pass-1 over only the queries empty after pass 0
    assert_db_equal(tmp_path / "stmp" / "pref_0", GOLDEN / "steps3_pref_0")
    assert_db_equal(tmp_path / "stmp" / "aln_0", GOLDEN / "steps3_aln_0")
    assert_db_equal(tmp_path / "stmp" / "pref_1", GOLDEN / "steps3_pref_1")
    assert_db_equal(tmp_path / "stmp" / "aln_1", GOLDEN / "steps3_aln_1")
    assert_db_equal(out, GOLDEN / "steps3")


def test_two_step_search_parity(dbs, tmp_path):
    out = tmp_path / "res"
    search_db(str(dbs / "qdb"), str(dbs / "tdb"), str(out),
              str(tmp_path / "stmp"), sensitivity=7.0, start_sens=2.0,
              sens_steps=2)
    assert_db_equal(out, GOLDEN / "steps2")
