"""enrich workflow byte parity (tests/golden/enrich,
tools/make_enrich_goldens.sh). The reference's `enrich` CLI entry is
broken upstream (4 declared paths vs 6 required by enrich.sh), so the
golden replays the script's exact command chain through the reference
binary's individual commands; our workflow must reproduce it
byte-for-byte, which also covers the new profile-query expandaln
(rescoreResultByBacktrace isQueryProf), profile-target result2profile,
and the backtraced sliced profile search.
"""

import pathlib
import shutil

import pytest

GOLDEN = pathlib.Path(__file__).parent / "golden" / "enrich"
DATA = pathlib.Path(__file__).parent / "data"


@pytest.fixture(scope="module")
def dbs(tmp_path_factory):
    td = tmp_path_factory.mktemp("enrich")
    from metaeuk_tpu.cli import main
    for f in GOLDEN.iterdir():
        shutil.copyfile(f, td / f.name)
    with open(td / "all.faa", "wb") as f:
        f.write((DATA / "queries_lin.faa").read_bytes() +
                (DATA / "proteins.faa").read_bytes())
    assert main(["createdb", str(td / "all.faa"), str(td / "alldb")]) == 0
    assert main(["createdb", str(DATA / "queries_lin.faa"),
                 str(td / "qdb")]) == 0
    return td


def assert_db_equal(mine, golden):
    for s in ("", ".index", ".dbtype"):
        assert pathlib.Path(f"{mine}{s}").read_bytes() == \
            pathlib.Path(f"{golden}{s}").read_bytes(), f"{mine}{s}"


def test_slice_search_backtraced(dbs, tmp_path):
    from metaeuk_tpu.search.profile_search import slice_search_db
    slice_search_db(str(dbs / "qdb"), str(dbs / "profdb"),
                    str(tmp_path / "slice"))
    assert_db_equal(tmp_path / "slice", GOLDEN / "search_slice")


def test_result2profile_profile_target(dbs, tmp_path):
    from metaeuk_tpu.pipeline.result2profile import result2profile_db
    result2profile_db(str(dbs / "qdb"), str(dbs / "profdb"),
                      str(dbs / "search_slice"),
                      str(tmp_path / "prof_slice"), filter_msa=1)
    assert_db_equal(tmp_path / "prof_slice", GOLDEN / "prof_slice")


def test_enrich_workflow(dbs, tmp_path):
    from metaeuk_tpu.pipeline.enrich import enrich_workflow
    enrich_workflow(str(dbs / "qdb"), str(dbs / "alldb"),
                    str(dbs / "profdb"), str(dbs / "saln"),
                    str(tmp_path / "enr"), str(tmp_path / "tmp"))
    assert_db_equal(tmp_path / "enr", GOLDEN / "enriched")
