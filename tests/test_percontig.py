"""Standalone resultspercontig / collectoptimalset byte parity.

Goldens (tests/golden/percontig, tools/make_percontig_goldens.sh) are
the stage DBs harvested from `metaeuk predictexons --threads 1` on the
two-contig fixture; the reference's standalone commands reproduce them
exactly (asserted inside the golden script).

Inputs are rebuilt with our own createdb/extractorfs chain (each already
byte-parity-tested) and the search stage input is the committed
search_res golden, so these tests isolate the two commands under test.
"""

import pathlib

import pytest

GOLDEN = pathlib.Path(__file__).parent / "golden" / "percontig"
DATA = pathlib.Path(__file__).parent / "data"


def assert_db_equal(mine, golden, sufs=("", ".index", ".dbtype")):
    for s in sufs:
        a = pathlib.Path(f"{mine}{s}").read_bytes()
        b = pathlib.Path(f"{golden}{s}").read_bytes()
        assert a == b, f"{mine}{s} != {golden}{s}"


@pytest.fixture(scope="module")
def dbs(tmp_path_factory):
    td = tmp_path_factory.mktemp("percontig")
    from metaeuk_tpu.cli import main
    assert main(["createdb", str(DATA / "contigs.fna"),
                 str(td / "contigs")]) == 0
    assert main(["createdb", str(DATA / "proteins.faa"),
                 str(td / "targets")]) == 0
    # predictexons preset: orfMinLength=15 (PredictExons.cpp:8-16)
    assert main(["extractorfs", str(td / "contigs"), str(td / "nucl_6f"),
                 "--min-length", "15"]) == 0
    return td


def test_resultspercontig(dbs, tmp_path):
    from metaeuk_tpu.cli import main
    assert main(["resultspercontig", str(dbs / "contigs"),
                 str(dbs / "nucl_6f"), str(GOLDEN / "search_res"),
                 str(tmp_path / "bc")]) == 0
    assert_db_equal(tmp_path / "bc", GOLDEN / "by_contig")


def test_collectoptimalset(dbs, tmp_path):
    from metaeuk_tpu.cli import main
    assert main(["collectoptimalset", str(GOLDEN / "by_contig"),
                 str(dbs / "targets"), str(tmp_path / "dp")]) == 0
    assert_db_equal(tmp_path / "dp", GOLDEN / "dp_preds")


def test_chained(dbs, tmp_path):
    """resultspercontig -> collectoptimalset end to end."""
    from metaeuk_tpu.pipeline.percontig import (resultspercontig,
                                                collectoptimalset)
    bc = resultspercontig(str(dbs / "contigs"), str(dbs / "nucl_6f"),
                          str(GOLDEN / "search_res"), str(tmp_path / "bc"))
    collectoptimalset(bc, str(dbs / "targets"), str(tmp_path / "dp"))
    assert_db_equal(tmp_path / "dp", GOLDEN / "dp_preds")
