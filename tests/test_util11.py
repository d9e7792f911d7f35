"""pairaln byte parity vs the reference (tests/golden/util11,
tools/make_pairaln_goldens.sh): two-source-file query lookup grouping,
taxonomy-annotated target, all pairing mode/filter/dummy combinations.
"""

import pathlib
import shutil

import pytest

GOLDEN = pathlib.Path(__file__).parent / "golden" / "util11"


@pytest.fixture()
def inputs(tmp_path):
    for f in ("aln", "alnnb", "tdb_h"):
        for s in ("", ".index", ".dbtype"):
            shutil.copyfile(GOLDEN / f"{f}{s}", tmp_path / f"{f}{s}")
    shutil.copyfile(GOLDEN / "qdb.lookup", tmp_path / "qdb.lookup")
    shutil.copyfile(GOLDEN / "tdb_mapping", tmp_path / "tdb_mapping")
    return tmp_path


@pytest.mark.parametrize("name,kwargs", [
    ("paired", {}),
    ("paired_dummy", dict(pairing_dummy_mode=1)),
    ("paired_cover", dict(pairing_mode=1)),
    ("paired_prox", dict(pairing_filter=1)),
    ("paired_prox_dummy", dict(pairing_filter=1, pairing_dummy_mode=1)),
])
def test_pairaln(inputs, name, kwargs):
    from metaeuk_tpu.pipeline.pairaln import pairaln_db
    pairaln_db(str(inputs / "qdb"), str(inputs / "tdb"),
               str(inputs / "aln"), str(inputs / name), **kwargs)
    for s in ("", ".index", ".dbtype"):
        assert (inputs / f"{name}{s}").read_bytes() == \
            (GOLDEN / f"{name}{s}").read_bytes(), f"{name}{s}"


def test_pairaln_no_backtrace(inputs):
    from metaeuk_tpu.pipeline.pairaln import pairaln_db
    pairaln_db(str(inputs / "qdb"), str(inputs / "tdb"),
               str(inputs / "alnnb"), str(inputs / "paired_nb"))
    for s in ("", ".index", ".dbtype"):
        assert (inputs / f"paired_nb{s}").read_bytes() == \
            (GOLDEN / f"paired_nb{s}").read_bytes()


def test_fwbw(inputs):
    """fwbw byte parity: the native kernel replicates the reference's
    SSE build (no FMA) bit-for-bit, including the vectorized exp/log
    polynomials and the 4-lane chunked ZE prefix sum."""
    from metaeuk_tpu.cli import main
    from metaeuk_tpu.search.fwbw import fwbw_db
    data = pathlib.Path(__file__).parent / "data"
    qlin = (data / "queries_lin.faa").read_bytes().split(b"\n")
    (inputs / "q1.faa").write_bytes(b"\n".join(qlin[:20]) + b"\n")
    (inputs / "q2.faa").write_bytes(b"\n".join(qlin[20:]))
    assert main(["createdb", str(inputs / "q1.faa"),
                 str(inputs / "q2.faa"), str(inputs / "qdb")]) == 0
    assert main(["createdb", str(data / "proteins.faa"),
                 str(inputs / "tdb")]) == 0
    fwbw_db(str(inputs / "qdb"), str(inputs / "tdb"),
            str(inputs / "aln"), str(inputs / "fwbwout"))
    for s in ("", ".index", ".dbtype"):
        assert (inputs / f"fwbwout{s}").read_bytes() == \
            (GOLDEN / f"fwbwout{s}").read_bytes(), f"fwbwout{s}"


def test_uniprot_structured_numbers():
    """UniProtConverter patterns: OPQ 6-char, ANRZ 6/10-char, UPI hex,
    UniRef/isoform normalisation (pairaln.cpp:28-59)."""
    from metaeuk_tpu.pipeline.pairaln import _to_structured_number
    assert _to_structured_number("P12345") != 0
    assert _to_structured_number("Q99999") != 0
    assert _to_structured_number("A0A023GPI8") != 0
    assert _to_structured_number("UPI0000000001") == 10 ** 15 + 1
    assert _to_structured_number("UniRef100_P12345") == \
        _to_structured_number("P12345")
    assert _to_structured_number("P12345-2") == \
        _to_structured_number("P12345")
    # consecutive accessions map to consecutive numbers
    assert _to_structured_number("P12346") == \
        _to_structured_number("P12345") + 1
