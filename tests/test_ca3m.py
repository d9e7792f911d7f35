"""Compressed-A3M tests (tests/golden/ca3m, tools/make_ca3m_goldens.sh).

convertca3m is byte-parity vs the reference binary on the committed
crafted fixture. The generation side (result2msa --msa-format-mode 0)
is DISABLED in the reference CLI (result2msa.cpp:41-44), so our writer
is validated by round trip: our ca3m -> our convertca3m must equal
what the reference convertca3m produced from the same writer output
(golden `rt_*` not stored; the decode-equivalence vs the original
alignment records is asserted instead).
"""

import pathlib
import shutil

GOLDEN = pathlib.Path(__file__).parent / "golden" / "ca3m"
DATA = pathlib.Path(__file__).parent / "data"


def test_convertca3m_golden(tmp_path):
    from metaeuk_tpu.pipeline.ca3m import convertca3m
    for f in GOLDEN.iterdir():
        shutil.copyfile(f, tmp_path / f.name)
    convertca3m(str(tmp_path / "ca3mdb"), str(tmp_path / "conv"))
    for s in ("", ".index", ".dbtype"):
        assert (tmp_path / f"conv{s}").read_bytes() == \
            (GOLDEN / f"convout{s}").read_bytes(), f"conv{s}"


def test_ca3m_roundtrip(tmp_path):
    """writer -> reader recovers every alignment's coordinates and
    backtrace byte-for-byte (targets renumbered to concat keys)."""

    from metaeuk_tpu.cli import main
    from metaeuk_tpu.io import mmseqsdb
    from metaeuk_tpu.pipeline.ca3m import convertca3m, result2msa_ca3m
    for s in ("", ".index", ".dbtype"):
        shutil.copyfile(GOLDEN / f"aln{s}", tmp_path / f"aln{s}")
    assert main(["createdb", str(DATA / "queries_lin.faa"),
                 str(tmp_path / "qdb")]) == 0
    assert main(["createdb", str(DATA / "proteins.faa"),
                 str(tmp_path / "tdb")]) == 0
    result2msa_ca3m(str(tmp_path / "qdb"), str(tmp_path / "tdb"),
                    str(tmp_path / "aln"), str(tmp_path / "ca"))
    convertca3m(str(tmp_path / "ca"), str(tmp_path / "rt"))
    orig = dict(mmseqsdb.read_db(str(tmp_path / "aln")))
    rt = dict(mmseqsdb.read_db(str(tmp_path / "rt")))
    assert set(rt) == set(orig)

    nq = 18
    for key, payload in orig.items():
        olines = [l.split("\t") for l in payload.decode().splitlines()]
        rlines = [l.split("\t")
                  for l in rt[key].decode().splitlines()]
        assert len(olines) == len(rlines)
        for o, r in zip(olines, rlines):
            assert int(r[0]) == nq + int(o[0])  # renumbered target key
            assert r[4:10] == o[4:10]           # coords + lengths
            assert r[10] == o[10]               # backtrace preserved


def test_ca3m_consensus_mode(tmp_path):
    from metaeuk_tpu.cli import main
    from metaeuk_tpu.pipeline.ca3m import result2msa_ca3m
    for s in ("", ".index", ".dbtype"):
        shutil.copyfile(GOLDEN / f"aln{s}", tmp_path / f"aln{s}")
    assert main(["createdb", str(DATA / "queries_lin.faa"),
                 str(tmp_path / "qdb")]) == 0
    assert main(["createdb", str(DATA / "proteins.faa"),
                 str(tmp_path / "tdb")]) == 0
    result2msa_ca3m(str(tmp_path / "qdb"), str(tmp_path / "tdb"),
                    str(tmp_path / "aln"), str(tmp_path / "cons"),
                    consensus=True)
    data = (tmp_path / "cons_ca3m.ffdata").read_bytes()
    assert data.startswith(b">consensus_")
