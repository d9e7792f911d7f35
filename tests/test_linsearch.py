"""Byte parity for createlinindex/kmersearch/linsearch vs the reference.

Goldens from tools/make_linsearch_goldens.sh: queries are fragments,
point-mutants, and deletion variants of the target proteins so hits
flow through both the ungapped filter branch (rescorediagonal cov>=0.9)
and the gapped align+swapresults branch of linsearch.sh.
"""

import pathlib
import subprocess
import sys

import pytest

HERE = pathlib.Path(__file__).parent
G = HERE / "golden" / "linsearch"
DATA = HERE / "data"


def _eq(out, ref, suffixes=("", ".index", ".dbtype")):
    for s in suffixes:
        assert pathlib.Path(f"{out}{s}").read_bytes() \
            == pathlib.Path(f"{ref}{s}").read_bytes(), f"{ref}{s}"


def _cli(*argv):
    subprocess.run([sys.executable, "-m", "metaeuk_tpu.cli", *argv],
                   check=True, capture_output=True)


@pytest.fixture(scope="module")
def dbs(tmp_path_factory):
    td = tmp_path_factory.mktemp("lin")
    _cli("createdb", str(DATA / "proteins.faa"), str(td / "tdb"))
    _cli("createdb", str(DATA / "queries_lin.faa"), str(td / "qdb"))
    from metaeuk_tpu.search.linsearch_lin import build_linindex
    build_linindex(str(td / "tdb"))
    return td


def test_kmersearch(tmp_path, dbs):
    from metaeuk_tpu.search.linsearch_lin import kmersearch_db
    kmersearch_db(str(dbs / "qdb"), str(dbs / "tdb.linidx.npz"),
                  str(tmp_path / "pref"))
    _eq(tmp_path / "pref", G / "pref")


def test_linsearch_workflow(tmp_path, dbs):
    from metaeuk_tpu.search.linsearch_lin import linsearch_workflow
    linsearch_workflow(str(dbs / "qdb"), str(dbs / "tdb"),
                       str(tmp_path / "lout"), str(tmp_path / "tmp"))
    # stage intermediates byte-match too
    _eq(tmp_path / "tmp" / "reverse_ungapaln", G / "reverse_ungapaln")
    _eq(tmp_path / "tmp" / "reverse_aln", G / "reverse_aln")
    _eq(tmp_path / "lout", G / "lout")


def test_kmersearch_self_identity(tmp_path, dbs):
    """Self-search: every target's 20 selected k-mers match its own
    centers (score 20, diagonal 0)."""
    from metaeuk_tpu.io import mmseqsdb
    from metaeuk_tpu.search.linsearch_lin import kmersearch_db
    kmersearch_db(str(dbs / "tdb"), str(dbs / "tdb.linidx.npz"),
                  str(tmp_path / "selfpref"))
    entries = dict(mmseqsdb.read_db(str(tmp_path / "selfpref")))
    for key, payload in entries.items():
        own = [ln for ln in payload.decode().splitlines()
               if int(ln.split("\t")[0]) == key]
        assert own and own[0].split("\t")[2] == "0"
