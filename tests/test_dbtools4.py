"""Byte parity for util batch 4 (align, clust, mergeclusters,
translateaa, compress/decompress, dbtype, setextendeddbtype, view,
aliasdb) vs the reference binary.

Goldens from tools/make_util4_goldens.sh. For compress, zstd frame
bytes differ between the vendored zstd 1.3.8 and the system 1.5.4, so
the byte goldens are .index/.dbtype (lengths are uncompressed sizes)
plus read-parity on the reference-compressed DB; the generation script
verifies the reference binary decompresses our output byte-exactly.
"""

import pathlib
import shutil
import struct
import subprocess
import sys

import pytest

from metaeuk_tpu.io import mmseqsdb
from metaeuk_tpu.pipeline import dbtools4

HERE = pathlib.Path(__file__).parent
U4 = HERE / "golden" / "util4"
U = HERE / "golden" / "utils"
DATA = HERE / "data"


def _eq(out, ref, suffixes=("", ".index", ".dbtype")):
    for s in suffixes:
        assert pathlib.Path(f"{out}{s}").read_bytes() \
            == pathlib.Path(f"{ref}{s}").read_bytes(), f"{ref}{s}"


def _cli(*argv):
    subprocess.run([sys.executable, "-m", "metaeuk_tpu.cli", *argv],
                   check=True, capture_output=True)


@pytest.fixture(scope="module")
def qdb(tmp_path_factory):
    td = tmp_path_factory.mktemp("dbt4")
    _cli("createdb", str(DATA / "proteins.faa"), str(td / "qdb"))
    return str(td / "qdb")


def _cp_golden(db, td, name):
    for s in ("", ".index", ".dbtype"):
        shutil.copy(f"{db}{s}", td / f"{name}{s}")
    return str(td / name)


def test_align_module(tmp_path, qdb):
    _cli("align", qdb, qdb, str(U / "selfpref"), str(tmp_path / "res"),
         "-e", "1e-3", "-a")
    _eq(tmp_path / "res", U / "selfres")


def test_clust_alignment_scores(tmp_path, qdb):
    from metaeuk_tpu.pipeline.clust import clust_db
    clust_db(qdb, str(U / "selfres"), str(tmp_path / "clu"))
    _eq(tmp_path / "clu", U4 / "clu_aln")


def test_clust_prefilter_scores(tmp_path, qdb):
    from metaeuk_tpu.pipeline.clust import clust_db
    clust_db(qdb, str(U / "selfpref"), str(tmp_path / "clu"))
    _eq(tmp_path / "clu", U4 / "clu_pref")


def test_mergeclusters(tmp_path, qdb):
    from metaeuk_tpu.pipeline.clust import mergeclusters
    mergeclusters(qdb, str(tmp_path / "merged"),
                  [str(U4 / "clu_aln"), str(U4 / "clu2")])
    _eq(tmp_path / "merged", U4 / "merged")


def test_translateaa(tmp_path, qdb):
    dbtools4.translateaa_db(qdb, str(tmp_path / "nucl"))
    _eq(tmp_path / "nucl", U4 / "aa2nucl")


def test_decompress_reference_db(tmp_path):
    # transparent read of a reference-compressed DB
    assert mmseqsdb.read_db(str(U4 / "res_c")) \
        == mmseqsdb.read_db(str(U / "selfres"))
    # explicit decompress reproduces the original bytes
    dbtools4.decompress_db(str(U4 / "res_c"), str(tmp_path / "d"))
    _eq(tmp_path / "d", U / "selfres")


def test_compress_roundtrip_and_index_parity(tmp_path):
    dbtools4.compress_db(str(U / "selfres"), str(tmp_path / "c"))
    # index + dbtype byte-match the reference's compressed output
    _eq(tmp_path / "c", U4 / "res_c", suffixes=(".index", ".dbtype"))
    assert mmseqsdb.read_db(str(tmp_path / "c")) \
        == mmseqsdb.read_db(str(U / "selfres"))


def test_dbtype_name(qdb):
    assert dbtools4.dbtype_name(qdb) == "Aminoacid"
    assert dbtools4.dbtype_name(str(U / "selfres")) == "Alignment"
    assert dbtools4.dbtype_name(str(U / "selfpref")) == "Prefilter"
    assert dbtools4.dbtype_name(str(U4 / "clu_aln")) == "Clustering"


def test_setextendeddbtype(tmp_path):
    shutil.copy(U / "selfres.dbtype", tmp_path / "x.dbtype")
    dbtools4.setextendeddbtype(str(tmp_path / "x"), 2)
    raw = struct.unpack("<I",
                        (tmp_path / "x.dbtype").read_bytes()[:4])[0]
    assert raw == (5 | (2 << 16))
    assert mmseqsdb.read_dbtype(str(tmp_path / "x")) == 5


def test_view(qdb, capsys):
    entries = dict(mmseqsdb.read_db(qdb))
    blob = dbtools4.view(qdb, ["1", "3"])
    assert blob == entries[1] + entries[3]


def test_aliasdb(tmp_path, qdb):
    local = _cp_golden(qdb, tmp_path, "db")
    for s in ("_h", "_h.index", "_h.dbtype"):
        shutil.copy(f"{qdb}{s}", f"{local}{s}")
    dbtools4.aliasdb(local, str(tmp_path / "alias"))
    assert (tmp_path / "alias.index").is_symlink()
    assert mmseqsdb.read_db(str(tmp_path / "alias")) \
        == mmseqsdb.read_db(local)
