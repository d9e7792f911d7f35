"""Byte parity for the third util batch vs the reference binary.

Goldens from tools/make_util3_goldens.sh.
"""

import pathlib
import subprocess
import sys

import pytest

from metaeuk_tpu.pipeline import dbtools3

HERE = pathlib.Path(__file__).parent
U = HERE / "golden" / "utils"
DATA = HERE / "data"


def _eq(out, ref, suffixes=("", ".index", ".dbtype")):
    for s in suffixes:
        assert pathlib.Path(f"{out}{s}").read_bytes() \
            == pathlib.Path(f"{ref}{s}").read_bytes(), f"{ref}{s}"


def _mkdb(td, fasta, name):
    subprocess.run([sys.executable, "-m", "metaeuk_tpu.cli", "createdb",
                    str(fasta), str(td / name)],
                   check=True, capture_output=True)
    return str(td / name)


@pytest.fixture(scope="module")
def dbs(tmp_path_factory):
    td = tmp_path_factory.mktemp("dbt3")
    _mkdb(td, DATA / "proteins.faa", "qdb")
    _mkdb(td, DATA / "contigs.fna", "cdb")
    return td


def test_result2repseq(tmp_path, dbs):
    dbtools3.result2repseq(str(dbs / "qdb"), str(U / "selfres"),
                           str(tmp_path / "o"))
    _eq(tmp_path / "o", U / "repseq")


def test_masksequence_aa(tmp_path, dbs):
    dbtools3.masksequence(str(dbs / "qdb"), str(tmp_path / "o"))
    _eq(tmp_path / "o", U / "maskaa")


def test_masksequence_nucl(tmp_path, dbs):
    dbtools3.masksequence(str(dbs / "cdb"), str(tmp_path / "o"))
    _eq(tmp_path / "o", U / "masknt")


def test_gff2db(tmp_path, dbs):
    dbtools3.gff2db([str(U / "test.gff")], str(dbs / "cdb"),
                    str(tmp_path / "o"))
    _eq(tmp_path / "o", U / "gffdb",
        ("", ".index", ".dbtype", "_h", "_h.index", ".lookup", ".source"))


def test_gff2db_typed(tmp_path, dbs):
    dbtools3.gff2db([str(U / "test.gff")], str(dbs / "cdb"),
                    str(tmp_path / "o"), gff_type="CDS")
    _eq(tmp_path / "o", U / "gffcds",
        ("", ".index", ".dbtype", "_h", "_h.index", ".lookup", ".source"))


@pytest.mark.parametrize("stat", ["linecount", "firstline", "mean", "sum",
                                  "max", "min"])
def test_result2stats(tmp_path, stat):
    dbtools3.result2stats(str(U / "selfres"), str(tmp_path / "o"), stat)
    _eq(tmp_path / "o", U / f"st_{stat}", ("", ".index"))


def test_apply(tmp_path):
    dbtools3.apply_cmd(str(U / "selfres"), str(tmp_path / "o"),
                       ["head", "-n", "1"])
    _eq(tmp_path / "o", U / "applied", ("", ".index"))


def test_diffseqdbs(tmp_path, dbs):
    ndb = _mkdb(tmp_path, U / "diff_sub.faa", "ndb")
    dbtools3.diffseqdbs(str(dbs / "qdb"), ndb, str(tmp_path / "rm"),
                        str(tmp_path / "kept"), str(tmp_path / "new"))
    for mine, ref in (("rm", "d.removed"), ("kept", "d.kept"),
                      ("new", "d.new")):
        assert (tmp_path / mine).read_bytes() == (U / ref).read_bytes(), ref


def test_result2msa_fasta(tmp_path, dbs):
    from metaeuk_tpu.pipeline.result2msa import result2msa_db
    result2msa_db(str(dbs / "qdb"), str(dbs / "qdb"), str(U / "selfres"),
                  str(tmp_path / "o"))
    _eq(tmp_path / "o", U / "msa_fasta")


def test_result2msa_stockholm(tmp_path, dbs):
    from metaeuk_tpu.pipeline.result2msa import result2msa_db
    result2msa_db(str(dbs / "qdb"), str(dbs / "qdb"), str(U / "selfres"),
                  str(tmp_path / "o"), msa_format_mode=4)
    assert (tmp_path / "o").read_bytes() == (U / "msa_sto").read_bytes()


def test_result2msa_filtered(tmp_path, dbs):
    from metaeuk_tpu.pipeline.result2msa import result2msa_db
    result2msa_db(str(dbs / "qdb"), str(dbs / "qdb"), str(U / "selfres"),
                  str(tmp_path / "o"), filter_msa=True)
    _eq(tmp_path / "o", U / "msa_filt")


def test_maskbygff_string_keyed_byte_parity(tmp_path):
    """maskbygff on a STRING-keyed DB (the reference's
    DBReader<std::string> precondition, maskbygff.cpp:14-16): GFF
    seqnames looked up against string index keys, feature regions X'd
    (1-based closed coords), output renumbered 0..n-1 with the header
    DB; golden from the reference binary on the committed fixture."""
    import pathlib
    import shutil
    from metaeuk_tpu.pipeline.dbtools3 import maskbygff
    g = pathlib.Path(__file__).parent / "golden" / "maskbygff"
    for suf in ("", ".index", ".dbtype", "_h", "_h.index", "_h.dbtype"):
        shutil.copy(g / f"strdb{suf}", tmp_path / f"strdb{suf}")
    out = tmp_path / "masked"
    maskbygff(str(g / "test.gff"), str(tmp_path / "strdb"), str(out),
              gff_type="gene")
    for suf in ("", ".index", "_h", "_h.index"):
        assert (tmp_path / f"masked{suf}").read_bytes() \
            == (g / f"refmasked{suf}").read_bytes(), suf
