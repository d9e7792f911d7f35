"""Byte parity for the second util-command batch vs the reference binary.

Inputs: the committed self-search alignment/prefilter DBs
(tests/golden/utils/selfres, selfpref) produced by the reference on the
proteins.faa fixture; qdb is reconstructed with our own createdb (whose
byte parity is pinned by test_dbtools). Goldens from
tools/make_util_goldens.sh.
"""

import pathlib
import subprocess
import sys

import pytest

from metaeuk_tpu.pipeline import dbtools2

HERE = pathlib.Path(__file__).parent
U = HERE / "golden" / "utils"
DATA = HERE / "data"


def _eq(out, ref, suffixes=("", ".index", ".dbtype")):
    for s in suffixes:
        assert pathlib.Path(f"{out}{s}").read_bytes() \
            == pathlib.Path(f"{ref}{s}").read_bytes(), f"{ref}{s}"


@pytest.fixture(scope="module")
def qdb(tmp_path_factory):
    td = tmp_path_factory.mktemp("qdb")
    subprocess.run([sys.executable, "-m", "metaeuk_tpu.cli", "createdb",
                    str(DATA / "proteins.faa"), str(td / "qdb")],
                   check=True, capture_output=True)
    return str(td / "qdb")


def test_swapdb(tmp_path):
    dbtools2.swapdb(str(U / "selfres"), str(tmp_path / "o"))
    _eq(tmp_path / "o", U / "swapdb_res")


def test_swapresults_aln(tmp_path, qdb):
    dbtools2.swapresults(qdb, qdb, str(U / "selfres"), str(tmp_path / "o"),
                         eval_thr=0.001)
    _eq(tmp_path / "o", U / "swapres")


def test_swapresults_pref(tmp_path, qdb):
    dbtools2.swapresults(qdb, qdb, str(U / "selfpref"), str(tmp_path / "o"))
    _eq(tmp_path / "o", U / "swappref")


def test_prefixid(tmp_path):
    dbtools2.prefixid(str(U / "selfres"), str(tmp_path / "o"))
    _eq(tmp_path / "o", U / "prefid")


def test_prefixid_tsv(tmp_path):
    dbtools2.prefixid(str(U / "selfres"), str(tmp_path / "o"), tsv=True)
    assert (tmp_path / "o").read_bytes() == (U / "prefid_tsv").read_bytes()


def test_suffixid(tmp_path):
    dbtools2.prefixid(str(U / "selfres"), str(tmp_path / "o"), prefix="XX",
                      is_prefix=False)
    _eq(tmp_path / "o", U / "sufid")


def test_subtractdbs_self(tmp_path):
    dbtools2.subtractdbs(str(U / "selfres"), str(U / "selfres"),
                         str(tmp_path / "o"), eval_thr=1e-5)
    _eq(tmp_path / "o", U / "sub_self")


def test_subtractdbs_pref(tmp_path):
    dbtools2.subtractdbs(str(U / "selfres"), str(U / "selfpref"),
                         str(tmp_path / "o"), eval_thr=100)
    _eq(tmp_path / "o", U / "sub_pref")


def test_summarizeresult(tmp_path):
    dbtools2.summarizeresult(str(U / "selfres"), str(tmp_path / "o"))
    _eq(tmp_path / "o", U / "summ")


def test_summarizeresult_cov(tmp_path):
    dbtools2.summarizeresult(str(U / "selfres"), str(tmp_path / "o"),
                             cov_thr=0.8, overlap=0.3)
    _eq(tmp_path / "o", U / "summ_c8")


def test_result2flat(tmp_path, qdb):
    dbtools2.result2flat(qdb, qdb, str(U / "selfres"), str(tmp_path / "o"))
    assert (tmp_path / "o").read_bytes() == (U / "flat").read_bytes()


def test_result2flat_header(tmp_path, qdb):
    dbtools2.result2flat(qdb, qdb, str(U / "selfres"), str(tmp_path / "o"),
                         use_header=True)
    assert (tmp_path / "o").read_bytes() == (U / "flat_hdr").read_bytes()


def test_createseqfiledb(tmp_path, qdb):
    dbtools2.createseqfiledb(qdb, str(U / "selfres"), str(tmp_path / "o"))
    _eq(tmp_path / "o", U / "seqfile")


def test_createseqfiledb_hh(tmp_path, qdb):
    dbtools2.createseqfiledb(qdb, str(U / "selfres"), str(tmp_path / "o"),
                             hh_format=True)
    _eq(tmp_path / "o", U / "seqfile_hh")


def test_splitdb(tmp_path):
    dbtools2.splitdb(str(U / "selfres"), str(tmp_path / "o"), 3)
    for i in range(3):
        _eq(tmp_path / f"o_{i}_3", U / f"spl_{i}_3")


def test_splitdb_aa(tmp_path, qdb):
    dbtools2.splitdb(qdb, str(tmp_path / "o"), 2, split_aa=True)
    for i in range(2):
        _eq(tmp_path / f"o_{i}_2", U / f"splaa_{i}_2")


def test_orftocontig(tmp_path):
    td = tmp_path
    subprocess.run([sys.executable, "-m", "metaeuk_tpu.cli", "createdb",
                    str(DATA / "contigs.fna"), str(td / "cdb")],
                   check=True, capture_output=True)
    dbtools2.orftocontig(str(td / "cdb"), str(U / "orfs"), str(td / "o"))
    _eq(td / "o", U / "orfaln")


def test_renamedbkeys(tmp_path, qdb):
    dbtools2.renamedbkeys(str(U / "rename.tsv"), qdb, str(tmp_path / "o"))
    _eq(tmp_path / "o", U / "renamed")
    _eq(f"{tmp_path}/o_h", U / "renamed_h", ("", ".index"))


def test_concatdbs_self(tmp_path, qdb):
    dbtools2.concatdbs(qdb, qdb, str(tmp_path / "o"))
    _eq(tmp_path / "o", U / "concat")


def test_concatdbs_mixed(tmp_path):
    dbtools2.concatdbs(str(U / "selfres"), str(U / "selfpref"),
                       str(tmp_path / "o"))
    _eq(tmp_path / "o", U / "concat_rp")


def test_db_fileops(tmp_path, qdb):
    dbtools2.cpdb(qdb, str(tmp_path / "c"))
    _eq(tmp_path / "c", qdb)
    dbtools2.mvdb(str(tmp_path / "c"), str(tmp_path / "m"))
    _eq(tmp_path / "m", qdb)
    assert not (tmp_path / "c.index").exists()
    dbtools2.lndb(str(tmp_path / "m"), str(tmp_path / "l"))
    assert (tmp_path / "l.index").is_symlink()
    dbtools2.rmdb(str(tmp_path / "m"))
    assert not (tmp_path / "m.index").exists()
