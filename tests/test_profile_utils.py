"""profile2pssm + convertprofiledb byte parity vs the reference binary.

Goldens: reference `profile2pssm refr2p refpssm [--db-output 1]` on the
result2profile golden profile DB, and `convertprofiledb` on the hand-made
HH-suite .hhm fixture (tests/data/hhmdb).
"""

import pathlib

from metaeuk_tpu.pipeline.convertprofiledb import convertprofiledb
from metaeuk_tpu.pipeline.profile2pssm import profile2pssm_db

DATA = pathlib.Path(__file__).parent / "data"
R2P = pathlib.Path(__file__).parent / "golden" / "r2p"
GOLDEN = pathlib.Path(__file__).parent / "golden" / "util"


def test_profile2pssm_text(tmp_path):
    out = tmp_path / "pssm"
    profile2pssm_db(str(R2P / "refr2p"), str(out))
    assert out.read_bytes() == (GOLDEN / "refpssm").read_bytes()


def test_profile2pssm_db_output(tmp_path):
    out = tmp_path / "pssmdb"
    profile2pssm_db(str(R2P / "refr2p"), str(out), db_out=True)
    assert out.read_bytes() == (GOLDEN / "refpssm_db").read_bytes()
    assert (tmp_path / "pssmdb.index").read_bytes() \
        == (GOLDEN / "refpssm_db.index").read_bytes()


def test_convertprofiledb(tmp_path):
    out = tmp_path / "cvt"
    convertprofiledb(str(DATA / "hhmdb"), str(out))
    for suf in ("", ".index", ".dbtype", "_h", "_h.index"):
        assert (tmp_path / f"cvt{suf}").read_bytes() \
            == (GOLDEN / f"refcvt{suf}").read_bytes(), suf
