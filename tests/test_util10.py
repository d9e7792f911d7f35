"""Util batch 10 byte parity vs the reference.

Goldens (tests/golden/util10, tools/make_util10_goldens.sh):
convertkb (SwissProt flat-file → per-column DBs + .lookup),
extractdomains (summarizetabs-format domains mapped onto MSA members,
combined e-value with the fixed K=0.041/lambda=0.267 constants),
calculatelambda (tests/golden/util9/lambda_vtml80.txt: computed
background + lambda comment lines, then the comment-stripped matrix).
fwbw/pairaln reference runs failed on the fixtures (.SKIPPED markers).
"""

import json
import pathlib
import shutil

GOLDEN = pathlib.Path(__file__).parent / "golden" / "util10"
GOLDEN9 = pathlib.Path(__file__).parent / "golden" / "util9"
GOLDEN6 = pathlib.Path(__file__).parent / "golden" / "util6"


def assert_db_equal(mine, golden, sufs=("", ".index", ".dbtype")):
    for s in sufs:
        a = pathlib.Path(f"{mine}{s}").read_bytes()
        b = pathlib.Path(f"{golden}{s}").read_bytes()
        assert a == b, f"{mine}{s} != {golden}{s}"


def test_convertkb(tmp_path):
    from metaeuk_tpu.pipeline.dbtools8 import convertkb
    convertkb(str(GOLDEN / "test.dat"), str(tmp_path / "kb"),
              kb_columns="ID,AC,OS,OX,PE,SEQ")
    for col in ("ID", "AC", "OS", "OX", "PE", "SEQ"):
        assert_db_equal(tmp_path / f"kb_{col}", GOLDEN / f"kb_{col}")
    assert (tmp_path / "kb.lookup").read_bytes() == \
        (GOLDEN / "kb.lookup").read_bytes()


def test_extractdomains(tmp_path):
    from metaeuk_tpu.pipeline.dbtools6 import summarizetabs
    from metaeuk_tpu.pipeline.dbtools8 import extractdomains
    for s in ("", ".index", ".dbtype"):
        shutil.copyfile(GOLDEN6 / f"m8db{s}", tmp_path / f"m8db{s}")
    summarizetabs(str(tmp_path / "m8db"), str(GOLDEN6 / "lengths.tsv"),
                  str(tmp_path / "sumtabs"))
    extractdomains(str(tmp_path / "sumtabs"), str(GOLDEN / "msa"),
                   str(tmp_path / "domains"))
    assert_db_equal(tmp_path / "domains", GOLDEN / "domains")


def test_calculatelambda():
    from metaeuk_tpu.pipeline.dbtools8 import calculatelambda
    import re
    golden = (GOLDEN9 / "lambda_vtml80.txt").read_text()
    # reconstruct the comment-stripped input the golden was made from
    src = "/root/reference/lib/mmseqs/data/VTML80.out"
    if not pathlib.Path(src).exists():  # standalone checkout
        body = "\n".join(l for l in golden.splitlines()
                         if not l.startswith("#")) + "\n"
        src = str(GOLDEN9 / "_vtml80_body.tmp")
        pathlib.Path(src).write_text(body)
    try:
        assert calculatelambda(src) == golden
    finally:
        tmp = GOLDEN9 / "_vtml80_body.tmp"
        if tmp.exists():
            tmp.unlink()


def test_alignbykmer(tmp_path):
    from metaeuk_tpu.cli import main
    from metaeuk_tpu.search.alignbykmer import alignbykmer_db
    from metaeuk_tpu.search.searchdb import prefilter_db
    data = pathlib.Path(__file__).parent / "data"
    assert main(["createdb", str(data / "queries_lin.faa"),
                 str(tmp_path / "qdb")]) == 0
    assert main(["createdb", str(data / "proteins.faa"),
                 str(tmp_path / "tdb")]) == 0
    prefilter_db(str(tmp_path / "qdb"), str(tmp_path / "tdb"),
                 str(tmp_path / "pref"), sensitivity=4.0)
    alignbykmer_db(str(tmp_path / "qdb"), str(tmp_path / "tdb"),
                   str(tmp_path / "pref"), str(tmp_path / "abk"))
    assert_db_equal(tmp_path / "abk", GOLDEN / "abk")


def test_appenddbtoindex(tmp_path):
    from metaeuk_tpu.io import mmseqsdb
    from metaeuk_tpu.pipeline.dbtools8 import appenddbtoindex
    mmseqsdb.write_db(str(tmp_path / "extra"), [(0, b"payload\n")],
                      mmseqsdb.DBTYPE_GENERIC)
    appenddbtoindex(str(tmp_path / "extra"), str(tmp_path / "idx"),
                    keys=[5])
    manifest = json.load(open(tmp_path / "idx.appended.json"))
    assert manifest["5"] == str(tmp_path / "idx.appended.5")
    assert_db_equal(tmp_path / "idx.appended.5", tmp_path / "extra")
