"""Util batch 8 byte parity vs the reference.

Goldens (tests/golden/util8, tools/make_util8_goldens.sh):
pickconsensusrep (recomputed cluster alignments, --allow-deletion MSA,
msa2profile --match-mode 1 --filter-msa, profile-vs-member scoring, the
uninitialized-awk-prev quirk that drops a leading cluster key 0),
clusterupdate (newmapdb + updated clustering), nrtotaxmapping (NR
headers, accession2taxid lookup, bracketed species fallback, LCA).
"""

import pathlib
import shutil

import pytest

GOLDEN = pathlib.Path(__file__).parent / "golden" / "util8"
DATA = pathlib.Path(__file__).parent / "data"


def assert_db_equal(mine, golden, sufs=("", ".index", ".dbtype")):
    for s in sufs:
        a = pathlib.Path(f"{mine}{s}").read_bytes()
        b = pathlib.Path(f"{golden}{s}").read_bytes()
        assert a == b, f"{mine}{s} != {golden}{s}"


@pytest.fixture(scope="module")
def alldb(tmp_path_factory):
    td = tmp_path_factory.mktemp("util8")
    from metaeuk_tpu.cli import main
    with open(td / "all.faa", "wb") as f:
        f.write((DATA / "queries_lin.faa").read_bytes() +
                (DATA / "proteins.faa").read_bytes())
    assert main(["createdb", str(td / "all.faa"), str(td / "alldb")]) == 0
    return td / "alldb"


def test_pickconsensusrep(alldb, tmp_path):
    from metaeuk_tpu.pipeline.clusterwf import pickconsensusrep
    for s in ("", ".index", ".dbtype"):
        shutil.copyfile(GOLDEN / f"clu{s}", tmp_path / f"clu{s}")
    pickconsensusrep(str(alldb), str(tmp_path / "clu"),
                     str(tmp_path / "consrep"), str(tmp_path / "pcrtmp"))
    assert_db_equal(tmp_path / "consrep", GOLDEN / "consrep")


def test_clusterupdate(alldb, tmp_path):
    from metaeuk_tpu.cli import main
    from metaeuk_tpu.pipeline.clusterwf import clusterupdate
    assert main(["createdb", str(DATA / "queries_lin.faa"),
                 str(tmp_path / "olddb")]) == 0
    for s in ("", ".index", ".dbtype"):
        shutil.copyfile(GOLDEN / f"oldclu{s}", tmp_path / f"oldclu{s}")
    clusterupdate(str(tmp_path / "olddb"), str(alldb),
                  str(tmp_path / "oldclu"), str(tmp_path / "newmapdb"),
                  str(tmp_path / "newclu"), str(tmp_path / "cutmp"))
    assert_db_equal(tmp_path / "newmapdb", GOLDEN / "newmapdb")
    assert_db_equal(tmp_path / "newclu", GOLDEN / "newclu")


def test_nrtotaxmapping(tmp_path):
    from metaeuk_tpu.tax.mmtax import createbintaxonomy, nrtotaxmapping
    for s in ("", ".index", ".dbtype"):
        shutil.copyfile(GOLDEN / f"nrdb_h{s}", tmp_path / f"nrdb_h{s}")
    createbintaxonomy(GOLDEN / "taxdump8" / "names.dmp",
                      GOLDEN / "taxdump8" / "nodes.dmp",
                      GOLDEN / "taxdump8" / "merged.dmp",
                      tmp_path / "nrdb_taxonomy")
    nrtotaxmapping(str(GOLDEN / "acc2taxid.tsv"), str(tmp_path / "nrdb"),
                   str(tmp_path / "nrmap"))
    assert (tmp_path / "nrmap").read_text() == \
        (GOLDEN / "nrmap").read_text()


GOLDEN9 = pathlib.Path(__file__).parent / "golden" / "util9"


def test_tsv2exprofiledb(tmp_path):
    """Compressed DBs: dbtype + decompressed content parity (zstd frame
    bytes differ across library versions, as in test_dbtools4)."""
    from metaeuk_tpu.io import mmseqsdb
    from metaeuk_tpu.pipeline.dbtools7 import tsv2exprofiledb
    for f in ("ex.tsv", "ex_h.tsv", "ex_seq.tsv", "ex_aln.tsv"):
        shutil.copyfile(GOLDEN9 / f, tmp_path / f)
    tsv2exprofiledb(str(tmp_path / "ex"), str(tmp_path / "exdb"))
    for f in ("exdb", "exdb_seq", "exdb_aln"):
        assert (tmp_path / f"{f}.dbtype").read_bytes() == \
            (GOLDEN9 / f"{f}.dbtype").read_bytes()
        assert mmseqsdb.read_db(str(tmp_path / f)) == \
            mmseqsdb.read_db(str(GOLDEN9 / f)), f
    assert_db_equal(tmp_path / "exdb_seq_h", GOLDEN9 / "exdb_seq_h")


def test_createclusearchdb(alldb, tmp_path):
    from metaeuk_tpu.pipeline.dbtools7 import createclusearchdb
    for s in ("", ".index", ".dbtype"):
        shutil.copyfile(GOLDEN9 / f"clu{s}", tmp_path / f"clu{s}")
    createclusearchdb(str(alldb), str(tmp_path / "clu"),
                      str(tmp_path / "cludb"))
    assert_db_equal(tmp_path / "cludb", GOLDEN9 / "cludb")
    assert_db_equal(tmp_path / "cludb_clu", GOLDEN9 / "cludb_clu")
    for f in ("cludb_seq.1", "cludb_seq.index", "cludb_seq.dbtype",
              "cludb_seq_h.1", "cludb_seq_h.index"):
        assert (tmp_path / f).read_bytes() == (GOLDEN9 / f).read_bytes(), f


def test_transitivealign(alldb, tmp_path):
    from metaeuk_tpu.pipeline.dbtools7 import transitivealign
    for s in ("", ".index", ".dbtype"):
        shutil.copyfile(GOLDEN9 / f"selfaln_all{s}",
                        tmp_path / f"selfaln_all{s}")
    transitivealign(str(alldb), str(tmp_path / "selfaln_all"),
                    str(tmp_path / "transaln"))
    assert_db_equal(tmp_path / "transaln", GOLDEN9 / "transaln")


def test_msa2result(tmp_path):
    from metaeuk_tpu.pipeline.dbtools6 import convertmsa
    from metaeuk_tpu.pipeline.dbtools7 import msa2result
    convertmsa(str(pathlib.Path(__file__).parent / "golden" / "util6" /
                   "test.sto"), str(tmp_path / "msadb"))
    msa2result(str(tmp_path / "msadb"), str(tmp_path / "m2r_seq"),
               str(tmp_path / "m2r_prof"))
    assert_db_equal(tmp_path / "m2r_seq", GOLDEN9 / "m2r_seq",
                    sufs=("", ".index", ".dbtype",
                          "_h", "_h.index", "_h.dbtype"))
    assert_db_equal(tmp_path / "m2r_prof", GOLDEN9 / "m2r_prof")
