"""Cascaded clustering workflow byte parity vs the reference.

Goldens (tests/golden/clusterwf, tools/make_cluster_goldens.sh):
reference `cluster` at the defaults (seqId 0 -> sens 6, 3 cascade steps;
every pref/aln/clu intermediate), at --min-seq-id 0.9 (single step,
comp-bias off automagic), plus `easy-cluster` and `easy-linclust`
3-file outputs, on the 24-seq queries_lin + proteins fixture.

Reference: lib/mmseqs/src/workflow/{Cluster,EasyCluster,Linclust}.cpp,
data/workflow/{cascaded_clustering,easycluster,linclust}.sh.
"""

import pathlib

import pytest

from metaeuk_tpu.pipeline.clusterwf import cluster_workflow, easy_cluster

GOLDEN = pathlib.Path(__file__).parent / "golden" / "clusterwf"
INPUT_FAA = GOLDEN / "clusterwf_input.faa"


def assert_db_equal(mine, golden):
    for s in ("", ".index", ".dbtype"):
        a = pathlib.Path(f"{mine}{s}").read_bytes()
        b = pathlib.Path(f"{golden}{s}").read_bytes()
        assert a == b, f"{mine}{s} != {golden}{s}"


@pytest.fixture(scope="module")
def seq_db(tmp_path_factory):
    td = tmp_path_factory.mktemp("clusterwf")
    from metaeuk_tpu.cli import main
    assert main(["createdb", str(INPUT_FAA), str(td / "qdb")]) == 0
    return td / "qdb"


def test_cluster_default_cascade(seq_db, tmp_path):
    out = tmp_path / "clu"
    cluster_workflow(str(seq_db), str(out), str(tmp_path / "ctmp"))
    for step in range(3):
        for f in (f"pref_step{step}", f"aln_step{step}", f"clu_step{step}"):
            assert_db_equal(tmp_path / "ctmp" / f, GOLDEN / f)
    assert_db_equal(tmp_path / "ctmp" / "clu_redundancy",
                    GOLDEN / "clu_redundancy")
    assert_db_equal(out, GOLDEN / "clu")


def test_cluster_high_seqid_single_step(seq_db, tmp_path):
    out = tmp_path / "clu90"
    cluster_workflow(str(seq_db), str(out), str(tmp_path / "ctmp"),
                     min_seq_id=0.9)
    assert_db_equal(out, GOLDEN / "clu90")


def test_easy_cluster(tmp_path):
    prefix = str(tmp_path / "ec")
    easy_cluster(str(INPUT_FAA), prefix, str(tmp_path / "ectmp"))
    for f in ("_cluster.tsv", "_rep_seq.fasta", "_all_seqs.fasta"):
        assert pathlib.Path(f"{prefix}{f}").read_bytes() == \
            (GOLDEN / f"easycluster{f}").read_bytes(), f"easycluster{f}"


def test_easy_linclust(tmp_path):
    prefix = str(tmp_path / "el")
    easy_cluster(str(INPUT_FAA), prefix, str(tmp_path / "eltmp"),
                 use_linclust=True)
    for f in ("_cluster.tsv", "_rep_seq.fasta", "_all_seqs.fasta"):
        assert pathlib.Path(f"{prefix}{f}").read_bytes() == \
            (GOLDEN / f"easylinclust{f}").read_bytes(), f"easylinclust{f}"
