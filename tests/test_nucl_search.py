"""Nucleotide search (blastn path) byte parity vs the reference binary.

Covers the full `search --search-type 3` workflow (extractframes ->
splitsequence -> nucl k-mer prefilter -> banded ksw2 alignment ->
offsetalignment) and its stages on the committed fixtures. Goldens from
tools/make_nucl_goldens.sh + tools/make_offsetaln_goldens.sh.
"""

import pathlib
import subprocess
import sys

import numpy as np
import pytest

from metaeuk_tpu.search.nucl_align import align_module_nucl
from metaeuk_tpu.search.nucl_search import nucl_search_workflow
from metaeuk_tpu.search.prefilter_nucl import prefilter_nucl_db

HERE = pathlib.Path(__file__).parent
U = HERE / "golden" / "utils"
DATA = HERE / "data"


def _eq(out, ref, suffixes=("", ".index", ".dbtype")):
    for s in suffixes:
        assert pathlib.Path(f"{out}{s}").read_bytes() \
            == pathlib.Path(f"{ref}{s}").read_bytes(), f"{ref}{s}"


@pytest.fixture(scope="module")
def cdb(tmp_path_factory):
    td = tmp_path_factory.mktemp("nucl")
    subprocess.run([sys.executable, "-m", "metaeuk_tpu.cli", "createdb",
                    str(DATA / "contigs.fna"), str(td / "cdb")],
                   check=True, capture_output=True)
    return str(td / "cdb")


def test_prefilter_k15(tmp_path):
    prefilter_nucl_db(str(U / "nucl_qs"), str(U / "nucl_ts"),
                      str(tmp_path / "p"), kmer_size=15)
    _eq(tmp_path / "p", U / "nucl_pref15")


def test_prefilter_k6_auto(tmp_path):
    prefilter_nucl_db(str(U / "nucl_qs"), str(U / "nucl_ts"),
                      str(tmp_path / "p"), kmer_size=6)
    _eq(tmp_path / "p", U / "nucl_pref")


def test_align_module(tmp_path):
    align_module_nucl(str(U / "nucl_qs"), str(U / "nucl_ts"),
                      str(U / "nucl_pref"), str(tmp_path / "a"),
                      evalue=0.001, add_backtrace=True)
    _eq(tmp_path / "a", U / "nucl_aln")


def test_ksw2_vs_numpy_oracle():
    """Spot-check the native ksw2 replica against a plain banded
    extension DP on small pairs."""
    from metaeuk_tpu.search.nucl_align import _ksw

    rng = np.random.default_rng(5)
    for _ in range(20):
        ql, tl = rng.integers(10, 80, 2)
        q = rng.integers(0, 4, ql).astype(np.uint8)
        t = q[:tl].copy() if tl <= ql else np.concatenate(
            [q, rng.integers(0, 4, tl - ql).astype(np.uint8)])
        mut = rng.integers(0, tl, max(1, tl // 10))
        t[mut] = (t[mut] + 1) % 4
        ez = _ksw(q, t, score_only=False)
        # oracle: full extension DP from (0,0), gap 5/2, global band
        NEG = -10 ** 6
        H = np.full((ql + 1, tl + 1), NEG)
        E = np.full((ql + 1, tl + 1), NEG)
        F = np.full((ql + 1, tl + 1), NEG)
        H[0, 0] = 0
        for i in range(ql + 1):
            for j in range(tl + 1):
                if i == 0 and j == 0:
                    continue
                if i > 0:
                    F[i, j] = max(H[i - 1, j] - 7, F[i - 1, j] - 2)
                if j > 0:
                    E[i, j] = max(H[i, j - 1] - 7, E[i, j - 1] - 2)
                m = NEG
                if i > 0 and j > 0:
                    m = H[i - 1, j - 1] + (2 if q[i - 1] == t[j - 1] else -3)
                H[i, j] = max(m, E[i, j], F[i, j])
        best = int(H[1:, 1:].max())
        assert ez["max"] == best, (ez, best)


def test_workflow_e2e(tmp_path, cdb):
    nucl_search_workflow(cdb, cdb, str(tmp_path / "out"),
                         str(tmp_path / "tmp"), add_backtrace=True,
                         max_seq_len=700)
    _eq(tmp_path / "out", U / "nucl_search_out")


def test_splitsequence_passthrough(tmp_path, cdb):
    """No sequence exceeds max-seq-len -> whole DB passed through
    (splitsequence.cpp:36-41)."""
    from metaeuk_tpu.pipeline.dbtools import splitsequence
    splitsequence(cdb, str(tmp_path / "s"), max_seq_len=10000)
    _eq(tmp_path / "s", cdb)
