"""Profile-target (--exhaustive-search) mode byte parity.

Golden: reference `metaeuk msa2profile` (single-sequence MSAs of the
fixture proteins, --match-mode 1) then `easy-predict contigsDB profileDB
--threads 1`.
"""

import pathlib

import pytest

from metaeuk_tpu.io.profiledb import ProfileDB
from metaeuk_tpu.params import Params
from metaeuk_tpu.pipeline.predict import EasyPredict

DATA = pathlib.Path(__file__).parent / "data"
PROF = pathlib.Path(__file__).parent / "golden" / "profile"


def test_profile_db_reading():
    db = ProfileDB.from_db(PROF / "profileDB")
    assert len(db) == 6
    assert db.accession(0) == "P1"
    assert db.pssms[0].shape[1] == 21
    # X column must be zero (Sequence.cpp:277-280)
    assert (db.pssms[0][:, 20] == 0).all()


@pytest.mark.parametrize("suffix", ["fas", "codon.fas", "headersMap.tsv", "gff"])
def test_profile_easypredict_byte_parity(tmp_path, suffix):
    out = tmp_path / "preds"
    EasyPredict(Params()).run(DATA / "contigs.fna", str(PROF / "profileDB"),
                              str(out))
    mine = pathlib.Path(f"{out}.{suffix}").read_bytes()
    golden = (PROF / f"pp.{suffix}").read_bytes()
    assert mine == golden


def test_sliced_profile_search_budget_invariance():
    """Slice budgeting (searchslicedtargetprofile.sh:46-120 role): 10k
    synthetic profiles searched under a tiny staging budget produce the
    identical hit array as one unbudgeted pass."""
    import numpy as np

    from metaeuk_tpu.params import Params
    from metaeuk_tpu.search import profile_search as ps

    class _PDB:
        def __init__(self, pssms):
            self.pssms = pssms

        def __len__(self):
            return len(self.pssms)

        def total_residues(self):
            return sum(len(p) for p in self.pssms)

    rng = np.random.default_rng(9)
    n_prof = 10_000
    pssms = [rng.integers(-8, 12, (int(rng.integers(12, 40)), 21))
             .astype(np.int32) for _ in range(n_prof)]
    aas = b"ACDEFGHIKLMNPQRSTVWY"
    frags = [bytes(aas[c] for c in rng.integers(0, 20, int(n)))
             for n in rng.integers(20, 60, 2)]
    p = Params()
    p.search_evalue_thr = 1e9

    import os
    old = os.environ.get("METAEUK_SLICE_BUDGET")
    try:
        os.environ["METAEUK_SLICE_BUDGET"] = str(1 << 20)  # ~48 rows/slice
        sliced = ps.ProfileSearchDriver(p, _PDB(pssms)).search(frags)
        os.environ["METAEUK_SLICE_BUDGET"] = str(1 << 34)
        whole = ps.ProfileSearchDriver(p, _PDB(pssms)).search(frags)
    finally:
        if old is None:
            os.environ.pop("METAEUK_SLICE_BUDGET", None)
        else:
            os.environ["METAEUK_SLICE_BUDGET"] = old
    assert len(sliced) and len(sliced) == len(whole)
    for name in sliced.dtype.names:
        np.testing.assert_array_equal(sliced[name], whole[name], name)
