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
