"""msa2profile byte parity vs the reference binary.

Goldens: reference `msa2profile --match-mode 1 [--filter-msa 0]` on a
single-sequence MSA DB and a gapped multi-sequence MSA DB.
"""

import pathlib

import pytest

from metaeuk_tpu.io.mmseqsdb import read_db
from metaeuk_tpu.pipeline.msa2profile import msa_db_to_profile_db

MSA = pathlib.Path(__file__).parent / "golden" / "msa"


@pytest.mark.parametrize("src,ref", [("msadb", "refprof1"), ("msadb2", "refprof2")])
def test_msa2profile_byte_parity(tmp_path, src, ref):
    entries = [(k, v.decode()) for k, v in read_db(MSA / src)]
    out = tmp_path / "prof"
    msa_db_to_profile_db(entries, str(out), match_mode=1)
    mine = read_db(out)
    golden = read_db(MSA / ref)
    assert len(mine) == len(golden)
    for (ka, va), (kb, vb) in zip(mine, golden):
        assert ka == kb and va == vb


def test_msa2profile_roundtrip_consumable(tmp_path):
    """Generated profiles must be readable by the profile search path."""
    from metaeuk_tpu.io.profiledb import ProfileDB
    entries = [(k, v.decode()) for k, v in read_db(MSA / "msadb2")]
    out = tmp_path / "prof"
    msa_db_to_profile_db(entries, str(out), match_mode=1)
    db = ProfileDB.from_db(str(out))
    assert len(db) == 2
    assert db.pssms[0].shape[1] == 21


def test_msa2profile_filter_msa_byte_parity(tmp_path):
    """--filter-msa 1 (MsaFilter) vs reference goldens, default + strict."""
    entries = [(k, v.decode()) for k, v in read_db(MSA / "msadb2")]
    out = tmp_path / "prof_f1"
    msa_db_to_profile_db(entries, str(out), match_mode=1, filter_msa=True)
    for (ka, va), (kb, vb) in zip(read_db(out), read_db(MSA / "refprof2_f1")):
        assert ka == kb and va == vb
    out2 = tmp_path / "prof_f1s"
    msa_db_to_profile_db(entries, str(out2), match_mode=1, filter_msa=True,
                         filter_max_seq_id=0.5, ndiff=2)
    for (ka, va), (kb, vb) in zip(read_db(out2),
                                  read_db(MSA / "refprof2_f1s")):
        assert ka == kb and va == vb


def test_msa2profile_pcmode1_byte_parity(tmp_path):
    """--pseudo-cnt-mode 1: CRF context-specific pseudocounts (golden
    from the reference rebuild with tests/data/tiny.crf as K4000.crf);
    exercises the multi-sequence profile-type CS path (Neff > 1 and the
    SSE build's 16-aa context-score quirk)."""
    import pathlib
    crf = pathlib.Path(__file__).parent / "data" / "tiny.crf"
    entries = [(k, v.decode()) for k, v in read_db(MSA / "msadb2")]
    out = tmp_path / "prof"
    msa_db_to_profile_db(entries, str(out), match_mode=1, pcmode=1,
                         context_lib=str(crf))
    for s in ("", ".index", ".dbtype"):
        a = pathlib.Path(f"{out}{s}").read_bytes()
        b = pathlib.Path(f"{MSA}/refprof2_pc1{s}").read_bytes()
        assert a == b, f"refprof2_pc1{s}"
