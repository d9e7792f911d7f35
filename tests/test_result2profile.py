"""result2profile byte parity vs the reference binary.

Goldens: reference `result2profile targetsDB targetsDB btres <out>
--filter-msa 0 --threads 1` on the fixture-protein self-search alignment DB
(tests/golden/aln/search_a), in five flag configurations:
default, --mask-profile 0, --comp-bias-corr 0, `-e 10 --e-profile 10`, and
`-e 10 --e-profile 10 --comp-bias-corr 0` (the reference clamps evalProfile
down to evalThr, so raising the profile threshold needs both flags).
"""

import pathlib
import shutil

import pytest

from metaeuk_tpu.io.mmseqsdb import write_seqdb
from metaeuk_tpu.io.seqdb import SeqDB, DBTYPE_AA
from metaeuk_tpu.pipeline.result2profile import result2profile_db

DATA = pathlib.Path(__file__).parent / "data"
GOLDEN = pathlib.Path(__file__).parent / "golden" / "r2p"
ALN = pathlib.Path(__file__).parent / "golden" / "aln" / "search_a"


@pytest.fixture(scope="module")
def dbs(tmp_path_factory):
    td = tmp_path_factory.mktemp("r2p")
    targets = SeqDB.from_fasta(DATA / "proteins.faa", DBTYPE_AA)
    write_seqdb(str(td / "targetsDB"), targets, DBTYPE_AA)
    for suf in ("", ".index", ".dbtype"):
        shutil.copy(f"{ALN}{suf}", td / f"aln{suf}")
    return td


@pytest.mark.parametrize("tag,kwargs", [
    ("refr2p", {}),
    ("refr2p_nm", dict(mask_profile=False)),
    ("refr2p_nb", dict(comp_bias_correction=False)),
    ("refr2p_ep", dict(eval_profile=10.0)),
    ("refr2p_ep_nb2", dict(eval_profile=10.0, comp_bias_correction=False)),
    # MsaFilter variants (--filter-msa 1 is the reference default)
    ("refr2p_f1", dict(filter_msa=1)),
    ("refr2p_f1_ep", dict(filter_msa=1, eval_profile=10.0)),
    ("refr2p_f1s", dict(filter_msa=1, eval_profile=10.0,
                        filter_max_seq_id=0.3, ndiff=2, qsc=0.5)),
    ("refr2p_f1q", dict(filter_msa=1, eval_profile=10.0, qid="0.25",
                        cov_msa_thr=0.3)),
    # multi-bucket qid exercises the reference's Ndiff carry-over quirk
    ("refr2p_f1b", dict(filter_msa=1, eval_profile=10.0, qid="0.1,0.3,0.9")),
    # --wg 1 global sequence weighting (PSSMCalculator.cpp:161-168
    # computeMatchWeights + computeNeff_M branch)
    ("refr2p_wg", dict(wg=True)),
    # context-specific pseudocounts (--pseudo-cnt-mode 1; goldens from the
    # reference rebuild with tests/data/tiny.crf baked in as K4000.crf)
    ("refr2p_pc1", dict(pcmode=1, context_lib=str(DATA / "tiny.crf"))),
    ("refr2p_pc1_ep", dict(eval_profile=10.0, pcmode=1,
                           context_lib=str(DATA / "tiny.crf"))),
])
def test_result2profile_byte_parity(dbs, tag, kwargs):
    out = dbs / f"out_{tag}"
    result2profile_db(str(dbs / "targetsDB"), str(dbs / "targetsDB"),
                      str(dbs / "aln"), str(out), **kwargs)
    assert out.read_bytes() == (GOLDEN / tag).read_bytes()
    assert (out.with_suffix("").parent / f"out_{tag}.index").read_text() \
        == (GOLDEN / f"{tag}.index").read_text()
    # pcmode 1 must set the context-pseudo-counts extended dbtype bit
    assert pathlib.Path(f"{out}.dbtype").read_bytes() \
        == (GOLDEN / f"{tag}.dbtype").read_bytes()
