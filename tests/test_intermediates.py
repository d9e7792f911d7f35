"""Stage-boundary byte parity against the reference's internal DBs.

Goldens: metaeuk predictexons --threads 1, default prefilter (dp_preds)
and metaeuk reduceredundancy (red_preds + red_clust) on the fixture.
"""

import pathlib

import pytest

from metaeuk_tpu.io.mmseqsdb import read_db
from metaeuk_tpu.io.seqdb import SeqDB, DBTYPE_AA, DBTYPE_NUCL
from metaeuk_tpu.params import Params
from metaeuk_tpu.pipeline.dpformat import cluster_rows_payload, predictions_payload
from metaeuk_tpu.pipeline.predict import EasyPredict
from metaeuk_tpu.pipeline.reduce import reduce_redundancy

DATA = pathlib.Path(__file__).parent / "data"
DBS = pathlib.Path(__file__).parent / "golden" / "dbs"


@pytest.fixture(scope="module")
def preds_per_contig():
    contigs = SeqDB.from_fasta(DATA / "contigs.fna", DBTYPE_NUCL)
    targets = SeqDB.from_fasta(DATA / "proteins.faa", DBTYPE_AA)
    return EasyPredict(Params()).predict_exons(contigs, targets), len(contigs)


def test_dp_predictions_parity(preds_per_contig):
    preds, n = preds_per_contig
    ref = dict(read_db(DBS / "dp_preds"))
    for ci in range(n):
        assert predictions_payload(preds.get(ci, [])) == ref.get(ci, b""), ci


def test_reduceredundancy_parity(preds_per_contig):
    preds, n = preds_per_contig
    ref_red = dict(read_db(DBS / "red_preds"))
    ref_clu = dict(read_db(DBS / "red_clust"))
    for ci in range(n):
        reps, rows = reduce_redundancy(list(preds.get(ci, [])), 0)
        assert predictions_payload(reps) == ref_red.get(ci, b""), ci
        assert cluster_rows_payload(rows) == ref_clu.get(ci, b""), ci
