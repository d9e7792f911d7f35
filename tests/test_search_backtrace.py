"""search -a (alignment mode 3) byte parity vs the reference binary.

Golden: reference `search targetsDB targetsDB btres tmp --threads 1
--prefilter-mode 2 -a 1 -e 100 --alignment-mode 3` on the fixture proteins
(self-search: exercises identity hits, gapped backtraces, and the seqId
"1.00" serialization quirk).
"""

import pathlib

import numpy as np

from metaeuk_tpu.io.mmseqsdb import read_db
from metaeuk_tpu.io.seqdb import SeqDB, DBTYPE_AA
from metaeuk_tpu.params import Params
from metaeuk_tpu.pipeline.alnformat import hits_to_aln_db_entries
from metaeuk_tpu.search.driver import SearchDriver

DATA = pathlib.Path(__file__).parent / "data"
GOLDEN = pathlib.Path(__file__).parent / "golden" / "aln"


def test_search_backtrace_byte_parity():
    targets = SeqDB.from_fasta(DATA / "proteins.faa", DBTYPE_AA)
    seqs = [targets.seq_bytes(i) for i in range(len(targets))]
    p = Params(aln_len_thr=0)
    driver = SearchDriver(p, targets)
    hits = driver.search(seqs)
    bts, seq_ids = driver.backtraces(hits, seqs)
    mine = dict(hits_to_aln_db_entries(hits, len(targets), bts, seq_ids))
    golden = dict(read_db(GOLDEN / "search_a"))
    assert set(mine) == set(golden)
    for k in golden:
        assert mine[k] == golden[k], k
