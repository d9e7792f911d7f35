import numpy as np

from metaeuk_tpu.io.seqdb import SeqDB, DBTYPE_AA
from metaeuk_tpu.params import Params
from metaeuk_tpu.pipeline.cluster import cluster_db, set_cover_cluster


def test_set_cover_basics():
    # star around 0 plus isolated pair (3,4)
    edges = np.array([[0, 1], [0, 2], [3, 4]])
    assigned = set_cover_cluster(5, edges)
    assert assigned[0] == assigned[1] == assigned[2] == 0
    assert assigned[3] == assigned[4] == 3


def test_set_cover_singletons():
    assigned = set_cover_cluster(3, np.zeros((0, 2), np.int64))
    assert list(assigned) == [0, 1, 2]


def test_cluster_db_groups_homologs():
    fam_a = b"MKTAYIAKQRQISFVKSHFSRQLEERLGLIEVQAPILSRVGDGTQDNLSG"
    fam_b = b"GCWPNEDTHYFRAMVLDSWQIKNPTTVGGYECLRHSMDAFKVPGLIWEQN"
    seqs = [fam_a, fam_a[:-1] + b"R", fam_b, fam_b[:-1] + b"D"]
    db = SeqDB.from_sequences(seqs, headers=["a1", "a2", "b1", "b2"])
    clusters = cluster_db(Params(), db)
    assert len(clusters) == 2
    sets = sorted(tuple(sorted(v)) for v in clusters.values())
    assert sets == [(0, 1), (2, 3)]
