"""sequence2profile byte parity vs the reference.

Goldens (tests/golden/util9/s2p*, tools/make_s2p_goldens.sh) come from a
reference rebuild with the synthetic CRF library (tests/data/tiny.crf,
tools/make_crf_fixture.py) baked in as K4000.crf — the reference's real
4000-state model is a missing LFS blob upstream, so both sides run the
identical algorithm on identical model data.
"""

import pathlib

import numpy as np
import pytest

GOLDEN = pathlib.Path(__file__).parent / "golden" / "util9"
DATA = pathlib.Path(__file__).parent / "data"


def assert_db_equal(mine, golden, sufs=("", ".index", ".dbtype")):
    for s in sufs:
        a = pathlib.Path(f"{mine}{s}").read_bytes()
        b = pathlib.Path(f"{golden}{s}").read_bytes()
        assert a == b, f"{mine}{s} != {golden}{s}"


@pytest.fixture(scope="module")
def qdb(tmp_path_factory):
    td = tmp_path_factory.mktemp("s2p")
    from metaeuk_tpu.cli import main
    assert main(["createdb", str(DATA / "proteins.faa"),
                 str(td / "qdb")]) == 0
    return td / "qdb"


def test_sequence2profile_default(qdb, tmp_path):
    from metaeuk_tpu.cli import main
    assert main(["sequence2profile", str(qdb), str(tmp_path / "o"),
                 "--context-lib", str(DATA / "tiny.crf")]) == 0
    assert_db_equal(tmp_path / "o", GOLDEN / "s2p")


def test_sequence2profile_tau(qdb, tmp_path):
    from metaeuk_tpu.pipeline.sequence2profile import sequence2profile
    sequence2profile(str(qdb), str(tmp_path / "o"),
                     str(DATA / "tiny.crf"), tau=0.35)
    assert_db_equal(tmp_path / "o", GOLDEN / "s2p_tau")


def test_context_library_roundtrip():
    """Parsed pc vectors are normalized probability distributions and the
    X column of every context window is zero (ContextLibrary::read)."""
    from metaeuk_tpu.ops.csprofile import ContextLibrary
    lib = ContextLibrary.from_file(str(DATA / "tiny.crf"))
    assert lib.size == 8 and lib.wlen == 13 and lib.center == 6
    np.testing.assert_allclose(lib.pc.sum(axis=1), 1.0, rtol=1e-5)
    assert (lib.context_weights[:, :, 20] == 0).all()
