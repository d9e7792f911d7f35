"""End-to-end parity: easy-predict outputs must be byte-identical to the
reference MetaEuk binary's outputs on the committed fixture.

Goldens in tests/golden/ were produced by the reference binary
(soedinglab/metaeuk, built from /root/reference) with:
  metaeuk createdb contigs.fna contigsDB --shuffle 0
  metaeuk createdb proteins.faa targetsDB --shuffle 0
  metaeuk easy-predict contigsDB targetsDB out tmp --threads 1
"""

import pathlib

import pytest

from metaeuk_tpu.params import Params
from metaeuk_tpu.pipeline.predict import EasyPredict

DATA = pathlib.Path(__file__).parent / "data"
GOLDEN = pathlib.Path(__file__).parent / "golden"


@pytest.fixture(scope="module")
def outputs(tmp_path_factory):
    out = tmp_path_factory.mktemp("e2e") / "preds"
    EasyPredict(Params()).run(DATA / "contigs.fna", DATA / "proteins.faa", str(out))
    return out


@pytest.mark.parametrize("suffix", ["fas", "codon.fas", "headersMap.tsv", "gff"])
def test_easypredict_byte_parity(outputs, suffix):
    mine = pathlib.Path(f"{outputs}.{suffix}").read_bytes()
    golden = (GOLDEN / f"easypredict.{suffix}").read_bytes()
    assert mine == golden


def test_easypredict_fine_tiers_parity(tmp_path, monkeypatch):
    """The x2 length-tier policy (metagenome-scale default) must be
    output-invariant — padding is fully masked in the kernels."""
    import metaeuk_tpu.search.driver as drv
    monkeypatch.setattr(drv, "FINE_TIER_MIN_FRAGS", 1)
    out = tmp_path / "preds"
    EasyPredict(Params()).run(DATA / "contigs.fna", DATA / "proteins.faa",
                              str(out))
    for suffix in ("fas", "codon.fas", "headersMap.tsv", "gff"):
        assert pathlib.Path(f"{out}.{suffix}").read_bytes() \
            == (GOLDEN / f"easypredict.{suffix}").read_bytes(), suffix


def test_easypredict_pipelined_batches_parity(tmp_path, monkeypatch,
                                              capfd):
    """The prefilter/align pipeline (host k-mer matching of batch k+1
    overlapped with device alignment of batch k) must be byte-identical
    to the single-pass run."""
    monkeypatch.setenv("METAEUK_PIPELINE_BATCHES", "3")
    out = tmp_path / "preds"
    EasyPredict(Params()).run(DATA / "contigs.fna", DATA / "proteins.faa",
                              str(out))
    assert "pipelined batches" in capfd.readouterr().err
    for suffix in ("fas", "codon.fas", "headersMap.tsv", "gff"):
        assert pathlib.Path(f"{out}.{suffix}").read_bytes() \
            == (GOLDEN / f"easypredict.{suffix}").read_bytes(), suffix
