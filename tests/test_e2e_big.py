"""Large-scale e2e byte parity: one 100kb contig with 8 multi-exon genes
at deep positions (>65536, exercising u16 diagonal wraps in the prefilter
and long-range coordinates end to end).

Golden: reference easy-predict with default flags on the committed
fixture (tests/golden/big)."""

import pathlib

import pytest

from metaeuk_tpu.params import Params
from metaeuk_tpu.pipeline.predict import EasyPredict

BIG = pathlib.Path(__file__).parent / "golden" / "big"


@pytest.fixture(scope="module")
def outputs(tmp_path_factory):
    out = tmp_path_factory.mktemp("big") / "preds"
    EasyPredict(Params()).run(BIG / "contigs.fna", BIG / "prots.faa",
                              str(out))
    return out


@pytest.mark.parametrize("suffix", ["fas", "codon.fas", "headersMap.tsv",
                                    "gff"])
def test_big_contig_byte_parity(outputs, suffix):
    assert pathlib.Path(f"{outputs}.{suffix}").read_bytes() \
        == (BIG / f"ref.{suffix}").read_bytes()
