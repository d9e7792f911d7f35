"""Byte-parity for easy-predict parameter variants.

Goldens produced by the reference binary with default flags (threads 1,
shuffle 0) — default prefilter (spaced-6-mer, sens 4) on both sides.
"""

import pathlib

import pytest

from metaeuk_tpu.params import Params
from metaeuk_tpu.pipeline.predict import EasyPredict

DATA = pathlib.Path(__file__).parent / "data"
GOLDEN = pathlib.Path(__file__).parent / "golden"

VARIANTS = {
    "fragcoords": dict(write_frag_coords=True),
    "scanstart": dict(len_scan_for_start=45),
    "targetkey": dict(write_target_key=True),
    "maxsets2": dict(max_exon_sets=2),
    "overlap1": dict(overlap_allowed=1),
    "revfrags": dict(reverse_fragments=True),
    "table4": dict(translation_table=4),
}


@pytest.mark.parametrize("name", sorted(VARIANTS))
def test_variant_byte_parity(name, tmp_path):
    out = tmp_path / "preds"
    EasyPredict(Params(**VARIANTS[name])).run(
        DATA / "contigs.fna", DATA / "proteins.faa", str(out))
    for suffix in ("fas", "codon.fas", "headersMap.tsv", "gff"):
        mine = pathlib.Path(f"{out}.{suffix}").read_bytes()
        golden = (GOLDEN / f"{name}.{suffix}").read_bytes()
        assert mine == golden, f"{name}.{suffix}"
