"""multihit aggregation byte parity vs the reference binary.

Goldens: reference `besthitperset` (default/simple + --simple-best-hit 0)
and `combinepvalperset --aggregation-mode 0..3` on a synthetic 3-set
fixture (tests/golden/multihit)."""

import pathlib

import pytest

from metaeuk_tpu.pipeline.multihit import besthitperset, combinepvalperset

G = pathlib.Path(__file__).parent / "golden" / "multihit"


def test_besthitperset_default_simple(tmp_path):
    out = tmp_path / "bh"
    besthitperset(str(G / "mh_res"), str(G / "mh_tmap_member_to_set"),
                  str(G / "mh_tmap_set_size"), str(out))
    assert out.read_bytes() == (G / "refbh").read_bytes()


def test_besthitperset_nonsimple(tmp_path):
    out = tmp_path / "bhns"
    besthitperset(str(G / "mh_res"), str(G / "mh_tmap_member_to_set"),
                  str(G / "mh_tmap_set_size"), str(out),
                  simple_best_hit=False)
    assert out.read_bytes() == (G / "refbh_ns").read_bytes()


@pytest.mark.parametrize("mode", [0, 1, 2, 3])
def test_combinepvalperset(tmp_path, mode):
    out = tmp_path / f"cp{mode}"
    combinepvalperset(str(G / "mh_logp"), str(G / "mh_qsize_set_size"),
                      str(G / "mh_tmap_member_to_set"),
                      str(G / "mh_tmap_set_size"), str(out),
                      aggregation_mode=mode)
    assert out.read_bytes() == (G / f"refcp_m{mode}").read_bytes()
