"""rescorediagonal byte parity vs the reference binary.

Goldens: reference `rescorediagonal pfQ pfT pfres_s4 <out>` with
--rescore-mode 0/1/2, -a 1, and -e 100 on the prefilter fixture."""

import pathlib

import pytest

from metaeuk_tpu.pipeline.rescorediagonal import rescorediagonal

G = pathlib.Path(__file__).parent / "golden" / "pref"


@pytest.mark.parametrize("tag,kw", [
    ("m0", dict(rescore_mode=0)),
    ("m1", dict(rescore_mode=1)),
    ("m2", dict(rescore_mode=2)),
    ("m2a", dict(rescore_mode=2, add_backtrace=True)),
    ("m2e", dict(rescore_mode=2, eval_thr=100.0)),
])
def test_rescorediagonal_byte_parity(tmp_path, tag, kw):
    out = tmp_path / tag
    rescorediagonal(str(G / "pfQ"), str(G / "pfT"), str(G / "pfres_s4"),
                    str(out), **kw)
    assert out.read_bytes() == (G / f"refrd_{tag}").read_bytes()
    assert (tmp_path / f"{tag}.index").read_bytes() \
        == (G / f"refrd_{tag}.index").read_bytes()
