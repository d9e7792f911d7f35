import numpy as np

from metaeuk_tpu.data.submat import encode_aa
from metaeuk_tpu.ops.masker import _repeat_probs_py, mask_sequence, repeat_probs


def test_repeat_probs_native_matches_python():
    seq = (b"MKTAYIAKQRQISFVKSHFSRQLEERLGLIEV" + b"A" * 25 +
           b"GCGCGCGCGCGCGCGC" + b"HSLAKWKRQTLGQHDF")
    enc = encode_aa(seq)
    nat = repeat_probs(enc)
    py = _repeat_probs_py(np.asarray(enc))
    assert np.allclose(nat, py, atol=1e-6)


def test_mask_sequence_masks_repeats_not_complex():
    seq = b"MKTAYIAKQRQISFVKSHFSRQLEERLGLIEV" + b"A" * 30 + \
          b"HSLAKWKRQTLGQHDFSAGEGLYTHMKALRPD"
    enc = encode_aa(seq)
    masked, n = mask_sequence(enc)
    # poly-A run masked
    assert n >= 20
    # complex prefix untouched
    assert (masked[:30] == np.asarray(enc)[:30]).all()


def test_mask_empty():
    masked, n = mask_sequence(encode_aa(b""))
    assert n == 0 and len(masked) == 0
