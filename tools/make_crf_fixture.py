"""Generate a small deterministic CRF context library fixture.

The reference bakes its 4000-state context library (K4000.crf) into the
binary at build time (lib/mmseqs/src/commons/CSProfile.cpp:5-12); that
blob is not available in this environment (a missing LFS object), so we
craft a small but structurally identical library in the serialization
format ContextLibrary::read expects (CSProfile.cpp:29-160 +
LibraryReader.cpp):

    CRF
    SIZE <K>
    LENG <wlen>
    CrfState
    NAME <name>
    BIAS <float>
    LENG <wlen>
    ALPH 20
    <alphabet header line, skipped by the parser>
    <1-based pos> <20 ints, /1000 scale, HH aa order>
    ...
    PC <20 ints, /1000 scale, HH aa order>
    //

The same file is (a) baked into the rebuilt reference binary as
K4000.crf and (b) loaded by metaeuk_tpu's sequence2profile, so parity
tests compare the two implementations of the *algorithm* on identical
model data.
"""

import pathlib

import numpy as np

HH_ALPHABET = list("ACDEFGHIKLMNPQRSTVWY")
K = 8       # states
WLEN = 13   # context window (matches the real K4000.crf)


def make_crf(path, k=K, wlen=WLEN, seed=1234):
    rng = np.random.RandomState(seed)
    out = ["CRF", f"SIZE\t{k}", f"LENG\t{wlen}"]
    for s in range(k):
        out.append("CrfState")
        out.append(f"NAME\tK{s:04d}")
        bias = rng.uniform(-2.0, 2.0)
        out.append(f"BIAS\t{bias:.4f}")
        out.append(f"LENG\t{wlen}")
        out.append("ALPH\t20")
        out.append("\t".join([""] + HH_ALPHABET))
        # integer weights at kScale=1000 (ProfileStates.h:13)
        w = rng.randint(-2500, 2501, size=(wlen, 20))
        for i in range(wlen):
            out.append("\t".join([str(i + 1)] + [str(v) for v in w[i]]))
        pc = rng.randint(-1500, 1501, size=20)
        out.append("\t".join(["PC"] + [str(v) for v in pc]))
        out.append("//")
    pathlib.Path(path).write_text("\n".join(out) + "\n")


if __name__ == "__main__":
    here = pathlib.Path(__file__).resolve().parent.parent
    target = here / "tests" / "data" / "tiny.crf"
    make_crf(target)
    print(f"wrote {target}")
