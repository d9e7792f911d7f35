"""Synthesize the PDB70-layout and CDD-layout archives for the
databases-command MSA chains (databases.sh:164-171 PDB70 A3M tar,
:222-229 CDD FASTA_MSA tar).  Deterministic; used by
tools/make_a3m_goldens.sh to generate reference goldens.

- pdb70 fixture: tar.gz with pdb70_a3m.ffdata (NUL-terminated a3m
  entries, each starting with one or two >ss_* records whose single
  sequence lines the awk repack drops) + a decoy pdb70_a3m.ffindex.
  Member sequences carry '-' gaps and interspersed lowercase insert
  states (the a3m match-window semantics msa2profile --msa-type 1
  must replicate).
- cdd fixture: fasta.tar.gz with cdNNNN.FASTA members whose first
  record is a consensus (hence the chain's --skip-query).
"""

import io
import os
import sys
import tarfile

import numpy as np

AA = "ACDEFGHIKLMNPQRSTVWY"


def _seq(rng, n):
    return "".join(AA[i] for i in rng.integers(0, 20, n))


def _mutate(rng, s, rate=0.15):
    out = list(s)
    for i in range(len(out)):
        r = rng.random()
        if r < rate:
            out[i] = AA[rng.integers(0, 20)]
        elif r < rate + 0.08:
            out[i] = "-"
    return "".join(out)


def _with_inserts(rng, s, k, trailing_only=False):
    """Insert k lowercase letters into an aligned member row."""
    out = list(s)
    if trailing_only:
        return s + "".join(AA[i] for i in rng.integers(0, 20, k)).lower()
    for _ in range(k):
        pos = int(rng.integers(0, len(out) + 1))
        out.insert(pos, AA[rng.integers(0, 20)].lower())
    return "".join(out)


def make_pdb70_tar(path, n_entries=4, seed=5, trailing_only=False):
    rng = np.random.default_rng(seed)
    blobs = []
    for e in range(n_entries):
        L = int(rng.integers(30, 70))
        query = _seq(rng, L)
        lines = [f">ss_dssp {e}", "C" * L]
        if e % 2 == 0:
            lines += [f">ss_pred {e}", "H" * L]
        lines += [f">1ab{e}_A Query protein {e} descr", query]
        for m in range(int(rng.integers(2, 5))):
            row = _mutate(rng, query)
            if m % 2 == 1:
                row = _with_inserts(rng, row, int(rng.integers(1, 6)),
                                    trailing_only)
            lines += [f">member_{e}_{m} some description", row]
        blobs.append("\n".join(lines) + "\n")
    ffdata = b"".join(b.encode() + b"\x00" for b in blobs)
    ffindex = "".join(f"{i}\t0\t{len(b)}\n"
                      for i, b in enumerate(blobs)).encode()
    with tarfile.open(path, "w:gz") as tf:
        for nm, data in (("pdb70_a3m.ffdata", ffdata),
                         ("pdb70_a3m.ffindex", ffindex)):
            ti = tarfile.TarInfo(nm)
            ti.size = len(data)
            ti.mtime = 0
            tf.addfile(ti, io.BytesIO(data))


def make_cdd_tar(path, n_entries=4, seed=9):
    rng = np.random.default_rng(seed)
    with tarfile.open(path, "w:gz") as tf:
        for e in range(n_entries):
            L = int(rng.integers(25, 60))
            cons = _seq(rng, L)
            lines = [f">cd{e:05d} consensus", cons]
            for m in range(int(rng.integers(3, 6))):
                lines += [f">gi|{1000 + e * 10 + m}| member",
                          _mutate(rng, cons)]
            data = ("\n".join(lines) + "\n").encode()
            ti = tarfile.TarInfo(f"cd{e:05d}.FASTA")
            ti.size = len(data)
            ti.mtime = 0
            tf.addfile(ti, io.BytesIO(data))


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "tests/data"
    os.makedirs(out, exist_ok=True)
    trailing = "--trailing-only" in sys.argv
    make_pdb70_tar(os.path.join(out, "pdb70_fixture.tar.gz"),
                   trailing_only=trailing)
    make_cdd_tar(os.path.join(out, "cdd_fixture.tar.gz"))
    print(f"wrote {out}/pdb70_fixture.tar.gz, {out}/cdd_fixture.tar.gz"
          + (" (trailing-only inserts)" if trailing else ""))
