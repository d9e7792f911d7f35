"""Build a large synthetic HMM-profile DB for the profile-target scale
demonstration (BASELINE.json config 3, the published MERC/MMETSP
~88k-profile use case, /root/reference/README.md:213).

Seeds profiles from a protein FASTA (use the make_metagenome target set
so the families implanted in the contigs are represented) and generates
an n_members-deep gapless mutated MSA per profile; the MSA DB is then
converted with this framework's msa2profile (byte-parity verified vs
the reference's convertmsa/msa2profile chain on committed goldens), so
the resulting profile DB is the same artifact either side would build.

Usage:
  python tools/make_profiledb.py SEED_FAA OUT_PROFILE_DB \
      [--profiles 50000] [--members 8] [--mutrate 0.12] [--seed 1]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

AA = np.frombuffer(b"ACDEFGHIKLMNPQRSTVWY", np.uint8)


def read_fasta_seqs(path, limit=None):
    seqs = []
    with open(path, "rb") as f:
        name, parts = None, []
        for line in f:
            if line.startswith(b">"):
                if name is not None:
                    seqs.append(b"".join(parts))
                    if limit and len(seqs) >= limit:
                        return seqs
                name = line[1:].strip()
                parts = []
            else:
                parts.append(line.strip())
        if name is not None:
            seqs.append(b"".join(parts))
    return seqs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("seed_faa")
    ap.add_argument("out_db")
    ap.add_argument("--profiles", type=int, default=50000)
    ap.add_argument("--members", type=int, default=5)
    ap.add_argument("--mutrate", type=float, default=0.12)
    ap.add_argument("--seed", type=int, default=20260821)
    ap.add_argument("--procs", type=int, default=2)
    ap.add_argument("--comp-bias-corr", type=int, default=0,
                    help="profile content knob (both demo sides consume "
                         "the same DB either way); 0 skips the "
                         "sequential-f32 bias pass that dominates build "
                         "time")
    args = ap.parse_args()

    import multiprocessing as mp_
    from metaeuk_tpu.io import mmseqsdb
    from metaeuk_tpu.utils import log

    seqs = read_fasta_seqs(args.seed_faa, limit=args.profiles)
    if len(seqs) < args.profiles:
        raise SystemExit(f"seed FASTA has only {len(seqs)} sequences")

    global _WORK
    _WORK = (seqs, args)
    prog = log.progress(args.profiles, "msa2profile profiles")
    payloads, headers = [], []
    with mp_.Pool(args.procs, initializer=_init_worker,
                  initargs=(seqs, args)) as pool:
        for i, (payload, header) in enumerate(
                pool.imap(_one_profile, range(args.profiles),
                          chunksize=64)):
            payloads.append((i, payload))
            headers.append((i, (header + "\n").encode()))
            prog.update()
    prog.finish()
    mmseqsdb.write_db(args.out_db, payloads, mmseqsdb.DBTYPE_HMM_PROFILE)
    mmseqsdb.write_db(f"{args.out_db}_h", headers,
                      mmseqsdb.DBTYPE_GENERIC)
    print(f"wrote {args.out_db} ({args.profiles} profiles, "
          f"{args.members} members each)")


_WORK = None


def _init_worker(seqs, args):
    global _WORK
    _WORK = (seqs, args)


def _one_profile(i):
    """Deterministic per-profile MSA (seeded by profile index) ->
    (payload, header); runs in the pool workers."""
    from metaeuk_tpu.pipeline.msa2profile import (_parse_msa_fasta,
                                                  msa_to_profile)
    seqs, args = _WORK
    rng = np.random.default_rng(args.seed + i)
    seed = np.frombuffer(seqs[i], np.uint8).copy()
    rows = [f">P{i}_0\n".encode() + seed.tobytes() + b"\n"]
    for m in range(1, args.members):
        mut = seed.copy()
        flip = rng.random(len(mut)) < args.mutrate
        mut[flip] = AA[rng.integers(0, 20, int(flip.sum()))]
        rows.append(f">P{i}_{m}\n".encode() + mut.tobytes() + b"\n")
    entries = _parse_msa_fasta(b"".join(rows).decode())
    return msa_to_profile(entries, match_mode=0, filter_msa=True,
                          comp_bias_correction=bool(args.comp_bias_corr))


if __name__ == "__main__":
    main()
