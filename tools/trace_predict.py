"""Device/host time breakdown of easy-predict on a synthetic metagenome.

    python tools/trace_predict.py [mbp] [targets]

Runs EasyPredict under the JAX profiler and prints the top device ops and
total device-busy seconds vs wall, separating kernel time from dispatch/
fetch overhead — the tool behind the align-stage optimization loop.
"""

import glob
import gzip
import json
import pathlib
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    mbp = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    n_targets = int(sys.argv[2]) if len(sys.argv) > 2 else 8000
    from tools.make_metagenome import make_metagenome, write_fasta
    from metaeuk_tpu.params import Params
    from metaeuk_tpu.pipeline.predict import EasyPredict
    import jax

    contigs, proteins = make_metagenome(mbp, n_targets)
    tmp = tempfile.mkdtemp(prefix="meuktrace")
    cp, pp = f"{tmp}/c.fna", f"{tmp}/p.faa"
    write_fasta(cp, contigs)
    write_fasta(pp, proteins)

    ep = EasyPredict(Params())
    trace_dir = tempfile.mkdtemp(prefix="meuktracejax")
    t0 = time.perf_counter()
    with jax.profiler.trace(trace_dir):
        ep.run(cp, pp, f"{tmp}/out")
    wall = time.perf_counter() - t0

    dev_total = 0.0
    by_name = {}
    for f in glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True):
        for e in json.load(gzip.open(f)).get("traceEvents", []):
            if e.get("ph") != "X" or "dur" not in e:
                continue
            name = e.get("name", "")
            pid_name = str(e.get("pid", ""))
            by_name[name] = by_name.get(name, 0.0) + e["dur"] / 1e6
    print(f"wall {wall:.1f}s; stages "
          f"{getattr(ep, 'predict_stage_seconds', {})}")
    for k, v in sorted(by_name.items(), key=lambda x: -x[1])[:25]:
        print(f"{v:9.3f}s  {k[:100]}")


if __name__ == "__main__":
    main()
