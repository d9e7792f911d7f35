"""Microbenchmarks for SW-kernel design decisions on the real TPU.

Measures device time (JAX profiler events, not wall clock — the tunneled
link adds ~100ms/fetch) for:
  - int32 vs int16 elementwise ALU chains (is 16-bit packed 2x?)
  - sublane shift (concatenate) vs pltpu.roll cost relative to ALU ops
  - the current production kernel as a reference point

Usage: python tools/kbench.py [case ...]
"""

import functools
import glob
import gzip
import json
import sys
import tempfile
import time

import numpy as np


def device_time_of(trace_dir, name_substr):
    files = glob.glob(f"{trace_dir}/**/*.trace.json.gz", recursive=True)
    total, count = 0.0, 0
    for f in files:
        for e in json.load(gzip.open(f))["traceEvents"]:
            if e.get("ph") == "X" and name_substr in e.get("name", "") \
                    and "dur" in e:
                total += e["dur"]
                count += 1
    return total / 1e6, count


def timed(fn, name, iters=10):
    import jax
    fn()  # compile
    trace_dir = tempfile.mkdtemp(prefix="kb")
    with jax.profiler.trace(trace_dir):
        for _ in range(iters):
            fn()
    dev_s, n = device_time_of(trace_dir, name)
    return dev_s / max(n, 1)


REPS = 512          # inner op-block repetitions
SHAPE = (256, 512)  # rows x lanes


def make_alu_case(dtype, n_ops=8):
    """Kernel: REPS iterations of an n_ops-long dependent ALU chain."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, o_ref):
        def body(i, a):
            b = a
            for k in range(n_ops // 2):
                b = jnp.maximum(b + jnp.int32(1).astype(dtype), a)
            return b
        o_ref[:] = jax.lax.fori_loop(0, REPS, body, x_ref[:])

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(SHAPE, dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    x = jnp.zeros(SHAPE, dtype)
    n_total_ops = REPS * n_ops * SHAPE[0] * SHAPE[1]
    return run, x, n_total_ops


def make_shift_case(dtype, use_roll=False, amount=1):
    """Kernel: REPS iterations of shift-by-`amount` along sublanes + max."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kernel(x_ref, o_ref):
        def body(i, a):
            if use_roll:
                s = pltpu.roll(a, amount, 0)
            else:
                s = jnp.concatenate(
                    [jnp.zeros((amount, SHAPE[1]), dtype), a[:-amount]],
                    axis=0)
            return jnp.maximum(a, s)
        o_ref[:] = jax.lax.fori_loop(0, REPS, body, x_ref[:])

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(SHAPE, dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    x = jnp.zeros(SHAPE, dtype)
    n_total_ops = REPS * 2 * SHAPE[0] * SHAPE[1]  # shift + max
    return run, x, n_total_ops


def make_scan_case(hierarchical):
    """Full 256-row cummax scan, naive (8 shift+max passes) vs
    hierarchical (shifts 1,2,4 then vreg-aligned 8,16,...,128)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    NEG = -(10 ** 6)
    R, C = SHAPE

    def scan(a):
        shift = 1
        while shift < R:
            if hierarchical or True:
                pass
            a = jnp.maximum(
                a, jnp.concatenate(
                    [jnp.full((shift, C), NEG, jnp.int32), a[:-shift]],
                    axis=0))
            shift *= 2
        return a

    def kernel(x_ref, o_ref):
        def body(i, a):
            return scan(a) - 1
        o_ref[:] = jax.lax.fori_loop(0, REPS // 8, body, x_ref[:])

    @jax.jit
    def run(x):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(SHAPE, jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(x)

    x = jnp.zeros(SHAPE, jnp.int32)
    n_total_ops = (REPS // 8) * 2 * 8 * R * C
    return run, x, n_total_ops


def main():
    import jax
    import jax.numpy as jnp

    d = jax.devices()[0]
    print(f"device: {d.device_kind} platform={d.platform}", flush=True)

    cases = {}
    cases["alu_i32"] = make_alu_case(jnp.int32)
    cases["alu_i16"] = make_alu_case(jnp.int16)
    cases["alu_f32"] = make_alu_case(jnp.float32)
    cases["alu_bf16"] = make_alu_case(jnp.bfloat16)
    cases["shift_i32"] = make_shift_case(jnp.int32)
    cases["shift_i16"] = make_shift_case(jnp.int16)
    cases["roll_i32"] = make_shift_case(jnp.int32, use_roll=True)
    cases["shift8"] = make_shift_case(jnp.int32, amount=8)
    cases["shift64"] = make_shift_case(jnp.int32, amount=64)
    cases["shift3"] = make_shift_case(jnp.int32, amount=3)
    cases["scan256"] = make_scan_case(False)

    want = sys.argv[1:] or list(cases)
    for name in want:
        run, x, n_ops = cases[name]
        sec = timed(lambda: np.asarray(run(x)), "jit_run")
        print(f"{name:12s}: {sec*1e6:9.1f} us/call  "
              f"{n_ops/sec/1e12:7.3f} Tops/s", flush=True)


if __name__ == "__main__":
    main()
