"""QM forward-kernel variant microbench on the real chip.

Measures the speed-of-light headroom of the query-major SW kernel
(ops/sw_pallas.py) by toggling recurrence variants:

  base        the production formulation
  fold        H' = H + i*ge carried (gap-extend folded into the carry;
              per-column +igge eliminated, f_base becomes a scalar,
              cap becomes a per-row constant vector) — score-exact
  nocap       per-column saturation dropped (NOT exact near 32767)
  fold_nocap  both
  nof         NO F recurrence at all (NOT exact — this is the ceiling a
              perfect lazy-F scheme could reach)
  uN / tjN    UNROLL / column-chunk sweeps on the base kernel

Findings on v5e (Lq=256, Lt=2048, 32 tiles, wall-clock):
  base ~76 Gcells/s, fold_nocap ~79 (+4%), nof ~128 (+70%).
The profiler-device rate of the production forward kernel is ~104
Gcells/s = VPU peak for its ~37 ops/cell; the in-column affine-gap
cummax (log2(Lq) shifted maxes, ~40% of cycles) is the irreducible
exactness cost — per-column convergence checks would serialize a
scalar branch per ~0.4us column, and an origin-tracking single-pass
scheme doubles per-cell work. An exact fwd+rev "complete" rate of
>=100 Gcells/s would need both passes in under the single pass's
op budget — below the VPU roofline on this part. Reverse-pass cost in
the PIPELINE is attacked structurally instead (survivors-only pass).
"""
import functools, sys, time
import numpy as np
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -(10 ** 6); BIG = 10 ** 6; GO = 11; GE = 1
TB = 128; PCOLS = 32

def _shift_down(x, k, fill):
    TBx = x.shape[1]
    return jnp.concatenate([jnp.full((k, TBx), fill, x.dtype), x[:-k]], axis=0)

def _cummax_down(A, Lq):
    shift = 1
    while shift < Lq:
        A = jnp.maximum(A, _shift_down(A, shift, NEG))
        shift *= 2
    return A

def make_kernel(Lq, TJ, UNROLL, variant):
    def kern(prof_ref, tc_ref, best_out, qend_out, tend_out, h_ref, e_ref, bp_ref):
        j_chunk = pl.program_id(1)
        @pl.when(j_chunk == 0)
        def _():
            if variant in ("fold", "fold_nocap"):
                iq0 = jax.lax.broadcasted_iota(jnp.int32, (Lq, TB), 0)
                h_ref[:] = iq0 * GE
                e_ref[:] = iq0 * GE - GO
            else:
                h_ref[:] = jnp.zeros((Lq, TB), jnp.int32)
                e_ref[:] = jnp.full((Lq, TB), -GO, jnp.int32)
            bp_ref[:] = jnp.zeros((Lq, TB), jnp.int32)
        iq = jax.lax.broadcasted_iota(jnp.int32, (Lq, TB), 0)
        f_base = -GO - (iq - 1) * GE
        igge = iq * GE
        capv = 32767 + igge
        P = prof_ref[0]
        ia = jax.lax.broadcasted_iota(jnp.int32, (PCOLS, TB), 0)

        def one_col(j_global, jj, H, E, BP):
            oh = (ia == tc_ref[jj, :][None, :]).astype(jnp.bfloat16)
            s = jnp.dot(P, oh, preferred_element_type=jnp.float32).astype(jnp.int32)
            if variant == "base":
                Hd = _shift_down(H, 1, 0)
                G = jnp.maximum(jnp.maximum(Hd + s, E), 0)
                A = _cummax_down(G + igge, Lq)
                Hn = jnp.maximum(G, _shift_down(A, 1, NEG) + f_base)
                Hn = jnp.minimum(Hn, 32767)
                BP = jnp.maximum(BP, Hn * 65536 + (65535 - j_global))
                E = jnp.maximum(E - GE, Hn - GO)
            elif variant in ("fold", "fold_nocap"):
                # H' = H + i*ge carried; s' = s + GE; H'(-1) = -GE
                Hd = _shift_down(H, 1, -GE)
                G = jnp.maximum(jnp.maximum(Hd + s, E), igge)  # s pre-shifted by GE in profile
                A = _cummax_down(G, Lq)
                Hn = jnp.maximum(G, _shift_down(A, 1, NEG) + (GE - GO))
                if variant == "fold":
                    Hn = jnp.minimum(Hn, capv)
                BP = jnp.maximum(BP, Hn * 32768 + (32767 - j_global))
                E = jnp.maximum(E - GE, Hn - GO)
            elif variant == "nocap":
                Hd = _shift_down(H, 1, 0)
                G = jnp.maximum(jnp.maximum(Hd + s, E), 0)
                A = _cummax_down(G + igge, Lq)
                Hn = jnp.maximum(G, _shift_down(A, 1, NEG) + f_base)
                BP = jnp.maximum(BP, Hn * 32768 + (32767 - j_global))
                E = jnp.maximum(E - GE, Hn - GO)
            elif variant == "nof":
                # lower bound: NO F recurrence at all (not exact!)
                Hd = _shift_down(H, 1, 0)
                Hn = jnp.maximum(jnp.maximum(Hd + s, E), 0)
                Hn = jnp.minimum(Hn, 32767)
                BP = jnp.maximum(BP, Hn * 65536 + (65535 - j_global))
                E = jnp.maximum(E - GE, Hn - GO)
            return Hn, E, BP

        def col_block(blk, carry):
            del carry
            H, E, BP = h_ref[:], e_ref[:], bp_ref[:]
            for u in range(UNROLL):
                jj = blk * UNROLL + u
                H, E, BP = one_col(j_chunk * TJ + jj, jj, H, E, BP)
            h_ref[:], e_ref[:] = H, E
            bp_ref[:] = BP
            return 0
        jax.lax.fori_loop(0, TJ // UNROLL, col_block, 0)

        @pl.when(j_chunk == pl.num_programs(1) - 1)
        def _():
            bp = bp_ref[:]
            if variant in ("fold", "fold_nocap"):
                bp = bp - igge * 32768
            Mp = jnp.max(bp, axis=0, keepdims=True)
            qe = jnp.min(jnp.where(bp == Mp, iq, BIG), axis=0, keepdims=True)
            div = 32768 if variant in ("fold", "fold_nocap", "nocap") else 65536
            M = Mp // div
            has = M > 0
            best_out[:] = jnp.where(has, M, 0)
            tend_out[:] = jnp.where(has, (div - 1) - (Mp % div), -1)
            qend_out[:] = jnp.where(has, qe, Lq - 1)
    return kern

def run_variant(variant, Lq=256, Lt=2048, n_tiles=32, UNROLL=8, TJ=256, iters=10):
    B = n_tiles * TB
    rng = np.random.default_rng(0)
    prof = rng.integers(-4, 12, (n_tiles, Lq, PCOLS)).astype(np.float32)
    prof[:, :, 21:] = -128
    if variant in ("fold", "fold_nocap"):
        pr = prof.copy(); pr[:, :, :21] += GE
        prof_d = jnp.asarray(pr, jnp.bfloat16)
    else:
        prof_d = jnp.asarray(prof, jnp.bfloat16)
    tc = jnp.asarray(rng.integers(0, 20, (Lt, B)).astype(np.int32))
    TJ = min(TJ, Lt)
    nj = Lt // TJ
    kern = make_kernel(Lq, TJ, UNROLL, variant)
    f = pl.pallas_call(
        kern, grid=(n_tiles, nj),
        in_specs=[pl.BlockSpec((1, Lq, PCOLS), lambda b, j: (b, 0, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((TJ, TB), lambda b, j: (j, b), memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((1, TB), lambda b, j: (0, b), memory_space=pltpu.VMEM)] * 3,
        out_shape=[jax.ShapeDtypeStruct((1, B), jnp.int32)] * 3,
        scratch_shapes=[pltpu.VMEM((Lq, TB), jnp.int32)] * 3)
    jf = jax.jit(lambda p, t: f(p, t))
    out = jf(prof_d, tc); [np.asarray(o) for o in out]
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jf(prof_d, tc)
    [np.asarray(o) for o in out]
    dt = (time.perf_counter() - t0) / iters
    cells = B * Lq * Lt
    return cells / dt / 1e9, np.asarray(out[0])[0][:6], np.asarray(out[1])[0][:6], np.asarray(out[2])[0][:6]

if __name__ == "__main__":
    for v in sys.argv[1:] or ["base", "fold", "nocap", "fold_nocap", "nof"]:
        if v.startswith("u"):
            r, s, qe, te = run_variant("base", UNROLL=int(v[1:]))
        elif v.startswith("tj"):
            r, s, qe, te = run_variant("base", TJ=int(v[2:]))
        else:
            r, s, qe, te = run_variant(v)
        print(f"{v:12s} {r:8.1f} Gcells/s  score={s} qe={qe} te={te}", flush=True)
