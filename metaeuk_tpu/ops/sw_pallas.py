"""Smith-Waterman DP as a Pallas TPU kernel.

Replaces the per-column XLA scan of sw_jax.py (256 tiny dispatches per
batch) with one fused kernel: the whole column loop runs on-core with DP
carries (H, E, best, ends) resident in VMEM scratch, and the score matrix
streams HBM->VMEM through the Pallas grid pipeline.

Layout: lanes = batch pairs (TB=128), sublanes = query positions. The
affine-gap in-column dependency is resolved with a log2(Lq)-step shifted
cumulative max (same max-plus identity as sw_jax.py):

    F(i,j) = cummax_i( G(i,j) + i*ge ) shifted - go - (i-1)*ge

Grid = (batch_tiles, column_chunks); column chunks iterate fastest, so
VMEM scratch carries the DP state across chunks of the same batch tile
(reset at chunk 0, results written at the last chunk).

Tie-breaking matches the reference sw_sse2_byte (StripedSmithWaterman
.cpp:879-916): first column to strictly improve the global max, then the
smallest query row within that column.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..data.submat import BLOSUM62_SCORES

NEG = -(10 ** 6)
BIG = 10 ** 6
GO = 11
GE = 1
TB = int(__import__("os").environ.get("METAEUK_SW_TB", "128"))  # pairs per tile (lanes)
UNROLL = 8  # columns per register-carried block (TJ must divide by it)


def _tj_for(Lq):
    """Target columns per grid step, sized so the streamed int8 score
    block (TJ, Lq, TB) stays ~<=4MB of VMEM (double-buffered by the grid
    pipeline within the ~16MB budget)."""
    tj = min(256, (1 << 22) // (Lq * TB))
    return max(UNROLL, tj // UNROLL * UNROLL)


def _shift_down(x, k, fill):
    """x shifted down k sublanes (rows), top filled. Shifts by multiples
    of 8 sublanes are vreg-aligned moves (~2x cheaper than rotates on
    v5e — measured in tools/kbench.py)."""
    TBx = x.shape[1]
    return jnp.concatenate(
        [jnp.full((k, TBx), fill, x.dtype), x[:-k]], axis=0)


def _shift_up(x, k, fill):
    TBx = x.shape[1]
    return jnp.concatenate(
        [x[k:], jnp.full((k, TBx), fill, x.dtype)], axis=0)


def _cummax_down(A, Lq):
    """Inclusive running max down the sublane axis: hierarchical doubling
    (unaligned rotates only for shifts 1/2/4, vreg-aligned slices after)."""
    shift = 1
    while shift < Lq:
        A = jnp.maximum(A, _shift_down(A, shift, NEG))
        shift *= 2
    return A


def _cummax_up(A, Lq):
    shift = 1
    while shift < Lq:
        A = jnp.maximum(A, _shift_up(A, shift, NEG))
        shift *= 2
    return A


SCORE_CAP = 32767  # the reference word kernel saturates here
                   # (StripedSmithWaterman.cpp:943 sw_sse2_word)


def _dp_kernel(Lq, Lt, TJ, s_ref, best_out, qend_out, tend_out,
               h_ref, e_ref, bp_ref):
    """Forward SW ends. S is fully premasked (query padding rows and
    target padding columns are -128), so no length checks are needed:
    padded cells can never strictly improve the running best. The
    per-row running best is a single packed int32
        BP = Hn * 65536 + (65535 - j)
    whose max realises the reference tie-break (max score, then the
    FIRST column attaining it — sw_sse2_byte:879-916) with one max op
    per column. E carries are unclamped (bounded below by -GO since the
    max includes Hn - GO; G clamps at 0 anyway)."""
    j_chunk = pl.program_id(1)

    @pl.when(j_chunk == 0)
    def _():
        h_ref[:] = jnp.zeros((Lq, TB), jnp.int32)
        e_ref[:] = jnp.full((Lq, TB), -GO, jnp.int32)
        bp_ref[:] = jnp.zeros((Lq, TB), jnp.int32)

    iq = jax.lax.broadcasted_iota(jnp.int32, (Lq, TB), 0)
    f_base = -GO - (iq - 1) * GE
    igge = iq * GE

    def one_col(j_global, jj, H, E, BP):
        s = s_ref[jj].astype(jnp.int32)
        Hd = _shift_down(H, 1, 0)
        G = jnp.maximum(jnp.maximum(Hd + s, E), 0)
        # F(i) = max_{k<i}(G(k) + k*ge) - go - (i-1)*ge
        A = _cummax_down(G + igge, Lq)
        Hn = jnp.maximum(G, _shift_down(A, 1, NEG) + f_base)
        Hn = jnp.minimum(Hn, SCORE_CAP)
        BP = jnp.maximum(BP, Hn * 65536 + (65535 - j_global))
        E = jnp.maximum(E - GE, Hn - GO)
        return Hn, E, BP

    def col_block(blk, carry):
        del carry
        # DP state carried in registers across an unrolled block of
        # columns: one scratch load/store per UNROLL columns
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
        Mp = jnp.max(bp, axis=0, keepdims=True)
        qe = jnp.min(jnp.where(bp == Mp, iq, BIG), axis=0, keepdims=True)
        M = Mp // 65536
        has = M > 0
        best_out[:] = jnp.where(has, M, 0)
        tend_out[:] = jnp.where(has, 65535 - (Mp & 65535), -1)
        qend_out[:] = jnp.where(has, qe, Lq - 1)


def _build_S_gapped(q_enc, q_bias, t_enc, Lq, Lt, Lt_pad, q_len=None,
                    t_len=None):
    """S[j, i, b] = blosum[q_i, t_j] + bias_i via batched MXU matmul.
    Padding query rows (i >= q_len) AND padding target columns
    (j >= t_len) are scored -128 so the DP kernels need no per-column
    masks (derived values stay strictly below any real maximum)."""
    submat = jnp.asarray(BLOSUM62_SCORES, dtype=jnp.int32)
    prof = submat[q_enc] + q_bias[:, :, None]                        # (B,Lq,21)
    if q_len is not None:
        iq = jnp.arange(Lq)[None, :]
        valid = (iq < jnp.asarray(q_len)[:, None])[:, :, None]
        prof = jnp.where(valid, prof, -128)
    # bf16 is exact for the int8-range scores and halves the MXU cost;
    # pad the target BEFORE the one-hot so no big S copy is needed
    prof = prof.astype(jnp.bfloat16)
    t_pad = jnp.pad(t_enc, ((0, 0), (0, Lt_pad - Lt)),
                    constant_values=20)                              # X
    if t_len is not None:
        # class 21 selects the appended -128 profile column
        jt = jnp.arange(Lt_pad)[None, :]
        t_pad = jnp.where(jt < jnp.asarray(t_len)[:, None], t_pad, 21)
        prof = jnp.concatenate(
            [prof, jnp.full((prof.shape[0], Lq, 1), -128, prof.dtype)],
            axis=2)
    t_oh = jax.nn.one_hot(t_pad, prof.shape[2], dtype=jnp.bfloat16)  # (B,Ltp,A)
    S = jnp.einsum("bia,bja->jib", prof, t_oh,
                   preferred_element_type=jnp.bfloat16).astype(jnp.int8)
    return S


@functools.partial(jax.jit, static_argnums=(4, 5, 6))
def sw_pallas_ends(q_enc, q_bias, q_len, t_enc, Lq, Lt, interpret=False,
                   t_len=None):
    """Forward SW ends for a padded batch; same contract as
    sw_jax.sw_batch_ends. B must be a multiple of TB=128 (pad with
    zero-length pairs)."""
    B = q_enc.shape[0]
    assert B % TB == 0, B
    TJ = _tj_for(Lq)
    Lt_pad = ((Lt + TJ - 1) // TJ) * TJ
    S = _build_S_gapped(q_enc, q_bias, t_enc, Lq, Lt, Lt_pad, q_len=q_len,
                        t_len=t_len)
    return _sw_pallas_ends_from_S(S, Lq, Lt_pad, B, interpret)


def _sw_pallas_ends_from_S(S, Lq, Lt_pad, B, interpret):
    TJ = _tj_for(Lq)
    nb = B // TB
    nj = Lt_pad // TJ
    kernel = functools.partial(_dp_kernel, Lq, Lt_pad, TJ)
    best, q_end, t_end = pl.pallas_call(
        kernel,
        grid=(nb, nj),
        in_specs=[
            pl.BlockSpec((TJ, Lq, TB), lambda b, j: (j, 0, b),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TB), lambda b, j: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TB), lambda b, j: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TB), lambda b, j: (0, b), memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((1, B), jnp.int32)] * 3,
        scratch_shapes=[
            pltpu.VMEM((Lq, TB), jnp.int32),   # H
            pltpu.VMEM((Lq, TB), jnp.int32),   # E
            pltpu.VMEM((Lq, TB), jnp.int32),   # packed per-row best
        ],
        interpret=interpret,
    )(S)
    return best[0], q_end[0], t_end[0]


def _dp_kernel_rev(Lq, Lt, TJ, s_ref, qe_ref, te_ref,
                   score_out, qstart_out, tstart_out,
                   h_ref, e_ref, bp_ref):
    """Reverse-prefix DP on the SAME streamed score matrix: columns walk
    te..0 and rows are mirrored, which is exactly the reference's
    reversed-prefix pass (ssw_align_private:398-482) without any host or
    device gathers. Tie-breaking: first strict improvement in the
    reversed scan (LARGEST original column), then the largest query row
    — realised by the packed per-row best BP = Hn * 65536 + j."""
    j_chunk = pl.program_id(1)
    n_chunks = pl.num_programs(1)

    @pl.when(j_chunk == 0)
    def _():
        h_ref[:] = jnp.zeros((Lq, TB), jnp.int32)
        e_ref[:] = jnp.full((Lq, TB), -GO, jnp.int32)
        bp_ref[:] = jnp.zeros((Lq, TB), jnp.int32)

    iq = jax.lax.broadcasted_iota(jnp.int32, (Lq, TB), 0)
    q_mask = iq <= qe_ref[0:1, :]
    f_base = -GO + (iq + 1) * GE
    te = te_ref[0:1, :]

    def one_col(j_global, jj, H, E, BP):
        s = jnp.where(q_mask & (j_global <= te),
                      s_ref[jj].astype(jnp.int32), NEG)
        # diagonal predecessor is one row BELOW (i+1)
        Hd = _shift_up(H, 1, 0)
        G = jnp.maximum(jnp.maximum(Hd + s, E), 0)
        # F(i) = max_{k>i} (G(k) - go - (k-1-i)*ge): suffix cummax
        A = _cummax_up(G - iq * GE, Lq)
        Hn = jnp.maximum(G, _shift_up(A, 1, NEG) + f_base)
        Hn = jnp.minimum(Hn, SCORE_CAP)
        BP = jnp.maximum(BP, Hn * 65536 + j_global)
        E = jnp.maximum(E - GE, Hn - GO)
        return Hn, E, BP

    def col_block(blk, carry):
        del carry
        H, E, BP = h_ref[:], e_ref[:], bp_ref[:]
        for u in range(UNROLL):
            # grid chunks and columns both run high -> low
            jj = TJ - 1 - (blk * UNROLL + u)
            j_global = (n_chunks - 1 - j_chunk) * TJ + jj
            H, E, BP = one_col(j_global, jj, H, E, BP)
        h_ref[:], e_ref[:] = H, E
        bp_ref[:] = BP
        return 0

    jax.lax.fori_loop(0, TJ // UNROLL, col_block, 0)

    @pl.when(j_chunk == n_chunks - 1)
    def _():
        bp = bp_ref[:]
        Mp = jnp.max(bp, axis=0, keepdims=True)
        qs = jnp.max(jnp.where(bp == Mp, iq, -BIG), axis=0, keepdims=True)
        Mx = Mp // 65536
        has = Mx > 0
        score_out[:] = jnp.where(has, Mx, 0)
        tstart_out[:] = jnp.where(has, Mp & 65535, -1)
        qstart_out[:] = jnp.where(has, qs, 0)


def _sw_pallas_starts_from_S(S, q_end, t_end, Lq, Lt_pad, B, interpret):
    """Run the reverse-prefix kernel over an existing (Lt_pad, Lq, B) S."""
    qe2 = q_end.reshape(1, B).astype(jnp.int32)
    te2 = t_end.reshape(1, B).astype(jnp.int32)
    TJ = _tj_for(Lq)
    nb = B // TB
    nj = Lt_pad // TJ
    kernel = functools.partial(_dp_kernel_rev, Lq, Lt_pad, TJ)
    score, q_start, t_start = pl.pallas_call(
        kernel,
        grid=(nb, nj),
        in_specs=[
            pl.BlockSpec((TJ, Lq, TB), lambda b, j: (pl.num_programs(1) - 1 - j, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TB), lambda b, j: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TB), lambda b, j: (0, b), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TB), lambda b, j: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TB), lambda b, j: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TB), lambda b, j: (0, b), memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((1, B), jnp.int32)] * 3,
        scratch_shapes=[
            pltpu.VMEM((Lq, TB), jnp.int32),
            pltpu.VMEM((Lq, TB), jnp.int32),
            pltpu.VMEM((Lq, TB), jnp.int32),
        ],
        interpret=interpret,
    )(S, qe2, te2)
    return score[0], q_start[0], t_start[0]


def pad_batch(q_enc, q_bias, q_len, t_enc, t_len, multiple=TB):
    """Pad the batch dim to a multiple (TB, or TB*n_devices) with
    zero-length pairs."""
    B = q_enc.shape[0]
    Bp = ((B + multiple - 1) // multiple) * multiple
    if Bp == B:
        return q_enc, q_bias, q_len, t_enc, t_len, B
    pad = Bp - B

    def padb(a):
        w = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        return np.pad(a, w)

    return (padb(q_enc), padb(q_bias), padb(q_len), padb(t_enc),
            padb(t_len), B)


@functools.partial(jax.jit, static_argnums=(5, 6, 7))
def _align_full(q_enc, q_bias, q_len, t_enc, t_len, Lq, Lt, interpret):
    """One-dispatch full alignment: the score matrix is built once and
    streamed through both the forward-ends kernel and the mirrored
    reverse-prefix kernel (no gathers, no second S build)."""
    B = q_enc.shape[0]
    TJ = _tj_for(Lq)
    Lt_pad = ((Lt + TJ - 1) // TJ) * TJ
    S = _build_S_gapped(q_enc, q_bias, t_enc, Lq, Lt, Lt_pad, q_len=q_len,
                        t_len=t_len)
    return _align_from_S(S, q_len, t_len, Lq, Lt_pad, B, interpret)


def _build_S_prof(prof, q_len, t_enc, Lq, Lt, Lt_pad, t_len=None):
    """S[j, i, b] = pssm[i, t_j] for per-pair PSSM queries (the inverted
    profile search, PROFILE_SEQ alignment — no composition bias). Same
    MXU one-hot contraction as the sequence path; PSSM scores are
    int8-range so bf16 is exact."""
    prof = jnp.asarray(prof, jnp.int32)  # (B, Lq, 21)
    iq = jnp.arange(Lq)[None, :]
    valid = (iq < jnp.asarray(q_len)[:, None])[:, :, None]
    prof = jnp.where(valid, prof, -128).astype(jnp.bfloat16)
    t_pad = jnp.pad(t_enc, ((0, 0), (0, Lt_pad - Lt)), constant_values=20)
    if t_len is not None:
        jt = jnp.arange(Lt_pad)[None, :]
        t_pad = jnp.where(jt < jnp.asarray(t_len)[:, None], t_pad, 21)
        prof = jnp.concatenate(
            [prof, jnp.full((prof.shape[0], Lq, 1), -128, prof.dtype)],
            axis=2)
    t_oh = jax.nn.one_hot(t_pad, prof.shape[2], dtype=jnp.bfloat16)
    S = jnp.einsum("bia,bja->jib", prof, t_oh,
                   preferred_element_type=jnp.bfloat16).astype(jnp.int8)
    return S


@functools.partial(jax.jit, static_argnums=(4, 5, 6))
def _align_full_prof(prof, q_len, t_enc, t_len, Lq, Lt, interpret):
    """One-dispatch full PSSM-vs-sequence alignment (ends + starts)."""
    B = prof.shape[0]
    TJ = _tj_for(Lq)
    Lt_pad = ((Lt + TJ - 1) // TJ) * TJ
    S = _build_S_prof(prof, q_len, t_enc, Lq, Lt, Lt_pad, t_len=t_len)
    return _align_from_S(S, q_len, t_len, Lq, Lt_pad, B, interpret)


def _align_from_S(S, q_len, t_len, Lq, Lt_pad, B, interpret):
    score, q_end, t_end = _sw_pallas_ends_from_S(S, Lq, Lt_pad, B, interpret)
    qe = jnp.maximum(q_end, 0)
    te = jnp.maximum(t_end, 0)
    score2, q_start, t_start = _sw_pallas_starts_from_S(
        S, qe, te, Lq, Lt_pad, B, interpret)
    aligned = (t_end >= 0) & (score > 0)
    q_start = jnp.where(aligned, q_start, -1)
    t_start = jnp.where(aligned, t_start, -1)
    return score, q_start, q_end, t_start, t_end


# ---------------------------------------------------------------------------
# Query-major kernels: one query per tile, lanes = 128 candidate targets.
# The score column is delivered by a per-column MXU matmul
#     s = P(Lq, 32) @ onehot(target codes)(32, TB)
# so no (Lt, Lq, B) score tensor is ever built or streamed — the S-build
# einsum + layout copies were HALF the device time of the pair-batched
# path. This matches the pipeline's hit structure (every fragment aligns
# against its <= max-seqs prefilter candidates; profile search aligns one
# PSSM against many targets).
# ---------------------------------------------------------------------------

PCOLS = 32  # profile columns: 22 real classes (20 aa + X + pad) padded
            # to an MXU-friendly contraction depth


def _dp_kernel_qm(Lq, TJ, prof_ref, tc_ref, best_out, qend_out, tend_out,
                  h_ref, e_ref, bp_ref):
    """Forward ends, query-major. prof premasked: rows >= q_len and
    columns 22..31 are -128; padding target rows carry code 21 (the -128
    profile column), so padded lanes/columns can never improve the best
    (same argument as the pair-batched kernel)."""
    j_chunk = pl.program_id(1)

    @pl.when(j_chunk == 0)
    def _():
        h_ref[:] = jnp.zeros((Lq, TB), jnp.int32)
        e_ref[:] = jnp.full((Lq, TB), -GO, jnp.int32)
        bp_ref[:] = jnp.zeros((Lq, TB), jnp.int32)

    iq = jax.lax.broadcasted_iota(jnp.int32, (Lq, TB), 0)
    f_base = -GO - (iq - 1) * GE
    igge = iq * GE
    P = prof_ref[0]  # (Lq, PCOLS) bf16
    ia = jax.lax.broadcasted_iota(jnp.int32, (PCOLS, TB), 0)

    def one_col(j_global, jj, H, E, BP):
        oh = (ia == tc_ref[jj, :][None, :]).astype(jnp.bfloat16)
        s = jnp.dot(P, oh, preferred_element_type=jnp.float32) \
            .astype(jnp.int32)
        Hd = _shift_down(H, 1, 0)
        G = jnp.maximum(jnp.maximum(Hd + s, E), 0)
        A = _cummax_down(G + igge, Lq)
        Hn = jnp.maximum(G, _shift_down(A, 1, NEG) + f_base)
        Hn = jnp.minimum(Hn, SCORE_CAP)
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
        Mp = jnp.max(bp, axis=0, keepdims=True)
        qe = jnp.min(jnp.where(bp == Mp, iq, BIG), axis=0, keepdims=True)
        M = Mp // 65536
        has = M > 0
        best_out[:] = jnp.where(has, M, 0)
        tend_out[:] = jnp.where(has, 65535 - (Mp & 65535), -1)
        qend_out[:] = jnp.where(has, qe, Lq - 1)


def _dp_kernel_qm_rev(Lq, TJ, prof_ref, tc_ref, qe_ref, te_ref,
                      score_out, qstart_out, tstart_out,
                      h_ref, e_ref, bp_ref):
    """Reverse-prefix starts, query-major (mirrors _dp_kernel_rev)."""
    j_chunk = pl.program_id(1)
    n_chunks = pl.num_programs(1)

    @pl.when(j_chunk == 0)
    def _():
        h_ref[:] = jnp.zeros((Lq, TB), jnp.int32)
        e_ref[:] = jnp.full((Lq, TB), -GO, jnp.int32)
        bp_ref[:] = jnp.zeros((Lq, TB), jnp.int32)

    iq = jax.lax.broadcasted_iota(jnp.int32, (Lq, TB), 0)
    q_mask = iq <= qe_ref[0:1, :]
    f_base = -GO + (iq + 1) * GE
    te = te_ref[0:1, :]
    P = prof_ref[0]
    ia = jax.lax.broadcasted_iota(jnp.int32, (PCOLS, TB), 0)

    def one_col(j_global, jj, H, E, BP):
        oh = (ia == tc_ref[jj, :][None, :]).astype(jnp.bfloat16)
        s0 = jnp.dot(P, oh, preferred_element_type=jnp.float32) \
            .astype(jnp.int32)
        s = jnp.where(q_mask & (j_global <= te), s0, NEG)
        Hd = _shift_up(H, 1, 0)
        G = jnp.maximum(jnp.maximum(Hd + s, E), 0)
        A = _cummax_up(G - iq * GE, Lq)
        Hn = jnp.maximum(G, _shift_up(A, 1, NEG) + f_base)
        Hn = jnp.minimum(Hn, SCORE_CAP)
        BP = jnp.maximum(BP, Hn * 65536 + j_global)
        E = jnp.maximum(E - GE, Hn - GO)
        return Hn, E, BP

    def col_block(blk, carry):
        del carry
        H, E, BP = h_ref[:], e_ref[:], bp_ref[:]
        for u in range(UNROLL):
            jj = TJ - 1 - (blk * UNROLL + u)
            j_global = (n_chunks - 1 - j_chunk) * TJ + jj
            H, E, BP = one_col(j_global, jj, H, E, BP)
        h_ref[:], e_ref[:] = H, E
        bp_ref[:] = BP
        return 0

    jax.lax.fori_loop(0, TJ // UNROLL, col_block, 0)

    @pl.when(j_chunk == n_chunks - 1)
    def _():
        bp = bp_ref[:]
        Mp = jnp.max(bp, axis=0, keepdims=True)
        qs = jnp.max(jnp.where(bp == Mp, iq, -BIG), axis=0, keepdims=True)
        Mx = Mp // 65536
        has = Mx > 0
        score_out[:] = jnp.where(has, Mx, 0)
        tstart_out[:] = jnp.where(has, Mp & 65535, -1)
        qstart_out[:] = jnp.where(has, qs, 0)


def _tj_qm(Lt_pad):
    return min(512, max(UNROLL, Lt_pad))


# ---------------------------------------------------------------------------
# Row-tiled query-major kernels for very long queries (Lq > QM_TQ): the
# (Lq, TB) DP carries no longer fit VMEM, so the query axis is processed
# in TQ-row tiles (grid dim between batch and columns). Two boundary
# arrays carry the inter-tile dependency per target column: the last
# row's H (diagonal feed) and the inclusive F-chain max
# A = max_k (G(k,j) + k*ge). They live in a (Lt_pad, TB) VMEM scratch,
# which bounds Lt_pad <= ~4096 — the reference regime (ORF fragments up
# to 32734 AA vs normal-length protein targets).
# ---------------------------------------------------------------------------

QM_TQ = 2048  # rows per tile; 3 int32 carries = 3MB VMEM


def _dp_kernel_qm_rt(Lq, TQ, TJ, prof_ref, tc_ref, best_out, qend_out,
                     tend_out, h_ref, e_ref, bp_ref, hb_ref, ab_ref,
                     hbp_ref, gm_ref, gqe_ref):
    """Forward ends, query-major, row-tiled. Grid (b, r, j); prof block
    is this row tile's (TQ, PCOLS) slice; scratch h/e/bp are per-row-tile
    carries, hb/ab the per-column boundaries from the tile above (hb:
    last-row H, ab: inclusive F-chain max), hbp the previous COLUMN's hb
    (the diagonal predecessor of this tile's first row), gm/gqe the
    cross-tile running best."""
    r = pl.program_id(1)
    j_chunk = pl.program_id(2)
    nr = pl.num_programs(1)

    @pl.when((r == 0) & (j_chunk == 0))
    def _():
        hb_ref[:] = jnp.zeros_like(hb_ref)
        ab_ref[:] = jnp.full_like(ab_ref, NEG)
        gm_ref[:] = jnp.zeros_like(gm_ref)
        gqe_ref[:] = jnp.full_like(gqe_ref, Lq - 1)

    @pl.when(j_chunk == 0)
    def _():
        h_ref[:] = jnp.zeros((TQ, TB), jnp.int32)
        e_ref[:] = jnp.full((TQ, TB), -GO, jnp.int32)
        bp_ref[:] = jnp.zeros((TQ, TB), jnp.int32)
        hbp_ref[:] = jnp.zeros((1, TB), jnp.int32)

    iq = r * TQ + jax.lax.broadcasted_iota(jnp.int32, (TQ, TB), 0)
    f_base = -GO - (iq - 1) * GE
    igge = iq * GE
    P = prof_ref[0]
    ia = jax.lax.broadcasted_iota(jnp.int32, (PCOLS, TB), 0)

    def one_col(j_global, jj, H, E, BP, HBP):
        oh = (ia == tc_ref[jj, :][None, :]).astype(jnp.bfloat16)
        s = jnp.dot(P, oh, preferred_element_type=jnp.float32) \
            .astype(jnp.int32)
        # boundary values from the tile above: hb_cur at this column
        # feeds the NEXT column's diagonal; HBP (previous column's hb)
        # is this column's first-row diagonal predecessor
        hb_cur = hb_ref[j_global].reshape(1, TB)
        ab = ab_ref[j_global].reshape(1, TB)
        Hd = jnp.concatenate([HBP, H[:-1]], axis=0)
        G = jnp.maximum(jnp.maximum(Hd + s, E), 0)
        A = _cummax_down(G + igge, TQ)
        Aex = jnp.maximum(_shift_down(A, 1, NEG),
                          jnp.broadcast_to(ab, (TQ, TB)))
        Hn = jnp.maximum(G, Aex + f_base)
        Hn = jnp.minimum(Hn, SCORE_CAP)
        BP = jnp.maximum(BP, Hn * 65536 + (65535 - j_global))
        E = jnp.maximum(E - GE, Hn - GO)
        hb_ref[j_global] = Hn[TQ - 1]
        ab_ref[j_global] = jnp.maximum(A[TQ - 1], ab[0])
        return Hn, E, BP, hb_cur

    def col_block(blk, carry):
        del carry
        H, E, BP = h_ref[:], e_ref[:], bp_ref[:]
        HBP = hbp_ref[:]
        for u in range(UNROLL):
            jj = blk * UNROLL + u
            H, E, BP, HBP = one_col(j_chunk * TJ + jj, jj, H, E, BP, HBP)
        h_ref[:], e_ref[:] = H, E
        bp_ref[:] = BP
        hbp_ref[:] = HBP
        return 0

    jax.lax.fori_loop(0, TJ // UNROLL, col_block, 0)

    @pl.when(j_chunk == pl.num_programs(2) - 1)
    def _():
        bp = bp_ref[:]
        Mp = jnp.max(bp, axis=0, keepdims=True)
        qe = jnp.min(jnp.where(bp == Mp, iq, BIG), axis=0, keepdims=True)
        better = Mp > gm_ref[:]
        gm_ref[:] = jnp.where(better, Mp, gm_ref[:])
        gqe_ref[:] = jnp.where(better, qe, gqe_ref[:])

    @pl.when((r == nr - 1) & (j_chunk == pl.num_programs(2) - 1))
    def _():
        Mp = gm_ref[:]
        M = Mp // 65536
        has = M > 0
        best_out[:] = jnp.where(has, M, 0)
        tend_out[:] = jnp.where(has, 65535 - (Mp & 65535), -1)
        qend_out[:] = jnp.where(has, gqe_ref[:], Lq - 1)


def _dp_kernel_qm_rev_rt(Lq, TQ, TJ, prof_ref, tc_ref, qe_ref, te_ref,
                         score_out, qstart_out, tstart_out,
                         h_ref, e_ref, bp_ref, hb_ref, ab_ref,
                         hbp_ref, gm_ref, gqs_ref):
    """Reverse-prefix starts, query-major, row-tiled: columns walk
    te..0, row tiles walk bottom-up (the grid index map remaps r), and
    the boundary arrays carry the tile BELOW's first-row H and suffix
    F-chain max; hbp is the previously processed column's hb (column
    j+1 — the diagonal predecessor of this tile's last row)."""
    r = pl.program_id(1)          # 0 = bottom tile (grid remap)
    j_chunk = pl.program_id(2)
    nr = pl.num_programs(1)
    n_chunks = pl.num_programs(2)
    rt = nr - 1 - r               # actual row-tile index (top-based)

    @pl.when((r == 0) & (j_chunk == 0))
    def _():
        hb_ref[:] = jnp.zeros_like(hb_ref)
        ab_ref[:] = jnp.full_like(ab_ref, NEG)
        gm_ref[:] = jnp.zeros_like(gm_ref)
        gqs_ref[:] = jnp.zeros_like(gqs_ref)

    @pl.when(j_chunk == 0)
    def _():
        h_ref[:] = jnp.zeros((TQ, TB), jnp.int32)
        e_ref[:] = jnp.full((TQ, TB), -GO, jnp.int32)
        bp_ref[:] = jnp.zeros((TQ, TB), jnp.int32)
        hbp_ref[:] = jnp.zeros((1, TB), jnp.int32)

    iq = rt * TQ + jax.lax.broadcasted_iota(jnp.int32, (TQ, TB), 0)
    q_mask = iq <= qe_ref[0:1, :]
    f_base = -GO + (iq + 1) * GE
    te = te_ref[0:1, :]
    P = prof_ref[0]
    ia = jax.lax.broadcasted_iota(jnp.int32, (PCOLS, TB), 0)

    def one_col(j_global, jj, H, E, BP, HBP):
        oh = (ia == tc_ref[jj, :][None, :]).astype(jnp.bfloat16)
        s0 = jnp.dot(P, oh, preferred_element_type=jnp.float32) \
            .astype(jnp.int32)
        s = jnp.where(q_mask & (j_global <= te), s0, NEG)
        hb_cur = hb_ref[j_global].reshape(1, TB)
        ab = ab_ref[j_global].reshape(1, TB)
        Hd = jnp.concatenate([H[1:], HBP], axis=0)
        G = jnp.maximum(jnp.maximum(Hd + s, E), 0)
        A = _cummax_up(G - iq * GE, TQ)
        Aex = jnp.maximum(_shift_up(A, 1, NEG),
                          jnp.broadcast_to(ab, (TQ, TB)))
        Hn = jnp.maximum(G, Aex + f_base)
        Hn = jnp.minimum(Hn, SCORE_CAP)
        BP = jnp.maximum(BP, Hn * 65536 + j_global)
        E = jnp.maximum(E - GE, Hn - GO)
        hb_ref[j_global] = Hn[0]
        ab_ref[j_global] = jnp.maximum(A[0], ab[0])
        return Hn, E, BP, hb_cur

    def col_block(blk, carry):
        del carry
        H, E, BP = h_ref[:], e_ref[:], bp_ref[:]
        HBP = hbp_ref[:]
        for u in range(UNROLL):
            jj = TJ - 1 - (blk * UNROLL + u)
            j_global = (n_chunks - 1 - j_chunk) * TJ + jj
            H, E, BP, HBP = one_col(j_global, jj, H, E, BP, HBP)
        h_ref[:], e_ref[:] = H, E
        bp_ref[:] = BP
        hbp_ref[:] = HBP
        return 0

    jax.lax.fori_loop(0, TJ // UNROLL, col_block, 0)

    @pl.when(j_chunk == n_chunks - 1)
    def _():
        bp = bp_ref[:]
        Mp = jnp.max(bp, axis=0, keepdims=True)
        qs = jnp.max(jnp.where(bp == Mp, iq, -BIG), axis=0, keepdims=True)
        # bottom tiles (largest rows) run first; on ties keep the
        # earlier tile so the LARGEST query row wins
        better = Mp > gm_ref[:]
        gm_ref[:] = jnp.where(better, Mp, gm_ref[:])
        gqs_ref[:] = jnp.where(better, qs, gqs_ref[:])

    @pl.when((r == nr - 1) & (j_chunk == n_chunks - 1))
    def _():
        Mp = gm_ref[:]
        Mx = Mp // 65536
        has = Mx > 0
        score_out[:] = jnp.where(has, Mx, 0)
        tstart_out[:] = jnp.where(has, Mp & 65535, -1)
        qstart_out[:] = jnp.where(has, gqs_ref[:], 0)


def _qm_call_rt(kernel_fn, n_extra, Lq, Lt_pad, n_tiles, prof, tcodes_T,
                extras, n_out, interpret):
    """pallas_call for the row-tiled query-major kernels."""
    TQ = QM_TQ
    TJ = _tj_qm(Lt_pad)
    nj = Lt_pad // TJ
    nr = Lq // TQ
    rev = kernel_fn is _dp_kernel_qm_rev_rt
    kernel = functools.partial(kernel_fn, Lq, TQ, TJ)
    B = n_tiles * TB
    if rev:
        prof_map = lambda b, r, j: (b, pl.num_programs(1) - 1 - r, 0)
        tc_map = lambda b, r, j: (pl.num_programs(2) - 1 - j, b)
    else:
        prof_map = lambda b, r, j: (b, r, 0)
        tc_map = lambda b, r, j: (j, b)
    in_specs = [
        pl.BlockSpec((1, TQ, PCOLS), prof_map, memory_space=pltpu.VMEM),
        pl.BlockSpec((TJ, TB), tc_map, memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec((1, TB), lambda b, r, j: (0, b),
                      memory_space=pltpu.VMEM)] * n_extra
    outs = pl.pallas_call(
        kernel,
        grid=(n_tiles, nr, nj),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((1, TB), lambda b, r, j: (0, b),
                                memory_space=pltpu.VMEM)] * n_out,
        out_shape=[jax.ShapeDtypeStruct((1, B), jnp.int32)] * n_out,
        scratch_shapes=[pltpu.VMEM((TQ, TB), jnp.int32)] * 3
        + [pltpu.VMEM((Lt_pad, TB), jnp.int32)] * 2
        + [pltpu.VMEM((1, TB), jnp.int32)] * 3,
        interpret=interpret,
    )(prof, tcodes_T, *extras)
    return [o[0] for o in outs]


def _qm_call(kernel_fn, n_extra, Lq, Lt_pad, n_tiles, prof, tcodes_T,
             extras, n_out, interpret):
    TJ = _tj_qm(Lt_pad)
    nj = Lt_pad // TJ
    kernel = functools.partial(kernel_fn, Lq, TJ)
    B = n_tiles * TB
    if kernel_fn is _dp_kernel_qm_rev:
        # reverse kernel walks columns high -> low: grid step j consumes
        # target-code chunk nj-1-j
        tc_map = lambda b, j: (pl.num_programs(1) - 1 - j, b)
    else:
        tc_map = lambda b, j: (j, b)
    in_specs = [
        pl.BlockSpec((1, Lq, PCOLS), lambda b, j: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((TJ, TB), tc_map, memory_space=pltpu.VMEM),
    ] + [pl.BlockSpec((1, TB), lambda b, j: (0, b),
                      memory_space=pltpu.VMEM)] * n_extra
    outs = pl.pallas_call(
        kernel,
        grid=(n_tiles, nj),
        in_specs=in_specs,
        out_specs=[pl.BlockSpec((1, TB), lambda b, j: (0, b),
                                memory_space=pltpu.VMEM)] * n_out,
        out_shape=[jax.ShapeDtypeStruct((1, B), jnp.int32)] * n_out,
        scratch_shapes=[pltpu.VMEM((Lq, TB), jnp.int32)] * 3,
        interpret=interpret,
    )(prof, tcodes_T, *extras)
    return [o[0] for o in outs]


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _align_full_qm(prof, tcodes_T, Lq, Lt_pad, interpret):
    """Query-major full alignment. prof: (n_tiles, Lq, PCOLS) bf16,
    premasked (-128 padding rows/columns); tcodes_T: (Lt_pad, n_tiles*TB)
    int32 target codes, column-major over lanes, padding positions AND
    padding lanes carry code 21."""
    n_tiles = prof.shape[0]
    best, q_end, t_end = _qm_call(
        _dp_kernel_qm, 0, Lq, Lt_pad, n_tiles, prof, tcodes_T, (),
        3, interpret)
    qe = jnp.maximum(q_end, 0).reshape(1, -1)
    te = jnp.maximum(t_end, 0).reshape(1, -1)
    score, q_start, t_start = _qm_call(
        _dp_kernel_qm_rev, 2, Lq, Lt_pad, n_tiles, prof, tcodes_T,
        (qe, te), 3, interpret)
    aligned = (t_end >= 0) & (best > 0)
    q_start = jnp.where(aligned, q_start, -1)
    t_start = jnp.where(aligned, t_start, -1)
    return best, q_start, q_end, t_start, t_end


@functools.partial(jax.jit, static_argnums=(2, 3, 4))
def _align_ends_qm(prof, tcodes_T, Lq, Lt_pad, interpret):
    """Forward-only query-major ends (the survivors-only pipeline runs
    the reverse pass on the few pairs that pass the E-value gate).
    Queries longer than QM_TQ*2 take the row-tiled kernel, so long ORF
    fragments (orfMaxLength 32734) stay on Pallas."""
    n_tiles = prof.shape[0]
    if Lq > 2 * QM_TQ:
        return _qm_call_rt(
            _dp_kernel_qm_rt, 0, Lq, Lt_pad, n_tiles, prof, tcodes_T, (),
            3, interpret)
    best, q_end, t_end = _qm_call(
        _dp_kernel_qm, 0, Lq, Lt_pad, n_tiles, prof, tcodes_T, (),
        3, interpret)
    return best, q_end, t_end


@functools.partial(jax.jit, static_argnums=(4, 5, 6))
def _align_starts_qm(prof, tcodes_T, q_end, t_end, Lq, Lt_pad, interpret):
    """Reverse-prefix-only query-major starts for lanes with known ends
    (the survivors-only second pass). Returns (score2, q_start, t_start)
    in direct coordinates."""
    n_tiles = prof.shape[0]
    qe = jnp.maximum(q_end, 0).reshape(1, -1)
    te = jnp.maximum(t_end, 0).reshape(1, -1)
    if Lq > 2 * QM_TQ:
        return _qm_call_rt(
            _dp_kernel_qm_rev_rt, 2, Lq, Lt_pad, n_tiles, prof, tcodes_T,
            (qe, te), 3, interpret)
    return _qm_call(
        _dp_kernel_qm_rev, 2, Lq, Lt_pad, n_tiles, prof, tcodes_T,
        (qe, te), 3, interpret)


def build_prof_tiles(q_mat, qb_mat, q_lens, qidx, Lq):
    """Device-side per-tile query profiles for the query-major kernels:
    (n_tiles, Lq, PCOLS) bf16 from staged (nq, Lq) codes + bias rows.
    qidx < 0 marks padding tiles (fully -128)."""
    submat = jnp.asarray(BLOSUM62_SCORES, dtype=jnp.int32)
    valid_tile = qidx >= 0
    qi = jnp.maximum(qidx, 0)
    prof = submat[q_mat[qi]] \
        + qb_mat[qi].astype(jnp.int32)[:, :, None]         # (nT, Lq, A)
    a = prof.shape[2]
    prof = jnp.pad(prof, ((0, 0), (0, 0), (0, PCOLS - a)),
                   constant_values=-128)
    iq = jnp.arange(Lq, dtype=jnp.int32)[None, :]
    qlen = jnp.where(valid_tile, q_lens[qi], 0)
    prof = jnp.where((iq < qlen[:, None])[:, :, None], prof, -128)
    return prof.astype(jnp.bfloat16)


def build_tcodes_T(t_mat, t_lens, lj, Lt_pad):
    """Device-side lane-major target codes for the query-major kernels:
    (Lt_pad, n_tiles*TB) int32, padding positions and invalid lanes
    (lj < 0) carry code 21 (the -128 profile column)."""
    valid = lj >= 0
    ljc = jnp.maximum(lj, 0)
    tc = t_mat[ljc].astype(jnp.int32)                      # (nT, TB, Lt)
    tl = jnp.where(valid, t_lens[ljc], 0)
    if tc.shape[2] < Lt_pad:
        tc = jnp.pad(tc, ((0, 0), (0, 0), (0, Lt_pad - tc.shape[2])))
    jt = jnp.arange(Lt_pad, dtype=jnp.int32)[None, None, :]
    tc = jnp.where(jt < tl[:, :, None], tc, 21)
    B = tc.shape[0] * tc.shape[1]
    return tc.reshape(B, Lt_pad).T


def _sharded_align(n_dev):
    """shard_map of _align_full over a 1D fragment-batch mesh: pure data
    parallelism over pairs (every pair's DP is independent)."""
    from jax.sharding import Mesh, PartitionSpec as P

    mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("pairs",))

    def fn(q_enc, q_bias, q_len, t_enc, t_len, Lq, Lt):
        local = jax.shard_map(
            lambda *a: _align_full(*a, Lq, Lt, False),
            mesh=mesh,
            in_specs=(P("pairs"),) * 5,
            out_specs=(P("pairs"),) * 5,
            check_vma=False)
        return local(q_enc, q_bias, q_len, t_enc, t_len)

    return fn


def sw_pallas_align_batch(q_enc, q_bias, q_len, t_enc, t_len, interpret=False):
    """Full batched alignment via the Pallas kernel (ends + reverse-prefix
    starts); drop-in for sw_jax.sw_align_batch. Uses all available devices
    data-parallel over the pair batch."""
    n_dev = len(jax.devices()) if not interpret else 1
    q_enc, q_bias, q_len, t_enc, t_len, B = pad_batch(
        np.asarray(q_enc, np.int32), np.asarray(q_bias, np.int32),
        np.asarray(q_len, np.int32), np.asarray(t_enc, np.int32),
        np.asarray(t_len, np.int32), multiple=TB * n_dev)
    Lq, Lt = int(q_enc.shape[1]), int(t_enc.shape[1])
    if n_dev > 1:
        out = _sharded_align(n_dev)(q_enc, q_bias, q_len, t_enc, t_len, Lq, Lt)
    else:
        out = _align_full(q_enc, q_bias, q_len, t_enc, t_len, Lq, Lt, interpret)
    return tuple(np.asarray(o)[:B] for o in out)


def sw_pallas_align_batch_prof(prof, q_len, t_enc, t_len, interpret=False):
    """Full batched PSSM-vs-sequence alignment via the fused Pallas
    kernel; drop-in for sw_jax.sw_align_batch_prof (the inverted profile
    search's inner loop)."""
    prof = np.asarray(prof, np.int32)
    q_len = np.asarray(q_len, np.int32)
    t_enc = np.asarray(t_enc, np.int32)
    t_len = np.asarray(t_len, np.int32)
    B = prof.shape[0]
    Bp = ((B + TB - 1) // TB) * TB
    if Bp != B:
        pad = Bp - B
        prof = np.pad(prof, ((0, pad), (0, 0), (0, 0)))
        q_len = np.pad(q_len, (0, pad))
        t_enc = np.pad(t_enc, ((0, pad), (0, 0)))
        t_len = np.pad(t_len, (0, pad))
    Lq, Lt = int(prof.shape[1]), int(t_enc.shape[1])
    out = _align_full_prof(prof, q_len, t_enc, t_len, Lq, Lt, interpret)
    return tuple(np.asarray(o)[:B] for o in out)
