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


def _tj_for(Lq):
    """Target columns per grid step, sized so the streamed int8 score
    block (TJ, Lq, TB) stays ~<=4MB of VMEM (double-buffered by the grid
    pipeline within the ~16MB budget)."""
    return max(8, min(256, (1 << 22) // (Lq * TB)))


def _dp_kernel(Lq, Lt, TJ, s_ref, qlen_ref, tlen_ref,
               best_out, qend_out, tend_out,
               h_ref, e_ref, best_ref, qend_ref, tend_ref):
    j_chunk = pl.program_id(1)
    n_chunks = pl.num_programs(1)

    @pl.when(j_chunk == 0)
    def _():
        h_ref[:] = jnp.zeros((Lq, TB), jnp.int32)
        e_ref[:] = jnp.zeros((Lq, TB), jnp.int32)
        best_ref[:] = jnp.zeros((8, TB), jnp.int32)
        qend_ref[:] = jnp.full((8, TB), Lq - 1, jnp.int32)
        tend_ref[:] = jnp.full((8, TB), -1, jnp.int32)

    iq = jax.lax.broadcasted_iota(jnp.int32, (Lq, TB), 0)
    q_mask = iq < qlen_ref[0:1, :]
    f_base = -GO - (iq - 1) * GE
    t_len = tlen_ref[0:1, :]

    # number of shift steps for the cumulative max
    n_steps = max(1, (Lq - 1).bit_length())

    def col_body(jj, carry):
        del carry
        j_global = j_chunk * TJ + jj
        s = jnp.where(q_mask, s_ref[jj].astype(jnp.int32), NEG)
        H = h_ref[:]
        E = e_ref[:]
        Hd = jnp.concatenate(
            [jnp.zeros((1, TB), jnp.int32), H[:-1]], axis=0)
        G = jnp.maximum(0, jnp.maximum(Hd + s, E))
        # shifted cumulative max of A = G + i*ge along sublanes
        A = G + iq * GE
        shift = 1
        for _ in range(n_steps):
            A = jnp.maximum(
                A, jnp.concatenate(
                    [jnp.full((shift, TB), NEG, jnp.int32), A[:-shift]], axis=0))
            shift *= 2
        M = jnp.concatenate(
            [jnp.full((1, TB), NEG, jnp.int32), A[:-1]], axis=0)
        F = M + f_base
        Hn = jnp.maximum(G, F)
        col_max = jnp.max(Hn, axis=0, keepdims=True)        # (1, TB)
        improved = (col_max > best_ref[0:1, :]) & (j_global < t_len)
        # first query row attaining the column max
        qe_col = jnp.min(jnp.where(Hn == col_max, iq, BIG), axis=0, keepdims=True)
        best_ref[0:1, :] = jnp.where(improved, col_max, best_ref[0:1, :])
        tend_ref[0:1, :] = jnp.where(improved, j_global, tend_ref[0:1, :])
        qend_ref[0:1, :] = jnp.where(improved, qe_col, qend_ref[0:1, :])
        e_ref[:] = jnp.maximum(jnp.maximum(E - GE, Hn - GO), 0)
        h_ref[:] = Hn
        return 0

    jax.lax.fori_loop(0, TJ, col_body, 0)

    @pl.when(j_chunk == n_chunks - 1)
    def _():
        best_out[:] = best_ref[0:1, :]
        qend_out[:] = qend_ref[0:1, :]
        tend_out[:] = tend_ref[0:1, :]


def _build_S_gapped(q_enc, q_bias, t_enc, Lq, Lt, Lt_pad):
    """S[j, i, b] = blosum[q_i, t_j] + bias_i via batched MXU matmul."""
    submat = jnp.asarray(BLOSUM62_SCORES, dtype=jnp.int32)
    prof = (submat[q_enc] + q_bias[:, :, None]).astype(jnp.float32)  # (B,Lq,21)
    t_oh = jax.nn.one_hot(t_enc, 21, dtype=jnp.float32)              # (B,Lt,21)
    S = jnp.einsum("bia,bja->jib", prof, t_oh,
                   preferred_element_type=jnp.float32).astype(jnp.int8)
    return jnp.pad(S, ((0, Lt_pad - Lt), (0, 0), (0, 0)))


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
    S = _build_S_gapped(q_enc, q_bias, t_enc, Lq, Lt, Lt_pad)
    qlen2 = q_len.reshape(1, B).astype(jnp.int32)
    tlen2 = t_len.reshape(1, B).astype(jnp.int32)

    nb = B // TB
    nj = Lt_pad // TJ
    kernel = functools.partial(_dp_kernel, Lq, Lt_pad, TJ)
    best, q_end, t_end = pl.pallas_call(
        kernel,
        grid=(nb, nj),
        in_specs=[
            pl.BlockSpec((TJ, Lq, TB), lambda b, j: (j, 0, b),
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
            pltpu.VMEM((Lq, TB), jnp.int32),   # H
            pltpu.VMEM((Lq, TB), jnp.int32),   # E
            pltpu.VMEM((8, TB), jnp.int32),    # best
            pltpu.VMEM((8, TB), jnp.int32),    # q_end
            pltpu.VMEM((8, TB), jnp.int32),    # t_end
        ],
        interpret=interpret,
    )(S, qlen2, tlen2)
    return best[0], q_end[0], t_end[0]


def _dp_kernel_rev(Lq, Lt, TJ, s_ref, qe_ref, te_ref,
                   score_out, qstart_out, tstart_out,
                   h_ref, e_ref, best_ref, qs_ref, ts_ref):
    """Reverse-prefix DP on the SAME streamed score matrix: columns walk
    te..0 and rows are mirrored, which is exactly the reference's
    reversed-prefix pass (ssw_align_private:398-482) without any host or
    device gathers. Tie-breaking: first strict improvement in the reversed
    scan (largest original column), then the largest query row."""
    j_chunk = pl.program_id(1)
    n_chunks = pl.num_programs(1)

    @pl.when(j_chunk == 0)
    def _():
        h_ref[:] = jnp.zeros((Lq, TB), jnp.int32)
        e_ref[:] = jnp.zeros((Lq, TB), jnp.int32)
        best_ref[:] = jnp.zeros((8, TB), jnp.int32)
        qs_ref[:] = jnp.zeros((8, TB), jnp.int32)
        ts_ref[:] = jnp.full((8, TB), -1, jnp.int32)

    iq = jax.lax.broadcasted_iota(jnp.int32, (Lq, TB), 0)
    q_mask = iq <= qe_ref[0:1, :]
    f_base = -GO + (iq + 1) * GE
    te = te_ref[0:1, :]
    n_steps = max(1, (Lq - 1).bit_length())

    def col_body(jj, carry):
        del carry
        # grid chunks and columns both run high -> low
        j_global = (n_chunks - 1 - j_chunk) * TJ + (TJ - 1 - jj)
        s = jnp.where(q_mask & (j_global <= te),
                      s_ref[TJ - 1 - jj].astype(jnp.int32), NEG)
        H = h_ref[:]
        E = e_ref[:]
        # diagonal predecessor is one row BELOW (i+1)
        Hd = jnp.concatenate([H[1:], jnp.zeros((1, TB), jnp.int32)], axis=0)
        G = jnp.maximum(0, jnp.maximum(Hd + s, E))
        # F(i) = max_{k>i} (G(k) - go - (k-1-i)*ge): suffix cummax
        A = G - iq * GE
        shift = 1
        for _ in range(n_steps):
            A = jnp.maximum(
                A, jnp.concatenate(
                    [A[shift:], jnp.full((shift, TB), NEG, jnp.int32)], axis=0))
            shift *= 2
        M = jnp.concatenate([A[1:], jnp.full((1, TB), NEG, jnp.int32)], axis=0)
        F = M + f_base
        Hn = jnp.maximum(G, F)
        col_max = jnp.max(Hn, axis=0, keepdims=True)
        improved = col_max > best_ref[0:1, :]
        # LARGEST query row attaining the column max (reversed-row order)
        qs_col = jnp.max(jnp.where(Hn == col_max, iq, -BIG), axis=0,
                         keepdims=True)
        best_ref[0:1, :] = jnp.where(improved, col_max, best_ref[0:1, :])
        ts_ref[0:1, :] = jnp.where(improved, j_global, ts_ref[0:1, :])
        qs_ref[0:1, :] = jnp.where(improved, qs_col, qs_ref[0:1, :])
        e_ref[:] = jnp.maximum(jnp.maximum(E - GE, Hn - GO), 0)
        h_ref[:] = Hn
        return 0

    jax.lax.fori_loop(0, TJ, col_body, 0)

    @pl.when(j_chunk == n_chunks - 1)
    def _():
        score_out[:] = best_ref[0:1, :]
        qstart_out[:] = qs_ref[0:1, :]
        tstart_out[:] = ts_ref[0:1, :]


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
            pltpu.VMEM((8, TB), jnp.int32),
            pltpu.VMEM((8, TB), jnp.int32),
            pltpu.VMEM((8, TB), jnp.int32),
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
    S = _build_S_gapped(q_enc, q_bias, t_enc, Lq, Lt, Lt_pad)
    qlen2 = q_len.reshape(1, B).astype(jnp.int32)
    tlen2 = t_len.reshape(1, B).astype(jnp.int32)
    nb = B // TB
    nj = Lt_pad // TJ
    kernel = functools.partial(_dp_kernel, Lq, Lt_pad, TJ)
    best, q_end, t_end = pl.pallas_call(
        kernel,
        grid=(nb, nj),
        in_specs=[
            pl.BlockSpec((TJ, Lq, TB), lambda b, j: (j, 0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TB), lambda b, j: (0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TB), lambda b, j: (0, b), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, TB), lambda b, j: (0, b), memory_space=pltpu.VMEM),
        ] * 3,
        out_shape=[jax.ShapeDtypeStruct((1, B), jnp.int32)] * 3,
        scratch_shapes=[
            pltpu.VMEM((Lq, TB), jnp.int32),
            pltpu.VMEM((Lq, TB), jnp.int32),
            pltpu.VMEM((8, TB), jnp.int32),
            pltpu.VMEM((8, TB), jnp.int32),
            pltpu.VMEM((8, TB), jnp.int32),
        ],
        interpret=interpret,
    )(S, qlen2, tlen2)
    score, q_end, t_end = best[0], q_end[0], t_end[0]
    qe = jnp.maximum(q_end, 0)
    te = jnp.maximum(t_end, 0)
    score2, q_start, t_start = _sw_pallas_starts_from_S(
        S, qe, te, Lq, Lt_pad, B, interpret)
    aligned = (t_end >= 0) & (score > 0)
    q_start = jnp.where(aligned, q_start, -1)
    t_start = jnp.where(aligned, t_start, -1)
    return score, q_start, q_end, t_start, t_end


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
