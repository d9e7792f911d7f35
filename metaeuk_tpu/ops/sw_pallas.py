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
TB = 128          # pairs per tile (lanes)


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
    submat = jnp.asarray(BLOSUM62_SCORES, dtype=jnp.int32)
    prof = (submat[q_enc] + q_bias[:, :, None]).astype(jnp.float32)  # (B,Lq,21)
    t_oh = jax.nn.one_hot(t_enc, 21, dtype=jnp.float32)              # (B,Lt,21)
    # S[j, i, b] = score of (q_i, t_j) for pair b
    S = jnp.einsum("bia,bja->jib", prof, t_oh,
                   preferred_element_type=jnp.float32).astype(jnp.int8)
    S = jnp.pad(S, ((0, Lt_pad - Lt), (0, 0), (0, 0)))
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
    """One-dispatch full alignment: forward ends + on-device reversed-prefix
    gather + reverse ends. Keeps everything on device — on high-latency
    links (tunneled TPU) host round trips dominate otherwise."""
    score, q_end, t_end = sw_pallas_ends(
        q_enc, q_bias, q_len, t_enc, Lq, Lt, interpret, t_len=t_len)
    qe = jnp.maximum(q_end, 0)
    te = jnp.maximum(t_end, 0)
    iq = jnp.arange(Lq, dtype=jnp.int32)[None, :]
    it = jnp.arange(Lt, dtype=jnp.int32)[None, :]
    q_rev_idx = jnp.maximum(qe[:, None] - iq, 0)
    t_rev_idx = jnp.maximum(te[:, None] - it, 0)
    qr = jnp.take_along_axis(q_enc, q_rev_idx, axis=1)
    br = jnp.take_along_axis(q_bias, q_rev_idx, axis=1)
    tr = jnp.take_along_axis(t_enc, t_rev_idx, axis=1)
    score2, qr_end, tr_end = sw_pallas_ends(
        qr, br, (qe + 1).astype(jnp.int32), tr, Lq, Lt, interpret,
        t_len=(te + 1).astype(jnp.int32))
    aligned = (t_end >= 0) & (score > 0)
    q_start = jnp.where(aligned, qe - qr_end, -1)
    t_start = jnp.where(aligned, te - tr_end, -1)
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
