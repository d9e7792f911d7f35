"""Multi-chip sharded search step.

TPU-native replacement for the reference's split/MPI parallelism
(Prefiltering::runSplits / runMpiSplits, lib/mmseqs/src/prefiltering/
Prefiltering.cpp:575-770, and Alignment::run(mpiRank,...),
alignment/Alignment.cpp:219-243): instead of rank-partitioned files and a
master-side merge, the (fragment, target) alignment grid is laid out on a
2D device mesh —

  axis "frags":   fragment batches data-parallel (the contig/query dim)
  axis "targets": the target DB sharded across devices (the memory dim)

Each device aligns its local fragment block against its local target
shard; per-fragment results are combined with an all-gather over the
"targets" axis (rides ICI), after which every device holds the full hit
rows for its fragment block. Host-side E-value filtering then proceeds
exactly as in the single-chip path.
"""

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..data.submat import BLOSUM62_SCORES
from ..ops.sw_jax import sw_batch_ends

FRAGS_AXIS = "frags"
TARGETS_AXIS = "targets"


def make_mesh(devices=None, frags=None, targets=None):
    """Build the 2D search mesh. Defaults: targets axis = 1 (replicated DB),
    all devices data-parallel over fragments."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if frags is None and targets is None:
        targets = 1
        frags = n
    elif frags is None:
        frags = n // targets
    elif targets is None:
        targets = n // frags
    import numpy as np
    dev_array = np.asarray(devices).reshape(frags, targets)
    return Mesh(dev_array, (FRAGS_AXIS, TARGETS_AXIS))


def sharded_search_step(mesh, Lq, Lt):
    """Returns a jitted step: (q_enc, q_bias, q_len, t_enc, t_len) -> hits.

    Inputs are globally shaped (Bq, Lq) fragments and (Nt, Lt) targets;
    the function shards fragments over FRAGS_AXIS and targets over
    TARGETS_AXIS, aligns the full cross product, and all-gathers the
    per-target-shard results so each fragment row is complete.

    Output: (score, q_end, t_end) arrays of shape (Bq, Nt), sharded over
    FRAGS_AXIS and replicated over TARGETS_AXIS.
    """

    def local_step(q_enc, q_bias, q_len, t_enc, t_len):
        nq = q_enc.shape[0]          # local fragment count
        nt = t_enc.shape[0]          # local target count
        # cross product of local fragments x local targets
        qi = jnp.repeat(jnp.arange(nq), nt)
        ti = jnp.tile(jnp.arange(nt), nq)
        score, q_end, t_end = sw_batch_ends(
            q_enc[qi], q_bias[qi], q_len[qi], t_enc[ti], Lq, Lt,
            t_len=t_len[ti])
        score = score.reshape(nq, nt)
        q_end = q_end.reshape(nq, nt)
        t_end = t_end.reshape(nq, nt)
        # complete each fragment row across the target shards (ICI all-gather)
        score = jax.lax.all_gather(score, TARGETS_AXIS, axis=1, tiled=True)
        q_end = jax.lax.all_gather(q_end, TARGETS_AXIS, axis=1, tiled=True)
        t_end = jax.lax.all_gather(t_end, TARGETS_AXIS, axis=1, tiled=True)
        return score, q_end, t_end

    step = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P(FRAGS_AXIS, None), P(FRAGS_AXIS, None), P(FRAGS_AXIS),
                  P(TARGETS_AXIS, None), P(TARGETS_AXIS)),
        out_specs=(P(FRAGS_AXIS, None), P(FRAGS_AXIS, None), P(FRAGS_AXIS, None)),
        check_vma=False,
    )
    return jax.jit(step)
