"""Shape sweep for the SW forward kernel: per-cell device time vs Lq.

If the rate improves sharply at small Lq (carries fit in vector
registers), the kernel is register-spill-bound, not op-bound.
"""

import sys
import tempfile
import time

import numpy as np


def main():
    import jax
    sys.path.insert(0, ".")
    from tools.kbench import device_time_of
    from metaeuk_tpu.ops import sw_pallas as sp

    CELLS = 1 << 26
    for Lq in (64, 128, 256, 512, 1024):
        Lt = 256
        B = max(128, (CELLS // (Lq * Lt)) // 128 * 128)
        rng = np.random.default_rng(0)
        q_enc = rng.integers(0, 20, (B, Lq)).astype(np.int32)
        q_bias = np.zeros((B, Lq), np.int32)
        q_len = np.full(B, Lq, np.int32)
        t_enc = rng.integers(0, 20, (B, Lt)).astype(np.int32)
        t_len = np.full(B, Lt, np.int32)

        def run():
            out = sp.sw_pallas_ends(q_enc, q_bias, q_len, t_enc, Lq, Lt,
                                    False, t_len=jnp_asarray(t_len))
            return np.asarray(out[0])

        import jax.numpy as jnp
        def jnp_asarray(x):
            return jnp.asarray(x)

        run()
        trace_dir = tempfile.mkdtemp(prefix="swb")
        with jax.profiler.trace(trace_dir):
            for _ in range(5):
                run()
        dev_s, n = device_time_of(trace_dir, "jit_sw_pallas_ends")
        per = dev_s / max(n, 1)
        cells = B * Lq * Lt
        print(f"Lq={Lq:5d} B={B:6d}: {per*1e3:7.3f} ms "
              f"{cells/per/1e9:7.1f} Gcells/s fwd "
              f"({per/cells*1e12:5.1f} ps/cell)", flush=True)


if __name__ == "__main__":
    main()
