"""metaeuk_tpu — a TPU-native gene-discovery framework.

A from-scratch reimplementation of the capabilities of MetaEuk
(homology-based eukaryotic gene prediction in metagenomic contigs),
designed TPU-first: JAX/XLA/Pallas compute kernels, pjit/shard_map
distribution over device meshes, and a thin host layer for I/O.

Pipeline (mirrors reference easy-predict, /root/reference/data/easypredict.sh):
  contigs → six-frame stop-to-stop putative protein fragments
          → batched Smith-Waterman search against a protein target DB
          → per-(contig,target,strand) exon-chaining dynamic program
          → redundancy reduction + same-strand overlap resolution
          → FASTA / GFF / TSV outputs (byte-parity with the reference)
          → optional taxonomy assignment (weighted LCA voting)
"""

__version__ = "0.1.0"


def _enable_compilation_cache():
    """Persistent XLA compilation cache — kernel compiles are expensive on
    tunneled TPU links; cache them across runs."""
    import os
    try:
        import jax
        cache_dir = os.environ.get(
            "METAEUK_TPU_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "metaeuk_tpu_xla"))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # persist EVERY executable: sub-second compiles add up to tens of
        # seconds of per-process cold start across the pipeline's shape
        # set, and a cache hit costs ~40 ms (measured on the tunneled
        # dev chip: 0.94 s compile vs 0.044 s hit)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass


_enable_compilation_cache()
