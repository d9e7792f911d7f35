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
