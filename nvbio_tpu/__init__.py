"""nvbio_tpu — a TPU-native short-read alignment / bioinformatics framework.

A from-scratch JAX/XLA/Pallas re-design of the capability set of NVlabs/nvbio
(reference: /root/reference): packed strings, FM-index search, DP alignment
(Smith-Waterman / Gotoh / edit-distance / Hamming / Myers), suffix-array & BWT
construction, q-gram indices, Bloom filters, sequence I/O, and a Bowtie2-style
short-read alignment pipeline — all expressed as dense, fixed-shape, batched
dataflow that XLA can tile onto TPU hardware.

Design stance (vs. the CUDA reference):
  * CUDA work-queues / continuation schedulers -> bounded ``lax.scan`` /
    ``lax.while_loop`` passes over dense, masked batches.
  * thrust/CUB primitives -> jnp sorts/scans/segment ops.
  * warp-cooperative DP kernels -> anti-diagonal wavefront vectorization over
    the 8x128 VPU lanes (batch x band cells), Pallas kernels for the hot loops.
  * multi-GPU data parallelism -> ``jax.sharding.Mesh`` + ``shard_map`` over
    read batches with ICI collectives for stat merges.
"""

__version__ = "0.1.0"

from nvbio_tpu.alphabet import Alphabet  # noqa: F401
