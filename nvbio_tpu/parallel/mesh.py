"""Mesh construction and the sharded alignment step."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nvbio_tpu.bowtie.params import MapParams
from nvbio_tpu.bowtie.pipeline import align_batch_core

READS_AXIS = "reads"


def make_reads_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D data-parallel mesh over read batches."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return jax.make_mesh((len(devices),), (READS_AXIS,), devices=devices)


def _align_step(fmi, genome_words, n_genome, reads, lens, quals, params):
    """Per-shard pipeline step + on-device stat merge (psum over ICI)."""
    res = align_batch_core(fmi, genome_words, n_genome, reads, lens, quals, params)
    stats = dict(
        n_reads=jnp.sum((lens > 0).astype(jnp.int32)),
        n_mapped=jnp.sum(res["mapped"].astype(jnp.int32)),
        n_unique=jnp.sum(
            (res["mapped"] & ~res["has_second"]).astype(jnp.int32)
        ),
        sum_mapq=jnp.sum(res["mapq"].astype(jnp.int32)),
    )
    stats = {k: jax.lax.psum(v, READS_AXIS) for k, v in stats.items()}
    return res, stats


def sharded_align_step(mesh: Mesh, params: MapParams,
                       index_sharded: bool = False):
    """Build a jitted SPMD alignment step over ``mesh``.

    The read batch is sharded over the READS_AXIS; reference replicated;
    per-read outputs come back sharded, scalar stats fully replicated (psum).
    Batch size must be divisible by the mesh size.

    ``index_sharded=True`` expects a ``ShardedQGramIndex`` whose (D, ...)
    arrays are range-partitioned over the mesh (one bucket-range shard per
    device, served over ICI inside the step — see
    ``parallel.sharded_index.sharded_seed_hits``); ``False`` replicates a
    regular index, the reference's per-GPU model (``compute_thread.cu:95``).
    """
    repl = P()
    shard = P(READS_AXIS)
    idx_spec = shard if index_sharded else repl

    fn = jax.shard_map(
        functools.partial(_align_step, params=params),
        mesh=mesh,
        in_specs=(idx_spec, repl, repl, shard, shard, shard),
        out_specs=(shard, repl),
        check_vma=False,
    )
    return jax.jit(fn)


def shard_batch(mesh: Mesh, arr):
    """Place a host batch array sharded over the reads axis."""
    return jax.device_put(arr, NamedSharding(mesh, P(READS_AXIS)))


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (index/reference) over the mesh."""
    return jax.device_put(tree, NamedSharding(mesh, P()))


def _paired_step(fmi, genome_words, n_genome, r1, l1, q1, r2, l2, q2, params):
    """Per-shard paired-end step + psum'd pairing stats."""
    from nvbio_tpu.bowtie.paired import align_paired_core

    res1, res2, pinfo = align_paired_core(
        fmi, genome_words, n_genome, r1, l1, q1, r2, l2, q2, params)
    stats = dict(
        n_pairs=jnp.sum((l1 > 0).astype(jnp.int32)),
        n_proper=jnp.sum(pinfo["proper"].astype(jnp.int32)),
        n_mapped=jnp.sum((res1["mapped"] | res2["mapped"]).astype(jnp.int32)),
    )
    stats = {k: jax.lax.psum(v, READS_AXIS) for k, v in stats.items()}
    return res1, res2, pinfo, stats


def _all_step(fmi, genome_words, n_genome, reads, lens, quals, params):
    """Per-shard ALL-mapping step (every above-threshold locus) + stats."""
    from nvbio_tpu.bowtie.pipeline import align_batch_all

    res = align_batch_all(fmi, genome_words, n_genome, reads, lens, quals,
                          params)
    stats = dict(
        n_reads=jnp.sum((lens > 0).astype(jnp.int32)),
        n_alignments=jnp.sum(res["keep"].astype(jnp.int32)),
    )
    stats = {k: jax.lax.psum(v, READS_AXIS) for k, v in stats.items()}
    return res, stats


def sharded_all_step(mesh: Mesh, params: MapParams):
    """Jitted SPMD all-mapping step (align_batch_all under shard_map)."""
    repl = P()
    shard = P(READS_AXIS)
    fn = jax.shard_map(
        functools.partial(_all_step, params=params),
        mesh=mesh,
        in_specs=(repl, repl, repl, shard, shard, shard),
        out_specs=(shard, repl),
        check_vma=False,
    )
    return jax.jit(fn)


def sharded_paired_step(mesh: Mesh, params: MapParams):
    """Jitted SPMD paired-end alignment step over ``mesh`` (both mates'
    batches sharded over READS_AXIS; index replicated; pair stats psum'd)."""
    repl = P()
    shard = P(READS_AXIS)
    fn = jax.shard_map(
        functools.partial(_paired_step, params=params),
        mesh=mesh,
        in_specs=(repl, repl, repl, shard, shard, shard, shard, shard, shard),
        out_specs=(shard, shard, shard, repl),
        check_vma=False,
    )
    return jax.jit(fn)
