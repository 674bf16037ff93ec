"""Index sharding across the device mesh (ICI-served lookups).

The reference replicates its FM-index per GPU (``compute_thread.cu:95-112``)
because one genome fits one card; SURVEY §2.5 strategy #10 calls out the new
TPU design space: when the index outgrows a chip's HBM (e.g. the position
table of a many-Gbp reference), shard it over the mesh and serve lookups
with collectives.

Design: buckets are range-partitioned over the ``reads`` axis — device d
owns q-gram keys [d*K/D, (d+1)*K/D). A lookup all-gathers the (small) query
keys over ICI, answers the subset it owns from its local shard, and
``psum``s the (masked, disjoint) answers — the classic replicated-query /
sharded-data pattern, which keeps every transfer dense and fixed-shape (no
ragged all_to_all routing).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from nvbio_tpu.parallel.mesh import READS_AXIS


@dataclasses.dataclass
class ShardedQGramIndex:
    """Per-device slice of a direct-address q-gram index.

    Inside ``shard_map`` each device sees its own (1/D) rows of ``offsets``
    and ``positions`` plus replicated scalars. Built by
    ``shard_qgram_index``; queried with ``sharded_range``/``sharded_locate``
    or — inside the mapping pipeline — ``sharded_seed_hits`` (the pipeline
    dispatches on this type in ``bowtie.pipeline.read_candidates``).

    Positions hold GLOBAL text coordinates (uint32 past 2^31 symbols), so a
    genome whose position table outgrows one chip's HBM — e.g. whole human,
    ~12.4 GB at 3.1 Gbp — is served at 1/D per chip over ICI.
    """

    q: int
    n_shards: int
    keys_per_shard: int        # bucket keys owned per device
    pos_per_shard: int         # padded positions rows per device
    offsets: Any               # int32[D, keys_per_shard + 1] local offsets
    positions: Any             # (u)int32[D, pos_per_shard] global positions
    n: int


jax.tree_util.register_pytree_node(
    ShardedQGramIndex,
    lambda s: ((s.offsets, s.positions),
               (s.q, s.n_shards, s.keys_per_shard, s.pos_per_shard, s.n)),
    lambda aux, ch: ShardedQGramIndex(
        q=aux[0], n_shards=aux[1], keys_per_shard=aux[2],
        pos_per_shard=aux[3], offsets=ch[0], positions=ch[1], n=aux[4]),
)


def shard_qgram_index(index, n_shards: int) -> ShardedQGramIndex:
    """Split a host QGramIndex into D bucket-range shards (host-side).

    Each shard's offsets are rebased to its own position slice and padded to
    a common length so the result is one dense (D, ...) array pair that can
    be placed with a ``PartitionSpec('reads')`` sharding. The key space is
    ceil-divided, so any shard count works.
    """
    n_keys = (1 << (2 * index.q))
    kps = (n_keys + n_shards - 1) // n_shards
    offsets = np.asarray(index.offsets, np.int64)
    pdt = np.asarray(index.positions).dtype
    positions = np.asarray(index.positions)

    slices = []
    local_offsets = []
    for d in range(n_shards):
        a = min(d * kps, n_keys)
        b = min((d + 1) * kps, n_keys)
        lo = int(offsets[a])
        hi = int(offsets[b])
        slices.append(positions[lo:hi])
        loc = (offsets[a:b + 1] - lo).astype(np.int32)
        if len(loc) < kps + 1:  # ragged tail shard: repeat the end offset
            loc = np.concatenate(
                [loc, np.full(kps + 1 - len(loc), loc[-1] if len(loc) else 0,
                              np.int32)])
        local_offsets.append(loc)
    pos_per_shard = max(max(len(s) for s in slices), 1)
    pos = np.zeros((n_shards, pos_per_shard), pdt)
    for d, s in enumerate(slices):
        pos[d, :len(s)] = s
    offs = np.stack(local_offsets).astype(np.int32)
    return ShardedQGramIndex(
        q=index.q, n_shards=n_shards, keys_per_shard=kps,
        pos_per_shard=pos_per_shard, offsets=offs, positions=pos,
        n=index.n,
    )


def place_sharded_index(mesh, sidx: ShardedQGramIndex) -> ShardedQGramIndex:
    """Put the shard arrays on the mesh, one row per device."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P(READS_AXIS))
    return dataclasses.replace(
        sidx,
        offsets=jax.device_put(sidx.offsets, sh),
        positions=jax.device_put(sidx.positions, sh),
    )


def sharded_lookup(sidx_offsets, sidx_positions, keys, slots,
                   *, q: int, n_shards: int, keys_per_shard: int):
    """Inside shard_map: positions for (key, slot) queries + range sizes.

    sidx_offsets/positions are the LOCAL (1, kps+1)/(1, pps) shard rows;
    keys/slots are this device's local query block (any shape). Returns
    (pos, range_size) with the same shape, combined across devices by psum.
    """
    axis = READS_AXIS
    d = jax.lax.axis_index(axis)
    # replicate the queries: every device answers the subset it owns
    all_keys = jax.lax.all_gather(keys, axis)        # (D, ...) same for all
    all_slots = jax.lax.all_gather(slots, axis)
    flat_keys = all_keys.reshape(-1)
    flat_slots = all_slots.reshape(-1)

    local_key = flat_keys - d * keys_per_shard
    mine = (local_key >= 0) & (local_key < keys_per_shard)
    lk = jnp.clip(local_key, 0, keys_per_shard - 1)
    offs = sidx_offsets[0]
    poss = sidx_positions[0]
    lo = jnp.take(offs, lk)
    hi = jnp.take(offs, lk + 1)
    rs = jnp.maximum(hi - lo, 0)
    idx = jnp.clip(lo + flat_slots, 0, poss.shape[0] - 1)
    p = jnp.take(poss, idx)
    p = jnp.where(mine, p, 0)
    rs = jnp.where(mine, rs, 0)
    # shards are disjoint, so the sum IS the owner's answer (rides ICI)
    p = jax.lax.psum(p, axis)
    rs = jax.lax.psum(rs, axis)
    shape = all_keys.shape
    my = jnp.reshape(p, shape)[d], jnp.reshape(rs, shape)[d]
    return my[0].reshape(keys.shape), my[1].reshape(keys.shape)


def sharded_seed_hits(sidx: ShardedQGramIndex, keys, H: int):
    """Pipeline seeding against the bucket-sharded index (inside shard_map).

    keys: (B_local, NS) q-gram seed keys of this device's read block.
    Returns (pos (B_local, NS, H) global positions, range_size (B_local, NS))
    — the same contract as the replicated ``index_range``+``index_locate``
    path in ``read_candidates``, including the jittered stratified slot
    sampling, so sharded and replicated pipelines are bitwise identical.

    Pattern: all_gather the (small) query keys over ICI; each device answers
    the key range it owns from its local offset/position rows; psum combines
    the disjoint masked answers (replicated-query / sharded-data — no ragged
    all_to_all routing, every transfer dense and fixed-shape).
    """
    from nvbio_tpu.qgram import stratified_offsets

    axis = READS_AXIS
    d = jax.lax.axis_index(axis)
    kps = sidx.keys_per_shard
    all_keys = jax.lax.all_gather(keys, axis)        # (D, b, NS)
    Dn, b, NS = all_keys.shape
    flat = all_keys.reshape(Dn * b, NS)
    n_keys = 1 << (2 * sidx.q)
    flat = jnp.clip(flat, 0, n_keys - 1)

    local_key = flat - d * kps
    mine = (local_key >= 0) & (local_key < kps)
    lk = jnp.clip(local_key, 0, kps - 1)
    offs = sidx.offsets[0]                           # (kps + 1,)
    poss = sidx.positions[0]                         # (pps,)
    lo = jnp.take(offs, lk)
    hi = jnp.take(offs, lk + 1)
    rs = jnp.maximum(hi - lo, 0)                     # (DB, NS) local counts
    off = stratified_offsets(rs, H, NS)              # (DB, NS, H)
    idx = jnp.minimum(lo[..., None] + off, offs[-1] - 1)
    idx = jnp.clip(idx, 0, poss.shape[0] - 1)
    p = jnp.take(poss, idx)                          # (DB, NS, H) global pos
    p = jnp.where(mine[..., None], p, jnp.zeros((), p.dtype))
    rs = jnp.where(mine, rs, 0)
    p = jax.lax.psum(p, axis)
    rs = jax.lax.psum(rs, axis)
    p = p.reshape(Dn, b, NS, H)[d]
    rs = rs.reshape(Dn, b, NS)[d]
    return p, rs
