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
    ``shard_qgram_index``; queried with ``sharded_range``/``sharded_locate``.
    """

    q: int
    n_shards: int
    keys_per_shard: int        # bucket keys owned per device
    pos_per_shard: int         # padded positions rows per device
    offsets: Any               # int32[D, keys_per_shard + 1] local offsets
    positions: Any             # int32[D, pos_per_shard]
    n: int


def shard_qgram_index(index, n_shards: int) -> ShardedQGramIndex:
    """Split a host QGramIndex into D bucket-range shards (host-side).

    Each shard's offsets are rebased to its own position slice and padded to
    a common length so the result is one dense (D, ...) array pair that can
    be placed with a ``PartitionSpec('reads')`` sharding.
    """
    n_keys = (1 << (2 * index.q))
    if n_keys % n_shards:
        raise ValueError("4^q must divide by the shard count")
    kps = n_keys // n_shards
    offsets = np.asarray(index.offsets, np.int64)
    positions = np.asarray(index.positions, np.int32)

    slices = []
    local_offsets = []
    for d in range(n_shards):
        lo = int(offsets[d * kps])
        hi = int(offsets[(d + 1) * kps])
        slices.append(positions[lo:hi])
        local_offsets.append((offsets[d * kps:(d + 1) * kps + 1] - lo)
                             .astype(np.int32))
    pos_per_shard = max(max(len(s) for s in slices), 1)
    pos = np.zeros((n_shards, pos_per_shard), np.int32)
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
