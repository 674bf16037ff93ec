"""Q-gram (k-mer) indices: direct-address lookup tables over packed texts.

Capability parity with ``nvbio/qgram`` (``qgram.h:414-662`` sorted q-gram
index, ``qgroup.h:81-200`` Q-Group index, ``filter.h:67-214`` batch filters).

TPU-first design: the *direct-address* layout (bucket offsets of size 4^q + a
position table sorted by q-gram) turns a seed lookup into two HBM gathers —
no backward search, no suffix-array walk — which is why it is also the fast
seeding path of the read-mapping pipeline. The FM-index remains the compact /
full-text-search structure; the q-gram table trades memory (4(n + 4^q) bytes)
for gather count.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import numpy as np


@dataclasses.dataclass
class QGramIndex:
    """Direct-address q-gram index of a 2-bit text."""

    q: int
    offsets: Any    # int32[4^q + 1] bucket start offsets
    positions: Any  # int32[n - q + 1] text positions sorted by (qgram, pos)
    n: int          # text length

    def device(self) -> "QGramIndex":
        import jax.numpy as jnp

        return QGramIndex(
            self.q, jnp.asarray(self.offsets), jnp.asarray(self.positions), self.n
        )

    def save(self, path: str) -> None:
        np.savez_compressed(
            path, q=self.q, offsets=np.asarray(self.offsets),
            positions=np.asarray(self.positions), n=self.n,
        )

    @classmethod
    def load(cls, path: str) -> "QGramIndex":
        z = np.load(path)
        return cls(int(z["q"]), z["offsets"], z["positions"], int(z["n"]))


jax.tree_util.register_pytree_node(
    QGramIndex,
    lambda s: ((s.offsets, s.positions), (s.q, s.n)),
    lambda aux, ch: QGramIndex(q=aux[0], offsets=ch[0], positions=ch[1], n=aux[1]),
)


def qgram_keys(codes: np.ndarray, q: int) -> np.ndarray:
    """Rolling q-gram keys of a code array: key[i] = codes[i:i+q] base-4,
    big-endian (first symbol in the high bits). int64 host-side."""
    codes = np.asarray(codes, dtype=np.int64)
    n = len(codes) - q + 1
    if n <= 0:
        return np.zeros(0, dtype=np.int64)
    keys = np.zeros(n, dtype=np.int64)
    for j in range(q):
        keys = (keys << 2) | codes[j:j + n]
    return keys


def build_qgram_index(codes: np.ndarray, q: int = 12) -> QGramIndex:
    """Host-side construction (counting sort over buckets)."""
    if q < 1 or q > 15:
        raise ValueError("q must be in [1, 15] for int32 keys")
    keys = qgram_keys(codes, q)
    n_buckets = 1 << (2 * q)
    counts = np.bincount(keys, minlength=n_buckets)
    offsets = np.zeros(n_buckets + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    order = np.argsort(keys, kind="stable")  # positions sorted by key, then pos
    if len(keys) >= 2**31:
        raise ValueError("text too long for int32 q-gram positions")
    return QGramIndex(
        q=q,
        offsets=offsets.astype(np.int32),
        positions=order.astype(np.int32),
        n=len(codes),
    )


def seed_keys_from_batch(seeds, q: int):
    """Pack the first q symbols of dense seeds (..., s>=q) into int32 keys
    (big-endian, matching ``qgram_keys``)."""
    import jax.numpy as jnp

    shifts = (2 * (q - 1 - jnp.arange(q, dtype=jnp.int32)))
    return jnp.sum(
        seeds[..., :q].astype(jnp.int32) << shifts, axis=-1
    ).astype(jnp.int32)


def qgram_range(index: QGramIndex, keys):
    """Bucket ranges [lo, hi) for q-gram keys (device, batched)."""
    import jax.numpy as jnp

    keys = jnp.clip(keys, 0, (1 << (2 * index.q)) - 1)
    lo = jnp.take(index.offsets, keys)
    hi = jnp.take(index.offsets, keys + 1)
    return lo, hi


def qgram_locate(index: QGramIndex, lo, slot):
    """Text positions for hit slots within bucket ranges: positions[lo+slot]."""
    import jax.numpy as jnp

    idx = jnp.clip(lo + slot, 0, index.positions.shape[0] - 1)
    return jnp.take(index.positions, idx)


def qgram_count(index: QGramIndex, queries, qlens=None):
    """Batch hit counting (the QGramFilter 'rank' pass): queries (B, L>=q)."""
    keys = seed_keys_from_batch(queries, index.q)
    lo, hi = qgram_range(index, keys)
    return hi - lo
