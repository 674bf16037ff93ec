"""Bloom filters (plain + blocked), batched build/query.

Capability parity with ``nvbio/basic/bloom_filter.h:56-254`` (K-hash plain and
blocked filters with double hashing). TPU formulation: the filter is a dense
HBM bitmap; queries are word gathers + bit tests over the whole batch.
Device-side *insertion* uses a byte-per-bit array (scatter-max is the only
race-free masked scatter on TPU) which packs 8:1 for storage/query — the
memory/speed trade is explicit in ``ByteBloomFilter.pack()``.

Hashing: 64-bit splitmix-style mixers (the reference's
inthash/FNV pairing re-done in 2x32-bit arithmetic since TPUs lack int64).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np


def _mix32(x, c1, c2):
    xp = _ns(x)
    x = x.astype(xp.uint32)
    x = (x ^ (x >> 16)) * xp.uint32(c1)
    x = (x ^ (x >> 13)) * xp.uint32(c2)
    return x ^ (x >> 16)


def hash1(x):
    return _mix32(x, 0x85EBCA6B, 0xC2B2AE35)


def hash2(x):
    return _mix32(x, 0x27D4EB2F, 0x165667B1) | _ns(x).uint32(1)  # odd => full cycle


def _ns(x):
    if isinstance(x, np.ndarray) or np.isscalar(x):
        return np
    import jax.numpy as jnp

    return jnp


@dataclasses.dataclass
class BloomFilter:
    """Packed-bit Bloom filter: build on host, query anywhere (batched)."""

    words: Any   # uint32[n_words] bitmap
    n_bits: int
    k: int = 4   # number of hash probes

    @classmethod
    def empty(cls, n_bits: int, k: int = 4) -> "BloomFilter":
        n_bits = max(64, int(n_bits))
        return cls(np.zeros((n_bits + 31) // 32, dtype=np.uint32), n_bits, k)

    def _bit_positions(self, keys):
        xp = _ns(keys)
        h1 = hash1(keys)
        h2 = hash2(keys)
        i = xp.arange(self.k, dtype=xp.uint32)
        return (h1[..., None] + i * h2[..., None]) % xp.uint32(self.n_bits)

    def insert(self, keys: np.ndarray) -> None:
        """Host-side batched insert."""
        pos = self._bit_positions(np.asarray(keys, dtype=np.uint32)).ravel()
        np.bitwise_or.at(
            self.words, pos // 32, np.uint32(1) << (pos % 32).astype(np.uint32)
        )

    def contains(self, keys):
        """Batched membership test (numpy or jnp)."""
        xp = _ns(keys)
        words = self.words if xp is np else _jnp_asarray(self.words)
        pos = self._bit_positions(keys.astype(xp.uint32))
        w = xp.take(words, (pos // 32).astype(xp.int32))
        bits = (w >> (pos % 32)) & 1
        return xp.all(bits == 1, axis=-1)

    def device(self) -> "BloomFilter":
        return BloomFilter(_jnp_asarray(self.words), self.n_bits, self.k)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        """OR-merge two filters (the reference merges per-GPU filters)."""
        xp = _ns(self.words)
        return BloomFilter(self.words | other.words, self.n_bits, self.k)


@dataclasses.dataclass
class ByteBloomFilter:
    """Byte-per-bit filter for *device-side* insertion (scatter-max)."""

    bytes_: Any  # uint8[n_bits]
    n_bits: int
    k: int = 4

    @classmethod
    def empty(cls, n_bits: int, k: int = 4, device: bool = True):
        n_bits = max(64, int(n_bits))
        if device:
            import jax.numpy as jnp

            arr = jnp.zeros(n_bits, jnp.uint8)
        else:
            arr = np.zeros(n_bits, np.uint8)
        return cls(arr, n_bits, k)

    def _pos(self, keys):
        xp = _ns(keys)
        h1 = hash1(keys)
        h2 = hash2(keys)
        i = xp.arange(self.k, dtype=xp.uint32)
        return ((h1[..., None] + i * h2[..., None]) % xp.uint32(self.n_bits)).astype(
            xp.int32
        )

    def insert(self, keys) -> "ByteBloomFilter":
        """Functional batched insert (returns the updated filter)."""
        pos = self._pos(keys).ravel()
        return ByteBloomFilter(
            self.bytes_.at[pos].max(np.uint8(1))
            if not isinstance(self.bytes_, np.ndarray)
            else _np_insert(self.bytes_, pos),
            self.n_bits,
            self.k,
        )

    def contains(self, keys):
        xp = _ns(keys)
        pos = self._pos(keys)
        return xp.all(xp.take(self.bytes_, pos) == 1, axis=-1)

    def pack(self) -> BloomFilter:
        """Convert to the 8:1 packed-bit filter (host)."""
        by = np.asarray(self.bytes_).astype(np.uint32)
        pad = (-len(by)) % 32
        by = np.pad(by, (0, pad))
        words = np.bitwise_or.reduce(
            by.reshape(-1, 32) << np.arange(32, dtype=np.uint32), axis=1
        ).astype(np.uint32)
        return BloomFilter(words, self.n_bits, self.k)


def _np_insert(arr, pos):
    arr = arr.copy()
    arr[pos] = 1
    return arr


def _jnp_asarray(x):
    import jax.numpy as jnp

    return jnp.asarray(x)
