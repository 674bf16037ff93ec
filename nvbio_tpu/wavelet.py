"""Wavelet tree: O(log s) rank for alphabets beyond 2 bits.

Capability parity with ``nvbio/strings/wavelet_tree.h:77-331``: per-bit-level
bitvectors (MSB first) with stable partitioning between levels, occ-sampled
rank1 per level. Used for FM-indices over protein/IUPAC alphabets where the
4-symbol popcount rank dictionary does not apply.

Build is host-side numpy; rank queries are batched JAX (log s gathers +
popcounts per query).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np


@dataclasses.dataclass
class WaveletTree:
    bits: int                 # levels (= bits per symbol)
    n: int
    levels_words: Any         # uint32[bits, n_words] bit planes (MSB first)
    levels_cum: Any           # int32[bits, n_words] exclusive rank1 prefixes
    zeros: Any                # int32[bits] count of 0-bits per level

    def device(self) -> "WaveletTree":
        import jax.numpy as jnp

        return WaveletTree(
            self.bits, self.n, jnp.asarray(self.levels_words),
            jnp.asarray(self.levels_cum), jnp.asarray(self.zeros),
        )


def build_wavelet_tree(codes: np.ndarray, bits: int) -> WaveletTree:
    codes = np.asarray(codes, dtype=np.uint32)
    n = len(codes)
    n_words = max(1, (n + 31) // 32)
    words = np.zeros((bits, n_words), dtype=np.uint32)
    cums = np.zeros((bits, n_words), dtype=np.int64)
    zeros = np.zeros(bits, dtype=np.int64)

    cur = codes
    for level in range(bits):
        b = (cur >> (bits - 1 - level)) & 1
        idx = np.nonzero(b[:n])[0] if len(b) else np.zeros(0, np.int64)
        np.bitwise_or.at(
            words[level], idx // 32, np.uint32(1) << (idx % 32).astype(np.uint32)
        )
        popc = np.array([bin(w).count("1") for w in words[level].tolist()])
        np.cumsum(popc[:-1], out=cums[level][1:])
        zeros[level] = int((b == 0).sum())
        # stable partition for the next level
        order = np.argsort(b, kind="stable")
        cur = cur[order]
    return WaveletTree(bits, n, words, cums.astype(np.int32), zeros.astype(np.int32))


def rank(wt: WaveletTree, c, i):
    """# of occurrences of symbol c in codes[0:i), batched (jnp)."""
    import jax
    import jax.numpy as jnp

    c = jnp.asarray(c, jnp.int32)
    i = jnp.asarray(i, jnp.int32)

    def rank1(level, pos):
        w = jnp.take(wt.levels_words[level], pos // 32)
        prefix = w & ((jnp.uint32(1) << (pos % 32).astype(jnp.uint32)) - 1)
        return jnp.take(wt.levels_cum[level], pos // 32) + jax.lax.population_count(
            prefix
        ).astype(jnp.int32)

    lo = jnp.zeros_like(i)
    hi = i
    for level in range(wt.bits):
        bit = (c >> (wt.bits - 1 - level)) & 1
        r_lo = rank1(level, lo)
        r_hi = rank1(level, hi)
        z = wt.zeros[level]
        lo = jnp.where(bit == 1, z + r_lo, lo - r_lo)
        hi = jnp.where(bit == 1, z + r_hi, hi - r_hi)
    return hi - lo
