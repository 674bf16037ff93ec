"""Tries over small string dictionaries.

Capability parity with ``nvbio/trie`` (``suffix_trie.h:77-295``,
``sorted_dictionary.h``). TPU-first redesign: a trie walk is pointer chasing —
hostile to vector hardware — so the *sorted dictionary* form is primary: the
dictionary is a sorted array of packed keys and every trie operation
(membership, prefix range, successor) becomes a batched ``searchsorted``
(binary search = log n vectorized compares). An explicit CSR node table is
also provided for algorithms that genuinely need node-level traversal
(e.g. de-Bruijn-style walks), built host-side, walked with dense gathers.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np


def pack_keys(strings, bits: int = 2, max_len: int = 10) -> np.ndarray:
    """Pack code arrays into length-tagged int64 keys preserving lexicographic
    order: (symbols, MSB-first) then shorter-is-smaller via a length pad.

    Each slot uses bits+1 bits (symbols stored as code+1 so the 0 pad sorts
    below any symbol)."""
    sbits = bits + 1
    if sbits * max_len > 62:
        raise ValueError("max_len too large for int64 keys")
    # NOTE: keys wider than 31 bits are host-only (TPU jax runs with x64
    # disabled); the default max_len=10 keeps DNA keys int32-safe
    out = np.zeros(len(strings), dtype=np.int64)
    for i, s in enumerate(strings):
        if len(s) > max_len:
            raise ValueError("key too long")
        v = 0
        for c in s:
            v = (v << sbits) | (int(c) + 1)  # +1 so 0 pads below any symbol
        v <<= sbits * (max_len - len(s))
        out[i] = v
    return out


@dataclasses.dataclass
class SortedDictionary:
    """Sorted-dictionary trie: batched lookups via searchsorted."""

    keys: Any                 # int64[n] sorted packed keys
    payload: Any              # int32[n] user values
    bits: int = 2
    max_len: int = 10

    @classmethod
    def build(cls, strings, payload=None, bits: int = 2, max_len: int = 10):
        keys = pack_keys(strings, bits, max_len)
        order = np.argsort(keys, kind="stable")
        pay = (np.arange(len(strings), dtype=np.int32) if payload is None
               else np.asarray(payload, dtype=np.int32))
        return cls(keys[order], pay[order], bits, max_len)

    def device(self) -> "SortedDictionary":
        import jax.numpy as jnp

        if (self.bits + 1) * self.max_len > 31:
            raise ValueError(
                "keys wider than 31 bits cannot round-trip through the "
                "x64-disabled device; use a smaller max_len"
            )
        return SortedDictionary(
            jnp.asarray(self.keys), jnp.asarray(self.payload),
            self.bits, self.max_len,
        )

    def find(self, queries):
        """Batched exact lookup of packed query keys.

        Returns (found bool[...], payload int32[...])."""
        xp = np if isinstance(self.keys, np.ndarray) else _jnp()
        idx = xp.searchsorted(self.keys, queries)
        idx_c = xp.clip(idx, 0, len(self.keys) - 1)
        hit = xp.take(self.keys, idx_c) == queries
        return hit, xp.where(hit, xp.take(self.payload, idx_c), -1)

    def prefix_range(self, prefix_codes):
        """[lo, hi) of dictionary entries starting with the given prefix."""
        xp = np if isinstance(self.keys, np.ndarray) else _jnp()
        sbits = self.bits + 1
        plen = len(prefix_codes)
        v = 0
        for c in prefix_codes:
            v = (v << sbits) | (int(c) + 1)
        lo_key = v << (sbits * (self.max_len - plen))
        hi_key = (v + 1) << (sbits * (self.max_len - plen))
        return (
            int(xp.searchsorted(self.keys, lo_key)),
            int(xp.searchsorted(self.keys, hi_key)),
        )


@dataclasses.dataclass
class CsrTrie:
    """Explicit trie in CSR form for node-level traversal (host build)."""

    children: np.ndarray   # int32[n_nodes, n_symbols] child ids (-1 = none)
    terminal: np.ndarray   # int32[n_nodes] payload (-1 = internal)

    @classmethod
    def build(cls, strings, payload=None, n_symbols: int = 4):
        children = [np.full(n_symbols, -1, np.int32)]
        terminal = [-1]
        for i, s in enumerate(strings):
            node = 0
            for c in s:
                nxt = children[node][c]
                if nxt < 0:
                    nxt = len(children)
                    children[node][c] = nxt
                    children.append(np.full(n_symbols, -1, np.int32))
                    terminal.append(-1)
                node = nxt
            terminal[node] = i if payload is None else int(payload[i])
        return cls(np.stack(children), np.asarray(terminal, np.int32))

    def walk(self, queries: np.ndarray, qlens: np.ndarray):
        """Batched walk (device-friendly dense gathers): returns payloads."""
        import jax.numpy as jnp

        ch = jnp.asarray(self.children)
        term = jnp.asarray(self.terminal)
        q = jnp.asarray(queries, jnp.int32)
        B, L = q.shape
        node = jnp.zeros((B,), jnp.int32)
        for j in range(L):
            step = ch[jnp.clip(node, 0, ch.shape[0] - 1), q[:, j]]
            node = jnp.where(
                (j < jnp.asarray(qlens)) & (node >= 0), step, node
            )
        return jnp.where(node >= 0, term[jnp.clip(node, 0, len(term) - 1)], -1)


def _jnp():
    import jax.numpy as jnp

    return jnp
