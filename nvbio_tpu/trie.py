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


# ---------------------------------------------------------------------------
# Suffix trie over a text, backed by the FM-index (suffix_trie.h:77-295
# parity). The reference materializes TrieNode records (child pointer +
# child mask + subtree size) by traversing an FM-index; pointer-chasing is
# hostile to the TPU, so the build here is a BREADTH-FIRST frontier sweep:
# every level extends ALL frontier nodes by all 4 symbols in one batched
# rank call (fmi.search.extend_backward_all over the REVERSED text's index,
# so right-extension of the node label is one backward step), and the CSR
# node table grows level by level. Traversal after the build is the dense
# gather walk of CsrTrie.
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class SuffixTrie:
    """CSR suffix trie: node 0 is the root (empty string).

    ``children[u, c]`` = child node of u under symbol c (-1 none) — the
    uncompressed layout; ``mask``/``first_child`` carry the compressed
    TrieNode form (suffix_trie.h:76-133 m_mask/m_child) so both reference
    layouts are served from one table. ``count[u]`` (m_size) = occurrences
    of u's label as a substring; ``sa_lo[u]`` = the label's first row in
    the reversed-text FM interval (locate hook)."""

    children: np.ndarray    # (n_nodes, 4) int32
    mask: np.ndarray        # (n_nodes,) uint8 active-children bits
    first_child: np.ndarray  # (n_nodes,) int32 (-1 = leaf)
    count: np.ndarray       # (n_nodes,) int32 subtree occurrence count
    depth: np.ndarray       # (n_nodes,) int32 label length
    sa_lo: np.ndarray       # (n_nodes,) int32 rev-FM interval start

    @classmethod
    def build(cls, text_codes: np.ndarray, max_depth: int | None = None,
              min_count: int = 1) -> "SuffixTrie":
        """Build from a 2-bit text. Nodes with a unique occurrence
        (count == 1) become leaves (their downward path is determined);
        ``max_depth`` bounds the label length; ``min_count`` prunes rare
        substrings (> 1 turns the trie into a frequent-substring index)."""
        import jax.numpy as jnp

        from nvbio_tpu.fmi.index import build_fmindex
        from nvbio_tpu.fmi.search import extend_backward_all

        text = np.asarray(text_codes, np.uint8)
        n = len(text)
        if max_depth is None:
            max_depth = n
        fmi = build_fmindex(text[::-1].copy()).device()

        children = [np.full(4, -1, np.int32)]
        mask = [0]
        count = [n + 1]
        depth = [0]
        sa_lo = [0]
        frontier_nodes = np.array([0], np.int64)
        lo = np.array([0], np.int32)
        hi = np.array([n + 1], np.int32)

        import functools as _ft

        @_ft.partial(__import__("jax").jit)
        def expand(lo, hi):
            lo4, hi4 = extend_backward_all(fmi, jnp.asarray(lo),
                                           jnp.asarray(hi))
            return lo4, hi4 - lo4

        for d in range(1, max_depth + 1):
            if not len(frontier_nodes):
                break
            lo4, sz4 = (np.asarray(a) for a in expand(lo, hi))
            # expandable = real child AND worth descending into
            live = sz4 >= max(min_count, 1)
            n_new = int(live.sum())
            if not n_new:
                break
            new_lo, new_hi, new_nodes = [], [], []
            for row, u in enumerate(frontier_nodes):
                m = 0
                for c in range(4):
                    if not live[row, c]:
                        continue
                    v = len(children)
                    children[u][c] = v
                    m |= 1 << c
                    children.append(np.full(4, -1, np.int32))
                    mask.append(0)
                    count.append(int(sz4[row, c]))
                    depth.append(d)
                    sa_lo.append(int(lo4[row, c]))
                    # unique labels are leaves: the subtree is a bare path
                    if sz4[row, c] > 1 and d < max_depth:
                        new_nodes.append(v)
                        new_lo.append(int(lo4[row, c]))
                        new_hi.append(int(lo4[row, c] + sz4[row, c]))
                mask[u] = m
            frontier_nodes = np.asarray(new_nodes, np.int64)
            lo = np.asarray(new_lo, np.int32)
            hi = np.asarray(new_hi, np.int32)

        ch = np.stack(children)
        # m_child = the FIRST active child id (children are allocated in
        # symbol order, so it is the min over active slots)
        act = np.where(ch >= 0, ch, np.iinfo(np.int32).max)
        first = np.where(np.asarray(mask, np.uint8) != 0,
                         act.min(axis=1), -1).astype(np.int32)
        return cls(children=ch, mask=np.asarray(mask, np.uint8),
                   first_child=first, count=np.asarray(count, np.int32),
                   depth=np.asarray(depth, np.int32),
                   sa_lo=np.asarray(sa_lo, np.int32))

    def is_leaf(self, u: int) -> bool:
        return self.mask[u] == 0

    def nth_child(self, u: int, i: int) -> int:
        """i-th ACTIVE child (compressed-layout accessor: popcount select,
        suffix_trie.h TrieNode::nth_child)."""
        m = int(self.mask[u])
        for c in range(4):
            if m & (1 << c):
                if i == 0:
                    return int(self.children[u, c])
                i -= 1
        return -1

    def walk(self, queries: np.ndarray, qlens: np.ndarray):
        """Batched descent (device dense gathers): returns the node id
        reached by each query (-1 = fell off the trie) and its count."""
        import jax.numpy as jnp

        ch = jnp.asarray(self.children)
        cnt = jnp.asarray(self.count)
        q = jnp.asarray(queries, jnp.int32)
        B, L = q.shape
        node = jnp.zeros((B,), jnp.int32)
        for j in range(L):
            step = ch[jnp.clip(node, 0, ch.shape[0] - 1),
                      jnp.clip(q[:, j], 0, 3)]
            node = jnp.where((j < jnp.asarray(qlens)) & (node >= 0),
                             step, node)
        ok = node >= 0
        return node, jnp.where(ok, cnt[jnp.clip(node, 0, len(cnt) - 1)], 0)
