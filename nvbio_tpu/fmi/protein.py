"""Protein/IUPAC FM-index: wavelet-tree BWT for alphabets beyond 2 bits.

The reference's wavelet tree exists to serve FM-indices over large alphabets
(``nvbio/strings/wavelet_tree.h:77-331``; ``fm_index`` is alphabet-generic
via its rank dictionary, ``fmindex.h:341``). Here the 4-symbol popcount rank
dictionary (fmi/rank.py) is replaced by per-level wavelet rank: O(bits)
gathers+popcounts per occ query, batched over the lane plane.

Supports PROTEIN (24 symbols, 5 bits) and DNA_IUPAC (16 symbols, 4 bits).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from nvbio_tpu.wavelet import WaveletTree, build_wavelet_tree, rank as wt_rank


@dataclasses.dataclass
class ProteinFMIndex:
    wt: Any               # WaveletTree of the sentinel-removed BWT
    count: Any            # int32[n_symbols + 1]: C[c] = 1 + #symbols < c
    primary: int          # sentinel row in the virtual full BWT
    n: int
    n_symbols: int

    def device(self) -> "ProteinFMIndex":
        return ProteinFMIndex(self.wt.device(), jnp.asarray(self.count),
                              int(self.primary), int(self.n), self.n_symbols)


jax.tree_util.register_pytree_node(
    ProteinFMIndex,
    lambda f: ((f.wt, f.count, f.primary), (f.n, f.n_symbols)),
    lambda aux, ch: ProteinFMIndex(wt=ch[0], count=ch[1], primary=ch[2],
                                   n=aux[0], n_symbols=aux[1]),
)

jax.tree_util.register_pytree_node(
    WaveletTree,
    lambda w: ((w.levels_words, w.levels_cum, w.zeros), (w.bits, w.n)),
    lambda aux, ch: WaveletTree(bits=aux[0], n=aux[1], levels_words=ch[0],
                                levels_cum=ch[1], zeros=ch[2]),
)


def build_protein_fmindex(codes: np.ndarray,
                          n_symbols: int = 24) -> ProteinFMIndex:
    """Host-side build: suffix array -> BWT -> wavelet tree + C counts."""
    from nvbio_tpu.fmi.index import bwt_from_sa
    from nvbio_tpu.index.sa import suffix_array

    codes = np.asarray(codes, np.uint8)
    bits = max(1, int(np.ceil(np.log2(max(n_symbols, 2)))))
    sa = suffix_array(codes)
    bwt, primary = bwt_from_sa(codes, sa)
    wt = build_wavelet_tree(bwt, bits)
    counts = np.bincount(codes, minlength=n_symbols)
    count = np.zeros(n_symbols + 1, np.int32)
    count[1:] = np.cumsum(counts)
    count += 1  # the virtual sentinel sorts first
    count = np.concatenate([[1], count[1:]]).astype(np.int32)
    return ProteinFMIndex(wt=wt, count=count, primary=primary,
                          n=len(codes), n_symbols=n_symbols)


def _occ(pfmi: ProteinFMIndex, c, i):
    adj = i - (i > pfmi.primary).astype(i.dtype)
    return wt_rank(pfmi.wt, c, adj)


def protein_backward_search_core(pfmi: ProteinFMIndex, queries, qlens):
    """Exact-match SA intervals [lo, hi) for protein queries (B, L)."""
    queries = jnp.asarray(queries, jnp.int32)
    qlens = jnp.asarray(qlens, jnp.int32)
    B, L = queries.shape
    lo0 = jnp.zeros((B,), jnp.int32)
    hi0 = jnp.full((B,), pfmi.n + 1, jnp.int32)

    def step(carry, s):
        lo, hi = carry
        j = jnp.clip(qlens - 1 - s, 0, L - 1)
        c = jnp.take_along_axis(queries, j[:, None], axis=1)[:, 0]
        cnt = jnp.take(pfmi.count, c)
        nlo = cnt + _occ(pfmi, c, lo)
        nhi = cnt + _occ(pfmi, c, hi)
        active = (s < qlens) & (hi > lo)
        lo = jnp.where(active, nlo, lo)
        hi = jnp.where(active, nhi, hi)
        return (lo, hi), None

    (lo, hi), _ = jax.lax.scan(step, (lo0, hi0),
                               jnp.arange(L, dtype=jnp.int32))
    return lo, hi


def protein_backward_search(pfmi, queries, qlens):
    return jax.jit(protein_backward_search_core)(pfmi, queries, qlens)


def protein_count(pfmi, queries, qlens):
    """Occurrence counts of protein queries in the indexed text."""
    lo, hi = protein_backward_search(pfmi, queries, qlens)
    return jnp.maximum(hi - lo, 0)
