"""Rank dictionary over a 2-bit packed string with sampled occurrence table.

The hot primitive of FM-index search (reference:
``nvbio/fmindex/rank_dictionary.h:82-271`` + ``rank_dictionary_inl.h:40-130``,
which uses interleaved BWT/occ uint4 blocks and a popc count-table). The TPU
formulation: occurrence checkpoints every K=64 symbols in a dense (n_blocks,
4) int32 array + masked 2-bit-symbol popcount over the (at most 4) packed
words of the partial block, all batched — one rank query is ~2 gathers + a
handful of VPU bit ops, and thousands run per lane-plane.

Limits: int32 counts => text length < 2^31 (single-shard). Larger genomes are
sharded at the index level (see nvbio_tpu.parallel).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

K = 64                # occurrence sampling interval, in symbols
WORDS_PER_BLOCK = 4   # 64 symbols / 16 symbols-per-word
SYM_PER_WORD = 16


def build_occ_table(bwt_words: np.ndarray, n: int) -> np.ndarray:
    """Host-side: (n_blocks+1, 4) int32 cumulative symbol counts at block
    starts; occ[b, c] = count of c in bwt[0 : b*K)."""
    from nvbio_tpu import packed

    codes = packed.unpack(bwt_words, n, 2)
    n_blocks = (n + K - 1) // K
    pad = np.zeros(n_blocks * K, dtype=np.uint8)
    pad[:n] = codes
    onehot = pad.reshape(n_blocks, K)[..., None] == np.arange(4)
    per_block = onehot.sum(axis=1, dtype=np.int64)
    occ = np.zeros((n_blocks + 1, 4), dtype=np.int64)
    np.cumsum(per_block, axis=0, out=occ[1:])
    if occ.max() >= 2**31:
        raise ValueError("text too long for int32 rank (shard the index)")
    return occ.astype(np.int32)


def _count_in_word(word, c, m):
    """# of occurrences of 2-bit symbol c in the first m symbols of word."""
    pattern = c.astype(jnp.uint32) * jnp.uint32(0x55555555)
    x = word ^ pattern
    nonzero = (x | (x >> 1)) & jnp.uint32(0x55555555)
    matches = ~nonzero & jnp.uint32(0x55555555)
    mask = jnp.where(
        m >= SYM_PER_WORD,
        jnp.uint32(0xFFFFFFFF),
        (jnp.uint32(1) << (2 * jnp.maximum(m, 0)).astype(jnp.uint32)) - 1,
    )
    return jax.lax.population_count(matches & mask).astype(jnp.int32)


def rank(bwt_words: jnp.ndarray, occ: jnp.ndarray, c: jnp.ndarray, i: jnp.ndarray):
    """rank(c, i) = # of occurrences of c in bwt[0:i), batched.

    bwt_words: (n_words,) uint32; occ: (n_blocks+1, 4) int32;
    c, i: any matching integer shapes.
    """
    c = jnp.asarray(c, jnp.int32)
    i = jnp.asarray(i, jnp.int32)
    block = i // K
    base = jnp.take(occ, block, axis=0)
    base_c = jnp.take_along_axis(base, c[..., None], axis=-1)[..., 0]

    rem = i - block * K  # symbols past the block start, in [0, K]
    w = jnp.arange(WORDS_PER_BLOCK, dtype=jnp.int32)
    word_idx = block[..., None] * WORDS_PER_BLOCK + w
    words = jnp.take(
        bwt_words, jnp.clip(word_idx, 0, bwt_words.shape[0] - 1), axis=0
    )
    m = jnp.clip(rem[..., None] - w * SYM_PER_WORD, 0, SYM_PER_WORD)
    partial = _count_in_word(words, c[..., None], m).sum(axis=-1)
    return base_c + partial


def rank2(bwt_words, occ, c, lo, hi):
    """(rank(c, lo), rank(c, hi)) — the backward-search step pair."""
    both = rank(bwt_words, occ, jnp.stack([c, c]), jnp.stack([lo, hi]))
    return both[0], both[1]


def rank_all(bwt_words: jnp.ndarray, occ: jnp.ndarray, i: jnp.ndarray):
    """rank of ALL 4 symbols at positions i: returns (..., 4) int32.

    The analogue of the reference's rank_all (rank_dictionary.h): used by
    bidirectional extension, where each step needs all symbol counts.
    """
    i = jnp.asarray(i, jnp.int32)
    block = i // K
    base = jnp.take(occ, block, axis=0)  # (..., 4)
    rem = i - block * K
    w = jnp.arange(WORDS_PER_BLOCK, dtype=jnp.int32)
    word_idx = block[..., None] * WORDS_PER_BLOCK + w
    words = jnp.take(
        bwt_words, jnp.clip(word_idx, 0, bwt_words.shape[0] - 1), axis=0
    )
    m = jnp.clip(rem[..., None] - w * SYM_PER_WORD, 0, SYM_PER_WORD)
    cs = jnp.arange(4, dtype=jnp.int32)
    partial = _count_in_word(
        words[..., None, :], cs[:, None], m[..., None, :]
    ).sum(axis=-1)  # (..., 4)
    return base + partial
