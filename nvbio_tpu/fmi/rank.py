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

# ---- fused interleaved rank rows (the TPU retile of the reference's
# text/occ-interleaved uint4 blocks, rank_dictionary.h:82-271) -------------
#
# Measured cost model (GATHER_MICRO.json): a gather of one (1, 128)
# tile-aligned uint32 row costs the SAME as a single-element gather, while
# k separate word gathers cost k scalar loads — and any minor dim < 128 is
# padded to the 128-lane tile anyway. So the rank row is exactly one tile:
#   row b (128 x uint32) = [ occ counts of the 4 symbols before b*RT_K ]
#                       ++ [ the block's 124 packed words (1984 symbols) ]
# One row gather serves a whole rank query (checkpoint AND text); the
# in-row partial count is a dense masked popcount over 124 words — pure
# VPU work, ~free next to the HBM gather it replaces (~5 scalar loads).
RT_WORDS = 124
RT_K = RT_WORDS * SYM_PER_WORD  # 1984 symbols per fused block


def want_fused_ranktab() -> bool:
    """Whether indexes should carry the fused rank rows.

    The layout trades ~5 scalar gathers for 1 tile-row gather + a dense
    124-word popcount — a clear win on TPU (HBM gathers are the wall,
    VPU ops are ~free) and a clear LOSS on CPU (gathers hit cache, the
    popcount doesn't vanish). Default: accelerator only. Override with
    NVBIO_TPU_RANKTAB=1/0 (tests force 1 to cover the fused path on CPU).
    """
    import os

    v = os.environ.get("NVBIO_TPU_RANKTAB", "auto")
    if v == "auto":
        try:
            return jax.default_backend() != "cpu"
        except Exception:  # noqa: BLE001 — no backend => no accelerator
            return False
    return v not in ("0", "false", "no")


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


def build_rank_table(bwt_words: np.ndarray, n: int,
                     occ: np.ndarray | None = None) -> np.ndarray:
    """Host-side fused rank rows: (n//RT_K + 1, 128) uint32.

    Row b = 4 cumulative symbol counts at position b*RT_K, then the 124
    packed words covering [b*RT_K, (b+1)*RT_K). Trailing words are
    zero-padded; counts never include pad (rank masks at i). RT_K is a
    multiple of K, so the counts are just every 31st row of the standard
    occ checkpoint table."""
    w = np.ascontiguousarray(np.asarray(bwt_words, dtype=np.uint32))
    if occ is None:
        occ = build_occ_table(w, n)
    nb = n // RT_K + 1
    step = RT_K // K
    occ_rows = np.asarray(occ)[::step][:nb].astype(np.uint32)
    words = np.zeros(nb * RT_WORDS, dtype=np.uint32)
    words[: w.shape[0]] = w
    return np.concatenate([occ_rows, words.reshape(nb, RT_WORDS)], axis=1)


def build_rank_table_device(bwt_words, n: int):
    """Device-side fused rank rows — one jit over the packed words (used by
    the on-device index build and FMIndex.device(); bit-exact vs the host
    builder)."""
    import functools

    nb = n // RT_K + 1
    nw = nb * RT_WORDS

    @functools.partial(jax.jit, static_argnums=(1,))
    def _build(w, n):
        wpad = jnp.zeros((nw,), jnp.uint32).at[: w.shape[0]].set(w)
        wb = wpad.reshape(nb, RT_WORDS)
        # valid symbols in global word j: clip(n - 16j, 0, 16)
        j = jnp.arange(nw, dtype=jnp.int32).reshape(nb, RT_WORDS)
        m = jnp.clip(n - SYM_PER_WORD * j, 0, SYM_PER_WORD)
        cs = jnp.arange(4, dtype=jnp.int32)
        per_block = _count_in_word(
            wb[:, None, :], cs[None, :, None], m[:, None, :]
        ).sum(axis=-1)  # (nb, 4)
        occ = jnp.concatenate(
            [jnp.zeros((1, 4), jnp.int32),
             jnp.cumsum(per_block[:-1], axis=0, dtype=jnp.int32)], axis=0)
        return jnp.concatenate([occ.astype(jnp.uint32), wb], axis=1)

    return _build(jnp.asarray(bwt_words, jnp.uint32), int(n))


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


def rank_fused(ranktab: jnp.ndarray, c: jnp.ndarray, i: jnp.ndarray):
    """rank(c, i) via ONE fused-row gather per query (vs ~5 scalar gathers
    on the split occ/words layout)."""
    c = jnp.asarray(c, jnp.int32)
    i = jnp.asarray(i, jnp.int32)
    block = i // RT_K
    row = jnp.take(ranktab, block, axis=0)            # (..., 128) uint32
    base = row[..., :4].astype(jnp.int32)
    base_c = jnp.sum(
        jnp.where(jnp.arange(4, dtype=jnp.int32) == c[..., None], base, 0),
        axis=-1)
    words = row[..., 4:]
    rem = i - block * RT_K
    w = jnp.arange(RT_WORDS, dtype=jnp.int32)
    m = rem[..., None] - w * SYM_PER_WORD             # <=0 -> empty mask
    partial = _count_in_word(words, c[..., None], m).sum(axis=-1)
    return base_c + partial


def rank_all_fused(ranktab: jnp.ndarray, i: jnp.ndarray):
    """rank of ALL 4 symbols at positions i from one fused-row gather."""
    i = jnp.asarray(i, jnp.int32)
    block = i // RT_K
    row = jnp.take(ranktab, block, axis=0)
    base = row[..., :4].astype(jnp.int32)             # (..., 4)
    words = row[..., 4:]
    rem = i - block * RT_K
    w = jnp.arange(RT_WORDS, dtype=jnp.int32)
    m = rem[..., None] - w * SYM_PER_WORD
    cs = jnp.arange(4, dtype=jnp.int32)
    partial = _count_in_word(
        words[..., None, :], cs[:, None], m[..., None, :]
    ).sum(axis=-1)                                    # (..., 4)
    return base + partial


def symbol_and_rank_fused(ranktab: jnp.ndarray, i: jnp.ndarray):
    """(bwt[i], rank(bwt[i], i)) from ONE fused-row gather — the LF step of
    locate (fmindex.h:472-505) without a separate text gather."""
    i = jnp.asarray(i, jnp.int32)
    block = i // RT_K
    row = jnp.take(ranktab, block, axis=0)
    base = row[..., :4].astype(jnp.int32)
    words = row[..., 4:]
    rem = i - block * RT_K
    w = jnp.arange(RT_WORDS, dtype=jnp.int32)
    # symbol at i: dense one-hot select of its word, then its 2-bit field
    wsel = rem // SYM_PER_WORD
    bit = (2 * (rem % SYM_PER_WORD)).astype(jnp.uint32)
    word_i = jnp.sum(jnp.where(w == wsel[..., None], words, 0), axis=-1)
    c = ((word_i >> bit) & 3).astype(jnp.int32)
    base_c = jnp.sum(
        jnp.where(jnp.arange(4, dtype=jnp.int32) == c[..., None], base, 0),
        axis=-1)
    m = rem[..., None] - w * SYM_PER_WORD
    partial = _count_in_word(words, c[..., None], m).sum(axis=-1)
    return c, base_c + partial


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
