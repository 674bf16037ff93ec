"""Bit-packed symbol arrays (the TPU equivalent of the reference's PackedStream).

Capability parity with ``nvbio/basic/packedstream.h:44-83`` / ``packed_vector.h``:
B-bits-per-symbol strings stored in 32-bit words. Unlike the CUDA reference —
which exposes per-symbol iterators — the TPU design keeps everything **dense
and vectorized**: pack/unpack/gather are whole-array bit operations that XLA
maps straight onto the 8x128 VPU, and the same word layout is shared by the
host (numpy) and device (jnp) so index artifacts round-trip with no
translation.

Layout: symbol ``i`` lives in word ``i // spw`` at bit offset
``(i % spw) * bits`` (LSB-first), where ``spw = 32 // bits``. LSB-first makes
the word value of a prefix independent of what follows it, which keeps
FM-index occurrence counting (see ``nvbio_tpu/fmi/rank.py``) a pure
mask-and-popcount.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np

WORD_BITS = 32


def symbols_per_word(bits: int) -> int:
    if bits not in (1, 2, 4, 8, 16):
        raise ValueError(f"unsupported symbol size: {bits}")
    return WORD_BITS // bits


def words_for(length: int, bits: int) -> int:
    spw = symbols_per_word(bits)
    return (length + spw - 1) // spw


def pack(symbols: np.ndarray, bits: int) -> np.ndarray:
    """Pack uint8/uint32 symbol codes into a uint32 word array (host-side).

    Vectorized: reshapes to (n_words, spw) and reduces with shifts — no Python
    loop over symbols.
    """
    import sys

    symbols = np.asarray(symbols)
    spw = symbols_per_word(bits)
    n = symbols.shape[-1]
    n_words = words_for(n, bits)
    if bits == 2 and sys.byteorder == "little":
        # byte-funnel fast path (~15x the uint32 reduce on 200 MB inputs):
        # 4 symbols -> 1 byte, little-endian byte quads ARE the LSB-first
        # uint32 words
        padded = np.zeros(symbols.shape[:-1] + (n_words * 4, 4), np.uint8)
        flat = padded.reshape(symbols.shape[:-1] + (n_words * 16,))
        flat[..., :n] = symbols
        np.bitwise_and(flat, 3, out=flat)
        b = (padded[..., 0] | (padded[..., 1] << 2)
             | (padded[..., 2] << 4) | (padded[..., 3] << 6))
        return np.ascontiguousarray(b).view(np.uint32)
    padded = np.zeros(symbols.shape[:-1] + (n_words * spw,), dtype=np.uint32)
    padded[..., :n] = symbols.astype(np.uint32) & ((1 << bits) - 1)
    grouped = padded.reshape(symbols.shape[:-1] + (n_words, spw))
    shifts = (np.arange(spw, dtype=np.uint32) * bits).astype(np.uint32)
    return np.bitwise_or.reduce(grouped << shifts, axis=-1).astype(np.uint32)


def unpack(words: np.ndarray, length: int, bits: int) -> np.ndarray:
    """Unpack a uint32 word array back to uint8 symbol codes (host-side)."""
    words = np.asarray(words, dtype=np.uint32)
    spw = symbols_per_word(bits)
    shifts = (np.arange(spw, dtype=np.uint32) * bits).astype(np.uint32)
    mask = np.uint32((1 << bits) - 1)
    syms = (words[..., :, None] >> shifts) & mask
    flat = syms.reshape(words.shape[:-1] + (-1,))
    return flat[..., :length].astype(np.uint8)


@dataclasses.dataclass
class PackedArray:
    """A length-tagged packed symbol array.

    ``words`` may be a numpy array (host) or a jax.Array (device); all methods
    dispatch on whichever namespace the data lives in.
    """

    words: Any          # uint32[n_words] (or batched [..., n_words])
    length: int         # number of valid symbols
    bits: int           # bits per symbol

    @classmethod
    def from_codes(cls, symbols: np.ndarray, bits: int) -> "PackedArray":
        return cls(pack(symbols, bits), int(np.asarray(symbols).shape[-1]), bits)

    def to_codes(self) -> np.ndarray:
        return unpack(np.asarray(self.words), self.length, self.bits)

    @property
    def spw(self) -> int:
        return symbols_per_word(self.bits)

    def device(self):
        import jax.numpy as jnp

        return PackedArray(jnp.asarray(self.words), self.length, self.bits)


def gather_symbols(words, idx, bits: int):
    """Gather symbols at positions ``idx`` from packed ``words`` (jnp or numpy).

    Works on either namespace; ``idx`` may be any integer array shape. This is
    the device-side random-access primitive used by FM-index locate and text
    gathers in the extension stage.
    """
    xp = _ns(words)
    spw = WORD_BITS // bits
    idx = xp.asarray(idx)
    word = xp.take(words, idx // spw, axis=-1 if getattr(words, "ndim", 1) > 1 else 0)
    shift = ((idx % spw) * bits).astype(word.dtype)
    return ((word >> shift) & ((1 << bits) - 1)).astype(xp.int32)


def extract_window(words, start, win_len: int, bits: int, xp=None):
    """Extract ``win_len`` consecutive symbols starting at ``start`` (traced).

    ``start`` may be a traced scalar or a batch of starts (shape [...]), in
    which case the result has shape [..., win_len]. Used to pull candidate
    text windows out of the packed reference for banded extension.
    """
    if xp is None:
        xp = _ns(words)
    start = xp.asarray(start)
    offs = xp.arange(win_len, dtype=start.dtype)
    idx = start[..., None] + offs
    return gather_symbols(words, idx, bits)


def gather_word_runs(words, word0, n_words: int):
    """wds[..., k] = words[word0[...] + k] for k < n_words, gather-cheap.

    TPU gathers cost ~15 ns per INDEX regardless of slice width — a
    tile-aligned (1, 128)-word row costs the same as one scalar (measured:
    GATHER_MICRO.json, flat_M 35.6 ms vs tilerow_M 28.6 ms for 2.36M
    indices). So instead of ``n_words + 1`` per-word gathers per window,
    fetch ONE covering 128-word row from a stride-overlapped row table
    (stride = 128 - n_words guarantees containment) and align in-register
    with two levels of static-slice variants (coarse 16-word, fine 1-word)
    — all dense VPU selects. Out-of-range tails read zeros (callers mask
    by window length). Requires 1 <= n_words <= 120.
    """
    import jax.numpy as jnp

    if n_words > 120:  # very wide windows: two half-width runs, stacked
        half = (n_words + 1) // 2
        lo = gather_word_runs(words, word0, half)
        hi = gather_word_runs(words, word0 + half, n_words - half)
        import jax.numpy as jnp

        return jnp.concatenate([lo, hi], axis=-1)
    stride = 128 - n_words
    Nw = words.shape[0]
    R = max(1, (Nw - 1) // stride + 1)
    # strided overlapping rows: row r = words[stride*r : stride*r + 128],
    # assembled from ceil(128/stride) shifted copies of the stride-chunked
    # base (a row spans multiple chunks when n_words > stride)
    wp = jnp.pad(words, (0, R * stride - Nw))
    base = wp.reshape(R, stride)
    n_chunks = (128 + stride - 1) // stride
    base_ext = jnp.concatenate(
        [base, jnp.zeros((n_chunks, stride), words.dtype)], axis=0)
    rows = jnp.concatenate(
        [base_ext[i: i + R] for i in range(n_chunks)], axis=1)[:, :128]

    shape = word0.shape
    w0f = jnp.clip(word0.reshape(-1), 0, Nw - 1).astype(jnp.int32)
    r = w0f // stride
    col = w0f - r * stride                                 # [0, stride)
    got = jnp.take(rows, r, axis=0)                        # (Q, 128)

    # coarse align: 16-word granularity static variants
    n_var = (stride - 1) // 16 + 1
    CW = n_words + 15
    pad = max(0, 16 * (n_var - 1) + CW - 128)
    if pad:
        got = jnp.pad(got, ((0, 0), (0, pad)))
    ch = col // 16
    acc = got[:, :CW]
    for h in range(1, n_var):
        acc = jnp.where((ch == h)[:, None], got[:, 16 * h: 16 * h + CW], acc)
    # fine align: 1-word granularity
    cl = col % 16
    out = acc[:, :n_words]
    for low in range(1, 16):
        out = jnp.where((cl == low)[:, None],
                        acc[:, low: low + n_words], out)
    # out-of-range reads are zeros (clean semantics for the recursive
    # wide-window split; callers mask by window length anyway)
    k = jnp.arange(n_words, dtype=jnp.int32)
    out = jnp.where(word0.reshape(-1)[:, None] + k[None, :] < Nw,
                    out, jnp.zeros((), words.dtype))
    return out.reshape(*shape, n_words)


def extract_window_aligned(words, start, win_len: int, bits: int):
    """Gather-efficient batched window extraction (jnp only).

    Gathers one covering 128-word row per window (``gather_word_runs``)
    and bit-aligns with a funnel shift, so a 116-symbol window costs ~1
    row-gather + vector bit ops instead of 116 element-gathers. This is
    the TPU analogue of the reference's word-aligned vectorized string
    loads (``nvbio/strings/vectorized_string.h``).

    start: (B,) int32; returns (B, win_len) int32 symbol codes.
    """
    import jax.numpy as jnp

    spw = symbols_per_word(bits)
    n_words_needed = (win_len + spw - 1) // spw + 1
    start = jnp.asarray(start)
    if start.dtype != jnp.uint32:  # uint32 = large-genome positions (>2^31)
        start = start.astype(jnp.int32)
    word0 = (start // spw).astype(jnp.int32)  # word index always < 2^28
    off = (start % spw).astype(jnp.int32)

    wds = gather_word_runs(words, word0, n_words_needed)   # (B, NW)
    wds = wds.astype(jnp.uint32)

    # funnel shift: align so that symbol `start` sits at bit 0 of word 0
    sh = (off * bits).astype(jnp.uint32)[:, None]
    lo = wds[:, :-1] >> sh
    hi = jnp.where(sh == 0, jnp.uint32(0), wds[:, 1:] << (32 - sh))
    aligned = lo | hi  # (B, NW-1)

    shifts = (jnp.arange(spw, dtype=jnp.uint32) * bits)[None, None, :]
    syms = (aligned[:, :, None] >> shifts) & ((1 << bits) - 1)
    flat = syms.reshape(start.shape[0], -1)
    return flat[:, :win_len].astype(jnp.int32)


def _ns(arr):
    if isinstance(arr, np.ndarray):
        return np
    import jax.numpy as jnp

    return jnp


def extract_window_blocked(words, start_blocked, win_rows: int, bits: int):
    """``extract_window_aligned`` emitting the register-tile block layout.

    start_blocked: (G, 8, 128) int32 window starts; returns
    (G, win_rows, 8, 128) int32 symbol codes — symbols along axis 1 — the
    native operand layout of the register-tiled Pallas kernels, produced
    directly by the word gather (no post-hoc transpose of a (B, W) matrix).
    """
    import jax.numpy as jnp

    spw = symbols_per_word(bits)
    n_words = (win_rows + spw - 1) // spw + 1
    start = jnp.asarray(start_blocked)
    if start.dtype != jnp.uint32:  # uint32 = large-genome positions (>2^31)
        start = start.astype(jnp.int32)
    G = start.shape[0]
    word0 = (start // spw).astype(jnp.int32)
    off = (start % spw).astype(jnp.int32)

    # one row-gather per window + in-register align (see gather_word_runs)
    wds = gather_word_runs(words, word0, n_words)       # (G, 8, 128, NW)
    wds = wds.transpose(0, 3, 1, 2).astype(jnp.uint32)  # (G, NW, 8, 128)

    sh = (off * bits).astype(jnp.uint32)[:, None]
    lo = wds[:, :-1] >> sh
    hi = jnp.where(sh == 0, jnp.uint32(0), wds[:, 1:] << (32 - sh))
    aligned = lo | hi                                   # (G, NW-1, 8, 128)

    shifts = (jnp.arange(spw, dtype=jnp.uint32) * bits)[None, None, :, None, None]
    syms = (aligned[:, :, None] >> shifts) & ((1 << bits) - 1)
    flat = syms.reshape(G, -1, 8, 128)                  # contiguous expand
    return flat[:, :win_rows].astype(jnp.int32)


def reverse_rows(x, lens, bits: int):
    """Per-row reversal by variable length, gather-light (jnp).

    y[b, j] = x[b, lens[b]-1-j] for j < lens[b] (tail contents undefined).

    The naive formulation is a (B, L) per-lane gather, which lowers to
    scalar-core loads on TPU. Here rows are packed to 32-bit words
    (``bits`` per symbol), symbol-reversed with static mask/shift ops, and
    re-aligned with a word-level take (L/spw words per row) plus a dense
    sub-word funnel shift — the same word-funnel trick as
    ``extract_window_aligned`` (reference ``strings/vectorized_string.h``).
    """
    import jax.numpy as jnp

    x = jnp.asarray(x)
    B, L = x.shape
    spw = symbols_per_word(bits)
    Lw = (L + spw - 1) // spw
    Ls = Lw * spw
    mask = jnp.uint32((1 << bits) - 1)

    # pack (static): (B, Lw) words, symbol j at bit (j % spw) * bits
    xp = jnp.pad(x.astype(jnp.uint32) & mask, ((0, 0), (0, Ls - L)))
    grouped = xp.reshape(B, Lw, spw)
    shifts = (jnp.arange(spw, dtype=jnp.uint32) * bits)[None, None, :]
    words = jnp.sum(grouped << shifts, axis=-1, dtype=jnp.uint32)

    # reverse symbols within each word (static log-step swap network)
    w = words
    if bits <= 1:
        w = ((w & 0x55555555) << 1) | ((w >> 1) & 0x55555555)
    if bits <= 2:
        w = ((w & 0x33333333) << 2) | ((w >> 2) & 0x33333333)
    if bits <= 4:
        w = ((w & 0x0F0F0F0F) << 4) | ((w >> 4) & 0x0F0F0F0F)
    if bits <= 8:
        w = ((w & 0x00FF00FF) << 8) | ((w >> 8) & 0x00FF00FF)
    w = (w << 16) | (w >> 16)
    # reverse word order: full row now reversed with Ls-len leading junk
    w = w[:, ::-1]

    # align: drop s = Ls - len leading symbols. The word-level shift is a
    # select over Lw static variants instead of a per-lane gather (traced
    # gathers lower to scalar loads on TPU; Lw is small)
    s = (Ls - lens.astype(jnp.int32))
    s_words = s // spw
    s_sub = (s % spw).astype(jnp.uint32) * bits
    variants = [jnp.pad(w[:, k:], ((0, 0), (0, k))) for k in range(Lw + 1)]
    wlo = variants[0]
    whi = variants[1]
    for k in range(1, Lw):
        m = (s_words == k)[:, None]
        wlo = jnp.where(m, variants[k], wlo)
        whi = jnp.where(m, variants[k + 1], whi)
    sh = s_sub[:, None]
    aligned = jnp.where(sh == 0, wlo, (wlo >> sh) | (whi << (32 - sh)))

    # unpack (static)
    syms = (aligned[:, :, None] >> shifts) & mask
    return syms.reshape(B, -1)[:, :L].astype(x.dtype)
