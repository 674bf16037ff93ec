"""Batched JAX alignment scorers (the TPU "batch schedulers").

Replaces the reference's batched alignment contexts
(``nvbio/alignment/batched.h:43-463`` — one alignment per CUDA
thread/warp/staged stripe) with dense vectorized dataflow:

  * ``batch_score_banded`` — `lax.scan` over pattern rows; the live state is a
    dense ``(B, BAND)`` plane that XLA tiles onto the VPU. The within-row
    text-gap dependency (sequential in the CUDA kernels,
    ``gotoh_banded_inl.h``) is broken with a max-plus prefix scan over the
    band ("lazy-F"): exact because gap-open <= gap-extend.
  * ``batch_score_full`` — anti-diagonal wavefront: each scan step updates a
    dense ``(B, M+1)`` diagonal of H (and E/F for Gotoh); the per-step text
    symbols come from a rolling reversed window so there are no gathers in
    the inner loop.

All scores are int32 and bit-exact against ``nvbio_tpu.align.golden``.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from nvbio_tpu.align.types import (
    NEG_INF,
    AlignmentType,
    EditDistanceAligner,
    GotohAligner,
    GotohScoring,
    HammingAligner,
    SmithWatermanAligner,
)


class BestSink(NamedTuple):
    """Best score + terminal cell, the analogue of the reference's BestSink."""

    score: jnp.ndarray       # (B,) int32
    sink_text: jnp.ndarray   # (B,) int32: text index (i) of the terminal cell
    sink_pattern: jnp.ndarray  # (B,) int32: pattern index (j)


def _gap_params(aligner):
    """Uniform (po, pe, to, te) gap parameters for any linear/affine aligner."""
    if isinstance(aligner, GotohAligner):
        s = aligner.scoring
        return s.pattern_gap_open, s.pattern_gap_ext, s.text_gap_open, s.text_gap_ext
    s = aligner.scoring
    # linear gaps: open == extend
    return s.insertion, s.insertion, s.deletion, s.deletion


def _subst_scores(p, t, match, mismatch, matrix=None):
    """Elementwise substitution scores; int32.

    With ``matrix`` (A x A int32, e.g. BLOSUM62), scores come from a table
    lookup over (pattern symbol, text symbol) instead of match/mismatch.
    """
    if matrix is not None:
        A = matrix.shape[0]
        idx = p * A + jnp.clip(t, 0, A - 1)
        return jnp.take(matrix.reshape(-1), jnp.clip(idx, 0, A * A - 1))
    return jnp.where(p == t, jnp.int32(match), mismatch)


def _exclusive_running_max(x):
    """Exclusive prefix max along the last axis (lane dimension)."""
    inc = jax.lax.associative_scan(jnp.maximum, x, axis=-1)
    return jnp.concatenate(
        [jnp.full(x.shape[:-1] + (1,), NEG_INF, x.dtype), inc[..., :-1]], axis=-1
    )


def _exclusive_running_max_axis0(x):
    """Exclusive prefix max along axis 0 (the small band/sublane dimension)."""
    inc = jax.lax.associative_scan(jnp.maximum, x, axis=0)
    return jnp.concatenate(
        [jnp.full((1,) + x.shape[1:], NEG_INF, x.dtype), inc[:-1]], axis=0
    )


@functools.partial(jax.jit, static_argnames=("aligner", "band"))
def batch_score_banded(
    patterns: jnp.ndarray,       # (B, M) int32 symbol codes
    pattern_lens: jnp.ndarray,   # (B,)   int32
    texts: jnp.ndarray,          # (B, T) int32, T >= M + band - 1
    text_lens: jnp.ndarray,      # (B,)   int32 valid window length
    aligner,
    band: int,
    mismatch_scores: jnp.ndarray | None = None,  # (B, M) per-position penalty
    subst_matrix: jnp.ndarray | None = None,     # (A, A) score table (protein)
) -> BestSink:
    """Banded alignment scores, band anchored at the window's main diagonal.

    DP cell (i, k): pattern consumed i, text consumed i + k (k in [0, band)).
    Semantics match ``golden.banded_score``.

    TPU layout note: internally everything is transposed to (W, B) /
    (len, B) so the huge batch dimension rides the 128-lane axis (full VPU
    utilization for any band width) and the per-row text window becomes a
    contiguous ``dynamic_slice`` instead of a gather.
    """
    B, M = patterns.shape
    W = band
    atype = AlignmentType(aligner.type)
    po, pe, to, te = (jnp.int32(v) for v in _gap_params(aligner))
    match = jnp.int32(aligner.scoring.match)
    mm_scalar = jnp.int32(aligner.scoring.mismatch)
    neg = jnp.int32(NEG_INF)

    patterns_T = patterns.astype(jnp.int32).T            # (M, B)
    TW = M + W - 1
    texts = texts.astype(jnp.int32)
    if texts.shape[1] < TW:
        texts = jnp.pad(texts, ((0, 0), (0, TW - texts.shape[1])))
    texts_T = texts.T                                    # (>=TW, B)
    pattern_lens = pattern_lens.astype(jnp.int32)
    text_lens = text_lens.astype(jnp.int32)
    mm_T = None if mismatch_scores is None else mismatch_scores.astype(jnp.int32).T

    kcol = jnp.arange(W, dtype=jnp.int32)[:, None]       # (W, 1)

    if atype == AlignmentType.GLOBAL:
        H0 = jnp.broadcast_to(
            jnp.where(kcol == 0, 0, to + te * (kcol - 1)).astype(jnp.int32), (W, B)
        )
    else:
        H0 = jnp.zeros((W, B), jnp.int32)
    E0 = jnp.full((W, B), neg, jnp.int32)

    best0 = jnp.full((B,), neg, jnp.int32)
    sink0 = jnp.zeros((B,), jnp.int32)

    is_hamming = isinstance(aligner, HammingAligner)

    def step(carry, i):
        # i: 1-based pattern row; all planes are (W, B)
        H_prev, E_prev, best, sink_i, final_row = carry
        p = jax.lax.dynamic_index_in_dim(patterns_T, i - 1, axis=0, keepdims=False)
        trow = jax.lax.dynamic_slice_in_dim(texts_T, i - 1, W, axis=0)
        if mm_T is None:
            mm = mm_scalar
        else:
            mm = jax.lax.dynamic_index_in_dim(mm_T, i - 1, axis=0, keepdims=False)[None, :]
        sub = _subst_scores(p[None, :], trow, match, mm, subst_matrix)
        tidx = (i - 1) + kcol  # (W, 1)
        sub = jnp.where(tidx < text_lens[None, :], sub, neg)

        diag = H_prev + sub
        if is_hamming:
            H0r = diag
            Erow = E_prev  # unused
            Hrow = jnp.maximum(H0r, 0) if atype == AlignmentType.LOCAL else H0r
        else:
            # E (pattern gap, 'I'): from (i-1, k+1)
            Hp_shift = jnp.concatenate([H_prev[1:], jnp.full((1, B), neg)], axis=0)
            Ep_shift = jnp.concatenate([E_prev[1:], jnp.full((1, B), neg)], axis=0)
            Erow = jnp.maximum(Ep_shift + pe, Hp_shift + po)
            H0r = jnp.maximum(diag, Erow)
            if atype == AlignmentType.LOCAL:
                H0r = jnp.maximum(H0r, 0)
            # F (text gap, 'D'): max-plus prefix scan along the band.
            # F[k] = te*(k-1) + max_{k'<k}(H0[k'] + to - te*k')
            G = H0r + (to - te * kcol)
            F = _exclusive_running_max_axis0(G) + (te * (kcol - 1))
            Hrow = jnp.maximum(H0r, F)

        at_final = (i == pattern_lens)[None, :]
        final_row = jnp.where(at_final, Hrow, final_row)

        if atype == AlignmentType.LOCAL:
            row_valid = (i <= pattern_lens)[None, :] & (tidx < text_lens[None, :])
            row_best = jnp.max(jnp.where(row_valid, Hrow, neg), axis=0)
            upd = row_best > best
            best = jnp.where(upd, row_best, best)
            sink_i = jnp.where(upd, i, sink_i)

        return (Hrow, Erow, best, sink_i, final_row), None

    final_init = jnp.full((W, B), neg, jnp.int32)
    (H_last, _, best, sink_i, final_row), _ = jax.lax.scan(
        step, (H0, E0, best0, sink0, final_init), jnp.arange(1, M + 1, dtype=jnp.int32)
    )

    if atype == AlignmentType.GLOBAL:
        score = final_row[W - 1]
        return BestSink(score, pattern_lens + W - 1, pattern_lens)
    if atype == AlignmentType.SEMI_GLOBAL:
        # free text suffix: max over the final row's band
        k_best = jnp.argmax(final_row, axis=0).astype(jnp.int32)
        score = jnp.max(final_row, axis=0)
        return BestSink(score, pattern_lens + k_best, pattern_lens)
    return BestSink(best, sink_i, sink_i)  # LOCAL: sink_i = best row (pattern idx)


@functools.partial(jax.jit, static_argnames=("aligner",))
def batch_score_full(
    patterns: jnp.ndarray,      # (B, M) int32
    pattern_lens: jnp.ndarray,  # (B,)
    texts: jnp.ndarray,         # (B, N) int32
    text_lens: jnp.ndarray,     # (B,)
    aligner,
    mismatch_scores: jnp.ndarray | None = None,
    subst_matrix: jnp.ndarray | None = None,
) -> BestSink:
    """Full-matrix alignment via anti-diagonal wavefront.

    Semantics match ``golden.score``. Cost: (M+N) scan steps of dense
    (B, M+1) vector work.
    """
    B, M = patterns.shape
    N = texts.shape[1]
    atype = AlignmentType(aligner.type)
    po, pe, to, te = (jnp.int32(v) for v in _gap_params(aligner))
    match = jnp.int32(aligner.scoring.match)
    mm_scalar = jnp.int32(aligner.scoring.mismatch)
    neg = jnp.int32(NEG_INF)

    patterns = patterns.astype(jnp.int32)
    texts = texts.astype(jnp.int32)
    pattern_lens = pattern_lens.astype(jnp.int32)
    text_lens = text_lens.astype(jnp.int32)

    jj = jnp.arange(M + 1, dtype=jnp.int32)  # pattern index per diagonal slot

    local = atype == AlignmentType.LOCAL
    hamming_b = isinstance(aligner, HammingAligner)

    def col_boundary(i):
        # H[i][0]
        if atype == AlignmentType.GLOBAL:
            if hamming_b:
                return jnp.where(i == 0, 0, NEG_INF).astype(jnp.int32)
            return jnp.where(i == 0, 0, to + te * (i - 1)).astype(jnp.int32)
        return jnp.int32(0)

    def row_boundary(j):
        # H[0][j]
        if hamming_b:
            return jnp.where(j == 0, 0, NEG_INF).astype(jnp.int32)
        if local:
            return jnp.zeros(jnp.shape(j), jnp.int32)
        return jnp.where(j == 0, 0, po + pe * (j - 1)).astype(jnp.int32)

    # diagonal d=0: only cell (0,0)
    H2 = jnp.full((B, M + 1), neg, jnp.int32).at[:, 0].set(0)  # H on diag d-2... starts as d=0
    # diagonal d=1: cells (1,0) and (0,1)
    H1 = jnp.full((B, M + 1), neg, jnp.int32)
    H1 = H1.at[:, 0].set(col_boundary(jnp.int32(1)))
    if M >= 1:
        H1 = H1.at[:, 1].set(row_boundary(jnp.int32(1)))
    E1 = jnp.full((B, M + 1), 0 if local else NEG_INF, jnp.int32)
    F1 = jnp.full((B, M + 1), 0 if local else NEG_INF, jnp.int32)

    # rolling reversed text window: tw[:, j] = text symbol consumed by cell
    # (i=d-j, j), i.e. text[d-1-j]; at diagonal d=1: tw[:,0] = text[0]
    tw0 = jnp.full((B, M + 1), -1, jnp.int32).at[:, 0].set(texts[:, 0] if N else -1)
    # rolling reversed per-position mismatch is not needed: mm indexes pattern

    if mismatch_scores is not None:
        mmrow = jnp.concatenate(
            [jnp.full((B, 1), mm_scalar), mismatch_scores.astype(jnp.int32)], axis=1
        )  # aligned with jj: cell column j uses pattern[j-1]
    else:
        mmrow = None

    best0 = jnp.full((B,), neg, jnp.int32)
    sink0 = jnp.zeros((B, 2), jnp.int32)

    pat_row = jnp.concatenate([jnp.zeros((B, 1), jnp.int32), patterns], axis=1)

    gotoh = isinstance(aligner, GotohAligner)
    hamming = isinstance(aligner, HammingAligner)

    def step(carry, d):
        H1, H2, E1, F1, tw, best, sink = carry
        # shift text window: tw'[j] = text[d-1-j]
        new_sym = jnp.where(
            d - 1 < text_lens, texts[:, jnp.minimum(d - 1, N - 1)], -1
        )
        tw = jnp.roll(tw, 1, axis=1).at[:, 0].set(new_sym)

        ii = d - jj  # text index per slot
        mm = mm_scalar if mmrow is None else mmrow
        sub = _subst_scores(pat_row, tw, match, mm, subst_matrix)

        def shift1(x, fill):
            return jnp.concatenate([jnp.full((B, 1), fill, x.dtype), x[:, :-1]], axis=1)

        diag_base = shift1(H2, neg)
        diag = diag_base + sub

        if hamming:
            Hd = diag
            Ed, Fd = E1, F1
        elif gotoh:
            Ed = jnp.maximum(shift1(E1, neg) + pe, shift1(H1, neg) + po)
            Fd = jnp.maximum(F1 + te, H1 + to)
            Hd = jnp.maximum(diag, jnp.maximum(Ed, Fd))
        else:
            Ed = shift1(H1, neg) + po   # left move (linear)
            Fd = H1 + to                # top move (linear)
            Hd = jnp.maximum(diag, jnp.maximum(Ed, Fd))

        if local:
            Hd = jnp.maximum(Hd, 0)

        # boundaries for this diagonal
        cb = col_boundary(d)
        Hd = Hd.at[:, 0].set(jnp.broadcast_to(cb, (B,)))
        is_row0 = jj[None, :] == d  # cell (0, j=d)
        Hd = jnp.where(is_row0, row_boundary(jj)[None, :], Hd)
        if not local:
            Ed = Ed.at[:, 0].set(neg)
            Fd = jnp.where(is_row0, neg, Fd).at[:, 0].set(neg)
            Ed = jnp.where(is_row0, neg, Ed)

        valid = (
            (jj[None, :] >= 1)
            & (jj[None, :] <= pattern_lens[:, None])
            & (ii[None, :] >= 1)
            & (ii[None, :] <= text_lens[:, None])
        )

        if local:
            masked = jnp.where(valid, Hd, neg)
            row_best = jnp.max(masked, axis=1)
            row_arg = jnp.argmax(masked, axis=1).astype(jnp.int32)
            upd = row_best > best
            best = jnp.where(upd, row_best, best)
            sink = jnp.where(
                upd[:, None], jnp.stack([d - row_arg, row_arg], axis=1), sink
            )
        elif atype == AlignmentType.SEMI_GLOBAL:
            hM = jnp.take_along_axis(Hd, pattern_lens[:, None], axis=1)[:, 0]
            iM = d - pattern_lens
            ok = (iM >= 1) & (iM <= text_lens)
            upd = ok & (hM > best)
            best = jnp.where(upd, hM, best)
            sink = jnp.where(upd[:, None], jnp.stack([iM, pattern_lens], axis=1), sink)
        else:  # GLOBAL
            hM = jnp.take_along_axis(Hd, pattern_lens[:, None], axis=1)[:, 0]
            ok = d == pattern_lens + text_lens
            best = jnp.where(ok, hM, best)
            sink = jnp.where(
                ok[:, None], jnp.stack([text_lens, pattern_lens], axis=1), sink
            )

        return (Hd, H1, Ed, Fd, tw, best, sink), None

    (H1f, H2f, _, _, _, best, sink), _ = jax.lax.scan(
        step,
        (H1, H2, E1, F1, tw0, best0, sink0),
        jnp.arange(2, M + N + 1, dtype=jnp.int32),
    )

    # tiny-edge cases (empty pattern/text) fall out of the masked extraction;
    # GLOBAL with plen+tlen <= 1 handled here:
    if atype == AlignmentType.GLOBAL:
        both_small = pattern_lens + text_lens <= 1
        # recompute directly: score of aligning <=1 total symbols
        small = jnp.where(
            pattern_lens == 0,
            jnp.where(text_lens == 0, 0, to),
            po,
        ).astype(jnp.int32)
        best = jnp.where(both_small, small, best)
    return BestSink(best, sink[:, 0], sink[:, 1])
