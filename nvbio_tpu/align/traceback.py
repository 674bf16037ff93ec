"""Banded alignment traceback -> CIGAR ops (fixed-shape, batched).

The reference implements checkpointed traceback with packed direction-vector
submatrices (``nvbio/alignment/alignment.h:353-671``). The TPU design records
one packed direction byte per band cell during a second scoring pass (band
width is small, so the full direction tensor is tiny: B x M x W bytes), then
replays it with a bounded ``lax.scan`` walk emitting a fixed-width op array —
data-dependent walk lengths become masked no-ops.

Direction byte layout (per DP cell):
  bits 0-1: H provenance — 0 = diagonal (M), 1 = E/pattern-gap (I),
            2 = F/text-gap (D), 3 = local zero (stop)
  bit 2:    E extended from E (vs opened from H)
  bit 3:    F extended from F (vs opened from H)

Op codes in the emitted array: 0 = none/padding, 1 = M, 2 = I, 3 = D.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from nvbio_tpu.align.batch import (
    _exclusive_running_max_axis0,
    _gap_params,
    _subst_scores,
)
from nvbio_tpu.align.types import (
    NEG_INF,
    AlignmentType,
    GotohAligner,
    HammingAligner,
)

OP_NONE, OP_M, OP_I, OP_D = 0, 1, 2, 3
_OP_CHARS = np.array([b"?", b"M", b"I", b"D"], dtype="S1")


class TracebackResult(NamedTuple):
    score: jnp.ndarray          # (B,) int32
    ops: jnp.ndarray            # (B, MAXS) int32 op codes, in forward order
    n_ops: jnp.ndarray          # (B,) int32 number of valid ops
    pattern_start: jnp.ndarray  # (B,) int32 first pattern index consumed
    pattern_end: jnp.ndarray    # (B,) int32 one-past-last pattern index
    text_start: jnp.ndarray     # (B,) int32 first text index consumed (window coords)
    text_end: jnp.ndarray       # (B,) int32 one-past-last text index


def _banded_forward_dirs(patterns, pattern_lens, texts, text_lens, aligner, band,
                         mismatch_scores=None):
    """Banded DP forward pass recording direction bytes; returns
    (dirs (M, W, B) uint8, final_row (W, B), best (B,), sink (B,2) [local]).

    Transposed (W, B) layout — see batch_score_banded."""
    B, M = patterns.shape
    W = band
    atype = AlignmentType(aligner.type)
    po, pe, to, te = (jnp.int32(v) for v in _gap_params(aligner))
    match = jnp.int32(aligner.scoring.match)
    mm_scalar = jnp.int32(aligner.scoring.mismatch)
    neg = jnp.int32(NEG_INF)
    local = atype == AlignmentType.LOCAL
    hamming = isinstance(aligner, HammingAligner)

    patterns_T = patterns.astype(jnp.int32).T
    TW = M + W - 1
    texts = texts.astype(jnp.int32)
    if texts.shape[1] < TW:
        texts = jnp.pad(texts, ((0, 0), (0, TW - texts.shape[1])))
    texts_T = texts.T
    pattern_lens = pattern_lens.astype(jnp.int32)
    text_lens = text_lens.astype(jnp.int32)
    mm_T = None if mismatch_scores is None else mismatch_scores.astype(jnp.int32).T
    kcol = jnp.arange(W, dtype=jnp.int32)[:, None]

    if atype == AlignmentType.GLOBAL:
        H0 = jnp.broadcast_to(
            jnp.where(kcol == 0, 0, to + te * (kcol - 1)).astype(jnp.int32), (W, B)
        )
    else:
        H0 = jnp.zeros((W, B), jnp.int32)
    E0 = jnp.full((W, B), neg, jnp.int32)

    best0 = jnp.full((B,), neg, jnp.int32)
    sink0 = jnp.zeros((B, 2), jnp.int32)
    finit = jnp.full((W, B), neg, jnp.int32)

    def step(carry, i):
        H_prev, E_prev, best, sink, final_row = carry
        p = jax.lax.dynamic_index_in_dim(patterns_T, i - 1, axis=0, keepdims=False)
        trow = jax.lax.dynamic_slice_in_dim(texts_T, i - 1, W, axis=0)
        if mm_T is None:
            mm = mm_scalar
        else:
            mm = jax.lax.dynamic_index_in_dim(mm_T, i - 1, axis=0, keepdims=False)[None, :]
        sub = _subst_scores(p[None, :], trow, match, mm)
        tidx = (i - 1) + kcol
        sub = jnp.where(tidx < text_lens[None, :], sub, neg)
        diag = H_prev + sub

        if hamming:
            Erow = jnp.full((W, B), neg, jnp.int32)
            Frow = Erow
            H0r = diag
            Hrow = jnp.maximum(H0r, 0) if local else H0r
            e_ext = jnp.zeros((W, B), bool)
            f_ext = jnp.zeros((W, B), bool)
        else:
            Hp_shift = jnp.concatenate([H_prev[1:], jnp.full((1, B), neg)], axis=0)
            Ep_shift = jnp.concatenate([E_prev[1:], jnp.full((1, B), neg)], axis=0)
            Erow = jnp.maximum(Ep_shift + pe, Hp_shift + po)
            e_ext = Ep_shift + pe >= Hp_shift + po
            H0r = jnp.maximum(diag, Erow)
            if local:
                H0r = jnp.maximum(H0r, 0)
            G = H0r + (to - te * kcol)
            Frow = _exclusive_running_max_axis0(G) + (te * (kcol - 1))
            Fshift = jnp.concatenate([jnp.full((1, B), neg), Frow[:-1]], axis=0)
            f_ext = Frow == Fshift + te
            Hrow = jnp.maximum(H0r, Frow)

        hdir = jnp.where(
            Hrow == diag,
            OP_M - 1,  # 0
            jnp.where(Hrow == Erow, 1, 2),
        ).astype(jnp.int32)
        if local:
            hdir = jnp.where(Hrow == 0, 3, hdir)
        byte = (
            hdir | (e_ext.astype(jnp.int32) << 2) | (f_ext.astype(jnp.int32) << 3)
        ).astype(jnp.uint8)

        at_final = (i == pattern_lens)[None, :]
        final_row = jnp.where(at_final, Hrow, final_row)

        if local:
            row_valid = (i <= pattern_lens)[None, :] & (tidx < text_lens[None, :])
            masked = jnp.where(row_valid, Hrow, neg)
            row_best = jnp.max(masked, axis=0)
            row_arg = jnp.argmax(masked, axis=0).astype(jnp.int32)
            upd = row_best > best
            best = jnp.where(upd, row_best, best)
            sink = jnp.where(
                upd[:, None],
                jnp.stack([jnp.full((B,), i, jnp.int32), row_arg], axis=1),
                sink,
            )

        return (Hrow, Erow, best, sink, final_row), byte

    (Hl, El, best, sink, final_row), dirs = jax.lax.scan(
        step, (H0, E0, best0, sink0, finit), jnp.arange(1, M + 1, dtype=jnp.int32)
    )
    return dirs, final_row, best, sink  # dirs: (M, W, B)


@functools.partial(jax.jit, static_argnames=("aligner", "band"))
def batch_traceback_banded(
    patterns: jnp.ndarray,
    pattern_lens: jnp.ndarray,
    texts: jnp.ndarray,
    text_lens: jnp.ndarray,
    aligner,
    band: int,
    mismatch_scores: jnp.ndarray | None = None,
) -> TracebackResult:
    """Score + full traceback for banded alignment (semantics of
    ``batch_score_banded``); returns forward-ordered op arrays."""
    B, M = patterns.shape
    W = band
    atype = AlignmentType(aligner.type)
    local = atype == AlignmentType.LOCAL
    glob = atype == AlignmentType.GLOBAL
    pattern_lens = pattern_lens.astype(jnp.int32)

    dirs, final_row, best_local, sink_local = _banded_forward_dirs(
        patterns, pattern_lens, texts, text_lens, aligner, band, mismatch_scores
    )
    dirs_flat = dirs.reshape(M * W, B)  # (cell, B)

    if local:
        score = best_local
        i0 = sink_local[:, 0]
        k0 = sink_local[:, 1]
    elif glob:
        score = final_row[W - 1]
        i0 = pattern_lens
        k0 = jnp.full((B,), W - 1, jnp.int32)
    else:
        score = jnp.max(final_row, axis=0)
        i0 = pattern_lens
        k0 = jnp.argmax(final_row, axis=0).astype(jnp.int32)

    MAXS = M + W
    ST_H, ST_E, ST_F = 0, 1, 2

    def walk(carry, _):
        i, k, st, done = carry
        cell = jnp.take_along_axis(
            dirs_flat, (jnp.clip(i - 1, 0, M - 1) * W + k)[None, :], axis=0
        )[0].astype(jnp.int32)
        hdir = cell & 3
        e_ext = (cell >> 2) & 1
        f_ext = (cell >> 3) & 1

        at_global_edge = glob & (i == 0) & (k > 0)
        stop_now = jnp.where(
            done,
            True,
            jnp.where(
                at_global_edge,
                False,
                # the local zero-stop only applies in the H state: a gap
                # chain (st==E/F) may pass through a cell whose own H was
                # clamped to zero
                (i == 0) | (local & (hdir == 3) & (st == ST_H)),
            ),
        )

        # effective move selector
        sel = jnp.where(
            at_global_edge,
            2,  # leading text gap => D
            jnp.where(
                st == ST_E, 1, jnp.where(st == ST_F, 2, hdir)
            ),
        )
        op = jnp.where(
            stop_now,
            OP_NONE,
            jnp.where(sel == 0, OP_M, jnp.where(sel == 1, OP_I, OP_D)),
        )

        di = jnp.where(sel == 0, -1, jnp.where(sel == 1, -1, 0))
        dk = jnp.where(sel == 0, 0, jnp.where(sel == 1, 1, -1))
        new_st = jnp.where(
            sel == 0,
            ST_H,
            jnp.where(
                sel == 1,
                jnp.where(e_ext == 1, ST_E, ST_H),
                jnp.where(f_ext == 1, ST_F, ST_H),
            ),
        )
        new_st = jnp.where(at_global_edge, ST_H, new_st)

        i = jnp.where(stop_now, i, i + di)
        k = jnp.where(stop_now, k, k + dk)
        st = jnp.where(stop_now, st, new_st)
        done = done | stop_now
        return (i, k, st, done), op

    st0 = jnp.zeros((B,), jnp.int32)
    done0 = jnp.zeros((B,), bool)
    (iF, kF, _, _), ops_rev = jax.lax.scan(
        walk, (i0, k0, st0, done0), None, length=MAXS
    )
    ops_rev = jnp.transpose(ops_rev, (1, 0))  # (B, MAXS), end -> start order

    n_ops = jnp.sum(ops_rev != OP_NONE, axis=1).astype(jnp.int32)
    # reverse into forward order, left-aligned: index math over fixed shape
    idx = n_ops[:, None] - 1 - jnp.arange(MAXS, dtype=jnp.int32)[None, :]
    ops_fwd = jnp.where(
        idx >= 0,
        jnp.take_along_axis(ops_rev, jnp.clip(idx, 0, MAXS - 1), axis=1),
        OP_NONE,
    )
    return TracebackResult(
        score=score,
        ops=ops_fwd,
        n_ops=n_ops,
        pattern_start=iF,
        pattern_end=i0,
        text_start=iF + kF,
        text_end=i0 + k0,
    )


def cigar_to_string(ops: np.ndarray, n_ops: int, reverse: bool = False) -> str:
    """Run-length encode a forward op array into a CIGAR string (host-side,
    vectorized: boundary detection via one nonzero instead of a char loop).
    ``reverse=True`` consumes end->start op arrays (the TPU fast path).
    Accepts packed MD entries (op in bits 0-1) as well as plain op codes."""
    n = int(n_ops)
    if n == 0:
        return "*"
    ops = np.asarray(ops)[:n] & 3
    if reverse:
        ops = ops[::-1]
    bounds = np.nonzero(ops[1:] != ops[:-1])[0]
    chars = "?MID"
    if not len(bounds):  # single-run fast path (most reads: all-M)
        return f"{n}{chars[int(ops[0])]}"
    edges = [0, *(bounds + 1).tolist(), n]
    return "".join(
        f"{edges[i + 1] - edges[i]}{chars[int(ops[edges[i]])]}"
        for i in range(len(edges) - 1)
    )


def ops_to_chars(ops: np.ndarray, n_ops: int) -> str:
    """Expand a forward op array to an 'MID' character string."""
    return "".join("?MID"[o & 3] for o in np.asarray(ops)[:int(n_ops)])


# MD entry layout (packed by the fused traceback walk and by
# ``_md_pack_entries``): bits 0-1 op (1/2/3 = M/I/D), bit 2 mismatch
# (M cells only), bits 3-6 the reference symbol under the cell.
_MD_BASES = "ACGTNNNNNNNNNNNN"  # codes >= 4 are genome-N variants


def md_from_entries(entries: np.ndarray, n_ops: int, reverse: bool = False):
    """(MD, XM, XO, XG) from packed traceback entries.

    The SAM MD tag + bowtie2's XM (mismatches) / XO (gap opens) / XG (gap
    extensions) aux tags, rendered host-side exactly as the reference does at
    output time (``nvbio/io/output/output_sam.cpp:233-270`` generate_md_string,
    fed by the MDS vectors traceback builds, ``nvBowtie/bowtie2/cuda/
    traceback.h:134-190``)."""
    n = int(n_ops)
    e = np.asarray(entries)[:n]
    if reverse:
        e = e[::-1]
    ops = e & 3
    mism = (e >> 2) & 1
    sym = (e >> 3) & 15
    is_gap = ops != OP_M
    if not is_gap.any():
        # mismatch-only fast path (vectorized): runs between mismatch sites
        mm_pos = np.flatnonzero(mism)
        if not len(mm_pos):
            return str(n), 0, 0, 0
        runs = np.diff(np.concatenate([[-1], mm_pos])) - 1
        md = "".join(
            f"{r}{_MD_BASES[sym[p]]}" for r, p in zip(runs.tolist(), mm_pos)
        ) + str(n - int(mm_pos[-1]) - 1)
        return md, len(mm_pos), 0, 0
    parts = []
    run = xm = xo = xg = 0
    i = 0
    while i < n:
        op = ops[i]
        if op == OP_M:
            if mism[i]:
                parts.append(f"{run}{_MD_BASES[sym[i]]}")
                run = 0
                xm += 1
            else:
                run += 1
            i += 1
        elif op == OP_D:
            j = i
            while j < n and ops[j] == OP_D:
                j += 1
            parts.append(f"{run}^" + "".join(_MD_BASES[s] for s in sym[i:j]))
            run = 0
            xo += 1
            xg += j - i
            i = j
        else:  # insertion: MD skips read-only bases
            j = i
            while j < n and ops[j] == OP_I:
                j += 1
            xo += 1
            xg += j - i
            i = j
    parts.append(str(run))
    return "".join(parts), xm, xo, xg


@functools.partial(jax.jit,
                   static_argnames=("scoring", "band", "interpret", "local"))
def batch_traceback_banded_fast(
    patterns: jnp.ndarray,
    pattern_lens: jnp.ndarray,
    texts: jnp.ndarray,
    text_lens: jnp.ndarray,
    scoring,
    band: int,
    mismatch_scores: jnp.ndarray | None = None,
    interpret: bool = False,
    local: bool = False,
):
    """SEMI_GLOBAL Gotoh traceback on the TPU fast path.

    Returns ``(TracebackResult, nm)`` — nm is the SAM NM edit count,
    accumulated during the in-kernel walk (a mismatch bit rides in the
    direction byte), which avoids the two (B, M+W) per-lane symbol gathers
    the generic NM computation needs.

    NOTE: unlike ``batch_traceback_banded``, ``ops`` is returned in
    END->START order (as the walk emits it). Reversing on device would be
    one more per-lane gather; the host CIGAR formatter reverses for free
    (``cigar_to_string(..., reverse=True)``).

    Same result contract as ``batch_traceback_banded`` with a
    ``GotohAligner(SEMI_GLOBAL, scoring)``, but runs as ONE fused Pallas
    kernel: the forward pass records 4-bit directions into a VMEM scratch
    plane (never HBM), then replays them in-kernel with a row-synchronous
    walk — every lane is at the same pattern row, so the direction row is a
    dense slice and the per-lane band-offset select is a one-hot over the
    band. This avoids both the generic walk's per-lane gathers (scalar-core
    loads) and XLA while-loop per-iteration overheads.
    """
    from nvbio_tpu.align.pallas_kernels import (
        banded_traceback_semiglobal_pallas,
    )

    B, M = patterns.shape
    W = band
    pattern_lens = pattern_lens.astype(jnp.int32)

    score, k0, ops_rev, n_ops, k_fin, nm, i_end, i_start = \
        banded_traceback_semiglobal_pallas(
            patterns, pattern_lens, texts, text_lens, scoring, W,
            mismatch_scores, interpret=interpret, local=local)

    return TracebackResult(
        score=score,
        ops=ops_rev,  # end->start order; host formatter reverses
        n_ops=n_ops,
        pattern_start=i_start,
        pattern_end=i_end,
        text_start=i_start + k_fin,
        text_end=i_end + k0,
    ), nm


@functools.partial(jax.jit,
                   static_argnames=("scoring", "interpret", "local"))
def batch_traceback_full(
    patterns: jnp.ndarray,
    pattern_lens: jnp.ndarray,
    texts: jnp.ndarray,
    text_lens: jnp.ndarray,
    scoring,
    mismatch_scores: jnp.ndarray | None = None,
    interpret: bool = False,
    local: bool = False,
):
    """FULL-MATRIX traceback: the pattern may align ANYWHERE in the text
    window with arbitrary indel drift — no band constraint.

    The reference uses this for PE opposite-mate traceback
    (``nvbio/alignment/alignment.h:353-402`` full-DP traceback, consumed at
    ``nvBowtie/bowtie2/cuda/aligner_best_approx_paired.h:404-479``). The
    TPU realization is EXACT, not approximate: a banded traceback with
    band W = T + M over the text LEFT-PADDED by M never-match symbols
    covers every monotone path of the full M x T matrix — the band cell
    (i, k) addresses text j = i-1+k-M, and any path satisfies
    j in [i-1-M, i-1+T], i.e. k in [0, W). Costs O(M*(T+M)) like the true
    full matrix; coordinates are un-shifted before returning.

    Returns ``(TracebackResult, nm)`` with ops END->START (the fused-path
    convention; host formatters reverse).
    """
    B, M = patterns.shape
    T = texts.shape[1]
    pad = M
    W = T + pad
    # never-match pad: symbol 8 differs from every pattern code (<= 4) and
    # renders as 'N' in MD bytes if a degenerate path ever touches it
    texts_p = jnp.concatenate(
        [jnp.full((B, pad), 8, texts.dtype), texts], axis=1)
    tlens_p = text_lens.astype(jnp.int32) + pad

    tb, nm = batch_traceback_banded_fast(
        patterns, pattern_lens, texts_p, tlens_p, scoring, W,
        mismatch_scores, interpret=interpret, local=local)
    return tb._replace(
        text_start=tb.text_start - pad,
        text_end=tb.text_end - pad,
    ), nm


@functools.partial(jax.jit, static_argnames=("aligner",))
def batch_traceback_full_scan(
    patterns, pattern_lens, texts, text_lens, aligner,
    mismatch_scores=None,
):
    """Generic-engine (XLA scan) full-matrix traceback — same pad trick as
    ``batch_traceback_full``, forward-ordered ops (the scan contract)."""
    B, M = patterns.shape
    T = texts.shape[1]
    pad = M
    W = T + pad
    texts_p = jnp.concatenate(
        [jnp.full((B, pad), 8, texts.dtype), texts], axis=1)
    tlens_p = text_lens.astype(jnp.int32) + pad
    tb = batch_traceback_banded(patterns, pattern_lens, texts_p, tlens_p,
                                aligner, W, mismatch_scores)
    return tb._replace(text_start=tb.text_start - pad,
                       text_end=tb.text_end - pad)
