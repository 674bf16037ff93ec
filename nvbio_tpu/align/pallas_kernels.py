"""Pallas TPU kernels for the alignment hot loops.

The XLA scan formulation of banded scoring (``batch.batch_score_banded``)
round-trips its (W, B) band state through HBM on every pattern row (scan
carries), capping it at a few GCUPS. This kernel keeps H/E/final planes in
VMEM scratch for a whole batch block and streams only patterns/texts in and
scores out — HBM traffic drops to the input/output minimum.

Semantics: SEMI_GLOBAL banded Gotoh with per-position mismatch penalties,
bit-exact vs ``batch_score_banded`` (tests compare in interpret mode on CPU).

Corresponds to the reference's banded Gotoh CUDA kernels
(``nvbio/alignment/gotoh/gotoh_banded_inl.h``) + the staged register-tiling
scheduler (``alignment/batched.h:72``), re-designed for the 8x128 VPU: batch
in lanes, band in sublanes, lazy-F via log-step prefix max.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from nvbio_tpu.align.types import NEG_INF, GotohScoring

DEFAULT_BLOCK = 1024


_ROWS = 8  # pattern rows per loop iteration (sublane-aligned tile loads)


def _banded_kernel(
    pat_ref, plen_ref, txt_ref, tlen_ref, mm_ref, score_ref, kbest_ref,
    H, E, FINAL,
    *, L, W, match, po, pe, to, te, local=False,
):
    # Mosaic requires sublane-aligned dynamic slices, so the loop processes
    # _ROWS pattern rows per step: one aligned text tile load, then static
    # in-register sub-slices per row.
    BLK = pat_ref.shape[1]
    neg = jnp.int32(NEG_INF)
    kcol = jax.lax.broadcasted_iota(jnp.int32, (W, BLK), 0)  # band index k
    TILE_T = _round_up(W + _ROWS - 1, _ROWS)

    H[:] = jnp.zeros((W, BLK), jnp.int32)
    E[:] = jnp.full((W, BLK), neg, jnp.int32)
    FINAL[:] = jnp.full((W, BLK), neg, jnp.int32)

    plen = plen_ref[0, :]
    tlen = tlen_ref[0, :]

    def shift_down(x, d):
        # x[k] <- x[k-d], top filled with NEG (prefix-max building block)
        return jnp.concatenate(
            [jnp.full((d, BLK), neg, jnp.int32), x[:-d]], axis=0
        )

    def shift_up(x, d):
        # x[k] <- x[k+d], bottom filled with NEG
        return jnp.concatenate(
            [x[d:], jnp.full((d, BLK), neg, jnp.int32)], axis=0
        )

    n_blocks = (L + _ROWS - 1) // _ROWS

    def body(t, _):
        base = pl.multiple_of(t * _ROWS, _ROWS)
        pat_tile = pat_ref[pl.ds(base, _ROWS), :]      # (_ROWS, BLK)
        mm_tile = mm_ref[pl.ds(base, _ROWS), :]
        txt_tile = txt_ref[pl.ds(base, TILE_T), :]     # (TILE_T, BLK)

        for r in range(_ROWS):
            i = base + r + 1  # 1-based pattern row
            p = pat_tile[r:r + 1, :]
            mmrow = mm_tile[r:r + 1, :]
            trow = txt_tile[r:r + W, :]                # static sub-slice

            sub = jnp.where(p == trow, jnp.int32(match), mmrow)
            tidx = (i - 1) + kcol
            sub = jnp.where(tidx < tlen[None, :], sub, neg)

            H_prev = H[:]
            E_prev = E[:]
            diag = H_prev + sub

            Hp = shift_up(H_prev, 1)
            Ep = shift_up(E_prev, 1)
            Erow = jnp.maximum(Ep + pe, Hp + po)
            H0r = jnp.maximum(diag, Erow)
            if local:
                H0r = jnp.maximum(H0r, 0)

            # lazy-F: F[k] = te*(k-1) + max_{k'<k}(H0[k'] + to - te*k')
            G = H0r + (jnp.int32(to) - jnp.int32(te) * kcol)
            d = 1
            while d < W:
                G = jnp.maximum(G, shift_down(G, d))
                d *= 2
            excl = shift_down(G, 1)
            F = excl + jnp.int32(te) * (kcol - 1)
            Hrow = jnp.maximum(H0r, F)

            H[:] = Hrow
            E[:] = Erow
            if local:
                # LOCAL sink: running max over every in-range cell
                row_valid = (i <= plen)[None, :] & (tidx < tlen[None, :])
                FINAL[:] = jnp.maximum(
                    FINAL[:], jnp.where(row_valid, Hrow, neg))
            else:
                at_final = (i == plen)[None, :]
                FINAL[:] = jnp.where(at_final, Hrow, FINAL[:])
        return 0

    jax.lax.fori_loop(0, n_blocks, body, 0)

    fin = FINAL[:]
    smax = jnp.max(fin, axis=0)
    score_ref[0, :] = smax
    # first-max index (int argmax unsupported in Mosaic): min k where max hit
    kbest_ref[0, :] = jnp.min(
        jnp.where(fin == smax[None, :], kcol, jnp.int32(W)), axis=0
    )


@functools.partial(
    jax.jit,
    static_argnames=("scoring", "band", "block", "interpret", "local"),
)
def banded_score_semiglobal_pallas(
    patterns: jnp.ndarray,      # (B, M) int32
    pattern_lens: jnp.ndarray,  # (B,)
    texts: jnp.ndarray,         # (B, T) int32, T >= M + band - 1
    text_lens: jnp.ndarray,     # (B,)
    scoring: GotohScoring,
    band: int,
    mismatch_scores: jnp.ndarray | None = None,
    block: int = DEFAULT_BLOCK,
    interpret: bool = False,
    local: bool = False,
):
    """SEMI_GLOBAL (or LOCAL with ``local=True``) banded Gotoh scores via
    the Pallas kernel.

    Returns (scores (B,), k_best (B,)) — same values as
    ``batch_score_banded(..., GotohAligner(SEMI_GLOBAL|LOCAL, scoring),
    band)``. Pads the batch to a multiple of ``block`` internally.
    """
    B, M = patterns.shape
    W = band
    TW = M + W - 1
    BLK = min(block, _round_up(max(B, 128), 128))
    Bp = _round_up(B, BLK)
    # row padding so every _ROWS-aligned tile load is in range
    Lp = _round_up(M, _ROWS)
    TILE_T = _round_up(W + _ROWS - 1, _ROWS)
    TWp = (Lp - _ROWS) + TILE_T

    patterns_T = _pad_rows(_pad_cols(patterns.astype(jnp.int32).T, Bp), Lp)
    texts = texts.astype(jnp.int32)
    if texts.shape[1] < TW:
        texts = jnp.pad(texts, ((0, 0), (0, TW - texts.shape[1])))
    texts_T = _pad_rows(_pad_cols(texts[:, :TW].T, Bp), TWp)
    plens = _pad_cols(pattern_lens.astype(jnp.int32)[None, :], Bp)  # (1, Bp)
    tlens = _pad_cols(text_lens.astype(jnp.int32)[None, :], Bp)
    if mismatch_scores is None:
        mm_T = jnp.full((Lp, Bp), scoring.mismatch, jnp.int32)
    else:
        mm_T = _pad_rows(_pad_cols(mismatch_scores.astype(jnp.int32).T, Bp), Lp)

    kern = functools.partial(
        _banded_kernel,
        L=M, W=W, match=scoring.match,
        po=scoring.pattern_gap_open, pe=scoring.pattern_gap_ext,
        to=scoring.text_gap_open, te=scoring.text_gap_ext, local=local,
    )
    grid = (Bp // BLK,)
    col = lambda j: (0, j)
    score, kbest = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((Lp, BLK), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLK), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((TWp, BLK), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLK), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((Lp, BLK), col, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BLK), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLK), col, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, Bp), jnp.int32),
            jax.ShapeDtypeStruct((1, Bp), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((W, BLK), jnp.int32),
            pltpu.VMEM((W, BLK), jnp.int32),
            pltpu.VMEM((W, BLK), jnp.int32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=10 * Bp * M * W, bytes_accessed=4 * Bp * (2 * M + TW + 4),
            transcendentals=0,
        ),
    )(patterns_T, plens, texts_T, tlens, mm_T)
    return score[0, :B], kbest[0, :B]


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pad_cols(x, Bp):
    if x.shape[1] == Bp:
        return x
    return jnp.pad(x, ((0, 0), (0, Bp - x.shape[1])))


def _pad_rows(x, Lp):
    if x.shape[0] >= Lp:
        return x
    return jnp.pad(x, ((0, Lp - x.shape[0]), (0, 0)))


# ---------------------------------------------------------------------------
# Traceback: Pallas forward pass recording packed direction bytes + a
# row-synchronous replay walk.
#
# The reference stores checkpointed direction-vector submatrices and replays
# them per-thread (``nvbio/alignment/alignment.h:353-671``). Here the forward
# pass is the same VMEM-resident band loop as the scoring kernel, emitting one
# 4-bit code per cell into HBM; the walk then runs at the XLA level in
# row-lockstep: every lane is at the same pattern row, so the direction-row
# load is a dense dynamic slice and the per-lane band-offset select is a tiny
# one-hot over W — no per-lane gathers (which would serialize on the scalar
# core, ~8x slower end-to-end).
# ---------------------------------------------------------------------------


def _banded_tb_kernel(
    pat_ref, plen_ref, txt_ref, tlen_ref, mm_ref,
    score_ref, kbest_ref, ops_ref, nops_ref, kfin_ref, nm_ref,
    iend_ref, istart_ref,
    H, E, FINAL, BST, DIRS, CKPT_H=None, CKPT_E=None,
    *, L, W, W8, MAXS, STRIPE, N_STRIPES, match, po, pe, to, te, local,
):
    """Fused banded Gotoh forward + traceback walk, all VMEM-resident.

    Forward identical to ``_banded_kernel`` but directions stay in a VMEM
    scratch plane; the walk then runs in-kernel row-synchronously (see
    ``batch_traceback_banded_fast``), so no direction bytes ever reach HBM.

    CHECKPOINTED mode (``N_STRIPES > 1``) — the TPU re-design of the
    reference's checkpointed traceback (``nvbio/alignment/alignment.h:
    544-671``): the forward pass stores only the (H, E) band state at every
    STRIPE-row boundary (CKPT_H/CKPT_E scratch) and no directions; the walk
    then replays one STRIPE x W8 direction stripe at a time into the small
    reusable DIRS buffer, walking each stripe before replaying the next
    (stripes are visited in strictly descending order because the walk is
    row-synchronous). Scratch drops from O(L*W8) to O(STRIPE*W8 + S*2*W8)
    per lane at the cost of one forward recompute — the same memory/FLOPs
    trade the reference's CHECKPOINTS template parameter makes.
    """
    BLK = pat_ref.shape[1]
    neg = jnp.int32(NEG_INF)
    kcol = jax.lax.broadcasted_iota(jnp.int32, (W, BLK), 0)
    kcol8 = jax.lax.broadcasted_iota(jnp.int32, (W8, BLK), 0)
    TILE_T = _round_up(W + _ROWS - 1, _ROWS)
    S = N_STRIPES
    spr = STRIPE // _ROWS  # forward blocks per stripe

    H[:] = jnp.zeros((W, BLK), jnp.int32)
    E[:] = jnp.full((W, BLK), neg, jnp.int32)
    FINAL[:] = jnp.full((W, BLK), neg, jnp.int32)

    plen = plen_ref[0, :]
    tlen = tlen_ref[0, :]

    def shift_down(x, d):
        return jnp.concatenate(
            [jnp.full((d, BLK), neg, jnp.int32), x[:-d]], axis=0)

    def shift_up(x, d):
        return jnp.concatenate(
            [x[d:], jnp.full((d, BLK), neg, jnp.int32)], axis=0)

    def process_block(t, dirs_base, write_dirs, track):
        # one _ROWS-row tile of the forward recurrence; ``t`` is the
        # (dynamic) block index, ``dirs_base`` the first pattern row held by
        # the DIRS buffer (0 when unstriped, s*STRIPE during stripe replay)
        base = pl.multiple_of(t * _ROWS, _ROWS)
        pat_tile = pat_ref[pl.ds(base, _ROWS), :]
        mm_tile = mm_ref[pl.ds(base, _ROWS), :]
        txt_tile = txt_ref[pl.ds(base, TILE_T), :]

        for r in range(_ROWS):
            i = base + r + 1
            p = pat_tile[r:r + 1, :]
            mmrow = mm_tile[r:r + 1, :]
            trow = txt_tile[r:r + W, :]

            sub = jnp.where(p == trow, jnp.int32(match), mmrow)
            tidx = (i - 1) + kcol
            sub = jnp.where(tidx < tlen[None, :], sub, neg)

            H_prev = H[:]
            E_prev = E[:]
            diag = H_prev + sub

            Hp = shift_up(H_prev, 1)
            Ep = shift_up(E_prev, 1)
            Erow = jnp.maximum(Ep + pe, Hp + po)
            e_ext = Ep + pe >= Hp + po
            H0r = jnp.maximum(diag, Erow)
            if local:
                H0r = jnp.maximum(H0r, 0)

            G = H0r + (jnp.int32(to) - jnp.int32(te) * kcol)
            d = 1
            while d < W:
                G = jnp.maximum(G, shift_down(G, d))
                d *= 2
            excl = shift_down(G, 1)
            F = excl + jnp.int32(te) * (kcol - 1)
            Fsh = shift_down(F, 1)
            f_ext = F == Fsh + jnp.int32(te)
            Hrow = jnp.maximum(H0r, F)

            if write_dirs:
                hdir = jnp.where(Hrow == diag, 0,
                                 jnp.where(Hrow == Erow, 1, 2))
                if local:
                    hdir = jnp.where(Hrow == 0, 3, hdir)  # zero-stop cell
                mism = (p != trow).astype(jnp.int32)  # bit 4: walk-time NM
                # bits 5-8: the cell's text symbol (4 bits so genome-N codes
                # 8..11 fit) — lets the walk emit MD ref bases, no gathers
                byte = (hdir
                        | (e_ext.astype(jnp.int32) << 2)
                        | (f_ext.astype(jnp.int32) << 3)
                        | (mism << 4)
                        | ((trow & 15) << 5))
                pad = jnp.zeros((W8 - W, BLK), jnp.int32)
                off = pl.multiple_of((base - dirs_base + r) * W8, _ROWS)
                DIRS[pl.ds(off, W8), :] = jnp.concatenate([byte, pad], axis=0)

            H[:] = Hrow
            E[:] = Erow
            if track:
                if local:
                    # track the best in-range cell (the LOCAL sink)
                    row_valid = (i <= plen)[None, :] & (tidx < tlen[None, :])
                    masked = jnp.where(row_valid, Hrow, neg)
                    rb = jnp.max(masked, axis=0)
                    rk = jnp.min(jnp.where(masked == rb[None, :], kcol,
                                           jnp.int32(W)), axis=0)
                    upd = rb > BST[0, :]
                    BST[0, :] = jnp.where(upd, rb, BST[0, :])
                    BST[1, :] = jnp.where(upd, jnp.int32(i), BST[1, :])
                    BST[2, :] = jnp.where(upd, jnp.minimum(rk, W - 1),
                                          BST[2, :])
                else:
                    at_final = (i == plen)[None, :]
                    FINAL[:] = jnp.where(at_final, Hrow, FINAL[:])

    BST[0, :] = jnp.zeros((BLK,), jnp.int32)  # LOCAL scores are >= 0
    BST[1, :] = jnp.zeros((BLK,), jnp.int32)
    BST[2, :] = jnp.zeros((BLK,), jnp.int32)

    if S == 1:
        def body(t, _):
            process_block(t, 0, True, True)
            return 0

        jax.lax.fori_loop(0, spr, body, 0)
    else:
        he_pad = jnp.full((W8 - W, BLK), neg, jnp.int32)

        def sbody(s, _):
            # checkpoint the band state at entry to stripe s
            off = pl.multiple_of(s * W8, _ROWS)
            CKPT_H[pl.ds(off, W8), :] = jnp.concatenate([H[:], he_pad], 0)
            CKPT_E[pl.ds(off, W8), :] = jnp.concatenate([E[:], he_pad], 0)

            def bbody(j, _):
                process_block(s * spr + j, 0, False, True)
                return 0

            jax.lax.fori_loop(0, spr, bbody, 0)
            return 0

        jax.lax.fori_loop(0, S, sbody, 0)

    if local:
        smax = BST[0, :]
        i0 = BST[1, :]
        k0 = BST[2, :]
    else:
        fin = FINAL[:]
        smax = jnp.max(fin, axis=0)
        k0 = jnp.min(jnp.where(fin == smax[None, :], kcol, jnp.int32(W)),
                     axis=0)
        k0 = jnp.minimum(k0, jnp.int32(W - 1))
        i0 = plen
    score_ref[0, :] = smax
    kbest_ref[0, :] = k0
    iend_ref[0, :] = i0

    # ---- row-synchronous walk, dirs resident in VMEM ----------------------
    ops_rows = jax.lax.broadcasted_iota(jnp.int32, (MAXS, BLK), 0)
    ops_ref[:] = jnp.zeros((MAXS, BLK), jnp.int32)

    def make_walk(lo, dirs_base):
        # walk rows (lo, r0] of the stripe whose first row is dirs_base+1;
        # lo/dirs_base are static per (unrolled) stripe

        def walk_cond(c):
            r, i, k, st, cursor, nm = c
            return (r > lo) & jnp.any(i >= 1)

        def walk_step(c):
            r, i, k, st, cursor, nm = c
            off = pl.multiple_of((r - 1 - dirs_base) * W8, _ROWS)
            row = DIRS[pl.ds(off, W8), :]
            act = i == r
            cell = jnp.sum(jnp.where(kcol8 == k[None, :], row, 0), axis=0)
            hdir = cell & 3
            e_ext = (cell >> 2) & 1
            f_ext = (cell >> 3) & 1
            mism = (cell >> 4) & 1
            sym = (cell >> 5) & 15
            if local:
                # zero-stop: only in the H state (a gap chain may pass
                # through)
                stop = act & (st == 0) & (hdir == 3)
                istart_ref[0, :] = jnp.where(stop, i, istart_ref[0, :])
                kfin_ref[0, :] = jnp.where(stop, k, kfin_ref[0, :])
                i = jnp.where(stop, 0, i)
                act = act & ~stop
            sel = jnp.where(st == 1, 1, jnp.where(st == 2, 2, hdir))
            op = jnp.where(sel == 0, 1, jnp.where(sel == 1, 2, 3))
            # NM: mismatching M cells + every gap op
            nm = nm + jnp.where(act,
                                jnp.where(sel == 0, mism, 1), 0)
            di = jnp.where(sel == 2, 0, 1)
            dk = jnp.where(sel == 0, 0, jnp.where(sel == 1, 1, -1))
            new_st = jnp.where(
                sel == 0, 0,
                jnp.where(sel == 1,
                          jnp.where(e_ext == 1, 1, 0),
                          jnp.where(f_ext == 1, 2, 0)))
            # packed op entry: op(2b) | mism(1b, M cells only) | ref-sym(4b)
            # — everything the host MD/CIGAR formatter needs, no gathers
            entry = (op
                     | (jnp.where(sel == 0, mism, 0) << 2)
                     | (sym << 3))
            ops_ref[:] = ops_ref[:] + jnp.where(
                act[None, :] & (ops_rows == cursor[None, :]),
                entry[None, :], 0)
            cursor = jnp.where(act, cursor + 1, cursor)
            i = jnp.where(act, i - di, i)
            k = jnp.where(act, jnp.clip(k + dk, 0, W - 1), k)
            st = jnp.where(act, new_st, st)
            # advance to the next row only once every lane has left this one
            r = jnp.where(jnp.any(i == r), r, r - 1)
            return r, i, k, st, cursor, nm

        return walk_cond, walk_step

    zero_v = jnp.zeros((BLK,), jnp.int32)
    istart_ref[0, :] = zero_v
    kfin_ref[0, :] = zero_v
    r0 = jnp.int32(L)
    state = (r0, i0 if local else plen, k0, zero_v, zero_v, zero_v)
    if S == 1:
        cond, step = make_walk(0, 0)
        state = jax.lax.while_loop(cond, step, state)
    else:
        for s in reversed(range(S)):
            # replay stripe s into DIRS (skipped when every lane is done —
            # local walks usually stop long before row 0), then walk it
            alive = jnp.any(state[1] >= 1)

            @pl.when(alive)
            def _replay(s=s):
                H[:] = CKPT_H[s * W8:(s + 1) * W8, :][:W, :]
                E[:] = CKPT_E[s * W8:(s + 1) * W8, :][:W, :]

                def rbody(j, _, s=s):
                    process_block(s * spr + j, s * STRIPE, True, False)
                    return 0

                jax.lax.fori_loop(0, spr, rbody, 0)

            cond, step = make_walk(s * STRIPE, s * STRIPE)
            state = jax.lax.while_loop(cond, step, state)
    _, iF, kF, _, cursor, nm = state
    if local:
        # lanes that ran to row 0 without a zero-stop keep their walk k
        done_stop = istart_ref[0, :] > 0
        kfin_ref[0, :] = jnp.where(done_stop, kfin_ref[0, :], kF)
        istart_ref[0, :] = jnp.where(done_stop, istart_ref[0, :], iF)
    else:
        kfin_ref[0, :] = kF
        istart_ref[0, :] = iF
    nops_ref[0, :] = cursor
    nm_ref[0, :] = nm


# VMEM budget for the traceback kernel: scratch + (double-buffered) in/out
# blocks must fit physical VMEM. The v5e carries 128 MiB of VMEM per core;
# Mosaic's DEFAULT scoped window is a conservative 16 MB, so the kernel
# raises it via CompilerParams(vmem_limit_bytes) to the planned need.
# Round 3's bench died on the default window with a budget formula that
# ignored everything but the direction plane; measured on chip (round 4):
# scratch grants up to ~120 MB compile+run fine, and with grid > 1 the
# in/out VMEM blocks are double-buffered and DO count against the window.
_TB_VMEM_BUDGET = 96 * 2**20


def _tb_bytes(M: int, W: int, B: int, blk: int, stripe: int, s: int) -> int:
    """Total VMEM bytes the kernel needs at this plan: scratch planes plus
    the in/out blocks (x2 when the batch grid pipelines, i.e. B > blk)."""
    W8 = _round_up(W, _ROWS)
    Lp2 = s * stripe
    TILE_T = _round_up(W + _ROWS - 1, _ROWS)
    TWp = (Lp2 - _ROWS) + TILE_T
    MAXS = _round_up(M + W, _ROWS)
    ck = 2 * s * W8 if s > 1 else 0
    scratch = 4 * blk * (3 * W + 8 + stripe * W8 + ck)
    blocks = 4 * blk * (2 * Lp2 + TWp + 2 + MAXS + 7)
    return scratch + blocks * (2 if B > blk else 1)


def _tb_vmem_plan(M: int, W: int, B: int, block: int):
    """Pick (BLK, STRIPE, N_STRIPES) so the traceback kernel fits VMEM.

    Prefers a wide lane block with few stripes; stripes (checkpointed
    traceback) kick in before shrinking the block — a narrow BLK multiplies
    every band op's per-lane cost, while a stripe replay costs one extra
    forward pass. Returns None when nothing fits (~tens-of-kbp reads at the
    default band) — callers should fail loudly or take the XLA path.
    """
    Lp = _round_up(M, _ROWS)
    BLK = min(block, _round_up(max(B, 128), 128))
    while BLK >= 128:
        if _tb_bytes(M, W, B, BLK, Lp, 1) <= _TB_VMEM_BUDGET:
            return BLK, Lp, 1
        # smallest stripe count that fits (the walk/replay loops unroll
        # N_STRIPES times — cap it to keep Mosaic code size sane)
        for s in range(2, 17):
            stripe = _round_up(-(-Lp // s), _ROWS)
            s_eff = -(-Lp // stripe)
            if _tb_bytes(M, W, B, BLK, stripe, s_eff) <= _TB_VMEM_BUDGET:
                return BLK, stripe, s_eff
        BLK //= 2
    return None


@functools.partial(
    jax.jit,
    static_argnames=("scoring", "band", "block", "interpret", "local",
                     "stripe"))
def banded_traceback_semiglobal_pallas(
    patterns, pattern_lens, texts, text_lens, scoring: GotohScoring,
    band: int, mismatch_scores=None, block: int = 512, interpret: bool = False,
    local: bool = False, stripe: int | None = None,
):
    """Fused forward + traceback: returns (score, k_best, ops_rev (B, MAXS),
    n_ops, k_final, nm, i_end, i_start) with ops in end->start order (op
    codes 1/2/3 = M/I/D); nm is the edit-op count (mismatching M cells +
    gap ops). ``local=True`` switches to LOCAL alignment: the sink is the
    best in-band cell (i_end = its pattern row) and the walk stops at
    zero-score cells (i_start/k_final = where it stopped).

    Long patterns automatically use checkpointed striping (see
    ``_banded_tb_kernel``); ``stripe`` forces a stripe height (rounded to a
    multiple of 8) for testing.
    """
    B, M = patterns.shape
    W = band
    W8 = _round_up(W, _ROWS)
    MAXS = _round_up(M + W, _ROWS)
    TW = M + W - 1
    if stripe is not None:
        STRIPE = _round_up(min(stripe, M), _ROWS)
        S = -(-_round_up(M, _ROWS) // STRIPE)
        BLK = min(block, _round_up(max(B, 128), 128))
    else:
        plan = _tb_vmem_plan(M, W, B, block)
        if plan is None:
            raise ValueError(
                f"banded traceback does not fit VMEM even striped "
                f"(M={M}, W={W}); use the XLA batch_traceback_banded path")
        BLK, STRIPE, S = plan
    Lp = S * STRIPE  # uniform stripes: pad the pattern rows to S*STRIPE
    Bp = _round_up(B, BLK)
    TILE_T = _round_up(W + _ROWS - 1, _ROWS)
    TWp = (Lp - _ROWS) + TILE_T

    patterns_T = _pad_rows(_pad_cols(patterns.astype(jnp.int32).T, Bp), Lp)
    texts = texts.astype(jnp.int32)
    if texts.shape[1] < TW:
        texts = jnp.pad(texts, ((0, 0), (0, TW - texts.shape[1])))
    texts_T = _pad_rows(_pad_cols(texts[:, :TW].T, Bp), TWp)
    plens = _pad_cols(pattern_lens.astype(jnp.int32)[None, :], Bp)
    tlens = _pad_cols(text_lens.astype(jnp.int32)[None, :], Bp)
    if mismatch_scores is None:
        mm_T = jnp.full((Lp, Bp), scoring.mismatch, jnp.int32)
    else:
        mm_T = _pad_rows(_pad_cols(mismatch_scores.astype(jnp.int32).T, Bp), Lp)

    kern = functools.partial(
        _banded_tb_kernel,
        L=M, W=W, W8=W8, MAXS=MAXS, STRIPE=STRIPE, N_STRIPES=S,
        match=scoring.match,
        po=scoring.pattern_gap_open, pe=scoring.pattern_gap_ext,
        to=scoring.text_gap_open, te=scoring.text_gap_ext, local=local,
    )
    grid = (Bp // BLK,)
    col = lambda j: (0, j)
    scratch = [
        pltpu.VMEM((W, BLK), jnp.int32),
        pltpu.VMEM((W, BLK), jnp.int32),
        pltpu.VMEM((W, BLK), jnp.int32),
        pltpu.VMEM((8, BLK), jnp.int32),
        pltpu.VMEM((STRIPE * W8, BLK), jnp.int32),
    ]
    if S > 1:
        scratch += [
            pltpu.VMEM((S * W8, BLK), jnp.int32),
            pltpu.VMEM((S * W8, BLK), jnp.int32),
        ]
    score, kbest, ops_rev, n_ops, k_fin, nm, i_end, i_start = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((Lp, BLK), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLK), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((TWp, BLK), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLK), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((Lp, BLK), col, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, BLK), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLK), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((MAXS, BLK), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLK), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLK), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLK), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLK), col, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLK), col, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, Bp), jnp.int32),
            jax.ShapeDtypeStruct((1, Bp), jnp.int32),
            jax.ShapeDtypeStruct((MAXS, Bp), jnp.int32),
            jax.ShapeDtypeStruct((1, Bp), jnp.int32),
            jax.ShapeDtypeStruct((1, Bp), jnp.int32),
            jax.ShapeDtypeStruct((1, Bp), jnp.int32),
            jax.ShapeDtypeStruct((1, Bp), jnp.int32),
            jax.ShapeDtypeStruct((1, Bp), jnp.int32),
        ],
        scratch_shapes=scratch,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            # raise Mosaic's conservative 16 MB scoped-vmem default to the
            # planned need (+margin); v5e carries 128 MiB VMEM per core
            vmem_limit_bytes=min(
                _tb_bytes(M, W, B, BLK, STRIPE, S) + 8 * 2**20, 120 * 2**20),
        ),
        cost_estimate=pl.CostEstimate(
            flops=(32 if S > 1 else 16) * Bp * M * W,
            bytes_accessed=4 * Bp * (2 * M + TW + MAXS),
            transcendentals=0,
        ),
    )(patterns_T, plens, texts_T, tlens, mm_T)
    return (score[0, :B], kbest[0, :B], ops_rev[:, :B].T,
            n_ops[0, :B], k_fin[0, :B], nm[0, :B],
            i_end[0, :B], i_start[0, :B])


# ---------------------------------------------------------------------------
# Register-tiled scoring kernel: 1024 alignments per (8, 128) vreg, the band
# as W unrolled per-k registers. Band shifts become register renames, the
# text window rolls one register per row, and H/E never touch VMEM — the
# direct TPU analogue of the reference's register-tiling staged scheduler
# (``alignment/batched.h:72``, PSA 32-bit register-tiled kernels).
# ---------------------------------------------------------------------------


def _regtile_kernel(pat_ref, plen_ref, txt_ref, tlen_ref, mm_ref,
                    score_ref, kbest_ref, *, L, W, match, po, pe, to, te,
                    seq_f=False, full_text=False, uniform_plen=False,
                    unroll=1, t_regs=True):
    """Register-tiled banded Gotoh scorer.

    Static variants (all bit-identical where applicable):
    - seq_f: sequential same-row F recurrence F[k] = max(F[k-1]+te,
      H0[k-1]+to) — 3 ops/cell instead of the lazy-F log-prefix's ~7
      (valid whenever te >= to, true for affine penalties).
    - full_text: texts known to span the whole band (tlen >= L+W-1 for
      every lane) — drops the per-cell text-bound mask.
    - uniform_plen: every lane's pattern length == L — FIN is just the
      last row, dropping the per-row FIN select.
    """
    # derive inits from a memory load (min can't constant-fold) so the
    # loop-carry layouts are concrete, not replicated splats
    zero = jnp.minimum(pat_ref[0, 0], 0)              # codes >= 0
    neg = jnp.minimum(pat_ref[0, 0], jnp.int32(NEG_INF))
    plen = plen_ref[0, 0]
    tlen = tlen_ref[0, 0]

    H = [zero] * W
    E = [neg] * W
    FIN = [neg] * W
    T0 = [txt_ref[0, k] for k in range(W)] if t_regs else [zero]

    def one_row(im1, H, E, FIN, T):
        p = pat_ref[0, im1]
        mmrow = mm_ref[0, im1]
        if t_regs:
            Tk = T
        else:
            # re-load the text window each row: W extra VMEM loads buy back
            # W registers (the band state alone is ~3W vregs)
            Tk = [txt_ref[0, im1 + k] for k in range(W)]
        sub = [jnp.where(p == Tk[k], jnp.int32(match), mmrow)
               for k in range(W)]
        if not full_text:
            sub = [jnp.where(im1 + k < tlen, sub[k], NEG_INF)
                   for k in range(W)]
        diag = [H[k] + sub[k] for k in range(W)]
        Erow = [jnp.maximum(E[k + 1] + pe, H[k + 1] + po) if k + 1 < W
                else jnp.minimum(E[k], jnp.int32(NEG_INF))  # band edge
                for k in range(W)]
        H0 = [jnp.maximum(diag[k], Erow[k]) for k in range(W)]
        if seq_f:
            # F[k] = max(F[k-1] + te, H[k-1] + to) with H[k-1] =
            # max(H0[k-1], F[k-1]); since te >= to the F[k-1]+to arm is
            # dominated, leaving max(F[k-1]+te, H0[k-1]+to)
            F = [jnp.minimum(H0[0], jnp.int32(NEG_INF))]
            for k in range(1, W):
                F.append(jnp.maximum(F[k - 1] + te, H0[k - 1] + to))
        else:
            # lazy-F prefix max across the k registers (log-step chain)
            G = [H0[k] + jnp.int32(to - te * k) for k in range(W)]
            d = 1
            while d < W:
                G = [jnp.maximum(G[k], G[k - d]) if k - d >= 0 else G[k]
                     for k in range(W)]
                d *= 2
            F = [G[k - 1] + jnp.int32(te * (k - 1)) if k >= 1
                 else jnp.minimum(G[0], jnp.int32(NEG_INF))
                 for k in range(W)]
        Hrow = [jnp.maximum(H0[k], F[k]) for k in range(W)]
        if not uniform_plen:
            at_fin = (im1 + 1) == plen
            FIN = [jnp.where(at_fin, Hrow[k], FIN[k]) for k in range(W)]
        if t_regs:
            T = T[1:] + [txt_ref[0, im1 + W]]  # roll the text window
        return Hrow, Erow, FIN, T

    def body(i, carry):
        H, E, FIN, T = carry
        # manual multi-row unroll (Pallas fori only supports full unroll):
        # gives the VLIW scheduler several rows of work to interleave
        for r in range(unroll):
            H, E, FIN, T = one_row(i * unroll + r, H, E, FIN, T)
        return H, E, FIN, T

    assert L % unroll == 0, "unroll must divide L"
    H, E, FIN, T = jax.lax.fori_loop(0, L // unroll, body, (H, E, FIN, T0))
    if uniform_plen:
        FIN = H
    smax = FIN[0]
    for k in range(1, W):
        smax = jnp.maximum(smax, FIN[k])
    kb = jnp.minimum(FIN[0], 0) + jnp.int32(W)
    for k in range(W - 1, -1, -1):
        kb = jnp.where(FIN[k] == smax, k, kb)
    score_ref[0, 0] = smax
    kbest_ref[0, 0] = kb


@functools.partial(
    jax.jit, static_argnames=("scoring", "band", "interpret"))
def banded_score_semiglobal_regtile(
    patterns, pattern_lens, texts, text_lens, scoring: GotohScoring,
    band: int, mismatch_scores=None, interpret: bool = False,
):
    """Register-tiled SEMI_GLOBAL banded Gotoh scores.

    Bit-identical to ``banded_score_semiglobal_pallas`` / the XLA scorer;
    ~5x fewer vector ops per cell than the sublane-band layout. Inputs are
    relaid out as (G, rows, 8, 128) blocks of 1024 alignments.
    """
    B, M = patterns.shape
    W = band
    TW = M + W - 1
    Lp = _round_up(M, _ROWS)
    TWp = Lp + W
    G = _round_up(max(B, 1024), 1024) // 1024
    Bp = G * 1024

    def to_blocks(x, rows):
        x = x.astype(jnp.int32)
        if x.shape[1] < rows:
            x = jnp.pad(x, ((0, Bp - B), (0, rows - x.shape[1])))
        else:
            x = jnp.pad(x[:, :rows], ((0, Bp - B), (0, 0)))
        return x.reshape(G, 8, 128, rows).transpose(0, 3, 1, 2)

    patsb = to_blocks(patterns, Lp)
    txtsb = to_blocks(texts, TWp)
    if mismatch_scores is None:
        mmb = jnp.full((G, Lp, 8, 128), scoring.mismatch, jnp.int32)
    else:
        mmb = to_blocks(mismatch_scores, Lp)
    plb = jnp.pad(pattern_lens.astype(jnp.int32), (0, Bp - B)).reshape(
        G, 1, 8, 128)
    tlb = jnp.pad(text_lens.astype(jnp.int32), (0, Bp - B)).reshape(
        G, 1, 8, 128)

    score, kbest = regtile_score_blocked(
        patsb, plb, txtsb, tlb, mmb, scoring=scoring, band=W, length=M,
        interpret=interpret)
    return score.reshape(Bp)[:B], kbest.reshape(Bp)[:B]


@functools.partial(
    jax.jit, static_argnames=("scoring", "band", "length", "interpret",
                              "seq_f", "full_text", "uniform_plen",
                              "unroll", "t_regs"))
def regtile_score_blocked(patsb, plb, txtsb, tlb, mmb, *, scoring,
                          band, length, interpret=False, seq_f=True,
                          full_text=False, uniform_plen=False,
                          unroll=1, t_regs=True):
    """Register-tiled scorer over pre-blocked (G, rows, 8, 128) operands.

    The pure DP engine — this is what kernel GCUPS should be measured on
    (operands already resident in their native layout, like the reference's
    PSA harness feeding from device buffers). ``full_text``/``uniform_plen``
    assert properties of the operands (caller-checked) that let the kernel
    drop per-cell masking; ``seq_f`` picks the cheaper same-row F recurrence
    (bit-identical; requires gap_ext >= gap_open, else auto-disabled).
    """
    G, Lp = patsb.shape[0], patsb.shape[1]
    TWp = txtsb.shape[1]
    M, W = length, band
    if scoring.text_gap_ext < scoring.text_gap_open:
        seq_f = False  # dominance argument needs te >= to
    kern = functools.partial(
        _regtile_kernel, L=M, W=W, match=scoring.match,
        po=scoring.pattern_gap_open, pe=scoring.pattern_gap_ext,
        to=scoring.text_gap_open, te=scoring.text_gap_ext,
        seq_f=seq_f, full_text=full_text, uniform_plen=uniform_plen,
        unroll=unroll, t_regs=t_regs)
    blk = lambda g: (g, 0, 0, 0)
    return pl.pallas_call(
        kern, grid=(G,),
        in_specs=[
            pl.BlockSpec((1, Lp, 8, 128), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, 128), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TWp, 8, 128), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, 128), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lp, 8, 128), blk, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 8, 128), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, 128), blk, memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((G, 1, 8, 128), jnp.int32)] * 2,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=12 * G * 1024 * M * W,
            bytes_accessed=4 * G * 1024 * (2 * M + M + W),
            transcendentals=0),
    )(patsb, plb, txtsb, tlb, mmb)


def _regtile_cand_kernel(fwd_ref, rc_ref, mmf_ref, mmr_ref, plen_ref,
                         txt_ref, tlen_ref, score_ref, kbest_ref,
                         *, RB, NCH, L, W, match, po, pe, to, te, unroll=1):
    """Candidate-blocked register-tiled scorer.

    Grid g enumerates candidate blocks in slot-major order: read-block
    ``g % RB``, candidate slot ``g // RB``; slots >= NCH are reverse-strand,
    so the pattern/penalty tiles come from the rc arrays — selected here
    per row, which keeps patterns per-READ in HBM (C times smaller than
    materializing per-candidate pattern copies).
    """
    g = pl.program_id(0)
    is_rc = (g // RB) >= NCH
    zero = jnp.minimum(fwd_ref[0, 0], 0)
    neg = jnp.minimum(fwd_ref[0, 0], jnp.int32(NEG_INF))
    plen = plen_ref[0, 0]
    tlen = tlen_ref[0, 0]

    H = [zero] * W
    E = [neg] * W
    FIN = [neg] * W
    T = [txt_ref[0, k] for k in range(W)]

    def one_row(im1, carry):
        H, E, FIN, T = carry
        p = jnp.where(is_rc, rc_ref[0, im1], fwd_ref[0, im1])
        mmrow = jnp.where(is_rc, mmr_ref[0, im1], mmf_ref[0, im1])
        sub = [jnp.where(p == T[k], jnp.int32(match), mmrow)
               for k in range(W)]
        sub = [jnp.where(im1 + k < tlen, sub[k], NEG_INF) for k in range(W)]
        diag = [H[k] + sub[k] for k in range(W)]
        Erow = [jnp.maximum(E[k + 1] + pe, H[k + 1] + po) if k + 1 < W
                else jnp.minimum(E[k], jnp.int32(NEG_INF))
                for k in range(W)]
        H0 = [jnp.maximum(diag[k], Erow[k]) for k in range(W)]
        if te >= to:
            # sequential same-row F (see _regtile_kernel seq_f)
            F = [jnp.minimum(H0[0], jnp.int32(NEG_INF))]
            for k in range(1, W):
                F.append(jnp.maximum(F[k - 1] + te, H0[k - 1] + to))
        else:
            G = [H0[k] + jnp.int32(to - te * k) for k in range(W)]
            d = 1
            while d < W:
                G = [jnp.maximum(G[k], G[k - d]) if k - d >= 0 else G[k]
                     for k in range(W)]
                d *= 2
            F = [G[k - 1] + jnp.int32(te * (k - 1)) if k >= 1
                 else jnp.minimum(G[0], jnp.int32(NEG_INF))
                 for k in range(W)]
        Hrow = [jnp.maximum(H0[k], F[k]) for k in range(W)]
        at_fin = (im1 + 1) == plen
        FIN = [jnp.where(at_fin, Hrow[k], FIN[k]) for k in range(W)]
        T = T[1:] + [txt_ref[0, im1 + W]]
        return Hrow, Erow, FIN, T

    def body(i, carry):
        # multi-row unroll: several rows of independent work per loop
        # iteration for the VLIW scheduler (see _regtile_kernel)
        for r in range(unroll):
            carry = one_row(i * unroll + r, carry)
        return carry

    assert L % unroll == 0
    H, E, FIN, T = jax.lax.fori_loop(0, L // unroll, body, (H, E, FIN, T))
    smax = FIN[0]
    for k in range(1, W):
        smax = jnp.maximum(smax, FIN[k])
    kb = jnp.minimum(FIN[0], 0) + jnp.int32(W)
    for k in range(W - 1, -1, -1):
        kb = jnp.where(FIN[k] == smax, k, kb)
    score_ref[0, 0] = smax
    kbest_ref[0, 0] = kb


@functools.partial(
    jax.jit, static_argnames=("scoring", "band", "n_cands", "nch", "interpret"))
def banded_score_cands_regtile(
    reads, rc, lens, w0_slotmajor, wlens_slotmajor, genome_words,
    scoring: GotohScoring, band: int, n_cands: int, nch: int,
    mm=None, mm_rc=None, interpret: bool = False,
):
    """Score all (read, candidate-slot) pairs with per-read pattern blocks.

    reads/rc/mm/mm_rc: (B, L) per-read arrays (B must be a multiple of
    1024); w0_slotmajor/wlens_slotmajor: (C*B,) candidate window starts and
    lengths in slot-major order (slot*B + read). Returns scores (C*B,)
    slot-major. Text windows are gathered straight into the blocked layout
    (``packed.extract_window_blocked``), so no (C*B, L)-shaped operand is
    ever materialized or transposed.
    """
    from nvbio_tpu import packed as _packed

    B, M = reads.shape
    C = n_cands
    W = band
    Lp = _round_up(M, _ROWS)
    TWp = Lp + W
    RB = B // 1024
    Gc = C * RB

    def to_blocks(x, rows):
        x = x.astype(jnp.int32)
        if x.shape[1] < rows:
            x = jnp.pad(x, ((0, 0), (0, rows - x.shape[1])))
        return x[:, :rows].reshape(RB, 8, 128, rows).transpose(0, 3, 1, 2)

    fwd_b = to_blocks(reads, Lp)
    rc_b = to_blocks(rc, Lp)
    if mm is None:
        mmf_b = jnp.full((RB, Lp, 8, 128), scoring.mismatch, jnp.int32)
        mmr_b = mmf_b
    else:
        mmf_b = to_blocks(mm, Lp)
        mmr_b = to_blocks(mm_rc, Lp)
    plen_b = lens.astype(jnp.int32).reshape(RB, 1, 8, 128)

    w0_b = w0_slotmajor.reshape(Gc, 8, 128)  # int32 or uint32 (large genome)
    txt_b = _packed.extract_window_blocked(genome_words, w0_b, TWp, 2)
    tlen_b = wlens_slotmajor.astype(jnp.int32).reshape(Gc, 1, 8, 128)

    unroll = next(u for u in (10, 5, 4, 2, 1) if M % u == 0)
    kern = functools.partial(
        _regtile_cand_kernel, RB=RB, NCH=nch, L=M, W=W, match=scoring.match,
        po=scoring.pattern_gap_open, pe=scoring.pattern_gap_ext,
        to=scoring.text_gap_open, te=scoring.text_gap_ext, unroll=unroll)
    per_read = lambda g: (g % RB, 0, 0, 0)
    per_cand = lambda g: (g, 0, 0, 0)
    score, kbest = pl.pallas_call(
        kern, grid=(Gc,),
        in_specs=[
            pl.BlockSpec((1, Lp, 8, 128), per_read, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lp, 8, 128), per_read, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lp, 8, 128), per_read, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Lp, 8, 128), per_read, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, 128), per_read, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TWp, 8, 128), per_cand, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, 128), per_cand, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 8, 128), per_cand, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, 128), per_cand, memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((Gc, 1, 8, 128), jnp.int32)] * 2,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=12 * Gc * 1024 * M * W,
            bytes_accessed=4 * (Gc * 1024 * (M + W) + B * 2 * M),
            transcendentals=0),
    )(fwd_b, rc_b, mmf_b, mmr_b, plen_b, txt_b, tlen_b)
    return score.reshape(C * B), kbest.reshape(C * B)


# ---------------------------------------------------------------------------
# Myers bit-parallel edit distance: 32 DP cells per int32 op. Register-tiled
# like the Gotoh scorer; the pattern's Peq masks and the PV/MV state live in
# (n_words x) registers, the text streams row by row.
# Counterpart of nvbio's Myers aligner (myers_banded_inl.h) at full width.
# ---------------------------------------------------------------------------


def _myers_kernel(pat_ref, plen_ref, txt_ref, tlen_ref, best_ref, bend_ref,
                  *, M, T, NW, NSYM):
    zero = jnp.minimum(pat_ref[0, 0], 0).astype(jnp.uint32)
    ones = zero + jnp.uint32(0xFFFFFFFF)
    plen = plen_ref[0, 0]
    tlen = tlen_ref[0, 0]

    # Peq[c][w]: bit i%32 set where pattern[i] == c (disjoint bits -> OR)
    peq = [[zero for _ in range(NW)] for _ in range(NSYM)]
    for i in range(M):
        p = pat_ref[0, i]
        valid = i < plen
        for c in range(NSYM):
            hit = ((p == c) & valid).astype(jnp.uint32) << jnp.uint32(i % 32)
            peq[c][i // 32] = peq[c][i // 32] | hit

    last = plen - 1
    last_word = last // 32
    last_bit = (last % 32).astype(jnp.uint32)

    def step(j, carry):
        PV, MV, score, best, bend = carry
        tch = txt_ref[0, j]
        Eq = []
        for w in range(NW):
            e = peq[0][w]
            for c in range(1, NSYM):
                e = jnp.where(tch == c, peq[c][w], e)
            Eq.append(e)
        # multi-word (Eq & PV) + PV with carry chain
        summ = []
        carry_b = None
        for w in range(NW):
            a = Eq[w] & PV[w]
            t = a + PV[w]
            c1 = t < a
            if carry_b is None:
                s = t
                carry_b = c1
            else:
                s = t + carry_b.astype(jnp.uint32)
                carry_b = c1 | (s < t)
            summ.append(s)
        D0 = [(summ[w] ^ PV[w]) | Eq[w] | MV[w] for w in range(NW)]
        Hp = [MV[w] | ~(D0[w] | PV[w]) for w in range(NW)]
        Hn = [PV[w] & D0[w] for w in range(NW)]

        phl = Hp[0]
        mhl = Hn[0]
        for w in range(1, NW):
            phl = jnp.where(last_word == w, Hp[w], phl)
            mhl = jnp.where(last_word == w, Hn[w], mhl)
        score = (score
                 + ((phl >> last_bit) & 1).astype(jnp.int32)
                 - ((mhl >> last_bit) & 1).astype(jnp.int32))

        # shift left by one with zero carry-in (free text prefix)
        HpS, HnS = [], []
        cp = zero
        cn = zero
        for w in range(NW):
            HpS.append((Hp[w] << 1) | cp)
            HnS.append((Hn[w] << 1) | cn)
            cp = Hp[w] >> 31
            cn = Hn[w] >> 31
        PV = [HnS[w] | ~(D0[w] | HpS[w]) for w in range(NW)]
        MV = [D0[w] & HpS[w] for w in range(NW)]

        upd = (j < tlen) & (score < best)
        best = jnp.where(upd, score, best)
        bend = jnp.where(upd, j + 1, bend)
        return PV, MV, score, best, bend

    PV = [ones] * NW
    MV = [zero] * NW
    score0 = plen
    best0 = plen
    bend0 = jnp.minimum(plen, 0)  # zeros, concrete layout
    PV, MV, score, best, bend = jax.lax.fori_loop(
        0, T, step, (PV, MV, score0, best0, bend0))
    best_ref[0, 0] = best
    bend_ref[0, 0] = bend


@functools.partial(jax.jit, static_argnames=("n_symbols", "interpret"))
def myers_semiglobal_pallas(patterns, pattern_lens, texts, text_lens,
                            n_symbols: int = 4, interpret: bool = False):
    """Bit-parallel SEMI_GLOBAL edit distance (pattern global, text local).

    Same results as ``myers.myers_semiglobal``; ~32 DP cells per int32 op
    with all state in registers. Returns (distance (B,), text_end (B,)).
    """
    B, M = patterns.shape
    T = texts.shape[1]
    NW = (M + 31) // 32
    G = _round_up(max(B, 1024), 1024) // 1024
    Bp = G * 1024
    Lp = _round_up(M, _ROWS)
    Tp = _round_up(T, _ROWS)

    def to_blocks(x, rows):
        x = x.astype(jnp.int32)
        if x.shape[1] < rows:
            x = jnp.pad(x, ((0, Bp - B), (0, rows - x.shape[1])))
        else:
            x = jnp.pad(x[:, :rows], ((0, Bp - B), (0, 0)))
        return x.reshape(G, 8, 128, rows).transpose(0, 3, 1, 2)

    patsb = to_blocks(patterns, Lp)
    txtsb = to_blocks(texts, Tp)
    plb = jnp.pad(pattern_lens.astype(jnp.int32), (0, Bp - B),
                  constant_values=1).reshape(G, 1, 8, 128)
    tlb = jnp.pad(text_lens.astype(jnp.int32), (0, Bp - B)).reshape(
        G, 1, 8, 128)

    kern = functools.partial(_myers_kernel, M=M, T=T, NW=NW, NSYM=n_symbols)
    blk = lambda g: (g, 0, 0, 0)
    best, bend = pl.pallas_call(
        kern, grid=(G,),
        in_specs=[
            pl.BlockSpec((1, Lp, 8, 128), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, 128), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tp, 8, 128), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, 128), blk, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, 8, 128), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 8, 128), blk, memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((G, 1, 8, 128), jnp.int32)] * 2,
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * Bp * M * T, bytes_accessed=4 * Bp * (M + T),
            transcendentals=0),
    )(patsb, plb, txtsb, tlb)
    return best.reshape(Bp)[:B], bend.reshape(Bp)[:B]
