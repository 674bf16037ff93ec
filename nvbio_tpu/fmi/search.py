"""Batched FM-index search: backward search, locate, 1-mismatch backtracking.

Replaces the reference's per-thread match/locate device functions
(``fmindex.h:341-633``) and the explicit-stack hamming backtracker
(``backtrack.h:45-172``) with dense batched scans:

  * exact backward search: ``lax.scan`` over query positions, each step is a
    pair of batched ranks updating (lo, hi) interval vectors;
  * locate: bounded LF-walk of <= sa_interval steps, masked termination;
  * 1-mismatch search: instead of a DFS stack (divergent on GPU, hostile to
    XLA), enumerate the mismatch position x substituted symbol grid as extra
    dense batch dimensions — bounded, regular work that maps onto the VPU.

``*_core`` functions are pure (no jit) and take an FMIndex pytree — callers
(e.g. the bowtie pipeline) compose them inside their own jit; the public
wrappers jit them directly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nvbio_tpu import packed
from nvbio_tpu.fmi.rank import (
    rank,
    rank_all,
    rank_all_fused,
    rank_fused,
    symbol_and_rank_fused,
)


def _occ(fmi, c, i):
    """Occ(c, i) over the virtual full BWT (sentinel skipped).

    Uses the fused interleaved rank rows when the index carries them
    (one tile-row gather per query); falls back to the split layout."""
    adj = i - (i > fmi.primary).astype(i.dtype)
    if fmi.ranktab is not None:
        return rank_fused(fmi.ranktab, c, adj)
    return rank(fmi.bwt_words, fmi.occ, c, adj)


def _count_of(fmi, c):
    """C[c] via a dense one-hot select — a traced gather from the 5-entry
    count table lowers to a scalar load per lane on TPU."""
    cs = jnp.arange(4, dtype=jnp.int32)
    return jnp.sum(
        jnp.where(cs == c[..., None], fmi.count[:4], 0), axis=-1)


def step_backward(fmi, c, lo, hi):
    """One backward-search step: prepend symbol c to the matched suffix."""
    cnt = _count_of(fmi, c)
    return cnt + _occ(fmi, c, lo), cnt + _occ(fmi, c, hi)


def backward_search_core(fmi, queries, qlens):
    """Exact match: SA interval [lo, hi) per query ((B, L) left-aligned).

    When the index carries an ftab (``attach_ftab``), queries of length
    >= ftab_k start from the precomputed interval of their k-symbol SUFFIX
    (backward search consumes the pattern right-to-left), skipping the
    first k rank-pair steps — the scan shrinks from L to L - k steps.
    """
    queries = jnp.asarray(queries, jnp.int32)
    qlens = jnp.asarray(qlens, jnp.int32)
    B, L = queries.shape

    k = fmi.ftab_k if fmi.ftab_lo is not None else 0
    if k and L >= k:
        use = qlens >= k
        # fold the k-symbol suffix into a key (leftmost symbol high bits)
        j0 = jnp.clip(qlens - k, 0, L - k)
        win = jnp.take_along_axis(
            queries, j0[:, None] + jnp.arange(k, dtype=jnp.int32)[None, :],
            axis=1)
        key = jnp.zeros((B,), jnp.int32)
        for t in range(k):
            key = (key << 2) | jnp.minimum(win[:, t], 3)
        lo0 = jnp.where(use, jnp.take(fmi.ftab_lo, key), 0)
        hi0 = jnp.where(use, jnp.take(fmi.ftab_hi, key),
                        jnp.int32(fmi.n + 1))
        qeff = jnp.where(use, qlens - k, qlens)
        # non-ftab lanes (len < k) need at most k-1 steps of their own
        n_steps = max(L - k, min(k - 1, L))
    else:
        lo0 = jnp.zeros((B,), jnp.int32)
        hi0 = jnp.full((B,), fmi.n + 1, jnp.int32)
        qeff = qlens
        n_steps = L

    def step(carry, s):
        lo, hi = carry
        j = jnp.clip(qeff - 1 - s, 0, L - 1)
        c = jnp.take_along_axis(queries, j[:, None], axis=1)[:, 0]
        active = (s < qeff) & (hi > lo)
        # dead lanes gather at interval (0, 0): every finished query hits
        # the same (cached) rank row instead of a scattered HBM line
        nlo, nhi = step_backward(fmi, c, jnp.where(active, lo, 0),
                                 jnp.where(active, hi, 0))
        lo = jnp.where(active, nlo, lo)
        hi = jnp.where(active, nhi, hi)
        return (lo, hi), None

    (lo, hi), _ = jax.lax.scan(step, (lo0, hi0),
                               jnp.arange(n_steps, dtype=jnp.int32))
    return lo, hi


def backward_search(fmi, queries, qlens):
    return jax.jit(backward_search_core)(fmi, queries, qlens)


def locate_core(fmi, rows):
    """SA values for SA rows via bounded LF-walk; (positions, resolved).

    With the fused rank rows attached, each walk step costs TWO tile-row
    gathers (one SSA marks+cum row, one rank row — symbol and rank come
    from the same line) and the sampled value is fetched ONCE per lane
    after the walk, not per step."""
    rows = jnp.asarray(rows, jnp.int32)
    marks, cum, vals = fmi.ssa_marks, fmi.ssa_cum, fmi.ssa_vals
    primary = jnp.asarray(fmi.primary, jnp.int32)
    n_syms = fmi.bwt_words.shape[0] * 16

    if fmi.ranktab is not None:
        # SSA fused rows: [64 marks words | 64 cum words] per 128-lane
        # row (2048 SA rows each). Loop-invariant, O(n/32) to build —
        # XLA hoists it out of the walk.
        nw_s = marks.shape[0]
        R = (nw_s + 63) // 64
        mpad = jnp.zeros((R * 64,), jnp.uint32).at[:nw_s].set(marks)
        cpad = jnp.zeros((R * 64,), jnp.uint32).at[:nw_s].set(
            cum.astype(jnp.uint32))
        ssarows = jnp.concatenate(
            [mpad.reshape(R, 64), cpad.reshape(R, 64)], axis=1)

        def marks_cum(i):
            wi = i // 32
            row = jnp.take(ssarows, wi // 64, axis=0)
            sel = jnp.arange(64, dtype=jnp.int32) == (wi % 64)[..., None]
            w = jnp.sum(jnp.where(sel, row[..., :64], 0), axis=-1)
            cu = jnp.sum(jnp.where(sel, row[..., 64:], 0),
                         axis=-1).astype(jnp.int32)
            return w, cu
    else:
        def marks_cum(i):
            return jnp.take(marks, i // 32), jnp.take(cum, i // 32)

    def body(t, state):
        i, tpos, mrank, done = state
        iq = jnp.where(done, 0, i)   # finished walks gather at row 0
        w, cu = marks_cum(iq)
        bit = (iq % 32).astype(jnp.uint32)
        hit = (((w >> bit) & 1) != 0) & ~done
        rk_mark = cu + jax.lax.population_count(
            w & ((jnp.uint32(1) << bit) - 1)).astype(jnp.int32)
        tpos = jnp.where(hit, t, tpos)
        mrank = jnp.where(hit, rk_mark, mrank)
        done = done | hit
        adj = iq - (iq > primary).astype(jnp.int32)
        if fmi.ranktab is not None:
            # LF step from ONE fused-row gather (symbol + rank together)
            c, rk = symbol_and_rank_fused(fmi.ranktab, adj)
        else:
            c = packed.gather_symbols(
                fmi.bwt_words, jnp.clip(adj, 0, n_syms - 1), 2)
            rk = rank(fmi.bwt_words, fmi.occ, c, adj)
        nxt = _count_of(fmi, c) + rk
        i = jnp.where(done, i, nxt)
        return i, tpos, mrank, done

    B = rows.shape[0]
    t0 = jnp.zeros((B,), jnp.int32)
    mr0 = jnp.zeros((B,), jnp.int32)
    done0 = jnp.zeros((B,), bool)
    _, tpos, mrank, done = jax.lax.fori_loop(
        0, fmi.sa_interval, body, (rows, t0, mr0, done0))
    pos = jnp.where(done, jnp.take(vals, mrank) + tpos, 0)
    return pos, done


def locate_batch(fmi, rows):
    return jax.jit(locate_core)(fmi, rows)


def search_1mm(fmi, queries: jnp.ndarray, qlens: jnp.ndarray):
    """Exact + all 1-mismatch SA ranges, dense enumeration.

    Returns (exact_lo, exact_hi, mm_lo (B,L,3), mm_hi (B,L,3), mm_sym (B,L,3)).
    Cost is L+1 full backward searches; used for short seeds.
    """
    B, L = queries.shape
    deltas = jnp.arange(1, 4, dtype=jnp.int32)
    base = queries[:, None, None, :]  # (B, 1, 1, L)
    pos_eye = jnp.eye(L, dtype=jnp.int32)  # (L, L)
    mutated = (
        base + pos_eye[None, :, None, :] * deltas[None, None, :, None]
    ) % 4  # (B, L, 3, L)
    mm_sym = jnp.take_along_axis(
        mutated, jnp.arange(L, dtype=jnp.int32)[None, :, None, None], axis=3
    )[..., 0]

    flat = mutated.reshape(B * L * 3, L)
    flat_lens = jnp.repeat(qlens, L * 3)
    lo, hi = backward_search(fmi, flat, flat_lens)
    exact_lo, exact_hi = backward_search(fmi, queries, qlens)
    pvalid = (jnp.arange(L, dtype=jnp.int32)[None, :] < qlens[:, None])[..., None]
    mm_lo = jnp.where(pvalid, lo.reshape(B, L, 3), 0)
    mm_hi = jnp.where(pvalid, hi.reshape(B, L, 3), 0)
    return exact_lo, exact_hi, mm_lo, mm_hi, mm_sym


def search_1mm_hybrid(fmi, queries, qlens, n_approx: int):
    """Approx-HYBRID 1-mismatch seeding (the reference's map_approx scheme,
    ``nvBowtie/bowtie2/cuda/mapping.h:66-73``): 0 mismatches in the seed's
    right subseed, up to 1 mismatch in the LEFT ``n_approx`` positions.

    Shares all search state right of the mutation: ONE exact backward pass
    records the per-step intervals, each mutation branches from its saved
    state and only walks its remaining prefix. Rank-pair cost drops from
    3*L per mutated position (independent searches) to (1 + j), which is
    what makes 1-mm FM reseeding affordable on the TPU — the mutated
    patterns' searches are 95% shared.

    Returns (exact_lo, exact_hi, mm_lo, mm_hi, mm_sym), mm_* of shape
    (B, n_approx, 3) for mutation positions 0..n_approx-1 (from the left).
    """
    queries = jnp.asarray(queries, jnp.int32)
    qlens = jnp.asarray(qlens, jnp.int32)
    B, L = queries.shape
    A = min(n_approx, L)

    # exact pass, CAPTURING the pre-step interval at every step: states[s]
    # = interval of the exact length-s suffix (s = 0 is the full range)
    lo0 = jnp.zeros((B,), jnp.int32)
    hi0 = jnp.full((B,), fmi.n + 1, jnp.int32)

    def step(carry, s):
        lo, hi = carry
        j = jnp.clip(qlens - 1 - s, 0, L - 1)
        c = jnp.take_along_axis(queries, j[:, None], axis=1)[:, 0]
        # freeze on empty (value-level parity with backward_search_core;
        # a branch from a frozen empty state stays empty either way);
        # dead lanes gather at the shared row-0 rank line
        active = (s < qlens) & (hi > lo)
        nlo, nhi = step_backward(fmi, c, jnp.where(active, lo, 0),
                                 jnp.where(active, hi, 0))
        nlo = jnp.where(active, nlo, lo)
        nhi = jnp.where(active, nhi, hi)
        return (nlo, nhi), (lo, hi)

    (exact_lo, exact_hi), (st_lo, st_hi) = jax.lax.scan(
        step, (lo0, hi0), jnp.arange(L, dtype=jnp.int32))

    # branch: mutation at position j (< A, from the left) resumes from the
    # state after t = qlen-1-j steps with the substituted symbol, then
    # walks the j remaining original symbols
    jpos = jnp.arange(A, dtype=jnp.int32)                    # (A,)
    t = jnp.clip(qlens[:, None] - 1 - jpos[None, :], 0, L - 1)  # (B, A)
    stL = jnp.transpose(st_lo, (1, 0))                       # (B, L)
    stH = jnp.transpose(st_hi, (1, 0))
    blo = jnp.take_along_axis(stL, t, axis=1)                # (B, A)
    bhi = jnp.take_along_axis(stH, t, axis=1)
    base_sym = jnp.take_along_axis(
        queries, jnp.minimum(jpos[None, :], L - 1), axis=1)  # (B, A)
    deltas = jnp.arange(1, 4, dtype=jnp.int32)
    mm_sym = (base_sym[:, :, None] + deltas[None, None, :]) % 4  # (B, A, 3)

    mlo, mhi = step_backward(
        fmi, mm_sym, jnp.broadcast_to(blo[:, :, None], (B, A, 3)),
        jnp.broadcast_to(bhi[:, :, None], (B, A, 3)))

    # continuation: walk the j remaining ORIGINAL symbols (j-1-u at step u)
    def cstep(carry, u):
        lo, hi = carry
        j_idx = jnp.clip(jpos[None, :] - 1 - u, 0, L - 1)    # (1, A)
        c = jnp.take_along_axis(queries, jnp.broadcast_to(j_idx, (B, A)),
                                axis=1)                      # (B, A)
        active = (u < jpos[None, :, None]) & (hi > lo)
        # mutated branches mostly die within a few steps — route dead
        # lanes' gathers to the shared row-0 rank line
        nlo, nhi = step_backward(
            fmi, jnp.broadcast_to(c[:, :, None], (B, A, 3)),
            jnp.where(active, lo, 0), jnp.where(active, hi, 0))
        lo = jnp.where(active, nlo, lo)
        hi = jnp.where(active, nhi, hi)
        return (lo, hi), None

    if A > 1:
        (mlo, mhi), _ = jax.lax.scan(
            cstep, (mlo, mhi), jnp.arange(A - 1, dtype=jnp.int32))

    pvalid = jpos[None, :, None] < qlens[:, None, None]
    mm_lo = jnp.where(pvalid, mlo, 0)
    mm_hi = jnp.where(pvalid, mhi, 0)
    return exact_lo, exact_hi, mm_lo, mm_hi, mm_sym


def search_1mm_hybrid_topk(fmi, queries, qlens, n_approx: int, K: int = 8):
    """``search_1mm_hybrid`` with survivor COMPACTION: the continuation
    walk (the measured wall of the FM-seeded pipeline — 1651 ms of the
    fused step at B*NS=229k seeds, FM_SPEED.json) runs over K compacted
    branch slots per seed instead of all 3*n_approx lanes.

    Why this is cheap in sensitivity: a branch at position j has already
    matched a length-(qlen-j) mutated suffix when it leaves the branch
    step; on a 100 Mbp genome random suffixes above ~14 symbols barely
    ever match, so the expected number of NONEMPTY branches per seed is
    ~6-7 — K=8 keeps essentially all of them (smaller-j branches, the
    more specific ones, win ties). Gather count drops 3*n_approx/K x on
    every continuation step, and callers locate K rows instead of 3A.

    Returns (exact_lo, exact_hi, mm_lo, mm_hi), mm_* of shape (B, K)
    (empty slots carry lo == hi == 0).
    """
    queries = jnp.asarray(queries, jnp.int32)
    qlens = jnp.asarray(qlens, jnp.int32)
    B, L = queries.shape
    A = min(n_approx, L)

    lo0 = jnp.zeros((B,), jnp.int32)
    hi0 = jnp.full((B,), fmi.n + 1, jnp.int32)

    def step(carry, s):
        lo, hi = carry
        j = jnp.clip(qlens - 1 - s, 0, L - 1)
        c = jnp.take_along_axis(queries, j[:, None], axis=1)[:, 0]
        active = (s < qlens) & (hi > lo)
        nlo, nhi = step_backward(fmi, c, jnp.where(active, lo, 0),
                                 jnp.where(active, hi, 0))
        nlo = jnp.where(active, nlo, lo)
        nhi = jnp.where(active, nhi, hi)
        return (nlo, nhi), (lo, hi)

    (exact_lo, exact_hi), (st_lo, st_hi) = jax.lax.scan(
        step, (lo0, hi0), jnp.arange(L, dtype=jnp.int32))

    jpos = jnp.arange(A, dtype=jnp.int32)
    t = jnp.clip(qlens[:, None] - 1 - jpos[None, :], 0, L - 1)   # (B, A)
    blo = jnp.take_along_axis(jnp.transpose(st_lo, (1, 0)), t, axis=1)
    bhi = jnp.take_along_axis(jnp.transpose(st_hi, (1, 0)), t, axis=1)
    # branch through ALL 4 symbols from ONE rank-row pair per (B, A) lane
    # (extend_backward_all), then drop the original-symbol column — 3x
    # fewer rank gathers than per-delta step_backward
    lo4, hi4 = extend_backward_all(fmi, blo, bhi)                # (B, A, 4)
    base_sym = jnp.take_along_axis(
        queries, jnp.minimum(jpos[None, :], L - 1), axis=1)      # (B, A)
    deltas = jnp.arange(1, 4, dtype=jnp.int32)
    mm_sym = (base_sym[:, :, None] + deltas[None, None, :]) % 4  # (B, A, 3)
    sym_sel = (mm_sym[..., None]
               == jnp.arange(4, dtype=jnp.int32)[None, None, None, :])
    mlo = jnp.sum(jnp.where(sym_sel, lo4[:, :, None, :], 0), axis=-1)
    mhi = jnp.sum(jnp.where(sym_sel, hi4[:, :, None, :], 0), axis=-1)
    branch_ok = (bhi > blo)[:, :, None]
    pvalid = (jpos[None, :, None] < qlens[:, None, None]) & branch_ok
    mlo = jnp.where(pvalid, mlo, 0)
    mhi = jnp.where(pvalid, mhi, 0)

    # ---- top-K survivor compaction (per seed) ------------------------------
    ne = (mhi > mlo).reshape(B, A * 3)
    jf = jnp.broadcast_to(jpos[None, :, None], (B, A, 3)).reshape(B, A * 3)
    score = jnp.where(ne, A - jf, -1)            # smaller j = more specific
    _, sel = jax.lax.top_k(score, min(K, A * 3))
    Keff = sel.shape[1]

    def pick(x):
        return jnp.take_along_axis(x.reshape(B, A * 3), sel, axis=1)

    clo, chi, cj = pick(mlo), pick(mhi), pick(jf)
    cok = pick(ne.astype(jnp.int32)) > 0
    clo = jnp.where(cok, clo, 0)
    chi = jnp.where(cok, chi, 0)

    # continuation: walk the j remaining ORIGINAL symbols, one-hot symbol
    # select over the small L axis (a take_along_axis here would lower to
    # per-lane scalar loads)
    def cstep(carry, u):
        lo, hi = carry
        j_idx = jnp.clip(cj - 1 - u, 0, L - 1)                   # (B, K)
        onehot = (j_idx[..., None]
                  == jnp.arange(L, dtype=jnp.int32)[None, None, :])
        c = jnp.sum(jnp.where(onehot, queries[:, None, :], 0), axis=-1)
        active = (u < cj) & (hi > lo)
        nlo, nhi = step_backward(fmi, c, jnp.where(active, lo, 0),
                                 jnp.where(active, hi, 0))
        lo = jnp.where(active, nlo, lo)
        hi = jnp.where(active, nhi, hi)
        return (lo, hi), None

    if A > 1:
        (clo, chi), _ = jax.lax.scan(
            cstep, (clo, chi), jnp.arange(A - 1, dtype=jnp.int32))
    empty = ~cok | (chi <= clo)
    clo = jnp.where(empty, 0, clo)
    chi = jnp.where(empty, 0, chi)
    return exact_lo, exact_hi, clo, chi


def extend_backward_all(fmi, lo, hi):
    """rank_all-based interval split: intervals for all 4 prepended symbols.

    Returns (lo4, hi4) of shape (..., 4). Used by MEM search and k-mismatch
    backtracking to branch densely.
    """
    adj_lo = lo - (lo > fmi.primary).astype(lo.dtype)
    adj_hi = hi - (hi > fmi.primary).astype(hi.dtype)
    if fmi.ranktab is not None:
        occ_lo = rank_all_fused(fmi.ranktab, adj_lo)
        occ_hi = rank_all_fused(fmi.ranktab, adj_hi)
    else:
        occ_lo = rank_all(fmi.bwt_words, fmi.occ, adj_lo)
        occ_hi = rank_all(fmi.bwt_words, fmi.occ, adj_hi)
    cnt = fmi.count[:4][None, :] if lo.ndim == 1 else fmi.count[:4]
    return cnt + occ_lo, cnt + occ_hi


def search_kmm_core(fmi, queries, qlens, k: int, max_states: int = 32):
    """Approximate backward search with up to ``k`` mismatches.

    The dense re-design of the reference's explicit-stack hamming
    backtracker (``fmindex/backtrack.h:45-172``): instead of per-thread DFS
    (divergent, stack in local memory), a BEAM of ``max_states`` live
    (lo, hi, n_mismatch) states per query advances in lockstep over suffix
    positions; each step branches every state through all 4 symbols
    (``extend_backward_all``), charges a mismatch for non-read symbols, and
    pushes the whole 4-way expansion into a ``max_states``-slot bounded
    priority queue keyed by -mismatches (``nvbio_tpu.priority``, the
    batched counterpart of the reference's in-kernel priority containers)
    — the queue's worst-falls-out semantics IS the capacity-bounded
    frontier. Distinct mismatch sets can reach the same SA range;
    callers that count occurrences should dedup on (lo, hi).

    Returns (lo, hi, n_mis, valid), each (B, max_states), mismatch-sorted.
    """
    queries = jnp.asarray(queries, jnp.int32)
    qlens = jnp.asarray(qlens, jnp.int32)
    B, L = queries.shape
    S = max_states
    slot = jnp.arange(S, dtype=jnp.int32)
    lo = jnp.zeros((B, S), jnp.int32)
    hi = jnp.broadcast_to(
        jnp.where(slot == 0, fmi.n + 1, 0).astype(jnp.int32), (B, S))
    nm = jnp.zeros((B, S), jnp.int32)
    valid = slot[None, :] == jnp.zeros((B, 1), jnp.int32)

    from nvbio_tpu.priority import NEG_INF as QNEG, BatchPriorityQueue

    flat_idx = jnp.broadcast_to(
        jnp.arange(S * 4, dtype=jnp.int32)[None, :], (B, S * 4))

    def step(carry, s):
        lo, hi, nm, valid = carry
        j = jnp.clip(qlens - 1 - s, 0, L - 1)
        c = jnp.take_along_axis(queries, j[:, None], axis=1)[:, 0]
        lo4, hi4 = extend_backward_all(fmi, lo, hi)          # (B, S, 4)
        add = (jnp.arange(4, dtype=jnp.int32)[None, None, :]
               != c[:, None, None]).astype(jnp.int32)
        nm4 = nm[:, :, None] + add
        valid4 = valid[:, :, None] & (hi4 > lo4) & (nm4 <= k)
        q = BatchPriorityQueue.make(B, S, xp=jnp).push(
            -nm4.reshape(B, S * 4), flat_idx,
            mask=valid4.reshape(B, S * 4))
        order = q.values  # flat expansion indices of the surviving states

        def pick(x4):
            return jnp.take_along_axis(x4.reshape(B, S * 4), order, axis=1)

        nlo, nhi = pick(lo4), pick(hi4)
        nnm, nva = pick(nm4), q.keys > QNEG
        active = (s < qlens)[:, None]
        lo = jnp.where(active, nlo, lo)
        hi = jnp.where(active, nhi, hi)
        nm = jnp.where(active, nnm, nm)
        valid = jnp.where(active, nva, valid)
        return (lo, hi, nm, valid), None

    (lo, hi, nm, valid), _ = jax.lax.scan(
        step, (lo, hi, nm, valid), jnp.arange(L, dtype=jnp.int32))
    return lo, hi, nm, valid


def search_kmm(fmi, queries, qlens, k: int, max_states: int = 32):
    import functools

    return jax.jit(functools.partial(
        search_kmm_core, k=k, max_states=max_states))(fmi, queries, qlens)
