"""Anchor chaining: the dense-batch equivalent of nvmem's chain builder.

The reference builds chains with per-read priority queues
(``nvmem/build-chains.cu``); here chaining is a batched O(A^2) DP over A
anchors per read (A is small): f[i] = len_i + max_j<i compatible
(f[j] - gap_cost), vectorized over the batch with a ``fori_loop`` over
anchors in (tpos, qbeg) order, then a bounded parent walk extracts the best
chain's span.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from nvbio_tpu.align.types import NEG_INF


class BestChain(NamedTuple):
    score: jnp.ndarray   # (B,) int32
    qbeg: jnp.ndarray    # (B,) chain span in the read
    qend: jnp.ndarray
    tbeg: jnp.ndarray    # (B,) genome pos of the chain's first anchor
    n_anchors: jnp.ndarray  # (B,)
    valid: jnp.ndarray   # (B,)


class TopChains(NamedTuple):
    """K best chains per row (descending score), nvmem's per-read chain
    list + overlap filter (``nvmem/pipeline.h:107-147``)."""

    score: jnp.ndarray   # (B, K) int32
    qbeg: jnp.ndarray    # (B, K)
    qend: jnp.ndarray    # (B, K)
    tbeg: jnp.ndarray    # (B, K)
    valid: jnp.ndarray   # (B, K)


def chain_anchors(
    qbeg, qend, tpos, valid,
    max_gap: int = 1000, bandwidth: int = 100, gap_coeff_num: int = 1,
    gap_coeff_den: int = 8,
):
    """Chain anchors per read; all inputs (B, A). Returns BestChain.

    Score model: anchor length minus |diagonal drift| * coeff between
    consecutive anchors (an integer simplification of BWA-MEM's chaining
    weight).
    """
    B, A = qbeg.shape
    neg = jnp.int32(NEG_INF)
    length = qend - qbeg

    # sort anchors by (tpos, qbeg); invalid last
    key = jnp.where(valid, tpos, jnp.int32(2**30)) * jnp.int32(2) \
        + (qbeg > 0).astype(jnp.int32) * 0  # tie handling via stable sort
    order = jnp.argsort(key, axis=1, stable=True)
    qb = jnp.take_along_axis(qbeg, order, axis=1)
    qe = jnp.take_along_axis(qend, order, axis=1)
    tp = jnp.take_along_axis(tpos, order, axis=1)
    ln = jnp.take_along_axis(length, order, axis=1)
    va = jnp.take_along_axis(valid, order, axis=1)

    f0 = jnp.where(va, ln, neg)
    parent0 = jnp.full((B, A), -1, jnp.int32)

    def body(i, state):
        f, parent = state
        qb_i = qb[:, i][:, None]
        qe_i = qe[:, i][:, None]
        tp_i = tp[:, i][:, None]
        dq = qb_i - qb  # (B, A) gap in read vs every potential predecessor
        dt = tp_i - tp
        drift = jnp.abs(dq - dt)
        compat = (
            (jnp.arange(A)[None, :] < i)
            & va & va[:, i][:, None]
            & (dq > 0) & (dt > 0)
            & (dt <= max_gap)
            & (drift <= bandwidth)
            & (qb >= 0)
        )
        cand = f + ln[:, i][:, None] - (drift * gap_coeff_num) // gap_coeff_den
        cand = jnp.where(compat, cand, neg)
        best_j = jnp.argmax(cand, axis=1).astype(jnp.int32)
        best_v = jnp.take_along_axis(cand, best_j[:, None], axis=1)[:, 0]
        upd = best_v > f[:, i]
        f = f.at[:, i].set(jnp.where(upd, best_v, f[:, i]))
        parent = parent.at[:, i].set(jnp.where(upd, best_j, -1))
        return f, parent

    f, parent = jax.lax.fori_loop(0, A, body, (f0, parent0))

    tail = jnp.argmax(f, axis=1).astype(jnp.int32)
    score = jnp.take_along_axis(f, tail[:, None], axis=1)[:, 0]

    # walk parents to the chain head, collecting the span
    def walk(carry, _):
        i, qlo, thi_qe, count = carry
        gi = i[:, None]
        pq = jnp.take_along_axis(qb, gi, axis=1)[:, 0]
        pt = jnp.take_along_axis(tp, gi, axis=1)[:, 0]
        par = jnp.take_along_axis(parent, gi, axis=1)[:, 0]
        qlo = jnp.minimum(qlo, pq)
        live = par >= 0
        count = count + live.astype(jnp.int32)
        i = jnp.where(live, par, i)
        return (i, qlo, thi_qe, count), (pq, pt)

    qe_tail = jnp.take_along_axis(qe, tail[:, None], axis=1)[:, 0]
    init = (tail, jnp.full((B,), 2**30, jnp.int32), qe_tail, jnp.ones((B,), jnp.int32))
    (head, qlo, _, count), _ = jax.lax.scan(walk, init, None, length=A)
    tbeg = jnp.take_along_axis(tp, head[:, None], axis=1)[:, 0]
    qbeg_chain = jnp.take_along_axis(qb, head[:, None], axis=1)[:, 0]

    valid_chain = score > neg // 2
    return BestChain(
        score=score,
        qbeg=jnp.where(valid_chain, qbeg_chain, 0),
        qend=jnp.where(valid_chain, qe_tail, 0),
        tbeg=jnp.where(valid_chain, tbeg, 0),
        n_anchors=count,
        valid=valid_chain,
    )


def chain_anchors_topk(
    qbeg, qend, tpos, valid, n_chains: int,
    max_gap: int = 1000, bandwidth: int = 100, gap_coeff_num: int = 1,
    gap_coeff_den: int = 8, overlap_den: int = 2,
):
    """K best anchor chains per read with overlap filtering.

    Same DP as ``chain_anchors``, then K rounds of: pick the best remaining
    tail, walk its parents collecting the member-anchor mask, suppress those
    anchors, repeat. A chain whose read-span overlaps an already-kept chain
    by more than span/overlap_den is dropped (bwa-mem's chain filter; the
    reference keeps per-read chain lists and filters before repeated
    ``align()`` passes, ``nvmem/pipeline.h:107-147``, ``nvmem.cu:128-149``).
    Returns TopChains of shape (B, n_chains), scores descending.
    """
    B, A = qbeg.shape
    neg = jnp.int32(NEG_INF)
    length = qend - qbeg

    key = jnp.where(valid, tpos, jnp.int32(2**30))
    order = jnp.argsort(key, axis=1, stable=True)
    qb = jnp.take_along_axis(qbeg, order, axis=1)
    qe = jnp.take_along_axis(qend, order, axis=1)
    tp = jnp.take_along_axis(tpos, order, axis=1)
    ln = jnp.take_along_axis(length, order, axis=1)
    va = jnp.take_along_axis(valid, order, axis=1)

    f0 = jnp.where(va, ln, neg)
    parent0 = jnp.full((B, A), -1, jnp.int32)

    def body(i, state):
        f, parent = state
        qb_i = qb[:, i][:, None]
        tp_i = tp[:, i][:, None]
        dq = qb_i - qb
        dt = tp_i - tp
        drift = jnp.abs(dq - dt)
        compat = (
            (jnp.arange(A)[None, :] < i)
            & va & va[:, i][:, None]
            & (dq > 0) & (dt > 0)
            & (dt <= max_gap)
            & (drift <= bandwidth)
        )
        cand = f + ln[:, i][:, None] - (drift * gap_coeff_num) // gap_coeff_den
        cand = jnp.where(compat, cand, neg)
        best_j = jnp.argmax(cand, axis=1).astype(jnp.int32)
        best_v = jnp.take_along_axis(cand, best_j[:, None], axis=1)[:, 0]
        upd = best_v > f[:, i]
        f = f.at[:, i].set(jnp.where(upd, best_v, f[:, i]))
        parent = parent.at[:, i].set(jnp.where(upd, best_j, -1))
        return f, parent

    f, parent = jax.lax.fori_loop(0, A, body, (f0, parent0))

    cols = jnp.arange(A, dtype=jnp.int32)[None, :]
    f_work = f
    outs = []
    kept_spans = []  # (qbeg, qend, valid) of already-kept chains
    for _ in range(n_chains):
        tail = jnp.argmax(f_work, axis=1).astype(jnp.int32)
        score_k = jnp.take_along_axis(f_work, tail[:, None], axis=1)[:, 0]

        def walk(carry, _):
            i, member = carry
            member = member | (cols == i[:, None])
            par = jnp.take_along_axis(parent, i[:, None], axis=1)[:, 0]
            i = jnp.where(par >= 0, par, i)
            return (i, member), None

        (head, member), _ = jax.lax.scan(
            walk, (tail, jnp.zeros((B, A), bool)), None, length=A)
        qb_k = jnp.take_along_axis(qb, head[:, None], axis=1)[:, 0]
        tb_k = jnp.take_along_axis(tp, head[:, None], axis=1)[:, 0]
        qe_k = jnp.take_along_axis(qe, tail[:, None], axis=1)[:, 0]
        ok = score_k > neg // 2
        # overlap filter vs already-kept chains: an overlapping chain is
        # dropped only when it scores below HALF the kept chain (bwa-mem's
        # drop_ratio) — equal-score repeat loci survive
        for (kqb, kqe, ks, kok) in kept_spans:
            ov = jnp.minimum(qe_k, kqe) - jnp.maximum(qb_k, kqb)
            span = jnp.maximum(qe_k - qb_k, 1)
            ok = ok & ~(kok & (ov * overlap_den > span)
                        & (score_k * 2 < ks))
        outs.append((score_k, qb_k, qe_k, tb_k, ok))
        kept_spans.append((qb_k, qe_k, score_k, ok))
        # suppress this chain's anchors for the next round
        f_work = jnp.where(member, neg, f_work)

    stack = lambda i: jnp.stack([o[i] for o in outs], axis=1)
    return TopChains(
        score=stack(0),
        qbeg=jnp.where(stack(4), stack(1), 0),
        qend=jnp.where(stack(4), stack(2), 0),
        tbeg=jnp.where(stack(4), stack(3), 0),
        valid=stack(4),
    )
