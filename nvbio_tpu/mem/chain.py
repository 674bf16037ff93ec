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
