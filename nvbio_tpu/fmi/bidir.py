"""Bidirectional FM-index extension (2BWT).

Counterpart of the reference's ``nvbio/fmindex/bidir.h:50-93``
(``extend_forward``/``extend_backward``): a pattern P is tracked as a pair
of synchronized SA intervals — [lo, hi) over the forward index and
[rlo, rhi) over the reversed-text index — so it can be extended by one
symbol on EITHER end in O(rank_all) without restarting the search. This is
the primitive under MEM search and seed-and-extend filters.

Batched: all interval arguments may be arrays of any matching shape; ``c``
broadcasts against them.
"""

from __future__ import annotations

import jax.numpy as jnp

from nvbio_tpu.fmi.search import extend_backward_all


def _extend(fmi_from, lo, hi, rlo, c):
    """Shared core: extend on fmi_from's side, re-anchor the twin interval."""
    lo4, hi4 = extend_backward_all(fmi_from, lo, hi)      # (..., 4)
    sizes = jnp.maximum(hi4 - lo4, 0)
    c_arr = jnp.asarray(c)
    csel = c_arr[..., None] if c_arr.ndim == lo4.ndim - 1 else c_arr
    new_lo = jnp.take_along_axis(lo4, csel, axis=-1)[..., 0]
    new_hi = jnp.take_along_axis(hi4, csel, axis=-1)[..., 0]
    # twin offset: occurrences in [lo, hi) extending with a symbol < c, plus
    # the sentinel row (which sorts before every symbol) if it is in range
    sym = jnp.arange(4, dtype=sizes.dtype)
    less = jnp.sum(jnp.where(sym < c_arr[..., None], sizes, 0), axis=-1)
    sentinel = ((lo <= fmi_from.primary) & (fmi_from.primary < hi)).astype(
        less.dtype)
    new_rlo = rlo + less + sentinel
    new_rhi = new_rlo + (new_hi - new_lo)
    return new_lo, new_hi, new_rlo, new_rhi


def extend_backward(fmi_fwd, fmi_rev, lo, hi, rlo, rhi, c):
    """P -> cP: returns the new (lo, hi, rlo, rhi) interval pair."""
    del rhi  # implied by interval-size equality
    return _extend(fmi_fwd, lo, hi, rlo, c)


def extend_forward(fmi_fwd, fmi_rev, lo, hi, rlo, rhi, c):
    """P -> Pc: symmetric — extend on the reversed index, re-anchor fwd."""
    rlo2, rhi2, lo2, hi2 = _extend(fmi_rev, rlo, rhi, lo, c)
    return lo2, hi2, rlo2, rhi2


def init_interval(fmi_fwd, shape=()):
    """The empty-pattern interval pair covering the whole index."""
    n = fmi_fwd.n
    z = jnp.zeros(shape, jnp.int32)
    full = jnp.full(shape, n + 1, jnp.int32)  # n+1 rows incl. sentinel
    return z, full, z, full
