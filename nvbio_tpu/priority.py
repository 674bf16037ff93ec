"""Batched bounded priority queues (dense, fixed-capacity).

Counterpart of the reference's in-kernel priority containers
(``nvbio/basic/priority_queue.h``, ``priority_deque.h`` interval heaps,
and nvBowtie's per-read seed-hit deques ``seed_hit_deque_array.h``): each
lane keeps its items sorted best-first in a fixed-width slot array, so
``push``/``pop``/``best``/``worst`` are dense vector ops over the whole
batch — the TPU re-expression of "one priority deque per read".

Keys sort DESCENDING (slot 0 = best); use negated keys for a min-queue.
Works with numpy or jax.numpy arrays.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np

NEG_INF = -(2**30)


@dataclasses.dataclass
class BatchPriorityQueue:
    """(B, K) keys + values, kept sorted descending by key per row."""

    keys: Any      # int32[B, K], NEG_INF marks empty slots
    values: Any    # int32[B, K]
    capacity: int

    @classmethod
    def make(cls, batch: int, capacity: int, xp=np) -> "BatchPriorityQueue":
        return cls(
            keys=xp.full((batch, capacity), NEG_INF, xp.int32),
            values=xp.zeros((batch, capacity), xp.int32),
            capacity=capacity,
        )

    def _xp(self):
        return np if isinstance(self.keys, np.ndarray) else _jnp()

    def push(self, key, value, mask=None) -> "BatchPriorityQueue":
        """Insert per-lane items; when full, the worst items fall out
        (the bounded-deque semantics nvBowtie uses for seed hits).

        ``key``/``value`` are (B,) for a single item per lane or (B, M) for
        an M-wide batched push (one merge + one sort — how a beam search
        pushes a whole expansion frontier at once). ``mask`` disables
        insertion per element. Existing items win ties (stable sort), and
        equal-key pushed items keep their column order.
        """
        xp = self._xp()
        key = xp.asarray(key, self.keys.dtype)
        value = xp.asarray(value, self.values.dtype)
        if key.ndim == 1:
            key = key[:, None]
            value = value[:, None]
        if mask is not None:
            mask = xp.asarray(mask)
            if mask.ndim == 1:
                mask = mask[:, None]
            key = xp.where(mask, key, NEG_INF)
        ext_k = xp.concatenate([self.keys, key], axis=1)
        ext_v = xp.concatenate([self.values, value], axis=1)
        order = xp.argsort(-ext_k, axis=1, stable=True)[:, :self.capacity]
        return BatchPriorityQueue(
            xp.take_along_axis(ext_k, order, axis=1),
            xp.take_along_axis(ext_v, order, axis=1),
            self.capacity,
        )

    def pop_best(self):
        """((key, value) of slot 0, queue without it)."""
        xp = self._xp()
        k0, v0 = self.keys[:, 0], self.values[:, 0]
        pad_k = xp.full((self.keys.shape[0], 1), NEG_INF, self.keys.dtype)
        pad_v = xp.zeros((self.values.shape[0], 1), self.values.dtype)
        q = BatchPriorityQueue(
            xp.concatenate([self.keys[:, 1:], pad_k], axis=1),
            xp.concatenate([self.values[:, 1:], pad_v], axis=1),
            self.capacity,
        )
        return (k0, v0), q

    def best(self):
        return self.keys[:, 0], self.values[:, 0]

    def worst(self):
        """Worst *occupied* slot per lane (interval-heap 'bottom')."""
        xp = self._xp()
        occupied = self.keys > NEG_INF
        n = occupied.sum(axis=1)
        idx = xp.maximum(n - 1, 0)
        k = xp.take_along_axis(self.keys, idx[:, None], axis=1)[:, 0]
        v = xp.take_along_axis(self.values, idx[:, None], axis=1)[:, 0]
        return k, v

    def size(self):
        return (self.keys > NEG_INF).sum(axis=1)


def _jnp():
    import jax.numpy as jnp

    return jnp
