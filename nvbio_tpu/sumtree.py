"""Weighted sampling over per-read hit priorities (SumTree equivalent).

The reference's ``SumTree`` (``nvbio/basic/sum_tree.h:42-104``) is a Fenwick-
style CDF tree used by nvBowtie's select stage to sample seed hits
proportionally to priority. On TPU, prefix sums are a native vector op, so
the "tree" is simply a batched cumsum + searchsorted — same API surface
(setup / add / sample), fully batched.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample(weights: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """Sample an index per row proportionally to ``weights``.

    weights: (B, S) nonnegative; u: (B,) uniforms in [0, 1).
    Returns (B,) int32 indices (rows with zero total weight return 0).
    """
    w = jnp.maximum(weights.astype(jnp.float32), 0.0)
    cdf = jnp.cumsum(w, axis=1)
    total = cdf[:, -1:]
    target = u[:, None].astype(jnp.float32) * total
    idx = jnp.sum((cdf <= target).astype(jnp.int32), axis=1)
    return jnp.clip(idx, 0, weights.shape[1] - 1)


def sample_many(weights: jnp.ndarray, key, n: int) -> jnp.ndarray:
    """Sample n indices per row (with replacement): (B, n) int32."""
    B = weights.shape[0]
    u = jax.random.uniform(key, (B, n))
    return jax.vmap(sample, in_axes=(None, 1), out_axes=1)(weights, u)


def add(weights: jnp.ndarray, idx: jnp.ndarray, delta) -> jnp.ndarray:
    """Adjust one leaf per row (the reference's SumTree::add) — used to
    deprioritize already-selected hits."""
    return weights.at[jnp.arange(weights.shape[0]), idx].add(delta)
