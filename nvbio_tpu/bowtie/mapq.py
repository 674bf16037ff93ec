"""Bowtie2-compatible MAPQ (V2 evaluator), vectorized.

Behavioral re-implementation of BowtieMapq2's end-to-end (monotone) branch
(``nvBowtie/bowtie2/cuda/mapq.h:146-263``): a piecewise table over
(best_over, best_diff) normalized by the score range. Expressed as nested
``jnp.where`` selects over the batch.
"""

from __future__ import annotations

import jax.numpy as jnp


def mapq_v2_end_to_end(
    best,            # (B,) int32 best alignment score (<= 0 for e2e)
    second,          # (B,) int32 second-best score
    has_second,      # (B,) bool
    min_score,       # (B,) int32 per-read minimum valid score
    max_score=0,     # perfect score for end-to-end (match bonus 0)
):
    best = best.astype(jnp.float32)
    second = second.astype(jnp.float32)
    min_score = min_score.astype(jnp.float32)
    diff = jnp.maximum(jnp.float32(max_score) - min_score, 1.0)
    best_over = best - min_score

    # --- no-second branch ---
    bo = best_over
    one = jnp.where(
        bo >= diff * 0.8, 42,
        jnp.where(
            bo >= diff * 0.7, 40,
            jnp.where(
                bo >= diff * 0.6, 24,
                jnp.where(
                    bo >= diff * 0.5, 23,
                    jnp.where(bo >= diff * 0.4, 8, jnp.where(bo >= diff * 0.3, 3, 0)),
                ),
            ),
        ),
    )

    # --- two-alignments branch ---
    bd = jnp.abs(jnp.abs(best) - jnp.abs(second))
    perfect = best_over == diff

    def tier(hi_val, f1, v1, f2, v2, v3):
        return jnp.where(
            perfect, hi_val,
            jnp.where(bo >= diff * f1, v1, jnp.where(bo >= diff * f2, v2, v3)),
        )

    two = jnp.where(
        bd >= diff * 0.9, jnp.where(perfect, 39, 33),
        jnp.where(
            bd >= diff * 0.8, jnp.where(perfect, 38, 27),
            jnp.where(
                bd >= diff * 0.7, jnp.where(perfect, 37, 26),
                jnp.where(
                    bd >= diff * 0.6, jnp.where(perfect, 36, 22),
                    jnp.where(
                        bd >= diff * 0.5, tier(35, 0.84, 25, 0.68, 16, 5),
                        jnp.where(
                            bd >= diff * 0.4, tier(34, 0.84, 21, 0.68, 14, 4),
                            jnp.where(
                                bd >= diff * 0.3, tier(32, 0.88, 18, 0.67, 15, 3),
                                jnp.where(
                                    bd >= diff * 0.2, tier(31, 0.88, 17, 0.67, 11, 0),
                                    jnp.where(
                                        bd >= diff * 0.1,
                                        tier(30, 0.88, 12, 0.67, 7, 0),
                                        jnp.where(
                                            bd > 0,
                                            jnp.where(bo >= diff * 0.67, 6, 2),
                                            jnp.where(bo >= diff * 0.67, 1, 0),
                                        ),
                                    ),
                                ),
                            ),
                        ),
                    ),
                ),
            ),
        ),
    )

    q = jnp.where(has_second, two, one)
    return jnp.where(best < min_score, 0, q).astype(jnp.int32)
