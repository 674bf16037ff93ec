"""Bowtie2-compatible MAPQ (V2 evaluator), vectorized.

Behavioral re-implementation of BowtieMapq2's end-to-end (monotone) branch
(``nvBowtie/bowtie2/cuda/mapq.h:146-263``): a piecewise table over
(best_over, best_diff) normalized by the score range. Expressed as nested
``jnp.where`` selects over the batch.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


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


def mapq_v2_local(
    best,            # (B,) int32 best LOCAL alignment score (>= 0)
    second,          # (B,) int32 second-best score
    has_second,      # (B,) bool
    min_score,       # (B,) int32 per-read minimum valid score
    max_score,       # (B,) int32 perfect score (match_bonus * len)
):
    """BowtieMapq2, local (non-monotone) branch
    (``nvBowtie/bowtie2/cuda/mapq.h:267-326``)."""
    best = best.astype(jnp.float32)
    second = second.astype(jnp.float32)
    min_score = min_score.astype(jnp.float32)
    diff = jnp.maximum(max_score.astype(jnp.float32) - min_score, 1.0)
    bo = best - min_score

    one = jnp.where(
        bo >= diff * 0.8, 44,
        jnp.where(
            bo >= diff * 0.7, 42,
            jnp.where(
                bo >= diff * 0.6, 41,
                jnp.where(
                    bo >= diff * 0.5, 36,
                    jnp.where(bo >= diff * 0.4, 28,
                              jnp.where(bo >= diff * 0.3, 24, 22)),
                ),
            ),
        ),
    )

    bd = jnp.abs(jnp.abs(best) - jnp.abs(second))
    at_max = bo == diff
    hi = bo >= diff * 0.5

    def tri(a, b, c):
        return jnp.where(at_max, a, jnp.where(hi, b, c))

    two = jnp.where(
        bd >= diff * 0.9, 40,
        jnp.where(
            bd >= diff * 0.8, 39,
            jnp.where(
                bd >= diff * 0.7, 38,
                jnp.where(
                    bd >= diff * 0.6, 37,
                    jnp.where(
                        bd >= diff * 0.5, tri(35, 25, 20),
                        jnp.where(
                            bd >= diff * 0.4, tri(34, 21, 19),
                            jnp.where(
                                bd >= diff * 0.3, tri(33, 18, 16),
                                jnp.where(
                                    bd >= diff * 0.2, tri(32, 17, 12),
                                    jnp.where(
                                        bd >= diff * 0.1, tri(31, 14, 9),
                                        jnp.where(
                                            bd > 0,
                                            jnp.where(hi, 11, 2),
                                            jnp.where(hi, 1, 0),
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
    return jnp.where(has_second, two, one).astype(jnp.int32)


# BowtieMapq3 lookup tables (``nvBowtie/bowtie2/cuda/mapq.h:43-145``)
# numpy at module level: jnp constants here would initialize the backend
# at IMPORT time (breaking spawned workers / pre-config platform selection);
# the jitted use sites fold them in as constants anyway
_M3_ONE = np.asarray([43, 42, 41, 36, 32, 27, 20, 11, 4, 1, 0], np.int32)
_M3_TWO_PERFECT = np.asarray(
    [2, 16, 23, 30, 31, 32, 34, 36, 38, 40, 42], np.int32)
_M3_TWO = np.asarray([
    [2, 2, 2, 1, 1, 0, 0, 0, 0, 0, 0],
    [20, 14, 7, 3, 2, 1, 0, 0, 0, 0, 0],
    [20, 16, 10, 6, 3, 1, 0, 0, 0, 0, 0],
    [20, 17, 13, 9, 3, 1, 1, 0, 0, 0, 0],
    [21, 19, 15, 9, 5, 2, 2, 0, 0, 0, 0],
    [22, 21, 16, 11, 10, 5, 0, 0, 0, 0, 0],
    [23, 22, 19, 16, 11, 0, 0, 0, 0, 0, 0],
    [24, 25, 21, 30, 0, 0, 0, 0, 0, 0, 0],
    [30, 26, 29, 0, 0, 0, 0, 0, 0, 0, 0],
    [30, 27, 0, 0, 0, 0, 0, 0, 0, 0, 0],
    [30, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0],
], np.int32)


def mapq_v3(
    best,            # (B,) int32 best score
    second,          # (B,) int32 second-best score
    has_second,      # (B,) bool
    min_score,       # (B,) int32
    max_score,       # (B,) int32 perfect score
    is_paired=None,  # (B,) bool, optional: paired hits short-circuit to 44
):
    """BowtieMapq3 (the bowtie1-style binned quality,
    ``nvBowtie/bowtie2/cuda/mapq.h:43-145``), vectorized."""
    bestf = best.astype(jnp.float32)
    maxf = max_score.astype(jnp.float32)
    minf = min_score.astype(jnp.float32)
    norm = 10.0 / jnp.maximum(maxf - minf, 1.0)

    neg_best = jnp.maximum(maxf - bestf, 0.0)           # negated best score
    best_bin = jnp.clip((neg_best * norm + 0.5).astype(jnp.int32), 0, 10)
    at_max = neg_best == 0

    diff = (best - second).astype(jnp.float32)
    diff_bin = jnp.clip((diff * norm + 0.5).astype(jnp.int32), 0, 10)

    one = jnp.where(at_max, 44, jnp.asarray(_M3_ONE)[best_bin])
    two = jnp.where(at_max, jnp.asarray(_M3_TWO_PERFECT)[best_bin],
                    jnp.asarray(_M3_TWO)[diff_bin, best_bin])
    q = jnp.where(has_second, two, one)
    q = jnp.where(bestf < minf, 0, q)
    if is_paired is not None:
        q = jnp.where(is_paired, 44, q)
    return q.astype(jnp.int32)
