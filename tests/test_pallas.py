"""Pallas kernel parity vs the scan-based scorer (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from nvbio_tpu.align.batch import batch_score_banded
from nvbio_tpu.align.pallas_kernels import banded_score_semiglobal_pallas
from nvbio_tpu.align.types import SEMI_GLOBAL, GotohAligner, GotohScoring

SC = GotohScoring(0, -6, -8, -3, -8, -3)


def test_pallas_banded_parity(rng):
    B, M, W = 64, 50, 11
    TW = M + W - 1
    pats = rng.integers(0, 4, size=(B, M)).astype(np.int32)
    txts = rng.integers(0, 4, size=(B, TW)).astype(np.int32)
    # make half of them real alignments
    txts[: B // 2, 5:5 + M] = pats[: B // 2]
    plens = rng.integers(M // 2, M + 1, size=B).astype(np.int32)
    tlens = np.full(B, TW, np.int32)
    mm = -rng.integers(2, 7, size=(B, M)).astype(np.int32)

    want = batch_score_banded(
        jnp.asarray(pats), jnp.asarray(plens), jnp.asarray(txts),
        jnp.asarray(tlens), GotohAligner(SEMI_GLOBAL, SC), W,
        mismatch_scores=jnp.asarray(mm),
    )
    got_s, got_k = banded_score_semiglobal_pallas(
        jnp.asarray(pats), jnp.asarray(plens), jnp.asarray(txts),
        jnp.asarray(tlens), SC, W, mismatch_scores=jnp.asarray(mm),
        block=128, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got_s), np.asarray(want.score))


def test_pallas_banded_no_quals(rng):
    B, M, W = 32, 30, 9
    TW = M + W - 1
    pats = rng.integers(0, 4, size=(B, M)).astype(np.int32)
    txts = rng.integers(0, 4, size=(B, TW)).astype(np.int32)
    plens = np.full(B, M, np.int32)
    tlens = np.full(B, TW, np.int32)
    want = batch_score_banded(
        jnp.asarray(pats), jnp.asarray(plens), jnp.asarray(txts),
        jnp.asarray(tlens), GotohAligner(SEMI_GLOBAL, SC), W,
    )
    got_s, _ = banded_score_semiglobal_pallas(
        jnp.asarray(pats), jnp.asarray(plens), jnp.asarray(txts),
        jnp.asarray(tlens), SC, W, block=128, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got_s), np.asarray(want.score))
