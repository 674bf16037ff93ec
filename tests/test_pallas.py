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


def test_fused_traceback_parity(rng):
    """Fused Pallas traceback (forward + in-VMEM walk) vs the generic
    scan-based traceback: scores, op sequences, spans, and NM must match."""
    from nvbio_tpu.align.traceback import (
        batch_traceback_banded,
        batch_traceback_banded_fast,
        cigar_to_string,
    )

    B, M, W = 48, 40, 11
    TW = M + W - 1
    pats = rng.integers(0, 4, size=(B, M)).astype(np.int32)
    txts = rng.integers(0, 4, size=(B, TW)).astype(np.int32)
    for b in range(0, B, 2):  # half are real alignments, some with an indel
        t = txts[b, 4:4 + M].copy()
        if b % 4 == 0 and M > 12:
            t = np.concatenate([t[:10], t[11:], t[-1:]])
        pats[b] = t[:M]
    plens = rng.integers(M // 2, M + 1, size=B).astype(np.int32)
    tlens = np.full(B, TW, np.int32)
    mm = -rng.integers(2, 7, size=(B, M)).astype(np.int32)

    aligner = GotohAligner(SEMI_GLOBAL, SC)
    ref = batch_traceback_banded(
        jnp.asarray(pats), jnp.asarray(plens), jnp.asarray(txts),
        jnp.asarray(tlens), aligner, W, jnp.asarray(mm))
    fast, nm = batch_traceback_banded_fast(
        jnp.asarray(pats), jnp.asarray(plens), jnp.asarray(txts),
        jnp.asarray(tlens), SC, W, jnp.asarray(mm), interpret=True)

    np.testing.assert_array_equal(np.asarray(ref.score), np.asarray(fast.score))
    np.testing.assert_array_equal(np.asarray(ref.n_ops), np.asarray(fast.n_ops))
    np.testing.assert_array_equal(np.asarray(ref.text_start),
                                  np.asarray(fast.text_start))
    # fast ops are end->start; CIGARs must agree after host reversal
    for b in range(B):
        want = cigar_to_string(np.asarray(ref.ops)[b], int(ref.n_ops[b]))
        got = cigar_to_string(np.asarray(fast.ops)[b], int(fast.n_ops[b]),
                              reverse=True)
        assert want == got, f"read {b}: {want} != {got}"
    # NM parity vs recompute from the reference walk
    ro = np.asarray(ref.ops)
    for b in range(B):
        pc = int(np.asarray(ref.pattern_start)[b])
        tc = int(np.asarray(ref.text_start)[b])
        want_nm = 0
        for o in ro[b][:int(ref.n_ops[b])]:
            if o == 1:
                want_nm += int(pats[b, pc] != txts[b, tc]); pc += 1; tc += 1
            elif o == 2:
                want_nm += 1; pc += 1
            else:
                want_nm += 1; tc += 1
        assert int(nm[b]) == want_nm, b


def test_fused_traceback_local_parity(rng):
    """LOCAL mode of the fused kernel vs the generic traceback."""
    from nvbio_tpu.align.traceback import (
        batch_traceback_banded,
        batch_traceback_banded_fast,
        cigar_to_string,
    )
    from nvbio_tpu.align.types import LOCAL

    SCL = GotohScoring(2, -3, -5, -2, -5, -2)
    B, M, W = 64, 40, 11
    TW = M + W - 1
    pats = rng.integers(0, 4, size=(B, M)).astype(np.int32)
    txts = rng.integers(0, 4, size=(B, TW)).astype(np.int32)
    for b in range(0, B, 2):  # half have a real local core
        s = int(rng.integers(0, 5))
        ln = int(rng.integers(10, M - 5))
        txts[b, 5:5 + ln] = pats[b, s:s + ln]
    plens = rng.integers(M // 2, M + 1, size=B).astype(np.int32)
    tlens = np.full(B, TW, np.int32)

    ref = batch_traceback_banded(
        jnp.asarray(pats), jnp.asarray(plens), jnp.asarray(txts),
        jnp.asarray(tlens), GotohAligner(LOCAL, SCL), W)
    fast, _nm = batch_traceback_banded_fast(
        jnp.asarray(pats), jnp.asarray(plens), jnp.asarray(txts),
        jnp.asarray(tlens), SCL, W, interpret=True, local=True)
    for name in ("score", "n_ops", "pattern_start", "pattern_end",
                 "text_start", "text_end"):
        np.testing.assert_array_equal(
            np.asarray(getattr(ref, name)), np.asarray(getattr(fast, name)),
            err_msg=name)
    for b in range(B):
        want = cigar_to_string(np.asarray(ref.ops)[b], int(ref.n_ops[b]))
        got = cigar_to_string(np.asarray(fast.ops)[b], int(fast.n_ops[b]),
                              reverse=True)
        assert want == got, (b, want, got)


def test_regtile16_matches_int32(rng):
    """int16 register-tiled scorer == int32 regtile for real-score lanes
    (above the -8192 sentinel; unmappable lanes saturate at the sentinel)."""
    from nvbio_tpu.align.pallas_kernels import (
        banded_score_semiglobal_regtile,
        banded_score_semiglobal_regtile16,
    )

    B, M, W = 96, 40, 11
    TW = M + W - 1
    pats = rng.integers(0, 4, size=(B, M)).astype(np.int32)
    txts = rng.integers(0, 4, size=(B, TW)).astype(np.int32)
    txts[: B // 2, 3:3 + M] = pats[: B // 2]
    plens = rng.integers(M // 2, M + 1, size=B).astype(np.int32)
    tlens = np.full(B, TW, np.int32)
    tlens[B // 2:3 * B // 4] = rng.integers(5, TW, size=B // 4)  # short texts
    mm = -rng.integers(2, 7, size=(B, M)).astype(np.int32)

    s32, k32 = banded_score_semiglobal_regtile(
        jnp.asarray(pats), jnp.asarray(plens), jnp.asarray(txts),
        jnp.asarray(tlens), SC, W, jnp.asarray(mm), interpret=True)
    s16, k16 = banded_score_semiglobal_regtile16(
        jnp.asarray(pats), jnp.asarray(plens), jnp.asarray(txts),
        jnp.asarray(tlens), SC, W, jnp.asarray(mm), interpret=True)
    s32 = np.asarray(s32)
    s16 = np.asarray(s16)
    real = s32 > -8192
    assert real.sum() >= B // 2
    np.testing.assert_array_equal(s16[real], s32[real])
    np.testing.assert_array_equal(np.asarray(k16)[real], np.asarray(k32)[real])
    # saturated lanes report <= the sentinel floor, never wrap positive
    assert (s16[~real] <= -8000).all()


def test_regtile16_range_guard():
    """Adversarial all-mismatch max-length reads must not wrap int16
    (the -8192 clamp bounds every intermediate; scores stay exact while
    > -8192)."""
    from nvbio_tpu.align.batch import batch_score_banded
    from nvbio_tpu.align.pallas_kernels import (
        banded_score_semiglobal_regtile16,
    )

    B, M, W = 8, 128, 17
    TW = M + W - 1
    pats = np.zeros((B, M), np.int32)          # all A
    txts = np.full((B, TW), 1, np.int32)       # all C -> every cell mismatch
    plens = np.full(B, M, np.int32)
    tlens = np.full(B, TW, np.int32)
    mm = np.full((B, M), -6, np.int32)

    want = batch_score_banded(
        jnp.asarray(pats), jnp.asarray(plens), jnp.asarray(txts),
        jnp.asarray(tlens), GotohAligner(SEMI_GLOBAL, SC), W,
        mismatch_scores=jnp.asarray(mm))
    s16, _ = banded_score_semiglobal_regtile16(
        jnp.asarray(pats), jnp.asarray(plens), jnp.asarray(txts),
        jnp.asarray(tlens), SC, W, jnp.asarray(mm), interpret=True)
    w = np.asarray(want.score)
    g = np.asarray(s16)
    exact = w > -8192
    np.testing.assert_array_equal(g[exact], w[exact])
    assert (g >= -8192 - 260).all() and (g <= 0).all()
