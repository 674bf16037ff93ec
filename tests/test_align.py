"""Alignment parity tests: JAX batched scorers vs numpy golden models.

Oracle pattern mirrors the reference's alignment_test
(``nvbio-test/alignment_test.cu``): randomized pattern/text pairs at several
sizes, exact integer score comparison, traceback validated by re-scoring the
emitted path.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from nvbio_tpu.align import (
    GLOBAL,
    LOCAL,
    SEMI_GLOBAL,
    batch_score_banded,
    batch_score_full,
    batch_traceback_banded,
    make_edit_distance_aligner,
    make_gotoh_aligner,
    make_hamming_aligner,
    make_smith_waterman_aligner,
)
from nvbio_tpu.align.types import GotohScoring, SWScoring
from nvbio_tpu.align import golden
from nvbio_tpu.align.traceback import ops_to_chars

ALL_TYPES = [GLOBAL, SEMI_GLOBAL, LOCAL]

GOTOH = GotohScoring(
    match=2, mismatch=-1, pattern_gap_open=-3, pattern_gap_ext=-1,
    text_gap_open=-3, text_gap_ext=-1,
)
SW = SWScoring(match=2, mismatch=-1, deletion=-2, insertion=-2)


def _aligners(atype):
    return [
        make_edit_distance_aligner(atype),
        make_smith_waterman_aligner(atype, SW),
        make_gotoh_aligner(atype, GOTOH),
    ]


def _random_batch(rng, B, M, N, mutate_from_text=True):
    """Patterns derived from random texts with mutations => realistic scores."""
    texts = rng.integers(0, 4, size=(B, N), dtype=np.int32)
    if mutate_from_text:
        pats = texts[:, :M].copy()
        n_mut = max(1, M // 8)
        for b in range(B):
            pos = rng.integers(0, M, size=n_mut)
            pats[b, pos] = rng.integers(0, 4, size=n_mut)
    else:
        pats = rng.integers(0, 4, size=(B, M), dtype=np.int32)
    plens = rng.integers(max(1, M // 2), M + 1, size=B).astype(np.int32)
    tlens = rng.integers(max(1, N // 2), N + 1, size=B).astype(np.int32)
    return pats, plens, texts, tlens


@pytest.mark.parametrize("atype", ALL_TYPES)
@pytest.mark.parametrize("shape", [(8, 16, 24), (4, 33, 47)])
def test_full_score_parity(rng, atype, shape):
    B, M, N = shape
    pats, plens, texts, tlens = _random_batch(rng, B, M, N)
    for aligner in _aligners(atype):
        got = batch_score_full(
            jnp.asarray(pats), jnp.asarray(plens), jnp.asarray(texts),
            jnp.asarray(tlens), aligner,
        )
        got_scores = np.asarray(got.score)
        for b in range(B):
            want = golden.score(pats[b, :plens[b]], texts[b, :tlens[b]], aligner)
            assert got_scores[b] == want, (
                f"{aligner} b={b} got {got_scores[b]} want {want}"
            )


@pytest.mark.parametrize("atype", [SEMI_GLOBAL, LOCAL])
def test_full_score_hamming(rng, atype):
    B, M, N = 8, 12, 30
    pats, plens, texts, tlens = _random_batch(rng, B, M, N)
    aligner = make_hamming_aligner(atype, SW)
    got = np.asarray(
        batch_score_full(
            jnp.asarray(pats), jnp.asarray(plens), jnp.asarray(texts),
            jnp.asarray(tlens), aligner,
        ).score
    )
    for b in range(B):
        want = golden.score(pats[b, :plens[b]], texts[b, :tlens[b]], aligner)
        assert got[b] == want


@pytest.mark.parametrize("atype", ALL_TYPES)
@pytest.mark.parametrize("band", [5, 9, 15])
def test_banded_score_parity(rng, atype, band):
    B, M = 8, 20
    T = M + band - 1
    pats, plens, texts, _ = _random_batch(rng, B, M, T)
    tlens = np.full(B, T, np.int32)
    for aligner in _aligners(atype):
        got = np.asarray(
            batch_score_banded(
                jnp.asarray(pats), jnp.asarray(plens), jnp.asarray(texts),
                jnp.asarray(tlens), aligner, band,
            ).score
        )
        for b in range(B):
            # golden banded needs text window of plen + band - 1
            want = golden.banded_score(
                pats[b, :plens[b]], texts[b], band, aligner
            )
            assert got[b] == want, f"{aligner} b={b}: got {got[b]} want {want}"


@pytest.mark.parametrize("atype", ALL_TYPES)
def test_banded_traceback_rescore(rng, atype):
    """Any emitted path must re-score to the DP optimum (the reference's
    TestBacktracker validation)."""
    B, M, band = 16, 24, 9
    T = M + band - 1
    pats, plens, texts, _ = _random_batch(rng, B, M, T)
    tlens = np.full(B, T, np.int32)
    for aligner in _aligners(atype):
        res = batch_traceback_banded(
            jnp.asarray(pats), jnp.asarray(plens), jnp.asarray(texts),
            jnp.asarray(tlens), aligner, band,
        )
        scores = np.asarray(res.score)
        ops = np.asarray(res.ops)
        n_ops = np.asarray(res.n_ops)
        tstart = np.asarray(res.text_start)
        pstart = np.asarray(res.pattern_start)
        pend = np.asarray(res.pattern_end)
        for b in range(B):
            want = golden.banded_score(pats[b, :plens[b]], texts[b], band, aligner)
            assert scores[b] == want, f"{aligner} b={b} score mismatch"
            chars = ops_to_chars(ops[b], n_ops[b])
            # path consumes [pstart, pend) of the pattern
            consumed_p = chars.count("M") + chars.count("I")
            assert consumed_p == pend[b] - pstart[b]
            if atype != LOCAL:
                assert pend[b] == plens[b]
            if atype != LOCAL:
                assert pstart[b] == 0
            # re-score the path
            path_pattern = pats[b, pstart[b]:pend[b]]
            rescored = golden.score_alignment(
                path_pattern, texts[b], tstart[b], chars, aligner
            )
            assert rescored == want, (
                f"{aligner} b={b}: path {chars} rescores {rescored} != {want}"
            )


def test_per_position_mismatch_scores(rng):
    """Quality-dependent mismatch penalties (bowtie2-style MM(q))."""
    B, M, band = 4, 12, 5
    T = M + band - 1
    pats, plens, texts, _ = _random_batch(rng, B, M, T)
    tlens = np.full(B, T, np.int32)
    mm = -rng.integers(1, 7, size=(B, M)).astype(np.int32)
    aligner = make_gotoh_aligner(SEMI_GLOBAL, GOTOH)
    got = np.asarray(
        batch_score_banded(
            jnp.asarray(pats), jnp.asarray(plens), jnp.asarray(texts),
            jnp.asarray(tlens), aligner, band, mismatch_scores=jnp.asarray(mm),
        ).score
    )

    # golden with per-position penalties: emulate by a tiny wrapper scheme
    for b in range(B):
        class _S:
            match = GOTOH.match
            pattern_gap_open = GOTOH.pattern_gap_open
            pattern_gap_ext = GOTOH.pattern_gap_ext
            text_gap_open = GOTOH.text_gap_open
            text_gap_ext = GOTOH.text_gap_ext
            mismatch = 0  # unused

        # brute force banded DP with position-dependent mismatch
        W = band
        plen = int(plens[b])
        H = np.full((plen + 1, W), 0, np.int64)
        E = np.full((plen + 1, W), -(1 << 24), np.int64)
        F = np.full((plen + 1, W), -(1 << 24), np.int64)
        for i in range(1, plen + 1):
            for k in range(W):
                ti = i - 1 + k
                if k + 1 < W:
                    E[i, k] = max(E[i-1, k+1] + GOTOH.pattern_gap_ext,
                                  H[i-1, k+1] + GOTOH.pattern_gap_open)
                if k > 0:
                    F[i, k] = max(F[i, k-1] + GOTOH.text_gap_ext,
                                  H[i, k-1] + GOTOH.text_gap_open)
                s = GOTOH.match if pats[b, i-1] == texts[b, ti] else mm[b, i-1]
                H[i, k] = max(H[i-1, k] + s, E[i, k], F[i, k])
        want = H[plen].max()
        assert got[b] == want


def test_full_matrix_traceback(rng):
    """Full-matrix traceback (batch_traceback_full / _scan): scores must
    equal the wavefront full-matrix scorer, the CIGAR must re-walk to the
    score, and a 25 bp deletion far outside any practical band must be
    recovered exactly."""
    import jax.numpy as jnp

    from nvbio_tpu.align.batch import batch_score_full
    from nvbio_tpu.align.traceback import (
        batch_traceback_full,
        batch_traceback_full_scan,
        cigar_to_string,
    )
    from nvbio_tpu.align.types import SEMI_GLOBAL, GotohAligner, GotohScoring

    sc = GotohScoring(match=0, mismatch=-3, pattern_gap_open=-5,
                      pattern_gap_ext=-1, text_gap_open=-5, text_gap_ext=-1)
    B, M, T = 16, 70, 150
    texts = rng.integers(0, 4, size=(B, T)).astype(np.int32)
    pats = np.zeros((B, M), np.int32)
    for b in range(B):
        if b % 2 == 0:     # 25 bp deletion: way outside a +-15 band
            # 35 matched bases on each side make the deletion strictly
            # cheaper than clipping a flank via pattern gaps
            seg = np.concatenate([texts[b, 10:10 + 35],
                                  texts[b, 70:70 + M - 35]])
        else:              # plain offset alignment with 2 mismatches
            seg = texts[b, 30:30 + M].copy()
            seg[5] = (seg[5] + 1) % 4
            seg[40] = (seg[40] + 2) % 4
        pats[b] = seg[:M]
    plens = np.full(B, M, np.int32)
    tlens = np.full(B, T, np.int32)

    aligner = GotohAligner(SEMI_GLOBAL, sc)
    want = batch_score_full(jnp.asarray(pats), jnp.asarray(plens),
                            jnp.asarray(texts), jnp.asarray(tlens), aligner)
    tb = batch_traceback_full_scan(
        jnp.asarray(pats), jnp.asarray(plens), jnp.asarray(texts),
        jnp.asarray(tlens), aligner)
    np.testing.assert_array_equal(np.asarray(tb.score), np.asarray(want.score))

    fast, nm = batch_traceback_full(
        jnp.asarray(pats), jnp.asarray(plens), jnp.asarray(texts),
        jnp.asarray(tlens), sc, interpret=True)
    np.testing.assert_array_equal(np.asarray(fast.score),
                                  np.asarray(want.score))
    for b in range(B):
        wantc = cigar_to_string(np.asarray(tb.ops)[b], int(tb.n_ops[b]))
        got = cigar_to_string(np.asarray(fast.ops)[b], int(fast.n_ops[b]),
                              reverse=True)
        assert wantc == got, (b, wantc, got)
        if b % 2 == 0:
            assert "25D" in got, (b, got)  # the big deletion is recovered
        # the walked path re-scores to the reported score
        ts = int(np.asarray(fast.text_start)[b])
        assert 0 <= ts < T
        score = 0
        p, t = int(np.asarray(fast.pattern_start)[b]), ts
        ops = np.asarray(fast.ops)[b][:int(fast.n_ops[b])][::-1] & 3
        i = 0
        while i < len(ops):
            j = i
            while j < len(ops) and ops[j] == ops[i]:
                j += 1
            run = j - i
            if ops[i] == 1:
                for _ in range(run):
                    score += (sc.match if pats[b, p] == texts[b, t]
                              else sc.mismatch)
                    p += 1
                    t += 1
            elif ops[i] == 2:
                score += sc.pattern_gap_open + sc.pattern_gap_ext * (run - 1)
                p += run
            else:
                score += sc.text_gap_open + sc.text_gap_ext * (run - 1)
                t += run
            i = j
        assert score == int(np.asarray(fast.score)[b]), b
