"""Numpy golden models for DP alignment — the test oracle.

Same role as the reference's ``ref_sw`` / ``ref_banded_sw`` CPU models
(``nvbio-test/alignment_test_utils.h:240-620``): simple, obviously-correct
full-matrix DP used to validate the vectorized TPU implementations bit-exactly.

Conventions (shared with the JAX implementations):
  * pattern (query/read) indexes columns ``j`` (length M),
    text (reference) indexes rows ``i`` (length N);
  * E = horizontal state (consumes pattern, SAM 'I'),
    F = vertical state (consumes text, SAM 'D');
  * SEMI_GLOBAL = pattern global / text local: row 0 is free, the score is the
    max over the ``j == M`` column;
  * banded alignment anchors the band on the main diagonal: DP row ``i``
    covers text positions ``[i, i + BAND)`` of the given text window.
"""

from __future__ import annotations

import numpy as np

from nvbio_tpu.align.types import (
    NEG_INF,
    AlignmentType,
    EditDistanceAligner,
    GotohAligner,
    HammingAligner,
    SmithWatermanAligner,
)


def _subst(scoring, p, t):
    return scoring.match if p == t else scoring.mismatch


def sw_matrix(pattern, text, aligner):
    """Full H matrix for linear-gap (SW / edit-distance) alignment."""
    scoring = aligner.scoring
    M, N = len(pattern), len(text)
    t = AlignmentType(aligner.type)
    H = np.zeros((N + 1, M + 1), dtype=np.int64)
    if t != AlignmentType.LOCAL:
        H[0, 1:] = scoring.insertion * np.arange(1, M + 1)
    if t == AlignmentType.GLOBAL:
        H[1:, 0] = scoring.deletion * np.arange(1, N + 1)
    for i in range(1, N + 1):
        for j in range(1, M + 1):
            s = _subst(scoring, pattern[j - 1], text[i - 1])
            h = max(
                H[i - 1, j] + scoring.deletion,
                H[i, j - 1] + scoring.insertion,
                H[i - 1, j - 1] + s,
            )
            if t == AlignmentType.LOCAL:
                h = max(h, 0)
            H[i, j] = h
    return H


def gotoh_matrices(pattern, text, aligner):
    """Full H/E/F matrices for affine-gap (Gotoh) alignment."""
    s = aligner.scoring
    M, N = len(pattern), len(text)
    t = AlignmentType(aligner.type)
    H = np.zeros((N + 1, M + 1), dtype=np.int64)
    E = np.full((N + 1, M + 1), 0 if t == AlignmentType.LOCAL else NEG_INF, np.int64)
    F = np.full((N + 1, M + 1), 0 if t == AlignmentType.LOCAL else NEG_INF, np.int64)
    if t != AlignmentType.LOCAL:
        H[0, 1:] = s.pattern_gap_open + s.pattern_gap_ext * np.arange(M)
    if t == AlignmentType.GLOBAL:
        H[1:, 0] = s.text_gap_open + s.text_gap_ext * np.arange(N)
    for i in range(1, N + 1):
        for j in range(1, M + 1):
            E[i, j] = max(E[i, j - 1] + s.pattern_gap_ext, H[i, j - 1] + s.pattern_gap_open)
            F[i, j] = max(F[i - 1, j] + s.text_gap_ext, H[i - 1, j] + s.text_gap_open)
            h = max(H[i - 1, j - 1] + _subst(s, pattern[j - 1], text[i - 1]), E[i, j], F[i, j])
            if t == AlignmentType.LOCAL:
                h = max(h, 0)
            H[i, j] = h
    return H, E, F


def hamming_matrix(pattern, text, aligner):
    """Diagonal-only (Hamming) scoring matrix."""
    s = aligner.scoring
    M, N = len(pattern), len(text)
    t = AlignmentType(aligner.type)
    H = np.full((N + 1, M + 1), NEG_INF, dtype=np.int64)
    H[0, 0] = 0
    if t != AlignmentType.GLOBAL:
        H[:, 0] = 0
    for i in range(1, N + 1):
        for j in range(1, M + 1):
            if H[i - 1, j - 1] > NEG_INF:
                h = H[i - 1, j - 1] + _subst(s, pattern[j - 1], text[i - 1])
                if t == AlignmentType.LOCAL:
                    h = max(h, 0)
                H[i, j] = h
    return H


def _extract_score(H, M, N, atype):
    t = AlignmentType(atype)
    if t == AlignmentType.GLOBAL:
        return int(H[N, M])
    if t == AlignmentType.SEMI_GLOBAL:
        return int(H[1:, M].max()) if N else int(H[0, M])
    return int(H.max())


def score(pattern, text, aligner) -> int:
    """Golden alignment score for any aligner."""
    if isinstance(aligner, (SmithWatermanAligner, EditDistanceAligner)):
        H = sw_matrix(pattern, text, aligner)
    elif isinstance(aligner, GotohAligner):
        H = gotoh_matrices(pattern, text, aligner)[0]
    elif isinstance(aligner, HammingAligner):
        H = hamming_matrix(pattern, text, aligner)
    else:
        raise TypeError(type(aligner))
    return _extract_score(H, len(pattern), len(text), aligner.type)


def banded_score(pattern, text, band_len: int, aligner) -> int:
    """Golden banded score: band anchored at the main diagonal of ``text``.

    Equivalent to the reference's ``ref_banded_sw``: row ``i`` covers text
    cells ``text[i + k]`` for ``k in [0, band_len)``; out-of-band moves are
    impossible. ``text`` must have length >= len(pattern) + band_len - 1
    (callers pad the window).
    """
    # Build via the full matrix restricted to the band: equivalent and simple.
    M = len(pattern)
    t = AlignmentType(aligner.type)
    if isinstance(aligner, GotohAligner):
        H, E, F = _banded_gotoh(pattern, text, band_len, aligner)
    else:
        H = _banded_sw(pattern, text, band_len, aligner)
    if t == AlignmentType.GLOBAL:
        return int(H[M, band_len - 1])
    if t == AlignmentType.SEMI_GLOBAL:
        return int(H[M].max())
    return int(H.max())


def _banded_sw(pattern, text, W, aligner):
    s = aligner.scoring
    t = AlignmentType(aligner.type)
    hamming = isinstance(aligner, HammingAligner)
    M = len(pattern)
    H = np.zeros((M + 1, W), dtype=np.int64)
    if t == AlignmentType.GLOBAL:
        H[0, 1:] = NEG_INF if hamming else s.deletion * np.arange(1, W)
    for i in range(1, M + 1):
        prev = H[i - 1]
        for k in range(W):
            ti = i - 1 + k
            sub = _subst(s, pattern[i - 1], text[ti]) if ti < len(text) else NEG_INF
            h = prev[k] + sub
            if not hamming:
                if k + 1 < W:
                    # from (i-1, k+1): same text position, consumes pattern => 'I'
                    h = max(h, prev[k + 1] + s.insertion)
                if k > 0:
                    # from (i, k-1): same pattern position, consumes text => 'D'
                    h = max(h, H[i, k - 1] + s.deletion)
            if t == AlignmentType.LOCAL:
                h = max(h, 0)
            H[i, k] = h
    return H


def _banded_gotoh(pattern, text, W, aligner):
    s = aligner.scoring
    t = AlignmentType(aligner.type)
    M = len(pattern)
    H = np.zeros((M + 1, W), dtype=np.int64)
    E = np.full((M + 1, W), NEG_INF, dtype=np.int64)
    F = np.full((M + 1, W), NEG_INF, dtype=np.int64)
    if t == AlignmentType.GLOBAL:
        H[0, 1:] = s.text_gap_open + s.text_gap_ext * np.arange(W - 1)
    for i in range(1, M + 1):
        for k in range(W):
            ti = i - 1 + k
            # E: pattern gap ('I'); in band coords from (i-1, k+1)
            if k + 1 < W:
                E[i, k] = max(E[i - 1, k + 1] + s.pattern_gap_ext, H[i - 1, k + 1] + s.pattern_gap_open)
            # F: text gap ('D'); in band coords from (i, k-1)
            if k > 0:
                F[i, k] = max(F[i, k - 1] + s.text_gap_ext, H[i, k - 1] + s.text_gap_open)
            sub = _subst(s, pattern[i - 1], text[ti]) if ti < len(text) else NEG_INF
            h = max(H[i - 1, k] + sub, E[i, k], F[i, k])
            if t == AlignmentType.LOCAL:
                h = max(h, 0)
            H[i, k] = h
    return H, E, F


def score_alignment(pattern, text, start, ops, aligner) -> int:
    """Re-score a traceback path (list of 'M','I','D' ops + text start).

    Validation identical in spirit to the reference's TestBacktracker::score:
    any reported alignment must re-score to the DP optimum.
    """
    s = aligner.scoring
    affine = isinstance(aligner, GotohAligner)
    j = 0
    k = start
    total = 0
    prev = None
    for op in ops:
        if op == "M":
            total += _subst(s, pattern[j], text[k])
            j += 1
            k += 1
        elif op == "I":  # consumes pattern
            if affine:
                total += s.pattern_gap_ext if prev == "I" else s.pattern_gap_open
            else:
                total += s.insertion
            j += 1
        elif op == "D":  # consumes text
            if affine:
                total += s.text_gap_ext if prev == "D" else s.text_gap_open
            else:
                total += s.deletion
            k += 1
        prev = op
    return total
