"""Protein alignment with BLOSUM62 (the proteinsw example parity config)."""

import numpy as np
import jax.numpy as jnp

from nvbio_tpu.align import (
    GLOBAL,
    LOCAL,
    SEMI_GLOBAL,
    batch_score_banded,
    batch_score_full,
    make_gotoh_aligner,
)
from nvbio_tpu.align.scoring import BLOSUM62
from nvbio_tpu.align.types import GotohScoring, NEG_INF
from nvbio_tpu.alphabet import Alphabet, string_to_codes


def golden_gotoh_matrix(pattern, text, matrix, po, pe, atype):
    """Scalar Gotoh with substitution matrix (oracle)."""
    M, N = len(pattern), len(text)
    NEG = NEG_INF
    H = np.zeros((N + 1, M + 1), np.int64)
    E = np.full((N + 1, M + 1), 0 if atype == LOCAL else NEG, np.int64)
    F = np.full((N + 1, M + 1), 0 if atype == LOCAL else NEG, np.int64)
    if atype != LOCAL:
        H[0, 1:] = po + pe * np.arange(M)
    if atype == GLOBAL:
        H[1:, 0] = po + pe * np.arange(N)
    best = -(1 << 60)
    for i in range(1, N + 1):
        for j in range(1, M + 1):
            E[i, j] = max(E[i, j - 1] + pe, H[i, j - 1] + po)
            F[i, j] = max(F[i - 1, j] + pe, H[i - 1, j] + po)
            s = matrix[pattern[j - 1], text[i - 1]]
            h = max(H[i - 1, j - 1] + s, E[i, j], F[i, j])
            if atype == LOCAL:
                h = max(h, 0)
            H[i, j] = h
            best = max(best, h)
    if atype == GLOBAL:
        return int(H[N, M])
    if atype == SEMI_GLOBAL:
        return int(H[1:, M].max())
    return int(best)


def test_proteinsw_parity(rng):
    """Batched local Gotoh + BLOSUM62 vs scalar oracle (proteinsw config)."""
    B, M, N = 6, 25, 40
    pats = rng.integers(0, 24, size=(B, M)).astype(np.int32)
    txts = rng.integers(0, 24, size=(B, N)).astype(np.int32)
    txts[:3, 5:5 + M] = pats[:3]  # planted hits
    sc = GotohScoring(match=0, mismatch=0, pattern_gap_open=-5,
                      pattern_gap_ext=-3, text_gap_open=-5, text_gap_ext=-3)
    for atype in [LOCAL, SEMI_GLOBAL, GLOBAL]:
        aligner = make_gotoh_aligner(atype, sc)
        got = np.asarray(
            batch_score_full(
                jnp.asarray(pats), jnp.asarray(np.full(B, M, np.int32)),
                jnp.asarray(txts), jnp.asarray(np.full(B, N, np.int32)),
                aligner, subst_matrix=jnp.asarray(BLOSUM62),
            ).score
        )
        for b in range(B):
            want = golden_gotoh_matrix(pats[b], txts[b], BLOSUM62, -5, -3, atype)
            assert got[b] == want, f"{atype} b={b}: {got[b]} != {want}"


def test_protein_banded_matrix(rng):
    B, M, W = 8, 20, 9
    TW = M + W - 1
    pats = rng.integers(0, 24, size=(B, M)).astype(np.int32)
    txts = rng.integers(0, 24, size=(B, TW)).astype(np.int32)
    sc = GotohScoring(0, 0, -5, -3, -5, -3)
    got = np.asarray(
        batch_score_banded(
            jnp.asarray(pats), jnp.asarray(np.full(B, M, np.int32)),
            jnp.asarray(txts), jnp.asarray(np.full(B, TW, np.int32)),
            make_gotoh_aligner(SEMI_GLOBAL, sc), W,
            subst_matrix=jnp.asarray(BLOSUM62),
        ).score
    )
    # banded golden with matrix: brute-force band DP
    for b in range(B):
        NEG = NEG_INF
        H = np.zeros((M + 1, W), np.int64)
        E = np.full((M + 1, W), NEG, np.int64)
        F = np.full((M + 1, W), NEG, np.int64)
        for i in range(1, M + 1):
            for k in range(W):
                ti = i - 1 + k
                if k + 1 < W:
                    E[i, k] = max(E[i-1, k+1] - 3, H[i-1, k+1] - 5)
                if k > 0:
                    F[i, k] = max(F[i, k-1] - 3, H[i, k-1] - 5)
                s = BLOSUM62[pats[b, i-1], txts[b, ti]] if ti < TW else NEG
                H[i, k] = max(H[i-1, k] + s, E[i, k], F[i, k])
        assert got[b] == H[M].max()


def test_protein_string_roundtrip():
    codes = string_to_codes("MKVLAA", Alphabet.PROTEIN)
    assert codes.tolist() == [10, 8, 18, 9, 0, 0]


def test_protein_fmindex_wavelet(rng):
    """Protein FM-index over a wavelet-tree BWT (wavelet_tree.h:77 serving
    fm_index): occurrence counts match a scalar scan for 24-symbol text."""
    import jax.numpy as jnp

    from nvbio_tpu.fmi.protein import (
        build_protein_fmindex,
        protein_count,
    )

    text = rng.integers(0, 24, size=2000, dtype=np.uint8)
    pfmi = build_protein_fmindex(text).device()

    L = 9
    queries, want = [], []
    for i in range(12):
        p = int(rng.integers(0, len(text) - L))
        q = text[p:p + L]
        queries.append(q)
        wv = sum(1 for j in range(len(text) - L + 1)
                 if (text[j:j + L] == q).all())
        want.append(wv)
    for i in range(4):  # random peptides, usually absent
        q = rng.integers(0, 24, size=L, dtype=np.uint8)
        queries.append(q)
        want.append(sum(1 for j in range(len(text) - L + 1)
                        if (text[j:j + L] == q).all()))
    qarr = jnp.asarray(np.stack(queries).astype(np.int32))
    lens = jnp.asarray(np.full(len(queries), L, np.int32))
    got = np.asarray(protein_count(pfmi, qarr, lens))
    np.testing.assert_array_equal(got, np.asarray(want))
