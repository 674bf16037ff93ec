"""Myers bit-parallel edit distance vs the scalar DP oracle."""

import numpy as np
import jax.numpy as jnp

from nvbio_tpu.align.myers import myers_golden, myers_semiglobal


def test_myers_parity(rng):
    B, N = 24, 90
    for M in [7, 31, 32, 33, 64, 70]:  # cross word boundaries
        texts = rng.integers(0, 4, size=(B, N), dtype=np.int32)
        pats = texts[:, 5:5 + M].copy()
        # mutate a few positions
        for b in range(B):
            if b % 3 == 0:
                idx = rng.integers(0, M, size=3)
                pats[b, idx] = (pats[b, idx] + 1) % 4
            elif b % 3 == 1:
                pats[b] = rng.integers(0, 4, size=M)
        plens = rng.integers(max(1, M - 4), M + 1, size=B).astype(np.int32)
        tlens = rng.integers(N // 2, N + 1, size=B).astype(np.int32)
        res = myers_semiglobal(
            jnp.asarray(pats), jnp.asarray(plens), jnp.asarray(texts),
            jnp.asarray(tlens),
        )
        dist = np.asarray(res.distance)
        for b in range(B):
            want = myers_golden(pats[b, :plens[b]], texts[b, :tlens[b]])
            assert dist[b] == want, f"M={M} b={b}: got {dist[b]} want {want}"


def test_myers_exact_hit(rng):
    B, M, N = 4, 33, 120
    texts = rng.integers(0, 4, size=(B, N), dtype=np.int32)
    pats = texts[:, 40:40 + M]
    res = myers_semiglobal(
        jnp.asarray(pats), jnp.asarray(np.full(B, M, np.int32)),
        jnp.asarray(texts), jnp.asarray(np.full(B, N, np.int32)),
    )
    assert (np.asarray(res.distance) == 0).all()
    # end position should be at or before 40+M (first exact occurrence)
    assert (np.asarray(res.text_end) <= 40 + M).all()
