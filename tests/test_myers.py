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


def test_myers_pallas_parity(rng):
    """Register-tiled Pallas Myers vs the XLA scan version (interpret)."""
    import jax.numpy as jnp

    from nvbio_tpu.align.myers import myers_semiglobal
    from nvbio_tpu.align.pallas_kernels import myers_semiglobal_pallas

    B, M, T = 48, 70, 90  # multi-word (NW=3)
    pats = rng.integers(0, 4, size=(B, M)).astype(np.int32)
    txts = rng.integers(0, 4, size=(B, T)).astype(np.int32)
    for b in range(0, B, 2):  # half contain the pattern with errors
        s = int(rng.integers(0, T - M))
        txts[b, s:s + M] = pats[b]
        for _ in range(int(rng.integers(0, 4))):
            j = int(rng.integers(s, s + M))
            txts[b, j] = (txts[b, j] + 1) % 4
    plens = rng.integers(M // 2, M + 1, size=B).astype(np.int32)
    tlens = rng.integers(M, T + 1, size=B).astype(np.int32)

    want = myers_semiglobal(jnp.asarray(pats), jnp.asarray(plens),
                            jnp.asarray(txts), jnp.asarray(tlens))
    got_d, got_e = myers_semiglobal_pallas(
        jnp.asarray(pats), jnp.asarray(plens), jnp.asarray(txts),
        jnp.asarray(tlens), interpret=True)
    np.testing.assert_array_equal(np.asarray(want.distance), np.asarray(got_d))
    np.testing.assert_array_equal(np.asarray(want.text_end), np.asarray(got_e))
