"""Q-gram index golden tests (counts/locations vs naive scan)."""

import numpy as np
import jax.numpy as jnp

from nvbio_tpu.qgram import (
    QGramIndex,
    build_qgram_index,
    qgram_count,
    qgram_keys,
    qgram_locate,
    qgram_range,
    seed_keys_from_batch,
)


def test_qgram_keys_basic():
    codes = np.array([0, 1, 2, 3, 0], dtype=np.uint8)
    keys = qgram_keys(codes, 2)
    # big-endian: (0,1)->1, (1,2)->6, (2,3)->11, (3,0)->12
    np.testing.assert_array_equal(keys, [1, 6, 11, 12])


def test_qgram_index_lookup(rng):
    n, q = 5000, 6
    codes = rng.integers(0, 4, size=n, dtype=np.uint8)
    idx = build_qgram_index(codes, q).device()

    B = 64
    queries = np.zeros((B, q), dtype=np.int32)
    for b in range(B):
        p = rng.integers(0, n - q)
        queries[b] = codes[p:p + q]

    keys = seed_keys_from_batch(jnp.asarray(queries), q)
    lo, hi = qgram_range(idx, keys)
    lo, hi = np.asarray(lo), np.asarray(hi)
    gk = qgram_keys(codes, q)
    for b in range(B):
        want = np.nonzero(gk == int(np.asarray(keys)[b]))[0]
        assert hi[b] - lo[b] == len(want)
        got = np.sort(
            np.asarray(
                qgram_locate(idx, jnp.asarray(lo[b:b+1]), jnp.arange(hi[b]-lo[b]))
            )
        )
        np.testing.assert_array_equal(got, want)


def test_qgram_count_batch(rng):
    n, q = 2000, 5
    codes = rng.integers(0, 4, size=n, dtype=np.uint8)
    idx = build_qgram_index(codes, q).device()
    queries = rng.integers(0, 4, size=(32, q)).astype(np.int32)
    cnt = np.asarray(qgram_count(idx, jnp.asarray(queries)))
    gk = qgram_keys(codes, q)
    for b in range(32):
        key = int(qgram_keys(queries[b].astype(np.uint8), q)[0])
        assert cnt[b] == (gk == key).sum()


def test_qgram_save_load(tmp_path, rng):
    codes = rng.integers(0, 4, size=500, dtype=np.uint8)
    idx = build_qgram_index(codes, 4)
    p = str(tmp_path / "qg.npz")
    idx.save(p)
    idx2 = QGramIndex.load(p)
    np.testing.assert_array_equal(idx.offsets, idx2.offsets)
    np.testing.assert_array_equal(idx.positions, idx2.positions)
