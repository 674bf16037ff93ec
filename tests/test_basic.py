"""Basic-layer parity tests: Bloom filters, SumTree sampling, wavelet tree."""

import numpy as np
import jax
import jax.numpy as jnp

from nvbio_tpu.bloom import BloomFilter, ByteBloomFilter
from nvbio_tpu.sumtree import add as st_add, sample as st_sample
from nvbio_tpu.wavelet import build_wavelet_tree, rank as wt_rank


def test_bloom_no_false_negatives(rng):
    bf = BloomFilter.empty(1 << 16, k=4)
    keys = rng.integers(0, 1 << 30, size=2000, dtype=np.uint32)
    bf.insert(keys)
    assert bf.contains(keys).all()
    # false positive rate sane for this load factor
    probe = rng.integers(1 << 30, 1 << 31, size=5000, dtype=np.uint32)
    fpr = bf.contains(probe).mean()
    assert fpr < 0.05


def test_bloom_device_query(rng):
    bf = BloomFilter.empty(1 << 14, k=3)
    keys = rng.integers(0, 1 << 30, size=500, dtype=np.uint32)
    bf.insert(keys)
    dev = bf.device()
    got = np.asarray(dev.contains(jnp.asarray(keys)))
    assert got.all()


def test_bloom_merge(rng):
    a = BloomFilter.empty(1 << 12, k=3)
    b = BloomFilter.empty(1 << 12, k=3)
    ka = rng.integers(0, 1 << 30, size=100, dtype=np.uint32)
    kb = rng.integers(0, 1 << 30, size=100, dtype=np.uint32)
    a.insert(ka)
    b.insert(kb)
    m = a.merge(b)
    assert m.contains(ka).all() and m.contains(kb).all()


def test_byte_bloom_device_insert(rng):
    bf = ByteBloomFilter.empty(1 << 14, k=3, device=True)
    keys = jnp.asarray(rng.integers(0, 1 << 30, size=300, dtype=np.uint32))
    bf = bf.insert(keys)
    assert np.asarray(bf.contains(keys)).all()
    packed = bf.pack()
    assert packed.contains(np.asarray(keys)).all()


def test_sumtree_sampling(rng):
    B, S = 4, 8
    w = jnp.asarray(rng.random((B, S)).astype(np.float32))
    w = w.at[:, 3].set(10.0)  # dominant weight
    u = jnp.asarray(rng.random(B).astype(np.float32))
    idx = np.asarray(st_sample(w, u))
    assert idx.shape == (B,)
    # statistical: dominant weight wins most draws
    us = jnp.asarray(rng.random((B, 200)).astype(np.float32))
    draws = np.stack(
        [np.asarray(st_sample(w, us[:, j])) for j in range(200)], axis=1
    )
    assert (draws == 3).mean() > 0.5
    w2 = st_add(w, jnp.asarray([3, 3, 3, 3]), -10.0)
    assert float(w2[0, 3]) == float(w[0, 3]) - 10.0


def test_wavelet_rank(rng):
    for bits in [3, 5]:
        n = 3000
        codes = rng.integers(0, 1 << bits, size=n, dtype=np.uint32)
        wt = build_wavelet_tree(codes, bits).device()
        cs = rng.integers(0, 1 << bits, size=128)
        idx = rng.integers(0, n + 1, size=128)
        got = np.asarray(wt_rank(wt, jnp.asarray(cs), jnp.asarray(idx)))
        want = np.array([(codes[:i] == c).sum() for c, i in zip(cs, idx)])
        np.testing.assert_array_equal(got, want)


def test_string_set_views(rng):
    """Sparse/strided/prefix/suffix string-set views (string_set.h:60-88):
    shallow adaptors over shared storage, round-tripping through padded."""
    from nvbio_tpu.stringset import (
        ConcatStringSet,
        SparseStringSet,
        StridedStringSet,
        make_prefix_set,
        make_suffix_set,
    )

    strings = ["ACGTACG", "TTG", "GATTACA", "C"]
    cs = ConcatStringSet.from_strings(strings)

    sp = SparseStringSet(cs.codes, np.asarray(cs.offsets[:-1]),
                         cs.lengths)
    for i, s in enumerate(strings):
        assert len(sp[i]) == len(s)
        np.testing.assert_array_equal(sp[i], cs[i])
    padded = sp.to_padded()
    st = StridedStringSet.from_padded(padded)
    for i in range(len(strings)):
        np.testing.assert_array_equal(st[i], cs[i])
    back = st.to_padded()
    np.testing.assert_array_equal(np.asarray(back.codes),
                                  np.asarray(padded.codes))

    pre = make_prefix_set(cs, np.array([3, 2, 10, 1]))
    np.testing.assert_array_equal(pre[0], cs[0][:3])
    np.testing.assert_array_equal(pre[2], cs[2])        # clamped to length
    suf = make_suffix_set(cs, np.array([2, 1, 0, 5]))
    np.testing.assert_array_equal(suf[0], cs[0][2:])
    np.testing.assert_array_equal(suf[2], cs[2])
    assert len(suf[3]) == 0                              # clamped empty
