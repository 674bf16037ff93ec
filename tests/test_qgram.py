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


def test_qgroup_matches_direct_address():
    import numpy as np

    from nvbio_tpu.qgram import (build_qgram_index, build_qgroup_index,
                                 qgram_keys, qgroup_locate, qgroup_range)

    rng = np.random.default_rng(23)
    text = rng.integers(0, 4, size=5000, dtype=np.uint8)
    q = 13  # beyond nothing, but checks the two-level path
    direct = build_qgram_index(text, 12)
    grp = build_qgroup_index(text, q)
    import jax.numpy as jnp

    keys = qgram_keys(text, q)
    # every present q-gram resolves to its exact position list
    probe = jnp.asarray(keys[rng.integers(0, len(keys), 200)].astype(np.int64))
    lo, hi = qgroup_range(grp, probe)
    lo, hi = np.asarray(lo), np.asarray(hi)
    assert (hi > lo).all()
    for t in range(0, 200, 17):
        g = int(probe[t])
        want = np.flatnonzero(keys == g)
        got = np.sort(np.asarray(grp.P)[lo[t]:hi[t]])
        np.testing.assert_array_equal(got, want)
    # absent q-grams return empty ranges
    present = set(keys.tolist())
    absent = []
    g = 1
    while len(absent) < 10:
        if g not in present:
            absent.append(g)
        g += 997
    lo2, hi2 = qgroup_range(grp, jnp.asarray(np.asarray(absent, np.int64)))
    assert (np.asarray(hi2) == np.asarray(lo2)).all()


def test_qgroup_in_pipeline():
    import numpy as np

    from nvbio_tpu.alphabet import codes_to_string
    from nvbio_tpu.bowtie.params import MapParams
    from nvbio_tpu.bowtie.pipeline import ReadMapper
    from nvbio_tpu.io.fastq import batch_from_records
    from nvbio_tpu.io.reference import Reference
    from nvbio_tpu.qgram import build_qgroup_index

    rng = np.random.default_rng(29)
    genome = codes_to_string(rng.integers(0, 4, 6000, np.uint8))
    ref = Reference.from_records([("c1", genome)])
    params = MapParams(max_read_len=60, seed_len=16, seed_stride=10,
                       hits_per_seed=4, max_dist=4, qgram_q=14)
    index = build_qgroup_index(ref.codes, params.qgram_q)
    mapper = ReadMapper.build(ref, params, index=index)
    recs = [(f"r{p}", genome[p:p + 60], "I" * 60) for p in (11, 777, 3000)]
    out = mapper.map_batch(batch_from_records(recs, 60))
    for r in out:
        assert not r.flag & 0x4
        assert r.pos - 1 == int(r.qname[1:])


def test_qgroup_q16_lookup():
    """q=16: packed int32 seed keys wrap negative but lookups still work."""
    import numpy as np
    import jax.numpy as jnp

    from nvbio_tpu.qgram import (build_qgroup_index, qgram_keys,
                                 qgroup_range, seed_keys_from_batch)

    rng = np.random.default_rng(77)
    text = rng.integers(0, 4, size=3000, dtype=np.uint8)
    grp = build_qgroup_index(text, 16)
    # probe via the device-side packer (int32, wraps for q=16)
    P = 50
    starts = rng.integers(0, len(text) - 16, size=P)
    seeds = np.stack([text[s:s + 16] for s in starts]).astype(np.int32)
    keys = seed_keys_from_batch(jnp.asarray(seeds)[None], 16)[0]
    lo, hi = qgroup_range(grp, keys)
    lo, hi = np.asarray(lo), np.asarray(hi)
    assert (hi > lo).all()
    full_keys = qgram_keys(text, 16)
    for t in range(P):
        want = np.flatnonzero(full_keys == full_keys[starts[t]])
        got = np.sort(np.asarray(grp.P)[lo[t]:hi[t]])
        np.testing.assert_array_equal(got, want)
