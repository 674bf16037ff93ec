"""Sharded q-gram index served over mesh collectives (8 fake devices)."""

import functools

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

from nvbio_tpu.parallel.mesh import READS_AXIS, make_reads_mesh  # noqa: E402
from nvbio_tpu.parallel.sharded_index import (  # noqa: E402
    place_sharded_index,
    shard_qgram_index,
    sharded_lookup,
)
from nvbio_tpu.qgram import build_qgram_index, qgram_keys  # noqa: E402


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_lookup_matches_replicated():
    rng = np.random.default_rng(11)
    text = rng.integers(0, 4, size=20000, dtype=np.uint8)
    q = 8
    index = build_qgram_index(text, q)
    mesh = make_reads_mesh(8)
    sidx = shard_qgram_index(index, 8)
    sidx = place_sharded_index(mesh, sidx)

    B, S = 64, 4  # queries per device x slots
    keys_all = qgram_keys(text, q)
    probe = rng.choice(keys_all, size=(8, B)).astype(np.int32)
    slots = rng.integers(0, 3, size=(8, B)).astype(np.int32)

    lookup = functools.partial(
        sharded_lookup, q=q, n_shards=8,
        keys_per_shard=sidx.keys_per_shard)
    fn = jax.jit(jax.shard_map(
        lookup, mesh=mesh,
        in_specs=(P(READS_AXIS), P(READS_AXIS), P(READS_AXIS), P(READS_AXIS)),
        out_specs=(P(READS_AXIS), P(READS_AXIS)),
        check_vma=False,
    ))
    sh = NamedSharding(mesh, P(READS_AXIS))
    pos, rs = fn(sidx.offsets, sidx.positions,
                 jax.device_put(probe, sh), jax.device_put(slots, sh))
    pos, rs = np.asarray(pos), np.asarray(rs)

    # oracle: single-index lookups
    offs = np.asarray(index.offsets, np.int64)
    poss = np.asarray(index.positions)
    for d in range(8):
        for b in range(B):
            k = int(probe[d, b])
            lo, hi = int(offs[k]), int(offs[k + 1])
            want_rs = hi - lo
            assert rs[d, b] == want_rs, (d, b)
            s = int(slots[d, b])
            if s < want_rs:
                assert pos[d, b] == poss[lo + s], (d, b)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_shard_qgram_index_partition():
    rng = np.random.default_rng(4)
    text = rng.integers(0, 4, size=5000, dtype=np.uint8)
    index = build_qgram_index(text, 6)
    sidx = shard_qgram_index(index, 8)
    assert sidx.offsets.shape == (8, sidx.keys_per_shard + 1)
    # every position appears exactly once across the shards
    total = []
    offs = np.asarray(index.offsets, np.int64)
    for d in range(8):
        n_local = int(sidx.offsets[d, -1])
        total.append(np.asarray(sidx.positions[d, :n_local]))
    got = np.concatenate(total)
    np.testing.assert_array_equal(got, np.asarray(index.positions))


def test_shard_fmindex_resident_parity(rng):
    """Device-RESIDENT sharded build (planes never fetched; the pod
    serving form) must equal the host-fetched build bit-for-bit."""
    import numpy as np

    from nvbio_tpu.fmi.sharded import shard_fmindex

    g = rng.integers(0, 4, size=120_000, dtype=np.uint8)
    a = shard_fmindex(g, 4, overlap=64, method="device", resident=True)
    b = shard_fmindex(g, 4, overlap=64, method="device")
    for f in ("bwt_words", "occ", "count", "primary", "ssa_marks",
              "ssa_cum", "ssa_vals"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, f)), np.asarray(getattr(b, f)),
            err_msg=f)
