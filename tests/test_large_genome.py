"""Large-genome (uint32-position) and sharded-index pipeline tests.

The human-scale capability (reference: whole-genome indexing/mapping,
``nvbio/sufsort/sufsort.h:45-60``, ``nvBowtie/nvBowtie.cpp:491-536``) rests
on two mechanisms validated here at small scale:
  (1) uint32 genome positions threaded through the q-gram index and the
      whole pipeline (bitwise-equal results vs the int32 path), and
  (2) the bucket-range-sharded index served over the device mesh
      (bitwise-equal results vs a replicated index).
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nvbio_tpu.bowtie.params import MapParams
from nvbio_tpu.bowtie.pipeline import ReadMapper
from nvbio_tpu.io.fastq import ReadBatch
from nvbio_tpu.io.reference import Reference
from nvbio_tpu.alphabet import codes_to_string
from nvbio_tpu.qgram import (
    QGramIndex,
    build_qgram_index,
    build_qgram_index_large,
)


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(123)


def _genome_and_reads(rng, n=60000, n_reads=64, L=80, mut=0.02):
    codes = rng.integers(0, 4, size=n, dtype=np.uint8)
    ref = Reference.from_records([("chrL", codes_to_string(codes))])
    reads, positions = [], []
    for i in range(n_reads):
        p = int(rng.integers(0, n - L))
        r = codes[p:p + L].copy()
        nmut = rng.binomial(L, mut)
        if nmut:
            mp = rng.integers(0, L, nmut)
            r[mp] = (r[mp] + rng.integers(1, 4, nmut)) % 4
        if rng.integers(0, 2):
            r = (3 - r)[::-1]
        reads.append(r)
        positions.append(p)
    batch = ReadBatch(
        names=[f"r{i}" for i in range(n_reads)],
        codes=np.stack(reads).astype(np.uint8),
        quals=np.full((n_reads, L), 30, np.uint8),
        lengths=np.full(n_reads, L, np.int32),
    )
    return ref, codes, batch, positions


def test_blocked_large_builder_matches_plain(rng):
    codes = rng.integers(0, 4, size=50021, dtype=np.uint8)
    a = build_qgram_index(codes, 8)
    b = build_qgram_index_large(codes, 8, chunk=4096)
    np.testing.assert_array_equal(np.asarray(a.offsets, np.int64),
                                  np.asarray(b.offsets, np.int64))
    np.testing.assert_array_equal(np.asarray(a.positions, np.int64),
                                  np.asarray(b.positions, np.int64))


def test_uint32_position_pipeline_parity(rng):
    """Forcing the index to uint32 positions must not change a single
    SAM-visible field (the large-genome dtype path is semantics-preserving)."""
    ref, codes, batch, _ = _genome_and_reads(rng)
    params = MapParams(max_read_len=80, seed_len=20, seed_stride=12,
                       hits_per_seed=4, max_dist=5)
    m32 = ReadMapper.build(ref, params)
    host_idx = build_qgram_index(np.asarray(codes), params.qgram_q)
    idx_u = QGramIndex(
        q=host_idx.q,
        offsets=np.asarray(host_idx.offsets).astype(np.uint32),
        positions=np.asarray(host_idx.positions).astype(np.uint32),
        n=host_idx.n,
    )
    mu = ReadMapper.build(ref, params, index=idx_u)
    recs32 = m32.map_batch(batch)
    recsu = mu.map_batch(batch)
    assert len(recs32) == len(recsu)
    for a, b in zip(recs32, recsu):
        assert (a.flag, a.pos, a.mapq, a.cigar, a.tags) == \
               (b.flag, b.pos, b.mapq, b.cigar, b.tags), a.qname


def test_sharded_index_step_matches_replicated(rng):
    """Bucket-range-sharded index over the mesh == replicated index,
    bitwise, for every per-read output (SURVEY §2.5 #10 integration)."""
    from nvbio_tpu.parallel.mesh import (
        make_reads_mesh,
        replicate,
        shard_batch,
        sharded_align_step,
    )
    from nvbio_tpu.parallel.sharded_index import (
        place_sharded_index,
        shard_qgram_index,
    )

    n_dev = len(jax.devices())
    assert n_dev >= 2
    ref, codes, batch, _ = _genome_and_reads(rng, n_reads=8 * n_dev)
    params = MapParams(max_read_len=80, seed_len=20, seed_stride=12,
                       hits_per_seed=4, max_dist=5, qgram_q=10)
    host_idx = build_qgram_index(np.asarray(codes), params.qgram_q)
    mesh = make_reads_mesh(n_dev)

    sidx = shard_qgram_index(host_idx, n_dev)
    sidx = place_sharded_index(mesh, sidx)

    gwords = jnp.asarray(ref.packed_words())
    step_repl = sharded_align_step(mesh, params)
    step_shrd = sharded_align_step(mesh, params, index_sharded=True)

    args = (
        jnp.int32(ref.total_length),
        shard_batch(mesh, jnp.asarray(batch.codes.astype(np.int32))),
        shard_batch(mesh, jnp.asarray(batch.lengths)),
        shard_batch(mesh, jnp.asarray(batch.quals)),
    )
    res_r, stats_r = step_repl(replicate(mesh, host_idx.device()),
                               replicate(mesh, gwords), *args)
    res_s, stats_s = step_shrd(sidx, replicate(mesh, gwords), *args)

    for key in ("mapped", "best_score", "mapq", "window_start", "text_start",
                "n_ops", "nm", "strand"):
        np.testing.assert_array_equal(
            np.asarray(res_r[key]), np.asarray(res_s[key]), err_msg=key)
    assert int(stats_r["n_mapped"]) == int(stats_s["n_mapped"])
    assert int(stats_s["n_mapped"]) >= 0.9 * len(batch)


def test_sharded_index_uneven_shards(rng):
    """Ceil-divided key space: shard counts that don't divide 4^q work."""
    from nvbio_tpu.parallel.sharded_index import shard_qgram_index

    codes = rng.integers(0, 4, size=5000, dtype=np.uint8)
    idx = build_qgram_index(codes, 5)   # 1024 buckets
    for d in (3, 5, 7):
        sidx = shard_qgram_index(idx, d)
        # every bucket's range must be recoverable from exactly one shard
        offs = np.asarray(idx.offsets, np.int64)
        pos = np.asarray(idx.positions, np.int64)
        kps = sidx.keys_per_shard
        for key in rng.integers(0, 1024, size=50).tolist():
            dshard = key // kps
            lk = key - dshard * kps
            lo = int(sidx.offsets[dshard, lk])
            hi = int(sidx.offsets[dshard, lk + 1])
            want = pos[offs[key]:offs[key + 1]]
            got = sidx.positions[dshard, lo:hi]
            np.testing.assert_array_equal(np.asarray(got, np.int64), want)


def test_sharded_fmindex_step(rng):
    """Genome-sliced FM-indexes over the mesh: reads map to their truth
    positions through shard_map (all_gather queries + all_to_all answers),
    including reads crossing slice seams (SURVEY §2.5 #10, FM flavor)."""
    from nvbio_tpu.fmi.sharded import place_sharded_fmindex, shard_fmindex
    from nvbio_tpu.parallel.mesh import (
        make_reads_mesh,
        replicate,
        shard_batch,
        sharded_align_step,
    )

    n_dev = len(jax.devices())
    assert n_dev >= 2
    n = 40000
    codes = rng.integers(0, 4, size=n, dtype=np.uint8)
    ref = Reference.from_records([("chrF", codes_to_string(codes))])
    params = MapParams(max_read_len=80, seed_len=20, seed_stride=12,
                       hits_per_seed=4, max_dist=5, seeding="fmi",
                       max_reseed=0)
    mesh = make_reads_mesh(n_dev)
    sidx = place_sharded_fmindex(
        mesh, shard_fmindex(codes, n_dev, overlap=128))

    L = 80
    B = 8 * n_dev
    slice_len = sidx.slice_len
    reads, positions = [], []
    for i in range(B):
        if i % 4 == 0:  # force seam-crossing reads
            p = min((1 + i % n_dev) * slice_len - L // 2, n - L)
        else:
            p = int(rng.integers(0, n - L))
        reads.append(codes[p:p + L])
        positions.append(p)
    reads = np.stack(reads).astype(np.int32)
    lens = np.full(B, L, np.int32)
    quals = np.full((B, L), 30, np.uint8)

    step = sharded_align_step(mesh, params, index_sharded=True)
    gwords = jnp.asarray(ref.packed_words())
    res, stats = step(sidx, replicate(mesh, gwords), jnp.int32(n),
                      shard_batch(mesh, jnp.asarray(reads)),
                      shard_batch(mesh, jnp.asarray(lens)),
                      shard_batch(mesh, jnp.asarray(quals)))
    mapped = np.asarray(res["mapped"])
    gpos = (np.asarray(res["window_start"]).astype(np.int64)
            + np.asarray(res["text_start"]))
    ok = mapped & (np.abs(gpos - np.asarray(positions)) <= params.max_dist)
    assert ok.sum() >= 0.95 * B, f"{ok.sum()}/{B}"
    # seam-crossers specifically
    seam = np.arange(B) % 4 == 0
    assert ok[seam].sum() >= 0.9 * seam.sum()


def test_sharded_fmindex_reseed_1mm(rng):
    """The FULL sensitivity machinery on the sharded-FM path: multi-pass
    reseeding with 1-mismatch mutated-seed searches served by the sliced
    index (sharded_fmi_seed_hits_1mm) (a) recovers reads that exact
    seeding misses, and (b) matches the replicated-FM step field-for-field
    on clean reads (the dryrun parity contract)."""
    from nvbio_tpu.fmi.index import build_fmindex
    from nvbio_tpu.fmi.sharded import place_sharded_fmindex, shard_fmindex
    from nvbio_tpu.parallel.mesh import (
        make_reads_mesh,
        replicate,
        shard_batch,
        sharded_align_step,
    )

    n_dev = len(jax.devices())
    assert n_dev >= 2
    n = 24000
    codes = rng.integers(0, 4, size=n, dtype=np.uint8)
    ref = Reference.from_records([("chrF", codes_to_string(codes))])
    L = 64
    params = MapParams(max_read_len=L, seed_len=16, seed_stride=16,
                       hits_per_seed=4, max_dist=5, seeding="fmi",
                       max_reseed=1, reseed_frac=1.0, seeding_1mm=True)
    mesh = make_reads_mesh(n_dev)
    sidx = place_sharded_fmindex(
        mesh, shard_fmindex(codes, n_dev, overlap=128))

    B = 8 * n_dev
    reads, positions = [], []
    for i in range(B):
        p = int(rng.integers(0, n - L))
        reads.append(codes[p:p + L].copy())
        positions.append(p)
    reads = np.stack(reads).astype(np.int32)
    # half the batch: plant a SNP inside EVERY exact seed window of the
    # default grid (phase 0), so only the shifted/1mm reseed pass can
    # recover them
    S1 = params.seeds_per_strand
    snp_rows = np.arange(0, B, 2)
    for b in snp_rows:
        for s in range(S1):
            j = s * params.seed_stride + params.seed_len // 2
            if j < L:
                reads[b, j] = (reads[b, j] + 1) % 4
    lens = np.full(B, L, np.int32)
    quals = np.full((B, L), 30, np.uint8)

    step = sharded_align_step(mesh, params, index_sharded=True)
    gwords = jnp.asarray(ref.packed_words())
    res, _ = step(sidx, replicate(mesh, gwords), jnp.int32(n),
                  shard_batch(mesh, jnp.asarray(reads)),
                  shard_batch(mesh, jnp.asarray(lens)),
                  shard_batch(mesh, jnp.asarray(quals)))
    mapped = np.asarray(res["mapped"])
    gpos = (np.asarray(res["window_start"]).astype(np.int64)
            + np.asarray(res["text_start"]))
    ok = mapped & (np.abs(gpos - np.asarray(positions)) <= params.max_dist)
    assert ok[snp_rows].sum() >= 0.75 * len(snp_rows), \
        f"SNP-seeded reads recovered: {ok[snp_rows].sum()}/{len(snp_rows)}"
    assert ok.sum() >= 0.9 * B

    # parity vs replicated-FM on the same (mixed) batch
    fm_rep = replicate(mesh, build_fmindex(codes).device())
    step_rep = sharded_align_step(mesh, params)
    res_r, _ = step_rep(fm_rep, replicate(mesh, gwords), jnp.int32(n),
                        shard_batch(mesh, jnp.asarray(reads)),
                        shard_batch(mesh, jnp.asarray(lens)),
                        shard_batch(mesh, jnp.asarray(quals)))
    # clean reads must agree field-for-field (SNP reads may legitimately
    # differ: the two paths sample different SA slots for multi-hit
    # mutated seeds)
    clean = np.setdiff1d(np.arange(B), snp_rows)
    for key in ("mapped", "best_score", "window_start", "mapq"):
        np.testing.assert_array_equal(
            np.asarray(res_r[key])[clean], np.asarray(res[key])[clean],
            err_msg=f"sharded vs replicated FM mismatch on clean reads: {key}")
