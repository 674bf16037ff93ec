"""MEM pipeline tests: SMEM correctness, chaining, end-to-end local mapping."""

import numpy as np
import pytest
import jax.numpy as jnp

from nvbio_tpu.alphabet import Alphabet, codes_to_string, reverse_complement_codes
from nvbio_tpu.fmi.index import build_fmindex
from nvbio_tpu.fmi.mem import find_smems_batch, smem_extend_lengths
from nvbio_tpu.io.fastq import ReadBatch
from nvbio_tpu.io.reference import Reference
from nvbio_tpu.mem import MemMapper, MemParams


@pytest.fixture(scope="module")
def genome():
    rng = np.random.default_rng(21)
    return rng.integers(0, 4, size=12000, dtype=np.uint8)


@pytest.fixture(scope="module")
def fmi_rev(genome):
    return build_fmindex(genome[::-1].copy()).device()


def brute_extend(genome, read, p):
    """Longest exact match of read[p:...] somewhere in genome."""
    gs = "".join(map(str, genome))
    best = 0
    for e in range(p + 1, len(read) + 1):
        if gs.find("".join(map(str, read[p:e]))) >= 0:
            best = e - p
        else:
            break
    return best


def test_smem_extend_lengths(genome, fmi_rev, rng):
    L = 50
    B = 6
    reads = np.zeros((B, L), dtype=np.int32)
    for b in range(B):
        p = rng.integers(0, len(genome) - L)
        reads[b] = genome[p:p + L]
        # introduce a mismatch in the middle to split matches
        reads[b, 25] = (reads[b, 25] + 1) % 4
    lens = np.full(B, L, np.int32)
    ext, lo, hi = smem_extend_lengths(fmi_rev, jnp.asarray(reads), jnp.asarray(lens))
    ext = np.asarray(ext)
    for b in range(B):
        for p in [0, 10, 25, 26, 40]:
            want = brute_extend(genome, reads[b], p)
            assert ext[b, p] == want, f"b={b} p={p}: {ext[b,p]} != {want}"


def test_find_smems(genome, fmi_rev, rng):
    L = 60
    p = 3000
    read = genome[p:p + L].copy()
    read[30] = (read[30] + 1) % 4  # split into two long SMEMs
    sm = find_smems_batch(
        fmi_rev, jnp.asarray(read[None, :].astype(np.int32)),
        jnp.asarray([L], np.int32), min_len=19,
    )
    valid = np.asarray(sm.valid)[0]
    qbeg = np.asarray(sm.qbeg)[0][valid]
    qend = np.asarray(sm.qend)[0][valid]
    spans = sorted(zip(qbeg.tolist(), qend.tolist()))
    assert (0, 30) in spans       # left of the mismatch
    assert any(b == 31 and e == 60 for b, e in spans)  # right of the mismatch
    # located positions point at the true locus
    tpos = np.asarray(sm.tpos)[0]
    hv = np.asarray(sm.hit_valid)[0]
    for s in range(len(valid)):
        if valid[s] and hv[s, 0]:
            b_, e_ = int(np.asarray(sm.qbeg)[0][s]), int(np.asarray(sm.qend)[0][s])
            got = set(tpos[s][hv[s]].tolist())
            assert p + b_ in got


def test_mem_end_to_end(genome, rng):
    ref = Reference.from_records([("chrM", codes_to_string(genome, Alphabet.DNA))])
    params = MemParams(max_read_len=80, min_seed_len=15, max_dist=8)
    mapper = MemMapper.build(ref, params)
    B, L = 16, 80
    reads, truth, strands = [], [], []
    for i in range(B):
        p = int(rng.integers(0, len(genome) - L))
        r = genome[p:p + L].copy()
        # a few mismatches
        idx = rng.integers(0, L, size=2)
        r[idx] = (r[idx] + 1) % 4
        s = bool(i % 2)
        if s:
            r = reverse_complement_codes(r)
        reads.append(r)
        truth.append(p)
        strands.append(s)
    batch = ReadBatch(
        names=[f"m{i}" for i in range(B)],
        codes=np.stack(reads).astype(np.uint8),
        quals=np.full((B, L), 30, np.uint8),
        lengths=np.full(B, L, np.int32),
    )
    recs = mapper.map_batch(batch)
    ok = 0
    for rec, p, s in zip(recs, truth, strands):
        if not rec.flag & 0x4 and abs(rec.pos - 1 - p) <= 10 \
           and bool(rec.flag & 0x10) == s:
            ok += 1
    assert ok >= 0.85 * B


def test_mem_soft_clip(genome):
    """A read with garbage tail must come back soft-clipped (local mode)."""
    rng = np.random.default_rng(5)
    L = 80
    p = 4000
    r = genome[p:p + 60].copy()
    tail = rng.integers(0, 4, size=20).astype(np.uint8)
    read = np.concatenate([r, tail])
    ref = Reference.from_records([("chrM", codes_to_string(genome, Alphabet.DNA))])
    mapper = MemMapper.build(ref, MemParams(max_read_len=80, min_seed_len=15))
    batch = ReadBatch(
        names=["clip"], codes=read[None].astype(np.uint8),
        quals=np.full((1, L), 30, np.uint8), lengths=np.array([L], np.int32),
    )
    rec = mapper.map_batch(batch)[0]
    assert not rec.flag & 0x4
    assert rec.pos - 1 == p
    assert rec.cigar.endswith("S") and "60M" in rec.cigar


def test_mem_multichain_repeat(genome):
    """A read from a duplicated segment must report BOTH loci: primary +
    secondary record + XA tag (nvmem per-read chain lists + repeated
    align() passes, nvmem/pipeline.h:107-147, nvmem.cu:128-149)."""
    seg = genome[2000:2300]
    dup_genome = np.concatenate([genome[:6000], seg, genome[6000:]])
    ref = Reference.from_records(
        [("chrD", codes_to_string(dup_genome, Alphabet.DNA))])
    mapper = MemMapper.build(ref, MemParams(max_read_len=80, min_seed_len=15,
                                            max_chains=2))
    L = 80
    read = seg[100:180].copy()
    batch = ReadBatch(
        names=["dup"], codes=read[None].astype(np.uint8),
        quals=np.full((1, L), 30, np.uint8), lengths=np.array([L], np.int32),
    )
    recs = mapper.map_batch(batch)
    primary = [r for r in recs if not r.flag & 0x100]
    secondary = [r for r in recs if r.flag & 0x100]
    assert len(primary) == 1 and len(secondary) == 1
    want = {2000 + 100 + 1, 6000 + 100 + 1}
    assert {r.pos for r in recs} == want
    assert "XA" in primary[0].tags
    assert secondary[0].seq == "*"
    # unique-region reads still emit exactly one record
    read_u = dup_genome[500:580]
    batch_u = ReadBatch(
        names=["uniq"], codes=read_u[None].astype(np.uint8),
        quals=np.full((1, L), 30, np.uint8), lengths=np.array([L], np.int32),
    )
    recs_u = mapper.map_batch(batch_u)
    assert len(recs_u) == 1 and recs_u[0].pos == 501


def test_threshold_kmems(genome):
    """find_threshold_kmems: extension stops while occurrences stay >=
    min_intv, yielding shorter sub-SMEMs in repeat context
    (fmindex/mem.h:129-176)."""
    import jax.numpy as jnp

    from nvbio_tpu.fmi.index import build_fmindex
    from nvbio_tpu.fmi.mem import find_smems_batch, find_threshold_kmems_batch

    # duplicate a segment so sub-matches have occ >= 2 while the full
    # (unique-context) extension has occ == 1
    seg = genome[1000:1400]
    g = np.concatenate([genome, seg])
    fmi_rev = build_fmindex(g[::-1].copy()).device()
    L = 60
    read = g[1100:1100 + L].astype(np.int32)[None, :]
    lens = np.array([L], np.int32)

    sm1 = find_smems_batch(fmi_rev, jnp.asarray(read), jnp.asarray(lens),
                           min_len=15)
    km = find_threshold_kmems_batch(fmi_rev, jnp.asarray(read),
                                    jnp.asarray(lens), min_len=15,
                                    min_intv=2)
    # threshold matches must all keep >= 2 occurrences...
    occ = np.asarray(km.n_occ)[np.asarray(km.valid)]
    assert len(occ) and (occ >= 2).all()
    # ...and be no longer than the unconstrained maximal matches
    span1 = (np.asarray(sm1.qend) - np.asarray(sm1.qbeg))[np.asarray(sm1.valid)]
    spank = (np.asarray(km.qend) - np.asarray(km.qbeg))[np.asarray(km.valid)]
    assert spank.max() <= span1.max()
    # located hits land on both copies of the repeat
    tp = np.asarray(km.tpos)[np.asarray(km.hit_valid)]
    assert (tp < len(genome)).any() and (tp >= len(genome)).any()
