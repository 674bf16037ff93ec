"""End-to-end mapper tests on a synthetic genome (the fmmap/qmap-equivalent
milestone from SURVEY.md §7.6)."""

import io

import numpy as np
import pytest

from nvbio_tpu.alphabet import Alphabet, codes_to_string, reverse_complement_codes
from nvbio_tpu.bowtie import MapParams, ReadMapper
from nvbio_tpu.io.fastq import ReadBatch
from nvbio_tpu.io.reference import Reference
from nvbio_tpu.io.sam import SamWriter, read_sam


def make_genome(rng, n=20000):
    codes = rng.integers(0, 4, size=n, dtype=np.uint8)
    seq = codes_to_string(codes, Alphabet.DNA)
    return Reference.from_records([("chr_t", seq)]), codes


def sample_reads(rng, codes, n_reads=64, L=80, mut_rate=0.02, indel=False):
    n = len(codes)
    reads, positions, strands = [], [], []
    for i in range(n_reads):
        p = int(rng.integers(0, n - L))
        r = codes[p:p + L].copy()
        nmut = rng.binomial(L, mut_rate)
        if nmut:
            pos = rng.integers(0, L, size=nmut)
            r[pos] = (r[pos] + rng.integers(1, 4, size=nmut)) % 4
        strand = bool(rng.integers(0, 2))
        if strand:
            r = reverse_complement_codes(r)
        reads.append(r)
        positions.append(p)
        strands.append(strand)
    B = n_reads
    batch = ReadBatch(
        names=[f"read{i}" for i in range(B)],
        codes=np.stack(reads).astype(np.uint8),
        quals=np.full((B, L), 30, np.uint8),
        lengths=np.full(B, L, np.int32),
    )
    return batch, np.array(positions), np.array(strands)


@pytest.fixture(scope="module")
def mapper_and_genome():
    rng = np.random.default_rng(7)
    ref, codes = make_genome(rng)
    params = MapParams(max_read_len=80, seed_len=20, seed_stride=12,
                       hits_per_seed=4, max_dist=5)
    mapper = ReadMapper.build(ref, params)
    return mapper, ref, codes


def test_exact_reads_map_perfectly(mapper_and_genome, rng):
    mapper, ref, codes = mapper_and_genome
    batch, positions, strands = sample_reads(rng, codes, mut_rate=0.0)
    recs = mapper.map_batch(batch)
    assert len(recs) == len(batch)
    correct = 0
    for rec, p, s in zip(recs, positions, strands):
        assert not rec.flag & 0x4, f"{rec.qname} unmapped"
        assert rec.tags["AS"] == 0  # perfect end-to-end score
        assert rec.cigar == f"{len(rec.seq)}M"
        assert rec.tags["NM"] == 0
        if rec.pos - 1 == p and bool(rec.flag & 0x10) == bool(s):
            correct += 1
    assert correct >= 0.95 * len(recs)


def test_mutated_reads_map(mapper_and_genome, rng):
    mapper, ref, codes = mapper_and_genome
    batch, positions, strands = sample_reads(rng, codes, mut_rate=0.03)
    recs = mapper.map_batch(batch)
    correct = sum(
        1 for rec, p in zip(recs, positions)
        if not rec.flag & 0x4 and abs(rec.pos - 1 - p) <= 5
    )
    assert correct >= 0.9 * len(recs)


def test_indel_read(mapper_and_genome):
    mapper, ref, codes = mapper_and_genome
    L = 80
    p = 5000
    r = codes[p:p + L + 3].copy()
    r = np.delete(r, [40, 41, 42])  # 3bp deletion in the read
    batch = ReadBatch(
        names=["del3"],
        codes=r[None, :].astype(np.uint8),
        quals=np.full((1, L), 30, np.uint8),
        lengths=np.array([L], np.int32),
    )
    recs = mapper.map_batch(batch)
    rec = recs[0]
    assert not rec.flag & 0x4
    assert rec.pos - 1 == p
    assert "D" in rec.cigar and rec.cigar.count("D") == 1
    # 40M3D40M
    assert rec.cigar == "40M3D40M"


def _golden_md(seq_codes, cigar, genome, pos0):
    """Scalar MD/NM/XM/XO/XG recompute from SAM fields (samtools calmd
    semantics) — the oracle for the device-packed MD entries."""
    import re

    md_parts = []
    run = qi = nm = xm = xo = xg = 0
    gi = pos0
    for cnt, op in re.findall(r"(\d+)([MIDS])", cigar):
        cnt = int(cnt)
        if op == "M":
            for _ in range(cnt):
                if seq_codes[qi] == genome[gi]:
                    run += 1
                else:
                    md_parts.append(f"{run}{'ACGT'[genome[gi]]}")
                    run = 0
                    nm += 1
                    xm += 1
                qi += 1
                gi += 1
        elif op == "I":
            qi += cnt
            nm += cnt
            xo += 1
            xg += cnt
        elif op == "D":
            md_parts.append(
                f"{run}^" + "".join("ACGT"[genome[gi + j]] for j in range(cnt)))
            run = 0
            gi += cnt
            nm += cnt
            xo += 1
            xg += cnt
        else:  # S
            qi += cnt
    md_parts.append(str(run))
    return "".join(md_parts), nm, xm, xo, xg


def test_md_tags_match_golden(mapper_and_genome, rng):
    """MD/XM/XO/XG emitted by the mapper must equal a scalar recompute from
    (seq, CIGAR, reference) for mismatch-heavy reads."""
    from nvbio_tpu.alphabet import string_to_codes

    mapper, ref, codes = mapper_and_genome
    batch, positions, strands = sample_reads(rng, codes, n_reads=48,
                                             mut_rate=0.04)
    recs = mapper.map_batch(batch)
    checked = 0
    for rec in recs:
        if rec.flag & 0x4:
            continue
        seq_codes = string_to_codes(rec.seq)
        md, nm, xm, xo, xg = _golden_md(seq_codes, rec.cigar, codes,
                                        rec.pos - 1)
        assert rec.tags["MD"] == md, (rec.qname, rec.cigar, rec.tags["MD"], md)
        assert rec.tags["NM"] == nm
        assert (rec.tags["XM"], rec.tags["XO"], rec.tags["XG"]) == (xm, xo, xg)
        checked += 1
    assert checked >= 40


def test_md_with_indels(mapper_and_genome, rng):
    """MD must interleave deletions (^bases) and mismatches correctly."""
    from nvbio_tpu.alphabet import string_to_codes

    mapper, ref, codes = mapper_and_genome
    L = 80
    rows = []
    for i, p in enumerate((2000, 4000, 6000, 9000)):
        r = codes[p:p + L + 3].copy()
        r = np.delete(r, [37, 38, 39])     # 3bp deletion
        r[10] = (r[10] + 1) % 4            # plus a mismatch
        rows.append(r[:L])
    batch = ReadBatch(
        names=[f"mix{i}" for i in range(len(rows))],
        codes=np.stack(rows).astype(np.uint8),
        quals=np.full((len(rows), L), 30, np.uint8),
        lengths=np.full(len(rows), L, np.int32),
    )
    recs = mapper.map_batch(batch)
    for rec in recs:
        assert not rec.flag & 0x4
        assert "D" in rec.cigar
        assert "^" in rec.tags["MD"]
        seq_codes = string_to_codes(rec.seq)
        md, nm, xm, xo, xg = _golden_md(seq_codes, rec.cigar, codes,
                                        rec.pos - 1)
        assert rec.tags["MD"] == md, (rec.cigar, rec.tags["MD"], md)
        assert (rec.tags["NM"], rec.tags["XM"], rec.tags["XO"],
                rec.tags["XG"]) == (nm, xm, xo, xg)


def test_random_reads_unmapped(mapper_and_genome, rng):
    mapper, ref, codes = mapper_and_genome
    B, L = 16, 80
    batch = ReadBatch(
        names=[f"rnd{i}" for i in range(B)],
        codes=rng.integers(0, 4, size=(B, L)).astype(np.uint8),
        quals=np.full((B, L), 30, np.uint8),
        lengths=np.full(B, L, np.int32),
    )
    recs = mapper.map_batch(batch)
    unmapped = sum(1 for r in recs if r.flag & 0x4)
    assert unmapped >= 0.9 * B


def test_fmi_and_qgram_seeding_agree(mapper_and_genome, rng):
    """Both seeding indices must produce the same alignments on clean reads."""
    mapper_q, ref, codes = mapper_and_genome
    params_f = MapParams(max_read_len=80, seed_len=20, seed_stride=12,
                         hits_per_seed=4, max_dist=5, seeding="fmi")
    mapper_f = ReadMapper.build(ref, params_f)
    batch, positions, strands = sample_reads(rng, codes, n_reads=32, mut_rate=0.01)
    recs_q = mapper_q.map_batch(batch)
    recs_f = mapper_f.map_batch(batch)
    agree = sum(
        1 for a, b in zip(recs_q, recs_f)
        if (a.flag, a.pos, a.cigar, a.tags and a.tags.get("AS")) ==
           (b.flag, b.pos, b.cigar, b.tags and b.tags.get("AS"))
    )
    assert agree >= 0.9 * len(recs_q)


def test_sam_output_wellformed(mapper_and_genome, rng, tmp_path):
    mapper, ref, codes = mapper_and_genome
    batch, _, _ = sample_reads(rng, codes, n_reads=8)
    recs = mapper.map_batch(batch)
    path = str(tmp_path / "out.sam")
    with SamWriter(path, ref.names, [ref.total_length]) as w:
        for r in recs:
            w.write(r)
    header, rows = read_sam(path)
    assert any(h.startswith("@SQ") for h in header)
    assert len(rows) == 8
    for row in rows:
        assert len(row) >= 11
        flag = int(row[1])
        if not flag & 0x4:
            assert 1 <= int(row[3]) <= ref.total_length
            assert row[5] != "*"


def test_reseed_1mm_recovers_seed_dense_snps(rng):
    """Reads with a SNP inside EVERY exact seed-key window are unmappable in
    pass 1 but recovered by the reseed pass's 1-mismatch seeding
    (aligner_best_approx.h:206-282 + mapping.h:132-163 semantics)."""
    n = 20000
    codes = np.random.default_rng(99).integers(0, 4, size=n, dtype=np.uint8)
    ref = Reference.from_records([("chr_t", codes_to_string(codes))])
    L = 80
    # seed grid: starts 0,12,24,36,48,60 with q=12 keys -> key windows
    # [s, s+12); one SNP in each window kills every exact seed
    mut_at = [6, 18, 30, 42, 54, 66]
    B = 24
    reads = []
    positions = []
    g2 = np.random.default_rng(7)
    for i in range(B):
        p = int(g2.integers(0, n - L))
        r = codes[p:p + L].copy()
        for m in mut_at:
            r[m] = (r[m] + 1 + g2.integers(0, 3)) % 4
        reads.append(r)
        positions.append(p)
    batch = ReadBatch(
        names=[f"s{i}" for i in range(B)],
        codes=np.stack(reads).astype(np.uint8),
        quals=np.full((B, L), 30, np.uint8),
        lengths=np.full(B, L, np.int32),
    )
    common = dict(max_read_len=L, seed_len=20, seed_stride=12,
                  hits_per_seed=4, max_dist=5)
    m0 = ReadMapper.build(ref, MapParams(max_reseed=0, **common))
    m1 = ReadMapper.build(ref, MapParams(max_reseed=1, seeding_1mm=True,
                                         reseed_frac=1.0, **common),
                          index=m0.index)
    mcap = ReadMapper.build(ref, MapParams(max_reseed=1, seeding_1mm=True,
                                           reseed_frac=0.25, **common),
                            index=m0.index)
    recs0 = m0.map_batch(batch)
    recs1 = m1.map_batch(batch)
    recsc = mcap.map_batch(batch)
    mapped0 = sum(1 for r in recs0 if not r.flag & 0x4)
    good1 = sum(1 for r, p in zip(recs1, positions)
                if not r.flag & 0x4 and abs(r.pos - 1 - p) <= 5)
    mappedc = sum(1 for r in recsc if not r.flag & 0x4)
    assert mapped0 <= B // 4, f"exact seeding unexpectedly mapped {mapped0}"
    assert good1 >= 0.85 * B, f"reseed+1mm recovered only {good1}/{B}"
    # capacity-bounded reseed queue: frac=0.25 of B=24 -> 8 slots per pass,
    # so at most mapped0 + 8 reads can be aligned after one pass
    assert mappedc <= mapped0 + 8


def test_all_mapping_mode(tmp_path):
    """align_batch_all reports every above-threshold locus (aligner_all.h)."""
    import numpy as np

    from nvbio_tpu.alphabet import codes_to_string
    from nvbio_tpu.bowtie.params import MapParams
    from nvbio_tpu.bowtie.pipeline import ReadMapper
    from nvbio_tpu.io.fastq import batch_from_records
    from nvbio_tpu.io.reference import Reference

    rng = np.random.default_rng(31)
    seg = codes_to_string(rng.integers(0, 4, 300, np.uint8))
    filler1 = codes_to_string(rng.integers(0, 4, 500, np.uint8))
    filler2 = codes_to_string(rng.integers(0, 4, 500, np.uint8))
    # the segment appears twice -> reads from it must map to both loci
    genome = filler1 + seg + filler2 + seg
    ref = Reference.from_records([("c1", genome)])
    params = MapParams(max_read_len=60, seed_len=16, seed_stride=10,
                       hits_per_seed=4, max_dist=4, qgram_q=10)
    mapper = ReadMapper.build(ref, params)

    recs = [("dup", seg[100:160], "I" * 60),
            ("uniq", filler1[100:160], "I" * 60)]
    batch = batch_from_records(recs, 60)
    out = mapper.map_batch_all(batch)
    by_name = {}
    for r in out:
        by_name.setdefault(r.qname, []).append(r)
    dup = by_name["dup"]
    assert len(dup) == 2
    primary = [r for r in dup if not r.flag & 0x100]
    secondary = [r for r in dup if r.flag & 0x100]
    assert len(primary) == 1 and len(secondary) == 1
    want = {500 + 100 + 1, 500 + 300 + 500 + 100 + 1}
    assert {r.pos for r in dup} == want
    assert secondary[0].seq == "*"  # SAM: secondary omits seq/qual
    assert primary[0].cigar == "60M"
    uniq = by_name["uniq"]
    assert len(uniq) == 1 and uniq[0].pos == 101


def test_edit_distance_mode():
    """--ed preset: unit-cost scoring maps clean and 1-indel reads."""
    import numpy as np

    from nvbio_tpu.alphabet import codes_to_string
    from nvbio_tpu.bowtie.params import MapParams
    from nvbio_tpu.bowtie.pipeline import ReadMapper
    from nvbio_tpu.io.fastq import batch_from_records
    from nvbio_tpu.io.reference import Reference

    rng = np.random.default_rng(41)
    genome = codes_to_string(rng.integers(0, 4, 8000, np.uint8))
    ref = Reference.from_records([("c1", genome)])
    params = MapParams.edit_distance(
        max_read_len=60, seed_len=16, seed_stride=10, hits_per_seed=4,
        max_dist=4, qgram_q=10)
    mapper = ReadMapper.build(ref, params)

    r_clean = genome[100:160]
    r_del = genome[700:725] + genome[726:761]  # one deletion
    r_bad = codes_to_string(rng.integers(0, 4, 60, np.uint8))  # random
    out = mapper.map_batch(batch_from_records(
        [("clean", r_clean, "I" * 60), ("del", r_del, "I" * 60),
         ("bad", r_bad, "I" * 60)], 60))
    by = {r.qname: r for r in out}
    assert not by["clean"].flag & 0x4 and by["clean"].pos == 101
    assert by["clean"].tags["AS"] == 0 and by["clean"].tags["NM"] == 0
    assert not by["del"].flag & 0x4 and by["del"].pos == 701
    assert by["del"].tags["AS"] == -1 and by["del"].tags["NM"] == 1
    assert "D" in by["del"].cigar
    assert by["bad"].flag & 0x4  # exceeds max_dist edits


def test_local_mode_soft_clips(mapper_and_genome):
    """--local: garbage read ends come back soft-clipped with local scoring
    and the local MAPQ branch (params.cpp:113-158, mapq.h:267+)."""
    mapper, ref, codes = mapper_and_genome
    rngl = np.random.default_rng(17)
    L = 80
    rows, clips = [], []
    for i, p in enumerate((3000, 8000, 12000, 17000)):
        head = rngl.integers(0, 4, size=12).astype(np.uint8)
        core = codes[p:p + L - 12].copy()
        rows.append(np.concatenate([head, core]))
        clips.append(12)
    batch = ReadBatch(
        names=[f"loc{i}" for i in range(len(rows))],
        codes=np.stack(rows).astype(np.uint8),
        quals=np.full((len(rows), L), 30, np.uint8),
        lengths=np.full(len(rows), L, np.int32),
    )
    params = MapParams.local(max_read_len=L, seed_len=20, seed_stride=12,
                             hits_per_seed=4, max_dist=5)
    lm = ReadMapper.build(ref, params, index=mapper.index)
    recs = lm.map_batch(batch)
    ok = 0
    for rec, p in zip(recs, (3000, 8000, 12000, 17000)):
        if rec.flag & 0x4:
            continue
        assert "S" in rec.cigar, rec.cigar
        assert rec.mapq > 0
        assert rec.tags["AS"] > 0       # local scores are positive
        if abs(rec.pos - 1 - p) <= 5 and rec.cigar.startswith("12S"):
            ok += 1
    assert ok >= 3, [r.cigar for r in recs]


def test_n_handling(rng):
    """N semantics (alphabet.h:68-76): genome N runs attract no seed hits
    (a poly-A read must NOT map into a folded N stretch), read Ns score as
    mismatches, and N-saturated reads are unmapped."""
    from nvbio_tpu.alphabet import string_to_codes

    g = np.random.default_rng(55)
    codes = g.integers(0, 4, size=40000, dtype=np.uint8)
    seq = codes_to_string(codes)
    seq = seq[:10000] + "N" * 300 + seq[10300:]     # N run
    ref = Reference.from_records([("chrN", seq)])
    params = MapParams(max_read_len=80, seed_len=20, seed_stride=12,
                       hits_per_seed=4, max_dist=5, max_reseed=0)
    mapper = ReadMapper.build(ref, params)

    L = 80
    p = 22000
    r_n = codes[p:p + L].copy().astype(np.uint8)
    n_read = r_n.copy()
    n_read[[25, 50]] = 4                            # two read Ns (DNA_N)
    rows = [
        np.zeros(L, np.uint8),                      # poly-A: N-run bait
        np.full(L, 4, np.uint8),                    # all-N read
        n_read,                                     # few-N read
        r_n,                                        # clean control
    ]
    batch = ReadBatch(
        names=["polyA", "allN", "fewN", "ctrl"],
        codes=np.stack(rows),
        quals=np.full((len(rows), L), 30, np.uint8),
        lengths=np.full(len(rows), L, np.int32),
    )
    recs = {r.qname: r for r in mapper.map_batch(batch)}
    # poly-A must not land inside the N run [10000, 10300)
    if not recs["polyA"].flag & 0x4:
        assert not (10000 - L <= recs["polyA"].pos - 1 < 10300), \
            recs["polyA"].pos
    assert recs["allN"].flag & 0x4
    assert not recs["ctrl"].flag & 0x4 and recs["ctrl"].pos - 1 == p
    few = recs["fewN"]
    assert not few.flag & 0x4 and few.pos - 1 == p
    assert few.tags["NM"] == 2 and few.tags["XM"] == 2
    assert "N" in few.seq
    seq_codes = string_to_codes(few.seq, Alphabet.DNA_N)
    md, nm, xm, xo, xg = _golden_md(seq_codes, few.cigar, codes, few.pos - 1)
    assert few.tags["MD"] == md


def test_reseed_1mm_fmi_seeding(rng):
    """FM-seeding reseed pass uses search_1mm (approximate hybrid seeding,
    mapping.h:132-163) — seed-dense SNP reads recovered like the q-gram
    path."""
    n = 20000
    codes = np.random.default_rng(99).integers(0, 4, size=n, dtype=np.uint8)
    ref = Reference.from_records([("chr_t", codes_to_string(codes))])
    L = 80
    # FM seeds span the full 20bp window; stride 20 makes windows disjoint
    # on BOTH the pass-1 grid (0,20,40,60) and the reseed phase-10 grid
    # (10,30,50): center-zone mutations give every seed exactly one SNP
    # (1mm-recoverable, exact-unmappable)
    mut_at = [15, 35, 55, 75]
    B = 8
    g2 = np.random.default_rng(7)
    rows, positions = [], []
    for i in range(B):
        p = int(g2.integers(0, n - L))
        r = codes[p:p + L].copy()
        for m in mut_at:
            r[m] = (r[m] + 1 + g2.integers(0, 3)) % 4
        rows.append(r)
        positions.append(p)
    batch = ReadBatch(
        names=[f"f{i}" for i in range(B)],
        codes=np.stack(rows).astype(np.uint8),
        quals=np.full((B, L), 30, np.uint8),
        lengths=np.full(B, L, np.int32),
    )
    # seed KEY here is the full 20-mer (FM searches the whole seed), and
    # every seed window carries a SNP -> pass 1 finds nothing
    common = dict(max_read_len=L, seed_len=20, seed_stride=20,
                  hits_per_seed=4, max_dist=5, seeding="fmi")
    m0 = ReadMapper.build(ref, MapParams(max_reseed=0, **common))
    m1 = ReadMapper.build(ref, MapParams(max_reseed=1, seeding_1mm=True,
                                         reseed_frac=1.0, **common),
                          index=m0.index)
    mapped0 = sum(1 for r in m0.map_batch(batch) if not r.flag & 0x4)
    good1 = sum(1 for r, p in zip(m1.map_batch(batch), positions)
                if not r.flag & 0x4 and abs(r.pos - 1 - p) <= 5)
    assert mapped0 <= 2, mapped0
    assert good1 >= 1, good1


def test_randomized_select_mode(mapper_and_genome, rng):
    """select_mode="randomized" (SumTree-CDF hit sampling, select.h:52-80)
    maps clean reads to truth on both seeding backends; results are
    deterministic (fixed fold_in key per seed phase)."""
    _, ref, codes = mapper_and_genome
    batch, positions, strands = sample_reads(rng, codes, mut_rate=0.0)
    for seeding in ("qgram", "fmi"):
        params = MapParams(max_read_len=80, seed_len=20, seed_stride=12,
                           hits_per_seed=4, max_dist=5, seeding=seeding,
                           select_mode="randomized")
        m = ReadMapper.build(ref, params)
        recs = m.map_batch(batch)
        correct = sum(
            1 for rec, p, s in zip(recs, positions, strands)
            if not rec.flag & 0x4 and rec.pos - 1 == p
            and bool(rec.flag & 0x10) == bool(s))
        assert correct >= 0.9 * len(recs), (seeding, correct)
        recs2 = m.map_batch(batch)
        assert [(r.pos, r.flag) for r in recs] == \
            [(r.pos, r.flag) for r in recs2]


def test_auto_seed_interval():
    """seed_stride=0 derives bowtie2's -i S,1,1.15 interval function of the
    read length (params.h:93-164 seed_freq)."""
    import math

    for L in (50, 100, 250, 512):
        p = MapParams(max_read_len=L, seed_stride=0)
        assert p.seed_stride == math.ceil(1.0 + 1.15 * math.sqrt(L))
    assert MapParams(max_read_len=100, seed_stride=15).seed_stride == 15


def test_whole_read_exact_pass0(rng):
    """Pass-0 whole-read exact search (aligner_best_approx.h:162-166)
    recovers reads whose every seed lands in a busy repeat bucket."""
    n = 20000
    codes = rng.integers(0, 4, size=n, dtype=np.uint8)
    M = rng.integers(0, 4, size=22, dtype=np.uint8)   # repeated seed motif
    X = rng.integers(0, 4, size=22, dtype=np.uint8)   # repeated 2nd motif
    spots = np.arange(40) * 480 + 100
    for i, s in enumerate(spots):
        codes[s:s + 22] = M
        codes[s + 240:s + 262] = X
    Q = 19400
    codes[Q:Q + 22] = M
    codes[Q + 22:Q + 44] = X  # the ONLY M+X adjacency = the true locus
    ref = Reference.from_records([("chr_t", codes_to_string(codes))])
    batch = ReadBatch(
        names=["r0"], codes=codes[Q:Q + 44][None, :].copy(),
        quals=np.full((1, 44), 30, np.uint8),
        lengths=np.array([44], np.int32))
    common = dict(max_read_len=44, seed_len=22, seed_stride=22,
                  hits_per_seed=1, max_dist=5, seeding="fmi", max_reseed=0)
    m_off = ReadMapper.build(ref, MapParams(whole_read_exact=False, **common))
    m_on = ReadMapper.build(ref, MapParams(whole_read_exact=True, **common),
                            index=m_off.index)
    rec_off = m_off.map_batch(batch)[0]
    rec_on = m_on.map_batch(batch)[0]
    assert rec_off.flag & 0x4 or rec_off.pos - 1 != Q  # selection missed it
    assert not rec_on.flag & 0x4
    assert rec_on.pos - 1 == Q and rec_on.tags["AS"] == 0
