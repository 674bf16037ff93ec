"""Paired-end pipeline tests: concordant pairing, rescue, PE SAM flags."""

import numpy as np
import pytest

from nvbio_tpu.alphabet import Alphabet, codes_to_string, reverse_complement_codes
from nvbio_tpu.bowtie import MapParams, ReadMapper
from nvbio_tpu.bowtie.paired import map_pair_batch
from nvbio_tpu.io.fastq import ReadBatch
from nvbio_tpu.io.reference import Reference


def make_pairs(rng, codes, n_pairs=24, L=70, frag_lo=150, frag_hi=400,
               mut_rate=0.01, drop_mate2_seeds=False):
    """FR pairs: mate1 fwd at p, mate2 = RC of genome[p+frag-L : p+frag]."""
    n = len(codes)
    m1, m2, pos1, pos2 = [], [], [], []
    for i in range(n_pairs):
        frag = int(rng.integers(frag_lo, frag_hi))
        p = int(rng.integers(0, n - frag - 1))
        r1 = codes[p:p + L].copy()
        p2 = p + frag - L
        r2 = reverse_complement_codes(codes[p2:p2 + L]).copy()
        for r in (r1, r2):
            nm = rng.binomial(L, mut_rate)
            if nm:
                ppos = rng.integers(0, L, size=nm)
                r[ppos] = (r[ppos] + rng.integers(1, 4, size=nm)) % 4
        if drop_mate2_seeds:
            # mutate heavily so mate2 has no exact seeds (forces rescue)
            step = 9
            idx = np.arange(0, L, step)
            r2[idx] = (r2[idx] + 1) % 4
        m1.append(r1)
        m2.append(r2)
        pos1.append(p)
        pos2.append(p2)

    def mk(reads):
        return ReadBatch(
            names=[f"pair{i}" for i in range(n_pairs)],
            codes=np.stack(reads).astype(np.uint8),
            quals=np.full((n_pairs, L), 30, np.uint8),
            lengths=np.full(n_pairs, L, np.int32),
        )

    return mk(m1), mk(m2), np.array(pos1), np.array(pos2)


@pytest.fixture(scope="module")
def pe_setup():
    rng = np.random.default_rng(11)
    codes = rng.integers(0, 4, size=30000, dtype=np.uint8)
    ref = Reference.from_records([("chrP", codes_to_string(codes, Alphabet.DNA))])
    params = MapParams(max_read_len=70, seed_len=18, seed_stride=12,
                       hits_per_seed=4, max_dist=5, maxins=450)
    mapper = ReadMapper.build(ref, params)
    return mapper, codes


def test_concordant_pairs(pe_setup, rng):
    mapper, codes = pe_setup
    b1, b2, pos1, pos2 = make_pairs(rng, codes)
    recs = map_pair_batch(mapper, b1, b2)
    assert len(recs) == 2 * len(b1)
    n_proper = n_correct = 0
    for i in range(len(b1)):
        r1, r2 = recs[2 * i], recs[2 * i + 1]
        assert r1.flag & 0x1 and r1.flag & 0x40
        assert r2.flag & 0x1 and r2.flag & 0x80
        if r1.flag & 0x2:
            n_proper += 1
            # FR: mate1 fwd, mate2 rev
            assert not r1.flag & 0x10 and r2.flag & 0x10
            assert r1.flag & 0x20 and not r2.flag & 0x20
            if abs(r1.pos - 1 - pos1[i]) <= 3 and abs(r2.pos - 1 - pos2[i]) <= 3:
                n_correct += 1
            # TLEN symmetric
            assert r1.tlen == -r2.tlen and r1.tlen > 0
            assert r1.rnext == "=" and r2.rnext == "="
    assert n_proper >= 0.9 * len(b1)
    assert n_correct >= 0.9 * n_proper


def test_mate_rescue(pe_setup, rng):
    mapper, codes = pe_setup
    b1, b2, pos1, pos2 = make_pairs(rng, codes, n_pairs=12, mut_rate=0.0,
                                    drop_mate2_seeds=True)
    recs = map_pair_batch(mapper, b1, b2)
    rescued_correct = 0
    for i in range(12):
        r2 = recs[2 * i + 1]
        if not r2.flag & 0x4 and abs(r2.pos - 1 - pos2[i]) <= 5:
            rescued_correct += 1
    # heavily mutated mate2 (every 9th base) has no exact 18-mer seeds;
    # rescue must recover most of them from the mate1 anchor
    assert rescued_correct >= 8


def test_half_mapped_pair(pe_setup, rng):
    mapper, codes = pe_setup
    L = 70
    b1, b2, pos1, pos2 = make_pairs(rng, codes, n_pairs=4, mut_rate=0.0)
    # mate2 = random garbage
    b2.codes[:] = rng.integers(0, 4, size=b2.codes.shape)
    recs = map_pair_batch(mapper, b1, b2)
    for i in range(4):
        r1, r2 = recs[2 * i], recs[2 * i + 1]
        assert not r1.flag & 0x4  # mate1 still maps
        if r2.flag & 0x4:
            assert r1.flag & 0x8  # mate-unmapped set on mate1


def test_discordant_pairs(pe_setup, rng):
    """Both mates unique but fragment far beyond maxins -> discordant
    classification (mark_discordant, aligner_best_approx_paired.h:280-286):
    mapped, not PROPER, YT:Z:DP."""
    mapper, codes = pe_setup
    b1, b2, pos1, pos2 = make_pairs(rng, codes, n_pairs=8, mut_rate=0.0,
                                    frag_lo=5000, frag_hi=9000)
    recs = map_pair_batch(mapper, b1, b2)
    n_disc = 0
    for i in range(8):
        r1, r2 = recs[2 * i], recs[2 * i + 1]
        if r1.flag & 0x4 or r2.flag & 0x4:
            continue
        assert not r1.flag & 0x2 and not r2.flag & 0x2
        if r1.tags["YT"] == "DP":
            assert r2.tags["YT"] == "DP"
            n_disc += 1
    assert n_disc >= 6


def test_pe_policy_rf_and_ff(rng):
    """--rf and --ff orientation policies classify their own geometry as
    proper and reject FR geometry (params.h:115 pe policies)."""
    codes = np.random.default_rng(21).integers(0, 4, size=30000, dtype=np.uint8)
    ref = Reference.from_records([("chrP", codes_to_string(codes, Alphabet.DNA))])
    L = 70
    n_pairs = 8
    rngl = np.random.default_rng(5)

    def build(style):
        m1, m2 = [], []
        for i in range(n_pairs):
            frag = int(rngl.integers(150, 400))
            p = int(rngl.integers(0, len(codes) - frag - 1))
            up = codes[p:p + L].copy()
            down = codes[p + frag - L:p + frag].copy()
            if style == "rf":     # upstream mate reversed, downstream fwd
                m1.append(reverse_complement_codes(up))
                m2.append(down)
            elif style == "ff":   # both forward
                m1.append(up)
                m2.append(down)
        def mk(rows):
            return ReadBatch(
                names=[f"p{i}" for i in range(n_pairs)],
                codes=np.stack(rows).astype(np.uint8),
                quals=np.full((n_pairs, L), 30, np.uint8),
                lengths=np.full(n_pairs, L, np.int32),
            )
        return mk(m1), mk(m2)

    common = dict(max_read_len=L, seed_len=18, seed_stride=12,
                  hits_per_seed=4, max_dist=5, maxins=450)
    m_fr = ReadMapper.build(ref, MapParams(pe_policy="fr", **common))
    m_rf = ReadMapper.build(ref, MapParams(pe_policy="rf", **common),
                            index=m_fr.index)
    m_ff = ReadMapper.build(ref, MapParams(pe_policy="ff", **common),
                            index=m_fr.index)

    for style, right, wrong in (("rf", m_rf, m_fr), ("ff", m_ff, m_fr)):
        b1, b2 = build(style)
        rr = map_pair_batch(right, b1, b2)
        rw = map_pair_batch(wrong, b1, b2)
        proper_right = sum(1 for r in rr[::2] if r.flag & 0x2)
        proper_wrong = sum(1 for r in rw[::2] if r.flag & 0x2)
        assert proper_right >= 0.75 * n_pairs, (style, proper_right)
        assert proper_wrong <= n_pairs // 4, (style, proper_wrong)


def test_pe_all_mapping_duplicated_locus(rng):
    """PE all-mapping (aligner_all paired analogue): a pair from a
    duplicated segment reports BOTH concordant pair loci (primary +
    secondary pair records)."""
    from nvbio_tpu.bowtie.paired import map_pair_batch_all

    g = np.random.default_rng(77)
    base = g.integers(0, 4, size=20000, dtype=np.uint8)
    seg = base[3000:3600]                       # 600bp segment
    genome = np.concatenate([base, seg])        # duplicated at 20000
    ref = Reference.from_records(
        [("chrA", codes_to_string(genome, Alphabet.DNA))])
    params = MapParams(max_read_len=70, seed_len=18, seed_stride=12,
                       hits_per_seed=4, max_dist=5, maxins=450)
    mapper = ReadMapper.build(ref, params)

    L, frag = 70, 300
    m1 = seg[100:100 + L]
    m2 = reverse_complement_codes(seg[100 + frag - L:100 + frag])

    def mk(r):
        return ReadBatch(names=["dp"], codes=r[None].astype(np.uint8),
                         quals=np.full((1, L), 30, np.uint8),
                         lengths=np.array([L], np.int32))

    recs = map_pair_batch_all(mapper, mk(m1), mk(np.asarray(m2)))
    primary = [r for r in recs if not r.flag & 0x100]
    secondary = [r for r in recs if r.flag & 0x100]
    assert len(primary) == 2 and len(secondary) == 2     # both mates, 2 loci
    pos1 = sorted(r.pos - 1 for r in recs if r.flag & 0x40)
    assert abs(pos1[0] - 3100) <= 5 and abs(pos1[1] - (20000 + 100)) <= 5
    for r in recs:
        assert r.flag & 0x2 and r.tags["YT"] == "CP"
