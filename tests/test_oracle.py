"""Conformance vs the independent Bowtie2-semantics oracle.

Unlike tests/test_conformance.py (recorded-output pins), these checks are
computed from first principles by tests/bt2_oracle.py — an exhaustive
numpy DP over the whole genome plus scalar models of Bowtie2's score-min,
MAPQ V2, MD/NM, and paired-end geometry, sharing no code with the mapper.
The suite fails if the pipeline and the independent model disagree on any
checked field (the in-repo analogue of the reference's external agreement
validation, ``nvBowtie/nvBowtie.dox:40-50``).
"""

from __future__ import annotations

import numpy as np
import pytest

from tests import bt2_oracle as oracle
from tests.conformance_data import L, build_dataset

REF_SPAN_OPS = frozenset("MD=X")


def _ref_span(cigar: str) -> int:
    return sum(int(n) for n, op in oracle._CIG_RE.findall(cigar)
               if op in REF_SPAN_OPS)


def _check_se_record(rec, codes, genome_str, genome_codes, *, mode="end-to-end",
                     match_bonus=0, min_s=None):
    """Full independent validation of one primary SE record."""
    if min_s is None:
        min_s = oracle.score_min(len(codes))
    opt = oracle.best_alignments(genome_codes, codes,
                                 np.full(len(codes), 30),
                                 mode=mode, match_bonus=match_bonus)
    if rec.flag & 0x4:
        assert opt["best"] < min_s, (
            f"{rec.qname}: reported unmapped but an alignment scoring "
            f"{opt['best']} >= {min_s} exists")
        return
    assert opt["best"] >= min_s, (
        f"{rec.qname}: mapped with no above-threshold alignment "
        f"(exhaustive best {opt['best']} < {min_s})")

    # AS must equal the exhaustive optimum
    as_tag = rec.tags["AS"]
    assert as_tag == opt["best"], (
        f"{rec.qname}: AS={as_tag} but exhaustive optimum is {opt['best']}")

    # the reported alignment must re-score to exactly AS, and the NM/MD
    # tags must match a from-the-genome recomputation
    score, nm, md, _ = oracle.rescore_record(genome_str, rec,
                                             match_bonus=match_bonus)
    assert score == as_tag, (
        f"{rec.qname}: CIGAR {rec.cigar} at pos {rec.pos} re-scores to "
        f"{score}, record claims AS={as_tag}")
    if "NM" in (rec.tags or {}):
        assert rec.tags["NM"] == nm, (rec.qname, rec.tags["NM"], nm)
    if "MD" in (rec.tags or {}):
        assert rec.tags["MD"] == md, (rec.qname, rec.tags["MD"], md)

    # strand flag consistent with the exhaustive optimum's strand unless
    # both strands tie
    if opt["best"] > opt["second"]:
        assert bool(rec.flag & 0x10) == bool(opt["strand"]), rec.qname

    # MAPQ from the scalar V2 model fed with the exhaustive second-best
    has2 = opt["second"] >= min_s
    max_s = match_bonus * len(codes)
    want_q = oracle.mapq_v2(opt["best"], opt["second"], has2, min_s, max_s)
    if mode == "end-to-end":
        assert rec.mapq == want_q, (
            f"{rec.qname}: MAPQ={rec.mapq}, independent model says {want_q} "
            f"(best={opt['best']} second={opt['second']} has2={has2})")
    if has2 and "XS" in (rec.tags or {}):
        assert rec.tags["XS"] == opt["second"], (
            rec.qname, rec.tags["XS"], opt["second"])


@pytest.fixture(scope="module")
def mapped_se():
    from nvbio_tpu.alphabet import codes_to_string
    from nvbio_tpu.bowtie import MapParams, ReadMapper

    ref, se, _m1, _m2 = build_dataset()
    params = MapParams(max_read_len=L)
    mapper = ReadMapper.build(ref, params)
    recs = mapper.map_batch(se)
    genome_codes = np.asarray(ref.codes)
    return ref, se, recs, codes_to_string(genome_codes), genome_codes


def test_se_against_oracle(mapped_se):
    ref, se, recs, gstr, gcodes = mapped_se
    by_name = {n: se.codes[i] for i, n in enumerate(se.names)}
    primaries = [r for r in recs if not (r.flag & 0x100)]
    assert len(primaries) == len(se.names)
    for rec in primaries:
        _check_se_record(rec, by_name[rec.qname], gstr, gcodes)


def test_randomized_reads_against_oracle(mapped_se):
    """Fresh randomized reads (mismatches, indels, strand flips at random
    positions — a different generator than the pinned dataset) through the
    default mapper, every record independently validated."""
    from nvbio_tpu.bowtie import MapParams, ReadMapper
    from nvbio_tpu.io.fastq import ReadBatch

    ref, _se, _recs, gstr, gcodes = mapped_se
    rng = np.random.default_rng(20260817)
    n = len(gcodes)
    rows, names = [], []
    for i in range(24):
        p = int(rng.integers(0, n - L - 4))
        r = gcodes[p:p + L + 4].astype(np.uint8).copy()
        kind = i % 4
        if kind == 0:          # 0-3 random mismatches
            for j in rng.integers(0, L, size=int(rng.integers(0, 4))):
                r[j] = (r[j] + int(rng.integers(1, 4))) % 4
        elif kind == 1:        # deletion of 1-2 bases
            d = int(rng.integers(1, 3))
            at = int(rng.integers(10, L - 10))
            r = np.delete(r, np.arange(at, at + d))
        elif kind == 2:        # insertion of 1-2 foreign bases
            g = int(rng.integers(1, 3))
            at = int(rng.integers(10, L - 10))
            r = np.insert(r, at, (r[at:at + g] + 2) % 4)
        else:                  # clean, maybe reverse-complemented
            pass
        r = r[:L]
        if rng.random() < 0.5:
            r = oracle.revcomp_codes(r).astype(np.uint8)
        rows.append(r)
        names.append(f"rnd{i}")

    batch = ReadBatch(
        names=names, codes=np.stack(rows),
        quals=np.full((len(rows), L), 30, np.uint8),
        lengths=np.full(len(rows), L, np.int32))
    mapper = ReadMapper.build(ref, MapParams(max_read_len=L))
    recs = [r for r in mapper.map_batch(batch) if not (r.flag & 0x100)]
    for rec, codes in zip(recs, rows):
        _check_se_record(rec, codes, gstr, gcodes)


def test_pe_against_oracle(mapped_se):
    """PE cross-field consistency: flags, RNEXT/PNEXT, TLEN, YT classes,
    and fr-policy proper-pair geometry, all from the oracle's models."""
    from nvbio_tpu.bowtie import MapParams, ReadMapper
    from nvbio_tpu.bowtie.paired import map_pair_batch

    ref, _se, _r, gstr, gcodes = mapped_se
    _ref2, _se2, m1, m2 = build_dataset()
    params = MapParams(max_read_len=L)
    mapper = ReadMapper.build(ref, params)
    recs = map_pair_batch(mapper, m1, m2)
    pairs = {}
    for r in recs:
        if r.flag & 0x100:
            continue
        pairs.setdefault(r.qname, []).append(r)

    for name, rs in pairs.items():
        assert len(rs) == 2, name
        r1 = next(r for r in rs if r.flag & 0x40)
        r2 = next(r for r in rs if r.flag & 0x80)
        for r in (r1, r2):
            assert r.flag & 0x1, name
        both_mapped = not ((r1.flag | r2.flag) & 0x4)
        if not both_mapped:
            continue
        # mate cross-fields
        for a, b in ((r1, r2), (r2, r1)):
            assert bool(a.flag & 0x20) == bool(b.flag & 0x10), name
            assert a.rnext in ("=", b.rname), name
            assert a.pnext == b.pos, name
        end1 = r1.pos + _ref_span(r1.cigar) - 1
        end2 = r2.pos + _ref_span(r2.cigar) - 1
        t1, t2 = oracle.expect_tlen(r1.pos, end1, r2.pos, end2)
        assert (r1.tlen, r2.tlen) == (t1, t2), (name, r1.tlen, r2.tlen, t1)
        # fr-policy concordance from the records' geometry
        fwd, rev = (r1, r2) if not (r1.flag & 0x10) else (r2, r1)
        assert not (fwd.flag & 0x10) and (rev.flag & 0x10), (
            name, "proper/discordant pairs in this dataset are FR")
        proper = oracle.is_proper_fr(
            fwd.pos, fwd.pos + _ref_span(fwd.cigar) - 1,
            rev.pos, rev.pos + _ref_span(rev.cigar) - 1,
            params.minins, params.maxins)
        want_yt = "CP" if proper else "DP"
        assert r1.tags["YT"] == want_yt, (name, r1.tags["YT"], want_yt)
        assert bool(r1.flag & 0x2) == proper, name
        # per-mate alignments must still be exhaustively optimal
        codes1 = m1.codes[m1.names.index(name)]
        codes2 = m2.codes[m2.names.index(name)]
        for rec, codes in ((r1, codes1), (r2, codes2)):
            score, nm, md, _ = oracle.rescore_record(gstr, rec)
            assert score == rec.tags["AS"], (name, score, rec.tags["AS"])
            opt = oracle.best_alignments(gcodes, codes, np.full(L, 30))
            assert rec.tags["AS"] == opt["best"], (
                name, rec.tags["AS"], opt["best"])
            if "NM" in rec.tags:
                assert rec.tags["NM"] == nm, (name, rec.tags["NM"], nm)
            if "MD" in rec.tags:
                assert rec.tags["MD"] == md, (name, rec.tags["MD"], md)


def test_local_mode_against_oracle(mapped_se):
    """Local mode: AS must equal the exhaustive Smith-Waterman optimum
    (match +2, clips free), and the soft-clipped record must re-score to
    AS with the local scoring."""
    from nvbio_tpu.bowtie import MapParams, ReadMapper
    from nvbio_tpu.io.fastq import ReadBatch

    ref, _se, _r, gstr, gcodes = mapped_se
    rng = np.random.default_rng(7)
    n = len(gcodes)
    rows, names = [], []
    for i in range(8):
        p = 5000 + 11000 * i
        r = gcodes[p:p + L].astype(np.uint8).copy()
        if i % 2:              # corrupt a read end: local mode should clip
            r[:8] = rng.integers(0, 4, 8)
        if i in (2, 3):
            r[60] = (r[60] + 1) % 4
        rows.append(r)
        names.append(f"loc{i}")
    batch = ReadBatch(
        names=names, codes=np.stack(rows),
        quals=np.full((len(rows), L), 30, np.uint8),
        lengths=np.full(len(rows), L, np.int32))
    params = MapParams.local(max_read_len=L)
    mapper = ReadMapper.build(ref, params)
    recs = [r for r in mapper.map_batch(batch) if not (r.flag & 0x100)]
    min_s = oracle.score_min(L, const=20.0, coeff=8.0, log=True)
    for rec, codes in zip(recs, rows):
        _check_se_record(rec, codes, gstr, gcodes, mode="local",
                         match_bonus=2, min_s=min_s)
