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

import re

import numpy as np
import pytest

from tests import bt2_oracle as oracle
from tests.conformance_data import L, build_dataset

REF_SPAN_OPS = frozenset("MD=X")


def _ref_span(cigar: str) -> int:
    return sum(int(n) for n, op in oracle._CIG_RE.findall(cigar)
               if op in REF_SPAN_OPS)


def _check_se_record(rec, codes, genome_str, genome_codes, *, mode="end-to-end",
                     match_bonus=0, min_s=None, quals=None):
    """Full independent validation of one primary SE record."""
    if min_s is None:
        min_s = oracle.score_min(len(codes))
    if quals is None:
        quals = np.full(len(codes), 30)
    codes = np.asarray(codes)
    rl = len(codes)

    # ---- structural completeness of EVERY SAM column --------------------
    # FLAG bit-exactness: a primary SE record may carry only 0x4/0x10
    assert rec.flag & ~0x14 == 0, (rec.qname, rec.flag)
    assert 0 <= rec.mapq <= 254, rec.qname
    # SEQ is the read verbatim (0x10: its reverse complement), QUAL the
    # qualities in the same orientation
    comp = {"A": "T", "C": "G", "G": "C", "T": "A", "N": "N"}
    fwd = "".join("ACGTN"[min(int(c), 4)] for c in codes)
    want_seq = ("".join(comp[c] for c in reversed(fwd))
                if rec.flag & 0x10 else fwd)
    assert rec.seq == want_seq, (rec.qname, rec.seq, want_seq)
    q_fwd = "".join(chr(int(q) + 33) for q in np.asarray(quals)[:rl])
    want_q = q_fwd[::-1] if rec.flag & 0x10 else q_fwd
    assert rec.qual == want_q, rec.qname
    # SE: no mate columns
    assert (rec.rnext, rec.pnext, rec.tlen) == ("*", 0, 0), rec.qname

    # --n-ceil: over-N reads are filtered regardless of score
    filtered = int(np.sum(np.asarray(codes) > 3)) > oracle.n_ceil(len(codes))
    opt = oracle.best_alignments(genome_codes, codes, quals,
                                 mode=mode, match_bonus=match_bonus)
    if rec.flag & 0x4:
        # unmapped placement conventions
        assert (rec.rname, rec.pos, rec.mapq, rec.cigar) == \
            ("*", 0, 0, "*"), (rec.qname, "unmapped column conventions")
        assert rec.flag & ~0x14 == 0, rec.qname
        assert filtered or opt["best"] < min_s, (
            f"{rec.qname}: reported unmapped but an alignment scoring "
            f"{opt['best']} >= {min_s} exists")
        return
    # mapped placement: POS within the contig, CIGAR consumes the read
    assert rec.rname != "*" and rec.pos >= 1, rec.qname
    qspan = sum(int(m.group(1))
                for m in re.finditer(r"(\d+)([MIS=X])", rec.cigar))
    assert qspan == rl == len(rec.seq), (rec.qname, rec.cigar)
    rspan = sum(int(m.group(1))
                for m in re.finditer(r"(\d+)([MDN=X])", rec.cigar))
    assert rec.pos - 1 + rspan <= len(genome_codes), (
        rec.qname, "alignment extends past the contig end")
    assert not filtered, (
        f"{rec.qname}: mapped but exceeds the --n-ceil N filter")
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
    # XS PRESENCE rule (bowtie2: emitted iff a valid secondary alignment
    # exists), not just value-when-present
    if mode == "end-to-end":
        assert ("XS" in (rec.tags or {})) == has2, (
            rec.qname, "XS presence", has2, rec.tags)
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
            # UP class: mates aligned separately (or not at all) — check
            # mate-unmapped bits, unmapped placement, and the YT tag
            for a, b in ((r1, r2), (r2, r1)):
                assert bool(a.flag & 0x8) == bool(b.flag & 0x4), name
                if a.flag & 0x4:
                    assert (a.rname, a.pos, a.mapq, a.cigar) == \
                        ("*", 0, 0, "*"), (name, "unmapped placement")
                    assert not (a.flag & 0x2), name
                else:
                    assert a.tags["YT"] == "UP", (name, a.tags)
                    assert not (a.flag & 0x2), name
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


def _map_rows(ref, rows, names, params=None, quals=None):
    from nvbio_tpu.bowtie import MapParams, ReadMapper
    from nvbio_tpu.io.fastq import ReadBatch

    Lr = rows[0].shape[0]
    batch = ReadBatch(
        names=names, codes=np.stack(rows),
        quals=(quals if quals is not None
               else np.full((len(rows), Lr), 30, np.uint8)),
        lengths=np.full(len(rows), Lr, np.int32))
    mapper = ReadMapper.build(ref, params or MapParams(max_read_len=Lr))
    return [r for r in mapper.map_batch(batch) if not (r.flag & 0x100)]


def test_end_indels_against_oracle(mapped_se):
    """Indels at the read ENDS (the band's weakest region): deletions and
    insertions within a few bases of either end must still produce
    exhaustively-optimal, correctly re-scoring records."""
    ref, _se, _r, gstr, gcodes = mapped_se
    rng = np.random.default_rng(0xE7D5)
    n = len(gcodes)
    rows, names = [], []
    for i in range(24):
        p = int(rng.integers(0, n - L - 8))
        r = gcodes[p:p + L + 6].astype(np.uint8).copy()
        d = int(rng.integers(1, 4))          # 1-3 bp event
        kind = i % 4
        if kind == 0:                        # deletion near the start
            at = int(rng.integers(2, 6))
            r = np.delete(r, np.arange(at, at + d))
        elif kind == 1:                      # deletion near the end
            at = int(rng.integers(L - 6, L - 2))
            r = np.delete(r, np.arange(at, at + d))
        elif kind == 2:                      # insertion near the start
            at = int(rng.integers(2, 6))
            r = np.insert(r, at, (r[at:at + d] + 2) % 4)
        else:                                # insertion near the end
            at = int(rng.integers(L - 6, L - 2))
            r = np.insert(r, at, (r[at:at + d] + 2) % 4)
        r = r[:L]
        if rng.random() < 0.5:
            r = oracle.revcomp_codes(r).astype(np.uint8)
        rows.append(r)
        names.append(f"endindel{i}")
    recs = _map_rows(ref, rows, names)
    for rec, codes in zip(recs, rows):
        _check_se_record(rec, codes, gstr, gcodes)


@pytest.fixture(scope="module")
def repeat_ref():
    """Genome with an exact 3 kbp duplicated family (two copies, 50 kbp
    apart) and a diverged third copy (2% substitutions)."""
    from nvbio_tpu.alphabet import codes_to_string
    from nvbio_tpu.io.reference import Reference

    rng = np.random.default_rng(0x5E9D)
    g = rng.integers(0, 4, size=120_000, dtype=np.uint8)
    seg = g[30_000:33_000].copy()
    g[80_000:83_000] = seg                      # exact copy
    div = seg.copy()
    mut = rng.integers(0, len(div), size=60)
    div[mut] = (div[mut] + rng.integers(1, 4, size=60)) % 4
    g[55_000:58_000] = div                      # 2%-diverged copy
    ref = Reference.from_records([("rep1", codes_to_string(g))])
    return ref, codes_to_string(g), g


def test_repeat_family_ties_against_oracle(repeat_ref):
    """Reads inside an EXACT repeat family: the optimum is tied across
    copies, so MAPQ must collapse to 0/1 (the oracle's V2 model decides
    exactly which) and XS must equal AS. A positional candidate cap that
    silently drops the twin locus would inflate MAPQ here."""
    ref, gstr, gcodes = repeat_ref
    rng = np.random.default_rng(1)
    rows, names = [], []
    for i in range(12):
        p = 30_000 + int(rng.integers(0, 3000 - L))
        r = gcodes[p:p + L].astype(np.uint8).copy()
        if i % 3 == 1:                       # 1 mismatch still ties
            j = int(rng.integers(0, L))
            r[j] = (r[j] + 1) % 4
        if i % 2:
            r = oracle.revcomp_codes(r).astype(np.uint8)
        rows.append(r)
        names.append(f"rep{i}")
    recs = _map_rows(ref, rows, names)
    for rec, codes in zip(recs, rows):
        _check_se_record(rec, codes, gstr, gcodes)
        assert not rec.flag & 0x4, rec.qname
        assert rec.mapq <= 1, (rec.qname, rec.mapq, "tied loci must not "
                               "get a confident MAPQ")
        assert rec.tags.get("XS") == rec.tags["AS"], rec.qname


def test_n_runs_against_oracle(mapped_se):
    """Read-N handling: Ns charge the flat --np=1 penalty (not the quality
    mismatch cost), and reads over the --n-ceil (0.15*L) are filtered."""
    ref, _se, _r, gstr, gcodes = mapped_se
    rng = np.random.default_rng(2)
    n = len(gcodes)
    rows, names = [], []
    for i, n_count in enumerate((1, 5, 12, 15, 16, 40)):
        p = 3000 + 9000 * i
        r = gcodes[p:p + L].astype(np.uint8).copy()
        at = int(rng.integers(10, L - n_count - 10))
        r[at:at + n_count] = 4               # an N run
        if i % 2:
            r = oracle.revcomp_codes(r).astype(np.uint8)
        rows.append(r)
        names.append(f"nrun{n_count}")
    recs = _map_rows(ref, rows, names)
    ceil = oracle.n_ceil(L)
    for rec, codes in zip(recs, rows):
        n_count = int(np.sum(codes > 3))
        _check_se_record(rec, codes, gstr, gcodes)
        if n_count <= ceil:
            # np=1 each: even 15 Ns only cost -15, far above score-min
            assert not rec.flag & 0x4, (rec.qname, "should map: Ns cost "
                                        "--np=1 each")
            assert rec.tags["AS"] == -n_count, (rec.qname, rec.tags["AS"])
        else:
            assert rec.flag & 0x4, (rec.qname, "over n-ceil must be "
                                    "filtered")


def test_quality_extremes_against_oracle(mapped_se):
    """Mismatch penalties at quality extremes: q=0 charges MN=2, q>=40
    charges MX=6; AS/MAPQ must track the per-position quality plane."""
    ref, _se, _r, gstr, gcodes = mapped_se
    rng = np.random.default_rng(3)
    n = len(gcodes)
    rows, names, quals = [], [], []
    for i in range(12):
        p = int(rng.integers(0, n - L))
        r = gcodes[p:p + L].astype(np.uint8).copy()
        q = np.full(L, 30, np.uint8)
        nm = int(rng.integers(1, 4))
        for j in rng.integers(0, L, size=nm):
            r[j] = (r[j] + int(rng.integers(1, 4))) % 4
            q[j] = 0 if i % 2 else 40        # extreme quality AT the error
        # background quality also varies
        q[rng.integers(0, L, size=10)] = rng.integers(0, 42, size=10)
        rows.append(r)
        quals.append(q)
        names.append(f"qx{i}")
    recs = _map_rows(ref, rows, names,
                     quals=np.stack(quals).astype(np.uint8))
    for rec, codes, q in zip(recs, rows, quals):
        _check_se_record(rec, codes, gstr, gcodes, quals=q)


def test_score_min_functions_against_oracle(mapped_se):
    """A custom linear score-min (L,-1,-0.2): reads right at the threshold
    boundary must map/unmap exactly as the oracle's function decides."""
    from nvbio_tpu.bowtie import MapParams

    ref, _se, _r, gstr, gcodes = mapped_se
    rng = np.random.default_rng(4)
    n = len(gcodes)
    rows, names = [], []
    # q30 mismatch penalty is 5 => 4 mismatches = -20 (maps at min=-21),
    # 5 mismatches = -25 (must not map)
    for i, nm in enumerate((0, 3, 4, 5, 6)):
        p = 2000 + 11000 * i
        r = gcodes[p:p + L].astype(np.uint8).copy()
        for j in range(nm):
            at = 5 + 17 * j
            r[at] = (r[at] + 1) % 4
        rows.append(r)
        names.append(f"smin{nm}")
    params = MapParams(max_read_len=L, score_min_const=-1.0,
                       score_min_coeff=-0.2)
    recs = _map_rows(ref, rows, names, params=params)
    min_s = oracle.score_min(L, const=-1.0, coeff=-0.2)
    for rec, codes in zip(recs, rows):
        _check_se_record(rec, codes, gstr, gcodes, min_s=min_s)
    assert not recs[0].flag & 0x4 and not recs[2].flag & 0x4
    assert recs[3].flag & 0x4 and recs[4].flag & 0x4


def test_pe_mate_in_repeat(repeat_ref):
    """PE with one mate inside the exact repeat family: the unique mate
    must anchor the pair to the CONCORDANT copy (YT:Z:CP, proper-pair
    geometry), even though the repeat mate's SE evidence is tied."""
    from nvbio_tpu.bowtie import MapParams, ReadMapper
    from nvbio_tpu.bowtie.paired import map_pair_batch
    from nvbio_tpu.io.fastq import ReadBatch

    ref, gstr, gcodes = repeat_ref
    rng = np.random.default_rng(5)
    m1, m2, names = [], [], []
    for i in range(6):
        # mate1 unique (just left of the first copy), mate2 inside the
        # repeat; fragment ~ 300
        frag = 280 + 10 * i
        p = 30_000 - 150 + 60 * i            # straddles the copy boundary
        m1.append(gcodes[p:p + L].astype(np.uint8).copy())
        m2.append(oracle.revcomp_codes(
            gcodes[p + frag - L:p + frag]).astype(np.uint8).copy())
        names.append(f"per{i}")
    params = MapParams(max_read_len=L)
    mapper = ReadMapper.build(ref, params)
    quals = np.full((6, L), 30, np.uint8)
    lens = np.full(6, L, np.int32)
    b1 = ReadBatch(names=names, codes=np.stack(m1), quals=quals, lengths=lens)
    b2 = ReadBatch(names=names, codes=np.stack(m2), quals=quals, lengths=lens)
    recs = [r for r in map_pair_batch(mapper, b1, b2)
            if not (r.flag & 0x100)]
    by = {}
    for r in recs:
        by.setdefault(r.qname, []).append(r)
    for i, name in enumerate(names):
        r1 = next(r for r in by[name] if r.flag & 0x40)
        r2 = next(r for r in by[name] if r.flag & 0x80)
        assert not (r1.flag | r2.flag) & 0x4, name
        assert r1.tags["YT"] == "CP", (name, r1.tags["YT"])
        assert r1.flag & 0x2 and r2.flag & 0x2, name
        # the pair must sit at the FIRST copy (mate1's unique locus)
        p = 30_000 - 150 + 60 * i
        assert abs(r1.pos - 1 - p) <= 2, (name, r1.pos, p)
        frag = 280 + 10 * i
        want2 = p + frag - L
        assert abs(r2.pos - 1 - want2) <= 2, (name, r2.pos, want2)
        # geometry: concordant under fr within [minins, maxins]
        proper = oracle.is_proper_fr(
            r1.pos, r1.pos + _ref_span(r1.cigar) - 1,
            r2.pos, r2.pos + _ref_span(r2.cigar) - 1,
            params.minins, params.maxins)
        assert proper, name
