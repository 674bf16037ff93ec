"""Pinned dataset for the recorded-output conformance test.

Deterministic generation of a small genome + a read set covering the SAM
flag/CIGAR/MD surface: clean reads, mismatches, indels, reverse strand,
unmappable reads, proper/discordant/rescued pairs. The expected SAM lives in
tests/data/expected_{se,pe}.sam (regenerate with
``python tests/conformance_data.py`` after an INTENTIONAL behavior change —
the diff is then reviewed like the reference's recorded-output tests,
SURVEY §4; the reference validated 99.98% agreement vs bowtie2,
``nvBowtie/nvBowtie.dox:40-50``).
"""

from __future__ import annotations

import os

import numpy as np

L = 100
GENOME_N = 120_000


def build_dataset():
    from nvbio_tpu.alphabet import codes_to_string, reverse_complement_codes
    from nvbio_tpu.io.fastq import ReadBatch
    from nvbio_tpu.io.reference import Reference

    rng = np.random.default_rng(0xC0FFEE)
    codes = rng.integers(0, 4, size=GENOME_N, dtype=np.uint8)
    ref = Reference.from_records([("conf1", codes_to_string(codes))])

    rows, names = [], []

    def add(name, r):
        names.append(name)
        rows.append(np.asarray(r, np.uint8))

    for i in range(8):                       # clean fwd
        p = 1000 + 3000 * i
        add(f"clean{i}", codes[p:p + L])
    for i in range(8):                       # clean rc
        p = 2000 + 3000 * i
        add(f"rc{i}", reverse_complement_codes(codes[p:p + L]))
    for i in range(8):                       # 3 mismatches
        p = 40_000 + 2000 * i
        r = codes[p:p + L].copy()
        for j in (10, 50, 90):
            r[j] = (r[j] + 1 + i % 3) % 4
        add(f"mm{i}", r)
    for i in range(4):                       # 2bp deletion
        p = 60_000 + 2000 * i
        r = np.delete(codes[p:p + L + 2].copy(), [40, 41])
        add(f"del{i}", r)
    for i in range(4):                       # 2bp insertion
        p = 70_000 + 2000 * i
        r = codes[p:p + L - 2].copy()
        r = np.insert(r, 30, [(codes[p + 30] + 1) % 4,
                              (codes[p + 31] + 2) % 4])
        add(f"ins{i}", r[:L])
    for i in range(4):                       # random: unmapped
        add(f"rand{i}", rng.integers(0, 4, L, np.uint8))

    batch = ReadBatch(
        names=names,
        codes=np.stack(rows),
        quals=np.full((len(rows), L), 30, np.uint8),
        lengths=np.full(len(rows), L, np.int32),
    )

    # paired set: proper pairs + far-apart discordant pairs
    m1, m2, pnames = [], [], []
    for i in range(6):                       # proper FR pairs
        frag = 260 + 20 * i
        p = 80_000 + 1500 * i
        m1.append(codes[p:p + L].copy())
        m2.append(reverse_complement_codes(
            codes[p + frag - L:p + frag]).copy())
        pnames.append(f"pp{i}")
    for i in range(4):                       # discordant (frag ~ 20k)
        p = 90_000 + 1200 * i
        q = p + 20_000
        m1.append(codes[p:p + L].copy())
        m2.append(reverse_complement_codes(codes[q:q + L]).copy())
        pnames.append(f"dp{i}")

    def mk(rows_):
        return ReadBatch(
            names=pnames,
            codes=np.stack(rows_).astype(np.uint8),
            quals=np.full((len(rows_), L), 30, np.uint8),
            lengths=np.full(len(rows_), L, np.int32),
        )

    return ref, batch, mk(m1), mk(m2)


def map_all():
    from nvbio_tpu.bowtie import MapParams, ReadMapper
    from nvbio_tpu.bowtie.paired import map_pair_batch

    ref, se, m1, m2 = build_dataset()
    params = MapParams(max_read_len=L)
    mapper = ReadMapper.build(ref, params)
    se_recs = mapper.map_batch(se)
    pe_recs = map_pair_batch(mapper, m1, m2)
    return ref, se_recs, pe_recs


def map_extended():
    """local mode, all-mapping, and mapq-filtered outputs on the same
    pinned dataset (the remaining output surfaces: --local / --all /
    --mapq-filter)."""
    from nvbio_tpu.bowtie import MapParams, ReadMapper
    from nvbio_tpu.io.sam import SamRecord

    ref, se, _m1, _m2 = build_dataset()
    base = ReadMapper.build(ref, MapParams(max_read_len=L))
    local = ReadMapper.build(ref, MapParams.local(max_read_len=L),
                             index=base.index)
    local_recs = local.map_batch(se)
    all_recs = base.map_batch_all(se)
    filt_recs = []
    for rec in base.map_batch(se):
        if not rec.flag & 0x4 and rec.mapq < 20:
            rec = SamRecord(
                qname=rec.qname, flag=(rec.flag | 0x4) & ~0x912,
                rname="*", pos=0, mapq=0, cigar="*",
                seq=rec.seq, qual=rec.qual)
        filt_recs.append(rec)
    return local_recs, all_recs, filt_recs


def record(out_dir):
    ref, se_recs, pe_recs = map_all()
    local_recs, all_recs, filt_recs = map_extended()
    for fname, recs in (("expected_se.sam", se_recs),
                        ("expected_pe.sam", pe_recs),
                        ("expected_local.sam", local_recs),
                        ("expected_all.sam", all_recs),
                        ("expected_mapqfilt.sam", filt_recs)):
        with open(os.path.join(out_dir, fname), "w") as f:
            for r in recs:
                f.write(r.line() + "\n")
        print(f"recorded {fname}: {len(recs)} records")


if __name__ == "__main__":
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    # force plain CPU jax (conftest pattern) — recording must not depend
    # on the remote relay
    import jax
    jax.config.update("jax_platforms", "cpu")
    record(os.path.join(os.path.dirname(os.path.abspath(__file__)), "data"))
