"""BGZF/BAM codec round-trips + VCF loader (reference io/output, io/vcf)."""

import gzip
import os

import numpy as np
import pytest

from nvbio_tpu.io.bam import BamReader, BamWriter, read_bam, reg2bin
from nvbio_tpu.io.bgzf import BgzfReader, BgzfWriter
from nvbio_tpu.io.output import open_alignment_output, read_alignments
from nvbio_tpu.io.sam import SamRecord
from nvbio_tpu.io.vcf import load_vcf


def test_bgzf_roundtrip(tmp_path):
    rng = np.random.default_rng(7)
    data = rng.integers(0, 255, size=300_000, dtype=np.uint8).tobytes()
    p = str(tmp_path / "x.bgz")
    with BgzfWriter(p) as w:
        for i in range(0, len(data), 12345):
            w.write(data[i:i + 12345])
    with BgzfReader(p) as r:
        back = r.read_all()
    assert back == data
    # BGZF is valid gzip: stdlib must be able to decompress it too
    with gzip.open(p, "rb") as g:
        assert g.read() == data


def test_bgzf_read_chunked(tmp_path):
    p = str(tmp_path / "y.bgz")
    payload = bytes(range(256)) * 1000
    with BgzfWriter(p) as w:
        w.write(payload)
    with BgzfReader(p) as r:
        out = bytearray()
        while True:
            c = r.read(777)
            if not c:
                break
            out += c
    assert bytes(out) == payload


def test_reg2bin_spec_values():
    assert reg2bin(0, 1) == 4681
    assert reg2bin(0, 1 << 14) == 4681
    assert reg2bin(1 << 14, (1 << 14) + 1) == 4682
    assert reg2bin(0, 1 << 29) == 0


def _recs():
    return [
        SamRecord("r0", 0, "chr1", 100, 42, "50M", "A" * 50, "I" * 50,
                  tags={"AS": -3, "NM": 1, "MD": "50"}),
        SamRecord("r1", 16, "chr2", 7, 11, "10M2D5M3S", "ACGTACGTACGTACGTAC",
                  "#" * 18, tags={"AS": -12}),
        SamRecord("r2", 4, "*", 0, 0, "*", "ACGT", "IIII"),
        SamRecord("p0", 0x1 | 0x40 | 0x2, "chr1", 500, 30, "20M",
                  "C" * 20, "5" * 20, rnext="=", pnext=700, tlen=220),
    ]


def test_bam_roundtrip(tmp_path):
    p = str(tmp_path / "t.bam")
    names, lens = ["chr1", "chr2"], [10000, 5000]
    with BamWriter(p, names, lens) as w:
        for r in _recs():
            w.write(r)
    with BamReader(p) as br:
        assert br.ref_names == names
        assert br.ref_lengths == lens
        assert "@SQ\tSN:chr1\tLN:10000" in br.header_text
        back = list(br)
    orig = _recs()
    assert len(back) == len(orig)
    for a, b in zip(orig, back):
        assert (a.qname, a.flag, a.rname, a.pos, a.mapq, a.cigar) == \
               (b.qname, b.flag, b.rname, b.pos, b.mapq, b.cigar)
        assert a.seq == b.seq and a.qual == b.qual
        assert (a.rnext, a.pnext, a.tlen) == (b.rnext, b.pnext, b.tlen)
        for k, v in (a.tags or {}).items():
            assert b.tags[k] == v


def test_bam_matches_sam_lines(tmp_path):
    bam = str(tmp_path / "t.bam")
    sam = str(tmp_path / "t.sam")
    names, lens = ["chr1", "chr2"], [10000, 5000]
    for path in (bam, sam):
        with open_alignment_output(path, names, lens) as w:
            for r in _recs():
                w.write(r)
    hb, rb = read_alignments(bam)
    hs, rs = read_alignments(sam)
    assert [r[:11] for r in rb] == [r[:11] for r in rs]
    assert any(line.startswith("@SQ") for line in hb)


def test_read_bam_helper(tmp_path):
    p = str(tmp_path / "h.bam")
    with BamWriter(p, ["c"], [99]) as w:
        w.write(_recs()[0])
    header, recs = read_bam(p)
    assert recs[0][0] == "r0" and recs[0][3] == "100"


VCF_TEXT = """\
##fileformat=VCFv4.2
##INFO=<ID=END,Number=1,Type=Integer,Description="End">
#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO
chr1\t100\trs1\tA\tG\t50\tPASS\t.
chr1\t200\trs2\tAT\tA,ATT\t99.5\tPASS\tDP=30
chr2\t5\t.\tC\tT\t.\tPASS\tEND=6;DP=1
"""


def test_vcf_load(tmp_path):
    p = str(tmp_path / "v.vcf")
    with open(p, "w") as f:
        f.write(VCF_TEXT)
    db = load_vcf(p)
    # multi-allele row expands into two variants
    assert len(db) == 4
    assert db.contig_names == ["chr1", "chr2"]
    assert db.contig_ids.tolist() == [0, 0, 0, 1]
    assert db.positions[0].tolist() == [100, 101]
    assert db.positions[3].tolist() == [5, 6]  # END= honored
    assert db.qualities[0] == 50
    assert db.qualities[1] == 99
    assert db.qualities[3] == 0xFF  # missing QUAL
    from nvbio_tpu.alphabet import Alphabet, codes_to_string

    assert codes_to_string(db.ref_seq(1), Alphabet.DNA_IUPAC) == "AT"
    assert codes_to_string(db.var_seq(2), Alphabet.DNA_IUPAC) == "ATT"


def test_vcf_load_gz_append(tmp_path):
    p = str(tmp_path / "v.vcf.gz")
    with gzip.open(p, "wt") as f:
        f.write(VCF_TEXT)
    db = load_vcf(p)
    db2 = load_vcf(p, db)  # append mode
    assert len(db2) == 8
    assert db2.contig_names == ["chr1", "chr2"]
    np.testing.assert_array_equal(db2.index[4:, 1], db.index[:, 1])
    from nvbio_tpu.alphabet import Alphabet, codes_to_string

    assert codes_to_string(db2.ref_seq(5), Alphabet.DNA_IUPAC) == "AT"


def test_sort_alignments(tmp_path):
    from nvbio_tpu.io.bamsort import sort_alignments
    from nvbio_tpu.io.sam import SamWriter

    rng = np.random.default_rng(13)
    names, lens = ["c1", "c2"], [100000, 50000]
    recs = []
    for i in range(500):
        chrom = int(rng.integers(0, 2))
        pos = int(rng.integers(1, lens[chrom]))
        flag = 4 if i % 50 == 0 else 0
        recs.append(SamRecord(f"q{i}", flag, "*" if flag else names[chrom],
                              0 if flag else pos, 30, "*" if flag else "10M",
                              "ACGTACGTAC", "I" * 10))
    src = str(tmp_path / "in.sam")
    with SamWriter(src, names, lens) as w:
        for r in recs:
            w.write(r)

    # small run_size forces the out-of-core spill + k-way merge path
    out = str(tmp_path / "out.bam")
    n = sort_alignments(src, out, run_size=64)
    assert n == 500
    from nvbio_tpu.io.bam import BamReader

    with BamReader(out) as br:
        assert "SO:coordinate" in br.header_text
        got = list(br)
    assert len(got) == 500
    keys = [((0x7FFFFFFF, 0) if r.flag & 0x4 else
             (names.index(r.rname), r.pos)) for r in got]
    assert keys == sorted(keys)
    # round-trip count by name must match
    assert sorted(r.qname for r in got) == sorted(r.qname for r in recs)

    # in-memory path (no spill) must agree
    out2 = str(tmp_path / "out2.sam")
    n2 = sort_alignments(src, out2, run_size=10_000)
    assert n2 == 500
    from nvbio_tpu.io.sam import read_sam

    header, rows = read_sam(out2)
    assert any("SO:coordinate" in h for h in header)
    # same key sequence (tie order between equal keys may differ)
    keys2 = [((0x7FFFFFFF, 0) if int(r[1]) & 0x4 else
              (names.index(r[2]), int(r[3]))) for r in rows]
    assert keys2 == keys
    assert sorted(r[0] for r in rows) == sorted(r.qname for r in got)
