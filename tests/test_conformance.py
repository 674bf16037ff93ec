"""Recorded-output conformance: the mapper's SAM fields must match the
pinned expectations byte-for-byte (flags/POS/MAPQ/CIGAR/MD/NM/YT, SE + PE,
including discordant classification). The TPU analogue of the reference's
agreement validation vs bowtie2 (``nvBowtie/nvBowtie.dox:40-50``);
regenerate tests/data via ``python tests/conformance_data.py`` only for
INTENTIONAL behavior changes and review the diff."""

import os

from tests.conformance_data import map_all

DATA = os.path.join(os.path.dirname(os.path.abspath(__file__)), "data")


def _check(recs, fname):
    with open(os.path.join(DATA, fname)) as f:
        expected = [l.rstrip("\n") for l in f]
    got = [r.line() for r in recs]
    assert len(got) == len(expected), (len(got), len(expected))
    for g, e in zip(got, expected):
        assert g == e, f"\n got: {g}\nwant: {e}"


def test_se_and_pe_conformance():
    _, se_recs, pe_recs = map_all()
    _check(se_recs, "expected_se.sam")
    _check(pe_recs, "expected_pe.sam")


def test_local_all_mapqfilter_conformance():
    """Recorded pins for the remaining output surfaces: --local mode,
    --all mapping, and the output MAPQ filter."""
    from tests.conformance_data import map_extended

    local_recs, all_recs, filt_recs = map_extended()
    _check(local_recs, "expected_local.sam")
    _check(all_recs, "expected_all.sam")
    _check(filt_recs, "expected_mapqfilt.sam")
