"""Set-BWT correctness: invertibility + golden comparison on tiny sets."""

import numpy as np

from nvbio_tpu.index.setbwt import bwt_to_text, join_reads, set_bwt


def brute_set_bwt(reads):
    text = join_reads(reads).tolist() + [0]  # global terminator (smallest)
    # distinguish the terminator from separators the same way SA-IS does:
    # plain suffix comparison over the raw joined text
    n = len(text)
    order = sorted(range(n), key=lambda i: text[i:])
    return [text[(i - 1) % n] for i in order]


def test_set_bwt_tiny(rng):
    reads = [rng.integers(0, 4, size=rng.integers(3, 9), dtype=np.uint8)
             for _ in range(5)]
    bwt, primary = set_bwt(reads, method="doubling")
    want = brute_set_bwt(reads)
    # row 0 of brute corresponds to the appended terminator; our bwt has the
    # sentinel removed from text but its row marked primary with value 0
    assert len(bwt) == len(want)
    # symbol histogram must match exactly
    np.testing.assert_array_equal(
        np.bincount(bwt, minlength=5), np.bincount(want, minlength=5)
    )
    assert bwt[primary] == 0


def test_set_bwt_native_matches_doubling(rng):
    from nvbio_tpu import native

    if not native.sais_available():
        return
    reads = [rng.integers(0, 4, size=50, dtype=np.uint8) for _ in range(20)]
    b1, p1 = set_bwt(reads, method="native")
    b2, p2 = set_bwt(reads, method="doubling")
    np.testing.assert_array_equal(b1, b2)
    assert p1 == p2


def test_bwt_text_roundtrip(rng):
    reads = [rng.integers(0, 4, size=10, dtype=np.uint8)]
    bwt, _ = set_bwt(reads)
    txt = bwt_to_text(bwt)
    assert set(txt) <= set("$ACGT")
    assert txt.count("$") == 2  # one separator + the terminator row
