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


def _mse_oracle(reads):
    """Brute-force BCR multi-string BWT: per-string suffixes with $_i
    ordered by string index, circular previous symbol."""
    entries = []  # (key, bwt_symbol)
    for i, r in enumerate(reads):
        r = list(r)
        aug = [int(c) + 1 for c in r] + [None]  # None marks $_i
        for p in range(len(aug)):
            # comparison key: symbols until (incl.) the sentinel; sentinel
            # sorts below everything, ties by string index
            key = []
            for c in aug[p:]:
                if c is None:
                    key.append((0, i))
                    break
                key.append((c + 1, -1))
            prev = aug[p - 1] if p > 0 else aug[-1]
            sym = 0 if prev is None else prev
            entries.append((tuple(key), sym))
    entries.sort(key=lambda e: e[0])
    return np.array([e[1] for e in entries], np.uint8)


def test_mse_bwt_matches_oracle(rng):
    from nvbio_tpu.index.setbwt import mse_bwt

    for trial in range(5):
        reads = [rng.integers(0, 4, size=rng.integers(3, 12)).astype(np.uint8)
                 for _ in range(rng.integers(2, 8))]
        got, tags = mse_bwt(reads)
        want = _mse_oracle(reads)
        assert sorted(tags[got == 0].tolist()) == list(range(len(reads)))
        np.testing.assert_array_equal(got, want, err_msg=str(trial))


def test_merge_mse_bwts_equals_whole(rng):
    from nvbio_tpu.index.setbwt import merge_mse_bwts, mse_bwt

    for trial in range(5):
        A = [rng.integers(0, 4, size=rng.integers(3, 10)).astype(np.uint8)
             for _ in range(rng.integers(1, 6))]
        B = [rng.integers(0, 4, size=rng.integers(3, 10)).astype(np.uint8)
             for _ in range(rng.integers(1, 6))]
        b1, t1 = mse_bwt(A)
        b2, t2 = mse_bwt(B)
        merged, mtags = merge_mse_bwts(b1, t1, b2, t2)
        want, wtags = mse_bwt(A + B)
        np.testing.assert_array_equal(merged, want, err_msg=str(trial))
        np.testing.assert_array_equal(mtags, wtags, err_msg=str(trial))


def test_mse_bwt_incremental_blocks(rng):
    from nvbio_tpu.index.setbwt import mse_bwt, mse_bwt_incremental

    reads = [rng.integers(0, 4, size=20).astype(np.uint8) for _ in range(23)]
    got = mse_bwt_incremental(reads, block_size=5)
    np.testing.assert_array_equal(got, mse_bwt(reads)[0])
    # symbol counts conserved: one '$' per read + all bases
    assert (got == 0).sum() == 23
    assert len(got) == 23 * 21


def test_paged_bwte_insertion(rng):
    """PagedText + BCR column insertion == direct multi-string BWT, across
    blocks (paged_text.h + bwte.h equivalents: data movement bounded by
    touched pages, occ via per-page counters)."""
    from nvbio_tpu.index.paged_text import PagedText, bwte_insert_block
    from nvbio_tpu.index.setbwt import mse_bwt

    reads = [rng.integers(0, 4, int(rng.integers(3, 50))).astype(np.uint8)
             for _ in range(80)]
    want, _tags = mse_bwt(reads)

    pt = PagedText(n_symbols=5, page=128)
    ns = 0
    for i in range(0, len(reads), 25):
        ns = bwte_insert_block(pt, reads[i:i + 25], ns)
    got = pt.gather()
    np.testing.assert_array_equal(got, want)
    assert ns == len(reads)
    # paging actually engaged
    assert len(pt.pages) > 3
    assert max(len(p) for p in pt.pages) <= 128
    # occ bookkeeping consistent
    text = got
    probe_pos = np.asarray([0, 17, len(text) // 3, len(text)], np.int64)
    probe_sym = np.asarray([1, 0, 3, 2], np.int64)
    occ = pt.occ_many(probe_sym, probe_pos)
    for s, p, o in zip(probe_sym, probe_pos, occ):
        assert o == int((text[:p] == s).sum())


def test_bwte_rank_merge_equals_whole(rng):
    """Static-rank one-pass block merge (bwte_merge_block_rank, the
    bwte.h:57-229 fast path) reproduces the whole-set BCR BWT bitwise —
    bwt AND sentinel tags — across blocks, duplicates, and empty reads."""
    from nvbio_tpu.index.setbwt import (
        bwte_merge_block_rank, mse_bwt, mse_bwt_incremental,
    )

    for trial in range(3):
        m = int(rng.integers(6, 50))
        reads = [rng.integers(0, 4, int(rng.integers(0, 40))).astype(np.uint8)
                 for _ in range(m)]
        if m > 2:
            reads[1] = reads[-1].copy()  # duplicate strings share suffixes
        full, full_tags = mse_bwt(reads)
        inc = mse_bwt_incremental(reads, block_size=5, method="rank")
        np.testing.assert_array_equal(full, inc)
        acc = np.zeros(0, np.uint8)
        acc_t = np.zeros(0, np.int64)
        ns = 0
        for i in range(0, len(reads), 5):
            acc, acc_t = bwte_merge_block_rank(acc, acc_t, reads[i:i + 5], ns)
            ns += len(reads[i:i + 5])
        np.testing.assert_array_equal(acc_t, full_tags)


def test_mse_bwt_native_i32_matches_doubling(rng):
    """Integer-alphabet native SA-IS block engine == the numpy doubling
    oracle for the tagged BCR text."""
    from nvbio_tpu import native
    from nvbio_tpu.index.setbwt import mse_bwt

    if not native.sais_available():
        import pytest

        pytest.skip("native toolchain unavailable")
    reads = [rng.integers(0, 4, int(rng.integers(1, 60))).astype(np.uint8)
             for _ in range(35)]
    a, at = mse_bwt(reads, method="native")
    b, bt = mse_bwt(reads, method="doubling")
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(at, bt)


def test_bwte_device_engine(rng):
    """Device-resident BWTE (bwte_device.BwteDevice) reproduces the
    whole-set BCR oracle bitwise — bwt AND sentinel tags — across blocks
    and capacity padding (capacity > total symbols)."""
    from nvbio_tpu.index.bwte_device import BwteDevice
    from nvbio_tpu.index.setbwt import mse_bwt

    for m, L, nb in ((8, 12, 2), (16, 20, 3), (5, 7, 4)):
        reads = rng.integers(0, 4, size=(m * nb, L), dtype=np.uint8)
        eng = BwteDevice(capacity=m * nb * (L + 1) + 100,
                         n_strings=m * nb)
        for b in range(nb):
            eng.add_block(reads[b * m:(b + 1) * m])
        bwt, tags = eng.finalize()
        want, wtags = mse_bwt(list(reads))
        np.testing.assert_array_equal(bwt, np.asarray(want),
                                      err_msg=f"bwt m={m} L={L}")
        np.testing.assert_array_equal(tags, np.asarray(wtags),
                                      err_msg=f"tags m={m} L={L}")


def test_bwte_device_block_sa_paths_agree(rng):
    """Device-derived block planes (packed-reads upload + on-device tagged
    suffix sort) give the same final BWT as the host SA-IS path and the
    whole-set oracle."""
    from nvbio_tpu.index.bwte_device import BwteDevice
    from nvbio_tpu.index.setbwt import mse_bwt

    m, L, nb = 12, 18, 3
    reads = rng.integers(0, 4, size=(m * nb, L), dtype=np.uint8)
    ed = BwteDevice(capacity=m * nb * (L + 1), n_strings=m * nb)
    eh = BwteDevice(capacity=m * nb * (L + 1), n_strings=m * nb)
    for b in range(nb):
        ed.add_block(reads[b * m:(b + 1) * m], block_sa="device")
        eh.add_block(reads[b * m:(b + 1) * m], block_sa="host")
    bd, td = ed.finalize()
    bh, th = eh.finalize()
    want, wtags = mse_bwt(list(reads))
    np.testing.assert_array_equal(bd, bh)
    np.testing.assert_array_equal(td, th)
    np.testing.assert_array_equal(bd, np.asarray(want))
    np.testing.assert_array_equal(td, np.asarray(wtags))


def test_bwte_device_tie_paths(rng):
    """Adversarial inputs for the multi-string bootstrap sort: identical
    reads (pure sentinel-depth ties, resolved by the owner key), duplicated
    reads mixed with random ones (26-symbol symbol ties -> compacted
    doubling), and homopolymer reads (tie overflow -> full-plane fallback)
    must all match the whole-set BCR oracle bitwise."""
    from nvbio_tpu.index.bwte_device import BwteDevice
    from nvbio_tpu.index.setbwt import mse_bwt

    L = 40
    one = rng.integers(0, 4, size=L, dtype=np.uint8)
    cases = {
        "identical": np.tile(one, (24, 1)),
        "duplicated": np.concatenate([
            np.tile(one, (8, 1)),
            rng.integers(0, 4, size=(16, L), dtype=np.uint8)]),
        "homopolymer": np.zeros((24, L), np.uint8),
    }
    # force the full-plane fallback for the homopolymer case by shrinking
    # the tie cap (24*41 suffixes of all-A reads leave > 2 ties)
    import nvbio_tpu.index.device_sa as dsa

    for name, reads in cases.items():
        m = len(reads)
        eng = BwteDevice(capacity=m * (L + 1), n_strings=m)
        if name == "homopolymer":
            old_cap = dsa._TIE_CAP
            old_caps = dsa._TIE_CAPS
            dsa._TIE_CAP = 2
            dsa._TIE_CAPS = ()
            try:
                eng.add_block(reads)
            finally:
                dsa._TIE_CAP = old_cap
                dsa._TIE_CAPS = old_caps
        else:
            eng.add_block(reads)
        bwt, tags = eng.finalize()
        want, wtags = mse_bwt(list(reads))
        np.testing.assert_array_equal(bwt, np.asarray(want), err_msg=name)
        np.testing.assert_array_equal(tags, np.asarray(wtags), err_msg=name)


def test_bwte_native_engine_matches_oracle(rng):
    """C++ BWTE engine (native/bwte.cpp: BCR column blocks + dual LF
    rank-walk merges over fused rank lines) reproduces the whole-set BCR
    oracle bitwise across random block splits, duplicates, and the
    single-block case (``sufsort/bwte.h:57-229`` counterpart)."""
    from nvbio_tpu import native
    from nvbio_tpu.index.setbwt import mse_bwt, mse_bwt_incremental

    if not native.bwte_available():
        import pytest

        pytest.skip("native toolchain unavailable")
    for trial in range(4):
        m = int(rng.integers(2, 70))
        L = int(rng.integers(1, 45))
        reads = rng.integers(0, 4, size=(m, L), dtype=np.uint8)
        if m > 2:
            reads[1] = reads[-1]  # duplicate strings share suffixes
        want, _tags = mse_bwt(reads)
        bs = int(rng.integers(1, m + 1))
        got = mse_bwt_incremental(reads, block_size=bs, method="native")
        np.testing.assert_array_equal(got, want)
    # block primitives directly: block BWT == whole-set oracle of the block
    blk = rng.integers(0, 4, size=(9, 13), dtype=np.uint8)
    want, _ = mse_bwt(blk)
    np.testing.assert_array_equal(native.bcr_block_bwt(blk), want)


def test_bwte_native_ragged_falls_back(rng):
    """method="native" on a ragged read set transparently produces the
    rank-path result (the C++ engine is uniform-length only)."""
    from nvbio_tpu.index.setbwt import mse_bwt, mse_bwt_incremental

    reads = [rng.integers(0, 4, int(rng.integers(1, 30))).astype(np.uint8)
             for _ in range(21)]
    want, _ = mse_bwt(reads)
    got = mse_bwt_incremental(reads, block_size=6, method="native")
    np.testing.assert_array_equal(got, want)


def test_bwte_native_zero_length_reads():
    """Zero-length uniform reads take the rank fallback (sentinels only)."""
    from nvbio_tpu.index.setbwt import mse_bwt_incremental

    got = mse_bwt_incremental(np.zeros((4, 0), np.uint8), 2,
                              method="native")
    np.testing.assert_array_equal(got, np.zeros(4, np.uint8))
