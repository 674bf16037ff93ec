"""Bidirectional FM-index extension + PAC artifact round-trips."""

import numpy as np
import jax.numpy as jnp
import pytest

from nvbio_tpu.alphabet import codes_to_string
from nvbio_tpu.fmi.bidir import extend_backward, extend_forward, init_interval
from nvbio_tpu.fmi.index import build_fmindex


def _count_occ(text, pat):
    n, m = len(text), len(pat)
    return sum(1 for i in range(n - m + 1)
               if np.array_equal(text[i:i + m], pat))


@pytest.fixture(scope="module")
def indexes():
    rng = np.random.default_rng(17)
    text = rng.integers(0, 4, size=400, dtype=np.uint8)
    f = build_fmindex(text)
    r = build_fmindex(text[::-1].copy())
    return text, f, r


def test_bidir_backward_matches_bruteforce(indexes):
    text, f, r = indexes
    rng = np.random.default_rng(3)
    for _ in range(20):
        m = int(rng.integers(1, 8))
        pat = rng.integers(0, 4, size=m, dtype=np.uint8)
        lo, hi, rlo, rhi = init_interval(f)
        for c in pat[::-1]:  # build P by prepending
            lo, hi, rlo, rhi = extend_backward(
                f, r, lo, hi, rlo, rhi, jnp.int32(c))
        n_occ = _count_occ(text, pat)
        assert int(hi - lo) == n_occ, pat
        assert int(rhi - rlo) == n_occ
        # the twin interval is P reversed over the reversed text
        assert _count_occ(text[::-1], pat[::-1]) == n_occ


def test_bidir_forward_matches_bruteforce(indexes):
    text, f, r = indexes
    rng = np.random.default_rng(5)
    for _ in range(20):
        m = int(rng.integers(1, 8))
        pat = rng.integers(0, 4, size=m, dtype=np.uint8)
        lo, hi, rlo, rhi = init_interval(f)
        for c in pat:  # build P by appending
            lo, hi, rlo, rhi = extend_forward(
                f, r, lo, hi, rlo, rhi, jnp.int32(c))
        assert int(hi - lo) == _count_occ(text, pat), pat
        assert int(rhi - rlo) == int(hi - lo)


def test_bidir_mixed_directions(indexes):
    text, f, r = indexes
    # build ACGT as A -> AC -> GAC? no: prepend G to AC gives GAC; check both
    lo, hi, rlo, rhi = init_interval(f)
    lo, hi, rlo, rhi = extend_forward(f, r, lo, hi, rlo, rhi, jnp.int32(1))
    lo, hi, rlo, rhi = extend_forward(f, r, lo, hi, rlo, rhi, jnp.int32(2))
    lo, hi, rlo, rhi = extend_backward(f, r, lo, hi, rlo, rhi, jnp.int32(0))
    # pattern is now A + CG = ACG
    want = _count_occ(text, np.array([0, 1, 2], np.uint8))
    assert int(hi - lo) == want
    assert int(rhi - rlo) == want


def test_bidir_batched(indexes):
    text, f, r = indexes
    B = 16
    rng = np.random.default_rng(9)
    pats = rng.integers(0, 4, size=(B, 5), dtype=np.uint8)
    lo, hi, rlo, rhi = init_interval(f, (B,))
    for j in range(5):
        lo, hi, rlo, rhi = extend_forward(
            f, r, lo, hi, rlo, rhi, jnp.asarray(pats[:, j].astype(np.int32)))
    for b in range(B):
        assert int(hi[b] - lo[b]) == _count_occ(text, pats[b]), b


def test_pac_roundtrip(tmp_path):
    from nvbio_tpu.io.pac import load_pac, save_pac

    rng = np.random.default_rng(1)
    for n in (1, 3, 4, 17, 1000):
        codes = rng.integers(0, 4, size=n, dtype=np.uint8)
        p = str(tmp_path / f"x{n}.pac")
        save_pac(codes, p)
        # BWA convention: file size is exactly n/4 (+1 if n%4==0) + 1
        import os
        assert os.path.getsize(p) == (n + 3) // 4 + (1 if n % 4 else 2)
        back = load_pac(p)
        np.testing.assert_array_equal(back, codes)


def test_reference_pac_roundtrip(tmp_path):
    from nvbio_tpu.io.pac import load_reference_pac, save_reference_pac
    from nvbio_tpu.io.reference import Reference

    ref = Reference.from_records([
        ("chr1", "ACGTNNACGTACGT"),
        ("chr2", "TTTTCCCCNGGG"),
    ])
    prefix = str(tmp_path / "ref")
    save_reference_pac(ref, prefix)
    back = load_reference_pac(prefix)
    assert back.names == ["chr1", "chr2"]
    np.testing.assert_array_equal(back.offsets, ref.offsets)
    np.testing.assert_array_equal(back.codes, ref.codes)
    np.testing.assert_array_equal(back.n_mask_words, ref.n_mask_words)
    # .ann/.amb text matches the BWA format shape
    ann = (tmp_path / "ref.ann").read_text().splitlines()
    assert ann[0].split()[0] == str(ref.total_length)
    amb = (tmp_path / "ref.amb").read_text().splitlines()
    assert int(amb[0].split()[2]) == 2  # two N runs


def test_bwt_artifact_roundtrip_and_ssa_rebuild(tmp_path):
    """nvBWT .bwt write/read + nvSSA-style FM-index reconstruction."""
    import jax.numpy as jnp

    from nvbio_tpu.fmi.index import build_fmindex, fmindex_from_bwt
    from nvbio_tpu.fmi.search import backward_search_core, locate_core
    from nvbio_tpu.io.pac import load_bwt, save_bwt
    from nvbio_tpu import packed

    rng = np.random.default_rng(19)
    text = rng.integers(0, 4, size=700, dtype=np.uint8)
    orig = build_fmindex(text)

    p = str(tmp_path / "g.bwt")
    bwt_codes = packed.unpack(np.asarray(orig.bwt_words), orig.n, 2)
    save_bwt(bwt_codes, orig.primary, p)
    codes2, primary2, cum = load_bwt(p)
    np.testing.assert_array_equal(codes2, bwt_codes)
    assert primary2 == orig.primary
    assert cum[3] == orig.n

    # rebuild occ + sampled SA purely from the BWT (the nvSSA step)
    rebuilt = fmindex_from_bwt(codes2, primary2, sa_interval=orig.sa_interval)
    np.testing.assert_array_equal(np.asarray(rebuilt.bwt_words),
                                  np.asarray(orig.bwt_words))
    np.testing.assert_array_equal(np.asarray(rebuilt.ssa_vals),
                                  np.asarray(orig.ssa_vals))
    assert rebuilt.primary == orig.primary

    # end-to-end: searches through the rebuilt index find true positions
    f = rebuilt.device()
    for _ in range(10):
        s = int(rng.integers(0, 680))
        pat = jnp.asarray(text[s:s + 18].astype(np.int32))[None, :]
        lo, hi = backward_search_core(f, pat, jnp.asarray([18]))
        assert int(hi[0] - lo[0]) >= 1
        pos, ok = locate_core(f, lo)
        assert int(pos[0]) == s or int(hi[0] - lo[0]) > 1
