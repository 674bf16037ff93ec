"""Native SA-IS tests vs the numpy doubling oracle."""

import numpy as np
import pytest

from nvbio_tpu import native
from nvbio_tpu.index.sa import _suffix_array_doubling, suffix_array

pytestmark = pytest.mark.skipif(
    not native.sais_available(), reason="no C++ toolchain"
)


@pytest.mark.parametrize("n", [0, 1, 2, 3, 10, 100, 1000, 65537])
def test_sais_matches_doubling(rng, n):
    codes = rng.integers(0, 4, size=n, dtype=np.uint8)
    got = native.sais_u8(codes)
    want = _suffix_array_doubling(codes)
    np.testing.assert_array_equal(got, want)


def test_sais_repetitive(rng):
    # repetitive texts are the classic SA-IS stress (deep recursion)
    codes = np.tile(np.array([0, 1, 0, 1, 2], dtype=np.uint8), 5000)
    np.testing.assert_array_equal(
        native.sais_u8(codes), _suffix_array_doubling(codes)
    )
    codes = np.zeros(10000, dtype=np.uint8)  # all-same
    np.testing.assert_array_equal(
        native.sais_u8(codes), _suffix_array_doubling(codes)
    )


def test_suffix_array_auto_uses_native(rng):
    codes = rng.integers(0, 4, size=5000, dtype=np.uint8)
    np.testing.assert_array_equal(
        suffix_array(codes, method="native"), suffix_array(codes, method="doubling")
    )


def test_sais_speed(rng):
    import time

    codes = rng.integers(0, 4, size=4_000_000, dtype=np.uint8)
    t0 = time.time()
    sa = native.sais_u8(codes)
    dt = time.time() - t0
    assert len(sa) == 4_000_001
    # sanity: strictly increasing first symbols along SA
    s = np.concatenate([codes.astype(np.int32) + 1, [0]])
    first = s[sa]
    assert (np.diff(first) >= 0).all()
    # should be comfortably under the numpy doubling time (~6s)
    assert dt < 10


def test_native_bgzf_matches_python():
    import numpy as np
    import pytest

    from nvbio_tpu.native import bgzf_available

    if not bgzf_available():
        pytest.skip("native bgzf unavailable")
    import io as _io

    from nvbio_tpu.io.bgzf import BgzfReader, BgzfWriter

    rng = np.random.default_rng(2)
    # compressible + incompressible mix, crossing many block boundaries
    data = (rng.integers(0, 255, size=1_000_000, dtype=np.uint8).tobytes()
            + b"A" * 500_000)
    buf = _io.BytesIO()
    with BgzfWriter(buf, threads=4) as w:
        assert w._lib is not None
        for i in range(0, len(data), 100_000):
            w.write(data[i:i + 100_000])
    buf.seek(0)
    with BgzfReader(buf) as r:
        assert r.read_all() == data
    # stdlib gzip must also accept it
    import gzip

    buf.seek(0)
    assert gzip.decompress(buf.read()) == data


def test_native_bgzf_throughput_smoke():
    import time

    import numpy as np
    import pytest

    from nvbio_tpu.native import bgzf_available

    if not bgzf_available():
        pytest.skip("native bgzf unavailable")
    import io as _io

    from nvbio_tpu.io.bgzf import BgzfWriter

    data = np.random.default_rng(3).integers(
        0, 4, size=8_000_000, dtype=np.uint8).tobytes()
    t0 = time.time()
    with BgzfWriter(_io.BytesIO(), threads=8) as w:
        w.write(data)
    native_t = time.time() - t0
    t0 = time.time()
    w2 = BgzfWriter(_io.BytesIO(), threads=1)
    w2._lib = None  # force the Python block loop
    with w2:
        w2.write(data)
    py_t = time.time() - t0
    # don't assert a hard ratio (CI noise); just sanity that native ran
    print(f"native {8/native_t:.0f} MB/s vs python {8/py_t:.0f} MB/s")
    assert native_t < py_t * 2


def test_sais64_matches_sais32():
    """64-bit-index SA-IS == the int32 engine (the multi-GB single-string
    path differs only in index width)."""
    from nvbio_tpu import native

    if not native.sais_available():
        import pytest

        pytest.skip("native toolchain unavailable")
    rng = np.random.default_rng(4)
    for n in (1, 2, 17, 1000, 60000):
        codes = rng.integers(0, 4, n, np.uint8)
        a = native.sais_u8(codes)
        b = native.sais_u8_64(codes)
        np.testing.assert_array_equal(a.astype(np.int64), b)


def test_native_qgram_matches_numpy():
    """C++ counting-sort q-gram builder == the numpy golden model
    (offsets, positions, and the 1-mismatch mid_pos table), with and
    without N-flag window exclusion."""
    from nvbio_tpu import native

    if not native.qgram_available():
        import pytest

        pytest.skip("native toolchain unavailable")
    from nvbio_tpu.qgram import build_qgram_index

    rng = np.random.default_rng(11)
    for n, q, use_flags in [(1, 4, False), (64, 4, False),
                            (5000, 5, True), (70000, 12, True)]:
        codes = rng.integers(0, 4, size=n, dtype=np.uint8)
        flags = (rng.random(n) < 0.02) if use_flags else None
        a = build_qgram_index(codes, q, n_flags=flags, engine="native")
        b = build_qgram_index(codes, q, n_flags=flags, engine="numpy")
        assert a.offsets.dtype == b.offsets.dtype
        np.testing.assert_array_equal(a.offsets, b.offsets)
        np.testing.assert_array_equal(a.positions, b.positions)
        np.testing.assert_array_equal(a.mid_pos, b.mid_pos)


def test_qgram_midpos_roundtrip(tmp_path):
    """mid_pos survives save/load and marks empty buckets with the
    dtype-max sentinel."""
    from nvbio_tpu.qgram import build_qgram_index, QGramIndex

    rng = np.random.default_rng(12)
    codes = rng.integers(0, 4, size=300, dtype=np.uint8)
    idx = build_qgram_index(codes, 4)
    sent = np.iinfo(np.asarray(idx.offsets).dtype).max
    cnt = np.asarray(idx.offsets[1:]) - np.asarray(idx.offsets[:-1])
    mid = np.asarray(idx.mid_pos)
    assert (mid[cnt == 0] == sent).all()
    pos = np.asarray(idx.positions)
    off = np.asarray(idx.offsets)
    nz = np.flatnonzero(cnt)
    np.testing.assert_array_equal(
        mid[nz], pos[off[nz] + cnt[nz] // 2])
    p = tmp_path / "qg.npz"
    idx.save(str(p))
    idx2 = QGramIndex.load(str(p))
    np.testing.assert_array_equal(np.asarray(idx2.mid_pos), mid)


def test_lz4_codec_roundtrip():
    """Native LZ4 block codec (native/lz4.cpp — the in-repo replacement
    for the liblz4 the reference links in sufsort/file_bwt_lz4.cu):
    round-trips across empty/tiny/boundary/runs/incompressible inputs."""
    import numpy as np

    from nvbio_tpu import native

    rng = np.random.default_rng(3)
    cases = [
        b"", b"a", b"ab", b"x" * 11, b"y" * 12, b"z" * 13, b"w" * 100,
        b"abcabcabc" * 1000,
        bytes(rng.integers(0, 256, 65536, dtype=np.uint8)),
        bytes(np.zeros(300_000, np.uint8)),
        bytes((np.arange(131_072) % 253).astype(np.uint8)),
        bytes(rng.integers(0, 4, 100_003, dtype=np.uint8)),
    ]
    for i, c in enumerate(cases):
        comp = native.lz4_compress(c)
        assert bytes(native.lz4_decompress(comp, len(c))) == c, i
    # compressible input actually compresses
    z = native.lz4_compress(bytes(np.zeros(100_000, np.uint8)))
    assert len(z) < 1000


def test_lz4_bwt_file_roundtrip(tmp_path):
    """save_bwt(compress='lz4') <-> load_bwt: bit-exact vs the plain
    nvBWT format, auto-detected, and smaller on a repeat-rich BWT."""
    import os

    import numpy as np

    from nvbio_tpu.fmi.index import bwt_from_sa
    from nvbio_tpu.index.sa import suffix_array
    from nvbio_tpu.io.pac import load_bwt, save_bwt

    rng = np.random.default_rng(4)
    unit = rng.integers(0, 4, 400, dtype=np.uint8)
    codes = np.concatenate([np.tile(unit, 50),
                            rng.integers(0, 4, 30_000, dtype=np.uint8)])
    bwt, prim = bwt_from_sa(codes, suffix_array(codes))
    p0 = os.path.join(tmp_path, "x.bwt")
    p1 = os.path.join(tmp_path, "x.bwt.lz4")
    save_bwt(bwt, prim, p0)
    save_bwt(bwt, prim, p1, compress="lz4")
    for p in (p0, p1):
        back, bp, cum = load_bwt(p)
        assert bp == prim
        np.testing.assert_array_equal(back, bwt)
        assert int(cum[3]) == len(bwt)
    # the repeat-rich BWT stream must actually shrink
    assert os.path.getsize(p1) < os.path.getsize(p0)
