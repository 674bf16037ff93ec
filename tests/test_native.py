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
