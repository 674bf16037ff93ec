"""Packed-stream / alphabet / string-set golden tests (numpy oracle pattern,

mirroring the reference's nvbio-test packedstream + string-set subtests)."""

import numpy as np
import pytest

from nvbio_tpu.alphabet import (
    Alphabet,
    codes_to_string,
    reverse_complement_codes,
    string_to_codes,
    symbol_count,
    symbol_size,
)
from nvbio_tpu import packed
from nvbio_tpu.stringset import ConcatStringSet, make_infix_set


def test_alphabet_roundtrip():
    s = "ACGTACGTTTGACG"
    codes = string_to_codes(s, Alphabet.DNA)
    assert codes.tolist() == [0, 1, 2, 3, 0, 1, 2, 3, 3, 3, 2, 0, 1, 2]
    assert codes_to_string(codes, Alphabet.DNA) == s


def test_alphabet_sizes():
    assert symbol_size(Alphabet.DNA) == 2
    assert symbol_size(Alphabet.DNA_IUPAC) == 4
    assert symbol_count(Alphabet.PROTEIN) == 24
    assert string_to_codes("=ACMGRSVTWYHKDBN", Alphabet.DNA_IUPAC).tolist() == list(
        range(16)
    )


def test_reverse_complement():
    codes = string_to_codes("AACGT", Alphabet.DNA)
    rc = reverse_complement_codes(codes)
    assert codes_to_string(rc) == "ACGTT"


@pytest.mark.parametrize("bits", [2, 4, 8])
@pytest.mark.parametrize("n", [0, 1, 15, 16, 17, 1000])
def test_pack_roundtrip(rng, bits, n):
    syms = rng.integers(0, 1 << bits, size=n, dtype=np.uint8)
    words = packed.pack(syms, bits)
    assert words.dtype == np.uint32
    assert len(words) == packed.words_for(n, bits)
    out = packed.unpack(words, n, bits)
    np.testing.assert_array_equal(out, syms)


def test_pack_layout_lsb_first():
    # symbol 0 in the low bits: [1,2,3] @2bit -> 0b111001
    words = packed.pack(np.array([1, 2, 3], dtype=np.uint8), 2)
    assert words[0] == 0b111001


@pytest.mark.parametrize("xp_dev", [False, True])
def test_gather_symbols(rng, xp_dev):
    syms = rng.integers(0, 4, size=777, dtype=np.uint8)
    words = packed.pack(syms, 2)
    idx = rng.integers(0, 777, size=256)
    if xp_dev:
        import jax.numpy as jnp

        got = np.asarray(packed.gather_symbols(jnp.asarray(words), jnp.asarray(idx), 2))
    else:
        got = packed.gather_symbols(words, idx, 2)
    np.testing.assert_array_equal(got, syms[idx].astype(np.int32))


def test_extract_window(rng):
    import jax.numpy as jnp

    syms = rng.integers(0, 4, size=512, dtype=np.uint8)
    words = jnp.asarray(packed.pack(syms, 2))
    starts = jnp.asarray([0, 100, 500])  # last clamps off the end
    win = np.asarray(packed.extract_window(words, starts, 16, 2))
    np.testing.assert_array_equal(win[0], syms[:16])
    np.testing.assert_array_equal(win[1], syms[100:116])


def test_concat_string_set():
    ss = ConcatStringSet.from_strings(["ACGT", "A", "GGGGGG"])
    assert len(ss) == 3
    np.testing.assert_array_equal(ss.lengths, [4, 1, 6])
    assert codes_to_string(ss[2]) == "GGGGGG"
    padded = ss.to_padded()
    assert padded.codes.shape == (3, 6)
    assert padded.codes[1, 0] == 0 and padded.lengths[1] == 1
    m = padded.mask()
    assert m.sum() == 11


def test_infix_set(rng):
    base = rng.integers(0, 4, size=100, dtype=np.uint8)
    starts = np.array([0, 10, 50])
    inf = make_infix_set(base, starts, 20)
    np.testing.assert_array_equal(inf[1], base[10:30])
