"""Alphabets and character <-> code conversion tables.

Capability parity with the reference's alphabet layer
(``nvbio/strings/alphabet.h:68-140``): DNA, DNA_N, DNA_IUPAC, PROTEIN, RNA,
RNA_N and ASCII alphabets with the same symbol orderings, so that packed
artifacts and test vectors are interchangeable at the symbol-code level.

Everything here is host-side numpy: conversion happens once at I/O time; the
device only ever sees integer symbol codes (packed or widened to int8/int32).
"""

from __future__ import annotations

import enum

import numpy as np


class Alphabet(enum.IntEnum):
    """Supported alphabets (same ordering/values as the reference enum)."""

    DNA = 0        # 4-letter  {A,C,G,T},       2 bits
    DNA_N = 1      # 5-letter  {A,C,G,T,N},     4 bits
    DNA_IUPAC = 2  # 16-letter {=,A,C,M,G,R,S,V,T,W,Y,H,K,D,B,N}, 4 bits
    PROTEIN = 3    # 24-letter,                 8 bits
    RNA = 4        # 4-letter  {A,C,G,U},       2 bits
    RNA_N = 5      # 5-letter  {A,C,G,U,N},     4 bits
    ASCII = 6      # raw bytes,                 8 bits


_SYMBOLS = {
    Alphabet.DNA: "ACGT",
    Alphabet.DNA_N: "ACGTN",
    Alphabet.DNA_IUPAC: "=ACMGRSVTWYHKDBN",
    Alphabet.PROTEIN: "ACDEFGHIKLMNOPQRSTVWYBZX",
    Alphabet.RNA: "ACGU",
    Alphabet.RNA_N: "ACGUN",
}

_SYMBOL_BITS = {
    Alphabet.DNA: 2,
    Alphabet.DNA_N: 4,
    Alphabet.DNA_IUPAC: 4,
    Alphabet.PROTEIN: 8,
    Alphabet.RNA: 2,
    Alphabet.RNA_N: 4,
    Alphabet.ASCII: 8,
}


def symbol_size(alphabet: Alphabet) -> int:
    """Bits per symbol for ``alphabet``."""
    return _SYMBOL_BITS[Alphabet(alphabet)]


def symbol_count(alphabet: Alphabet) -> int:
    """Number of symbols in ``alphabet``."""
    alphabet = Alphabet(alphabet)
    if alphabet == Alphabet.ASCII:
        return 256
    return len(_SYMBOLS[alphabet])


def _build_tables(alphabet: Alphabet) -> tuple[np.ndarray, np.ndarray]:
    """(char->code uint8[256], code->char uint8[symbol_count]) tables."""
    alphabet = Alphabet(alphabet)
    if alphabet == Alphabet.ASCII:
        ident = np.arange(256, dtype=np.uint8)
        return ident, ident
    syms = _SYMBOLS[alphabet]
    to_code = np.zeros(256, dtype=np.uint8)
    # Unknown characters map to the alphabet's "N"-like catch-all: the last
    # symbol for alphabets that have N, else 0 (matches the reference's
    # treatment of unknowns as N / default code).
    default = len(syms) - 1 if "N" in syms or "X" in syms else 0
    to_code[:] = default
    for code, ch in enumerate(syms):
        to_code[ord(ch)] = code
        to_code[ord(ch.lower())] = code
    if alphabet in (Alphabet.DNA, Alphabet.RNA):
        # 4-letter alphabets canonically fold N (and friends) onto A=0 for
        # packing purposes; real pipelines carry N masks separately.
        pass
    from_code = np.frombuffer(syms.encode(), dtype=np.uint8).copy()
    return to_code, from_code


_TO_CODE = {a: _build_tables(a)[0] for a in Alphabet}
_FROM_CODE = {a: _build_tables(a)[1] for a in Alphabet}

# IUPAC 16-bit mask semantics: bit i set => DNA code i is compatible.
# code order {=,A,C,M,G,R,S,V,T,W,Y,H,K,D,B,N}; '=' means "match anything
# previously seen" in BAM, here treated as empty mask.
IUPAC_TO_DNA_MASK = np.array(
    [0x0, 0x1, 0x2, 0x3, 0x4, 0x5, 0x6, 0x7, 0x8, 0x9, 0xA, 0xB, 0xC, 0xD, 0xE, 0xF],
    dtype=np.uint8,
)


def string_to_codes(s: str | bytes, alphabet: Alphabet = Alphabet.DNA) -> np.ndarray:
    """Convert a character string to uint8 symbol codes."""
    if isinstance(s, str):
        s = s.encode()
    raw = np.frombuffer(s, dtype=np.uint8)
    return _TO_CODE[Alphabet(alphabet)][raw]


def codes_to_string(codes: np.ndarray, alphabet: Alphabet = Alphabet.DNA) -> str:
    """Convert uint8 symbol codes back to a character string."""
    table = _FROM_CODE[Alphabet(alphabet)]
    return table[np.asarray(codes, dtype=np.uint8)].tobytes().decode()


def complement_codes(codes: np.ndarray, alphabet: Alphabet = Alphabet.DNA) -> np.ndarray:
    """DNA/RNA complement in code space (A<->T/U, C<->G => c ^ 3 == 3 - c)."""
    alphabet = Alphabet(alphabet)
    codes = np.asarray(codes)
    if alphabet in (Alphabet.DNA, Alphabet.RNA):
        return (3 - codes).astype(codes.dtype)
    if alphabet in (Alphabet.DNA_N, Alphabet.RNA_N):
        comp = np.where(codes < 4, 3 - codes, codes)
        return comp.astype(codes.dtype)
    raise ValueError(f"complement undefined for alphabet {alphabet}")


def reverse_complement_codes(
    codes: np.ndarray, alphabet: Alphabet = Alphabet.DNA
) -> np.ndarray:
    """Reverse-complement in code space."""
    return complement_codes(codes, alphabet)[..., ::-1]
