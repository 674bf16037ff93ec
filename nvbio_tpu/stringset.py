"""String sets: batched, fixed-shape containers for collections of sequences.

Capability parity with the reference's storage-free string-set views
(``nvbio/strings/string_set.h:60-88``): a *concatenated* layout (one flat
symbol array + offsets) for host-side storage, and a *dense padded* layout
(``[batch, max_len]`` int8/int32 + lengths) for the device — because TPU/XLA
wants static shapes, the dense padded form is the canonical on-device view
(the reference's equivalent concern is MAX_READ_LEN bounding,
``nvBowtie/bowtie2/cuda/defs.h:96``).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from nvbio_tpu.alphabet import Alphabet, string_to_codes


@dataclasses.dataclass
class ConcatStringSet:
    """Host-side concatenated string set: flat codes + offsets (numpy)."""

    codes: np.ndarray      # uint8[total_symbols]
    offsets: np.ndarray    # int64[n + 1]
    alphabet: Alphabet = Alphabet.DNA

    @classmethod
    def from_strings(cls, strings, alphabet: Alphabet = Alphabet.DNA):
        codes = [string_to_codes(s, alphabet) for s in strings]
        offsets = np.zeros(len(codes) + 1, dtype=np.int64)
        np.cumsum([len(c) for c in codes], out=offsets[1:])
        flat = np.concatenate(codes) if codes else np.zeros(0, dtype=np.uint8)
        return cls(flat, offsets, alphabet)

    def __len__(self) -> int:
        return len(self.offsets) - 1

    def __getitem__(self, i: int) -> np.ndarray:
        return self.codes[self.offsets[i]:self.offsets[i + 1]]

    @property
    def lengths(self) -> np.ndarray:
        return np.diff(self.offsets)

    def to_padded(self, max_len: int | None = None, pad_value: int = 0):
        """Densify to (n, max_len) int8 plus int32 lengths — the device view."""
        lens = self.lengths
        ml = int(max_len if max_len is not None else (lens.max() if len(lens) else 0))
        if len(lens) and lens.max() > ml:
            raise ValueError(f"sequence longer than max_len={ml}")
        out = np.full((len(self), ml), pad_value, dtype=np.uint8)
        # vectorized scatter of the flat codes into the padded matrix
        if len(self):
            row = np.repeat(np.arange(len(self)), lens)
            col = np.arange(len(self.codes)) - np.repeat(self.offsets[:-1], lens)
            out[row, col] = self.codes
        return PaddedStringSet(out, lens.astype(np.int32), self.alphabet)


@dataclasses.dataclass
class PaddedStringSet:
    """Dense padded string set: the canonical fixed-shape device container."""

    codes: np.ndarray     # uint8[n, max_len]  (or jax.Array on device)
    lengths: np.ndarray   # int32[n]
    alphabet: Alphabet = Alphabet.DNA

    def __len__(self) -> int:
        return self.codes.shape[0]

    @property
    def max_len(self) -> int:
        return self.codes.shape[1]

    def device(self):
        import jax.numpy as jnp

        return PaddedStringSet(
            jnp.asarray(self.codes), jnp.asarray(self.lengths), self.alphabet
        )

    def mask(self):
        """Boolean validity mask of shape (n, max_len)."""
        xp = np if isinstance(self.codes, np.ndarray) else _jnp()
        return xp.arange(self.max_len)[None, :] < xp.asarray(self.lengths)[:, None]


def make_infix_set(base: np.ndarray, starts: np.ndarray, length: int) -> np.ndarray:
    """Dense infix view: gather fixed-length windows (seeds) from flat codes.

    Equivalent of the reference's InfixSet over a string (seed extraction):
    returns (len(starts), length) array. Out-of-range reads are clamped.
    """
    idx = np.clip(starts[:, None] + np.arange(length)[None, :], 0, len(base) - 1)
    return base[idx]


def _jnp():
    import jax.numpy as jnp

    return jnp
