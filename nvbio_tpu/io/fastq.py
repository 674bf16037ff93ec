"""FASTQ reading: whole-buffer vectorized parse into dense padded batches.

The reference streams FASTQ through a dedicated input thread into reusable
pinned buffers (``nvBowtie/bowtie2/cuda/input_thread.h``); the TPU analogue
is `fastq_batches`, a generator yielding fixed-shape numpy batches that the
pipeline overlaps with device steps via double-buffered `device_put`.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from nvbio_tpu.alphabet import Alphabet, string_to_codes, _TO_CODE
from nvbio_tpu.io.fasta import _open_maybe_gz


@dataclasses.dataclass
class ReadBatch:
    """A dense batch of reads (the device-facing container)."""

    names: list[str]
    codes: np.ndarray    # uint8[B, max_len] symbol codes (pad 0)
    quals: np.ndarray    # uint8[B, max_len] Phred+0 qualities (pad 0)
    lengths: np.ndarray  # int32[B]

    def __len__(self) -> int:
        return len(self.names)


def read_fastq(path: str) -> list[tuple[str, str, str]]:
    """[(name, seq, qual_string), ...]"""
    with _open_maybe_gz(path) as f:
        data = f.read()
    lines = data.split(b"\n")
    out = []
    for i in range(0, len(lines) - 3, 4):
        name = lines[i][1:].split()[0].decode()
        out.append((name, lines[i + 1].decode(), lines[i + 3].decode()))
    return out


def batch_from_records(
    records, max_len: int, alphabet: Alphabet = Alphabet.DNA
) -> ReadBatch:
    B = len(records)
    codes = np.zeros((B, max_len), dtype=np.uint8)
    quals = np.zeros((B, max_len), dtype=np.uint8)
    lengths = np.zeros(B, dtype=np.int32)
    table = _TO_CODE[alphabet]
    names = []
    for b, (name, seq, qual) in enumerate(records):
        L = min(len(seq), max_len)
        raw = np.frombuffer(seq[:L].encode(), dtype=np.uint8)
        codes[b, :L] = table[raw]
        q = np.frombuffer(qual[:L].encode(), dtype=np.uint8)
        quals[b, :L] = np.maximum(q, 33) - 33
        lengths[b] = L
        names.append(name)
    return ReadBatch(names, codes, quals, lengths)


def fastq_batches(
    path: str, batch_size: int, max_len: int, alphabet: Alphabet = Alphabet.DNA,
    pad_to_full: bool = True,
):
    """Yield fixed-shape ReadBatches; the final batch is zero-padded to
    batch_size (static shapes for jit) with lengths == 0 marking padding."""
    records = read_fastq(path)
    for i in range(0, len(records), batch_size):
        chunk = records[i:i + batch_size]
        batch = batch_from_records(chunk, max_len, alphabet)
        if pad_to_full and len(chunk) < batch_size:
            pad = batch_size - len(chunk)
            batch = ReadBatch(
                batch.names + [""] * pad,
                np.pad(batch.codes, ((0, pad), (0, 0))),
                np.pad(batch.quals, ((0, pad), (0, 0))),
                np.pad(batch.lengths, (0, pad)),
            )
        yield batch
