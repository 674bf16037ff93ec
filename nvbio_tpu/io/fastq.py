"""FASTQ reading: whole-buffer vectorized parse into dense padded batches.

The reference streams FASTQ through a dedicated input thread into reusable
pinned buffers (``nvBowtie/bowtie2/cuda/input_thread.h``); the TPU analogue
is `fastq_batches`, a generator yielding fixed-shape numpy batches that the
pipeline overlaps with device steps via double-buffered `device_put`.

Parsing is bytes-in, arrays-out: sequence/quality lines are joined into one
flat buffer and translated/scattered into the padded (B, L) matrices with
single numpy ops — no per-read loop touches symbol data.
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
        name = (lines[i][1:].split() or [b""])[0].decode()
        out.append((name, lines[i + 1].decode(), lines[i + 3].decode()))
    return out


def _fill_padded(chunks, max_len: int):
    """bytes rows -> (padded uint8 matrix, lengths) via one flat gather."""
    B = len(chunks)
    lens = np.fromiter((len(c) for c in chunks), np.int64, count=B)
    lens = np.minimum(lens, max_len)
    flat = np.frombuffer(b"".join(chunks), np.uint8)
    starts = np.zeros(B, np.int64)
    np.cumsum(np.fromiter((len(c) for c in chunks), np.int64, count=B)[:-1],
              out=starts[1:])
    if len(flat) == 0:  # every chunk empty: no symbols to gather
        return np.zeros((B, max_len), np.uint8), lens.astype(np.int32)
    idx = starts[:, None] + np.arange(max_len)
    valid = np.arange(max_len)[None, :] < lens[:, None]
    mat = flat[np.minimum(idx, max(len(flat) - 1, 0))] * valid
    return mat.astype(np.uint8), lens.astype(np.int32)


def batch_from_bytes(names, seq_lines, qual_lines, max_len: int,
                     alphabet: Alphabet = Alphabet.DNA) -> ReadBatch:
    """Build a ReadBatch from raw bytes lines (vectorized, no per-read ops)."""
    table = _TO_CODE[alphabet]
    seq_mat, lengths = _fill_padded(seq_lines, max_len)
    qual_mat, _ = _fill_padded(qual_lines, max_len)
    codes = table[seq_mat]
    valid = np.arange(max_len)[None, :] < lengths[:, None]
    codes = np.where(valid, codes, 0).astype(np.uint8)
    quals = np.where(valid, np.maximum(qual_mat, 33) - 33, 0).astype(np.uint8)
    return ReadBatch(names, codes, quals, lengths)


def batch_from_records(
    records, max_len: int, alphabet: Alphabet = Alphabet.DNA
) -> ReadBatch:
    names = [r[0] for r in records]
    seqs = [r[1].encode() for r in records]
    quals = [r[2].encode() for r in records]
    return batch_from_bytes(names, seqs, quals, max_len, alphabet)


def fastq_batches(
    path: str, batch_size: int, max_len: int, alphabet: Alphabet = Alphabet.DNA,
    pad_to_full: bool = True,
):
    """Yield fixed-shape ReadBatches; the final batch is zero-padded to
    batch_size (static shapes for jit) with lengths == 0 marking padding.

    Also accepts raw TXT read files (one sequence per line, like the
    reference's TXT sequence loader) by extension .txt/.txt.gz."""
    if path.endswith((".txt", ".txt.gz")):
        yield from txt_batches(path, batch_size, max_len, alphabet,
                               pad_to_full)
        return
    with _open_maybe_gz(path) as f:
        data = f.read()
    lines = data.split(b"\n")
    # only complete 4-line records count: a trailing newline adds one empty
    # element, and records truncated mid-way are dropped (as read_fastq did)
    n_reads = len(lines) // 4
    for i in range(0, n_reads, batch_size):
        j = min(i + batch_size, n_reads)
        names = [(lines[4 * b][1:].split() or [b""])[0].decode()
                 for b in range(i, j)]
        seqs = [lines[4 * b + 1] for b in range(i, j)]
        quals = [lines[4 * b + 3] for b in range(i, j)]
        batch = batch_from_bytes(names, seqs, quals, max_len, alphabet)
        if pad_to_full and (j - i) < batch_size:
            pad = batch_size - (j - i)
            batch = ReadBatch(
                batch.names + [""] * pad,
                np.pad(batch.codes, ((0, pad), (0, 0))),
                np.pad(batch.quals, ((0, pad), (0, 0))),
                np.pad(batch.lengths, (0, pad)),
            )
        yield batch


def txt_batches(
    path: str, batch_size: int, max_len: int, alphabet: Alphabet = Alphabet.DNA,
    pad_to_full: bool = True,
):
    """Raw text reads (one per line, no names/qualities) -> ReadBatches."""
    with _open_maybe_gz(path) as f:
        data = f.read()
    lines = [ln for ln in data.split(b"\n") if ln]
    for i in range(0, len(lines), batch_size):
        chunk = lines[i:i + batch_size]
        names = [f"read{i + j}" for j in range(len(chunk))]
        quals = [b"I" * len(s) for s in chunk]
        batch = batch_from_bytes(names, chunk, quals, max_len, alphabet)
        if pad_to_full and len(chunk) < batch_size:
            pad = batch_size - len(chunk)
            batch = ReadBatch(
                batch.names + [""] * pad,
                np.pad(batch.codes, ((0, pad), (0, 0))),
                np.pad(batch.quals, ((0, pad), (0, 0))),
                np.pad(batch.lengths, (0, pad)),
            )
        yield batch
