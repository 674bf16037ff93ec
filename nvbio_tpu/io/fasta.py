"""FASTA reading/writing (plain or gzip).

Counterpart of ``nvbio/fasta`` — buffered, whole-file vectorized parsing
(bioinformatics FASTA files are line-wrapped; we byte-split once instead of
line-looping).
"""

from __future__ import annotations

import gzip
import io as _io


def _open_maybe_gz(path: str, mode: str = "rb"):
    if str(path).endswith(".gz"):
        return gzip.open(path, mode)
    return open(path, mode)


def read_fasta(path: str) -> list[tuple[str, str]]:
    """[(name, sequence_string), ...] — names truncated at first whitespace."""
    out: list[tuple[str, str]] = []
    name = None
    chunks: list[bytes] = []
    with _open_maybe_gz(path) as f:
        data = f.read()
    for line in data.split(b"\n"):
        if not line:
            continue
        if line.startswith(b">"):
            if name is not None:
                out.append((name, b"".join(chunks).decode()))
            name = line[1:].split()[0].decode() if len(line) > 1 else ""
            chunks = []
        else:
            chunks.append(line.strip())
    if name is not None:
        out.append((name, b"".join(chunks).decode()))
    return out


def write_fasta(path: str, records, width: int = 70) -> None:
    with _open_maybe_gz(path, "wb") as f:
        buf = _io.BytesIO()
        for name, seq in records:
            buf.write(b">" + name.encode() + b"\n")
            for i in range(0, len(seq), width):
                buf.write(seq[i:i + width].encode() + b"\n")
        f.write(buf.getvalue())
