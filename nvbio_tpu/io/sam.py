"""SAM alignment output (+ a minimal reader for diff tooling).

Counterpart of the reference's OutputFile/SamOutput
(``io/output/output_sam.h:43-125``): header with @SQ per contig, standard
11-column records with AS/NM/MD tags. BAM/BGZF is a planned native (C++)
codec behind the same interface.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from nvbio_tpu.alphabet import Alphabet, codes_to_string

FLAG_PAIRED = 0x1
FLAG_PROPER_PAIR = 0x2
FLAG_UNMAPPED = 0x4
FLAG_MATE_UNMAPPED = 0x8
FLAG_REVERSE = 0x10
FLAG_MATE_REVERSE = 0x20
FLAG_FIRST_IN_PAIR = 0x40
FLAG_SECOND_IN_PAIR = 0x80
FLAG_SECONDARY = 0x100


@dataclasses.dataclass
class SamRecord:
    qname: str
    flag: int
    rname: str
    pos: int          # 1-based leftmost mapping position (0 if unmapped)
    mapq: int
    cigar: str
    seq: str
    qual: str
    rnext: str = "*"
    pnext: int = 0
    tlen: int = 0
    tags: dict | None = None

    def line(self) -> str:
        cols = [
            self.qname, str(self.flag), self.rname, str(self.pos),
            str(self.mapq), self.cigar, self.rnext, str(self.pnext),
            str(self.tlen), self.seq, self.qual,
        ]
        if self.tags:
            for k, v in self.tags.items():
                t = "i" if isinstance(v, (int, np.integer)) else "Z"
                cols.append(f"{k}:{t}:{v}")
        return "\t".join(cols)


class SamWriter:
    def __init__(self, path_or_file, ref_names, ref_lengths, program="nvbio_tpu",
                 sort_order="unsorted"):
        self._own = isinstance(path_or_file, str)
        self.f = open(path_or_file, "w") if self._own else path_or_file
        self.f.write(f"@HD\tVN:1.6\tSO:{sort_order}\n")
        for name, length in zip(ref_names, ref_lengths):
            self.f.write(f"@SQ\tSN:{name}\tLN:{int(length)}\n")
        self.f.write(f"@PG\tID:{program}\tPN:{program}\n")
        self.n_records = 0

    def write(self, rec: SamRecord) -> None:
        self.f.write(rec.line() + "\n")
        self.n_records += 1

    def close(self) -> None:
        if self._own:
            self.f.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def quals_to_string(quals: np.ndarray, length: int) -> str:
    q = np.asarray(quals[:length], dtype=np.uint8) + 33
    return q.tobytes().decode()


def read_sam(path: str):
    """Minimal SAM reader -> (header_lines, list of column lists)."""
    header, recs = [], []
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            if line.startswith("@"):
                header.append(line)
            else:
                recs.append(line.split("\t"))
    return header, recs
