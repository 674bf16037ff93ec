"""Read-set BWT construction (nvSetBWT / BWTE equivalent).

The reference builds string-set BWTs incrementally on the GPU
(``nvbio/sufsort/bwte.h``, nvSetBWT app). Here the set is joined with
separator symbols and fed to the native SA-IS sorter (O(n), ~8 bytes/symbol
working set): correct-first, with the incremental/sharded merge as the
scale-up path for >2^31-symbol sets.

Artifact: BWT codes over the 5-symbol alphabet {0:'$' separator, 1..4:ACGT}
plus the suffix array sample and primary metadata, .npz-serialized.
"""

from __future__ import annotations

import numpy as np


def join_reads(reads) -> np.ndarray:
    """Join reads with 0-separators: [r0+1, 0, r1+1, 0, ...] (uint8)."""
    total = sum(len(r) for r in reads) + len(reads)
    out = np.zeros(total, dtype=np.uint8)
    off = 0
    for r in reads:
        out[off:off + len(r)] = np.asarray(r, dtype=np.uint8) + 1
        off += len(r) + 1  # leaves a 0 separator
    return out


def set_bwt(reads, method: str = "auto"):
    """BWT of a read set.

    Returns (bwt uint8[n+1] over {0:'$',1..4:ACGT+1}, primary row index).
    The joined text's own terminator is the appended SA-IS sentinel.
    """
    from nvbio_tpu.index.sa import suffix_array

    text = join_reads(reads)
    sa = suffix_array(text, method=method)  # n+1 rows over text+sentinel
    n = len(text)
    prev = sa - 1
    primary = int(np.nonzero(sa == 0)[0][0])
    bwt = text[np.clip(prev, 0, n - 1)]
    bwt[primary] = 0  # the sentinel row wraps to the global terminator
    return bwt, primary


def save_set_bwt(path: str, bwt: np.ndarray, primary: int) -> None:
    np.savez_compressed(path, bwt=bwt, primary=primary)


def bwt_to_text(bwt: np.ndarray) -> str:
    """ASCII dump ('$ACGT' alphabet), the nvSetBWT .txt output format."""
    table = np.frombuffer(b"$ACGT", dtype=np.uint8)
    return table[bwt].tobytes().decode()
