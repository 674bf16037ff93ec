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


# ---------------------------------------------------------------------------
# Incremental (mergeable) multi-string BWT — the BWTE scale-up path
# (``nvbio/sufsort/bwte.h:57-229``: merge_block over a PagedText). Blocks are
# built with BCR sentinel semantics ($_i < $_j for i < j, comparisons stop at
# sentinels, per-string circular BWT symbols), which makes each block's BWT
# self-contained; blocks then merge by Holt & McMillan interleave refinement
# ("Merging of multi-string BWTs with applications", 2014): repeat a stable
# counting-sort (LF) pass over the interleaved symbols until the interleave
# vector reaches its fixpoint — every pass is one dense vectorized sweep.
# ---------------------------------------------------------------------------


def mse_bwt(reads):
    """BCR-semantics multi-string BWT.

    Returns (bwt, tags): one entry per symbol incl. one '$' per read
    (alphabet {0:'$', 1..4}); ``tags[j]`` is the in-set string index of the
    '$' at row j (and -1 elsewhere). The tags give each sentinel a distinct
    identity so merges can LF-map '$' symbols to the right sentinel row —
    collapsed sentinels would resolve ties by cyclic continuation instead
    of string rank.
    """
    from nvbio_tpu.index.sa import _suffix_array_doubling

    S = len(reads)
    if S == 0:
        return np.zeros(0, np.uint8), np.zeros(0, np.int64)
    lens = [len(r) for r in reads]
    n = sum(lens) + S
    # linear text with DISTINCT increasing sentinels: suffix comparisons
    # stop at the first sentinel, so the order is per-string local
    text = np.zeros(n, np.int64)
    starts = np.zeros(S, np.int64)
    off = 0
    for i, r in enumerate(reads):
        starts[i] = off
        text[off:off + len(r)] = np.asarray(r, np.int64) + S
        text[off + len(r)] = i  # $_i
        off += len(r) + 1
    sa = _suffix_array_doubling(text)
    sa = sa[sa < n]  # drop the sorter's own global terminator row
    # owner string + circular previous symbol
    owner = np.searchsorted(starts, sa, side="right") - 1
    at_start = sa == starts[owner]
    prev = text[np.maximum(sa - 1, 0)]
    is_dollar = at_start | (prev < S)
    bwt = np.where(is_dollar, 0, prev - S + 1).astype(np.uint8)
    # tag: the string whose sentinel this is — circular wrap gives $_owner;
    # a mid-text '$' preceding suffix sa is $_{owner-1}'s? no: prev < S means
    # text[sa-1] is the sentinel of the PREVIOUS string == its own value
    tags = np.where(at_start, owner,
                    np.where(prev < S, prev, -1)).astype(np.int64)
    return bwt, tags


def merge_mse_bwts(bwt1, tags1, bwt2, tags2, max_rounds: int | None = None):
    """Merge two tagged multi-string BWTs (set-1 strings keep lower
    sentinel ranks). Holt-McMillan interleave refinement: each round is one
    stable LF redistribution of the interleave bits; sentinel symbols sort
    by their global string rank so LF sends each '$' to its own row."""
    n1, n2 = len(bwt1), len(bwt2)
    S1 = int(tags1.max()) + 1 if n1 else 0
    S2 = int(tags2.max()) + 1 if n2 else 0
    if n1 == 0:
        return bwt2.copy(), tags2.copy()
    if n2 == 0:
        return bwt1.copy(), tags1.copy()
    ST = S1 + S2
    # sort keys: sentinel rows first ordered by global string rank, then
    # bases by symbol value
    key1 = np.where(bwt1 == 0, tags1, ST + bwt1.astype(np.int64))
    key2 = np.where(bwt2 == 0, tags2 + S1, ST + bwt2.astype(np.int64))

    Z = np.concatenate([np.zeros(n1, bool), np.ones(n2, bool)])
    n = n1 + n2
    merged = np.empty(n, np.int64)
    rounds = 0
    while True:
        merged[~Z] = key1
        merged[Z] = key2
        # stable counting-sort destinations in O(n): every sentinel key
        # (the global string rank) occurs exactly once, so its destination
        # IS the key; the 4 base symbols distribute by cumulative count
        dest = merged.copy()  # sentinel rows: dest = tag
        base_hist = np.bincount(merged, minlength=ST + 5)[ST + 1:ST + 5]
        start_c = ST + np.concatenate([[0], np.cumsum(base_hist[:-1])])
        for c in range(1, 5):
            m = merged == ST + c
            if m.any():
                occ = np.cumsum(m) - 1
                dest[m] = start_c[c - 1] + occ[m]
        Znew = np.empty_like(Z)
        Znew[dest] = Z
        rounds += 1
        if np.array_equal(Znew, Z):
            break
        Z = Znew
        if max_rounds is not None and rounds >= max_rounds:
            break
    bwt = np.empty(n1 + n2, np.uint8)
    bwt[~Z] = bwt1
    bwt[Z] = bwt2
    tags = np.empty(n1 + n2, np.int64)
    tags[~Z] = tags1
    tags[Z] = np.where(tags2 >= 0, tags2 + S1, -1)
    return bwt, tags


def mse_bwt_incremental(reads, block_size: int = 100_000,
                        method: str = "paged") -> np.ndarray:
    """Block-incremental multi-string BWT (the reference's BWTE pipeline
    shape, ``nvSetBWT.cu:64-305``).

    method="paged" (default): BCR column insertion into a PagedText — data
    movement per block bounded by touched pages, the ``paged_text.h`` +
    ``bwte.h`` scale-up design (the reference reaches ~100 G symbols this
    way, ``sufsort/sufsort.h:47-49``).
    method="merge": per-block SA-IS + Holt-McMillan interleave merges."""
    if method == "paged":
        from nvbio_tpu.index.paged_text import PagedText, bwte_insert_block

        pt = PagedText(n_symbols=5)
        ns = 0
        for i in range(0, len(reads), block_size):
            ns = bwte_insert_block(pt, reads[i:i + block_size], ns)
        return pt.gather()
    acc = np.zeros(0, np.uint8)
    acc_tags = np.zeros(0, np.int64)
    for i in range(0, len(reads), block_size):
        bwt, tags = mse_bwt(reads[i:i + block_size])
        acc, acc_tags = merge_mse_bwts(acc, acc_tags, bwt, tags)
    return acc
