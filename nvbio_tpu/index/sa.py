"""Suffix-array construction.

``suffix_array``: Manber-Myers prefix doubling, fully vectorized numpy —
O(n log n) argsort rounds with early exit once ranks are unique (DNA text
typically needs ~12 rounds for megabase genomes). Returns the SA of T$
(n+1 entries, sa[0] == n).

The reference's equivalents are the GPU blockwise/DCS suffix sorter
(``nvbio/sufsort``) and libdivsufsort on the host. Here the host fast path
is the native C++ 64-bit SA-IS engine (``native/sais.cpp``, method
"native"/"auto"); the accelerator path — prefix doubling over ``lax.sort``,
the analogue of the reference's GPU sorter — lives in
``index.device_sa`` (``suffix_array(..., method="device")``).
"""

from __future__ import annotations

import numpy as np


def suffix_array(codes: np.ndarray, method: str = "auto") -> np.ndarray:
    """SA of text + sentinel (n+1 entries, sa[0] == n).

    method: "native" (C++ SA-IS, O(n)), "doubling" (numpy, O(n log^2 n)),
    "device" (prefix doubling over lax.sort on the default JAX device),
    or "auto" (native if the toolchain is available, else doubling).
    """
    if method == "device":
        from nvbio_tpu.index.device_sa import suffix_array_device

        return suffix_array_device(codes)
    if method in ("auto", "native"):
        try:
            from nvbio_tpu import native

            K = int(np.max(codes)) + 1 if len(codes) else 1
            return native.sais_u8(codes, K=max(K, 4)).astype(np.int64)
        except Exception:
            if method == "native":
                raise
    return _suffix_array_doubling(codes)


def _suffix_array_doubling(codes: np.ndarray) -> np.ndarray:
    """Manber-Myers prefix doubling, fully vectorized numpy."""
    codes = np.asarray(codes)
    n = len(codes)
    s = np.empty(n + 1, dtype=np.int64)
    s[:n] = codes.astype(np.int64) + 1
    s[n] = 0
    m = n + 1

    sa = np.argsort(s, kind="stable")
    rank = np.empty(m, dtype=np.int64)
    keys = s[sa]
    rank[sa] = np.cumsum(np.concatenate([[0], keys[1:] != keys[:-1]]))

    k = 1
    while rank[sa[-1]] != m - 1:  # until all ranks unique
        idx = np.arange(m, dtype=np.int64)
        second = np.full(m, -1, dtype=np.int64)
        valid = idx + k < m
        second[valid] = rank[idx[valid] + k]
        key = rank * (m + 1) + (second + 1)
        sa = np.argsort(key, kind="stable")
        sk = key[sa]
        rank[sa] = np.cumsum(np.concatenate([[0], sk[1:] != sk[:-1]]))
        k *= 2

    return sa
