"""FM-index container, construction, and artifacts.

Equivalent surface to the reference's ``fm_index`` (``fmindex.h:341-633``) +
``FMIndexData`` I/O containers (``io/fmindex/fmindex.h:80-327``): the packed
BWT with occurrence checkpoints, the C (L2) counts, the primary row (the
BWA-style removed-sentinel trick), and a mark-bitvector sampled suffix array
(<= K LF-steps per locate, the reference's SSA_value_multiple scheme,
``ssa.h``).

SA-row conventions: rows index the suffixes of T$ (n+1 rows, row 0 = "$"),
``primary`` is the row whose suffix is the whole text (SA[primary] = 0); the
stored BWT has the sentinel removed (length n).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import numpy as np

from nvbio_tpu import packed
from nvbio_tpu.fmi import rank as rank_mod


@dataclasses.dataclass
class FMIndex:
    """Device-ready FM-index (arrays may be numpy or jax)."""

    bwt_words: Any        # uint32[ceil(n/16)] — 2-bit packed BWT ($ removed)
    occ: Any              # int32[n_blocks+1, 4] — checkpoints every 64 syms
    count: Any            # int32[5] — C[c] = 1 + #symbols < c (the +1 is $)
    primary: int          # row of the sentinel in the (virtual) full BWT
    n: int                # text length
    # sampled suffix array (mark-bitvector scheme):
    sa_interval: int      # K: SA[i] stored where SA[i] % K == 0
    ssa_marks: Any        # uint32[ceil((n+1)/32)] bit i => row i is sampled
    ssa_cum: Any          # int32[n_words] exclusive popcount prefix of marks
    ssa_vals: Any         # int32[n_samples] sampled SA values, in row order
    # optional k-mer interval lookup table (bowtie2's "ftab"; the
    # reference's seeding also jumps the first steps through an index,
    # mapping.h:57-163): SA intervals of ALL 4^k patterns, so a backward
    # search starts k symbols in — build with ``attach_ftab``
    ftab_k: int = 0
    ftab_lo: Any = None   # int32[4^k]
    ftab_hi: Any = None   # int32[4^k]
    # fused interleaved rank rows (rank.build_rank_table): the hot-path
    # layout — one (1, 128) uint32 tile-row gather per rank query. Built
    # lazily by device(); None falls back to the split occ/words path.
    ranktab: Any = None   # uint32[n//RT_K + 1, 128]

    def device(self) -> "FMIndex":
        import jax.numpy as jnp

        if self.ranktab is not None:
            ranktab = jnp.asarray(self.ranktab)
        elif rank_mod.want_fused_ranktab():
            ranktab = rank_mod.build_rank_table_device(
                jnp.asarray(self.bwt_words), int(self.n))
        else:
            ranktab = None
        return FMIndex(
            jnp.asarray(self.bwt_words),
            jnp.asarray(self.occ),
            jnp.asarray(self.count),
            int(self.primary),
            int(self.n),
            int(self.sa_interval),
            jnp.asarray(self.ssa_marks),
            jnp.asarray(self.ssa_cum),
            jnp.asarray(self.ssa_vals),
            int(self.ftab_k),
            None if self.ftab_lo is None else jnp.asarray(self.ftab_lo),
            None if self.ftab_hi is None else jnp.asarray(self.ftab_hi),
            ranktab,
        )

    def save(self, path: str) -> None:
        np.savez_compressed(
            path,
            bwt_words=np.asarray(self.bwt_words),
            occ=np.asarray(self.occ),
            count=np.asarray(self.count),
            primary=self.primary,
            n=self.n,
            sa_interval=self.sa_interval,
            ssa_marks=np.asarray(self.ssa_marks),
            ssa_cum=np.asarray(self.ssa_cum),
            ssa_vals=np.asarray(self.ssa_vals),
        )

    @classmethod
    def load(cls, path: str) -> "FMIndex":
        z = np.load(path)
        return cls(
            z["bwt_words"], z["occ"], z["count"], int(z["primary"]), int(z["n"]),
            int(z["sa_interval"]), z["ssa_marks"], z["ssa_cum"], z["ssa_vals"],
        )


# Register as a pytree so whole-index objects flow through jit/scan/shard_map:
# arrays (+ primary, which may be traced) are leaves; n and sa_interval are
# static structure (sa_interval bounds the locate loop).
jax.tree_util.register_pytree_node(
    FMIndex,
    lambda f: (
        (f.bwt_words, f.occ, f.count, f.primary, f.ssa_marks, f.ssa_cum,
         f.ssa_vals, f.ftab_lo, f.ftab_hi, f.ranktab),
        (f.n, f.sa_interval, f.ftab_k),
    ),
    lambda aux, ch: FMIndex(
        bwt_words=ch[0], occ=ch[1], count=ch[2], primary=ch[3], n=aux[0],
        sa_interval=aux[1], ssa_marks=ch[4], ssa_cum=ch[5], ssa_vals=ch[6],
        ftab_k=aux[2], ftab_lo=ch[7], ftab_hi=ch[8], ranktab=ch[9],
    ),
)


def attach_ftab(fmi: FMIndex, k: int = 11) -> FMIndex:
    """Fill the k-mer interval table: one jitted backward search of ALL
    4^k patterns at once (the lane's KEY is its own query — symbol j is
    bits [2j, 2j+2), consumed low-to-high exactly as backward search
    consumes the pattern right-to-left). Bit-exact with per-pattern
    backward search by construction.

    One compile + k dense rank steps over 4^k lanes (k=11: ~2 s on a
    v5e — a level-by-level build costs k separate remote compiles).
    Memory: 2 * 4^k int32 (k=11 -> 33.5 MB). Key layout matches the q-gram
    convention: first (leftmost) pattern symbol in the HIGH bits.
    """
    import jax
    import jax.numpy as jnp

    from nvbio_tpu.fmi.search import step_backward

    dev = fmi.device()

    @jax.jit
    def build():
        keys = jnp.arange(4 ** k, dtype=jnp.int32)
        lo = jnp.zeros_like(keys)
        hi = jnp.full_like(keys, dev.n + 1)

        def step(carry, j):
            lo, hi = carry
            c = (keys >> (2 * j)) & 3
            nlo, nhi = step_backward(dev, c, lo, hi)
            empty = hi <= lo
            return (jnp.where(empty, lo, nlo),
                    jnp.where(empty, hi, nhi)), None

        (lo, hi), _ = jax.lax.scan(step, (lo, hi),
                                   jnp.arange(k, dtype=jnp.int32))
        ok = hi > lo
        return jnp.where(ok, lo, 0), jnp.where(ok, hi, 0)

    lo, hi = build()
    # keep the table on device (fetching 2*4^k ints through the remote
    # relay, only to re-upload on .device(), would dominate the build)
    return dataclasses.replace(fmi, ftab_k=k, ftab_lo=lo, ftab_hi=hi)


def bwt_from_sa(text_codes: np.ndarray, sa: np.ndarray):
    """(bwt_codes with $ removed, primary row) from the SA of T$.

    ``sa`` has n+1 entries over rows of T$ (sa[0] == n, the "$" row).
    BWT[r] = T[sa[r] - 1]; the row with sa[r] == 0 is the sentinel (primary).
    """
    n = len(text_codes)
    assert len(sa) == n + 1
    primary = int(np.nonzero(sa == 0)[0][0])
    prev = sa - 1
    bwt_full = text_codes[np.clip(prev, 0, n - 1)]
    bwt = np.delete(bwt_full, primary)
    return bwt.astype(np.uint8), primary


def build_fmindex(
    text_codes: np.ndarray, sa: np.ndarray | None = None, sa_interval: int = 8,
    method: str = "auto",
) -> FMIndex:
    """Build a complete FM-index from 2-bit text codes.

    If ``sa`` is None it is built with nvbio_tpu.index.sa.suffix_array
    using ``method`` ("auto"/"native"/"doubling" run host-side;
    "device" runs the whole sort + BWT/SSA plane construction on the
    default JAX device — see ``index.device_sa.build_fmindex_device``,
    the TPU analogue of the reference's GPU nvBWT build).
    """
    from nvbio_tpu.index.sa import suffix_array

    if sa is None and method == "device":
        from nvbio_tpu.index.device_sa import build_fmindex_device

        return build_fmindex_device(text_codes, sa_interval=sa_interval)

    text_codes = np.asarray(text_codes, dtype=np.uint8)
    n = len(text_codes)
    if sa is None:
        sa = suffix_array(text_codes, method=method)
    bwt, primary = bwt_from_sa(text_codes, sa)
    bwt_words = packed.pack(bwt, 2)
    occ = rank_mod.build_occ_table(bwt_words, n)

    counts = np.bincount(text_codes, minlength=4)[:4]
    count = np.zeros(5, dtype=np.int64)
    count[1:] = np.cumsum(counts)
    count += 1  # the $ row
    count[0] = 1
    if count.max() >= 2**31:
        raise ValueError("text too long for int32 FM-index")

    # sampled SA: mark rows whose SA value % K == 0
    K = sa_interval
    marked = (sa % K) == 0
    rows = np.nonzero(marked)[0]
    n_rows = n + 1
    n_words = (n_rows + 31) // 32
    marks = np.zeros(n_words, dtype=np.uint32)
    np.bitwise_or.at(marks, rows // 32, (np.uint32(1) << (rows % 32).astype(np.uint32)))
    popc = np.unpackbits(marks.view(np.uint8)).reshape(-1, 32).sum(
        axis=1, dtype=np.int64)
    cum = np.zeros(n_words, dtype=np.int64)
    np.cumsum(popc[:-1], out=cum[1:])
    vals = sa[rows]

    return FMIndex(
        bwt_words=bwt_words,
        occ=occ,
        count=count.astype(np.int32),
        primary=primary,
        n=n,
        sa_interval=K,
        ssa_marks=marks,
        ssa_cum=cum.astype(np.int32),
        ssa_vals=vals.astype(np.int32),
    )


def fmindex_from_bwt(bwt_codes: np.ndarray, primary: int,
                     sa_interval: int = 8) -> FMIndex:
    """Rebuild a complete FM-index (occ + sampled SA) from a BWT alone —
    the nvSSA job (``nvSSA/nvSSA.cpp:42-119``: SSA from .bwt files).

    The suffix array comes back via Wyllie list-ranking over the LF
    permutation: SA[i] equals the hop count from row i to the cycle's end
    node, so ~log2(n) rounds of dense gathers (r += r[nxt]; nxt = nxt[nxt])
    reconstruct every SA entry without a sequential LF walk.
    """
    bwt_codes = np.asarray(bwt_codes, np.uint8)
    n = len(bwt_codes)
    n_rows = n + 1

    # LF over the full (sentinel-included) BWT: the sentinel occupies row
    # `primary` and maps to row 0
    counts = np.bincount(bwt_codes, minlength=4)[:4]
    count = np.zeros(5, np.int64)
    count[1:] = np.cumsum(counts)
    count += 1
    count[0] = 1

    full = np.empty(n_rows, np.int8)
    full[:primary] = bwt_codes[:primary]
    full[primary] = -1  # sentinel
    full[primary + 1:] = bwt_codes[primary:]
    lf = np.zeros(n_rows, np.int64)
    for c in range(4):
        m = full == c
        occ = np.cumsum(m) - m  # exclusive
        lf[m] = count[c] + occ[m]
    lf[primary] = 0

    # Wyllie list ranking: SA[i] = #hops from i to the end node (the row
    # whose LF wraps back to row 0, i.e. the primary row itself)
    end = primary
    nxt = lf.copy()
    r = np.ones(n_rows, np.int64)
    nxt[end] = end
    r[end] = 0
    steps = max(1, int(np.ceil(np.log2(n_rows))))
    for _ in range(steps):
        r = r + r[nxt]
        nxt = nxt[nxt]
    sa = r  # (n+1,) with sa[0] == n

    # text from the F column: text[sa[i]] = first symbol of suffix i
    text = np.empty(n, np.uint8)
    rows = np.arange(1, n_rows)
    sym = np.searchsorted(count[1:], rows, side="right")
    text[sa[rows]] = sym.astype(np.uint8)

    return build_fmindex(text, sa=sa, sa_interval=sa_interval)
