"""Device-resident BWTE: block-incremental set-BWT on the accelerator.

The TPU counterpart of the reference's GPU BWTE pipeline
(``/root/reference/nvbio/sufsort/bwte.h:57-229``, ~80 M symbols/s on a
K40, ``sufsort.h:47-49``): the merged multi-string BWT STAYS ON DEVICE
across blocks; each incoming block contributes

  1. its own BCR BWT + row<->suffix map (host native SA-IS — O(block), the
     cheap part),
  2. a device rank walk: every block suffix's rank against the merged BWT
     via the LF recurrence, batched over the block's strings with the
     2-bit packed rank-dictionary math of ``fmi/rank.py`` (dollars masked
     through a parallel validity bitplane),
  3. a device one-pass interleave: scatter old and new symbols to their
     merged positions (insertion counts by histogram + cumsum — no
     searchsorted, no data-dependent shapes).

All shapes are static at ``capacity``; ``n``/``s`` ride through the jit as
scalars, so every block reuses one compiled step. Sentinel identities are
kept OUT of the dense plane: dollar rows carry symbol 0 and their string
tags live in a compact (position, tag) side list merged per block —
tags are never consulted by the rank walk (C handles sentinels through
the ``s_prev`` base case), exactly like the host engine
(``index/setbwt.py`` ``bwte_merge_block_rank``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

OCC_K = 64          # occurrence checkpoint interval (symbols)
SYM_PER_WORD = 16   # 2-bit packing

# fused interleaved rank rows for the merged plane (the BWTE variant of
# fmi/rank.py's RT layout, with the dollar-validity bitplane folded in):
# row b (128 x uint32) = [4 occ counts before b*RT_K] ++ [62 packed words]
# ++ [62 validity words]. One (1, 128) tile-row gather serves a whole
# rank-walk query — vs 9 scalar gathers on the split layout (GATHER_MICRO:
# tile-row gathers cost the same as one element).
RT_WORDS = 62
RT_K = RT_WORDS * SYM_PER_WORD  # 992 symbols per fused row


def _pack2(vals, nw):
    """(nw*16,) int32 values in 0..3 -> (nw,) uint32, LSB-first."""
    shifts = jnp.arange(SYM_PER_WORD, dtype=jnp.uint32) * 2
    return (vals.astype(jnp.uint32).reshape(nw, SYM_PER_WORD)
            << shifts[None, :]).sum(axis=1, dtype=jnp.uint32)


_B13 = 13  # symbols per base-5 bootstrap key (5^13 < 2^31)


def _unpack_reads(rwords, m: int, L: int):
    shifts = jnp.arange(SYM_PER_WORD, dtype=jnp.uint32) * 2
    return ((rwords[:, :, None] >> shifts[None, None, :])
            & jnp.uint32(3)).reshape(m, -1)[:, :L].astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("m", "L"))
def _block_bootstrap(rwords, m: int, L: int):
    """Round 0 of the multi-string suffix sort: ONE 3-key sort of all
    m*(L+1) suffixes by (first 13 symbols, next 13 symbols, owner-if-$-
    in-window), base-5 digits with $ := 0 and 0-padding past the sentinel.

    Correctness of the key scheme (matches the BCR tagged-text order the
    full-doubling version sorted): comparison between two suffixes stops
    at the first sentinel, so order = (padded symbol string, owner index
    at the $-depth). Two suffixes tie on the padded string iff they hit
    their sentinels at the same depth — and then the owner key decides;
    suffixes whose $ lies beyond the 26-symbol window can only tie on
    pure symbols, which the compacted doubling resolves (their
    continuations eventually reach owner-resolved ranks, so every tied
    group splits). Same group-start-rank convention as
    ``device_sa._sa_bootstrap``.
    """
    reads = _unpack_reads(rwords, m, L)
    P = L + 1
    bn = m * P
    plane = jnp.concatenate(
        [reads + 1, jnp.zeros((m, 1 + 2 * _B13), jnp.int32)], axis=1)

    def b5(start):
        key = jnp.zeros((m, P), jnp.int32)
        for j in range(_B13):
            key = key * 5 + jax.lax.dynamic_slice_in_dim(
                plane, start + j, P, axis=1)
        return key.reshape(bn)

    k1 = b5(0)
    k2 = b5(_B13)
    o = jnp.arange(P, dtype=jnp.int32)[None, :]
    owner = jnp.arange(m, dtype=jnp.int32)[:, None]
    k3 = jnp.where(o > L - 2 * _B13, owner, -1).reshape(bn)
    idx = jnp.arange(bn, dtype=jnp.int32)
    s1, s2, s3, sa = jax.lax.sort((k1, k2, k3, idx), num_keys=3)
    new_grp = jnp.concatenate([
        jnp.ones(1, bool),
        (s1[1:] != s1[:-1]) | (s2[1:] != s2[:-1]) | (s3[1:] != s3[:-1])])
    rank_sorted = jax.lax.cummax(jnp.where(new_grp, idx, 0))
    run_end = jnp.concatenate([new_grp[1:], jnp.ones(1, bool)])
    tied = ~(new_grp & run_end)
    n_tied = jnp.sum(tied.astype(jnp.int32))
    return sa, rank_sorted, tied, n_tied == 0, n_tied


@functools.partial(jax.jit, static_argnames=("m", "L"))
def _block_finish(rwords, sa, s, m: int, L: int):
    """Block BWT/tags/reversed-symbol planes from SA positions (uniform
    stride P = L+1 makes owner/offset pure div/mod)."""
    reads = _unpack_reads(rwords, m, L)
    P = L + 1
    at_start = (sa % P) == 0
    pm1 = jnp.maximum(sa - 1, 0)
    prev_is_sent = (pm1 % P) == L
    prev_owner = pm1 // P
    prev_sym = jnp.take(
        reads.reshape(-1),
        prev_owner * L + jnp.minimum(pm1 % P, L - 1))
    is_dollar = at_start | prev_is_sent
    B_bwt = jnp.where(is_dollar, 0, prev_sym + 1).astype(jnp.uint8)
    B_tags = jnp.where(at_start, sa // P,
                       jnp.where(prev_is_sent, prev_owner, -1))
    B_tags = jnp.where(B_tags >= 0, B_tags + s, -1).astype(jnp.int32)
    revT = (reads[:, ::-1] + 1).T
    return B_bwt, B_tags, revT


def _block_planes_device(rwords, s, m: int, L: int):
    """Block planes derived ON DEVICE from 2-bit packed reads (the only
    upload): multi-string BCR suffix order via a 26-symbol 3-key
    bootstrap sort + tie-COMPACTED prefix doubling (the scheme that took
    the single-string device sort to 67 Msuffixes/s — the generic
    integer-alphabet doubling this replaces paid ~7 full-plane sort
    rounds per block), then the BWT/tags planes from div/mod arithmetic.

    Returns (B_bwt uint8 (bn,), B_tags int32, sa int32, revT int32 (L, m)).
    """
    from nvbio_tpu.index.device_sa import (
        _TIE_CAP,
        _inv_rank,
        _sa_doubling,
        _sa_tie_doubling,
    )

    bn = m * (L + 1)
    sa, rank_sorted, tied, done, n_tied = _block_bootstrap(rwords, m, L)
    if not bool(done):  # host branch on two scalar fetches (device_sa.py)
        rank = _inv_rank(sa, rank_sorted)
        C = min(_TIE_CAP, bn)
        if int(n_tied) <= C:
            sa = _sa_tie_doubling(sa, rank, tied, bn, C)
        else:
            sa = _sa_doubling(sa, rank, bn)
    B_bwt, B_tags, revT = _block_finish(rwords, sa, s, m, L)
    return B_bwt, B_tags, sa, revT


@functools.partial(jax.jit, static_argnames=("L",))
def _bwte_device_step(M, dpos, dtags, n, s, B_bwt, B_tags, sa, revT, L: int):
    """One block merge. M (CAP,) uint8; dpos/dtags (S_cap,) int32 (dollar
    positions ascending, CAP-padded); n, s scalars; B_bwt/B_tags/sa (bn,);
    revT (L, m) int32 (j-th-from-last symbol + 1). Returns new state."""
    CAP = M.shape[0]
    bn = B_bwt.shape[0]
    m = revT.shape[1]
    idx = jnp.arange(CAP, dtype=jnp.int32)
    in_range = idx < n
    dollar = (M == 0) & in_range
    valid = in_range & ~dollar
    sym = jnp.clip(M.astype(jnp.int32) - 1, 0, 3)

    nw = CAP // SYM_PER_WORD
    words = _pack2(jnp.where(valid, sym, 0), nw)
    vbits = _pack2(valid.astype(jnp.int32), nw)   # 01 per valid lane

    # fused interleaved rank rows over the merged plane: per-word masked
    # symbol counts -> per-row sums -> exclusive cumsum, then
    # [occ4 | words | vbits] rows. Rebuilt once per block (dense, cheap);
    # each rank-walk query then costs ONE tile-row gather.
    nbf = CAP // RT_K + 1
    nwp = nbf * RT_WORDS
    wpad = jnp.zeros((nwp,), jnp.uint32).at[:nw].set(words).reshape(
        nbf, RT_WORDS)
    vpad = jnp.zeros((nwp,), jnp.uint32).at[:nw].set(vbits).reshape(
        nbf, RT_WORDS)
    csr = jnp.arange(4, dtype=jnp.uint32)
    xall = wpad[:, None, :] ^ (csr[None, :, None] * jnp.uint32(0x55555555))
    nzall = (xall | (xall >> 1)) & jnp.uint32(0x55555555)
    per_row = jax.lax.population_count(
        (~nzall & jnp.uint32(0x55555555)) & vpad[:, None, :]
    ).astype(jnp.int32).sum(axis=-1)                   # (nbf, 4)
    OCCF = jnp.concatenate(
        [jnp.zeros((1, 4), jnp.int32),
         jnp.cumsum(per_row[:-1], axis=0, dtype=jnp.int32)], axis=0)
    ranktab = jnp.concatenate(
        [OCCF.astype(jnp.uint32), wpad, vpad], axis=1)  # (nbf, 128)
    counts = OCCF[-1] + per_row[-1]                    # totals over M
    C = jnp.concatenate([jnp.zeros(1, jnp.int32),
                         s + jnp.concatenate(
                             [jnp.zeros(1, jnp.int32),
                              jnp.cumsum(counts[:-1])])])
    # C[c] for c in 1..4 = s + counts of smaller symbols; C[0] unused

    def occ_m(cs, rs):
        """# of occurrences of symbol cs (1..4) in M[0:rs), batched (m,):
        one fused-row gather + dense masked popcount over 62 words."""
        blk = rs // RT_K
        row = jnp.take(ranktab, blk, axis=0)           # (m, 128)
        base = jnp.sum(jnp.where(
            jnp.arange(4, dtype=jnp.int32)[None, :] == (cs - 1)[:, None],
            row[:, :4].astype(jnp.int32), 0), axis=1)
        ws = row[:, 4:4 + RT_WORDS]
        vs = row[:, 4 + RT_WORDS:]
        pattern = ((cs - 1).astype(jnp.uint32)[:, None]
                   * jnp.uint32(0x55555555))
        x = ws ^ pattern
        nz = (x | (x >> 1)) & jnp.uint32(0x55555555)
        match = (~nz & jnp.uint32(0x55555555)) & vs
        rem = rs - blk * RT_K
        w = jnp.arange(RT_WORDS, dtype=jnp.int32)
        mseg = rem[:, None] - w[None, :] * SYM_PER_WORD
        pmask = jnp.where(
            mseg >= SYM_PER_WORD, jnp.uint32(0xFFFFFFFF),
            (jnp.uint32(1) << (2 * jnp.clip(mseg, 0, SYM_PER_WORD)
                               ).astype(jnp.uint32)) - 1)
        return base + jax.lax.population_count(match & pmask).astype(
            jnp.int32).sum(axis=1)

    # ---- rank walk over suffix lengths (uniform L) -------------------------
    starts = jnp.arange(m, dtype=jnp.int32) * (L + 1)

    def step(carry, cs):
        rank, rp = carry
        rank = jnp.take(C, cs) + occ_m(cs, rank)
        j = rp[1]
        pos = starts + (L - j)                      # suffix start positions
        rp = (rp[0].at[pos].set(rank), j + 1)
        return (rank, rp), None

    ranks_pos0 = jnp.zeros(bn, jnp.int32).at[starts + L].set(s)
    rank0 = jnp.full((m,), s, jnp.int32)
    (rank, (ranks_pos, _)), _ = jax.lax.scan(
        step, (rank0, (ranks_pos0, jnp.int32(1))), revT)

    # ---- interleave merge --------------------------------------------------
    # r_of_row is ALREADY non-decreasing: rank_M is monotone in suffix
    # order and the block rows come in SA (suffix) order — so no sort is
    # needed for the NEW rows; equal-rank rows keep their suffix order
    r_of_row = jnp.take(ranks_pos, sa)
    newpos = r_of_row + jnp.arange(bn, dtype=jnp.int32)
    merged_pos_row = newpos                          # merged position per row

    # ONE stable 2-key sort-merge instead of hist + cumsum + two plane
    # scatters (BWTE_MERGE_PROBE.json: the scatters price at ~10 ns/elem
    # = 4 s/block at BLOCK=1M; the sort is ~2 s): old element i carries
    # key (i, 1); new row j carries (r_of_row[j], 0) — a new row with
    # insertion rank r precedes old[r]; stability keeps equal-rank new
    # rows in suffix order and old keys are unique. Invalid old tail
    # (i >= n) sorts after all content, so the CAP-prefix of the merged
    # stream IS the new plane.
    key1 = jnp.concatenate([idx, r_of_row])
    key2 = jnp.concatenate([jnp.ones(CAP, jnp.int32),
                            jnp.zeros(bn, jnp.int32)])
    vals = jnp.concatenate([M, B_bwt])
    _, _, merged = jax.lax.sort((key1, key2, vals), num_keys=2,
                                is_stable=True)
    M_new = merged[:CAP]
    drop = jnp.int32(CAP)

    # ---- dollar side-list maintenance --------------------------------------
    # old dollar at plane index p moves to p + (# new rows inserted at
    # rank <= p) — a binary search over the sorted insertion ranks (the
    # dollar list is ~bn/L entries, far cheaper than a CAP-wide cnt_le)
    S_cap = dpos.shape[0]
    srange = jnp.arange(S_cap, dtype=jnp.int32)
    old_d_valid = srange < s
    cnt_at = jnp.searchsorted(
        r_of_row, jnp.clip(dpos, 0, CAP - 1), side="right"
    ).astype(jnp.int32)
    dpos_shift = jnp.where(old_d_valid, dpos + cnt_at, drop + 1)
    # new dollars: block rows with tag >= 0, at their merged positions
    new_d = B_tags >= 0
    new_d_pos = jnp.where(new_d, merged_pos_row, drop + 1)
    # merge the two (position, tag) lists by position (pad sorts last)
    all_pos = jnp.concatenate([dpos_shift, new_d_pos])
    all_tags = jnp.concatenate([dtags, B_tags])
    dorder = jnp.argsort(all_pos, stable=True)[:S_cap]
    dpos_new = jnp.take(all_pos, dorder)
    dtags_new = jnp.take(all_tags, dorder)

    return (M_new, dpos_new, dtags_new, n + bn, s + m)


@functools.partial(jax.jit, static_argnames=("CAP", "S_cap"))
def _bwte_first_block(B_bwt, B_tags, CAP: int, S_cap: int):
    """Block 0 into an EMPTY merged plane: the block's own BWT *is* the
    merged BWT, so the rank walk (L+1 sequential LF steps) and the
    CAP-wide merge sort are both skipped. This is also the whole engine
    when the set fits device memory in one block — the set-BWT then
    costs exactly one multi-string suffix sort (~the single-string
    device sort rate), the TPU answer to the reference's 80 Msym/s GPU
    BWTE (``sufsort.h:47-49``)."""
    bn = B_bwt.shape[0]
    M = jnp.zeros(CAP, jnp.uint8).at[:bn].set(B_bwt)
    rows = jnp.arange(bn, dtype=jnp.int32)
    key = jnp.where(B_tags >= 0, rows, jnp.int32(CAP + 1))
    ks, ts = jax.lax.sort((key, B_tags), num_keys=1, is_stable=True)
    pad_pos = jnp.full(S_cap, CAP + 1, jnp.int32)
    pad_tag = jnp.full(S_cap, -1, jnp.int32)
    dpos = jnp.concatenate([ks, pad_pos])[:S_cap]
    dtags = jnp.concatenate([ts, pad_tag])[:S_cap]
    return M, dpos, dtags


class BwteDevice:
    """Accumulates uniform-length read blocks into a device-resident
    multi-string BWT. ``capacity`` symbols (rounded up to 64),
    ``n_strings`` total reads expected."""

    def __init__(self, capacity: int, n_strings: int):
        CAP = (capacity + OCC_K - 1) // OCC_K * OCC_K
        if CAP >= 2**31:
            raise ValueError("int32 capacity limit; shard the set")
        self.M = jnp.zeros(CAP, jnp.uint8)
        self.dpos = jnp.full(n_strings, CAP + 1, jnp.int32)
        self.dtags = jnp.full(n_strings, -1, jnp.int32)
        self.n = jnp.int32(0)
        self.s = jnp.int32(0)
        self._host_n = 0
        self._host_s = 0
        self.capacity = CAP

    def add_block_packed(self, rwords, m: int, L: int):
        """Device fast path for pre-staged blocks: ``rwords`` is the
        2-bit packed reads plane ALREADY on device (``packed.pack``
        layout). Skips the host pack + relay upload — the production
        shape when reads are staged ahead (double-buffered input) or
        arrive via fast local DMA."""
        bn = m * (L + 1)
        if self._host_n + bn > self.capacity:
            raise ValueError("block exceeds capacity")
        B_bwt, B_tags, sa, revT = _block_planes_device(rwords, self.s, m, L)
        self._apply_block(B_bwt, B_tags, sa, revT, m, L)

    def add_block(self, reads: np.ndarray, block_sa: str = "device"):
        """reads: (m, L) uint8 codes 0..3, uniform length.

        ``block_sa="device"`` (default): only the 2-bit packed reads cross
        the host link (mL/4 bytes); the block's suffix sort and every
        derived plane run on device. ``"host"``: block SA via native
        SA-IS on the host, planes uploaded (the fallback, and the oracle
        path the tests cross-check)."""
        from nvbio_tpu import packed

        reads = np.asarray(reads, np.uint8)
        m, L = reads.shape
        bn = m * (L + 1)
        if self._host_n + bn > self.capacity:
            raise ValueError("block exceeds capacity")
        if block_sa == "device":
            rwords = jnp.asarray(packed.pack(reads, 2))
            B_bwt, B_tags, sa, revT = _block_planes_device(
                rwords, self.s, m, L)
        else:
            from nvbio_tpu.index.setbwt import _bcr_sa

            sa64, text, starts = _bcr_sa(list(reads))
            owner = np.searchsorted(starts, sa64, side="right") - 1
            at_start = sa64 == starts[owner]
            prev = text[np.maximum(sa64 - 1, 0)]
            is_dollar = at_start | (prev < m)
            B_bwt = jnp.asarray(
                np.where(is_dollar, 0, prev - m + 1).astype(np.uint8))
            t = np.where(at_start, owner, np.where(prev < m, prev, -1))
            B_tags = jnp.asarray(
                np.where(t >= 0, t + self._host_s, -1).astype(np.int32))
            sa = jnp.asarray(sa64.astype(np.int32))
            revT = jnp.asarray((reads[:, ::-1].astype(np.int32) + 1).T)
        self._apply_block(B_bwt, B_tags, sa, revT, m, L)

    def _apply_block(self, B_bwt, B_tags, sa, revT, m: int, L: int):
        bn = m * (L + 1)
        if self._host_n == 0:
            self.M, self.dpos, self.dtags = _bwte_first_block(
                B_bwt, B_tags, self.capacity, self.dpos.shape[0])
            self.n = jnp.int32(bn)
            self.s = jnp.int32(m)
        else:
            (self.M, self.dpos, self.dtags, self.n, self.s) = \
                _bwte_device_step(
                    self.M, self.dpos, self.dtags, self.n, self.s,
                    B_bwt, B_tags, sa, revT, L)
        self._host_n += bn
        self._host_s += m

    def sync(self):
        """Block until the device state is materialized (1-element fetch —
        reliable through the remote-TPU relay)."""
        int(np.asarray(self.M[:1])[0])

    def finalize(self):
        """Fetch (bwt uint8 (n,), tags int64 (n,), -1 off dollar rows)."""
        n = self._host_n
        bwt = np.asarray(self.M)[:n]
        tags = np.full(n, -1, np.int64)
        dpos = np.asarray(self.dpos)[: self._host_s]
        dtags = np.asarray(self.dtags)[: self._host_s]
        tags[dpos] = dtags
        return bwt, tags
