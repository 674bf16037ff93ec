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


def _pack2(vals, nw):
    """(nw*16,) int32 values in 0..3 -> (nw,) uint32, LSB-first."""
    shifts = jnp.arange(SYM_PER_WORD, dtype=jnp.uint32) * 2
    return (vals.astype(jnp.uint32).reshape(nw, SYM_PER_WORD)
            << shifts[None, :]).sum(axis=1, dtype=jnp.uint32)


@functools.partial(jax.jit, static_argnames=("m", "L"))
def _block_planes_device(rwords, s, m: int, L: int):
    """Block planes derived ON DEVICE from 2-bit packed reads (the only
    upload): BCR tagged-text suffix array via generic integer-alphabet
    prefix doubling (rank0 = symbol value — no bootstrap sort needed),
    then the block BWT/tags/reversed-symbol planes from arithmetic on SA
    positions (uniform stride P = L+1 makes owner/offset pure div/mod).

    Returns (B_bwt uint8 (bn,), B_tags int32, sa int32, revT int32 (L, m)).
    """
    spw = 16
    shifts = jnp.arange(spw, dtype=jnp.uint32) * 2
    reads = ((rwords[:, :, None] >> shifts[None, None, :])
             & jnp.uint32(3)).reshape(m, -1)[:, :L].astype(jnp.int32)

    P = L + 1
    bn = m * P
    # tagged text: symbols as r+m, sentinel of string i as i (BCR order)
    text = jnp.concatenate(
        [reads + m, jnp.arange(m, dtype=jnp.int32)[:, None]],
        axis=1).reshape(bn)

    def body(carry):
        sa, rank, k, _ = carry
        rank_pad = jnp.concatenate([rank, jnp.zeros(bn, jnp.int32)])
        second = jax.lax.dynamic_slice(rank_pad, (k,), (bn,))
        idx32 = jnp.arange(bn, dtype=jnp.int32)
        s1, s2, sa = jax.lax.sort((rank, second, idx32), num_keys=2)
        new_grp = jnp.concatenate([
            jnp.ones(1, jnp.int32),
            ((s1[1:] != s1[:-1]) | (s2[1:] != s2[:-1])).astype(jnp.int32)])
        rank_sorted = jnp.cumsum(new_grp).astype(jnp.int32)
        rank = jnp.zeros(bn, jnp.int32).at[sa].set(rank_sorted)
        return sa, rank, k * 2, rank_sorted[-1] == bn

    sa, _, _, _ = jax.lax.while_loop(
        lambda c: ~c[3], body,
        (jnp.arange(bn, dtype=jnp.int32), text + 1, jnp.int32(1),
         jnp.bool_(False)))

    owner = sa // P
    off = sa % P
    at_start = off == 0
    pm1 = jnp.maximum(sa - 1, 0)
    prev_is_sent = (pm1 % P) == L
    prev_owner = pm1 // P
    prev_sym = jnp.take(
        reads.reshape(-1),
        prev_owner * L + jnp.minimum(pm1 % P, L - 1))
    is_dollar = at_start | prev_is_sent
    B_bwt = jnp.where(is_dollar, 0, prev_sym + 1).astype(jnp.uint8)
    B_tags = jnp.where(at_start, owner,
                       jnp.where(prev_is_sent, prev_owner, -1))
    B_tags = jnp.where(B_tags >= 0, B_tags + s, -1).astype(jnp.int32)
    revT = (reads[:, ::-1] + 1).T
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

    # occ checkpoints every OCC_K symbols (masked counts, int32)
    nb = CAP // OCC_K
    symb = jnp.where(valid, sym, -1).reshape(nb, OCC_K)
    per_block = jnp.stack(
        [(symb == c).sum(axis=1, dtype=jnp.int32) for c in range(4)],
        axis=-1)
    OCC = jnp.concatenate(
        [jnp.zeros((1, 4), jnp.int32), jnp.cumsum(per_block, axis=0)])
    counts = OCC[nb]                                   # totals over M
    C = jnp.concatenate([jnp.zeros(1, jnp.int32),
                         s + jnp.concatenate(
                             [jnp.zeros(1, jnp.int32),
                              jnp.cumsum(counts[:-1])])])
    # C[c] for c in 1..4 = s + counts of smaller symbols; C[0] unused

    karange = jnp.arange(SYM_PER_WORD, dtype=jnp.uint32)

    def occ_m(cs, rs):
        """# of occurrences of symbol cs (1..4) in M[0:rs), batched (m,)."""
        blk = rs // OCC_K
        base = jnp.take(OCC.reshape(-1), blk * 4 + (cs - 1))
        rem = rs - blk * OCC_K
        w = jnp.arange(4, dtype=jnp.int32)
        widx = blk[:, None] * 4 + w[None, :]
        ws = jnp.take(words, jnp.clip(widx, 0, nw - 1))
        vs = jnp.take(vbits, jnp.clip(widx, 0, nw - 1))
        pattern = ((cs - 1).astype(jnp.uint32)[:, None]
                   * jnp.uint32(0x55555555))
        x = ws ^ pattern
        nz = (x | (x >> 1)) & jnp.uint32(0x55555555)
        match = (~nz & jnp.uint32(0x55555555)) & vs
        mseg = jnp.clip(rem[:, None] - w[None, :] * SYM_PER_WORD,
                        0, SYM_PER_WORD)
        pmask = jnp.where(
            mseg >= SYM_PER_WORD, jnp.uint32(0xFFFFFFFF),
            (jnp.uint32(1) << (2 * mseg).astype(jnp.uint32)) - 1)
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
    # needed; equal-rank rows keep their (correct) suffix order
    r_of_row = jnp.take(ranks_pos, sa)
    newpos = r_of_row + jnp.arange(bn, dtype=jnp.int32)
    merged_pos_row = newpos                          # merged position per row

    hist = jnp.zeros(CAP + 1, jnp.int32).at[r_of_row].add(1, mode="drop")
    cnt_le = jnp.cumsum(hist)[:CAP]                 # # new items <= index i
    dest_old = idx + cnt_le
    drop = jnp.int32(CAP)
    M_new = (jnp.zeros(CAP, M.dtype)
             .at[jnp.where(in_range, dest_old, drop)].set(M, mode="drop")
             .at[newpos].set(B_bwt, mode="drop"))

    # ---- dollar side-list maintenance --------------------------------------
    S_cap = dpos.shape[0]
    srange = jnp.arange(S_cap, dtype=jnp.int32)
    old_d_valid = srange < s
    dpos_shift = jnp.where(
        old_d_valid,
        dpos + jnp.take(cnt_le, jnp.clip(dpos, 0, CAP - 1)),
        drop + 1)
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
        (self.M, self.dpos, self.dtags, self.n, self.s) = _bwte_device_step(
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
