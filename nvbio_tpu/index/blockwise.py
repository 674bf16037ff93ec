"""Blockwise monolithic single-string BWT for multi-GB texts on device.

TPU re-design of the reference's Kärkkäinen blockwise suffix sorting
(``/root/reference/nvbio/sufsort/sufsort.h:45-60``,
``blockwise_sufsort.h``, ``dcs.h``, ``compression_sort.h:123-157``): the
whole-genome BWT (3+ Gbp — beyond int32 positions and beyond what the
one-shot prefix-doubling sorter's ~8 n-sized planes can hold) is built as
a sequence of device-sized suffix BLOCKS that arrive in global suffix
order, so the merged artifact is a pure concatenation — no comparison
merge is ever needed.

The decomposition (device-first, no DCS):

1. **Counting pass** (chunked over text positions): every suffix's first
   13 symbols become one base-5 int32 key (``k1``; sentinel/overrun = 0,
   matching ``device_sa._sa_bootstrap``). A strided sample histogram of
   ``k1 >> 18`` picks SUPERBLOCK key thresholds — superblocks are key
   RANGES, so equal-``k1`` suffixes can never straddle one.
2. **Extraction pass** (per superblock, chunked): each chunk computes
   ``k1`` densely (static shifted slices — no gathers), sorts
   ``(k1, pos)``, and appends its in-range segment into the superblock
   buffer (donated ``dynamic_update_slice``; tail slots carry sentinels
   that sort last).
3. **Superblock sort**: one ``(k1, pos)`` sort orders the whole
   superblock by first-13-symbol key. Blocks are then contiguous SLICES,
   cut at ``k1``-group boundaries (a group of equal ``k1`` must stay in
   one block — the deeper comparison happens inside the block sort).
4. **Block sort**: gather-based ``k2`` (symbols 13..26) completes the
   26-symbol bootstrap; ties resolve by ITERATIVE DEEPENING — 26 more
   symbols per round, on a compacted subset when the tie count is small
   (the ``_sa_tie_doubling`` slot trick), full-plane otherwise. End-masked
   base-5 keys make deepening self-terminating (a shorter suffix always
   splits first), so correctness never needs the host; a host direct-
   comparison fallback caps pathological LCPs (same comparator as
   ``device_sa._host_tie_order``).
5. **Emission**: per block, BWT symbols ``text[pos-1]`` by one word
   gather, packed 2-bit on device, fetched in ``bn/4`` bytes; the host
   assembles blocks in order and removes the primary row
   (``fmi.index.bwt_from_sa`` convention).

Positions ride as uint32 (3.1 Gbp > int31); word indices stay int32.
Unlike the reference's DCS-backed sort, deepening is LCP-sensitive past
26 x rounds — long exact repeats cost extra rounds on the (compacted)
tied subset; mutated genomic repeats divergence-cap this in practice.
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

_B5 = 13                 # symbols per base-5 int32 key
_KMAX = np.int32(2**31 - 1)   # sentinel key (sorts last)
_PSENT = np.uint32(0xFFFFFFFF)
_HIST_SHIFT = 18         # superblock threshold granularity (k1 >> 18)
_HIST_BINS = (5**_B5 >> _HIST_SHIFT) + 2


def _sym_at(words_pad, l_u32, n: int):
    """Symbol (1..4, 0 past the end) at linear position l (uint32), by one
    word gather + variable shift. words_pad: packed 2-bit text + >=2 zero
    words."""
    wi = (l_u32 >> 4).astype(jnp.int32)
    off = (l_u32 & 15).astype(jnp.uint32)
    w = jnp.take(words_pad, wi)
    sym = ((w >> (off * 2)) & 3).astype(jnp.int32)
    return jnp.where(l_u32 < jnp.uint32(n), sym + 1, 0)


def _gather_b5_keys(words_pad, pos_u32, d, n: int, nkeys: int):
    """``nkeys`` consecutive base-5 13-symbol keys of the suffix at
    ``pos + d`` (d: traced int32 scalar, so deepening rounds share one
    compile). Uses 2 + nkeys word gathers: the 16*(nkeys+1)-symbol window
    starting at pos+d spans at most that many words."""
    l0 = pos_u32 + d.astype(jnp.uint32)
    wi0 = (l0 >> 4).astype(jnp.int32)
    off0 = (l0 & 15).astype(jnp.int32)
    nw_needed = ((15 + _B5 * nkeys) // 16) + 1
    ws = [jnp.take(words_pad, jnp.minimum(
        wi0 + j, words_pad.shape[0] - 1)) for j in range(nw_needed)]
    keys = []
    for kk in range(nkeys):
        key = jnp.zeros(pos_u32.shape, jnp.int32)
        for j in range(_B5):
            t = off0 + kk * _B5 + j          # symbol index within window
            word_sel = t >> 4
            sh = ((t & 15) * 2).astype(jnp.uint32)
            w = ws[0]
            for widx in range(1, nw_needed):
                w = jnp.where(word_sel == widx, ws[widx], w)
            sym = ((w >> sh) & 3).astype(jnp.int32)
            lj = l0 + jnp.uint32(kk * _B5 + j)
            sym1 = jnp.where(
                (lj < jnp.uint32(n)) & (lj >= l0),  # l0+j overflow guard
                sym + 1, 0)
            key = key * 5 + sym1
        keys.append(key)
    return keys


@functools.partial(jax.jit, donate_argnums=(0,))
def _upload_chunk(buf, wc, w0):
    """Write one uploaded word chunk into the (donated) device text plane;
    the zero pad past the text never crosses the relay."""
    return jax.lax.dynamic_update_slice(buf, wc, (w0,))


# ---------------------------------------------------------------------------
# counting pass
# ---------------------------------------------------------------------------


def _chunk_c1p(words_pad, s, C: int, n: int, extra: int):
    """1-based symbol plane for positions [s, s+C+extra) from the packed
    words: s (uint32) is a multiple of 16, so this is a static-size
    dynamic_slice + dense unpack (no gathers)."""
    nwc = (C + extra + 15) // 16 + 1
    w0 = (s >> jnp.uint32(4)).astype(jnp.int32)
    ws = jax.lax.dynamic_slice(words_pad, (w0,), (nwc,))
    shifts = jnp.arange(16, dtype=jnp.uint32) * 2
    syms = ((ws[:, None] >> shifts[None, :]) & 3).astype(
        jnp.int32).reshape(-1)[:C + extra]
    lin = s + jnp.arange(C + extra, dtype=jnp.uint32)
    return jnp.where(lin < jnp.uint32(n), syms + 1, 0)


def _b5_from_plane(c1p, start: int, m: int):
    key = jnp.zeros(m, jnp.int32)
    for j in range(_B5):
        key = key * 5 + jax.lax.dynamic_slice(c1p, (start + j,), (m,))
    return key


# ---------------------------------------------------------------------------
# extraction pass
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("C", "n"))
def _chunk_sorted_k1pos(words_pad, s, C: int, n: int):
    """Chunk positions sorted by k1 (invalid slots -> sentinel, last).
    s: uint32 scalar. Returns (k1_sorted, pos_sorted)."""
    c1p = _chunk_c1p(words_pad, s, C, n, _B5)
    k1 = _b5_from_plane(c1p, 0, C)
    pos = s + jnp.arange(C, dtype=jnp.uint32)
    valid = pos <= jnp.uint32(n)
    k1 = jnp.where(valid, k1, _KMAX)
    pos = jnp.where(valid, pos, _PSENT)
    return jax.lax.sort((k1, pos), num_keys=1)


@functools.partial(jax.jit, static_argnames=("C",), donate_argnums=(0, 1))
def _sb_append(sb_k1, sb_pos, k1s, poss, lo, hi, off, C: int):
    """Append the [klo, khi) key-range segment of a sorted chunk into the
    superblock buffers at ``off`` (all traced scalars). The copy window is
    the full static C; slots outside [lo, hi) are masked to sentinels and
    overwritten by later appends or pushed last by the superblock sort."""
    # dynamic_slice CLAMPS an out-of-range start (lo + C > C whenever
    # lo > 0) — pad by C sentinels so the slice window always fits
    k1p = jnp.concatenate([k1s, jnp.full(C, _KMAX, k1s.dtype)])
    psp = jnp.concatenate([poss, jnp.full(C, _PSENT, poss.dtype)])
    seg_k = jax.lax.dynamic_slice(k1p, (lo,), (C,))
    seg_p = jax.lax.dynamic_slice(psp, (lo,), (C,))
    idx = jnp.arange(C, dtype=jnp.int32)
    keep = idx < (hi - lo)
    seg_k = jnp.where(keep, seg_k, _KMAX)
    seg_p = jnp.where(keep, seg_p, _PSENT)
    sb_k1 = jax.lax.dynamic_update_slice(sb_k1, seg_k, (off,))
    sb_pos = jax.lax.dynamic_update_slice(sb_pos, seg_p, (off,))
    return sb_k1, sb_pos


@jax.jit
def _sb_sort(sb_k1, sb_pos):
    return jax.lax.sort((sb_k1, sb_pos), num_keys=1)


@jax.jit
def _search_all_bounds(k1s, thresholds):
    """Segment boundaries for ALL superblock thresholds in one call —
    one small fetch instead of two scalar round trips per (chunk,
    superblock): each scalar fetch costs ~0.6 s on the relay, which was
    the measured extraction wall."""
    return jnp.searchsorted(k1s, thresholds, side="left").astype(jnp.int32)


# ---------------------------------------------------------------------------
# block sort
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("BP", "n"))
def _block_sort26(words_pad, sb_k1, sb_pos, start, count, BP: int, n: int):
    """Slice block [start, start+count) from the sorted superblock, gather
    k2 (symbols 13..26), sort by (k1, k2). Returns
    (pos_sorted, k1s, k2s, grank, tied, n_tied); padded slots carry
    sentinels and are excluded from ties."""
    k1 = jax.lax.dynamic_slice(sb_k1, (start,), (BP,))
    pos = jax.lax.dynamic_slice(sb_pos, (start,), (BP,))
    idx = jnp.arange(BP, dtype=jnp.int32)
    valid_in = idx < count
    k1 = jnp.where(valid_in, k1, _KMAX)
    pos = jnp.where(valid_in, pos, _PSENT)
    (k2,) = _gather_b5_keys(words_pad, pos, jnp.int32(_B5), n, 1)
    k2 = jnp.where(valid_in, k2, _KMAX)
    k1s, k2s, poss = jax.lax.sort((k1, k2, pos), num_keys=2)
    valid = idx < count
    new_grp = jnp.concatenate([
        jnp.ones(1, bool),
        (k1s[1:] != k1s[:-1]) | (k2s[1:] != k2s[:-1])])
    grank = jax.lax.cummax(jnp.where(new_grp, idx, 0))
    run_end = jnp.concatenate([new_grp[1:], jnp.ones(1, bool)])
    tied = valid & ~(new_grp & run_end)
    return poss, grank, tied, jnp.sum(tied.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("C",))
def _tied_slots_blk(pos_plane, grank, tied, C: int):
    """(rows, pos, grp) of the <= C tied block slots, ascending — top_k
    instead of a BP-wide sort (the device_sa tiny-tie trick): when a
    block leaves only a handful of 26-symbol collisions (random text:
    ~3 per 170M-suffix block), the host orders them directly and the
    full deepening machinery never runs."""
    BP = tied.shape[0]
    idx = jnp.arange(BP, dtype=jnp.int32)
    neg = jnp.where(tied, -idx, jnp.int32(-(1 << 30)))
    _, rows = jax.lax.top_k(neg, C)
    return rows, jnp.take(pos_plane, rows), jnp.take(grank, rows)


@functools.partial(jax.jit, static_argnames=("C",))
def _tied_rows(tied, C: int):
    """Ascending tied slot indices (padded with BP) via a stable 1-key
    sort (same trick as device_sa._sa_tie_doubling)."""
    BP = tied.shape[0]
    idx = jnp.arange(BP, dtype=jnp.int32)
    key = jnp.where(tied, jnp.int32(0), jnp.int32(1))
    _, rows = jax.lax.sort((key, idx), num_keys=1, is_stable=True)
    return rows[:C]


@functools.partial(jax.jit, static_argnames=("n", "C"),
                   donate_argnums=(1,))
def _deepen_compact(words_pad, pos_plane, rows, grp, d, nt, n: int, C: int):
    """One deepening round on the compacted tied subset: 26 more symbols
    (2 base-5 keys) at depth d, sort within groups, scatter back.
    Returns (pos_plane, rows, grp, n_tied)."""
    slot = jnp.arange(C, dtype=jnp.int32)
    valid = slot < nt
    pos_t = jnp.take(pos_plane, jnp.where(valid, rows, 0))
    kd1, kd2 = _gather_b5_keys(words_pad, pos_t, d, n, 2)
    g = jnp.where(valid, grp, _KMAX)
    kd1 = jnp.where(valid, kd1, _KMAX)
    kd2 = jnp.where(valid, kd2, _KMAX)
    gs, k1s, k2s, pos_s = jax.lax.sort((g, kd1, kd2, pos_t), num_keys=3)
    # after the in-group sort, slot t sits at global block slot rows[t]
    new_run = jnp.concatenate([
        jnp.ones(1, bool),
        (gs[1:] != gs[:-1]) | (k1s[1:] != k1s[:-1]) | (k2s[1:] != k2s[:-1])])
    g_new = jax.lax.cummax(jnp.where(new_run, rows, 0))
    run_end = jnp.concatenate([new_run[1:], jnp.ones(1, bool)])
    still = valid & ~(new_run & run_end)
    pos_plane = pos_plane.at[
        jnp.where(valid, rows, pos_plane.shape[0])].set(pos_s, mode="drop")
    # compact the still-tied subset for the next round (stable by slot)
    order = jnp.where(still, slot, jnp.int32(C + 1))
    _, sel = jax.lax.sort((order, slot), num_keys=1, is_stable=True)
    rows2 = jnp.take(jnp.where(valid, rows, pos_plane.shape[0] - 1), sel)
    grp2 = jnp.take(g_new, sel)
    nt2 = jnp.sum(still.astype(jnp.int32))
    return pos_plane, rows2, grp2, nt2


@functools.partial(jax.jit, static_argnames=("n",), donate_argnums=(1,))
def _deepen_full(words_pad, pos_plane, grank, count, d, n: int):
    """One full-plane deepening round (tie count too large to compact):
    sort the whole block by (group, 26 more symbols)."""
    BP = pos_plane.shape[0]
    idx = jnp.arange(BP, dtype=jnp.int32)
    valid = idx < count
    kd1, kd2 = _gather_b5_keys(words_pad, pos_plane, d, n, 2)
    g = jnp.where(valid, grank, _KMAX)
    kd1 = jnp.where(valid, kd1, _KMAX)
    kd2 = jnp.where(valid, kd2, _KMAX)
    gs, k1s, k2s, pos_s = jax.lax.sort(
        (g, kd1, kd2, pos_plane), num_keys=3)
    new_grp = jnp.concatenate([
        jnp.ones(1, bool),
        (gs[1:] != gs[:-1]) | (k1s[1:] != k1s[:-1]) | (k2s[1:] != k2s[:-1])])
    grank2 = jax.lax.cummax(jnp.where(new_grp, idx, 0))
    run_end = jnp.concatenate([new_grp[1:], jnp.ones(1, bool)])
    tied = valid & ~(new_grp & run_end)
    return pos_s, grank2, tied, jnp.sum(tied.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("n",))
def _block_bwt(words_pad, pos_plane, count, n: int):
    """BWT symbols for the sorted block rows, 2-bit packed on device.
    Row with pos==0 (the primary) carries 0; padded slots carry 0.
    Returns (packed words, local primary index or -1)."""
    BP = pos_plane.shape[0]
    idx = jnp.arange(BP, dtype=jnp.int32)
    valid = idx < count
    is_primary = valid & (pos_plane == jnp.uint32(0))
    l = jnp.where(is_primary, jnp.uint32(0), pos_plane - jnp.uint32(1))
    sym1 = _sym_at(words_pad, l, n)          # 1..4 (0 impossible: l < n)
    sym = jnp.where(valid & ~is_primary, sym1 - 1, 0).astype(jnp.uint32)
    nw = BP // 16
    shifts = jnp.arange(16, dtype=jnp.uint32) * 2
    words = (sym.reshape(nw, 16) << shifts[None, :]).sum(
        axis=1, dtype=jnp.uint32)
    prim = jnp.where(jnp.any(is_primary),
                     jnp.argmax(is_primary).astype(jnp.int32),
                     jnp.int32(-1))
    return words, prim


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------


def _pick_thresholds(hist: np.ndarray, total: int, sb_cap: int):
    """Superblock key thresholds from the (sampled, scaled) histogram:
    greedy fill to ~86% of capacity (sampling slack)."""
    target = int(sb_cap * 0.86)
    bounds = [0]
    acc = 0
    for b, cnt in enumerate(hist):
        if acc + cnt > target and acc > 0:
            bounds.append(b << _HIST_SHIFT)
            acc = 0
        acc += int(cnt)
    bounds.append(int(_KMAX))
    return bounds


def blockwise_bwt(codes, *, chunk: int = 1 << 27, sb_cap: int = 1 << 28,
                  blk: int = 160 << 20, tie_cap: int = 1 << 22,
                  max_deepen: int = 200, host_tie_cap: int = 4096,
                  log=None, emit=None):
    """Single-string BWT of ``codes`` (uint8 0..3, any length < 2**32-16)
    built blockwise on the default JAX device.

    Returns ``(bwt, primary, stats)`` where ``bwt`` is the n-symbol plane
    with the primary row removed (``fmi.index.bwt_from_sa`` contract) —
    unless ``emit`` is given, in which case each block's symbols (primary
    row INCLUDED, as row ``stats['primary']`` of the global n+1-row
    stream) are passed to ``emit(np.uint8 array)`` in order and ``bwt``
    is None. ``stats`` carries the per-phase wall-clock breakdown.
    """
    from nvbio_tpu import packed

    t_all = time.time()
    stats = {}

    def _log(msg):
        if log:
            log(msg)

    codes = np.asarray(codes, np.uint8)
    n = len(codes)
    total = n + 1                      # suffixes incl. the empty one
    chunk = max(16, min(chunk, ((total + 15) // 16) * 16))
    if chunk % 16:
        chunk += 16 - chunk % 16

    # ---- host-side sampled counting (superblock thresholds) ----------------
    t0 = time.time()
    stride = max(1, total >> 24) or 1
    sample = np.arange(0, total, stride, dtype=np.int64)
    key = np.zeros(len(sample), np.int64)
    for j in range(_B5):
        idx = sample + j
        sym = np.where(idx < n, codes[np.minimum(idx, n - 1)].astype(
            np.int64) + 1, 0)
        key = key * 5 + sym
    hist = np.bincount((key >> _HIST_SHIFT), minlength=_HIST_BINS) * stride
    sb_cap = min(sb_cap, total + 16)   # right-size buffers for small texts
    bounds = _pick_thresholds(hist, total, sb_cap)
    stats["counting_s"] = round(time.time() - t0, 2)
    stats["superblocks"] = len(bounds) - 1
    _log(f"counting done (host sample): {len(bounds)-1} superblocks")

    # ---- pack + upload happen chunk-interleaved inside pass 0 --------------
    # (a monolithic host pack of a 3.1 Gbp genome costs ~3.5 min on this
    # one-core container; per-chunk packing hides it behind device sorts)
    nw = (n + 15) // 16
    padw = chunk // 16 + 16
    words_pad = jnp.zeros(nw + padw, jnp.uint32)
    stats["upload_mb"] = round(nw * 4 / 2**20, 1)
    t_pack_box = [0.0]

    def _pack_chunk(k):
        t0 = time.time()
        w = packed.pack(codes[k * chunk: (k + 1) * chunk], 2)
        t_pack_box[0] += time.time() - t0
        return w

    host_text1p = None                 # lazy host mirror for tie fallback
    starts = list(range(0, total, chunk))

    # ---- per-superblock: extract -> sort -> blocks -> emit ------------------
    slack = min(1 << 20, blk)          # block-cut pull-back allowance
    BP = ((blk + slack) + 15) // 16 * 16       # padded block size
    # static superblock buffer: block slices start anywhere in
    # [0, sb_cap), so the buffer must extend BP past sb_cap or
    # _block_sort26's dynamic_slice would clamp near the end
    SBP = sb_cap + max(chunk, BP)
    BP = min(SBP, BP)
    t_extract = t_sbsort = t_block = t_deepen = 0.0
    t_upload = 0.0
    deepen_rounds = 0
    n_blocks = 0
    sb_sizes = []

    # ---- emission consumer: overlaps the bn/4-byte relay fetch of block
    # b with the device sorting block b+1 (the fetch is the measured wall
    # of the 400 Mbp shakeout: ~1.7 MB/s through the tunnel)
    import queue as _queue
    import threading

    emitq: "_queue.Queue" = _queue.Queue(maxsize=2)
    estate = {"rows": 0, "primary": -1, "err": None, "t_emit": 0.0,
              "out": []}

    def _consume():
        shifts = (2 * np.arange(16, dtype=np.uint32)).astype(np.uint32)
        while True:
            item = emitq.get()
            if item is None:
                return
            if estate["err"] is not None:
                continue
            try:
                bwords, prim, count = item
                t0 = time.time()
                bw_h = np.asarray(bwords)
                prim_h = int(prim)
                syms = ((bw_h[:, None] >> shifts) & 3).astype(
                    np.uint8).reshape(-1)[:count]
                if prim_h >= 0:
                    estate["primary"] = estate["rows"] + prim_h
                estate["rows"] += count
                if emit is not None:
                    emit(syms)
                else:
                    estate["out"].append(syms)
                estate["t_emit"] += time.time() - t0
            except Exception as e:  # noqa: BLE001 — re-raised on join
                estate["err"] = e

    consumer = threading.Thread(target=_consume, daemon=True)
    consumer.start()

    chunk_bounds = {}                  # (chunk idx) -> boundary row, pass 0
    thresholds = jnp.asarray(np.asarray(bounds, np.int32))

    for si in range(len(bounds) - 1):
        klo, khi = bounds[si], bounds[si + 1]
        t0 = time.time()
        # fresh sentinel-filled buffers: a reused buffer would leak the
        # previous superblock's entries past the new fill frontier
        sb_k1 = jnp.full(SBP, _KMAX, jnp.int32)
        sb_pos = jnp.full(SBP, _PSENT, jnp.uint32)
        off = 0
        uploaded = 0
        cw = chunk // 16

        def _upload_next():
            nonlocal uploaded, words_pad, t_upload
            tu = time.time()
            w0, w1 = uploaded * cw, min((uploaded + 1) * cw, nw)
            if w1 > w0:
                wc = jnp.asarray(_pack_chunk(uploaded)[: w1 - w0])
                words_pad = _upload_chunk(words_pad, wc, jnp.int32(w0))
            uploaded += 1
            t_upload += time.time() - tu

        for ci, s in enumerate(starts):
            if si == 0:
                # keep a 2-chunk upload lookahead: chunk ci's keys read
                # ~2 words into chunk ci+1, and enqueueing extraction
                # BEFORE the ci+2 transfer lets that transfer ride the
                # relay while the device sorts
                while uploaded <= min(ci + 1, len(starts) - 1):
                    _upload_next()
            k1s, poss = _chunk_sorted_k1pos(words_pad, jnp.uint32(s),
                                            chunk, n)
            if si == 0 and uploaded <= min(ci + 2, len(starts) - 1):
                _upload_next()
            # valid suffixes never carry _KMAX (k1 < 5^13), so 'left' at
            # _KMAX for the last superblock excludes only sentinels.
            # Boundaries are deterministic per chunk: computed for ALL
            # thresholds in pass 0 (one small fetch) and cached.
            if ci not in chunk_bounds:
                chunk_bounds[ci] = np.asarray(
                    _search_all_bounds(k1s, thresholds))
            lo_h = int(chunk_bounds[ci][si])
            hi_h = int(chunk_bounds[ci][si + 1])
            if hi_h > lo_h:
                if off + (hi_h - lo_h) > sb_cap:
                    raise ValueError(
                        f"superblock {si} overflow (> {sb_cap}); "
                        "raise sb_cap or lower the histogram target")
                sb_k1, sb_pos = _sb_append(
                    sb_k1, sb_pos, k1s, poss, jnp.int32(lo_h),
                    jnp.int32(hi_h), jnp.int32(off), chunk)
                off += hi_h - lo_h
        sb_count = off
        sb_sizes.append(sb_count)
        t_extract += time.time() - t0
        if sb_count == 0:
            continue

        t0 = time.time()
        sb_k1, sb_pos = _sb_sort(sb_k1, sb_pos)
        sb_k1.block_until_ready()
        t_sbsort += time.time() - t0

        # block cuts at k1-group boundaries (progressively widened
        # fetch windows; pull-back bounded by the BP pad slack)
        cuts = [0]
        while cuts[-1] + blk < sb_count:
            cut0 = cuts[-1] + blk
            lo_lim = max(cuts[-1] + 1, cut0 - slack)
            win = 1 << 12
            while True:
                lo_w = max(cut0 - win, lo_lim)
                k1_win = np.asarray(sb_k1[lo_w - 1:cut0 + 1])
                bnd = np.nonzero(k1_win[1:] != k1_win[:-1])[0]
                if len(bnd):
                    cuts.append(lo_w + int(bnd[-1]))
                    break
                if lo_w == lo_lim:
                    raise ValueError(
                        "single k1 group exceeds the block-cut slack "
                        "(pathological repeat); raise blk")
                win *= 16
        cuts.append(sb_count)

        for bi in range(len(cuts) - 1):
            start, end = cuts[bi], cuts[bi + 1]
            count = end - start
            n_blocks += 1
            assert count <= BP, (count, BP)
            t0 = time.time()
            pos_plane, grank, tied, n_tied = _block_sort26(
                words_pad, sb_k1, sb_pos, jnp.int32(start),
                jnp.int32(count), BP, n)
            nt = int(n_tied)
            t_block += time.time() - t0

            # ---- tie deepening ------------------------------------------
            t0 = time.time()
            d = 2 * _B5
            rounds = 0
            if 0 < nt <= host_tie_cap:
                # host tiny-tie fast path: order the few collisions by
                # direct text comparison, skip deepening entirely
                from nvbio_tpu.index.device_sa import _host_tie_order

                if host_text1p is None:
                    host_text1p = codes.astype(np.uint8) + 1
                rows_d, pos_d, grp_d = _tied_slots_blk(
                    pos_plane, grank, tied, min(host_tie_cap, BP))
                rows_h = np.asarray(rows_d[:nt])
                pos_h = np.asarray(pos_d[:nt]).astype(np.int64)
                grp_h = np.asarray(grp_d[:nt])
                new_pos = _host_tie_order(host_text1p, pos_h, grp_h,
                                          start=d)
                pos_plane = pos_plane.at[jnp.asarray(rows_h)].set(
                    jnp.asarray(new_pos.astype(np.uint32)))
                stats["host_tie_small"] = stats.get(
                    "host_tie_small", 0) + int(nt)
                nt = 0
            while nt > tie_cap and rounds < max_deepen:
                pos_plane, grank, tied, n_tied = _deepen_full(
                    words_pad, pos_plane, grank, jnp.int32(count),
                    jnp.int32(d), n)
                nt = int(n_tied)
                d += 2 * _B5
                rounds += 1
            rows = grp = None
            if 0 < nt <= tie_cap:
                C = min(tie_cap, BP)
                rows = _tied_rows(tied, C)
                grp = jnp.take(grank, jnp.where(
                    jnp.arange(C) < nt, rows, 0))
                while nt > 0 and rounds < max_deepen:
                    pos_plane, rows, grp, n_tied = _deepen_compact(
                        words_pad, pos_plane, rows, grp, jnp.int32(d),
                        jnp.int32(nt), n, C)
                    nt = int(n_tied)
                    d += 2 * _B5
                    rounds += 1
            if nt > 0:
                # pathological LCP (deepening round cap hit): order the
                # remaining tied groups by direct host comparison — same
                # comparator as the tiny-tie path of the one-shot device
                # sort (device_sa._host_tie_order)
                from nvbio_tpu.index.device_sa import _host_tie_order

                if host_text1p is None:
                    host_text1p = codes.astype(np.uint8) + 1
                if rows is not None:
                    rows_h = np.asarray(rows[:nt])
                    grp_h = np.asarray(grp[:nt])
                else:                      # full-plane path exceeded cap
                    tied_h = np.asarray(tied)
                    rows_h = np.nonzero(tied_h)[0].astype(np.int32)
                    grp_h = np.asarray(grank)[rows_h]
                pos_h = np.asarray(jnp.take(
                    pos_plane, jnp.asarray(rows_h))).astype(np.int64)
                new_pos = _host_tie_order(host_text1p, pos_h, grp_h,
                                          start=d)
                pos_plane = pos_plane.at[jnp.asarray(rows_h)].set(
                    jnp.asarray(new_pos.astype(np.uint32)))
                stats["host_tie_fallbacks"] = stats.get(
                    "host_tie_fallbacks", 0) + int(nt)
            deepen_rounds += rounds
            t_deepen += time.time() - t0

            # ---- emit (async: the consumer thread fetches) ----------------
            bwords, prim = _block_bwt(words_pad, pos_plane,
                                      jnp.int32(count), n)
            emitq.put((bwords, prim, count))
            if estate["err"] is not None:
                break
        if estate["err"] is not None:
            break

    emitq.put(None)
    consumer.join()
    if estate["err"] is not None:
        raise estate["err"]
    rows_emitted = estate["rows"]
    primary_row = estate["primary"]
    assert rows_emitted == total, (rows_emitted, total)
    assert primary_row >= 0
    stats.update(
        host_pack_s=round(t_pack_box[0], 2),
        upload_s=round(t_upload - t_pack_box[0], 2),
        extract_s=round(t_extract - t_upload, 2),
        sb_sort_s=round(t_sbsort, 2),
        block_sort_s=round(t_block, 2), deepen_s=round(t_deepen, 2),
        deepen_rounds=deepen_rounds,
        emit_fetch_s=round(estate["t_emit"], 2),
        sb_sizes=sb_sizes, blocks=n_blocks, primary=primary_row,
        total_s=round(time.time() - t_all, 2),
        msuffixes_per_s=round(total / (time.time() - t_all) / 1e6, 2))
    if emit is not None:
        return None, primary_row, stats
    t0 = time.time()
    full = np.concatenate(estate["out"])
    bwt = np.delete(full, primary_row)
    stats["host_assemble_s"] = round(time.time() - t0, 2)
    return bwt, primary_row, stats
