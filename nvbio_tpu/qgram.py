"""Q-gram (k-mer) indices: direct-address lookup tables over packed texts.

Capability parity with ``nvbio/qgram`` (``qgram.h:414-662`` sorted q-gram
index, ``qgroup.h:81-200`` Q-Group index, ``filter.h:67-214`` batch filters).

TPU-first design: the *direct-address* layout (bucket offsets of size 4^q + a
position table sorted by q-gram) turns a seed lookup into two HBM gathers —
no backward search, no suffix-array walk — which is why it is also the fast
seeding path of the read-mapping pipeline. The FM-index remains the compact /
full-text-search structure; the q-gram table trades memory (4(n + 4^q) bytes)
for gather count.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import numpy as np


@dataclasses.dataclass
class QGramIndex:
    """Direct-address q-gram index of a 2-bit text.

    ``offsets``/``positions`` are int32 for texts < 2^31 symbols and uint32
    up to 2^32 (human-genome scale; the reference reaches whole-human via
    device suffix sorting, ``nvbio/sufsort/sufsort.h:45-60`` — here the
    same reach comes from unsigned positions + the blocked counting-sort
    builder ``build_qgram_index_large``)."""

    q: int
    offsets: Any    # (u)int32[4^q + 1] bucket start offsets
    positions: Any  # (u)int32[n - q + 1] text positions sorted by (qgram, pos)
    n: int          # text length
    # middle bucket entry per key (dtype-max sentinel = empty bucket): the
    # 1-mismatch seeding path reads ONE gather per mutated key instead of
    # the (lo, hi, locate) triple — 3x fewer random HBM loads on the reseed
    # pass. Optional (None = fall back to offset arithmetic).
    mid_pos: Any = None

    def device(self) -> "QGramIndex":
        import jax.numpy as jnp

        return QGramIndex(
            self.q, jnp.asarray(self.offsets), jnp.asarray(self.positions),
            self.n,
            None if self.mid_pos is None else jnp.asarray(self.mid_pos),
        )

    def save(self, path: str) -> None:
        extra = {}
        if self.mid_pos is not None:
            extra["mid_pos"] = np.asarray(self.mid_pos)
        np.savez_compressed(
            path, q=self.q, offsets=np.asarray(self.offsets),
            positions=np.asarray(self.positions), n=self.n, **extra,
        )

    @classmethod
    def load(cls, path: str) -> "QGramIndex":
        z = np.load(path)
        return cls(int(z["q"]), z["offsets"], z["positions"], int(z["n"]),
                   z["mid_pos"] if "mid_pos" in z.files else None)


jax.tree_util.register_pytree_node(
    QGramIndex,
    lambda s: ((s.offsets, s.positions, s.mid_pos), (s.q, s.n)),
    lambda aux, ch: QGramIndex(q=aux[0], offsets=ch[0], positions=ch[1],
                               n=aux[1], mid_pos=ch[2]),
)


def attach_midpos(idx: "QGramIndex") -> "QGramIndex":
    """Fill ``mid_pos`` from a built (offsets, positions) table (host)."""
    offsets = np.asarray(idx.offsets)
    positions = np.asarray(idx.positions)
    dt = offsets.dtype
    sent = np.iinfo(dt).max
    try:
        from nvbio_tpu import native

        mid = native.qgram_midpos(
            offsets.view(np.uint32), positions.view(np.uint32),
            int(np.uint32(sent))).view(dt)
    except Exception:
        cnt = offsets[1:] - offsets[:-1]
        if len(positions) == 0:
            mid = np.full(len(offsets) - 1, sent, dt)
        else:
            mid_idx = (offsets[:-1] + cnt // 2).astype(np.int64)
            mid = np.where(
                cnt > 0,
                positions[np.minimum(mid_idx, len(positions) - 1)],
                dt.type(sent))
    return dataclasses.replace(idx, mid_pos=mid.astype(dt))


def qgram_keys(codes: np.ndarray, q: int) -> np.ndarray:
    """Rolling q-gram keys of a code array: key[i] = codes[i:i+q] base-4,
    big-endian (first symbol in the high bits). int64 host-side."""
    codes = np.asarray(codes, dtype=np.int64)
    n = len(codes) - q + 1
    if n <= 0:
        return np.zeros(0, dtype=np.int64)
    keys = np.zeros(n, dtype=np.int64)
    for j in range(q):
        keys = (keys << 2) | codes[j:j + n]
    return keys


def position_dtype(n: int):
    """int32 below 2^31 symbols, uint32 up to 2^32 (large-genome mode)."""
    if n >= 2**32:
        raise ValueError("texts >= 2^32 symbols must be sharded (see "
                         "nvbio_tpu.parallel.sharded_index)")
    return np.uint32 if n >= 2**31 else np.int32


def _window_has_n(n_flags: np.ndarray, q: int) -> np.ndarray:
    """bad[i] = any(n_flags[i : i + q]) for i in [0, len - q + 1)."""
    npos = len(n_flags) - q + 1
    cs = np.zeros(len(n_flags) + 1, np.int64)
    np.cumsum(n_flags.astype(np.int64), out=cs[1:])
    return (cs[q:q + npos] - cs[:npos]) > 0


def build_qgram_index(codes: np.ndarray, q: int = 12,
                      n_flags: np.ndarray | None = None,
                      midpos: bool = True,
                      engine: str = "auto") -> QGramIndex:
    """Host-side construction (counting sort over buckets).

    ``n_flags`` (bool per position) marks ambiguous genome bases: q-grams
    overlapping an N run are EXCLUDED from the table, so folded-to-A N
    stretches can't attract spurious seed hits (DNA_N semantics,
    ``nvbio/strings/alphabet.h:68-76``).

    ``engine``: "native" (C++ counting sort, two passes, O(n + 4^q)),
    "numpy" (the golden model), or "auto". The native engine builds a
    100 Mbp table in seconds where numpy's comparison argsort takes minutes
    (the reference's device builder: ``qgram/qgram.h:414-662``)."""
    if q < 1 or q > 15:
        raise ValueError("q must be in [1, 15] for int32 keys")
    if engine in ("auto", "native"):
        try:
            from nvbio_tpu import native

            offs_u32, pos_u32 = native.qgram_build(
                codes, q,
                None if n_flags is None
                else np.asarray(n_flags, np.uint8))
            dt = position_dtype(len(codes))
            idx = QGramIndex(
                q=q,
                offsets=offs_u32 if dt == np.uint32 else
                offs_u32.astype(dt),
                positions=pos_u32 if dt == np.uint32 else
                pos_u32.astype(dt),
                n=len(codes),
            )
            return attach_midpos(idx) if midpos else idx
        except Exception:
            if engine == "native":
                raise
    if len(codes) >= 2**28:  # blocked builder: bounded peak memory
        return build_qgram_index_large(codes, q, n_flags=n_flags,
                                       midpos=midpos)
    keys = qgram_keys(codes, q)
    valid_pos = None
    if n_flags is not None and len(keys):
        bad = _window_has_n(np.asarray(n_flags, bool)[:len(codes)], q)
        if bad.any():
            valid_pos = np.flatnonzero(~bad)
            keys = keys[valid_pos]
    n_buckets = 1 << (2 * q)
    counts = np.bincount(keys, minlength=n_buckets)
    offsets = np.zeros(n_buckets + 1, dtype=np.int64)
    np.cumsum(counts, out=offsets[1:])
    order = np.argsort(keys, kind="stable")  # positions sorted by key, then pos
    if valid_pos is not None:
        order = valid_pos[order]
    dt = position_dtype(len(codes))
    idx = QGramIndex(
        q=q,
        offsets=offsets.astype(dt),
        positions=order.astype(dt),
        n=len(codes),
    )
    return attach_midpos(idx) if midpos else idx


def build_qgram_index_large(codes: np.ndarray, q: int = 12,
                            chunk: int = 1 << 27,
                            n_flags: np.ndarray | None = None,
                            verbose: bool = False,
                            midpos: bool = True) -> QGramIndex:
    """Blocked counting-sort builder for multi-Gbp texts.

    Two passes over ``chunk``-sized slices: (1) per-chunk bucket histograms
    -> global bucket bases, (2) per-chunk stable radix argsort + vectorized
    scatter into the final position table. Peak extra memory is
    O(chunk + n_chunks * 4^q) instead of O(n) int64 sort state, so a
    3.1 Gbp (human NCBI36-scale) genome indexes in bounded RAM — the
    host-side counterpart of the reference's blockwise device suffix sorting
    (``nvbio/sufsort/sufsort.h:55-60``; q-gram flavor ``qgram/qgram.h:414``).
    """
    n = len(codes)
    npos = max(n - q + 1, 0)
    dt = position_dtype(n)
    n_buckets = 1 << (2 * q)
    n_chunks = (npos + chunk - 1) // chunk

    if n_flags is not None:
        n_flags = np.asarray(n_flags, bool)[:n]

    def chunk_keys(c):
        s, e = c * chunk, min((c + 1) * chunk, npos)
        k = qgram_keys(codes[s:e + q - 1], q)
        if n_flags is not None:
            keep = ~_window_has_n(n_flags[s:e + q - 1], q)
            return k[keep], np.flatnonzero(keep) + s
        return k, None

    # pass 1: global bucket histogram (keys recomputed per chunk: cheaper
    # than materializing 8n bytes of int64 keys)
    totals = np.zeros(n_buckets, np.int64)
    for c in range(n_chunks):
        totals += np.bincount(chunk_keys(c)[0], minlength=n_buckets)
        if verbose:
            print(f"  qgram pass1 chunk {c + 1}/{n_chunks}", flush=True)
    bucket_starts = np.zeros(n_buckets + 1, np.int64)
    np.cumsum(totals, out=bucket_starts[1:])

    # pass 2: per chunk, stable radix argsort + vectorized scatter at each
    # bucket's running cursor (chunks are processed in position order, so
    # within a bucket positions land sorted)
    positions = np.empty(int(bucket_starts[-1]), dt)
    cur = bucket_starts[:-1].copy()
    for c in range(n_chunks):
        k64, pos_of = chunk_keys(c)
        k = k64.astype(np.uint32)
        order = np.argsort(k, kind="stable")  # radix sort on uint32 keys
        sk = k[order]
        # within-bucket rank of each sorted element (vectorized run ranks)
        run_start = np.zeros(len(sk), np.int64)
        new_run = np.flatnonzero(sk[1:] != sk[:-1]) + 1
        run_start[new_run] = new_run
        np.maximum.accumulate(run_start, out=run_start)
        within = np.arange(len(sk), dtype=np.int64) - run_start
        src = (order + c * chunk) if pos_of is None else pos_of[order]
        positions[cur[sk] + within] = src.astype(dt)
        cur += np.bincount(k, minlength=n_buckets)
        if verbose:
            print(f"  qgram pass2 chunk {c + 1}/{n_chunks}", flush=True)
    idx = QGramIndex(
        q=q,
        offsets=bucket_starts.astype(dt),
        positions=positions,
        n=n,
    )
    return attach_midpos(idx) if midpos else idx


def seed_keys_from_batch(seeds, q: int):
    """Pack the first q symbols of dense seeds (..., s>=q) into int32 keys
    (big-endian, matching ``qgram_keys``)."""
    import jax.numpy as jnp

    shifts = (2 * (q - 1 - jnp.arange(q, dtype=jnp.int32)))
    return jnp.sum(
        seeds[..., :q].astype(jnp.int32) << shifts, axis=-1
    ).astype(jnp.int32)


def qgram_range(index: QGramIndex, keys):
    """Bucket ranges [lo, hi) for q-gram keys (device, batched)."""
    import jax.numpy as jnp

    keys = jnp.clip(keys, 0, (1 << (2 * index.q)) - 1)
    lo = jnp.take(index.offsets, keys)
    hi = jnp.take(index.offsets, keys + 1)
    return lo, hi


def qgram_locate(index: QGramIndex, lo, slot):
    """Text positions for hit slots within bucket ranges: positions[lo+slot]."""
    import jax.numpy as jnp

    lo = jnp.asarray(lo)
    idx = jnp.minimum(lo + jnp.asarray(slot).astype(lo.dtype),
                      jnp.asarray(index.positions.shape[0] - 1, lo.dtype))
    return jnp.take(index.positions, idx)


def qgram_count(index: QGramIndex, queries, qlens=None):
    """Batch hit counting (the QGramFilter 'rank' pass): queries (B, L>=q)."""
    keys = seed_keys_from_batch(queries, index.q)
    lo, hi = qgram_range(index, keys)
    return hi - lo


@dataclasses.dataclass
class QGroupIndex:
    """Q-Group index: two-level compacted q-gram dictionary.

    Counterpart of the reference's ``qgram/qgroup.h:81-200``
    (``QGroupIndexDevice``, after Koester & Rahmann's PEANUT): a presence
    bitvector I over the 4^q key space (1 bit/key instead of a 4-byte
    offset), per-word popcount prefix sums S, per-unique-qgram slot starts
    SS, and the position array P — O(1) lookups in 2*4^q bits + O(unique)
    words, 16x smaller than the direct-address table for large q.
    """

    q: int
    I: Any          # uint32[ceil(4^q / 32)] presence bitvector
    S: Any          # int32[len(I) + 1] exclusive popcount prefix
    SS: Any         # int32[n_unique + 1] slot start offsets
    P: Any          # int32[n - q + 1] positions sorted by (qgram, pos)
    n: int          # text length

    def device(self) -> "QGroupIndex":
        import jax.numpy as jnp

        return QGroupIndex(self.q, jnp.asarray(self.I), jnp.asarray(self.S),
                           jnp.asarray(self.SS), jnp.asarray(self.P), self.n)

    def save(self, path: str) -> None:
        np.savez_compressed(
            path, q=self.q, I=np.asarray(self.I), S=np.asarray(self.S),
            SS=np.asarray(self.SS), P=np.asarray(self.P), n=self.n)

    @classmethod
    def load(cls, path: str) -> "QGroupIndex":
        z = np.load(path)
        return cls(int(z["q"]), z["I"], z["S"], z["SS"], z["P"], int(z["n"]))


jax.tree_util.register_pytree_node(
    QGroupIndex,
    lambda s: ((s.I, s.S, s.SS, s.P), (s.q, s.n)),
    lambda aux, ch: QGroupIndex(q=aux[0], I=ch[0], S=ch[1], SS=ch[2],
                                P=ch[3], n=aux[1]),
)


def build_qgroup_index(codes: np.ndarray, q: int = 16) -> QGroupIndex:
    """Host-side Q-Group construction (sort + unique + popcount prefixes).

    q up to 16 (32-bit keys; the device lookup works in uint32)."""
    if q < 1 or q > 16:
        raise ValueError("q must be in [1, 16] (32-bit keys)")
    keys = qgram_keys(codes, q)
    order = np.argsort(keys, kind="stable")
    sk = keys[order]
    uniq_mask = np.ones(len(sk), bool)
    if len(sk):
        uniq_mask[1:] = sk[1:] != sk[:-1]
    uniq_keys = sk[uniq_mask]
    starts = np.flatnonzero(uniq_mask)
    SS = np.append(starts, len(sk)).astype(np.int32)

    n_words = ((1 << (2 * q)) + 31) // 32
    I = np.zeros(n_words, np.uint32)
    w = (uniq_keys >> 5).astype(np.int64)
    b = (uniq_keys & 31).astype(np.uint32)
    np.bitwise_or.at(I, w, np.uint32(1) << b)
    pop = np.bitwise_count(I).astype(np.int64) if hasattr(np, "bitwise_count") \
        else np.unpackbits(I.view(np.uint8)).reshape(n_words, 32).sum(1)
    S = np.zeros(n_words + 1, np.int64)
    np.cumsum(pop, out=S[1:])
    return QGroupIndex(q=q, I=I, S=S.astype(np.int32), SS=SS,
                       P=order.astype(np.int32), n=len(codes))


def _popcount32(x):
    import jax.numpy as jnp

    x = x - ((x >> 1) & 0x55555555)
    x = (x & 0x33333333) + ((x >> 2) & 0x33333333)
    x = (x + (x >> 4)) & 0x0F0F0F0F
    return (x * 0x01010101) >> 24


def qgroup_range(index: QGroupIndex, keys):
    """Bucket ranges [lo, hi) for q-gram keys (device, batched) — the
    reference's ``QGroupIndexViewCore::range`` (qgroup.h:120-136).

    Keys are taken modulo 2^(2q) in uint32 space, so q=16 works even though
    packed int32 seed keys wrap negative."""
    import jax.numpy as jnp

    mask32 = np.uint32(((1 << (2 * index.q)) - 1) & 0xFFFFFFFF)
    keys = keys.astype(jnp.uint32) & mask32
    i = (keys >> 5).astype(jnp.int32)
    j = keys & 31
    word = jnp.take(index.I, i).astype(jnp.uint32)
    present = (word >> j) & 1
    j_prime = _popcount32(word & ((jnp.uint32(1) << j) - 1)).astype(jnp.int32)
    slot = jnp.take(index.S, i) + j_prime
    slot = jnp.clip(slot, 0, index.SS.shape[0] - 2)
    lo = jnp.take(index.SS, slot)
    hi = jnp.take(index.SS, slot + 1)
    lo = jnp.where(present == 1, lo, 0)
    hi = jnp.where(present == 1, hi, 0)
    return lo, hi


def qgroup_locate(index: QGroupIndex, lo, slot):
    import jax.numpy as jnp

    idx = jnp.clip(lo + slot, 0, index.P.shape[0] - 1)
    return jnp.take(index.P, idx)


def stratified_offsets(range_size, H: int, NS: int):
    """Jittered stratified slot offsets into position-sorted buckets.

    range_size: (..., NS) bucket sizes; returns (..., NS, H) offsets.
    The deterministic equivalent of nvBowtie's SumTree-CDF hit selection
    (``nvBowtie/bowtie2/cuda/select.h:52-80``): H slots strided across the
    range, phase-jittered per seed index so correlated bucket ranks (a
    read's true occurrence sits at ~the same rank fraction in every seed's
    bucket) don't make all seeds miss together. Exact floor(m*r/D) without
    32-bit overflow: m*(r//D) + (m*(r%D))//D (m < D).
    """
    import jax.numpy as jnp

    rdt = range_size.dtype
    k = jnp.arange(H, dtype=jnp.int32)
    D = H * NS
    m_sl = (k[None, :] * NS
            + jnp.arange(NS, dtype=jnp.int32)[:, None]).astype(rdt)  # (NS, H)
    r3 = range_size[..., None]
    return jnp.where(
        r3 > H,
        m_sl * (r3 // D) + (m_sl * (r3 % D)) // D,
        k.astype(rdt),
    )


def stratified_locate_rows(index: QGramIndex, lo, rsz, H: int, NS: int):
    """Stratified H-slot locate via 2 tile-row gathers per seed.

    Flat per-slot gathers cost ~15 ns per INDEX on TPU and a (1, 128)
    tile-aligned row costs the same as one scalar (GATHER_MICRO.json), so
    instead of H position gathers per seed this fetches the two covering
    128-entry position rows (2 indexes) and picks the H slots with a dense
    in-register one-hot reduction. Slot choice is bit-identical to
    ``stratified_offsets`` for bucket ranges <= 128 (the overwhelming
    case); wider buckets sample a 128-slot window placed at a per-seed
    depth ``(excess // NS) * seed_index``, so mega-repeat buckets are
    still covered across a read's seeds. The row table is an exact
    reshape of ``positions`` — no extra index memory.

    lo/rsz: (B, NS) bucket starts and sizes; returns (B, NS, H) positions.
    """
    import jax.numpy as jnp

    pos_t = index.positions
    Np = pos_t.shape[0]
    R = (Np + 127) // 128
    rows = jnp.pad(pos_t, (0, R * 128 - Np)).reshape(R, 128)
    rdt = lo.dtype

    rsz_c = jnp.minimum(rsz, jnp.asarray(128, rsz.dtype))
    off = stratified_offsets(rsz_c, H, NS)                 # (B, NS, H) < 128
    excess = rsz - rsz_c
    s_idx = jnp.arange(NS, dtype=rdt)
    shift = (excess // jnp.asarray(NS, rdt)) * s_idx[None, :]
    base = lo + shift                                      # (B, NS)

    r0 = jnp.minimum((base // 128).astype(jnp.int32), R - 1)
    col = (base - base // 128 * 128).astype(jnp.int32)     # base % 128
    r1 = jnp.minimum(r0 + 1, R - 1)
    Q = base.size
    g0 = jnp.take(rows, r0.reshape(Q), axis=0)             # (Q, 128)
    g1 = jnp.take(rows, r1.reshape(Q), axis=0)
    got = jnp.concatenate([g0, g1], axis=1)                # (Q, 256)

    cols = col.reshape(Q, 1) + off.reshape(Q, H).astype(jnp.int32)
    lane = jnp.arange(256, dtype=jnp.int32)
    sel = cols[:, :, None] == lane[None, None, :]
    pos = jnp.sum(jnp.where(sel, got[:, None, :], jnp.zeros((), rdt)),
                  axis=-1, dtype=rdt)
    return pos.reshape(*lo.shape, H)


def index_range(index, keys):
    """Range lookup dispatching on index flavor (direct-address or qgroup)."""
    if isinstance(index, QGroupIndex):
        return qgroup_range(index, keys)
    return qgram_range(index, keys)


def index_locate(index, lo, slot):
    if isinstance(index, QGroupIndex):
        return qgroup_locate(index, lo, slot)
    return qgram_locate(index, lo, slot)


# ---------------------------------------------------------------------------
# String-set q-gram index (QGramSetIndexDevice parity, qgram.h:414-662):
# q-grams extracted from a STRING-SET (e.g. the reads themselves), kept as a
# sorted unique-key list + slots + (string, pos) coordinate pairs. Memory is
# O(#qgrams) — no 4^q plane — and queries are O(log unique) via a leading-
# symbols LUT + a fixed-iteration in-bucket binary search (the TPU form of
# the reference's lut + lower_bound, qgram.h:558-580). This is the structure
# for read-vs-read workloads (overlap finding, all-mapping filters) where
# building a genome-sized direct-address table per batch would be absurd.
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class QGramSetIndex:
    q: int
    qgrams: Any      # (U,) sorted unique q-gram keys (int32, q <= 15)
    slots: Any       # (U + 1,) int32: coords of key u live in slots[u:u+1]
    coord_str: Any   # (N,) int32 string ids, sorted by (key, string, pos)
    coord_pos: Any   # (N,) int32 in-string positions
    qlut: int        # leading symbols resolved by the LUT
    lut: Any         # (4^qlut + 1,) int32 bounds into qgrams
    max_probe: int   # binary-search iterations covering the widest LUT bin

    def device(self) -> "QGramSetIndex":
        import jax.numpy as jnp

        return dataclasses.replace(
            self, qgrams=jnp.asarray(self.qgrams),
            slots=jnp.asarray(self.slots),
            coord_str=jnp.asarray(self.coord_str),
            coord_pos=jnp.asarray(self.coord_pos),
            lut=jnp.asarray(self.lut))


jax.tree_util.register_pytree_node(
    QGramSetIndex,
    lambda s: ((s.qgrams, s.slots, s.coord_str, s.coord_pos, s.lut),
               (s.q, s.qlut, s.max_probe)),
    lambda aux, ch: QGramSetIndex(
        q=aux[0], qgrams=ch[0], slots=ch[1], coord_str=ch[2],
        coord_pos=ch[3], qlut=aux[1], lut=ch[4], max_probe=aux[2]),
)


def build_qgram_set_index(seqs: np.ndarray, lens: np.ndarray, q: int,
                          stride: int = 1, qlut: int = 8) -> QGramSetIndex:
    """Host build over a padded (B, Lmax) code matrix + lengths.

    ``stride`` extracts q-grams at every ``stride``-th in-string position
    (the reference's seed-functor extraction, qgram.h:382-396); windows
    containing N codes (> 3) are excluded like the string index builder.
    """
    if q < 1 or q > 15:
        raise ValueError("q must be in [1, 15] for int32 keys")
    seqs = np.asarray(seqs)
    lens = np.asarray(lens)
    B, Lm = seqs.shape
    npos = Lm - q + 1
    if npos <= 0:
        raise ValueError("strings shorter than q")
    qlut = min(qlut, q)
    keys = np.zeros((B, npos), np.int64)
    bad = np.zeros((B, npos), bool)
    for j in range(q):
        col = seqs[:, j:j + npos].astype(np.int64)
        bad |= col > 3
        keys = (keys << 2) | np.minimum(col, 3)
    in_len = (np.arange(npos, dtype=np.int64)[None, :] + q) <= lens[:, None]
    valid = ~bad & in_len
    if stride > 1:
        keep = np.zeros(npos, bool)
        keep[::stride] = True
        valid &= keep[None, :]
    sid, spos = np.nonzero(valid)
    kflat = keys[sid, spos].astype(np.int64)
    order = np.argsort(kflat, kind="stable")  # stable: coords stay
    kflat = kflat[order]                      # (key, string, pos)-sorted
    coord_str = sid[order].astype(np.int32)
    coord_pos = spos[order].astype(np.int32)
    if len(kflat):
        new = np.concatenate([[True], kflat[1:] != kflat[:-1]])
        qgrams = kflat[new].astype(np.int32)
        slots = np.concatenate(
            [np.flatnonzero(new), [len(kflat)]]).astype(np.int32)
    else:
        qgrams = np.zeros(0, np.int32)
        slots = np.zeros(1, np.int32)
    shift = 2 * (q - qlut)
    lut = np.searchsorted(
        qgrams >> shift, np.arange((1 << (2 * qlut)) + 1),
        side="left").astype(np.int32)
    widest = int((lut[1:] - lut[:-1]).max()) if len(qgrams) else 1
    max_probe = max(1, int(np.ceil(np.log2(max(widest, 1) + 1))))
    return QGramSetIndex(q=q, qgrams=qgrams, slots=slots,
                         coord_str=coord_str, coord_pos=coord_pos,
                         qlut=qlut, lut=lut, max_probe=max_probe)


def set_index_range(index: QGramSetIndex, keys):
    """(lo, hi) coordinate ranges for a batch of q-gram keys (device).

    LUT bounds + a fixed-iteration lower_bound: ``max_probe`` halvings
    always suffice for the widest LUT bin, so the search is a static
    unrolled loop of dense gathers — no data-dependent control flow.
    """
    import jax.numpy as jnp

    q, qlut = index.q, index.qlut
    keys = jnp.asarray(keys).astype(jnp.int32)
    g_lut = (keys >> (2 * (q - qlut))) & ((1 << (2 * qlut)) - 1)
    lo_b = jnp.take(index.lut, g_lut)
    hi_b = jnp.take(index.lut, g_lut + 1)
    U = index.qgrams.shape[0]
    # lower_bound of key in qgrams[lo_b:hi_b)
    lo, hi = lo_b, hi_b
    for _ in range(index.max_probe):
        mid = (lo + hi) // 2
        v = jnp.take(index.qgrams, jnp.clip(mid, 0, max(U - 1, 0)))
        go_right = v < keys
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right, hi, mid)
    i = jnp.clip(lo, 0, max(U - 1, 0))
    found = (lo < hi_b) & (jnp.take(index.qgrams, i) == keys) & (U > 0)
    rlo = jnp.where(found, jnp.take(index.slots, i), 0)
    rhi = jnp.where(found, jnp.take(index.slots, i + 1), 0)
    return rlo, rhi


def set_index_locate(index: QGramSetIndex, slot):
    """(string_id, pos) coordinate of occurrence ``slot`` (the reference's
    uint2 coord, qgram.h:491)."""
    import jax.numpy as jnp

    n = index.coord_pos.shape[0]
    s = jnp.clip(jnp.asarray(slot), 0, max(n - 1, 0))
    return jnp.take(index.coord_str, s), jnp.take(index.coord_pos, s)
