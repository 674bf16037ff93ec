"""Device-side suffix sorting: prefix doubling over ``jax.lax.sort``.

TPU-native counterpart of the reference's GPU suffix sorters
(``nvbio/sufsort/sufsort.h:86-302`` blockwise DCS/CompressionSort,
``prefix_doubling_sufsort.h`` device prefix doubling): the headline
reference capability is whole-genome BWT construction measured in minutes
on 2013 GPUs (``sufsort.h:45-60``, 70 M suffixes/s). The TPU re-design is
classic Manber-Myers prefix doubling, but laid out for XLA:

- round 0 sorts every suffix by its first 26 symbols at once — two base-5
  13-symbol integer keys (base-5 keeps the sentinel distinct from 'A'
  inside an int32) built from 26 STATIC shifted slices, no gathers;
- each doubling round forms (rank[i], rank[i+k]) where the second key is a
  ``dynamic_slice`` SHIFT of the zero-padded rank plane (not a gather),
  then one 2-key ``lax.sort`` + one neighbor-difference scan + one scatter;
- the loop is a ``lax.while_loop`` that exits as soon as all ranks are
  unique — random DNA resolves in 1-2 rounds past the 26-symbol bootstrap;
  repeat-heavy texts take up to log2(n/26).

Measured on a v5e (INDEX_SPEED.json): 34.5 M suffixes/s steady-state at
100 Mbp (2.9 s for the sort, 7.1 s for the full device-resident FM-index
build) — against ~10 minutes for the host SA-IS path on one core. Memory:
the sort holds ~8 int32 planes of n+1 at its peak and the staged plane
builds (donated inputs) ~6, so one 16 GB chip covers n up to the ~390 Mbp
human-slice scale; larger genomes go through the genome-sliced sharded
build (``fmi/sharded.py``) with one slice per chip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_B5 = 13  # symbols per base-5 int32 key (5^13 < 2^31)


def _base5_keys(c1p: jnp.ndarray, start: int) -> jnp.ndarray:
    """Base-5 key of symbols [i+start, i+start+13) per position i.

    ``c1p``: int32 text in 1..4 (0 past the end), zero-padded by >= start+13.
    Static shifted slices only — no gathers.
    """
    m = c1p.shape[0] - (2 * _B5 + 1)
    key = jnp.zeros(m, jnp.int32)
    for j in range(_B5):
        key = key * 5 + jax.lax.dynamic_slice(c1p, (start + j,), (m,))
    return key


@functools.partial(jax.jit, static_argnames=("m",))
def _sa_bootstrap(c1p, m: int):
    """Round 0: sort all suffixes by their first 26 symbols.

    Ranks are GROUP-START positions (the sorted index of each group's
    first row), not dense ids — group-start ranks leave room between
    groups so a tied group can split without renumbering anything else,
    which is what lets tie resolution run on a compacted subset.
    Returns (sa, rank_sorted (in sorted order), tied mask (sorted order),
    done, n_tied)."""
    k1 = _base5_keys(c1p, 0)
    k2 = _base5_keys(c1p, _B5)
    idx = jnp.arange(m, dtype=jnp.int32)
    s1, s2, sa = jax.lax.sort((k1, k2, idx), num_keys=2)
    new_grp = jnp.concatenate([
        jnp.ones(1, bool),
        (s1[1:] != s1[:-1]) | (s2[1:] != s2[:-1])])
    rank_sorted = jax.lax.cummax(jnp.where(new_grp, idx, 0))
    run_end = jnp.concatenate([new_grp[1:], jnp.ones(1, bool)])
    tied = ~(new_grp & run_end)          # member of a group of size >= 2
    n_tied = jnp.sum(tied.astype(jnp.int32))
    return sa, rank_sorted, tied, n_tied == 0, n_tied


@jax.jit
def _inv_rank(sa, rank_sorted):
    """rank[pos] from sorted-order ranks: a 1-key sort by sa (measured
    ~1.8x faster than the equivalent scatter on v5e)."""
    _, rank = jax.lax.sort((sa, rank_sorted), num_keys=1)
    return rank


# capacity of the compacted tie-resolution subset: random DNA at 100 Mbp
# leaves only ~thousands of 26-symbol ties, so the post-bootstrap doubling
# loop needs to touch ~0.001% of the rows — sorting all m of them again
# (the classic prefix-doubling round) wastes 1.4 s per round at 100 Mbp
_TIE_CAP = 1 << 20
# compacted-capacity ladder (monkeypatch to () in tests to force the
# full-plane fallback): each rung is one extra compile, used only when a
# text's tie count reaches it
_TIE_CAPS = (_TIE_CAP, 16 << 20, 64 << 20)


@functools.partial(jax.jit, static_argnames=("m", "C"))
def _sa_tie_doubling(sa, rank, tied, m: int, C: int):
    """Prefix doubling restricted to the tied rows (<= C of them).

    Invariants: tied groups occupy fixed global sorted positions (splits
    permute only within a group), so the ascending tied-row list is a
    static slot->global-position map; group-start ranks mean a split only
    rewrites the split group's members. Each round is a C-element 2-key
    sort + two bounded gathers + two scatters — microseconds against the
    full-plane round's 1.4 s."""
    idx = jnp.arange(m, dtype=jnp.int32)
    order_key = jnp.where(tied, jnp.int32(0), jnp.int32(1))
    _, rows = jax.lax.sort((order_key, idx), num_keys=1)  # stable
    rows = rows[:C]                       # ascending tied rows (then pad)
    n_tied = jnp.sum(tied.astype(jnp.int32))
    slot = jnp.arange(C, dtype=jnp.int32)
    valid = slot < n_tied
    pos = jnp.take(sa, rows)
    grank = jnp.take(rank, pos)
    BIG = jnp.int32(1 << 30)

    def cond(c):
        k, pos, grank, rank, sa, unresolved = c
        return unresolved & (k < 2 * m)

    def body(c):
        k, pos, grank, rank, sa, _ = c
        nxt = pos + k
        second = jnp.where(nxt < m,
                           jnp.take(rank, jnp.clip(nxt, 0, m - 1)),
                           jnp.int32(-1))  # short suffixes sort first
        key1 = jnp.where(valid, grank, BIG)
        key2 = jnp.where(valid, second, BIG)
        k1s, k2s, pos_s = jax.lax.sort((key1, key2, pos), num_keys=2)
        # after the sort, slot t <-> global sorted position rows[t]
        # (groups are contiguous, ordered by group-start rank)
        new_run = jnp.concatenate([
            jnp.ones(1, bool),
            (k1s[1:] != k1s[:-1]) | (k2s[1:] != k2s[:-1])])
        g_new = jax.lax.cummax(jnp.where(new_run, rows, 0))
        run_end = jnp.concatenate([new_run[1:], jnp.ones(1, bool)])
        unresolved = jnp.any(valid & ~(new_run & run_end))
        rank = rank.at[jnp.where(valid, pos_s, m)].set(g_new, mode="drop")
        sa = sa.at[jnp.where(valid, rows, m)].set(pos_s, mode="drop")
        return k * 2, pos_s, g_new, rank, sa, unresolved

    _, _, _, _, sa, _ = jax.lax.while_loop(
        cond, body,
        (jnp.int32(2 * _B5), pos, grank, rank, sa, jnp.bool_(True)))
    return sa


@functools.partial(jax.jit, static_argnames=("m",))
def _sa_doubling(sa, rank, m: int):
    """Full-plane doubling rounds (fallback for repeat-heavy texts whose
    tie count overflows the compact subset)."""

    def body(carry):
        sa, rank, k, _ = carry
        rank_pad = jnp.concatenate([rank, jnp.full(m, -1, jnp.int32)])
        second = jax.lax.dynamic_slice(rank_pad, (k,), (m,))
        idx = jnp.arange(m, dtype=jnp.int32)
        s1, s2, sa = jax.lax.sort((rank, second, idx), num_keys=2)
        new_grp = jnp.concatenate([
            jnp.ones(1, bool),
            (s1[1:] != s1[:-1]) | (s2[1:] != s2[:-1])])
        rank_sorted = jax.lax.cummax(jnp.where(new_grp, idx, 0))
        rank = _inv_rank(sa, rank_sorted)
        done = jnp.sum(new_grp.astype(jnp.int32)) == m
        return sa, rank, k * 2, done

    def cond(carry):
        return ~carry[3]

    sa, rank, _, _ = jax.lax.while_loop(
        cond, body, (sa, rank, jnp.int32(2 * _B5), jnp.bool_(False)))
    return sa


def prefer_device_sa(n: int) -> bool:
    """True when the default backend is an accelerator and the text is long
    enough that the device prefix-doubling sort clearly beats one host
    core's SA-IS (the crossover is well under 4 Mbp; below it compile time
    dominates and the host path is instant anyway)."""
    try:
        return jax.default_backend() != "cpu" and n >= (1 << 22)
    except Exception:
        return False


@functools.partial(jax.jit, static_argnames=("pad",))
def _c1p_jit(c_u8, pad: int):
    c = c_u8.astype(jnp.int32) + 1
    return jnp.concatenate([c, jnp.zeros(pad, jnp.int32)])


@functools.partial(jax.jit, static_argnames=("n", "pad"))
def _c1p_from_words(words, n: int, pad: int):
    """Unpack 2-bit words (LSB-first, packed.pack layout) to the 1-based
    padded int32 plane on device."""
    shifts = jnp.arange(16, dtype=jnp.uint32) * 2
    syms = ((words[:, None] >> shifts[None, :]) & 3).astype(jnp.int32)
    c = syms.reshape(-1)[:n] + 1
    return jnp.concatenate([c, jnp.zeros(pad, jnp.int32)])


def _c1p_of(codes) -> jnp.ndarray:
    """Build the 1-based padded int32 text plane (sentinel + base-5 key
    slack) on device. The text crosses the host link 2-BIT PACKED (n/4
    bytes) and unpacks on chip — on the remote relay (~2-3 MB/s) the raw
    uint8 upload was the dominant cost of every device index build."""
    from nvbio_tpu import packed

    pad = 1 + 2 * _B5 + 1
    codes_np = np.asarray(codes, np.uint8)
    if codes_np.ndim != 1:
        return _c1p_jit(jnp.asarray(codes_np), pad)
    words = jnp.asarray(packed.pack(codes_np, 2))
    return _c1p_from_words(words, len(codes_np), pad)


# tiny-tie fast path: when the bootstrap leaves only a handful of tied
# suffixes (random/low-repeat DNA: a few 26-symbol collisions in 100 Mbp),
# fetching their positions and comparing the suffixes DIRECTLY on the host
# skips the full-plane rank-inversion sort (0.50 s at 100 Mbp,
# SA_BREAKDOWN.json) that the compacted doubling needs — the device never
# builds a rank plane at all
_HOST_TIE_CAP = 4096


@functools.partial(jax.jit, static_argnames=("C",))
def _tied_slots(sa, rank_sorted, tied, C: int):
    """(rows, pos, grank) of the <= C tied sorted slots, ascending.

    top_k instead of a full-plane sort — the whole point of the host tie
    path is to avoid another m-element sort; top_k(-idx) returns the tied
    rows in ascending row order with untied padding last."""
    m = sa.shape[0]
    idx = jnp.arange(m, dtype=jnp.int32)
    neg = jnp.where(tied, -idx, jnp.int32(-(1 << 30)))
    _, rows = jax.lax.top_k(neg, C)
    return rows, jnp.take(sa, rows), jnp.take(rank_sorted, rows)


def _host_tie_order(text1p: np.ndarray, pos: np.ndarray,
                    grank: np.ndarray, start: int = 2 * _B5,
                    chunk: int = 4096) -> np.ndarray:
    """Order tied suffix positions by direct comparison on the host.

    ``text1p``: int32/uint8 text with symbols 1..4, 0-padded past the end
    (the host mirror of the device c1p plane). ``pos``/``grank``: the tied
    rows' suffix positions and group ids (equal grank = one tied group,
    first ``start`` symbols known equal). Returns ``pos`` reordered so
    each group is in true suffix order (groups stay in place)."""
    n = len(text1p)
    text_u8 = np.asarray(text1p, dtype=np.uint8)  # symbols 1..4 + 0 pad:
    out = pos.copy()                              # bytewise lex == numeric
    for g in np.unique(grank):
        sel = np.nonzero(grank == g)[0]
        p = pos[sel]
        key_list = [[] for _ in range(len(p))]
        off = start
        # chunked comparison: append one window of symbols per round until
        # all suffixes in the group are distinct (sentinel 0-padding makes
        # shorter suffixes sort first, matching the bootstrap keys)
        while True:
            for t in range(len(p)):
                s = min(p[t] + off, n)
                key_list[t].append(text_u8[s:s + chunk].tobytes())
            joined = [b"".join(k).ljust(off - start + chunk, b"\0")
                      for k in key_list]
            if len(set(joined)) == len(p) or off > n:
                # -p tie-break: if two windows exhaust equal, the shorter
                # suffix (larger start) is the smaller one (unreachable for
                # distinct suffixes of one text; kept as a safety net)
                srt = sorted(range(len(p)),
                             key=lambda t: (joined[t], -int(p[t])))
                out[sel] = p[srt]
                break
            off += chunk
    return out


@jax.jit
def _apply_tie_order(sa, rows, new_pos):
    return sa.at[rows].set(new_pos)


def _sa_of(c1p: jnp.ndarray, m: int,
           host_text1p: np.ndarray | None = None) -> jnp.ndarray:
    sa, rank_sorted, tied, done, n_tied = _sa_bootstrap(c1p, m)
    # host-side branch on two scalar fetches: a lax.cond OUTSIDE jit
    # re-traces (and recompiles) both branches on every call
    if bool(done):
        return sa
    nt = int(n_tied)
    if host_text1p is not None and nt <= _HOST_TIE_CAP:
        rows, pos, grank = _tied_slots(
            sa, rank_sorted, tied, min(_HOST_TIE_CAP, m))
        rows_h = np.asarray(rows[:nt])
        new_pos = _host_tie_order(
            host_text1p, np.asarray(pos[:nt]), np.asarray(grank[:nt]))
        return _apply_tie_order(sa, jnp.asarray(rows_h),
                                jnp.asarray(new_pos.astype(np.int32)))
    rank = _inv_rank(sa, rank_sorted)
    # capacity LADDER: the compacted round costs O(C) regardless of nt,
    # so pick the smallest rung that fits. The 64M rung is what keeps a
    # 40%-repeat 100 Mbp genome (~40M tied suffixes, r5 measured) on the
    # compacted path — full-plane rounds cost 1.4 s each there.
    for cap in _TIE_CAPS:
        C = min(cap, m)
        if nt <= C:
            return _sa_tie_doubling(sa, rank, tied, m, C)
    return _sa_doubling(sa, rank, m)



def _host_mirror(codes):
    """Host 1-based text mirror for the tiny-tie host resolution (None when
    the text lives only on device)."""
    if isinstance(codes, np.ndarray):
        return (codes.astype(np.uint8) + 1)
    return None

def suffix_array_device(codes, return_device: bool = False):
    """SA of text + sentinel (n+1 entries, sa[0] == n), computed on the
    default JAX device. Matches ``index.sa.suffix_array`` bit-for-bit.

    ``codes``: host uint8/int array of 2-bit symbols (or a device array).
    ``return_device=True`` keeps the result on device (for BWT/FM
    construction without a host round trip).
    """
    n = int(np.asarray(codes).shape[0] if isinstance(codes, np.ndarray)
            else codes.shape[0])
    sa = _sa_of(_c1p_of(codes), n + 1, _host_mirror(codes))
    return sa if return_device else np.asarray(sa).astype(np.int64)


@jax.jit
def _bwt_full_of(c1p, sa):
    """Full-BWT symbol plane (0..3; the primary row holds text[0], removed
    host-side like ``fmi.index.bwt_from_sa``) + primary row index."""
    prev = jnp.maximum(sa - 1, 0)
    sym1 = jnp.take(c1p, prev)  # 1..4
    primary = jnp.argmax((sa == 0).astype(jnp.int32)).astype(jnp.int32)
    return (sym1 - 1).astype(jnp.uint8), primary


def bwt_device(codes):
    """(bwt uint8[n] with the sentinel row removed, primary row index) —
    same contract as ``fmi.index.bwt_from_sa``, but SA + BWT are computed
    on device and only the n+1-byte BWT plane is fetched (the SA — 4x
    bigger — never crosses the host link)."""
    n = int(np.asarray(codes).shape[0])
    c1p = _c1p_of(codes)
    sa = _sa_of(c1p, n + 1, _host_mirror(np.asarray(codes, np.uint8)))
    bwt_full, primary = _bwt_full_of(c1p, sa)
    primary = int(primary)
    return np.delete(np.asarray(bwt_full), primary), primary


@functools.partial(jax.jit, static_argnames=("n",), donate_argnums=(0,))
def _bwt_plane(c1p, sa, n: int):
    """Primary-dropped BWT symbol plane (uint8, 0..3) + primary row.

    The primary row is dropped densely — a select between the two static
    shifts — because a traced-index delete would lower to scalar gathers.
    ``c1p`` is donated: after this stage only the n-byte BWT plane and the
    SA remain live, which is what lets the 390 Mbp human-slice scale fit
    one chip's HBM (the fused single-graph form OOMed there)."""
    m = sa.shape[0]
    prev = jnp.maximum(sa - 1, 0)
    bwt_full = (jnp.take(c1p[:m], prev) - 1).astype(jnp.uint8)
    primary = jnp.argmax(sa == 0).astype(jnp.int32)
    i = jnp.arange(n, dtype=jnp.int32)
    bwt = jnp.where(i < primary, bwt_full[:n], bwt_full[1:n + 1])
    return bwt, primary


@functools.partial(
    jax.jit, static_argnames=("K", "n_samples"), donate_argnums=(0,))
def _ssa_planes(sa, K: int, n_samples: int):
    """Mark-bitvector sampled SA (rows with SA % K == 0 — exactly
    n // K + 1 of them, a static count, since SA is a permutation of
    0..n) + popcount prefix. ``sa`` — the largest plane — is donated;
    nothing n-sized survives this stage."""
    m = sa.shape[0]
    marked = (sa % K) == 0
    pos = jnp.cumsum(marked.astype(jnp.int32)) - 1
    vals = (jnp.zeros(n_samples, jnp.int32)
            .at[jnp.where(marked, pos, n_samples)].set(sa, mode="drop"))
    n_words = (m + 31) // 32
    bits = (jnp.zeros(n_words * 32, jnp.uint32)
            .at[:m].set(marked.astype(jnp.uint32))).reshape(n_words, 32)
    weights = jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32)
    marks = (bits * weights).sum(axis=1, dtype=jnp.uint32)  # disjoint bits
    popc = jax.lax.population_count(marks).astype(jnp.int32)
    cum = jnp.concatenate([jnp.zeros(1, jnp.int32),
                           jnp.cumsum(popc[:-1])])
    return marks, cum, vals


@functools.partial(jax.jit, static_argnames=("n",), donate_argnums=(0,))
def _pack_occ_planes(bwt_u8, n: int):
    """Packed BWT words + occ checkpoints + count offsets from the
    primary-dropped BWT plane — bit-exact vs the host builders
    (packed.pack LSB-first layout, rank.build_occ_table checkpoints)."""
    bwt = bwt_u8.astype(jnp.uint32)
    # 2-bit pack, LSB-first 16 symbols/word (packed.pack layout); bits are
    # disjoint so the sum IS the bitwise-or
    nw = (n + 15) // 16
    padded = jnp.zeros(nw * 16, jnp.uint32).at[:n].set(bwt)
    shifts = jnp.arange(16, dtype=jnp.uint32) * 2
    bwt_words = (padded.reshape(nw, 16) << shifts[None, :]).sum(
        axis=1, dtype=jnp.uint32)
    # occ checkpoints every 64 symbols (rank.K); padding counts as symbol
    # 0 exactly like the host builder (the inflated final checkpoint is
    # never read — kept for bit parity)
    from nvbio_tpu.fmi.rank import K as OCC_K

    nb = (n + OCC_K - 1) // OCC_K
    pb = jnp.zeros(nb * OCC_K, jnp.int32).at[:n].set(
        bwt.astype(jnp.int32)).reshape(nb, OCC_K)
    per_block = jnp.stack(
        [(pb == c).sum(axis=1, dtype=jnp.int32) for c in range(4)], axis=-1)
    occ = jnp.concatenate(
        [jnp.zeros((1, 4), jnp.int32), jnp.cumsum(per_block, axis=0)])
    # text symbol counts == BWT symbol counts (the BWT is a permutation)
    counts = jnp.stack(
        [(bwt == c).sum(dtype=jnp.int32) for c in range(4)])
    count = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(counts)]) + 1
    count = count.at[0].set(1)
    return bwt_words, occ, count


def build_fmindex_device(codes, sa_interval: int = 8, to_host: bool = True):
    """Complete FM-index built ENTIRELY on the default JAX device; same
    artifact as ``fmi.index.build_fmindex``.

    TPU counterpart of the reference's GPU index build (nvBWT over
    ``nvbio/sufsort/sufsort.h:45-60``): the O(n log n) sort, BWT, packing,
    occ checkpoints, and sampled-SA planes all run on the chip, in three
    staged jits that DONATE their dominant input (text plane -> BWT stage,
    SA -> sampled-SA stage, BWT plane -> packing stage) so peak HBM stays
    ~6 n-sized planes — the 390 Mbp human-slice scale fits one v5e where
    the single fused graph OOMed. ``to_host=False`` returns the index with
    device-resident (jnp) planes — ready to serve queries with zero host
    round-trip, the natural form when the index is built where it will be
    used; ``to_host=True`` fetches the compact planes (n/16-word BWT +
    1/K SA samples; the 4x-bigger SA never crosses the link) for saving.
    """
    from nvbio_tpu.fmi.index import FMIndex

    codes = np.asarray(codes, dtype=np.uint8)
    n = len(codes)
    if n >= 2**31:
        raise ValueError("text too long for int32 FM-index")
    c1p = _c1p_of(codes)
    sa = _sa_of(c1p, n + 1, _host_mirror(codes))
    n_samples = n // sa_interval + 1
    bwt_u8, primary = _bwt_plane(c1p, sa, n)
    del c1p  # donated
    marks, cum, vals = _ssa_planes(sa, sa_interval, n_samples)
    del sa  # donated
    bwt_words, occ, count = _pack_occ_planes(bwt_u8, n)
    del bwt_u8  # donated
    fetch = np.asarray if to_host else (lambda x: x)
    from nvbio_tpu.fmi.rank import build_rank_table_device, want_fused_ranktab

    if to_host or not want_fused_ranktab():
        ranktab = None  # derived again on upload (device()); don't fetch
    else:
        ranktab = build_rank_table_device(bwt_words, n)
    return FMIndex(
        bwt_words=fetch(bwt_words), occ=fetch(occ), count=fetch(count),
        primary=int(primary), n=n, sa_interval=sa_interval,
        ssa_marks=fetch(marks), ssa_cum=fetch(cum), ssa_vals=fetch(vals),
        ranktab=ranktab,
    )
