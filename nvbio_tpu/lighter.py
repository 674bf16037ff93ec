"""Lighter-style error correction with Bloom filters (nvLighter equivalent).

Capability parity with the reference's nvLighter app
(``nvLighter/nvLighter.cu:417-600``, ``sample_kmers.h``, ``error_correct.h``):
three phases over the read set —
  1. sample k-mer *occurrences* at rate 1/alpha_den into Bloom filter A
     (per-occurrence randomness, so high-coverage k-mers are almost surely
     sampled — Lighter's key property);
  2. mark *trusted* k-mers (every base covered by >= solid_cov sampled
     k-mers) into Bloom filter B;
  3. correct reads: evaluate every single-base substitution exactly — a
     substitution changes a packed k-mer key by an XOR at a known bit
     position, so all (position x alternative) candidate k-mers are pure
     bit math + Bloom queries, no re-packing.

TPU design: all phases are dense (B, P)/(B, L) planes; filters are device
bitmaps (byte-insert + query, see nvbio_tpu.bloom); no per-read control flow.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from nvbio_tpu.bloom import ByteBloomFilter, hash1, hash2


@dataclasses.dataclass(frozen=True)
class LighterParams:
    k: int = 17
    alpha_den: int = 8          # sample 1/alpha_den of k-mer occurrences
    solid_cov: int = 9          # min sampled k-mers covering a base (> k/2: a true base sees ~k present k-mers, an error base ~k/alpha_den)
    bloom_bits_a: int = 1 << 22
    bloom_bits_b: int = 1 << 22
    max_read_len: int = 128


def _pack_windows(reads, k: int):
    """Packed halves of every k-window, forward and reverse-complement.

    Returns (f1, f2, b1, b2), each (B, P) uint32, P = L - k + 1. Forward
    symbol at window offset j lives in f1 (j < k1) or f2 at a static bit
    position; the RC packing mirrors offsets (j -> k-1-j) with complemented
    symbols (complement == XOR 3, so single-symbol deltas are strand-equal).
    """
    B, L = reads.shape
    P = L - k + 1
    r = reads.astype(jnp.uint32)
    rc = (3 - reads).astype(jnp.uint32)
    k1 = min(k, 16)

    def pack(x, rev):
        acc1 = jnp.zeros((B, P), jnp.uint32)
        acc2 = jnp.zeros((B, P), jnp.uint32)
        for j in range(k):
            jj = k - 1 - j if rev else j
            sym = jax.lax.dynamic_slice_in_dim(x, jj, P, axis=1)
            if j < k1:
                acc1 = (acc1 << 2) | sym
            else:
                acc2 = (acc2 << 2) | sym
        return acc1, acc2

    f1, f2 = pack(r, rev=False)
    b1, b2 = pack(rc, rev=True)
    return f1, f2, b1, b2


def _fwd_shift(j: int, k: int) -> tuple[int, int]:
    """(half, bit shift) of forward window offset j in the packed halves."""
    k1 = min(k, 16)
    if j < k1:
        return 0, 2 * (k1 - 1 - j)
    return 1, 2 * (k - 1 - j)


def _canonical(f1, f2, b1, b2):
    hf = hash1(f1) ^ hash2(f2)
    hb = hash1(b1) ^ hash2(b2)
    return jnp.minimum(hf, hb)


def _kmer_keys(reads, lens, k: int):
    """Canonical k-mer keys (B, P) uint32 + validity mask."""
    f1, f2, b1, b2 = _pack_windows(reads, k)
    P = f1.shape[1]
    valid = (jnp.arange(P, dtype=jnp.int32)[None, :] + k) <= lens[:, None]
    return _canonical(f1, f2, b1, b2), valid


def _coverage_from_present(present_i, L, k):
    """Per-base count of present k-mers covering it (windowed sum)."""
    csum = jnp.cumsum(jnp.pad(present_i, ((0, 0), (1, 0))), axis=1)
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]
    lo = jnp.clip(pos - k + 1, 0, present_i.shape[1])
    hi = jnp.clip(pos + 1, 0, present_i.shape[1])
    return jnp.take_along_axis(csum, hi, axis=1) - jnp.take_along_axis(csum, lo, axis=1)


@functools.partial(jax.jit, static_argnames=("params",), donate_argnums=(0,))
def sample_kmers(filter_a_bytes, reads, lens, batch_offset, params: LighterParams):
    """Phase 1: per-occurrence subsampling into filter A."""
    P2 = params
    bf = ByteBloomFilter(filter_a_bytes, P2.bloom_bits_a, 3)
    keys, valid = _kmer_keys(reads, lens, P2.k)
    B, P = keys.shape
    occ_id = (
        (jnp.arange(B, dtype=jnp.uint32)[:, None] + jnp.uint32(batch_offset))
        * jnp.uint32(P2.max_read_len)
        + jnp.arange(P, dtype=jnp.uint32)[None, :]
    )
    # NOTE: hash1, not hash2 — hash2 is forced odd for double hashing, which
    # would make `% den == 0` unsatisfiable
    take = valid & (
        hash1(keys ^ hash2(occ_id)) % jnp.uint32(P2.alpha_den) == 0
    )
    masked = jnp.where(take, keys, jnp.uint32(0xFFFFFFFF))
    bf = bf.insert(masked.reshape(-1))
    return bf.bytes_


@functools.partial(jax.jit, static_argnames=("params",), donate_argnums=(1,))
def mark_trusted(filter_a_bytes, filter_b_bytes, reads, lens, params: LighterParams):
    """Phase 2: k-mers whose bases are all solid go into filter B."""
    P2 = params
    bfa = ByteBloomFilter(filter_a_bytes, P2.bloom_bits_a, 3)
    bfb = ByteBloomFilter(filter_b_bytes, P2.bloom_bits_b, 3)
    keys, valid = _kmer_keys(reads, lens, P2.k)
    B, L = reads.shape
    present = (bfa.contains(keys) & valid).astype(jnp.int32)
    cov = _coverage_from_present(present, L, P2.k)
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]
    solid = ((cov >= P2.solid_cov) & (pos < lens[:, None])).astype(jnp.int32)

    scs = jnp.cumsum(jnp.pad(solid, ((0, 0), (1, 0))), axis=1)
    Pn = present.shape[1]
    start = jnp.arange(Pn, dtype=jnp.int32)[None, :]
    inwin = (
        jnp.take_along_axis(scs, start + P2.k, axis=1)
        - jnp.take_along_axis(scs, start, axis=1)
    )
    trusted = (inwin == P2.k) & valid
    masked = jnp.where(trusted, keys, jnp.uint32(0xFFFFFFFF))
    bfb = bfb.insert(masked.reshape(-1))
    return bfb.bytes_


@functools.partial(jax.jit, static_argnames=("params",))
def correct_reads(filter_b_bytes, reads, lens, params: LighterParams):
    """Phase 3: exact single-substitution correction.

    For every read position i and alternative base, count the trusted k-mers
    that would cover i after substituting — computed by XOR-patching the
    packed window keys (both strands). Apply the best strictly-improving
    alternative at uncovered positions. Returns (corrected, n_corrections).
    """
    P2 = params
    k = P2.k
    bfb = ByteBloomFilter(filter_b_bytes, P2.bloom_bits_b, 3)
    B, L = reads.shape
    reads = reads.astype(jnp.int32)
    lens = jnp.asarray(lens, jnp.int32)

    f1, f2, b1, b2 = _pack_windows(reads, k)
    P = f1.shape[1]
    valid = (jnp.arange(P, dtype=jnp.int32)[None, :] + k) <= lens[:, None]
    base_present = (bfb.contains(_canonical(f1, f2, b1, b2)) & valid)
    base_cov = _coverage_from_present(base_present.astype(jnp.int32), L, k)

    pos = jnp.arange(L, dtype=jnp.int32)[None, :]
    best_cnt = jnp.zeros((B, L), jnp.int32)
    best_sym = reads

    for d in range(1, 4):
        # symbol delta per position: old ^ new where new = (old + d) % 4
        new_sym = (reads + d) % 4
        delta = (reads ^ new_sym).astype(jnp.uint32)  # (B, L)
        # count trusted k-mers covering position i after the substitution:
        # sum over window offsets j of contains(patched window starting i-j)
        cnt = jnp.zeros((B, L), jnp.int32)
        for j in range(k):
            h, sh = _fwd_shift(j, k)
            hb_, shb = _fwd_shift(k - 1 - j, k)
            # window starting at w = i - j covers position i at offset j
            dl = delta  # (B, L) indexed by i
            # patch arrays are indexed by window start w: gather delta at w + j
            dw = jax.lax.dynamic_slice_in_dim(
                jnp.pad(dl, ((0, 0), (0, k))), j, P, axis=1
            )
            pf1 = f1 ^ (dw << sh) if h == 0 else f1
            pf2 = f2 ^ (dw << sh) if h == 1 else f2
            pb1 = b1 ^ (dw << shb) if hb_ == 0 else b1
            pb2 = b2 ^ (dw << shb) if hb_ == 1 else b2
            ok = (bfb.contains(_canonical(pf1, pf2, pb1, pb2)) & valid).astype(
                jnp.int32
            )  # (B, P), window w counts toward position w + j
            okL = jnp.pad(ok, ((0, 0), (0, L - P)))
            cnt = cnt + jnp.roll(okL, j, axis=1) * (pos >= j)

        better = cnt > best_cnt
        best_cnt = jnp.where(better, cnt, best_cnt)
        best_sym = jnp.where(better, new_sym, best_sym)

    weak = (base_cov == 0) & (pos < lens[:, None])
    apply = weak & (best_cnt > 0)
    corrected = jnp.where(apply, best_sym, reads)
    n_corr = jnp.sum((corrected != reads).astype(jnp.int32), axis=1)
    return corrected, n_corr


def correct_batch(reads, lens, params: LighterParams = LighterParams()):
    """Single-shot three-phase correction of one read set (convenience)."""
    bfa = ByteBloomFilter.empty(params.bloom_bits_a, 3).bytes_
    bfa = sample_kmers(bfa, jnp.asarray(reads), jnp.asarray(lens), 0, params)
    bfb = ByteBloomFilter.empty(params.bloom_bits_b, 3).bytes_
    bfb = mark_trusted(bfa, bfb, jnp.asarray(reads), jnp.asarray(lens), params)
    return correct_reads(bfb, jnp.asarray(reads), jnp.asarray(lens), params)
