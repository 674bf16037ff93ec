"""SMEM (supermaximal exact match) search, batched.

Capability parity with the reference's MEM search (``nvbio/fmindex/mem.h:81-492``,
``find_kmems``/MEMFilter). TPU reformulation: instead of per-thread
bidirectional interval walks, one ``lax.scan`` extends ALL read start
positions simultaneously — state is a dense (B, L) plane of FM intervals over
the *reversed* genome index (prepending symbols to the reversed pattern ==
extending the match rightward in the forward genome).

Maximality uses the monotonicity of right-extension ends e(p): a suffix of a
match is a match, so e(p) is nondecreasing, and [p, e(p)) is an SMEM iff
e(p) > e(p-1) (strictly longer than anything that contains its start).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from nvbio_tpu.fmi.search import locate_core, step_backward


class SmemHits(NamedTuple):
    """Top-S SMEMs per read with up to H located genome positions each."""

    qbeg: jnp.ndarray    # (B, S) int32 read start
    qend: jnp.ndarray    # (B, S) int32 read end (exclusive)
    valid: jnp.ndarray   # (B, S) bool
    tpos: jnp.ndarray    # (B, S, H) int32 genome start positions
    hit_valid: jnp.ndarray  # (B, S, H) bool
    n_occ: jnp.ndarray   # (B, S) int32 total occurrence count
    overflow: jnp.ndarray  # (B,) int32 SMEMs found beyond the S slots
                           # (the reference's vector-array overflow flag,
                           # basic/vector_array.h — capacity-bounded
                           # containers REPORT truncation, never hide it)


def smem_extend_lengths(fmi_rev, reads, lens, min_intv: int = 1):
    """Right-extension data for every read position.

    Returns (ext_len (B, L): e(p) - p, lo (B, L), hi (B, L)): the last
    interval with >= ``min_intv`` occurrences over the reversed index for
    the maximal match starting at each position. ``min_intv=1`` gives plain
    maximal matches; larger values stop extension once the match becomes
    too unique — the reference's ``find_threshold_kmems``
    (``fmindex/mem.h:129-176``, bwa-mem's max_intv re-seeding).
    """
    B, L = reads.shape
    reads = reads.astype(jnp.int32)
    lens = jnp.asarray(lens, jnp.int32)
    n_rows = fmi_rev.n + 1

    lo0 = jnp.zeros((B, L), jnp.int32)
    hi0 = jnp.full((B, L), n_rows, jnp.int32)
    cnt0 = jnp.zeros((B, L), jnp.int32)

    parange = jnp.arange(L, dtype=jnp.int32)

    # Freezing: once an extension fails, the interval must stay frozen; we
    # negate hi on the first failure (hi <= lo fails the alive test forever)
    # and restore with abs() at the end.
    def step(carry, s):
        lo, hi, cnt = carry
        # start p consumes read[p + s]
        sym_idx = parange[None, :] + s
        c = jnp.take_along_axis(reads, jnp.clip(sym_idx, 0, L - 1), axis=1)
        in_range = sym_idx < lens[:, None]
        nlo, nhi = step_backward(
            fmi_rev, c.reshape(-1), lo.reshape(-1), hi.reshape(-1)
        )
        nlo = nlo.reshape(B, L)
        nhi = nhi.reshape(B, L)
        alive = hi > lo
        ok = in_range & alive & (nhi - nlo >= min_intv)
        lo = jnp.where(ok, nlo, lo)
        hi = jnp.where(ok, nhi, jnp.where(alive, -hi, hi))
        cnt = cnt + ok.astype(jnp.int32)
        return (lo, hi, cnt), None

    (lo, hi, cnt), _ = jax.lax.scan(
        step, (lo0, hi0, cnt0), jnp.arange(L, dtype=jnp.int32)
    )
    return cnt, lo, jnp.abs(hi)


@functools.partial(jax.jit, static_argnames=("min_len", "min_intv",
                                             "max_mems", "hits_per_mem"))
def find_threshold_kmems_batch(
    fmi_rev, reads, lens, min_len: int = 19, min_intv: int = 2,
    max_mems: int = 16, hits_per_mem: int = 4,
):
    """Threshold k-MEMs: maximal matches kept only while their occurrence
    count stays >= ``min_intv`` (``fmindex/mem.h:129-176``; bwa-mem re-seeds
    long unique SMEMs with these shorter, more repetitive sub-matches).
    Same result contract as ``find_smems_batch``."""
    B, L = reads.shape
    S = max_mems
    H = hits_per_mem
    lens = jnp.asarray(lens, jnp.int32)

    ext, lo, hi = smem_extend_lengths(fmi_rev, reads, lens,
                                      min_intv=min_intv)
    p = jnp.arange(L, dtype=jnp.int32)[None, :]
    e = p + ext
    e_prev = jnp.concatenate([jnp.full((B, 1), -1, jnp.int32), e[:, :-1]],
                             axis=1)
    is_mem = (e > e_prev) & (ext >= min_len) & (p < lens[:, None])

    overflow = jnp.maximum(
        jnp.sum(is_mem.astype(jnp.int32), axis=1) - S, 0)
    key = jnp.where(is_mem, ext, -1)
    sel = jnp.argsort(-key, axis=1, stable=True)[:, :S]
    qbeg = jnp.take_along_axis(p.repeat(B, axis=0), sel, axis=1)
    qend = jnp.take_along_axis(e, sel, axis=1)
    slo = jnp.take_along_axis(lo, sel, axis=1)
    shi = jnp.take_along_axis(hi, sel, axis=1)
    svalid = jnp.take_along_axis(is_mem, sel, axis=1)
    n_occ = jnp.where(svalid, shi - slo, 0)

    k = jnp.arange(H, dtype=jnp.int32)
    rows = jnp.clip(slo[:, :, None] + k[None, None, :], 0, fmi_rev.n)
    hvalid = svalid[:, :, None] & (k[None, None, :] < n_occ[:, :, None])
    pos_rev, _ = locate_core(fmi_rev, rows.reshape(-1))
    pos_rev = pos_rev.reshape(B, S, H)
    matchlen = (qend - qbeg)[:, :, None]
    tpos = fmi_rev.n - pos_rev - matchlen
    tpos = jnp.where(hvalid, tpos, 0)

    return SmemHits(qbeg, qend, svalid, tpos, hvalid, n_occ,
                    overflow)


@functools.partial(jax.jit, static_argnames=("min_len", "max_smems", "hits_per_smem"))
def find_smems_batch(
    fmi_rev, reads, lens, min_len: int = 19, max_smems: int = 16,
    hits_per_smem: int = 4,
):
    """Find SMEMs >= min_len for each read and locate up to H hits each.

    ``fmi_rev`` must be the FM-index of the REVERSED genome; returned ``tpos``
    are starts in the FORWARD genome.
    """
    B, L = reads.shape
    S = max_smems
    H = hits_per_smem
    lens = jnp.asarray(lens, jnp.int32)

    ext, lo, hi = smem_extend_lengths(fmi_rev, reads, lens)
    p = jnp.arange(L, dtype=jnp.int32)[None, :]
    e = p + ext
    e_prev = jnp.concatenate([jnp.full((B, 1), -1, jnp.int32), e[:, :-1]], axis=1)
    is_smem = (e > e_prev) & (ext >= min_len) & (p < lens[:, None])

    # top-S SMEMs by length (+ overflow count past the S slots)
    overflow = jnp.maximum(
        jnp.sum(is_smem.astype(jnp.int32), axis=1) - S, 0)
    key = jnp.where(is_smem, ext, -1)
    sel = jnp.argsort(-key, axis=1, stable=True)[:, :S]   # longest first
    qbeg = jnp.take_along_axis(p.repeat(B, axis=0), sel, axis=1)
    qend = jnp.take_along_axis(e, sel, axis=1)
    slo = jnp.take_along_axis(lo, sel, axis=1)
    shi = jnp.take_along_axis(hi, sel, axis=1)
    svalid = jnp.take_along_axis(is_smem, sel, axis=1)
    n_occ = jnp.where(svalid, shi - slo, 0)

    # locate up to H hits per SMEM via the reversed index
    k = jnp.arange(H, dtype=jnp.int32)
    rows = jnp.clip(slo[:, :, None] + k[None, None, :], 0, fmi_rev.n)
    hvalid = svalid[:, :, None] & (k[None, None, :] < n_occ[:, :, None])
    pos_rev, _ = locate_core(fmi_rev, rows.reshape(-1))
    pos_rev = pos_rev.reshape(B, S, H)
    # position in the forward genome: rev match starts at pos_rev covering
    # matchlen symbols => forward start = n - pos_rev - matchlen
    matchlen = (qend - qbeg)[:, :, None]
    tpos = fmi_rev.n - pos_rev - matchlen
    tpos = jnp.where(hvalid, tpos, 0)

    return SmemHits(qbeg, qend, svalid, tpos, hvalid, n_occ,
                    overflow)
