"""Sharded FM-index: genome-sliced per-device FM-indexes over the mesh.

The q-gram table shards by bucket range (``parallel/sharded_index.py``); the
FM-index shards by GENOME RANGE instead — backward search is a sequential
global-rank walk, so slicing the text (with read-length overlap at the
seams) and building one compact per-slice index keeps every search local
while positions stay int32 per slice. Queries replicate over ICI
(``all_gather``), every device answers from its slice, and ``all_to_all``
routes each device its own reads' hits from all shards — dense fixed-shape
transfers only.

This is the multi-chip FM story the reference never needed (one genome fits
one GPU, ``compute_thread.cu:95-112``); on a pod slice it bounds per-chip
index HBM at ~1/D. SURVEY §2.5 strategy #10.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from nvbio_tpu.parallel.mesh import READS_AXIS


@dataclasses.dataclass
class ShardedFMIndex:
    """D per-slice FM-indexes with identical shapes, stacked on axis 0.

    Inside ``shard_map`` each device sees its own (1, ...) rows. Slices
    overlap by ``overlap`` symbols so matches crossing a seam are found by
    the earlier slice; positions returned are GLOBAL (slice base + local).
    """

    n_shards: int
    slice_len: int         # symbols per slice (excluding overlap tail)
    overlap: int
    n: int                 # total genome length
    sa_interval: int
    # stacked FMIndex leaves, all (D, ...):
    bwt_words: Any
    occ: Any
    count: Any
    primary: Any           # (D,) int32
    ssa_marks: Any
    ssa_cum: Any
    ssa_vals: Any
    ranktab: Any = None    # (D, nb, 128) fused rank rows (rank.py)


jax.tree_util.register_pytree_node(
    ShardedFMIndex,
    lambda s: ((s.bwt_words, s.occ, s.count, s.primary, s.ssa_marks,
                s.ssa_cum, s.ssa_vals, s.ranktab),
               (s.n_shards, s.slice_len, s.overlap, s.n, s.sa_interval)),
    lambda aux, ch: ShardedFMIndex(
        n_shards=aux[0], slice_len=aux[1], overlap=aux[2], n=aux[3],
        sa_interval=aux[4], bwt_words=ch[0], occ=ch[1], count=ch[2],
        primary=ch[3], ssa_marks=ch[4], ssa_cum=ch[5], ssa_vals=ch[6],
        ranktab=ch[7]),
)


def _build_slice_worker(arg):
    """Top-level worker for process-parallel slice builds (picklable).

    Spawned children force CPU jax BEFORE any jax import: they inherit the
    parent's backend env but not its plugin registrations, and a host
    slice build needs no accelerator anyway."""
    import os

    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    codes, method = arg
    from nvbio_tpu.fmi.index import build_fmindex

    return build_fmindex(codes, method=method)


def shard_fmindex(codes: np.ndarray, n_shards: int,
                  overlap: int = 256, method: str = "auto",
                  jobs: int = 1, resident: bool = False,
                  on_slice=None) -> ShardedFMIndex:
    """Build D equal-shape per-slice FM-indexes.

    Every slice covers [d * slice_len, d * slice_len + slice_len + overlap)
    (clamped); short tails are padded by wrapping the genome so all leaf
    shapes match (padded positions are filtered at query time).

    ``method="device"`` runs each slice's suffix sort on the accelerator
    (``index.device_sa``) — since every slice has the SAME padded length,
    the sort kernels compile once and are reused across all D slices, so a
    multi-Gbp genome indexes as D accelerator sorts of n/D symbols each.

    ``jobs>1`` builds host-method slices in that many parallel processes
    (the slices are independent, so a multi-core host gets near-linear
    speedup; the reference's analogue is the GPU doing all suffix blocks,
    ``sufsort/blockwise_sufsort.h``). Ignored for ``method="device"``
    (one accelerator — the device is the parallelism).
    """
    from nvbio_tpu.fmi.index import build_fmindex

    n = len(codes)
    slice_len = (n + n_shards - 1) // n_shards
    full = slice_len + overlap
    slices = []
    for d in range(n_shards):
        s = d * slice_len
        sl = codes[s:s + full]
        if len(sl) < full:  # wrap-pad so every slice has identical length
            sl = np.concatenate([sl, codes[:full - len(sl)]])
        slices.append(np.ascontiguousarray(sl, np.uint8))
    if jobs > 1 and method != "device":
        import multiprocessing as mp

        # spawn: children re-import cleanly (fork after jax/XLA threads
        # have started is unsafe)
        with mp.get_context("spawn").Pool(min(jobs, n_shards)) as pool:
            subs = pool.map(_build_slice_worker,
                            [(sl, method) for sl in slices])
    elif resident and method == "device":
        # DEVICE-RESIDENT slices: planes never touch the host (the serving
        # form — on a pod each of D chips builds ITS slice locally like
        # this, so the whole-genome build's wall-clock is ONE slice's; on
        # one chip the D builds serialize but still skip the plane
        # downloads that dominate on a remote relay)
        import jax.numpy as jnp

        from nvbio_tpu.index.device_sa import build_fmindex_device

        from nvbio_tpu.fmi.rank import build_rank_table_device
        from nvbio_tpu.fmi.rank import want_fused_ranktab as _want_rt

        import time as _t

        subs = []
        for _d, sl in enumerate(slices):
            _t0 = _t.time()
            fx = build_fmindex_device(sl, to_host=False)
            int(np.asarray(fx.bwt_words[:1])[0])
            subs.append(fx)
            if on_slice:
                on_slice(_d, _t.time() - _t0)
        stack = lambda f: jnp.stack([getattr(x, f) for x in subs])
        return ShardedFMIndex(
            n_shards=n_shards, slice_len=slice_len, overlap=overlap, n=n,
            sa_interval=subs[0].sa_interval,
            bwt_words=stack("bwt_words"), occ=stack("occ"),
            count=stack("count"),
            primary=jnp.asarray([x.primary for x in subs], jnp.int32),
            ssa_marks=stack("ssa_marks"), ssa_cum=stack("ssa_cum"),
            ssa_vals=stack("ssa_vals"),
            ranktab=(jnp.stack([
                build_rank_table_device(x.bwt_words, x.n)
                for x in subs]) if _want_rt() else None),
        )
    else:
        subs = [build_fmindex(sl, method=method) for sl in slices]
    from nvbio_tpu.fmi.rank import build_rank_table
    from nvbio_tpu.fmi.rank import want_fused_ranktab as _want_rt

    stack = lambda f: np.stack([np.asarray(getattr(x, f)) for x in subs])
    return ShardedFMIndex(
        n_shards=n_shards, slice_len=slice_len, overlap=overlap, n=n,
        sa_interval=subs[0].sa_interval,
        bwt_words=stack("bwt_words"), occ=stack("occ"), count=stack("count"),
        primary=np.asarray([x.primary for x in subs], np.int32),
        ssa_marks=stack("ssa_marks"), ssa_cum=stack("ssa_cum"),
        ssa_vals=stack("ssa_vals"),
        ranktab=(np.stack([
            build_rank_table(
                np.asarray(x.bwt_words), x.n, np.asarray(x.occ))
            for x in subs]) if _want_rt() else None),
    )


def place_sharded_fmindex(mesh, sidx: ShardedFMIndex) -> ShardedFMIndex:
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P(READS_AXIS))
    put = lambda x: jax.device_put(x, sh)
    return dataclasses.replace(
        sidx, bwt_words=put(sidx.bwt_words), occ=put(sidx.occ),
        count=put(sidx.count), primary=put(sidx.primary),
        ssa_marks=put(sidx.ssa_marks), ssa_cum=put(sidx.ssa_cum),
        ssa_vals=put(sidx.ssa_vals),
        ranktab=None if sidx.ranktab is None else put(sidx.ranktab))


def _local_fmi(sidx: ShardedFMIndex):
    """This device's slice as a regular FMIndex view (inside shard_map)."""
    from nvbio_tpu.fmi.index import FMIndex

    full = sidx.slice_len + sidx.overlap
    return FMIndex(
        bwt_words=sidx.bwt_words[0], occ=sidx.occ[0], count=sidx.count[0],
        primary=sidx.primary[0], n=full, sa_interval=sidx.sa_interval,
        ssa_marks=sidx.ssa_marks[0], ssa_cum=sidx.ssa_cum[0],
        ssa_vals=sidx.ssa_vals[0],
        ranktab=None if sidx.ranktab is None else sidx.ranktab[0])


def sharded_fmi_seed_hits(sidx: ShardedFMIndex, seeds, seed_len: int,
                          H: int):
    """Pipeline seeding against the genome-sliced FM-index (in shard_map).

    seeds: (B_local, NS, s) seed symbol blocks of this device's reads.
    Returns (pos (B_local, NS, H) GLOBAL positions, range_size (B_local, NS)
    total occurrences summed over shards) — the same contract as the
    replicated FM path. Each device backward-searches ALL devices' seeds
    against its slice (replicated-query), locates up to H hits, converts to
    global coordinates, and ``all_to_all`` routes the answers back; each
    reader keeps its H best (valid-first, stratified over shards).
    """
    from nvbio_tpu.fmi.search import backward_search_core, locate_core
    from nvbio_tpu.qgram import stratified_offsets

    axis = READS_AXIS
    d = jax.lax.axis_index(axis)
    D = sidx.n_shards
    fmi = _local_fmi(sidx)

    all_seeds = jax.lax.all_gather(seeds, axis)          # (D, b, NS, s)
    Dn, b, NS, slen = all_seeds.shape
    flat = all_seeds.reshape(Dn * b * NS, slen)
    lens = jnp.full((flat.shape[0],), seed_len, jnp.int32)
    lo, hi = backward_search_core(fmi, flat, lens)
    rs = jnp.maximum(hi - lo, 0)                         # (D*b*NS,)

    off = stratified_offsets(rs.reshape(Dn * b, NS), H, NS).reshape(
        Dn * b * NS, H)
    rows = jnp.clip(lo[:, None] + off, 0, fmi.n)
    pos_local, resolved = locate_core(fmi, rows.reshape(-1))
    pos_local = pos_local.reshape(Dn * b * NS, H)
    resolved = resolved.reshape(Dn * b * NS, H)
    k = jnp.arange(H, dtype=jnp.int32)
    hvalid = (k[None, :] < rs[:, None]) & resolved
    # global coordinates; drop hits that start in the wrap-padding or
    # duplicate the next slice's coverage (seam ownership: a hit belongs to
    # this slice iff it starts before slice_len)
    own = pos_local < sidx.slice_len
    # hits in the overlap tail still matter when they CROSS the seam from
    # our side; starts beyond slice_len belong to the next shard
    gpos = (d.astype(jnp.uint32) * jnp.uint32(sidx.slice_len)
            + pos_local.astype(jnp.uint32))
    gvalid = hvalid & own & (gpos < jnp.uint32(sidx.n))

    # route each querying device its answers: split the query-device axis,
    # receive one piece per source shard (dense all_to_all over ICI)
    gpos = jax.lax.all_to_all(
        gpos.reshape(Dn, b, NS, H), axis, split_axis=0, concat_axis=0)
    gvalid = jax.lax.all_to_all(
        gvalid.reshape(Dn, b, NS, H), axis, split_axis=0, concat_axis=0)
    rs_mine = jax.lax.all_to_all(
        rs.reshape(Dn, b, NS), axis, split_axis=0, concat_axis=0)
    range_size = rs_mine.sum(axis=0).astype(jnp.int32)   # (b, NS)

    # merge the D x H answer slots down to H, valid-first (stable order
    # keeps shard-0 hits ahead — deterministic)
    cand = gpos.transpose(1, 2, 0, 3).reshape(b, NS, Dn * H)
    cval = gvalid.transpose(1, 2, 0, 3).reshape(b, NS, Dn * H)
    order = jnp.argsort(jnp.where(cval, 0, 1).astype(jnp.int32),
                        axis=-1, stable=True)[..., :H]
    pos = jnp.take_along_axis(cand, order, axis=-1)
    valid = jnp.take_along_axis(cval, order, axis=-1)
    return pos, valid, range_size


def sharded_fmi_whole_read(sidx: ShardedFMIndex, queries, qlens):
    """Pass-0 whole-read exact search against the sliced index (shard_map).

    The sharded counterpart of the replicated path's whole-read pass 0
    (``aligner_best_approx.h:162-166``): every device backward-searches ALL
    devices' full reads against its slice, locates the middle occurrence,
    and ``all_to_all`` routes answers home; per query the first shard with
    a hit wins (deterministic). queries: (B_local, L) clipped-to-ACGT
    symbol rows; qlens: (B_local,).

    Returns (gpos (B_local,) GLOBAL uint32, valid (B_local,)).
    """
    from nvbio_tpu.fmi.search import backward_search_core, locate_core

    axis = READS_AXIS
    d = jax.lax.axis_index(axis)
    fmi = _local_fmi(sidx)

    allq = jax.lax.all_gather(queries, axis)             # (D, b, L)
    alll = jax.lax.all_gather(qlens, axis)               # (D, b)
    Dn, b, L = allq.shape
    lo, hi = backward_search_core(fmi, allq.reshape(Dn * b, L),
                                  alll.reshape(Dn * b))
    rows = jnp.clip(lo + (hi - lo) // 2, 0, fmi.n)
    ploc, resolved = locate_core(fmi, rows)
    own = ploc < sidx.slice_len
    gpos = (d.astype(jnp.uint32) * jnp.uint32(sidx.slice_len)
            + ploc.astype(jnp.uint32))
    gvalid = ((hi > lo) & resolved & own
              & (gpos < jnp.uint32(sidx.n)))

    gpos = jax.lax.all_to_all(
        gpos.reshape(Dn, b), axis, split_axis=0, concat_axis=0)
    gvalid = jax.lax.all_to_all(
        gvalid.reshape(Dn, b), axis, split_axis=0, concat_axis=0)
    first = jnp.argmax(gvalid, axis=0)                   # (b,)
    pos = jnp.take_along_axis(gpos, first[None, :], axis=0)[0]
    valid = jnp.any(gvalid, axis=0)
    return pos, valid


def sharded_fmi_seed_hits_1mm(sidx: ShardedFMIndex, seeds, seed_len: int):
    """1-mismatch seeding against the genome-sliced FM-index (in shard_map).

    The sharded counterpart of the replicated path's ``search_1mm``
    enumeration (``mapping.h:132-163`` approximate hybrid seeding): each
    device runs the dense mutated-seed backward searches of ALL devices'
    seeds against its slice, locates the middle slot of every nonempty
    range, converts to global coordinates, and ``all_to_all`` routes the
    answers home; per (read, seed) the D x 3s answer slots merge
    valid-first down to 3s — the same shape the within-seed voting
    tournament consumes on the replicated path, so reseeding and
    1-mismatch sensitivity work identically at human scale.

    seeds: (B_local, NS, s). Returns (pos (B_local, NS, 3s) GLOBAL uint32
    positions, valid (B_local, NS, 3s)).
    """
    from nvbio_tpu.fmi.search import locate_core, search_1mm

    axis = READS_AXIS
    d = jax.lax.axis_index(axis)
    fmi = _local_fmi(sidx)

    all_seeds = jax.lax.all_gather(seeds, axis)          # (D, b, NS, s)
    Dn, b, NS, slen = all_seeds.shape
    NM3 = 3 * slen
    flat = all_seeds.reshape(Dn * b * NS, slen)
    lens = jnp.full((flat.shape[0],), seed_len, jnp.int32)
    _elo, _ehi, mm_lo, mm_hi, _sym = search_1mm(fmi, flat, lens)
    mm_lo = mm_lo.reshape(-1)
    mm_hi = mm_hi.reshape(-1)
    rows = jnp.clip(mm_lo + (mm_hi - mm_lo) // 2, 0, fmi.n)
    ploc, resolved = locate_core(fmi, rows)
    valid = (mm_hi > mm_lo) & resolved
    own = ploc < sidx.slice_len
    gpos = (d.astype(jnp.uint32) * jnp.uint32(sidx.slice_len)
            + ploc.astype(jnp.uint32))
    gvalid = valid & own & (gpos < jnp.uint32(sidx.n))

    gpos = jax.lax.all_to_all(
        gpos.reshape(Dn, b, NS, NM3), axis, split_axis=0, concat_axis=0)
    gvalid = jax.lax.all_to_all(
        gvalid.reshape(Dn, b, NS, NM3), axis, split_axis=0, concat_axis=0)

    cand = gpos.transpose(1, 2, 0, 3).reshape(b, NS, Dn * NM3)
    cval = gvalid.transpose(1, 2, 0, 3).reshape(b, NS, Dn * NM3)
    order = jnp.argsort(jnp.where(cval, 0, 1).astype(jnp.int32),
                        axis=-1, stable=True)[..., :NM3]
    pos = jnp.take_along_axis(cand, order, axis=-1)
    val = jnp.take_along_axis(cval, order, axis=-1)
    return pos, val
