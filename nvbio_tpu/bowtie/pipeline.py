"""Single-end read mapping pipeline: seed -> search -> locate -> extend ->
reduce -> traceback -> SAM.

Dense re-composition of nvBowtie's best-approx state machine
(``aligner_best_approx.h:85-840``):

  reference (CUDA)                         this pipeline (TPU)
  ------------------------------------     ---------------------------------
  SeedHitDequeArray priority deques        dense (B, S) SA/bucket ranges
  select (SumTree-sampled hits)            stratified slots per range (masked)
  locate (sorted SSA lookups)              q-gram direct lookup / bounded LF
  score_best banded Gotoh kernels          Pallas banded Gotoh (VMEM-resident)
  reduce best-2 w/ bail-out                masked argmax + distinct-locus 2nd
  banded_traceback_best                    direction-replay banded traceback
  BowtieMapq2                              mapq_v2_end_to_end

Every stage is fixed-shape; "queues" are validity masks. One jit compiles the
whole per-batch step; multi-chip scaling shards the batch dimension
(see nvbio_tpu.parallel). The paired-end pipeline (nvbio_tpu.bowtie.paired)
reuses the candidate stage and adds pairing + mate rescue.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from nvbio_tpu import packed
from nvbio_tpu.align.batch import batch_score_banded
from nvbio_tpu.align.traceback import batch_traceback_banded, cigar_to_string
from nvbio_tpu.align.types import NEG_INF, SEMI_GLOBAL, GotohAligner
from nvbio_tpu.bowtie.mapq import mapq_v2_end_to_end
from nvbio_tpu.bowtie.params import MapParams
from nvbio_tpu.fmi.search import backward_search_core, locate_core
from nvbio_tpu.qgram import stratified_offsets
from nvbio_tpu.io.sam import (
    FLAG_REVERSE,
    FLAG_UNMAPPED,
    SamRecord,
    quals_to_string,
)
from nvbio_tpu.alphabet import Alphabet, codes_to_string


def host_rc_ascii(codes_np: np.ndarray) -> np.ndarray:
    """Reverse-complement ASCII matrix of a batch's codes (host-side);
    read b's rc occupies the TAIL of row b (slice [Lfull-len:])."""
    from nvbio_tpu.alphabet import _FROM_CODE

    # DNA_N table: read N (code 4) renders as 'N' and complements to itself
    rc_table = _FROM_CODE[Alphabet.DNA_N][[3, 2, 1, 0, 4]]
    return rc_table[np.asarray(codes_np, np.uint8)][:, ::-1]


def lazy_ops_rows(need: np.ndarray, ops_dev) -> dict:
    """Fetch traceback op rows only where ``need`` (mapped reads whose
    MD/CIGAR requires entries: any mismatch or indel, i.e. NM > 0).

    Returns {row: ops_row}; ``ops_dev`` may still live on device — on the
    remote relay a full (B, M+W) fetch costs ~1s/batch while the needed
    rows are typically a fraction of the batch."""
    rows = np.flatnonzero(need)
    if not len(rows):
        return {}
    if isinstance(ops_dev, np.ndarray):
        return dict(zip(rows.tolist(), ops_dev[rows]))
    return dict(zip(rows.tolist(), np.asarray(ops_dev[jnp.asarray(rows)])))


def _mm_penalties(reads, quals, params: MapParams):
    """Bowtie2 quality-dependent mismatch penalty (positive magnitude).

    Read-N positions (code > 3) charge the flat ``--np`` penalty (bowtie2
    default 1; the reference's N scoring, ``scoring.h:83-101`` N_penalty)
    instead of the quality-scaled mismatch cost — an N never matches, so
    its cost rides entirely in this plane."""
    if not params.use_quality_penalties:
        return None
    q = jnp.minimum(quals.astype(jnp.int32), 40)
    span = params.mm_penalty_max - params.mm_penalty_min
    # truncating scale, matching bowtie2's q-to-penalty and the reference's
    # QualCost (scoring.h:83-101 casts the fraction down)
    pen = params.mm_penalty_min + (span * q) // 40
    pen = jnp.where(reads > 3, jnp.int32(params.np_penalty), pen)
    return pen.astype(jnp.int32)


def n_ceil_of(reads, lens, params: MapParams):
    """bowtie2 ``--n-ceil`` (default L,0,0.15): reads with more Ns than
    f(len) = const + coeff*len are filtered (reported unmapped)."""
    L = reads.shape[1]
    in_len = jnp.arange(L, dtype=jnp.int32)[None, :] < lens[:, None]
    n_count = jnp.sum(((reads > 3) & in_len).astype(jnp.int32), axis=1)
    ceil = jnp.floor(params.n_ceil_const
                     + params.n_ceil_coeff * lens.astype(jnp.float32))
    return n_count <= ceil.astype(jnp.int32)


def score_min_of(lens, params: MapParams):
    x = lens.astype(jnp.float32)
    if params.score_min_log:  # bowtie2 G-type function (local mode default)
        x = jnp.log(jnp.maximum(x, 1.0))
    return jnp.ceil(
        params.score_min_const + params.score_min_coeff * x
    ).astype(jnp.int32)


# ---- position arithmetic, dtype-generic -----------------------------------
# Genome positions are int32 for texts < 2^31 and uint32 up to 2^32 (human
# scale). All position math below must therefore avoid negative
# intermediates: subtraction clips at zero, distances via max-min.


def _sub_clip0(a, b):
    """max(a - b, 0) without signed underflow; b is small and non-negative."""
    b = jnp.asarray(b).astype(a.dtype) if hasattr(b, "dtype") else b
    return jnp.where(a > b, a - b, jnp.zeros((), a.dtype))


def _absdiff(a, b):
    """|a - b| for matching (possibly unsigned) dtypes."""
    return jnp.maximum(a, b) - jnp.minimum(a, b)


def use_pallas_extension(params: MapParams) -> bool:
    return params.extension == "pallas" or (
        params.extension == "auto" and jax.default_backend() == "tpu"
    )


def _sumtree_select(lo, range_size, seed_valid2, starts, S1: int, H: int,
                    seed_phase):
    """SumTree-CDF randomized hit selection (select.h:52-80 semantics).

    Each strand half draws its S1*H locate slots by sampling WHICH seed to
    locate from with probability proportional to 1/range^2 (specific seeds
    — small SA/bucket ranges — get the budget; repetitive seeds rarely
    fire), then a uniform slot within the chosen seed's range. The CDF
    sampling is ``nvbio_tpu.sumtree`` (the prefix-sum re-expression of the
    reference's ``SumTree``, sum_tree.h:42-104).

    Returns (lo_c, slot, seed_off, vld), all (B, 2*S1, H): the chosen
    seed's range start, the slot within it, the chosen seed's read offset,
    and draw validity. Seed gathers go through one-hot contractions over
    the small seed axis (traced-index gathers lower to scalar loads).
    """
    from nvbio_tpu import sumtree

    B = lo.shape[0]
    rdt = lo.dtype
    key = jax.random.fold_in(jax.random.PRNGKey(0x5E1EC7), seed_phase)
    draws = S1 * H
    eye = jnp.arange(S1, dtype=jnp.int32)
    outs = []
    for h in (0, 1):
        sl = slice(h * S1, (h + 1) * S1)
        rs_h = range_size[:, sl]
        valid_h = seed_valid2[:, sl] & (rs_h > 0)
        rsf = rs_h.astype(jnp.float32)
        w = jnp.where(valid_h, 1.0 / (rsf * rsf + 1e-30), 0.0)
        uk, us = jax.random.uniform(jax.random.fold_in(key, h),
                                    (2, B, draws))
        choice = jax.vmap(sumtree.sample, in_axes=(None, 1), out_axes=1)(
            w, uk)                                        # (B, draws)
        oh = (choice[:, :, None] == eye[None, None, :])   # (B, draws, S1)
        ohr = oh.astype(rdt)
        rs_c = jnp.sum(ohr * rs_h[:, None, :], axis=-1)
        lo_c = jnp.sum(ohr * lo[:, sl][:, None, :], axis=-1)
        off_c = jnp.sum(oh.astype(jnp.int32)
                        * starts[None, None, :], axis=-1)
        slot = jnp.minimum(
            (us * rs_c.astype(jnp.float32)).astype(rdt),
            _sub_clip0(rs_c, 1))
        vld = (jnp.sum(w, axis=-1) > 0)[:, None] & (rs_c > 0)
        outs.append((lo_c.reshape(B, S1, H), slot.reshape(B, S1, H),
                     off_c.reshape(B, S1, H), vld.reshape(B, S1, H)))
    return tuple(jnp.concatenate([a[i] for a in outs], axis=1)
                 for i in range(4))


def _append_pass0(pos, hit_valid, sel_off, pos_e, ok_e, B, S1, starts):
    """Append the pass-0 whole-read exact loci (fwd = pos_e[:B], rc =
    pos_e[B:]) as 2 extra hit columns on the offset-0 seed rows. Appended
    TWICE: the duplicate is a free extra vote in the evidence-ranked dedup,
    so a pass-0 locus cannot lose its candidate slot to single-seed repeat
    loci (the reference treats pass-0 hits as authoritative)."""
    extra_pos = (jnp.zeros((B, 2 * S1, 2), pos.dtype)
                 .at[:, 0, :].set(pos_e[:B, None].astype(pos.dtype))
                 .at[:, S1, :].set(pos_e[B:, None].astype(pos.dtype)))
    extra_ok = (jnp.zeros((B, 2 * S1, 2), bool)
                .at[:, 0, :].set(ok_e[:B, None])
                .at[:, S1, :].set(ok_e[B:, None]))
    pos = jnp.concatenate([pos, extra_pos], axis=-1)
    hit_valid = jnp.concatenate([hit_valid, extra_ok], axis=-1)
    if sel_off is not None:
        seed_off2 = jnp.concatenate([starts, starts])
        sel_off = jnp.concatenate(
            [sel_off, jnp.broadcast_to(
                seed_off2[None, :, None], (B, 2 * S1, 2))], axis=-1)
    return pos, hit_valid, sel_off


def read_candidates(index, genome_words, n_genome, reads, lens, quals,
                    params: MapParams, seed_phase: int = 0,
                    approx_1mm: bool = False):
    """Seed + locate + dedup + extension-score candidates for one batch.

    Returns a dict with per-candidate arrays of shape (B, C):
    scores / w0 / strand / valid, plus per-read rc reads and penalty planes.

    ``seed_phase`` shifts the whole seed grid (reseeding passes use a
    different phase so previously-missed loci get fresh seed windows,
    matching the reference's per-pass seed re-placement,
    ``aligner_best_approx.h:206``). ``approx_1mm`` additionally seeds
    through all 1-mismatch mutations of each q-gram key (``mapping.h:
    132-163`` approximate seeding), consolidated to the 2 best-supported
    extra loci per seed by a within-seed voting tournament.
    """
    P = params
    B, L = reads.shape
    S1 = P.seeds_per_strand
    H = P.hits_per_seed
    W = P.band
    TW = L + W - 1
    reads = reads.astype(jnp.int32)
    lens = lens.astype(jnp.int32)
    neg = jnp.int32(NEG_INF)

    # ---- strands ----------------------------------------------------------
    # reversal through the packed word domain (packed.reverse_rows): the
    # naive per-lane take_along_axis gathers lower to scalar loads (~15 ms
    # per (B, L) plane on v5e); this is dense vector work instead.
    # Read Ns carry DNA_N code 4: they never equal a genome symbol, so the
    # scorer charges the mismatch penalty (alphabet.h:68-76 semantics); the
    # 2-bit reversal folds them, so the N plane reverses separately (1-bit)
    # and re-marks the rc.
    n_read = reads > 3
    rc = 3 - packed.reverse_rows(jnp.minimum(reads, 3), lens, 2)
    rc = jnp.where(
        packed.reverse_rows(n_read.astype(jnp.int32), lens, 1) > 0, 4, rc)
    pen = _mm_penalties(reads, quals, P)
    mm = None if pen is None else -pen
    mm_rc = None if pen is None else -packed.reverse_rows(pen, lens, 8)

    # ---- seeding ----------------------------------------------------------
    starts = (seed_phase
              + jnp.arange(S1, dtype=jnp.int32) * P.seed_stride)  # (S1,)
    seed_gather = starts[:, None] + jnp.arange(P.seed_len, dtype=jnp.int32)[None, :]
    fwd_seeds = reads[:, seed_gather]          # (B, S1, s)
    rc_seeds = rc[:, seed_gather]
    seeds = jnp.concatenate([fwd_seeds, rc_seeds], axis=1)  # (B, 2*S1, s)
    seed_valid = (starts[None, :] + P.seed_len) <= lens[:, None]  # (B, S1)
    seed_valid2 = jnp.concatenate([seed_valid, seed_valid], axis=1)
    # seeds containing a read N never produce hits (their q-gram key would
    # be meaningless) — reject them like the reference's N-aware seeding
    seed_valid2 = seed_valid2 & ~jnp.any(seeds > 3, axis=-1)

    from nvbio_tpu.fmi.sharded import ShardedFMIndex
    from nvbio_tpu.parallel.sharded_index import ShardedQGramIndex

    k = jnp.arange(H, dtype=jnp.int32)
    sel_off = None  # (B, 2S1, H) per-draw seed offsets (randomized select)
    if isinstance(index, ShardedFMIndex):
        # genome-sliced FM-indexes served over the mesh (inside shard_map):
        # local backward search per slice, all_to_all answer routing
        from nvbio_tpu.fmi.sharded import sharded_fmi_seed_hits

        pos, hvalid, _rs = sharded_fmi_seed_hits(index, seeds, P.seed_len, H)
        hit_valid = hvalid & seed_valid2[:, :, None]
        if P.whole_read_exact and seed_phase == 0:
            # pass 0 at scale: whole-read exact search served by the
            # sliced index (same contract as the replicated pass below)
            from nvbio_tpu.fmi.sharded import sharded_fmi_whole_read

            q2 = jnp.concatenate([jnp.minimum(reads, 3),
                                  jnp.minimum(rc, 3)])
            l2 = jnp.concatenate([lens, lens])
            pos_e, ok_e = sharded_fmi_whole_read(index, q2, l2)
            ok_e = (ok_e & (l2 > 0)
                    & ~jnp.any(jnp.concatenate([reads, rc]) > 3, axis=1))
            pos, hit_valid, sel_off = _append_pass0(
                pos, hit_valid, sel_off, pos_e, ok_e, B, S1, starts)
            H = H + 2
    elif isinstance(index, ShardedQGramIndex):
        # bucket-range-sharded index served over ICI (inside shard_map):
        # same hit contract as the replicated q-gram path, bitwise
        from nvbio_tpu.parallel.sharded_index import sharded_seed_hits
        from nvbio_tpu.qgram import seed_keys_from_batch

        keys = seed_keys_from_batch(seeds, index.q)        # (B, 2S1)
        pos, range_size = sharded_seed_hits(index, keys, H)
        hit_valid = (
            (k.astype(range_size.dtype)[None, None, :]
             < range_size[:, :, None]) & seed_valid2[:, :, None]
        )
    elif P.seeding == "qgram":
        # direct-address k-mer lookup: positions come straight from the table
        from nvbio_tpu.qgram import (index_locate, index_range,
                                     seed_keys_from_batch)

        keys = seed_keys_from_batch(seeds, index.q)        # (B, 2S1)
        lo, hi = index_range(index, keys)
        rdt = lo.dtype  # int32, or uint32 for large genomes
        range_size = jnp.maximum(hi - lo, jnp.zeros((), rdt))
        if P.select_mode == "randomized":
            lo_c, slot, sel_off, hit_valid = _sumtree_select(
                lo, range_size, seed_valid2, starts, S1, H, seed_phase)
            pos = index_locate(index, lo_c, slot)          # (B,2S1,H)
        else:
            hit_valid = (
                (k.astype(rdt)[None, None, :] < range_size[:, :, None])
                & seed_valid2[:, :, None]
            )
            # stratified slot sampling across wide ranges, jittered per seed
            from nvbio_tpu.qgram import QGramIndex as _QGI

            if isinstance(index, _QGI):
                # 2 row-gathers/seed instead of H flat gathers (16 ns each
                # on TPU): see qgram.stratified_locate_rows
                from nvbio_tpu.qgram import stratified_locate_rows

                pos = stratified_locate_rows(index, lo, range_size, H, 2 * S1)
            else:  # QGroup index: per-slot locate (different slot layout)
                off = stratified_offsets(range_size, H, 2 * S1)
                pos = index_locate(index, lo[:, :, None], off)  # (B,2S1,H)
    else:
        # FM-index backward search + bounded LF locate
        seeds_flat = seeds.reshape(B * 2 * S1, P.seed_len)
        slens = jnp.full((B * 2 * S1,), P.seed_len, jnp.int32)
        lo, hi = backward_search_core(index, seeds_flat, slens)
        lo = lo.reshape(B, 2 * S1)
        hi = hi.reshape(B, 2 * S1)
        range_size = jnp.maximum(hi - lo, 0)

        if P.select_mode == "randomized":
            lo_c, slot, sel_off, hit_valid = _sumtree_select(
                lo, range_size, seed_valid2, starts, S1, H, seed_phase)
            rows = lo_c + slot
        else:
            # jittered stratified slot sampling (see qgram.stratified_offsets)
            off = stratified_offsets(range_size, H, 2 * S1)
            rows = lo[:, :, None] + off                            # (B, 2S1, H)
            hit_valid = (
                (k[None, None, :] < range_size[:, :, None])
                & seed_valid2[:, :, None]
            )
        rows_flat = jnp.clip(rows, 0, index.n).reshape(B * 2 * S1 * H)
        pos, _ = locate_core(index, rows_flat)
        pos = pos.reshape(B, 2 * S1, H)

        if P.whole_read_exact and seed_phase == 0:
            # ---- pass 0: whole-read exact match ---------------------------
            # the reference's first seeding pass searches the ENTIRE read
            # exactly (aligner_best_approx.h:162-166) — a guaranteed locus
            # for exact reads even when every seed bucket is busy. One
            # backward search of both strands, one located slot each,
            # appended as an extra hit column on the offset-0 seed rows
            # (whole-read matches start at read offset 0 == starts[0]).
            q2 = jnp.concatenate([jnp.minimum(reads, 3),
                                  jnp.minimum(rc, 3)])          # (2B, L)
            l2 = jnp.concatenate([lens, lens])
            lo_e, hi_e = backward_search_core(index, q2, l2)
            rows_e = jnp.clip(lo_e + (hi_e - lo_e) // 2, 0, index.n)
            pos_e, _ = locate_core(index, rows_e)
            ok_e = ((hi_e > lo_e) & (l2 > 0)
                    & ~jnp.any(jnp.concatenate([reads, rc]) > 3, axis=1))
            pos, hit_valid, sel_off = _append_pass0(
                pos, hit_valid, sel_off, pos_e, ok_e, B, S1, starts)
            H = H + 2

    if approx_1mm:
        # ---- 1-mismatch seeding (reseed passes) ---------------------------
        # q-gram path: every single-symbol mutation of each seed KEY is
        # looked up (one sampled slot per mutated bucket). FM path: the
        # dense search_1mm enumeration over the full seed (mapping.h:
        # 132-163 approximate hybrid seeding) — replicated or genome-sliced
        # over the mesh. Either way a within-seed voting tournament keeps
        # the NK best-supported extra loci — a SNP inside every exact seed
        # window no longer makes a read unmappable.
        if isinstance(index, ShardedFMIndex):
            from nvbio_tpu.fmi.sharded import sharded_fmi_seed_hits_1mm

            NSdim = seeds.shape[1]
            pos1, v1 = sharded_fmi_seed_hits_1mm(index, seeds, P.seed_len)
            NM3 = pos1.shape[-1]
            rs1 = v1.astype(jnp.int32)
            valid1 = v1 & seed_valid2[:, :, None]
        elif P.seeding == "qgram":
            qq = index.q
            jj = jnp.arange(qq, dtype=jnp.int32)
            shift = 2 * (qq - 1 - jj)                   # symbol j bit offset
            dd = jnp.arange(1, 4, dtype=jnp.int32)
            xor = (dd[None, :] << shift[:, None]).reshape(3 * qq)   # (3q,)
            NM3 = 3 * qq
            NSdim = keys.shape[1]
            mut_keys = keys[:, :, None] ^ xor[None, None, :]  # (B, NS, 3q)
            if isinstance(index, ShardedQGramIndex):
                from nvbio_tpu.parallel.sharded_index import sharded_seed_hits

                p1, rs1 = sharded_seed_hits(
                    index, mut_keys.reshape(B, NSdim * NM3), 1)
                pos1 = p1.reshape(B, NSdim, NM3)
                rs1 = rs1.reshape(B, NSdim, NM3)
            elif getattr(index, "mid_pos", None) is not None:
                # one gather per mutated key: mid_pos[key] IS the middle
                # bucket slot (dtype-max sentinel = empty) — 3x fewer
                # random HBM loads than the (lo, hi, locate) triple, and
                # bitwise-identical candidates
                pos1 = jnp.take(index.mid_pos, jnp.clip(
                    mut_keys, 0, (1 << (2 * qq)) - 1))
                sent1 = jnp.asarray(
                    np.iinfo(np.dtype(pos1.dtype.name)).max, pos1.dtype)
                rs1 = (pos1 != sent1).astype(jnp.int32)
            else:
                from nvbio_tpu.qgram import index_locate as _iloc, \
                    index_range as _irng

                lo1, hi1 = _irng(index, mut_keys)
                rs1 = jnp.maximum(hi1 - lo1, jnp.zeros((), lo1.dtype))
                pos1 = _iloc(index, lo1, rs1 // 2)      # middle slot
            valid1 = (rs1 > 0) & seed_valid2[:, :, None]
        else:
            # FM path: approx-HYBRID 1-mm ranges (mapping.h:66-73 — exact
            # right subseed, <=1 mismatch in the left half), state-shared
            # so the mutated searches cost ~5% of independent re-searches;
            # one located slot per nonempty range
            from nvbio_tpu.fmi.search import search_1mm_hybrid_topk

            NSdim = seeds.shape[1]
            slen = P.seed_len
            n_approx = (slen + 1) // 2
            seeds_f = seeds.reshape(B * NSdim, slen)
            slens_f = jnp.full((B * NSdim,), slen, jnp.int32)
            # top-K survivor compaction: the continuation walk and the
            # locate below run over K slots/seed instead of 3*n_approx
            # (expected nonempty branches/seed ~6-7 at 100 Mbp — K=8
            # keeps them all; FM_SPEED r5)
            _elo, _ehi, mm_lo, mm_hi = search_1mm_hybrid_topk(
                index, seeds_f, slens_f, n_approx, K=8)
            NM3 = mm_lo.shape[1]
            mm_lo = mm_lo.reshape(B * NSdim * NM3)
            mm_hi = mm_hi.reshape(B * NSdim * NM3)
            rows1 = jnp.clip(mm_lo + (mm_hi - mm_lo) // 2, 0, index.n)
            p1, _res1 = locate_core(index, rows1)
            pos1 = p1.reshape(B, NSdim, NM3)
            rs1 = (mm_hi - mm_lo).reshape(B, NSdim, NM3)
            valid1 = (rs1 > 0) & seed_valid2[:, :, None]

        NK = 2
        tol1 = 2 * P.max_dist
        mdt = pos1.dtype
        big1 = jnp.asarray(np.iinfo(np.dtype(mdt.name)).max, mdt)
        pv = jnp.where(valid1, pos1, big1)
        near1 = (_absdiff(pv[..., :, None], pv[..., None, :]) <= tol1) & \
            valid1[..., None, :]                        # (B, NS, 3q, 3q)
        votes1 = jnp.where(valid1, jnp.sum(near1, axis=-1).astype(jnp.int32),
                           -1)
        reps1, valids1 = [], []
        for _ in range(NK):
            m_v = jnp.max(votes1, axis=-1)
            any_v = m_v > 0
            picked = votes1 == m_v[..., None]
            sel1 = jnp.min(jnp.where(picked, pv, big1), axis=-1)
            members = (_absdiff(pv, sel1[..., None]) <= tol1) & (votes1 >= 0)
            rep = jnp.min(jnp.where(members, pv, big1), axis=-1)
            reps1.append(jnp.where(any_v, rep, big1))
            valids1.append(any_v)
            votes1 = jnp.where(members, -1, votes1)
        pos_extra = jnp.stack(reps1, axis=-1)           # (B, NS, NK)
        valid_extra = jnp.stack(valids1, axis=-1) & (pos_extra < big1)
        pos_extra = jnp.where(valid_extra, pos_extra, jnp.zeros((), mdt))
        pos = jnp.concatenate([pos, pos_extra], axis=-1)
        hit_valid = jnp.concatenate([hit_valid, valid_extra], axis=-1)
        if sel_off is not None:  # extra columns belong to their seed row
            seed_off2 = jnp.concatenate([starts, starts])
            sel_off = jnp.concatenate(
                [sel_off, jnp.broadcast_to(
                    seed_off2[None, :, None], (B, 2 * S1, NK))], axis=-1)
        H = H + NK

    # candidate genome window start: seed offset within the (strand) read,
    # slack of max_dist on each side. Positions may be uint32 (genomes past
    # 2^31 symbols) — all math via the clip-at-zero helpers.
    pdt = pos.dtype
    nmax = jnp.asarray(n_genome).astype(pdt)
    if sel_off is not None:
        off_plane = sel_off  # randomized select: per-draw seed offsets
    else:
        seed_off = jnp.concatenate([starts, starts])                # (2*S1,)
        off_plane = seed_off[None, :, None]
    w0 = _sub_clip0(pos, (off_plane + P.max_dist).astype(pdt))
    w0 = jnp.minimum(w0, _sub_clip0(nmax, 1))

    CH = S1 * H  # candidates per strand half
    w0 = w0.reshape(B, 2 * CH)
    cand_valid_all = hit_valid.reshape(B, 2 * CH)

    # ---- dedup to unique loci per strand ------------------------------------
    # (the reference scores every selected hit; most hits of a well-mapped
    # read land on one locus — dedup slashes extension work ~3x at fixed
    # shapes. Candidates within 2*max_dist collapse to their leftmost start.)
    NCH = min(P.nch, CH)
    tol = 2 * P.max_dist

    def dedup_half(w0h, validh):
        # evidence-ranked tournament: loci supported by more seeds win the
        # NCH slots (nvBowtie's seed-hit prioritization); a plain positional
        # cap silently drops true loci once q-gram buckets get busy on large
        # genomes (mapped rate fell to ~30% on a 100 Mbp reference)
        big = jnp.asarray(np.iinfo(np.dtype(pdt.name)).max, pdt)
        w0v = jnp.where(validh, w0h, big)
        near = (_absdiff(w0v[:, :, None], w0v[:, None, :]) <= tol) & \
            validh[:, None, :]                       # (B, CH, CH)
        votes = jnp.where(validh,
                          jnp.sum(near, axis=2).astype(jnp.int32), -1)
        reps, valids = [], []
        for _ in range(NCH):
            # lexicographic (max votes, min w0) in two reductions — packing
            # into one int32 key overflows once a cluster reaches 32 members
            m_v = jnp.max(votes, axis=1)
            any_valid = m_v > 0
            picked = votes == m_v[:, None]
            # leftmost member of the picked cluster = the representative
            sel_w0 = jnp.min(jnp.where(picked, w0v, big), axis=1)
            members = (_absdiff(w0v, sel_w0[:, None]) <= tol) & (votes >= 0)
            rep = jnp.min(jnp.where(members, w0v, big), axis=1)
            reps.append(jnp.where(any_valid, rep, big))
            valids.append(any_valid)
            votes = jnp.where(members, -1, votes)
        uw0 = jnp.stack(reps, axis=1)          # (B, NCH)
        uvalid = jnp.stack(valids, axis=1) & (uw0 < big)
        return jnp.where(uvalid, uw0, jnp.zeros((), pdt)), uvalid

    w0f, validf = dedup_half(w0[:, :CH], cand_valid_all[:, :CH])
    w0r, validr = dedup_half(w0[:, CH:], cand_valid_all[:, CH:])
    C = 2 * NCH
    w0 = jnp.concatenate([w0f, w0r], axis=1)           # (B, C)
    cand_valid = jnp.concatenate([validf, validr], axis=1)
    cand_strand = jnp.arange(C, dtype=jnp.int32)[None, :] >= NCH  # False=fwd

    # ---- extension scoring -------------------------------------------------
    if use_pallas_extension(P) and B % 1024 == 0 and P.mode != "local":
        # register-tiled path: slot-major candidate blocks, per-read pattern
        # tiles selected fwd/rc in-kernel, text windows gathered straight
        # into the blocked layout — no (B*C, L) operand is materialized
        from nvbio_tpu.align.pallas_kernels import banded_score_cands_regtile

        w0_sm = w0.T.reshape(C * B)
        wlens_sm = jnp.minimum(_sub_clip0(nmax, w0_sm), TW).astype(jnp.int32)
        sc_sm, _ = banded_score_cands_regtile(
            reads, rc, lens, w0_sm, wlens_sm, genome_words,
            P.scoring, W, C, NCH, mm, mm_rc,
        )
        sc = sc_sm.reshape(C, B).T.reshape(B * C)
    else:
        win = packed.extract_window_aligned(genome_words, w0.reshape(B * C), TW, 2)
        wlens = jnp.minimum(_sub_clip0(nmax, w0.reshape(B * C)),
                            TW).astype(jnp.int32)

        pat_sel = jnp.where(cand_strand[:, :, None], rc[:, None, :], reads[:, None, :])
        pats = pat_sel.reshape(B * C, L)
        plens = jnp.broadcast_to(lens[:, None], (B, C)).reshape(B * C)
        if mm is not None:
            mm_sel = jnp.where(cand_strand[:, :, None], mm_rc[:, None, :], mm[:, None, :])
            mm_flat = mm_sel.reshape(B * C, L)
        else:
            mm_flat = None

        if use_pallas_extension(P):
            from nvbio_tpu.align.pallas_kernels import (
                banded_score_semiglobal_pallas,
            )

            sc, _ = banded_score_semiglobal_pallas(
                pats, plens, win, wlens, P.scoring, W, mm_flat,
                local=P.mode == "local",
            )
        else:
            from nvbio_tpu.align.types import LOCAL

            atype = LOCAL if P.mode == "local" else SEMI_GLOBAL
            aligner = GotohAligner(atype, P.scoring)
            sc = batch_score_banded(pats, plens, win, wlens, aligner, W, mm_flat).score
    scores = jnp.where(cand_valid.reshape(B * C), sc, neg).reshape(B, C)

    return dict(
        scores=scores, w0=w0, strand=cand_strand, valid=cand_valid,
        reads=reads, lens=lens, rc=rc, mm=mm, mm_rc=mm_rc,
    )


def _md_pack_entries(tb, bpat, btext):
    """(packed MD entries forward-ordered, NM) for the slow/XLA path.

    Entry layout matches the fused kernel's: op | mism<<2 | ref_sym<<3 (see
    ``align.traceback.md_from_entries``)."""
    L = bpat.shape[1]
    TW = btext.shape[1]
    ops = tb.ops  # (B, MAXS) forward order
    is_m = ops == 1
    is_i = ops == 2
    is_d = ops == 3
    pat_cursor = (
        jnp.cumsum((is_m | is_i).astype(jnp.int32), axis=1) - 1
        + tb.pattern_start[:, None]
    )
    txt_cursor = (
        jnp.cumsum((is_m | is_d).astype(jnp.int32), axis=1) - 1
        + tb.text_start[:, None]
    )
    pat_sym = jnp.take_along_axis(bpat, jnp.clip(pat_cursor, 0, L - 1), axis=1)
    txt_sym = jnp.take_along_axis(btext, jnp.clip(txt_cursor, 0, TW - 1), axis=1)
    mism = is_m & (pat_sym != txt_sym)
    nm = jnp.sum((mism | is_i | is_d).astype(jnp.int32), axis=1)
    entries = jnp.where(
        ops != 0,
        ops | (mism.astype(jnp.int32) << 2) | ((txt_sym & 15) << 3),
        0,
    )
    return entries, nm


def finalize_best(cands, genome_words, n_genome, best_idx, params: MapParams,
                  full_matrix: bool = False):
    """Traceback + NM for one chosen candidate per read.

    Re-extracts the winning windows from the genome (B windows) and runs the
    direction-replay banded traceback. ``full_matrix=True`` switches to the
    FULL-MATRIX traceback (no band constraint inside the window) — the
    reference's PE opposite-mate traceback mode
    (``aligner_best_approx_paired.h:404-479``); see
    ``align.traceback.batch_traceback_full``.
    """
    P = params
    W = P.band
    reads, lens, rc = cands["reads"], cands["lens"], cands["rc"]
    mm, mm_rc = cands["mm"], cands["mm_rc"]
    B, L = reads.shape
    TW = L + W - 1

    best_pos = jnp.take_along_axis(cands["w0"], best_idx[:, None], axis=1)[:, 0]
    best_strand = jnp.take_along_axis(cands["strand"], best_idx[:, None], axis=1)[:, 0]

    nmax = jnp.asarray(n_genome).astype(best_pos.dtype)
    btext = packed.extract_window_aligned(genome_words, best_pos, TW, 2)
    btlen = jnp.minimum(_sub_clip0(nmax, best_pos), TW).astype(jnp.int32)
    bpat = jnp.where(best_strand[:, None], rc, reads)
    bmm = None if mm is None else jnp.where(best_strand[:, None], mm_rc, mm)
    local = P.mode == "local"
    if use_pallas_extension(P):
        from nvbio_tpu.align.traceback import (
            batch_traceback_banded_fast,
            batch_traceback_full,
        )

        # nm comes out of the fused kernel walk (no symbol gathers needed)
        if full_matrix:
            tb, nm = batch_traceback_full(
                bpat, lens, btext, btlen, P.scoring, bmm, local=local)
        else:
            tb, nm = batch_traceback_banded_fast(
                bpat, lens, btext, btlen, P.scoring, W, bmm, local=local)
    else:
        from nvbio_tpu.align.traceback import batch_traceback_full_scan
        from nvbio_tpu.align.types import LOCAL

        aligner = GotohAligner(LOCAL if local else SEMI_GLOBAL, P.scoring)
        if full_matrix:
            tb = batch_traceback_full_scan(bpat, lens, btext, btlen,
                                           aligner, bmm)
        else:
            tb = batch_traceback_banded(bpat, lens, btext, btlen, aligner,
                                        W, bmm)
        entries, nm = _md_pack_entries(tb, bpat, btext)
        tb = tb._replace(ops=entries)

    # pure-match reads (no I/D): #D == 0 iff n_ops == plen, and then
    # #I == 0 iff the text span equals plen too — their CIGAR is just "{L}M";
    # the host only needs their op rows when NM > 0 (for the MD tag)
    simple = (tb.n_ops == lens) & ((tb.text_end - tb.text_start) == lens)
    # substitution/indel split from the packed entries (diagnostic surface:
    # DebugOutput subs/ins/dels, output_debug.h) — dense reductions, no
    # host op-row fetch needed
    ent = tb.ops.astype(jnp.int32)
    opc = ent & 3
    vmask = (jnp.arange(ent.shape[1], dtype=jnp.int32)[None, :]
             < tb.n_ops[:, None])
    subs = jnp.sum((vmask & (opc == 1) & (((ent >> 2) & 1) == 1))
                   .astype(jnp.int32), axis=1)
    ins = jnp.sum((vmask & (opc == 2)).astype(jnp.int32), axis=1)
    dels = jnp.sum((vmask & (opc == 3)).astype(jnp.int32), axis=1)
    return dict(
        strand=best_strand,
        window_start=best_pos,
        text_start=tb.text_start,
        pattern_start=tb.pattern_start,
        pattern_end=tb.pattern_end,
        ops=tb.ops.astype(jnp.uint8),
        n_ops=tb.n_ops,
        nm=nm,
        subs=subs,
        ins=ins,
        dels=dels,
        simple=simple,
        tb_score=tb.score,
    )


@functools.partial(jax.jit, static_argnames=("params",))
def align_batch_all(index, genome_words, n_genome, reads, lens, quals,
                    params: MapParams):
    """All-mapping: traceback EVERY candidate above threshold per read.

    Counterpart of the reference's exhaustive all-mapping driver
    (``nvBowtie/bowtie2/cuda/aligner_all.h:78-561``), which enumerates and
    outputs every alignment under the score threshold. Here the dedup'd
    candidate set (C per read) is scored as usual and all passing loci get
    a full traceback in one flattened (B*C) fused-kernel call; the host
    emits the best locus as primary and the rest as secondary records.
    """
    P = params
    W = P.band
    cands = read_candidates(index, genome_words, n_genome, reads, lens, quals, P)
    scores, w0, strand = cands["scores"], cands["w0"], cands["strand"]
    lens = cands["lens"]
    reads_, rc = cands["reads"], cands["rc"]
    mm, mm_rc = cands["mm"], cands["mm_rc"]
    B, C = scores.shape
    L = reads_.shape[1]
    TW = L + W - 1

    score_min = score_min_of(lens, P)
    keep = cands["valid"] & (scores >= score_min[:, None]) & (
        lens[:, None] >= P.seed_len) & n_ceil_of(reads, lens, P)[:, None]
    best_idx = jnp.argmax(scores, axis=1).astype(jnp.int32)
    is_best = (jnp.arange(C, dtype=jnp.int32)[None, :] == best_idx[:, None])

    # flatten every candidate into one traceback batch
    w0f = w0.reshape(B * C)
    nmax = jnp.asarray(n_genome).astype(w0f.dtype)
    btext = packed.extract_window_aligned(genome_words, w0f, TW, 2)
    btlen = jnp.minimum(_sub_clip0(nmax, w0f), TW).astype(jnp.int32)
    strand = jnp.broadcast_to(strand, (B, C))
    strand_f = strand.reshape(B * C)
    bpat = jnp.where(strand_f[:, None],
                     jnp.repeat(rc, C, axis=0), jnp.repeat(reads_, C, axis=0))
    blens = jnp.repeat(lens, C)
    bmm = None
    if mm is not None:
        bmm = jnp.where(strand_f[:, None],
                        jnp.repeat(mm_rc, C, axis=0), jnp.repeat(mm, C, axis=0))

    if use_pallas_extension(P):
        from nvbio_tpu.align.traceback import batch_traceback_banded_fast

        tb, nm = batch_traceback_banded_fast(
            bpat, blens, btext, btlen, P.scoring, W, bmm)
    else:
        aligner = GotohAligner(SEMI_GLOBAL, P.scoring)
        tb = batch_traceback_banded(bpat, blens, btext, btlen, aligner, W, bmm)
        entries, nm = _md_pack_entries(tb, bpat, btext)
        tb = tb._replace(ops=entries)

    simple = (tb.n_ops == blens) & ((tb.text_end - tb.text_start) == blens)
    # per-read mapq for the primary (same reduce as best-only mode)
    best_score = jnp.take_along_axis(scores, best_idx[:, None], axis=1)[:, 0]
    best_pos = jnp.take_along_axis(w0, best_idx[:, None], axis=1)[:, 0]
    best_strand = jnp.take_along_axis(strand, best_idx[:, None], axis=1)[:, 0]
    same_locus = (_absdiff(w0, best_pos[:, None]) <= 2 * P.max_dist) & (
        strand == best_strand[:, None])
    second_score = jnp.max(
        jnp.where(same_locus, jnp.int32(NEG_INF), scores), axis=1)
    has_second = second_score >= score_min
    mapq = mapq_v2_end_to_end(best_score, second_score, has_second, score_min)

    return dict(
        keep=keep, is_best=is_best, scores=scores,
        strand=strand, window_start=w0,
        text_start=tb.text_start.reshape(B, C),
        ops=tb.ops.astype(jnp.uint8).reshape(B, C, -1),
        n_ops=tb.n_ops.reshape(B, C),
        nm=nm.reshape(B, C),
        simple=simple.reshape(B, C),
        mapq=mapq,
    )


def _reduce_best2(cands, params: MapParams):
    """(best_score, best_pos, best_strand, second_score) from a candidate set
    (best + best distinct-locus second, reduce.h:45-64 analogue)."""
    neg = jnp.int32(NEG_INF)
    scores, w0, strand = cands["scores"], cands["w0"], cands["strand"]
    best_idx = jnp.argmax(scores, axis=1).astype(jnp.int32)
    best_score = jnp.take_along_axis(scores, best_idx[:, None], axis=1)[:, 0]
    best_pos = jnp.take_along_axis(w0, best_idx[:, None], axis=1)[:, 0]
    best_strand = jnp.take_along_axis(strand, best_idx[:, None], axis=1)[:, 0]
    same_locus = (_absdiff(w0, best_pos[:, None]) <= 2 * params.max_dist) & (
        strand == best_strand[:, None]
    )
    second_score = jnp.max(jnp.where(same_locus, neg, scores), axis=1)
    return best_score, best_pos, best_strand, second_score


@functools.partial(jax.jit, static_argnames=("params",))
def align_batch_core(index, genome_words, n_genome, reads, lens, quals,
                     params: MapParams):
    """Map one dense batch of reads (single-end). Returns per-read results.

    ``index`` is an FMIndex / QGramIndex / ShardedQGramIndex, matching
    ``params.seeding``.

    Multi-pass state machine (``aligner_best_approx.h:206-282``): after the
    first seeding+extension pass, still-unaligned reads are compacted into a
    fixed-capacity sub-batch (the reseed queue at static shapes), re-seeded
    on a shifted grid with 1-mismatch approximate seeding, re-scored, and
    scattered back where they improved. The fixed capacity IS the per-read
    effort bound: a read gets at most ``1 + max_reseed`` seeding passes and
    each pass's extension work is capped by the sub-batch size (the
    bail-out economics of ``reduce.h:45-64``).
    """
    P = params
    neg = jnp.int32(NEG_INF)
    B = reads.shape[0]
    cands = read_candidates(index, genome_words, n_genome, reads, lens, quals, P)
    lens = cands["lens"]
    best_score, best_pos, best_strand, second_score = _reduce_best2(cands, P)
    score_min = score_min_of(lens, P)

    # shape (1,): rank>=1 so shard_map out_specs can concatenate it
    reseed_overflow = jnp.zeros((1,), jnp.int32)
    if P.max_reseed > 0 and B > 1:
        tol = 2 * P.max_dist
        B2 = max(8, min(B, int(round(B * P.reseed_frac / 8)) * 8))
        for p in range(1, P.max_reseed + 1):
            phase = (p * P.seed_stride) // (P.max_reseed + 1)
            needs = (best_score < score_min) & (lens >= P.seed_len)
            # overflow semantics (vector_array.h analogue): reads needing a
            # reseed beyond the queue capacity are REPORTED, not hidden
            reseed_overflow = jnp.maximum(
                reseed_overflow,
                jnp.maximum(jnp.sum(needs.astype(jnp.int32)) - B2, 0)[None])
            # compact the reseed queue: unaligned reads to the front,
            # capacity B2 (excess reads wait — capacity-bounded multi-pass)
            order = jnp.argsort(
                jnp.where(needs, 0, 1).astype(jnp.int32), stable=True
            ).astype(jnp.int32)
            sel = order[:B2]
            c2 = read_candidates(
                index, genome_words, n_genome,
                jnp.take(cands["reads"], sel, axis=0),
                jnp.take(lens, sel), jnp.take(quals, sel, axis=0),
                P, seed_phase=phase, approx_1mm=P.seeding_1mm)
            bs2, bp2, bstr2, sec2 = _reduce_best2(c2, P)
            old_b = jnp.take(best_score, sel)
            old_p = jnp.take(best_pos, sel)
            old_st = jnp.take(best_strand, sel)
            old_sec = jnp.take(second_score, sel)
            sm2 = jnp.take(score_min, sel)
            sub_needs = jnp.take(needs, sel)
            improved = (bs2 > old_b) & sub_needs
            diff_locus = (_absdiff(bp2, old_p) > tol) | (bstr2 != old_st)
            # the displaced old best becomes a distinct-locus second
            new_sec = jnp.maximum(sec2, jnp.where(diff_locus, old_b, old_sec))
            # a non-improving distinct hit still informs the second-best
            sec_keep = jnp.maximum(
                old_sec, jnp.where(diff_locus & (bs2 >= sm2), bs2, neg))
            best_score = best_score.at[sel].set(
                jnp.where(improved, bs2, old_b))
            best_pos = best_pos.at[sel].set(jnp.where(improved, bp2, old_p))
            best_strand = best_strand.at[sel].set(
                jnp.where(improved, bstr2, old_st))
            second_score = second_score.at[sel].set(
                jnp.where(improved, new_sec,
                          jnp.where(sub_needs, sec_keep, old_sec)))

    # finalize the per-read winner (possibly from a reseed pass): traceback
    # re-gathers the window from (w0, strand) directly
    fin_c = dict(cands)
    fin_c["w0"] = best_pos[:, None]
    fin_c["strand"] = best_strand[:, None]
    fin = finalize_best(fin_c, genome_words, n_genome,
                        jnp.zeros((B,), jnp.int32), P)

    # ---- mapq + thresholds --------------------------------------------------
    mapped = (best_score >= score_min) & (lens >= P.seed_len) & \
        n_ceil_of(reads, lens, P)
    has_second = second_score >= score_min
    if P.mode == "local":
        from nvbio_tpu.bowtie.mapq import mapq_v2_local

        max_score = P.scoring.match * lens
        mapq = mapq_v2_local(best_score, second_score, has_second,
                             score_min, max_score)
    else:
        mapq = mapq_v2_end_to_end(best_score, second_score, has_second,
                                  score_min)
    mapq = jnp.where(mapped, mapq, 0)

    return dict(
        mapped=mapped,
        best_score=best_score,
        second_score=second_score,
        has_second=has_second,
        reseed_overflow=reseed_overflow,
        mapq=mapq,
        strand=fin["strand"],
        window_start=fin["window_start"],
        text_start=fin["text_start"],
        pattern_start=fin["pattern_start"],
        pattern_end=fin["pattern_end"],
        ops=fin["ops"],
        n_ops=fin["n_ops"],
        nm=fin["nm"],
        subs=fin["subs"],
        ins=fin["ins"],
        dels=fin["dels"],
        simple=fin["simple"],
    )


@dataclasses.dataclass
class ReadMapper:
    """Host-side driver owning the index + reference metadata."""

    index: object          # FMIndex or QGramIndex (device), per params.seeding
    genome_words: object   # jnp uint32 packed genome
    n_genome: int
    ref_names: list
    ref_offsets: np.ndarray
    params: MapParams

    @classmethod
    def build(cls, reference, params: MapParams = MapParams(), index=None):
        """From an io.Reference (host): builds the seeding index if not given."""
        if index is None:
            if params.seeding == "qgram":
                from nvbio_tpu.qgram import build_qgram_index

                index = build_qgram_index(reference.codes, params.qgram_q,
                                          n_flags=reference.n_flags())
            else:
                from nvbio_tpu.fmi.index import build_fmindex
                from nvbio_tpu.index.device_sa import prefer_device_sa

                method = ("device" if prefer_device_sa(reference.total_length)
                          else "auto")
                index = build_fmindex(reference.codes, method=method)
        index = index.device()
        if (params.seeding == "fmi" and getattr(index, "ftab_k", 0) == 0
                and jax.default_backend() != "cpu"):
            # k-mer jump table for backward search (skipped on CPU: the
            # 4^k-level build is accelerator-speed work)
            from nvbio_tpu.fmi.index import attach_ftab

            index = attach_ftab(index, k=11)
        return cls(
            index=index,
            genome_words=jnp.asarray(reference.packed_words()),
            n_genome=reference.total_length,
            ref_names=reference.names,
            ref_offsets=reference.offsets,
            params=params,
        )

    def contig_of(self, gpos: int):
        ci = int(np.searchsorted(self.ref_offsets, gpos, side="right") - 1)
        return ci, gpos - int(self.ref_offsets[ci])

    @property
    def n_genome_dev(self):
        """Genome length as a device scalar in the index's position dtype
        (uint32 past 2^31 symbols — int32 would wrap)."""
        pos = getattr(self.index, "positions", None)
        dt = jnp.uint32 if (pos is not None and
                            np.dtype(pos.dtype) == np.uint32) else jnp.int32
        return jnp.asarray(self.n_genome, dt)

    def _captured_step(self):
        """Jit of the align step with the FM index + genome CLOSED OVER.

        Embedding the index planes as jit constants lets XLA pre-lay-out
        the rank/ftab/SSA tables the hot gathers hit — measured 2.0x on
        the FM-seeded step on a v5e (1560 -> 780 ms at B=32768; the
        closure is how FM_SPEED always ran, the argument path is how the
        bench ran — r5 bisect). q-gram indexes stay on the argument path:
        their ~400 MB positions plane exceeds the remote-compile payload
        cap (HTTP 413) and showed no gain. One compile per batch shape;
        cached on the mapper."""
        if self.__dict__.get("_step_fn") is None:
            import functools as _ft

            idx, gw, ng, prm = (self.index, self.genome_words,
                                self.n_genome_dev, self.params)

            @jax.jit
            def step(r, ln, q):
                return align_batch_core(idx, gw, ng, r, ln, q, prm)

            self.__dict__["_step_fn"] = step
        return self.__dict__["_step_fn"]

    def dispatch(self, batch):
        """Enqueue device work for a batch (async; returns device arrays).

        Splitting dispatch/format lets callers overlap host-side SAM
        formatting of batch i with device compute of batch i+1 — the TPU
        analogue of the reference's InputThread/ComputeThread overlap."""
        if self.params.seeding == "fmi":
            return self._captured_step()(
                jnp.asarray(batch.codes), jnp.asarray(batch.lengths),
                jnp.asarray(batch.quals))
        return align_batch_core(
            self.index,
            self.genome_words,
            self.n_genome_dev,
            jnp.asarray(batch.codes),
            jnp.asarray(batch.lengths),
            jnp.asarray(batch.quals),
            self.params,
        )

    def map_batch(self, batch) -> list[SamRecord]:
        """Map a ReadBatch -> SAM records (host-side formatting)."""
        return self.format_batch(batch, self.dispatch(batch))

    def map_batch_all(self, batch) -> list[SamRecord]:
        """All-mapping: every above-threshold locus as primary+secondary."""
        res = align_batch_all(
            self.index, self.genome_words, self.n_genome_dev,
            jnp.asarray(batch.codes.astype(np.int32)),
            jnp.asarray(batch.lengths), jnp.asarray(batch.quals),
            self.params,
        )
        rev_ops = use_pallas_extension(self.params)
        res = jax.device_get(res)
        from nvbio_tpu.alphabet import _FROM_CODE

        table = _FROM_CODE[Alphabet.DNA_N]
        rc_table = table[[3, 2, 1, 0, 4]]
        codes_np = np.asarray(batch.codes, np.uint8)
        fwd_ascii = table[codes_np]
        rc_full = rc_table[codes_np][:, ::-1]
        q_ascii = np.asarray(batch.quals, np.uint8) + 33
        qr_ascii = q_ascii[:, ::-1]
        Lfull = fwd_ascii.shape[1]
        FLAG_SECONDARY = 0x100
        out = []
        for b, name in enumerate(batch.names):
            L = int(batch.lengths[b])
            if L == 0:
                continue
            kept = np.flatnonzero(res["keep"][b])
            if not len(kept):
                out.append(SamRecord(
                    qname=name, flag=FLAG_UNMAPPED, rname="*", pos=0,
                    mapq=0, cigar="*",
                    seq=fwd_ascii[b, :L].tobytes().decode(),
                    qual=q_ascii[b, :L].tobytes().decode()))
                continue
            # primary first
            order = sorted(kept.tolist(),
                           key=lambda c: (not res["is_best"][b, c],
                                          -int(res["scores"][b, c])))
            for rank, c in enumerate(order):
                strand = bool(res["strand"][b, c])
                gpos = int(res["window_start"][b, c]) + int(
                    res["text_start"][b, c])
                ci, local = self.contig_of(gpos)
                flag = (FLAG_REVERSE if strand else 0) | (
                    FLAG_SECONDARY if rank else 0)
                if strand:
                    seq = rc_full[b, Lfull - L:].tobytes().decode()
                    qual = qr_ascii[b, Lfull - L:].tobytes().decode()
                else:
                    seq = fwd_ascii[b, :L].tobytes().decode()
                    qual = q_ascii[b, :L].tobytes().decode()
                if rank:  # SAM convention: secondary records omit seq/qual
                    seq, qual = "*", "*"
                n_ops = int(res["n_ops"][b, c])
                cigar = (f"{n_ops}M" if res["simple"][b, c] else
                         cigar_to_string(res["ops"][b, c], n_ops,
                                         reverse=rev_ops))
                nm = int(res["nm"][b, c])
                if nm > 0:
                    from nvbio_tpu.align.traceback import md_from_entries

                    md, xm, xo, xg = md_from_entries(
                        res["ops"][b, c], n_ops, reverse=rev_ops)
                else:
                    md, xm, xo, xg = str(n_ops), 0, 0, 0
                out.append(SamRecord(
                    qname=name, flag=flag, rname=self.ref_names[ci],
                    pos=local + 1,
                    mapq=int(res["mapq"][b]) if rank == 0 else 0,
                    cigar=cigar, seq=seq, qual=qual,
                    tags={"AS": int(res["scores"][b, c]), "NM": nm,
                          "MD": md, "XM": xm, "XO": xo, "XG": xg},
                ))
        return out

    def format_batch(self, batch, res) -> list[SamRecord]:
        res_dev_ops = res["ops"]  # keep on device for lazy row fetch
        # one bulk transfer instead of a round trip per key (the remote
        # relay charges ~50ms latency per fetch)
        res = jax.device_get({k: v for k, v in res.items() if k != "ops"})
        res = {k: np.asarray(v) for k, v in res.items()}
        # the TPU fast-path traceback emits ops end->start (see
        # batch_traceback_banded_fast); reverse while formatting
        rev_ops = use_pallas_extension(self.params)

        # batch-level vectorized prep: bulk ASCII translation, contig
        # binning, and numpy->python conversion (per-record numpy scalar
        # handling dominates the naive loop at ~27us/record)
        from nvbio_tpu.alphabet import _FROM_CODE

        codes_np = np.asarray(batch.codes, np.uint8)
        fwd_ascii = _FROM_CODE[Alphabet.DNA_N][codes_np]
        rc_full = host_rc_ascii(codes_np)
        q_ascii = np.asarray(batch.quals, np.uint8) + 33
        qr_ascii = q_ascii[:, ::-1]
        lengths = np.asarray(batch.lengths).tolist()
        mapped = res["mapped"].tolist()
        strands = res["strand"].tolist()
        gpos_all = res["window_start"] + res["text_start"]
        # vectorized contig_of
        cis = (np.searchsorted(self.ref_offsets, gpos_all, side="right") - 1)
        locals_ = (gpos_all - self.ref_offsets[np.clip(cis, 0, None)]).tolist()
        cis = cis.tolist()
        gpos_all = gpos_all.tolist()
        mapqs = res["mapq"].tolist()
        scores = res["best_score"].tolist()
        nms = res["nm"].tolist()
        has2 = res["has_second"].tolist()
        second = res["second_score"].tolist()
        n_ops_l = res["n_ops"].tolist()
        pat_starts = res["pattern_start"].tolist()
        pat_ends = res["pattern_end"].tolist()
        simple = res["simple"]
        need_ops = res["mapped"] & ((res["nm"] > 0) | ~res["simple"])
        ops_of = lazy_ops_rows(need_ops, res_dev_ops)
        need_ops = need_ops.tolist()
        simple = simple.tolist()
        Lfull = fwd_ascii.shape[1]

        out = []
        for b, name in enumerate(batch.names):
            L = lengths[b]
            if L == 0:
                continue  # batch padding
            if not mapped[b]:
                out.append(
                    SamRecord(
                        qname=name, flag=FLAG_UNMAPPED, rname="*", pos=0,
                        mapq=0, cigar="*",
                        seq=fwd_ascii[b, :L].tobytes().decode(),
                        qual=q_ascii[b, :L].tobytes().decode(),
                    )
                )
                continue
            ci, local = cis[b], locals_[b]
            strand = strands[b]
            if strand:
                seq = rc_full[b, Lfull - L:].tobytes().decode()
                qual = qr_ascii[b, Lfull - L:].tobytes().decode()
            else:
                seq = fwd_ascii[b, :L].tobytes().decode()
                qual = q_ascii[b, :L].tobytes().decode()
            tags = {"AS": scores[b], "NM": nms[b]}
            if has2[b]:
                tags["XS"] = second[b]
            if need_ops[b]:
                from nvbio_tpu.align.traceback import md_from_entries

                md, xm, xo, xg = md_from_entries(
                    ops_of[b], n_ops_l[b], reverse=rev_ops)
            else:
                md, xm, xo, xg = str(n_ops_l[b]), 0, 0, 0
            tags.update(MD=md, XM=xm, XO=xo, XG=xg)
            core = (f"{n_ops_l[b]}M" if simple[b] else
                    cigar_to_string(ops_of[b], n_ops_l[b], reverse=rev_ops))
            # soft clips around the aligned pattern span (local mode; 0/L in
            # end-to-end)
            ps, pe = pat_starts[b], pat_ends[b]
            cigar = ((f"{ps}S" if ps else "") + core
                     + (f"{L - pe}S" if pe < L else ""))
            out.append(
                SamRecord(
                    qname=name,
                    flag=FLAG_REVERSE if strand else 0,
                    rname=self.ref_names[ci],
                    pos=local + 1,
                    mapq=mapqs[b],
                    cigar=cigar,
                    seq=seq,
                    qual=qual,
                    tags=tags,
                )
            )
        return out
