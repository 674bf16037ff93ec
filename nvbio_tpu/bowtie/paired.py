"""Paired-end alignment: concordant pairing + mate rescue.

Dense re-composition of nvBowtie's paired best-approx driver
(``aligner_best_approx_paired.h:275-479``): anchor/opposite mate scoring,
concordant classification within the fragment-length window, and opposite-mate
full-DP rescue — expressed as an all-pairs (C x C) score matrix per read pair
plus a wavefront rescue scan, all fixed-shape.

FR orientation: a concordant pair has mates on opposite strands with the
reverse mate downstream; fragment length = (rev mate end) - (fwd mate start)
in [minins, maxins].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from nvbio_tpu import packed
from nvbio_tpu.align.batch import batch_score_full
from nvbio_tpu.align.types import NEG_INF, SEMI_GLOBAL, GotohAligner
from nvbio_tpu.bowtie.mapq import mapq_v2_end_to_end
from nvbio_tpu.bowtie.params import MapParams
from nvbio_tpu.bowtie.pipeline import (
    finalize_best,
    n_ceil_of,
    read_candidates,
    score_min_of,
)


@functools.partial(jax.jit, static_argnames=("params",))
def align_paired_core(
    index, genome_words, n_genome,
    reads1, lens1, quals1, reads2, lens2, quals2,
    params: MapParams,
):
    """Map one dense batch of read pairs. Returns per-mate result dicts +
    pairing info."""
    P = params
    neg = jnp.int32(NEG_INF)
    B, L = reads1.shape

    c1 = read_candidates(index, genome_words, n_genome, reads1, lens1, quals1, P)
    c2 = read_candidates(index, genome_words, n_genome, reads2, lens2, quals2, P)

    score_min1 = score_min_of(c1["lens"], P)
    score_min2 = score_min_of(c2["lens"], P)

    # --n-ceil filter (see pipeline.n_ceil_of): an over-N mate can neither
    # anchor a pair nor be rescued
    n_ok1 = n_ceil_of(reads1, c1["lens"], P)
    n_ok2 = n_ceil_of(reads2, c2["lens"], P)
    s1 = jnp.where((c1["scores"] >= score_min1[:, None]) & n_ok1[:, None],
                   c1["scores"], neg)
    s2 = jnp.where((c2["scores"] >= score_min2[:, None]) & n_ok2[:, None],
                   c2["scores"], neg)
    C = s1.shape[1]

    # ---- concordance matrix (B, C, C) ---------------------------------------
    # positions may be uint32 (genomes past 2^31): the fragment-window test
    # `minins - slack <= frag <= maxins + slack` is rearranged into pure
    # additions so no intermediate goes negative
    pdt = c1["w0"].dtype
    w1 = c1["w0"][:, :, None]       # (B, C, 1)
    w2 = c2["w0"][:, None, :]       # (B, 1, C)
    st1 = c1["strand"][:, :, None]
    st2 = c2["strand"][:, None, :]
    slack = P.band
    # orientation policy (params.h:115 pe policies): case A = mate1
    # upstream (frag = end2 - w1), case B = mate2 upstream (frag = end1 - w2)
    if P.pe_policy == "fr":
        condA, condB = (~st1) & st2, st1 & (~st2)
    elif P.pe_policy == "rf":
        condA, condB = st1 & (~st2), st2 & (~st1)
    elif P.pe_policy == "ff":
        condA, condB = (~st1) & (~st2), st1 & st2
    else:
        raise ValueError(f"unknown pe_policy {P.pe_policy!r}")
    endA = w2 + c2["lens"].astype(pdt)[:, None, None]
    okA = (condA & (endA + slack >= w1 + P.minins)
           & (endA <= w1 + (P.maxins + slack)))
    endB = w1 + c1["lens"].astype(pdt)[:, None, None]
    okB = (condB & (endB + slack >= w2 + P.minins)
           & (endB <= w2 + (P.maxins + slack)))
    conc = okA | okB

    pair_scores = jnp.where(conc, s1[:, :, None] + s2[:, None, :], neg)
    flat = pair_scores.reshape(B, C * C)
    pair_idx = jnp.argmax(flat, axis=1).astype(jnp.int32)
    pair_best = jnp.take_along_axis(flat, pair_idx[:, None], axis=1)[:, 0]
    i1 = pair_idx // C
    i2 = pair_idx % C
    has_pair = pair_best > neg // 2

    # distinct-locus second-best pair (for PE mapq)
    bw1 = jnp.take_along_axis(c1["w0"], i1[:, None], axis=1)[:, 0]
    bw2 = jnp.take_along_axis(c2["w0"], i2[:, None], axis=1)[:, 0]
    tol = 2 * P.max_dist
    from nvbio_tpu.bowtie.pipeline import _absdiff, _sub_clip0

    same = (
        (_absdiff(c1["w0"][:, :, None], bw1[:, None, None]) <= tol)
        & (_absdiff(c2["w0"][:, None, :], bw2[:, None, None]) <= tol)
    )
    pair_second = jnp.max(
        jnp.where(same, neg, pair_scores).reshape(B, C * C), axis=1
    )

    # ---- SE bests (fallback + rescue anchors) --------------------------------
    se1_idx = jnp.argmax(s1, axis=1).astype(jnp.int32)
    se1_score = jnp.take_along_axis(s1, se1_idx[:, None], axis=1)[:, 0]
    se2_idx = jnp.argmax(s2, axis=1).astype(jnp.int32)
    se2_score = jnp.take_along_axis(s2, se2_idx[:, None], axis=1)[:, 0]
    se1_ok = se1_score > neg // 2
    se2_ok = se2_score > neg // 2

    # ---- mate rescue ---------------------------------------------------------
    # anchor = the mapped mate's best SE candidate; scan the fragment window
    # on the opposite strand with the full wavefront (free ends => semi-global
    # gives the best end position within the window).
    if P.mate_rescue:
        RW = P.maxins + P.band  # rescue window length (static)

        nmax = jnp.asarray(n_genome).astype(pdt)
        from nvbio_tpu.bowtie.pipeline import use_pallas_extension

        def rescue(anchor_w0, anchor_strand, anchor_len, other, other_len,
                   other_mm):
            # window side by policy: the missing mate sits downstream of an
            # "upstream-oriented" anchor. fr/ff: fwd anchors are upstream;
            # rf: reversed anchors are upstream. Unsigned-safe clip-at-0.
            upstream_window = (anchor_strand if P.pe_policy != "rf"
                               else ~anchor_strand)
            rev_end = anchor_w0 + (anchor_len + P.band).astype(pdt)
            wstart = jnp.where(
                upstream_window, _sub_clip0(rev_end, RW), anchor_w0,
            )
            wstart = jnp.minimum(wstart, _sub_clip0(nmax, 1))
            win = packed.extract_window_aligned(genome_words, wstart, RW, 2)
            wlen = jnp.minimum(_sub_clip0(nmax, wstart), RW).astype(jnp.int32)
            if use_pallas_extension(P):
                # TPU fast path (score.h:149-199 opposite-mate scoring): the
                # Myers bit-parallel kernel locates the best end position in
                # the fragment window at ~32 cells/op, then one banded Gotoh
                # pass at that locus produces the quality-aware score — no
                # (B, M+1)-per-step XLA wavefront over a 500+-wide window.
                from nvbio_tpu.align.pallas_kernels import (
                    banded_score_semiglobal_pallas,
                    myers_semiglobal_pallas,
                )

                _dist, tend = myers_semiglobal_pallas(
                    other, other_len, win, wlen)
                rw0 = _sub_clip0(wstart + tend.astype(pdt),
                                 (other_len + P.max_dist).astype(pdt))
                rw0 = jnp.minimum(rw0, _sub_clip0(nmax, 1))
                TWr = other.shape[1] + P.band - 1
                rwin = packed.extract_window_aligned(
                    genome_words, rw0, TWr, 2)
                rwlen = jnp.minimum(_sub_clip0(nmax, rw0),
                                    TWr).astype(jnp.int32)
                score, _k = banded_score_semiglobal_pallas(
                    other, other_len, rwin, rwlen, P.scoring, P.band,
                    other_mm)
                return score, rw0
            aligner = GotohAligner(SEMI_GLOBAL, P.scoring)
            sunk = batch_score_full(
                other, other_len, win, wlen, aligner, mismatch_scores=other_mm
            )
            # candidate window start for the rescued mate (banded re-align)
            rw0 = _sub_clip0(wstart + sunk.sink_text.astype(pdt),
                             (other_len + P.max_dist).astype(pdt))
            rw0 = jnp.minimum(rw0, _sub_clip0(nmax, 1))
            return sunk.score, rw0

        # rescue mate2 from mate1 anchor; the rescued mate's strand follows
        # the policy (opposite for fr/rf, same for ff)
        same_strand = P.pe_policy == "ff"
        a1_w0 = jnp.take_along_axis(c1["w0"], se1_idx[:, None], axis=1)[:, 0]
        a1_st = jnp.take_along_axis(c1["strand"], se1_idx[:, None], axis=1)[:, 0]
        m2_rev = a1_st if same_strand else ~a1_st
        other2 = jnp.where(m2_rev[:, None], c2["rc"], c2["reads"])
        omm2 = None if c2["mm"] is None else jnp.where(
            m2_rev[:, None], c2["mm_rc"], c2["mm"]
        )
        r2_score, r2_w0 = rescue(a1_w0, a1_st, c1["lens"], other2, c2["lens"], omm2)
        r2_score = jnp.where(se1_ok & (r2_score >= score_min2) & n_ok2,
                             r2_score, neg)

        # rescue mate1 from mate2 anchor
        a2_w0 = jnp.take_along_axis(c2["w0"], se2_idx[:, None], axis=1)[:, 0]
        a2_st = jnp.take_along_axis(c2["strand"], se2_idx[:, None], axis=1)[:, 0]
        m1_rev = a2_st if same_strand else ~a2_st
        other1 = jnp.where(m1_rev[:, None], c1["rc"], c1["reads"])
        omm1 = None if c1["mm"] is None else jnp.where(
            m1_rev[:, None], c1["mm_rc"], c1["mm"]
        )
        r1_score, r1_w0 = rescue(a2_w0, a2_st, c2["lens"], other1, c1["lens"], omm1)
        r1_score = jnp.where(se2_ok & (r1_score >= score_min1) & n_ok1,
                             r1_score, neg)

        resc2 = ~has_pair & se1_ok & (r2_score > neg // 2)
        resc1 = ~has_pair & se2_ok & (r1_score > neg // 2) & ~resc2

        # fold rescues into the chosen pair: append the rescued candidate by
        # overwriting slot selection (we re-gather windows in finalize anyway)
        i1 = jnp.where(resc2, se1_idx, i1)
        i2 = jnp.where(resc1, se2_idx, i2)
        pair1_w0 = jnp.where(
            resc1, r1_w0, jnp.take_along_axis(c1["w0"], i1[:, None], axis=1)[:, 0]
        )
        pair2_w0 = jnp.where(
            resc2, r2_w0, jnp.take_along_axis(c2["w0"], i2[:, None], axis=1)[:, 0]
        )
        pair1_strand = jnp.where(
            resc1, m1_rev,
            jnp.take_along_axis(c1["strand"], i1[:, None], axis=1)[:, 0],
        )
        pair2_strand = jnp.where(
            resc2, m2_rev,
            jnp.take_along_axis(c2["strand"], i2[:, None], axis=1)[:, 0],
        )
        pair1_score = jnp.where(
            resc1, r1_score, jnp.take_along_axis(s1, i1[:, None], axis=1)[:, 0]
        )
        pair2_score = jnp.where(
            resc2, r2_score, jnp.take_along_axis(s2, i2[:, None], axis=1)[:, 0]
        )
        has_pair = has_pair | resc1 | resc2
        pair_best = jnp.where(
            resc1 | resc2, pair1_score + pair2_score, pair_best
        )
    else:
        pair1_w0 = jnp.take_along_axis(c1["w0"], i1[:, None], axis=1)[:, 0]
        pair2_w0 = jnp.take_along_axis(c2["w0"], i2[:, None], axis=1)[:, 0]
        pair1_strand = jnp.take_along_axis(c1["strand"], i1[:, None], axis=1)[:, 0]
        pair2_strand = jnp.take_along_axis(c2["strand"], i2[:, None], axis=1)[:, 0]
        pair1_score = jnp.take_along_axis(s1, i1[:, None], axis=1)[:, 0]
        pair2_score = jnp.take_along_axis(s2, i2[:, None], axis=1)[:, 0]
        resc1 = resc2 = jnp.zeros((B,), bool)

    # ---- choose final per-mate alignments ------------------------------------
    # paired -> pair slots (possibly rescued); unpaired -> SE best
    fin1_w0 = jnp.where(has_pair, pair1_w0,
                        jnp.take_along_axis(c1["w0"], se1_idx[:, None], axis=1)[:, 0])
    fin2_w0 = jnp.where(has_pair, pair2_w0,
                        jnp.take_along_axis(c2["w0"], se2_idx[:, None], axis=1)[:, 0])
    fin1_st = jnp.where(has_pair, pair1_strand,
                        jnp.take_along_axis(c1["strand"], se1_idx[:, None], axis=1)[:, 0])
    fin2_st = jnp.where(has_pair, pair2_strand,
                        jnp.take_along_axis(c2["strand"], se2_idx[:, None], axis=1)[:, 0])
    fin1_score = jnp.where(has_pair, pair1_score, se1_score)
    fin2_score = jnp.where(has_pair, pair2_score, se2_score)

    # finalize via a synthetic 1-candidate view (traceback re-gathers
    # windows); pe_full_traceback switches to the full-matrix mate
    # traceback (opposite-mate full-DP, aligner_best_approx_paired.h:404)
    def fin_one(c, w0, strand):
        cands = dict(c)
        cands["w0"] = w0[:, None]
        cands["strand"] = strand[:, None]
        return finalize_best(cands, genome_words, n_genome,
                             jnp.zeros((B,), jnp.int32), P,
                             full_matrix=P.pe_full_traceback)

    fin1 = fin_one(c1, fin1_w0, fin1_st)
    fin2 = fin_one(c2, fin2_w0, fin2_st)

    mapped1 = fin1_score > neg // 2
    mapped2 = fin2_score > neg // 2

    # ---- PE mapq (pair-level scores through the V2 table) --------------------
    pair_min = score_min1 + score_min2
    mapq_pair = mapq_v2_end_to_end(
        pair_best, pair_second,
        pair_second >= pair_min, pair_min,
    )
    # unpaired mates: SE mapq against their own second-best
    same1 = (_absdiff(c1["w0"], fin1_w0[:, None]) <= tol) & (
        c1["strand"] == fin1_st[:, None])
    sec1 = jnp.max(jnp.where(same1, neg, s1), axis=1)
    same2 = (_absdiff(c2["w0"], fin2_w0[:, None]) <= tol) & (
        c2["strand"] == fin2_st[:, None])
    sec2 = jnp.max(jnp.where(same2, neg, s2), axis=1)
    mapq1_se = mapq_v2_end_to_end(fin1_score, sec1, sec1 >= score_min1, score_min1)
    mapq2_se = mapq_v2_end_to_end(fin2_score, sec2, sec2 >= score_min2, score_min2)
    mapq1 = jnp.where(has_pair, mapq_pair, jnp.where(mapped1, mapq1_se, 0))
    mapq2 = jnp.where(has_pair, mapq_pair, jnp.where(mapped2, mapq2_se, 0))

    # discordant pairs: both mates aligned uniquely, just not concordantly
    # (``aligner_best_approx_paired.h:280-286`` mark_discordant)
    if P.pe_discordant:
        unique1 = mapped1 & ~(sec1 >= score_min1)
        unique2 = mapped2 & ~(sec2 >= score_min2)
        discordant = (~has_pair) & unique1 & unique2
    else:
        discordant = jnp.zeros_like(has_pair)

    def pack_mate(fin, mapped, score, mapq, sec, smin):
        return dict(
            mapped=mapped, best_score=score, mapq=mapq,
            has_second=sec >= smin,
            strand=fin["strand"], window_start=fin["window_start"],
            text_start=fin["text_start"],
            ops=fin["ops"].astype(jnp.uint8), n_ops=fin["n_ops"],
            nm=fin["nm"], simple=fin["simple"],
        )

    return (
        pack_mate(fin1, mapped1, fin1_score, mapq1, sec1, score_min1),
        pack_mate(fin2, mapped2, fin2_score, mapq2, sec2, score_min2),
        dict(proper=has_pair, discordant=discordant,
             rescued1=resc1, rescued2=resc2, pair_score=pair_best),
    )


def map_pair_batch(mapper, batch1, batch2, stats=None):
    """Map paired ReadBatches -> interleaved SAM records (host formatting).

    ``mapper`` is a nvbio_tpu.bowtie.pipeline.ReadMapper; ``stats`` (an
    optional utils.stats.AlignmentStats) accumulates per-mate mapping stats
    plus the proper-pair count (nvBowtie's paired AlignmentStats,
    ``nvBowtie/bowtie2/cuda/stats.h:45-174``).
    """
    from nvbio_tpu.align.traceback import cigar_to_string
    from nvbio_tpu.alphabet import Alphabet, codes_to_string
    from nvbio_tpu.io.sam import (
        FLAG_FIRST_IN_PAIR,
        FLAG_MATE_REVERSE,
        FLAG_MATE_UNMAPPED,
        FLAG_PAIRED,
        FLAG_PROPER_PAIR,
        FLAG_REVERSE,
        FLAG_SECOND_IN_PAIR,
        FLAG_UNMAPPED,
        SamRecord,
        quals_to_string,
    )

    from nvbio_tpu.bowtie.pipeline import use_pallas_extension

    rev_ops = use_pallas_extension(mapper.params)
    res1, res2, pinfo = align_paired_core(
        mapper.index, mapper.genome_words, mapper.n_genome_dev,
        jnp.asarray(batch1.codes), jnp.asarray(batch1.lengths),
        jnp.asarray(batch1.quals),
        jnp.asarray(batch2.codes), jnp.asarray(batch2.lengths),
        jnp.asarray(batch2.quals),
        mapper.params,
    )
    import jax

    ops_dev = (res1["ops"], res2["ops"])
    fetch = jax.device_get((
        {k: v for k, v in res1.items() if k != "ops"},
        {k: v for k, v in res2.items() if k != "ops"},
        pinfo["proper"], pinfo["discordant"],
    ))
    res1, res2, proper, discordant = fetch
    res1 = {k: np.asarray(v) for k, v in res1.items()}
    res2 = {k: np.asarray(v) for k, v in res2.items()}
    proper = np.asarray(proper)
    discordant = np.asarray(discordant)

    from nvbio_tpu.bowtie.pipeline import host_rc_ascii, lazy_ops_rows

    if stats is not None:
        stats.update_from_result(res1, batch1.lengths)
        stats.update_from_result(res2, batch2.lengths)
        real = np.asarray(batch1.lengths) > 0
        stats.n_proper_pairs += int((proper & real).sum())
        stats.n_discordant += int((discordant & real).sum())

    need1 = res1["mapped"] & ((res1["nm"] > 0) | ~res1["simple"])
    need2 = res2["mapped"] & ((res2["nm"] > 0) | ~res2["simple"])
    ops_of = (lazy_ops_rows(need1, ops_dev[0]),
              lazy_ops_rows(need2, ops_dev[1]))
    rc_full = (host_rc_ascii(batch1.codes), host_rc_ascii(batch2.codes))
    Lfull = batch1.codes.shape[1]

    out = []
    for b, name in enumerate(batch1.names):
        if batch1.lengths[b] == 0:
            continue

        recs = []
        gpos = [0, 0]
        for m, (batch, res, first) in enumerate(
            [(batch1, res1, True), (batch2, res2, False)]
        ):
            L = int(batch.lengths[b])
            mapped = bool(res["mapped"][b])
            strand = bool(res["strand"][b]) and mapped
            flag = FLAG_PAIRED | (FLAG_FIRST_IN_PAIR if first else FLAG_SECOND_IN_PAIR)
            if proper[b]:
                flag |= FLAG_PROPER_PAIR
            if not mapped:
                flag |= FLAG_UNMAPPED
            if strand:
                flag |= FLAG_REVERSE
            if mapped:
                gpos[m] = int(res["window_start"][b]) + int(res["text_start"][b])
            if strand:
                seq = rc_full[m][b, Lfull - L:].tobytes().decode()
                qual = quals_to_string(batch.quals[b, :L][::-1], L)
            else:
                seq = codes_to_string(batch.codes[b, :L], Alphabet.DNA_N)
                qual = quals_to_string(batch.quals[b], L)
            recs.append([flag, mapped, strand, seq, qual, L, res])

        # cross-mate flags
        for m in range(2):
            o = 1 - m
            if not recs[o][1]:
                recs[m][0] |= FLAG_MATE_UNMAPPED
            elif recs[o][2]:
                recs[m][0] |= FLAG_MATE_REVERSE

        for m in range(2):
            flag, mapped, strand, seq, qual, L, res = recs[m]
            o = 1 - m
            if not mapped:
                out.append(SamRecord(
                    qname=name, flag=flag, rname="*", pos=0, mapq=0,
                    cigar="*", seq=seq, qual=qual,
                ))
                continue
            ci, local = mapper.contig_of(gpos[m])
            rnext, pnext, tlen = "*", 0, 0
            if recs[o][1]:
                co, loco = mapper.contig_of(gpos[o])
                rnext = "=" if co == ci else mapper.ref_names[co]
                pnext = loco + 1
                if co == ci:
                    # TLEN: leftmost start to rightmost end, sign by position
                    ends = [gpos[m] + L, gpos[o] + recs[o][5]]
                    left = min(gpos[m], gpos[o])
                    right = max(ends)
                    tlen = right - left
                    if gpos[m] > gpos[o] or (gpos[m] == gpos[o] and m == 1):
                        tlen = -tlen
            # YT: bowtie2 pair-class tag (CP concordant / DP discordant /
            # UP mates aligned separately)
            yt = ("CP" if proper[b] else
                  "DP" if discordant[b] else "UP")
            tags = {"AS": int(res["best_score"][b]), "NM": int(res["nm"][b]),
                    "YT": yt}
            n_ops_b = int(res["n_ops"][b])
            if int(res["nm"][b]) > 0:
                from nvbio_tpu.align.traceback import md_from_entries

                md, xm, xo, xg = md_from_entries(
                    ops_of[m][b], n_ops_b, reverse=rev_ops)
            else:
                md, xm, xo, xg = str(n_ops_b), 0, 0, 0
            tags.update(MD=md, XM=xm, XO=xo, XG=xg)
            out.append(SamRecord(
                qname=name, flag=flag, rname=mapper.ref_names[ci],
                pos=local + 1, mapq=int(res["mapq"][b]),
                cigar=(f"{int(res['n_ops'][b])}M" if res["simple"][b] else
                       cigar_to_string(ops_of[m][b], res["n_ops"][b],
                                       reverse=rev_ops)),
                seq=seq, qual=qual, rnext=rnext, pnext=pnext, tlen=tlen,
                tags=tags,
            ))
    return out


@functools.partial(jax.jit, static_argnames=("params", "max_pairs"))
def align_paired_all(
    index, genome_words, n_genome,
    reads1, lens1, quals1, reads2, lens2, quals2,
    params: MapParams, max_pairs: int = 4,
):
    """PE all-mapping: every concordant pair locus above threshold (up to
    ``max_pairs`` per read pair), the paired analogue of
    ``aligner_all.h:78-561`` — top-k over the concordance matrix + one
    flattened traceback batch per mate."""
    from nvbio_tpu.bowtie.pipeline import _absdiff, finalize_best

    P = params
    neg = jnp.int32(NEG_INF)
    B, L = reads1.shape

    c1 = read_candidates(index, genome_words, n_genome, reads1, lens1, quals1, P)
    c2 = read_candidates(index, genome_words, n_genome, reads2, lens2, quals2, P)
    score_min1 = score_min_of(c1["lens"], P)
    score_min2 = score_min_of(c2["lens"], P)
    s1 = jnp.where((c1["scores"] >= score_min1[:, None])
                   & n_ceil_of(reads1, c1["lens"], P)[:, None],
                   c1["scores"], neg)
    s2 = jnp.where((c2["scores"] >= score_min2[:, None])
                   & n_ceil_of(reads2, c2["lens"], P)[:, None],
                   c2["scores"], neg)
    C = s1.shape[1]

    pdt = c1["w0"].dtype
    w1 = c1["w0"][:, :, None]
    w2 = c2["w0"][:, None, :]
    st1 = c1["strand"][:, :, None]
    st2 = c2["strand"][:, None, :]
    slack = P.band
    if P.pe_policy == "fr":
        condA, condB = (~st1) & st2, st1 & (~st2)
    elif P.pe_policy == "rf":
        condA, condB = st1 & (~st2), st2 & (~st1)
    else:
        condA, condB = (~st1) & (~st2), st1 & st2
    endA = w2 + c2["lens"].astype(pdt)[:, None, None]
    okA = (condA & (endA + slack >= w1 + P.minins)
           & (endA <= w1 + (P.maxins + slack)))
    endB = w1 + c1["lens"].astype(pdt)[:, None, None]
    okB = (condB & (endB + slack >= w2 + P.minins)
           & (endB <= w2 + (P.maxins + slack)))
    conc = okA | okB
    pair_scores = jnp.where(conc, s1[:, :, None] + s2[:, None, :], neg)

    K = max_pairs
    top_vals, top_idx = jax.lax.top_k(pair_scores.reshape(B, C * C), K)
    i1 = (top_idx // C).astype(jnp.int32)
    i2 = (top_idx % C).astype(jnp.int32)
    pw1 = jnp.take_along_axis(c1["w0"], i1, axis=1)       # (B, K)
    pw2 = jnp.take_along_axis(c2["w0"], i2, axis=1)
    pst1 = jnp.take_along_axis(jnp.broadcast_to(c1["strand"], s1.shape), i1, axis=1)
    pst2 = jnp.take_along_axis(jnp.broadcast_to(c2["strand"], s2.shape), i2, axis=1)
    keep = top_vals > neg // 2
    # distinct-locus dedup among the K slots (top_k returns adjacent cells
    # of the same physical pair locus)
    tol = 2 * P.max_dist
    for k in range(1, K):
        samek = jnp.zeros((B,), bool)
        for j in range(k):
            samek = samek | (
                (_absdiff(pw1[:, k], pw1[:, j]) <= tol)
                & (_absdiff(pw2[:, k], pw2[:, j]) <= tol)
                & keep[:, j])
        keep = keep.at[:, k].set(keep[:, k] & ~samek)

    def fin_mates(c, w0k, stk):
        cands = dict(c)
        reads_r = jnp.repeat(c["reads"], K, axis=0)
        rc_r = jnp.repeat(c["rc"], K, axis=0)
        lens_r = jnp.repeat(c["lens"], K)
        mm_r = None if c["mm"] is None else jnp.repeat(c["mm"], K, axis=0)
        mmrc_r = None if c["mm_rc"] is None else jnp.repeat(c["mm_rc"], K, axis=0)
        cands.update(reads=reads_r, rc=rc_r, lens=lens_r, mm=mm_r,
                     mm_rc=mmrc_r,
                     w0=w0k.reshape(B * K)[:, None],
                     strand=stk.reshape(B * K)[:, None])
        fin = finalize_best(cands, genome_words, n_genome,
                            jnp.zeros((B * K,), jnp.int32), P)
        return {kk: v.reshape((B, K) + v.shape[1:]) for kk, v in fin.items()}

    fin1 = fin_mates(c1, pw1, pst1)
    fin2 = fin_mates(c2, pw2, pst2)
    mapq = mapq_v2_end_to_end(
        top_vals[:, 0], jnp.where(keep[:, 1], top_vals[:, 1], neg),
        keep[:, 1], score_min1 + score_min2)
    return dict(keep=keep, pair_score=top_vals, mapq=mapq,
                fin1=fin1, fin2=fin2)


def map_pair_batch_all(mapper, batch1, batch2, max_pairs: int = 4):
    """All-mapping PE: one primary + secondary records per extra concordant
    pair locus."""
    from nvbio_tpu.align.traceback import cigar_to_string
    from nvbio_tpu.bowtie.pipeline import host_rc_ascii, use_pallas_extension
    from nvbio_tpu.io.sam import (
        FLAG_FIRST_IN_PAIR, FLAG_MATE_REVERSE, FLAG_PAIRED, FLAG_PROPER_PAIR,
        FLAG_REVERSE, FLAG_SECOND_IN_PAIR, FLAG_UNMAPPED, SamRecord,
        quals_to_string,
    )

    FLAG_SECONDARY = 0x100
    rev_ops = use_pallas_extension(mapper.params)
    res = align_paired_all(
        mapper.index, mapper.genome_words, mapper.n_genome_dev,
        jnp.asarray(batch1.codes), jnp.asarray(batch1.lengths),
        jnp.asarray(batch1.quals),
        jnp.asarray(batch2.codes), jnp.asarray(batch2.lengths),
        jnp.asarray(batch2.quals),
        mapper.params, max_pairs=max_pairs)
    res = jax.device_get(res)
    keep = np.asarray(res["keep"])
    rc_asc = (host_rc_ascii(batch1.codes), host_rc_ascii(batch2.codes))
    Lfull = batch1.codes.shape[1]

    out = []
    for b, name in enumerate(batch1.names):
        if batch1.lengths[b] == 0:
            continue
        slots = np.flatnonzero(keep[b])
        for rank, k in enumerate(slots.tolist()):
            recs = []
            for m, (batch, fin, first) in enumerate(
                ((batch1, res["fin1"], True), (batch2, res["fin2"], False))
            ):
                L = int(batch.lengths[b])
                strand = bool(fin["strand"][b, k])
                gpos = int(fin["window_start"][b, k]) + int(
                    fin["text_start"][b, k])
                ci, local = mapper.contig_of(gpos)
                flag = (FLAG_PAIRED | FLAG_PROPER_PAIR
                        | (FLAG_FIRST_IN_PAIR if first
                           else FLAG_SECOND_IN_PAIR)
                        | (FLAG_REVERSE if strand else 0)
                        | (FLAG_SECONDARY if rank else 0))
                if rank == 0:
                    if strand:
                        seq = rc_asc[m][b, Lfull - L:].tobytes().decode()
                        qual = quals_to_string(batch.quals[b, :L][::-1], L)
                    else:
                        from nvbio_tpu.alphabet import Alphabet, codes_to_string

                        seq = codes_to_string(batch.codes[b, :L],
                                              Alphabet.DNA_N)
                        qual = quals_to_string(batch.quals[b], L)
                else:
                    seq, qual = "*", "*"
                n_ops = int(fin["n_ops"][b, k])
                cigar = (f"{n_ops}M" if fin["simple"][b, k] else
                         cigar_to_string(fin["ops"][b, k], n_ops,
                                         reverse=rev_ops))
                # per-mate NM/MD/XM/XO/XG, same surface as the SE all-mapper
                nm = int(fin["nm"][b, k])
                if nm > 0 or not fin["simple"][b, k]:
                    from nvbio_tpu.align.traceback import md_from_entries

                    md, xm, xo, xg = md_from_entries(
                        fin["ops"][b, k], n_ops, reverse=rev_ops)
                else:
                    md, xm, xo, xg = str(n_ops), 0, 0, 0
                mate_tags = {"NM": nm, "MD": md, "XM": xm, "XO": xo, "XG": xg}
                recs.append((flag, ci, local, cigar, seq, qual, strand, m,
                             mate_tags))
            for (flag, ci, local, cigar, seq, qual, strand, m, mtags) in recs:
                o = recs[1 - m]
                flag |= FLAG_MATE_REVERSE if o[6] else 0
                out.append(SamRecord(
                    qname=name, flag=flag, rname=mapper.ref_names[ci],
                    pos=local + 1,
                    mapq=int(res["mapq"][b]) if rank == 0 else 0,
                    cigar=cigar, seq=seq, qual=qual,
                    rnext="=", pnext=o[2] + 1,
                    tags={"AS": int(res["pair_score"][b, k]), "YT": "CP",
                          **mtags},
                ))
        if not len(slots):
            for batch, first in ((batch1, True), (batch2, False)):
                L = int(batch.lengths[b])
                from nvbio_tpu.alphabet import Alphabet, codes_to_string

                out.append(SamRecord(
                    qname=name,
                    flag=FLAG_PAIRED | FLAG_UNMAPPED
                    | (FLAG_FIRST_IN_PAIR if first else FLAG_SECOND_IN_PAIR),
                    rname="*", pos=0, mapq=0, cigar="*",
                    seq=codes_to_string(batch.codes[b, :L], Alphabet.DNA_N),
                    qual=quals_to_string(batch.quals[b], L),
                ))
    return out
