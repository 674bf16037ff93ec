"""MEM mapping pipeline: SMEM -> chain -> local extension -> soft-clipped SAM.

The nvmem call stack (``nvmem/nvmem.cu:46-150``): mem_search -> mem_locate ->
build_chains -> filter_chains -> banded local Gotoh extension. Here every
stage is a dense batched transform; both strands are folded into the batch
dimension.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from nvbio_tpu import packed
from nvbio_tpu.align.traceback import batch_traceback_banded, cigar_to_string
from nvbio_tpu.align.types import LOCAL, NEG_INF, GotohAligner, GotohScoring
from nvbio_tpu.fmi.mem import find_smems_batch
from nvbio_tpu.mem.chain import chain_anchors
from nvbio_tpu.io.sam import FLAG_REVERSE, FLAG_UNMAPPED, SamRecord, quals_to_string
from nvbio_tpu.alphabet import Alphabet, codes_to_string


@dataclasses.dataclass(frozen=True)
class MemParams:
    max_read_len: int = 256
    min_seed_len: int = 19          # bwa-mem -k
    max_smems: int = 16
    hits_per_smem: int = 4
    max_dist: int = 16              # extension band radius
    # bwa-mem scoring: A=1 B=4 O=6 E=1 (gap_open includes first extension)
    scoring: GotohScoring = GotohScoring(
        match=1, mismatch=-4,
        pattern_gap_open=-7, pattern_gap_ext=-1,
        text_gap_open=-7, text_gap_ext=-1,
    )
    chain_max_gap: int = 1000
    chain_bandwidth: int = 100
    min_score: int = 30             # bwa-mem -T
    max_chains: int = 2             # chains kept/extended per strand
                                    # (nvmem per-read chain lists,
                                    # nvmem/pipeline.h:107-147)

    @property
    def band(self) -> int:
        return 2 * self.max_dist + 1


@functools.partial(jax.jit, static_argnames=("params",))
def mem_align_core(fmi_rev, genome_words, n_genome, reads, lens, params: MemParams):
    """Best local alignment per read via the MEM pipeline. Both strands."""
    P = params
    B, L = reads.shape
    reads = reads.astype(jnp.int32)
    lens = jnp.asarray(lens, jnp.int32)
    neg = jnp.int32(NEG_INF)

    # fold strands into the batch: rows [0, B) fwd, [B, 2B) rc
    # packed-domain reversal (see bowtie/pipeline.py): avoids per-lane gathers
    rc = 3 - packed.reverse_rows(reads, lens, 2)
    reads2 = jnp.concatenate([reads, rc], axis=0)
    lens2 = jnp.concatenate([lens, lens], axis=0)

    sm = find_smems_batch(
        fmi_rev, reads2, lens2, P.min_seed_len, P.max_smems, P.hits_per_smem
    )

    # flatten (S, H) anchor grid per row
    S, H = P.max_smems, P.hits_per_smem
    A = S * H
    aqbeg = jnp.repeat(sm.qbeg[:, :, None], H, axis=2).reshape(2 * B, A)
    aqend = jnp.repeat(sm.qend[:, :, None], H, axis=2).reshape(2 * B, A)
    atpos = sm.tpos.reshape(2 * B, A)
    avalid = sm.hit_valid.reshape(2 * B, A)

    from nvbio_tpu.mem.chain import chain_anchors_topk

    K = P.max_chains
    ch = chain_anchors_topk(
        aqbeg, aqend, atpos, avalid, K,
        max_gap=P.chain_max_gap, bandwidth=P.chain_bandwidth,
    )  # fields (2B, K)

    # ---- local banded extension around EVERY kept chain ----------------------
    # (the reference's repeated align() passes over the chain list,
    # nvmem/nvmem.cu:128-149) — flattened into one (2B*K) traceback batch
    W = P.band
    TW = L + W - 1
    w0 = jnp.clip(ch.tbeg - ch.qbeg - P.max_dist, 0,
                  jnp.maximum(n_genome - 1, 0))      # (2B, K)
    w0f = w0.reshape(2 * B * K)
    win = packed.extract_window_aligned(genome_words, w0f, TW, 2)
    wlens = jnp.clip(n_genome - w0f, 0, TW).astype(jnp.int32)
    reads_f = jnp.repeat(reads2, K, axis=0)
    lens_f = jnp.repeat(lens2, K)

    if jax.default_backend() == "tpu":
        from nvbio_tpu.align.traceback import batch_traceback_banded_fast

        tb, _nm = batch_traceback_banded_fast(
            reads_f, lens_f, win, wlens, P.scoring, W, local=True)
        # NOTE: fast-path ops are end->start (host formatter reverses)
    else:
        aligner = GotohAligner(LOCAL, P.scoring)
        tb = batch_traceback_banded(reads_f, lens_f, win, wlens, aligner, W)
    score = jnp.where(ch.valid.reshape(-1), tb.score, neg)   # (2B*K)

    # combine strands: per read, 2K candidates (fwd K then rc K)
    def fold(x):
        x = x.reshape(2 * B, K)
        return jnp.concatenate([x[:B], x[B:]], axis=1)       # (B, 2K)

    cscore = fold(score)
    cw0 = fold(w0f)
    ctext_start = fold(tb.text_start)
    cpat_start = fold(tb.pattern_start)
    cpat_end = fold(tb.pattern_end)
    cn_ops = fold(tb.n_ops)
    cops = tb.ops.reshape(2 * B, K, -1)
    cops = jnp.concatenate([cops[:B], cops[B:]], axis=1)     # (B, 2K, MAXS)
    cstrand = jnp.arange(2 * K, dtype=jnp.int32)[None, :] >= K
    cmapped = cscore >= P.min_score

    best_idx = jnp.argmax(cscore, axis=1).astype(jnp.int32)
    best = jnp.take_along_axis(cscore, best_idx[:, None], axis=1)[:, 0]
    is_best = jnp.arange(2 * K, dtype=jnp.int32)[None, :] == best_idx[:, None]
    second = jnp.max(jnp.where(is_best, neg, cscore), axis=1)
    mapped = best >= P.min_score
    mq = jnp.clip(
        (60 * (best - jnp.maximum(second, 0))) // jnp.maximum(best, 1), 0, 60
    )

    return dict(
        mapped=mapped,
        is_best=is_best,
        cand_mapped=cmapped,
        score=cscore,
        strand=jnp.broadcast_to(cstrand, (B, 2 * K)),
        window_start=cw0,
        text_start=ctext_start,
        pattern_start=cpat_start,
        pattern_end=cpat_end,
        ops=cops,
        n_ops=cn_ops,
        mapq=jnp.where(mapped, mq, 0).astype(jnp.int32),
        rc_reads=rc,
    )


@dataclasses.dataclass
class MemMapper:
    fmi_rev: object
    genome_words: object
    n_genome: int
    ref_names: list
    ref_offsets: np.ndarray
    params: MemParams

    @classmethod
    def build(cls, reference, params: MemParams = MemParams()):
        from nvbio_tpu.fmi.index import build_fmindex

        fmi_rev = build_fmindex(reference.codes[::-1].copy())
        return cls(
            fmi_rev=fmi_rev.device(),
            genome_words=jnp.asarray(reference.packed_words()),
            n_genome=reference.total_length,
            ref_names=reference.names,
            ref_offsets=reference.offsets,
            params=params,
        )

    def map_batch(self, batch) -> list[SamRecord]:
        res = mem_align_core(
            self.fmi_rev, self.genome_words, jnp.int32(self.n_genome),
            jnp.asarray(batch.codes), jnp.asarray(batch.lengths), self.params,
        )
        res = {k: np.asarray(v) for k, v in res.items()}
        # the TPU fast-path local traceback emits ops end->start
        rev_ops = jax.default_backend() == "tpu"
        FLAG_SECONDARY = 0x100
        out = []
        for b, name in enumerate(batch.names):
            if batch.lengths[b] == 0:
                continue
            L = int(batch.lengths[b])
            fwd_seq = codes_to_string(batch.codes[b, :L], Alphabet.DNA)
            if not res["mapped"][b]:
                out.append(SamRecord(
                    qname=name, flag=FLAG_UNMAPPED, rname="*", pos=0, mapq=0,
                    cigar="*", seq=fwd_seq,
                    qual=quals_to_string(batch.quals[b], L),
                ))
                continue

            def fields(c):
                strand = bool(res["strand"][b, c])
                gpos = int(res["window_start"][b, c]) + int(
                    res["text_start"][b, c])
                ci = int(np.searchsorted(self.ref_offsets, gpos,
                                         side="right") - 1)
                local = gpos - int(self.ref_offsets[ci])
                ps = int(res["pattern_start"][b, c])
                pe = int(res["pattern_end"][b, c])
                core = cigar_to_string(res["ops"][b, c], res["n_ops"][b, c],
                                       reverse=rev_ops)
                cigar = ((f"{ps}S" if ps else "") + core
                         + (f"{L - pe}S" if pe < L else ""))
                return strand, ci, local, cigar

            # primary first, then other above-threshold chains as
            # secondaries (repeat-region loci, nvmem multi-alignment output)
            cands = np.flatnonzero(res["cand_mapped"][b])
            prim = int(np.flatnonzero(res["is_best"][b])[0])
            order = [prim] + sorted(
                (c for c in cands.tolist() if c != prim),
                key=lambda c: -int(res["score"][b, c]))
            xa = []
            for rank, c in enumerate(order[1:], 1):
                strand, ci, local, cigar = fields(c)
                xa.append(f"{self.ref_names[ci]},"
                          f"{'-' if strand else '+'}{local + 1},{cigar},0")
            for rank, c in enumerate(order):
                strand, ci, local, cigar = fields(c)
                if rank == 0:
                    seq = (codes_to_string(res["rc_reads"][b, :L],
                                           Alphabet.DNA)
                           if strand else fwd_seq)
                    qual = (quals_to_string(batch.quals[b, :L][::-1], L)
                            if strand else quals_to_string(batch.quals[b], L))
                else:  # SAM: secondary records omit seq/qual
                    seq, qual = "*", "*"
                tags = {"AS": int(res["score"][b, c])}
                if rank == 0 and xa:
                    tags["XA"] = ";".join(xa) + ";"
                out.append(SamRecord(
                    qname=name,
                    flag=(FLAG_REVERSE if strand else 0)
                    | (FLAG_SECONDARY if rank else 0),
                    rname=self.ref_names[ci], pos=local + 1,
                    mapq=int(res["mapq"][b]) if rank == 0 else 0,
                    cigar=cigar, seq=seq, qual=qual, tags=tags,
                ))
        return out
