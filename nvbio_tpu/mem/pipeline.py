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

    chain = chain_anchors(
        aqbeg, aqend, atpos, avalid,
        max_gap=P.chain_max_gap, bandwidth=P.chain_bandwidth,
    )

    # ---- local banded extension around the best chain ------------------------
    W = P.band
    TW = L + W - 1
    # window anchored so the chain's first anchor lands on the band diagonal
    w0 = jnp.clip(chain.tbeg - chain.qbeg - P.max_dist, 0,
                  jnp.maximum(n_genome - 1, 0))
    win = packed.extract_window_aligned(genome_words, w0, TW, 2)
    wlens = jnp.clip(n_genome - w0, 0, TW).astype(jnp.int32)

    if jax.default_backend() == "tpu":
        from nvbio_tpu.align.traceback import batch_traceback_banded_fast

        tb, _nm = batch_traceback_banded_fast(
            reads2, lens2, win, wlens, P.scoring, W, local=True)
        # NOTE: fast-path ops are end->start (host formatter reverses)
    else:
        aligner = GotohAligner(LOCAL, P.scoring)
        tb = batch_traceback_banded(reads2, lens2, win, wlens, aligner, W)
    score = jnp.where(chain.valid, tb.score, neg)

    # pick the better strand per read
    s_fwd, s_rc = score[:B], score[B:]
    use_rc = s_rc > s_fwd
    best = jnp.where(use_rc, s_rc, s_fwd)

    def pick(x):
        return jnp.where(
            use_rc.reshape((B,) + (1,) * (x.ndim - 1)), x[B:], x[:B]
        )

    mapped = best >= P.min_score
    second = jnp.where(use_rc, s_fwd, s_rc)  # other strand as the rival score
    mq = jnp.clip(
        (60 * (best - jnp.maximum(second, 0))) // jnp.maximum(best, 1), 0, 60
    )

    return dict(
        mapped=mapped,
        score=best,
        strand=use_rc,
        window_start=pick(w0),
        text_start=pick(tb.text_start),
        pattern_start=pick(tb.pattern_start),
        pattern_end=pick(tb.pattern_end),
        ops=pick(tb.ops),
        n_ops=pick(tb.n_ops),
        mapq=jnp.where(mapped, mq, 0).astype(jnp.int32),
        rc_reads=rc,
        chain_valid=pick(chain.valid),
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
            strand = bool(res["strand"][b])
            gpos = int(res["window_start"][b]) + int(res["text_start"][b])
            ci = int(np.searchsorted(self.ref_offsets, gpos, side="right") - 1)
            local = gpos - int(self.ref_offsets[ci])
            # soft clips around the local alignment
            ps, pe = int(res["pattern_start"][b]), int(res["pattern_end"][b])
            core = cigar_to_string(res["ops"][b], res["n_ops"][b],
                                   reverse=rev_ops)
            cigar = (f"{ps}S" if ps else "") + core + (f"{L-pe}S" if pe < L else "")
            seq = (codes_to_string(res["rc_reads"][b, :L], Alphabet.DNA)
                   if strand else fwd_seq)
            qual = (quals_to_string(batch.quals[b, :L][::-1], L) if strand
                    else quals_to_string(batch.quals[b], L))
            out.append(SamRecord(
                qname=name, flag=FLAG_REVERSE if strand else 0,
                rname=self.ref_names[ci], pos=local + 1,
                mapq=int(res["mapq"][b]), cigar=cigar, seq=seq, qual=qual,
                tags={"AS": int(res["score"][b])},
            ))
        return out
