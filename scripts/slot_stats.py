"""Where does the winning candidate rank among the dedup slots?

The extension kernel scores C = 2*NCH evidence-ranked slots per read
(70 ms of the 134 ms candidates stage at B=32k). If the eventual best
alignment almost always sits in the top few slots, NCH can shrink and
extension cost drops proportionally. Measures, on uniform and
repeat-rich 100 Mbp genomes: the rank distribution of the argmax slot
within its strand half, and sensitivity (best_pos near true start) as a
function of a hypothetical slot cap. Writes SLOT_STATS.json.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "SLOT_STATS.json")


def main():
    import jax
    import jax.numpy as jnp

    from nvbio_tpu import packed
    from nvbio_tpu.bowtie.params import MapParams
    from nvbio_tpu.bowtie.pipeline import read_candidates, score_min_of
    from nvbio_tpu.qgram import build_qgram_index
    from nvbio_tpu.utils.simgenome import repeat_rich_genome, sample_reads

    G = int(os.environ.get("GENOME_BP", 100_000_000))
    B = int(os.environ.get("BATCH", 32768))
    L = 100
    params = MapParams(max_read_len=L, seed_len=22, seed_stride=15,
                       hits_per_seed=6)
    NCH = min(params.hits_per_seed * 2, params.seeds_per_strand
              * params.hits_per_seed)
    out = {"genome_bp": G, "batch": B, "NCH": NCH}

    @functools.partial(jax.jit, static_argnames=())
    def run(idx, gwords, n, reads, lens, quals):
        c = read_candidates(idx, gwords, n, reads, lens, quals, params)
        return c["scores"], c["w0"], c["valid"]

    rng = np.random.default_rng(11)
    for kind in ("uniform", "repeat40"):
        if kind == "uniform":
            genome = rng.integers(0, 4, size=G, dtype=np.uint8)
        else:
            genome = repeat_rich_genome(G, seed=0xD1CE, repeat_frac=0.40)
        idx = build_qgram_index(genome, params.qgram_q).device()
        gwords = jnp.asarray(packed.pack(genome, 2))
        reads, starts, rcflags = sample_reads(genome, B, L, seed=5,
                                              subst_rate=0.01)
        lens_np = np.full(B, L, np.int32)
        quals = np.full((B, L), 30, np.uint8)
        sc, w0, valid = run(idx, gwords, jnp.int32(G), jnp.asarray(reads),
                            jnp.asarray(lens_np), jnp.asarray(quals))
        sc = np.asarray(sc)
        w0 = np.asarray(w0).astype(np.int64)
        valid = np.asarray(valid)

        sm = int(np.asarray(score_min_of(jnp.asarray(lens_np), params))[0])
        C = sc.shape[1]
        best = sc.argmax(axis=1)
        rank_in_half = np.where(best < C // 2, best, best - C // 2)
        mapped = sc.max(axis=1) >= sm
        out[f"{kind}_mapped_frac"] = round(float(mapped.mean()), 4)
        hist = np.bincount(rank_in_half[mapped], minlength=C // 2)
        out[f"{kind}_best_rank_hist"] = hist.tolist()

        # sensitivity vs slot cap: does any slot with rank < cap (in its
        # half) land within tol of the true origin with a passing score?
        tol = 2 * params.max_dist + 8
        true_w0 = starts.astype(np.int64)
        near = (np.abs(w0 - true_w0[:, None]) <= tol) & valid & (sc >= sm)
        ranks = np.concatenate([np.arange(C // 2), np.arange(C // 2)])
        for cap in (2, 3, 4, 6, 8, 12):
            hit = (near & (ranks[None, :] < cap)).any(axis=1)
            out[f"{kind}_sens_cap{cap}"] = round(float(hit.mean()), 4)
        with open(OUT, "w") as f:
            json.dump(out, f, indent=1)
        print(kind, "done", flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
