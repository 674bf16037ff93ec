"""Human-genome-scale capability demo: index + map a 3.1 Gbp synthetic genome.

The north-star input (SRR493095 vs Human.NCBI36, ~3.1 Gbp) exceeds int32
positions; this drives the uint32 + blocked-builder path end-to-end at full
scale on the CPU backend (the position table alone is ~12.4 GB — on TPU pods
it is served range-sharded over the mesh, see parallel/sharded_index.py).
Reference capability: whole-human BWT/index in minutes
(nvbio/sufsort/sufsort.h:45-60, nvBowtie/nvBowtie.cpp:491-536).

Run:  python scripts/human_scale.py  (from the repo root; ~30-60 min, ~40 GB RAM)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    import jax.numpy as jnp

    from nvbio_tpu import packed
    from nvbio_tpu.bowtie.params import MapParams
    from nvbio_tpu.bowtie.pipeline import align_batch_core
    from nvbio_tpu.qgram import build_qgram_index_large

    N = 3_100_000_000
    Q = 14
    L = 100
    B = 512

    t0 = time.time()
    rng = np.random.default_rng(2026)
    # generate in chunks to bound temp memory
    genome = np.empty(N, np.uint8)
    for s in range(0, N, 1 << 28):
        e = min(s + (1 << 28), N)
        genome[s:e] = rng.integers(0, 4, size=e - s, dtype=np.uint8)
    print(f"[{time.time()-t0:7.1f}s] genome synthesized: {N:,} bp", flush=True)

    cache = "/tmp/human_scale_idx.npz"
    if os.path.exists(cache):
        from nvbio_tpu.qgram import QGramIndex

        idx = QGramIndex.load(cache)
        print(f"[{time.time()-t0:7.1f}s] index loaded from cache", flush=True)
    else:
        idx = build_qgram_index_large(genome, Q, verbose=True)
        np.savez(cache, q=idx.q, offsets=np.asarray(idx.offsets),
                 positions=np.asarray(idx.positions), n=idx.n)
        print(f"[{time.time()-t0:7.1f}s] index cached to {cache}", flush=True)
    assert idx.positions.dtype == np.uint32, idx.positions.dtype
    print(f"[{time.time()-t0:7.1f}s] q-gram index built: q={Q}, "
          f"{idx.positions.nbytes/2**30:.1f} GiB positions (uint32), "
          f"{idx.offsets.nbytes/2**30:.2f} GiB offsets", flush=True)

    gwords = packed.pack(genome, 2)
    print(f"[{time.time()-t0:7.1f}s] packed genome: "
          f"{gwords.nbytes/2**30:.2f} GiB", flush=True)

    params = MapParams(max_read_len=L, seed_len=22, seed_stride=15,
                       hits_per_seed=6, max_dist=8, qgram_q=Q, max_reseed=1)

    # sample reads with ~1% error across the whole coordinate range
    r = np.random.default_rng(7)
    starts = r.integers(0, N - L, size=B, dtype=np.int64)
    reads = np.empty((B, L), np.int32)
    for i, s in enumerate(starts.tolist()):
        reads[i] = genome[s:s + L]
    mutp = r.integers(0, L, size=(B, 1))
    np.put_along_axis(reads, mutp,
                      (np.take_along_axis(reads, mutp, 1) + 1) % 4, 1)
    rc_mask = r.random(B) < 0.5
    reads = np.where(rc_mask[:, None], (3 - reads)[:, ::-1], reads)
    lens = np.full(B, L, np.int32)
    quals = np.full((B, L), 30, np.uint8)

    dev_idx = idx.device()
    dev_words = jnp.asarray(gwords)
    n_dev = jnp.asarray(N, jnp.uint32)
    print(f"[{time.time()-t0:7.1f}s] compiling + mapping {B} reads...",
          flush=True)
    res = align_batch_core(dev_idx, dev_words, n_dev, jnp.asarray(reads),
                           jnp.asarray(lens), jnp.asarray(quals), params)
    mapped = np.asarray(res["mapped"])
    gpos = (np.asarray(res["window_start"]).astype(np.int64)
            + np.asarray(res["text_start"]))
    ok = mapped & (np.abs(gpos - starts) <= params.max_dist)
    far = int((starts > 2**31).sum())
    ok_far = int((ok & (starts > 2**31)).sum())
    print(f"[{time.time()-t0:7.1f}s] mapped {int(mapped.sum())}/{B}, "
          f"truth-correct {int(ok.sum())}/{B}; "
          f"past-2^31 reads correct {ok_far}/{far}", flush=True)
    assert ok.sum() >= 0.9 * B, "human-scale mapping accuracy regressed"
    assert ok_far >= 0.9 * far, "positions past 2^31 mis-handled"
    print("HUMAN-SCALE DEMO OK", flush=True)


if __name__ == "__main__":
    main()
