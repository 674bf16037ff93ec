"""Human-genome-scale capability demo: index + map a 3.1 Gbp synthetic
genome THROUGH THE MULTI-CHIP DESIGN.

The north-star input (SRR493095 vs Human.NCBI36, ~3.1 Gbp) exceeds int32
positions and one chip's comfortable HBM. This drives the designed answer
end-to-end at full scale: the genome is sliced into 8 shards, each slice
gets its own FM-index (native SA-IS + occ + sampled SA — all int32
locally), and mapping runs through ``shard_map`` over an 8-device mesh with
all_gather'd queries, per-slice backward search, and all_to_all answer
routing — global positions in uint32 (``fmi/sharded.py``). On a real pod
slice the same program serves each shard from its own chip's HBM.

Reference capability matched: whole-human indexing + alignment
(``nvbio/sufsort/sufsort.h:45-60``, ``nvBowtie/nvBowtie.cpp:491-536``).

Run:  python scripts/human_scale.py   (~30-50 min, ~25 GB RAM, CPU mesh)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8")
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    import jax.numpy as jnp

    from nvbio_tpu import packed
    from nvbio_tpu.bowtie.params import MapParams
    from nvbio_tpu.fmi.sharded import place_sharded_fmindex, shard_fmindex
    from nvbio_tpu.parallel.mesh import (
        make_reads_mesh, replicate, shard_batch, sharded_align_step,
    )

    N = 3_100_000_000
    D = 8
    L = 100
    B = 1024

    t0 = time.time()

    def log(msg):
        print(f"[{time.time()-t0:7.1f}s] {msg}", flush=True)

    rng = np.random.default_rng(2026)
    genome = np.empty(N, np.uint8)
    for s in range(0, N, 1 << 28):
        e = min(s + (1 << 28), N)
        genome[s:e] = rng.integers(0, 4, size=e - s, dtype=np.uint8)
    log(f"genome synthesized: {N:,} bp")

    sidx = shard_fmindex(genome, D, overlap=2 * L)
    log(f"sharded FM-index built: {D} slices x "
        f"{sidx.slice_len + sidx.overlap:,} bp "
        f"({sidx.bwt_words.nbytes/2**30:.2f} GiB BWT, "
        f"{sidx.occ.nbytes/2**30:.2f} GiB occ, "
        f"{sidx.ssa_vals.nbytes/2**30:.2f} GiB SSA)")

    gwords = packed.pack(genome, 2)
    log(f"packed genome: {gwords.nbytes/2**30:.2f} GiB")

    mesh = make_reads_mesh(D)
    sidx = place_sharded_fmindex(mesh, sidx)
    # FULL sensitivity machinery at human scale: multi-pass reseeding with
    # 1-mismatch mutated-seed searches served by the sharded index
    # (sharded_fmi_seed_hits_1mm) — same config as the single-chip default
    params = MapParams(max_read_len=L, seed_len=22, seed_stride=15,
                       hits_per_seed=6, max_dist=8, seeding="fmi",
                       max_reseed=1, reseed_frac=0.125)
    step = sharded_align_step(mesh, params, index_sharded=True)

    r = np.random.default_rng(7)
    starts = r.integers(0, N - L, size=B, dtype=np.int64)
    # force coverage of the >2^31 coordinate range and slice seams
    starts[:64] = r.integers(2**31, N - L, size=64)
    starts[64:80] = [min((d + 1) * sidx.slice_len - L // 2, N - L)
                     for d in (list(range(D - 1)) * 3)[:16]]
    reads = np.empty((B, L), np.int32)
    for i, s in enumerate(starts.tolist()):
        reads[i] = genome[s:s + L]
    mutp = r.integers(0, L, size=(B, 1))
    np.put_along_axis(reads, mutp,
                      (np.take_along_axis(reads, mutp, 1) + 1) % 4, 1)
    rc_mask = r.random(B) < 0.5
    reads = np.where(rc_mask[:, None], (3 - reads)[:, ::-1], reads)

    log(f"mapping {B} reads over the {D}-device mesh (compiling)...")
    res, stats = step(
        sidx, replicate(mesh, jnp.asarray(gwords)),
        jnp.asarray(N, jnp.uint32),
        shard_batch(mesh, jnp.asarray(reads)),
        shard_batch(mesh, jnp.asarray(np.full(B, L, np.int32))),
        shard_batch(mesh, jnp.asarray(np.full((B, L), 30, np.uint8))))
    mapped = np.asarray(res["mapped"])
    gpos = (np.asarray(res["window_start"]).astype(np.int64)
            + np.asarray(res["text_start"]))
    ok = mapped & (np.abs(gpos - starts) <= params.max_dist)
    far = starts > 2**31
    log(f"mapped {int(mapped.sum())}/{B}, truth-correct {int(ok.sum())}/{B}; "
        f"past-2^31 reads correct {int(ok[far].sum())}/{int(far.sum())}; "
        f"psum'd mesh stats: {int(stats['n_mapped'])} mapped")
    assert ok.sum() >= 0.9 * B, "human-scale mapping accuracy regressed"
    assert ok[far].sum() >= 0.9 * far.sum(), "positions past 2^31 mis-handled"
    log("HUMAN-SCALE DEMO OK (3.1 Gbp, sharded FM over 8-device mesh)")


if __name__ == "__main__":
    main()
