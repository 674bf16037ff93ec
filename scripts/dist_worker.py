"""One process of a REAL multi-process SPMD map run (the multi-host path).

Launch N of these (same coordinator, distinct process ids); each owns
``--local-devices`` CPU devices of one global mesh. Every process:

1. initializes into the shared runtime (``parallel.dist.init_distributed``),
2. builds the identical reference + q-gram index and replicates it over the
   GLOBAL mesh (``place_replicated``),
3. contributes its own rows of every global read batch
   (``global_batch`` — per-host input striping: no host ever sees another
   host's reads; only collectives cross the process boundary),
4. runs the SAME jitted SPMD align step (stats psum across all devices of
   all processes),
5. formats its local result rows (``local_rows``) into its own SAM shard
   (``shard_path``), and
6. process 0 merges the shards (``merge_sam_shards``) and verifies every
   read landed at its sampled genome position.

This is the TPU-native counterpart of the reference's multi-GPU scaling
unit — per-GPU ComputeThreads with host-merged stats and output
(``/root/reference/nvBowtie/nvBowtie.cpp:644-699``,
``compute_thread.cu:95-112``) — lifted to a multi-host runtime the
reference never had (SURVEY §2.5 #10). Exercised by
``tests/test_distributed.py`` over 2 processes x 2 CPU devices.

Usage: dist_worker.py PID NPROC COORD_ADDR OUTDIR [GLOBAL_BATCH]
"""

from __future__ import annotations

import json
import os
import sys


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    coord = sys.argv[3]
    outdir = sys.argv[4]
    batch = int(sys.argv[5]) if len(sys.argv) > 5 else 64

    # exactly 2 fake CPU devices per process (conftest pattern: flags before
    # the first jax import; JAX_PLATFORMS=cpu + clean PYTHONPATH come from
    # the launcher env)
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ.setdefault("JAX_CPU_COLLECTIVES_IMPLEMENTATION", "gloo")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from nvbio_tpu import packed
    from nvbio_tpu.bowtie.params import MapParams
    from nvbio_tpu.bowtie.pipeline import ReadMapper
    from nvbio_tpu.io.fastq import ReadBatch
    from nvbio_tpu.io.sam import SamWriter
    from nvbio_tpu.parallel.dist import (
        global_batch,
        global_reads_mesh,
        init_distributed,
        local_rows,
        merge_sam_shards,
        place_replicated,
        shard_path,
    )
    from nvbio_tpu.parallel.mesh import sharded_align_step
    from nvbio_tpu.qgram import build_qgram_index

    assert init_distributed(coord, nproc, pid), "coordinator not configured"
    assert jax.process_count() == nproc, jax.process_count()
    n_dev = jax.device_count()
    assert batch % n_dev == 0, (batch, n_dev)

    # identical deterministic problem on every host
    rng = np.random.default_rng(0)
    genome_len = 20_000
    read_len = 36
    genome = rng.integers(0, 4, size=genome_len, dtype=np.uint8)
    params = MapParams(
        max_read_len=read_len, seed_len=16, seed_stride=10,
        hits_per_seed=2, max_dist=3, qgram_q=10,
    )
    index = build_qgram_index(genome, params.qgram_q)

    rrng = np.random.default_rng(7)
    starts = rrng.integers(0, genome_len - read_len, size=batch)
    reads_all = np.stack(
        [genome[s:s + read_len] for s in starts]).astype(np.int32)
    lens_all = np.full(batch, read_len, np.int32)
    quals_all = np.full((batch, read_len), 30, np.uint8)

    mesh = global_reads_mesh()
    step = sharded_align_step(mesh, params)

    fmi_g = place_replicated(mesh, index.device())
    gwords_g = place_replicated(mesh, jnp.asarray(packed.pack(genome, 2)))
    n_g = place_replicated(mesh, jnp.int32(genome_len))

    # per-host input striping: this host uploads ONLY its slice
    rows = batch // nproc
    sl = slice(pid * rows, (pid + 1) * rows)
    reads_g = global_batch(mesh, reads_all[sl])
    lens_g = global_batch(mesh, lens_all[sl])
    quals_g = global_batch(mesh, quals_all[sl])

    res, stats = step(fmi_g, gwords_g, n_g, reads_g, lens_g, quals_g)
    jax.block_until_ready(stats)
    n_mapped = int(np.asarray(stats["n_mapped"]))
    assert int(np.asarray(stats["n_reads"])) == batch, stats
    assert n_mapped == batch, f"{n_mapped}/{batch} mapped"

    # host-side formatting of this process's rows -> its own SAM shard
    mapper = ReadMapper(
        index=fmi_g, genome_words=gwords_g, n_genome=genome_len,
        ref_names=["ref"], ref_offsets=np.zeros(1, np.int64), params=params)
    res_local = local_rows(res)
    local_batch = ReadBatch(
        names=[f"r{i}" for i in range(sl.start, sl.stop)],
        codes=reads_all[sl].astype(np.uint8),
        quals=quals_all[sl], lengths=lens_all[sl])
    recs = mapper.format_batch(local_batch, res_local)
    spath = shard_path(os.path.join(outdir, "out.sam"))
    w = SamWriter(spath, ["ref"], [genome_len])
    for r in recs:
        w.write(r)
    w.close()

    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("sam_shards_written")

    if pid == 0:
        merged = os.path.join(outdir, "out.sam")
        n_rec = merge_sam_shards(
            [shard_path(merged, p) for p in range(nproc)], merged)
        assert n_rec == batch, (n_rec, batch)
        # every exact read must align at its sampled position, forward
        got = {}
        with open(merged) as f:
            for line in f:
                if line.startswith("@"):
                    continue
                fld = line.split("\t")
                got[fld[0]] = (int(fld[1]), int(fld[3]))
        bad = [i for i in range(batch)
               if got[f"r{i}"] != (0, int(starts[i]) + 1)]
        assert not bad, f"misplaced reads: {bad[:5]}"
        with open(os.path.join(outdir, "DIST.json"), "w") as f:
            json.dump({
                "processes": nproc, "devices": n_dev, "batch": batch,
                "n_mapped": n_mapped, "records": n_rec, "verified": True,
            }, f)
    multihost_utils.sync_global_devices("merge_done")
    print(f"[{pid}] DISTRIBUTED_OK mapped={n_mapped}/{batch} "
          f"procs={nproc} devs={n_dev}", flush=True)


if __name__ == "__main__":
    main()
