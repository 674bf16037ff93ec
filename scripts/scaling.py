"""Weak-scaling harness: SPMD step time vs mesh size, fixed per-device batch.

Writes SCALING.json at the repo root: serialized step times on the virtual
CPU mesh (1 physical core serves all D virtual devices) plus the estimated
parallel efficiency

    E(D) = D * t(1) / t_serial(D)

— on real parallel chips the D per-device programs run concurrently, so
t_serial(D)/D estimates the real per-step time and E(D) isolates exactly
what weak scaling measures: added collective/SPMD work per device as the
mesh grows (the replicated-index step's only collective is the stats psum;
the sharded-index step additionally all_gathers queries and all_to_alls
answers over ICI). BASELINE.md's bar is >=80% efficiency 1 -> N.

The reference has no cross-node path at all (one ComputeThread per GPU,
host-merged stats, ``nvBowtie/nvBowtie.cpp:644-699``); this harness is the
measurement half of the ``jax.distributed`` scaffolding in
``nvbio_tpu/parallel/dist.py``.

Run:  python scripts/scaling.py   (CPU, ~10 min: 4 mesh sizes x 2 paths)
"""

import json
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
    from nvbio_tpu.parallel.mesh import (
        make_reads_mesh, replicate, shard_batch, sharded_align_step,
    )
    from nvbio_tpu.parallel.sharded_index import (
        place_sharded_index, shard_qgram_index,
    )
    from nvbio_tpu.qgram import build_qgram_index

    GENOME = 1_000_000
    PER_DEV_B = 128
    L = 100
    REPS = 3
    rng = np.random.default_rng(0xC0FFEE)
    genome = rng.integers(0, 4, size=GENOME, dtype=np.uint8)
    params = MapParams(max_read_len=L, seed_len=22, seed_stride=15,
                       hits_per_seed=4, max_dist=8)
    host_idx = build_qgram_index(genome, params.qgram_q)
    gwords = packed.pack(genome, 2)

    def make_batch(B, seed):
        r = np.random.default_rng(seed)
        starts = r.integers(0, GENOME - L, size=B)
        reads = genome[starts[:, None] + np.arange(L)].astype(np.int32)
        pos = r.integers(0, L, size=(B, 1))
        np.put_along_axis(
            reads, pos, (np.take_along_axis(reads, pos, 1) + 1) % 4, 1)
        return (reads, np.full(B, L, np.int32),
                np.full((B, L), 30, np.uint8))

    results = {"per_device_batch": PER_DEV_B, "read_len": L,
               "genome_bp": GENOME, "reps": REPS,
               "methodology": (
                   "virtual CPU mesh, 1 physical core serves all D virtual "
                   "devices; t_serial(D) is one SPMD step with batch "
                   "D*per_device_batch; E(D) = D*t(1)/t_serial(D) estimates "
                   "real-parallel weak-scaling efficiency (collective + "
                   "SPMD overhead only)"),
               "series": {}}

    for name, index_sharded in (("replicated_index", False),
                                ("sharded_index", True)):
        times = {}
        for D in (1, 2, 4, 8):
            mesh = make_reads_mesh(D)
            if index_sharded:
                idx = place_sharded_index(
                    mesh, shard_qgram_index(host_idx, D))
            else:
                idx = replicate(mesh, host_idx.device())
            gw = replicate(mesh, jnp.asarray(gwords))
            step = sharded_align_step(mesh, params,
                                      index_sharded=index_sharded)
            B = D * PER_DEV_B
            reads, lens, quals = make_batch(B, 1)
            args = (idx, gw, jnp.int32(GENOME),
                    shard_batch(mesh, jnp.asarray(reads)),
                    shard_batch(mesh, jnp.asarray(lens)),
                    shard_batch(mesh, jnp.asarray(quals)))
            res, stats = step(*args)   # compile + warm
            jax.block_until_ready(res["best_score"])
            t0 = time.time()
            for _ in range(REPS):
                res, stats = step(*args)
                jax.block_until_ready(res["best_score"])
            dt = (time.time() - t0) / REPS
            times[D] = dt
            print(f"{name} D={D}: t_serial={dt*1e3:.1f} ms "
                  f"(mapped {int(stats['n_mapped'])}/{B})", flush=True)
        eff = {str(D): round(D * times[1] / times[D], 4) for D in times}
        results["series"][name] = {
            "t_serial_s": {str(D): round(t, 4) for D, t in times.items()},
            "efficiency_est": eff,
        }
        print(f"{name}: efficiency {eff}", flush=True)

    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SCALING.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
