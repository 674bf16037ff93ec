"""Stage-level profile of the q-gram map pipeline + batch-size sweep.

Isolates (a) candidate generation w/o extension, (b) full single-pass,
(c) default multi-pass, (d) traceback-only, at B in {32768, 65536}, to
find the next throughput lever. Writes MAP_PROFILE.json.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from nvbio_tpu import packed
    from nvbio_tpu.bowtie.params import MapParams
    from nvbio_tpu.bowtie.pipeline import (
        align_batch_core,
        finalize_best,
        read_candidates,
    )
    from nvbio_tpu.qgram import build_qgram_index
    from nvbio_tpu.utils.simgenome import sample_reads

    G = int(os.environ.get("GENOME_BP", 100_000_000))
    rng = np.random.default_rng(3)
    genome = rng.integers(0, 4, size=G, dtype=np.uint8)
    out = {"genome_bp": G, "platform": jax.devices()[0].platform}
    idx = build_qgram_index(genome, 12).device()
    gwords = jnp.asarray(packed.pack(genome, 2))
    n = jnp.int32(G)
    L = 100

    def _flush(out):
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               os.pardir, "MAP_PROFILE.json"), "w") as f:
            json.dump(out, f, indent=1)

    def t(f, *a, reps=4):
        r = f(*a)
        leaf = jax.tree_util.tree_leaves(r)[0]
        int(np.asarray(leaf.reshape(-1)[:1])[0])
        t0 = time.time()
        outs = [f(*a) for _ in range(reps)]
        for o in outs:
            leaf = jax.tree_util.tree_leaves(o)[0]
            int(np.asarray(leaf.reshape(-1)[:1])[0])
        return (time.time() - t0) / reps

    import functools

    for B in (32768, 65536):
        params = MapParams(max_read_len=L, seed_len=22, seed_stride=15,
                           hits_per_seed=6)
        reads, _s, _rc = sample_reads(genome, B, L, seed=7)
        lens = np.full(B, L, np.int32)
        quals = np.full((B, L), 30, np.uint8)
        args = (jnp.asarray(reads), jnp.asarray(lens), jnp.asarray(quals))
        np.asarray(args[0][:1])

        # full default (reseed on)
        f_full = jax.jit(functools.partial(align_batch_core, params=params))
        print(f"B={B} default...", flush=True)
        dt = t(f_full, idx, gwords, n, *args)
        out[f"default_B{B}_s"] = round(dt, 4)
        out[f"default_B{B}_rps"] = round(B / dt, 0)
        _flush(out)

        # single-pass
        p0 = dataclasses.replace(params, max_reseed=0)
        f_sp = jax.jit(functools.partial(align_batch_core, params=p0))
        print(f"B={B} single...", flush=True)
        dt = t(f_sp, idx, gwords, n, *args)
        out[f"single_B{B}_s"] = round(dt, 4)
        out[f"single_B{B}_rps"] = round(B / dt, 0)
        _flush(out)

        # candidates only (seed + locate + dedup + extension scores)
        f_c = jax.jit(functools.partial(read_candidates, params=p0))
        print(f"B={B} candidates...", flush=True)
        dt = t(f_c, idx, gwords, n, *args)
        out[f"candidates_B{B}_s"] = round(dt, 4)
        _flush(out)

        # candidates + finalize (adds the fused traceback)
        def cand_fin(idx, gwords, n, reads, lens, quals, params):
            c = read_candidates(idx, gwords, n, reads, lens, quals, params)
            return finalize_best(c, gwords, n,
                                 jnp.zeros((reads.shape[0],), jnp.int32),
                                 params)

        f_cf = jax.jit(functools.partial(cand_fin, params=p0))
        print(f"B={B} cand+finalize...", flush=True)
        dt = t(f_cf, idx, gwords, n, *args)
        out[f"cand_finalize_B{B}_s"] = round(dt, 4)

        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               os.pardir, "MAP_PROFILE.json"), "w") as f:
            json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
