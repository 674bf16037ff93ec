"""FM-path speed: fused interleaved rank rows vs the split occ/words layout.

Measures the three FM search primitives at the bench shapes (100 Mbp
genome, B=32768 reads x NS=6 seeds of 22 bp) and the end-to-end FM-seeded
align step, with the index's fused ``ranktab`` present vs stripped.
Writes FM_SPEED.json.

Run on the TPU relay: ``python scripts/fm_speed.py``.
Relay measurement rules (CLAUDE.md): sync via 1-element fetch, enqueue
REPS dispatches then sync once.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "FM_SPEED.json")

GENOME = int(os.environ.get("GENOME", 100_000_000))
B = int(os.environ.get("B", 32768))
REPS = int(os.environ.get("REPS", 8))


def main():
    import jax
    import jax.numpy as jnp

    from nvbio_tpu import packed
    from nvbio_tpu.bowtie.params import MapParams
    from nvbio_tpu.bowtie.pipeline import align_batch_core
    from nvbio_tpu.fmi.index import attach_ftab, build_fmindex
    from nvbio_tpu.fmi.search import (
        backward_search_core,
        locate_core,
        search_1mm_hybrid,
    )
    from nvbio_tpu.utils.simgenome import sample_reads

    platform = jax.devices()[0].platform
    out = {"platform": platform, "genome_bp": GENOME, "B": B}
    rng = np.random.default_rng(0)
    genome = rng.integers(0, 4, size=GENOME, dtype=np.uint8)

    t0 = time.time()
    fmi = build_fmindex(
        genome, sa_interval=4,
        method="device" if platform == "tpu" else "auto").device()
    fmi = attach_ftab(fmi, k=11)
    np.asarray(fmi.ftab_lo[:1])
    out["index_build_s"] = round(time.time() - t0, 1)
    print(f"index built in {out['index_build_s']} s", flush=True)

    fmi_split = dataclasses.replace(fmi, ranktab=None)

    L, S, NS = 100, 22, 6
    reads, _st, _rc = sample_reads(genome, B, L, seed=1, subst_rate=0.01)
    # seed blocks: NS seeds per read at stride 15 (bench geometry)
    seeds = np.stack([reads[:, j * 15: j * 15 + S] for j in range(NS)], 1)
    seeds_flat = jnp.asarray(seeds.reshape(B * NS, S).astype(np.int32))
    slens = jnp.full((B * NS,), S, jnp.int32)
    rows = jnp.asarray(
        rng.integers(0, GENOME, size=B * NS * 6, dtype=np.int32))

    def timed(name, fn, *args):
        try:
            f = jax.jit(fn)
            r = f(*args)
            jax.tree_util.tree_map(
                lambda x: np.asarray(x.ravel()[:1]), r)  # sync via fetch
            t0 = time.time()
            for _ in range(REPS):
                r = f(*args)
            jax.tree_util.tree_map(lambda x: np.asarray(x.ravel()[:1]), r)
            ms = (time.time() - t0) / REPS * 1000
            out[name + "_ms"] = round(ms, 2)
            print(f"{name}: {ms:.2f} ms", flush=True)
        except Exception as e:  # noqa: BLE001 — record and continue
            out[name + "_error"] = str(e)[:200]
            print(f"{name}: ERROR {str(e)[:120]}", flush=True)
        with open(OUT, "w") as fh:
            json.dump(out, fh, indent=1)

    do_split = os.environ.get("SPLIT", "1") not in ("0", "false")

    timed("bs_fused", backward_search_core, fmi, seeds_flat, slens)
    timed("locate_fused", locate_core, fmi, rows)

    import functools

    hyb = functools.partial(search_1mm_hybrid, n_approx=11)
    timed("hyb1mm_fused", hyb, fmi, seeds_flat, slens)
    from nvbio_tpu.fmi.search import search_1mm_hybrid_topk

    hybk = functools.partial(search_1mm_hybrid_topk, n_approx=11, K=8)
    timed("hyb1mm_topk", hybk, fmi, seeds_flat, slens)
    if do_split:
        timed("bs_split", backward_search_core, fmi_split, seeds_flat, slens)
        timed("locate_split", locate_core, fmi_split, rows)
        timed("hyb1mm_split", hyb, fmi_split, seeds_flat, slens)

    # end-to-end FM-seeded align step (the reference nvBowtie architecture)
    params = MapParams(max_read_len=L, seed_len=S, seed_stride=15,
                       hits_per_seed=6, seeding="fmi")
    gwords = jnp.asarray(packed.pack(genome, 2))
    lens = jnp.full((B,), L, jnp.int32)
    quals = jnp.full((B, L), 30, jnp.uint8)
    readsj = jnp.asarray(reads.astype(np.int32))

    def e2e(idx):
        def run(r, l, q):
            return align_batch_core(idx, gwords, jnp.int32(GENOME), r, l, q,
                                    params)
        return run

    def timed_e2e(name, idx):
        try:
            f = jax.jit(e2e(idx))
            r = f(readsj, lens, quals)
            np.asarray(r["mapped"][:1])
            t0 = time.time()
            for _ in range(REPS):
                r = f(readsj, lens, quals)
            np.asarray(r["mapped"][:1])
            s = (time.time() - t0) / REPS
            out[name + "_s"] = round(s, 3)
            out[name + "_reads_per_sec"] = round(B / s, 1)
            out[name + "_mapped_frac"] = round(
                float(np.asarray(r["mapped"]).mean()), 4)
            print(f"{name}: {s*1000:.1f} ms -> {B/s:,.0f} r/s", flush=True)
        except Exception as e:  # noqa: BLE001
            out[name + "_error"] = str(e)[:200]
            print(f"{name}: ERROR {str(e)[:120]}", flush=True)
        with open(OUT, "w") as fh:
            json.dump(out, fh, indent=1)

    timed_e2e("fm_e2e_fused", fmi)
    if do_split:
        timed_e2e("fm_e2e_split", fmi_split)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
