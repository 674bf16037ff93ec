"""Sub-stage profile of read_candidates: where do 134 ms/32k reads go?

MAP_PROFILE.json showed candidates = 93% of the single-pass map step.
This drills inside: strands (packed reversals), seed keys, q-gram range
lookups, position locates (the random-HBM gathers), the dedup vote
tournament, and the regtile extension kernel.

Each sub-stage runs R times inside ONE jitted ``lax.scan`` whose int32
carry perturbs the inputs by one bit per iteration (defeats CSE/hoisting)
— so the ~30 ms relay dispatch overhead amortizes over R and wall/R is
the per-call cost. Writes CAND_PROFILE.json incrementally.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT_PATH = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "CAND_PROFILE.json")


def main():
    import functools

    import jax
    import jax.numpy as jnp
    from jax import lax

    from nvbio_tpu import packed
    from nvbio_tpu.bowtie import pipeline as pl
    from nvbio_tpu.bowtie.params import MapParams
    from nvbio_tpu.qgram import (
        build_qgram_index,
        index_locate,
        index_range,
        seed_keys_from_batch,
        stratified_offsets,
    )
    from nvbio_tpu.utils.simgenome import sample_reads

    G = int(os.environ.get("GENOME_BP", 100_000_000))
    B = int(os.environ.get("BATCH", 32768))
    R = int(os.environ.get("REPS", 8))
    L = 100
    params = MapParams(max_read_len=L, seed_len=22, seed_stride=15,
                       hits_per_seed=6)
    P = params
    S1 = P.seeds_per_strand
    NS = 2 * S1
    H = P.hits_per_seed
    CH = S1 * H
    NCH = min(P.hits_per_seed * 2, CH)
    C = 2 * NCH
    W = P.band
    TW = L + W - 1
    tol = 2 * P.max_dist

    rng = np.random.default_rng(3)
    genome = rng.integers(0, 4, size=G, dtype=np.uint8)
    idx = build_qgram_index(genome, P.qgram_q).device()
    gwords = jnp.asarray(packed.pack(genome, 2))
    reads_np, _s, _rc = sample_reads(genome, B, L, seed=7)
    reads = jnp.asarray(reads_np).astype(jnp.int32)
    lens = jnp.full((B,), L, jnp.int32)
    quals = jnp.full((B, L), 30, jnp.uint8)

    out = {"genome_bp": G, "batch": B, "reps": R,
           "platform": jax.devices()[0].platform,
           "S1": S1, "H": H, "C": C, "W": W}

    def flush():
        with open(OUT_PATH, "w") as f:
            json.dump(out, f, indent=1)

    def scan_timed(name, body, *args):
        """body(c, *args) -> int32; run R times in one jit, record ms."""
        def run(*a):
            def step(c, _):
                s = body(c, *a)
                return (c + s) & jnp.int32(1), None
            cN, _ = lax.scan(step, jnp.int32(0), None, length=R)
            return cN
        f = jax.jit(run)
        t0 = time.time()
        r = f(*args)
        int(np.asarray(r))
        out[name + "_compile_s"] = round(time.time() - t0, 1)
        t0 = time.time()
        int(np.asarray(f(*args)))
        ms = (time.time() - t0) / R * 1000
        out[name + "_ms"] = round(ms, 2)
        print(f"{name}: {ms:.2f} ms", flush=True)
        flush()

    # ---- stage bodies (mirror pipeline.read_candidates blocks) ------------
    starts = jnp.arange(S1, dtype=jnp.int32) * P.seed_stride
    seed_gather = starts[:, None] + jnp.arange(P.seed_len,
                                               dtype=jnp.int32)[None, :]

    def strands_body(c, reads, lens, quals):
        r = reads ^ (c & 1)
        n_read = r > 3
        rc = 3 - packed.reverse_rows(jnp.minimum(r, 3), lens, 2)
        rc = jnp.where(
            packed.reverse_rows(n_read.astype(jnp.int32), lens, 1) > 0, 4, rc)
        pen = pl._mm_penalties(r, quals, P)
        acc = rc.sum()
        if pen is not None:
            acc = acc + packed.reverse_rows(pen, lens, 8).sum()
        return acc.astype(jnp.int32)

    def keys_body(c, reads, rc, lens):
        r = reads ^ (c & 1)
        fwd_seeds = r[:, seed_gather]
        rc_seeds = (rc ^ (c & 1))[:, seed_gather]
        seeds = jnp.concatenate([fwd_seeds, rc_seeds], axis=1)
        keys = seed_keys_from_batch(seeds, P.qgram_q)
        return keys.sum().astype(jnp.int32)

    def range_body(c, idx, keys):
        k2 = (keys + c.astype(keys.dtype)) & ((1 << (2 * P.qgram_q)) - 1)
        lo, hi = index_range(idx, k2)
        return (lo.sum() + hi.sum()).astype(jnp.int32)

    def locate_body(c, idx, lo, rsz):
        off = stratified_offsets(rsz, H, NS)
        pos = index_locate(idx, (lo + c.astype(lo.dtype))[:, :, None], off)
        return pos.sum().astype(jnp.int32)

    def offsets_body(c, rsz):
        off = stratified_offsets(rsz + c.astype(rsz.dtype), H, NS)
        return off.sum().astype(jnp.int32)

    def dedup_body(c, w0, valid):
        # mirrors pipeline.dedup_half on both strand halves
        pdt = w0.dtype
        big = jnp.asarray(np.iinfo(np.dtype(pdt.name)).max, pdt)
        acc = jnp.int32(0)
        for h in range(2):
            w0h = w0[:, h * CH:(h + 1) * CH] + c.astype(pdt)
            validh = valid[:, h * CH:(h + 1) * CH]
            w0v = jnp.where(validh, w0h, big)
            near = (pl._absdiff(w0v[:, :, None], w0v[:, None, :]) <= tol) \
                & validh[:, None, :]
            votes = jnp.where(validh,
                              jnp.sum(near, axis=2).astype(jnp.int32), -1)
            for _ in range(NCH):
                m_v = jnp.max(votes, axis=1)
                picked = votes == m_v[:, None]
                sel_w0 = jnp.min(jnp.where(picked, w0v, big), axis=1)
                members = (pl._absdiff(w0v, sel_w0[:, None]) <= tol) \
                    & (votes >= 0)
                rep = jnp.min(jnp.where(members, w0v, big), axis=1)
                acc = acc + rep.astype(jnp.int32).sum()
                votes = jnp.where(members, -1, votes)
        return acc

    def extension_body(c, reads, rc, lens, w0, gwords, mm, mm_rc):
        from nvbio_tpu.align.pallas_kernels import banded_score_cands_regtile

        nmax = jnp.asarray(G).astype(w0.dtype)
        w0p = jnp.minimum(w0 + c.astype(w0.dtype), nmax - 1)
        w0_sm = w0p.T.reshape(C * B)
        wlens_sm = jnp.minimum(pl._sub_clip0(nmax, w0_sm),
                               TW).astype(jnp.int32)
        sc_sm, _ = banded_score_cands_regtile(
            reads, rc, lens, w0_sm, wlens_sm, gwords,
            P.scoring, W, C, NCH, mm, mm_rc)
        return sc_sm.sum().astype(jnp.int32)

    def e2e_body(c, idx, gwords, reads, lens, quals):
        r = reads ^ (c & 1)
        cands = pl.read_candidates(idx, gwords, jnp.int32(G), r, lens,
                                   quals, P)
        return cands["scores"].sum().astype(jnp.int32)

    # ---- precompute stage inputs (one small jit) ---------------------------
    @jax.jit
    def prep(idx, reads, lens, quals):
        n_read = reads > 3
        rc = 3 - packed.reverse_rows(jnp.minimum(reads, 3), lens, 2)
        rc = jnp.where(
            packed.reverse_rows(n_read.astype(jnp.int32), lens, 1) > 0, 4, rc)
        pen = pl._mm_penalties(reads, quals, P)
        mm = None if pen is None else -pen
        mm_rc = None if pen is None else -packed.reverse_rows(pen, lens, 8)
        seeds = jnp.concatenate(
            [reads[:, seed_gather], rc[:, seed_gather]], axis=1)
        keys = seed_keys_from_batch(seeds, P.qgram_q)
        lo, hi = index_range(idx, keys)
        rsz = jnp.maximum(hi - lo, jnp.zeros((), lo.dtype))
        off = stratified_offsets(rsz, H, NS)
        pos = index_locate(idx, lo[:, :, None], off)
        k = jnp.arange(H, dtype=jnp.int32)
        seed_valid = (starts[None, :] + P.seed_len) <= lens[:, None]
        sv2 = jnp.concatenate([seed_valid, seed_valid], axis=1)
        sv2 = sv2 & ~jnp.any(seeds > 3, axis=-1)
        hit_valid = (k.astype(rsz.dtype)[None, None, :]
                     < rsz[:, :, None]) & sv2[:, :, None]
        pdt = pos.dtype
        seed_off = jnp.concatenate([starts, starts])
        w0 = pl._sub_clip0(pos, (seed_off[None, :, None]
                                 + P.max_dist).astype(pdt))
        w0 = jnp.minimum(w0, jnp.asarray(G - 1).astype(pdt))
        return (rc, mm, mm_rc, keys, lo, rsz,
                w0.reshape(B, 2 * CH), hit_valid.reshape(B, 2 * CH))

    rc, mm, mm_rc, keys, lo, rsz, w0_all, valid_all = prep(
        idx, reads, lens, quals)
    jax.block_until_ready(rsz)

    # deduped w0 for the extension leg (host-side, numbers only need shape)
    @jax.jit
    def dedup_run(w0, valid):
        w0f, validf = _dedup_half(w0[:, :CH], valid[:, :CH])
        w0r, validr = _dedup_half(w0[:, CH:], valid[:, CH:])
        return (jnp.concatenate([w0f, w0r], axis=1),
                jnp.concatenate([validf, validr], axis=1))

    def _dedup_half(w0h, validh):
        pdt = w0h.dtype
        big = jnp.asarray(np.iinfo(np.dtype(pdt.name)).max, pdt)
        w0v = jnp.where(validh, w0h, big)
        near = (pl._absdiff(w0v[:, :, None], w0v[:, None, :]) <= tol) \
            & validh[:, None, :]
        votes = jnp.where(validh, jnp.sum(near, axis=2).astype(jnp.int32), -1)
        reps, valids = [], []
        for _ in range(NCH):
            m_v = jnp.max(votes, axis=1)
            any_valid = m_v > 0
            picked = votes == m_v[:, None]
            sel_w0 = jnp.min(jnp.where(picked, w0v, big), axis=1)
            members = (pl._absdiff(w0v, sel_w0[:, None]) <= tol) \
                & (votes >= 0)
            rep = jnp.min(jnp.where(members, w0v, big), axis=1)
            reps.append(jnp.where(any_valid, rep, big))
            valids.append(any_valid)
            votes = jnp.where(members, -1, votes)
        uw0 = jnp.stack(reps, axis=1)
        uvalid = jnp.stack(valids, axis=1) & (uw0 < big)
        return jnp.where(uvalid, uw0, jnp.zeros((), pdt)), uvalid

    w0_dedup, _vd = dedup_run(w0_all, valid_all)
    jax.block_until_ready(w0_dedup)
    print("prep done", flush=True)

    # ---- run the legs -------------------------------------------------------
    scan_timed("strands", strands_body, reads, lens, quals)
    scan_timed("seed_keys", keys_body, reads, rc, lens)
    scan_timed("qgram_range", range_body, idx, keys)
    scan_timed("strat_offsets", offsets_body, rsz)
    scan_timed("locate", locate_body, idx, lo, rsz)
    scan_timed("dedup", dedup_body, w0_all, valid_all)
    scan_timed("extension_regtile", extension_body,
               reads, rc, lens, w0_dedup, gwords, mm, mm_rc)
    scan_timed("e2e_candidates", e2e_body, idx, gwords, reads, lens, quals)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
