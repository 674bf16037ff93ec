"""Benchmark: reads aligned/sec/chip through the full device pipeline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline anchor: the project north-star is >1M reads/s on a v5p-16 (16 chips)
=> 62,500 reads/s/chip (BASELINE.md); vs_baseline = value / 62500.

Also measures the banded Gotoh extension kernel in GCUPS (reference PSA
SW-Gotoh best published: 157.73 GCUPS on TITAN BLACK, BASELINE.md) in
"extras" for tracking.
"""

from __future__ import annotations

import json
import time

import numpy as np


def _probe_default_backend(timeout_s: float = 150.0) -> bool:
    """True if the default (TPU relay) backend initializes.

    Probed in a SUBPROCESS with a hard timeout: when the remote relay is
    down, in-process ``jax.devices()`` hangs ~25 minutes inside the plugin's
    retry loop before raising — a crashed/absent BENCH record is worse than
    an honest CPU one, so on probe failure the bench degrades to the CPU
    configuration and says so in extras.platform."""
    import subprocess
    import sys

    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.devices(); print('ok')"],
            capture_output=True, timeout=timeout_s, text=True,
        )
        return r.returncode == 0 and "ok" in r.stdout
    except Exception:
        return False


def main():
    import os

    if not _probe_default_backend():
        # conftest-pattern CPU fallback (JAX_PLATFORMS env alone does not
        # override the relay plugin registration — CLAUDE.md gotcha)
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=1"
        )
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from nvbio_tpu import packed
    from nvbio_tpu.align.batch import batch_score_banded
    from nvbio_tpu.align.types import SEMI_GLOBAL, GotohAligner, GotohScoring
    from nvbio_tpu.bowtie.params import MapParams
    from nvbio_tpu.bowtie.pipeline import align_batch_core
    from nvbio_tpu.qgram import build_qgram_index

    rng = np.random.default_rng(0xBEEF)
    dev = jax.devices()[0]
    platform = dev.platform

    # ---- problem setup -----------------------------------------------------
    # 100 Mbp reference on real hardware (the round-1 verdict's honest
    # operating point: busy q-gram buckets, hits_per_seed=6) with ~1%-error
    # reads; CPU CI keeps a toy size
    GENOME = 100_000_000 if platform != "cpu" else 400_000
    B = 32768 if platform != "cpu" else 512
    L = 100
    genome = rng.integers(0, 4, size=GENOME, dtype=np.uint8)

    # default band/reseed policy (max_dist=15 -> W=31, the reference's own
    # default band, params.cpp:121; reseed_frac=0.125)
    params = MapParams(
        max_read_len=L, seed_len=22, seed_stride=15, hits_per_seed=6,
    )

    t0 = time.time()
    fmi = build_qgram_index(genome, params.qgram_q).device()
    gwords = jnp.asarray(packed.pack(genome, 2))
    build_s = time.time() - t0

    def make_batch(seed):
        r = np.random.default_rng(seed)
        starts = r.integers(0, GENOME - L, size=B)
        reads = genome[starts[:, None] + np.arange(L)].astype(np.int32)
        nmut = max(1, L // 100)
        pos = r.integers(0, L, size=(B, nmut))
        val = r.integers(1, 4, size=(B, nmut))
        np.put_along_axis(
            reads, pos, (np.take_along_axis(reads, pos, 1) + val) % 4, 1
        )
        rc_mask = r.random(B) < 0.5
        rc = (3 - reads)[:, ::-1]
        reads = np.where(rc_mask[:, None], rc, reads)
        lens = np.full(B, L, np.int32)
        quals = np.full((B, L), 30, np.uint8)
        arrs = (jnp.asarray(reads), jnp.asarray(lens), jnp.asarray(quals))
        for a in arrs:  # force the host->device upload to finish now
            np.asarray(a[:1])
        return arrs

    n_genome = jnp.int32(GENOME)

    # ---- pipeline throughput ------------------------------------------------
    # Steady-state throughput: several batches in flight (exactly how the
    # map CLI runs — host formatting of batch i overlaps device compute of
    # batch i+1), synced through tiny scalar readbacks (the only reliable
    # sync on the remote-TPU relay; full-array np.asarray would measure the
    # relay's transfer bandwidth, not the device).
    def dispatch(b):
        return align_batch_core(fmi, gwords, n_genome, *b, params)

    def sync_scalar(out):
        return int(np.asarray(out["best_score"][:1])[0])

    batch0 = make_batch(1)
    out = dispatch(batch0)
    sync_scalar(out)
    mapped_frac = float(np.asarray(out["mapped"]).mean())

    REPS = 6 if platform != "cpu" else 2
    batches = [make_batch(2 + i) for i in range(REPS)]
    t0 = time.time()
    outs = [dispatch(b) for b in batches]
    for o in outs:
        sync_scalar(o)
    dt = (time.time() - t0) / REPS
    reads_per_sec = B / dt

    # single-pass configuration (reseeding off): isolates the cost of the
    # default multi-pass sensitivity machinery
    import dataclasses as _dc

    params_np = _dc.replace(params, max_reseed=0)

    def dispatch_np(b):
        return align_batch_core(fmi, gwords, n_genome, *b, params_np)

    out_np = dispatch_np(batch0)
    sync_scalar(out_np)
    # sensitivity delta bought by the default reseed machinery = mapped_frac
    # (default) - mapped_frac_single_pass, at the throughput cost visible in
    # reads_per_sec vs reads_per_sec_single_pass
    mapped_frac_single_pass = float(np.asarray(out_np["mapped"]).mean())
    t0 = time.time()
    outs = [dispatch_np(b) for b in batches]
    for o in outs:
        sync_scalar(o)
    reads_per_sec_single_pass = B / ((time.time() - t0) / REPS)

    # ---- paired-end throughput ---------------------------------------------
    # FR pairs sampled from the genome (mate2 = RC at fragment distance);
    # full pairing + Pallas mate rescue (Myers locate + banded re-score)
    from nvbio_tpu.bowtie.paired import align_paired_core

    def make_pair_batch(seed):
        r = np.random.default_rng(seed)
        frag = r.integers(2 * L, params.maxins, size=B)
        starts = r.integers(0, GENOME - params.maxins - 1, size=B)
        m1 = genome[starts[:, None] + np.arange(L)].astype(np.int32)
        s2 = starts + frag - L
        m2f = genome[s2[:, None] + np.arange(L)].astype(np.int32)
        m2 = (3 - m2f)[:, ::-1]
        nmut = max(1, L // 100)
        for m in (m1, m2):
            pos = r.integers(0, L, size=(B, nmut))
            val = r.integers(1, 4, size=(B, nmut))
            np.put_along_axis(
                m, pos, (np.take_along_axis(m, pos, 1) + val) % 4, 1)
        lens = np.full(B, L, np.int32)
        quals = np.full((B, L), 30, np.uint8)
        arrs = tuple(jnp.asarray(a) for a in
                     (m1, lens, quals, m2, lens, quals))
        np.asarray(arrs[0][:1])
        return arrs

    def pdispatch(pb):
        return align_paired_core(fmi, gwords, n_genome, *pb, params)

    p0 = make_pair_batch(101)
    r1_, r2_, pinfo, = pdispatch(p0)[:3]
    int(np.asarray(r1_["best_score"][:1])[0])
    proper_frac = float(np.asarray(pinfo["proper"]).mean())
    PREPS = 4 if platform != "cpu" else 1
    pbatches = [make_pair_batch(102 + i) for i in range(PREPS)]
    t0 = time.time()
    pouts = [pdispatch(pb) for pb in pbatches]
    for o in pouts:
        int(np.asarray(o[0]["best_score"][:1])[0])
    pdt = (time.time() - t0) / PREPS
    pe_reads_per_sec = 2 * B / pdt

    # ---- 512 bp local-mode end-to-end ---------------------------------------
    # long-read leg (defs.h:96 MAX_READ_LEN sizing): full map step in local
    # mode at L=512 — VMEM budgets for the banded kernel + fused traceback
    # only bind on real hardware, so this only runs on TPU
    local_512_rps = 0.0
    if platform == "tpu":
        L5 = 512
        B5 = 4096
        params_local = MapParams.local(
            max_read_len=L5, seed_len=22, seed_stride=60, hits_per_seed=4,
            max_reseed=0,
        )

        def make_long_batch(seed):
            r = np.random.default_rng(seed)
            starts = r.integers(0, GENOME - L5, size=B5)
            reads = genome[starts[:, None] + np.arange(L5)].astype(np.int32)
            nmut = L5 // 100
            pos = r.integers(0, L5, size=(B5, nmut))
            val = r.integers(1, 4, size=(B5, nmut))
            np.put_along_axis(
                reads, pos, (np.take_along_axis(reads, pos, 1) + val) % 4, 1)
            lens = np.full(B5, L5, np.int32)
            quals = np.full((B5, L5), 30, np.uint8)
            arrs = (jnp.asarray(reads), jnp.asarray(lens),
                    jnp.asarray(quals))
            np.asarray(arrs[0][:1])
            return arrs

        def ldispatch(b):
            return align_batch_core(fmi, gwords, n_genome, *b, params_local)

        lb0 = make_long_batch(501)
        sync_scalar(ldispatch(lb0))
        LREPS = 3
        lbs = [make_long_batch(502 + i) for i in range(LREPS)]
        t0 = time.time()
        louts = [ldispatch(b) for b in lbs]
        for o in louts:
            sync_scalar(o)
        local_512_rps = B5 / ((time.time() - t0) / LREPS)

    # ---- banded extension kernel GCUPS --------------------------------------
    # measured on the production path: candidate-blocked register-tiled
    # kernel reading text windows straight from the packed genome
    W = params.band
    TW = L + W - 1
    C = 16
    KB = B * C if platform != "cpu" else 1024
    aligner = GotohAligner(SEMI_GLOBAL, params.scoring)

    if platform == "tpu":
        # pure DP engine on device-resident operands (PSA convention: fixed
        # operand sizes; the reference benchmarks its kernels the same way,
        # prototypes/psa/README.md:30-43). Operands generated ON DEVICE (an
        # upload through the relay would measure the tunnel), ~10 dispatches
        # enqueued back-to-back so the per-dispatch relay latency overlaps.
        from nvbio_tpu.align.pallas_kernels import regtile_score_blocked

        import jax as _jax

        def kernel_gcups(Wk, G_blk, unroll, reps=10):
            Lp = (L + 7) // 8 * 8
            TWp = Lp + Wk
            key = _jax.random.PRNGKey(Wk)

            @_jax.jit
            def make():
                k1, k2 = _jax.random.split(key)
                return (
                    _jax.random.randint(k1, (G_blk, Lp, 8, 128), 0, 4,
                                        jnp.int32),
                    _jax.random.randint(k2, (G_blk, TWp, 8, 128), 0, 4,
                                        jnp.int32),
                    jnp.full((G_blk, Lp, 8, 128), params.scoring.mismatch,
                             jnp.int32),
                    jnp.full((G_blk, 1, 8, 128), L, jnp.int32),
                    jnp.full((G_blk, 1, 8, 128), L + Wk - 1, jnp.int32),
                )

            pb, tb, mb, plb_, tlb_ = make()
            int(np.asarray(pb[:1, :1, :1, :1].reshape(-1))[0])

            def krun():
                sc, _ = regtile_score_blocked(
                    pb, plb_, tb, tlb_, mb,
                    scoring=params.scoring, band=Wk, length=L,
                    seq_f=True, full_text=True, uniform_plen=True,
                    unroll=unroll)
                return sc

            int(np.asarray(krun().reshape(-1)[:1])[0])
            passes = []
            for _ in range(3):  # median-of-3 against relay stalls
                t0 = time.time()
                outs = [krun() for _ in range(reps)]
                for o in outs:
                    int(np.asarray(o.reshape(-1)[:1])[0])
                passes.append((time.time() - t0) / reps)
            return G_blk * 1024 * L * Wk / sorted(passes)[1] / 1e9

        # headline: the PRODUCTION band (W = 2*max_dist+1 = 31, the
        # pipeline's own extension configuration) with the production
        # unroll; W=17 kept as an extra for cross-round comparability
        gcups = kernel_gcups(W, 4096, 10)
        gcups_w17 = kernel_gcups(17, 4096, 4)
    else:
        pats = jnp.asarray(rng.integers(0, 4, size=(KB, L), dtype=np.int32))
        txts = jnp.asarray(rng.integers(0, 4, size=(KB, TW), dtype=np.int32))
        plens = jnp.full((KB,), L, jnp.int32)
        tlens = jnp.full((KB,), TW, jnp.int32)

        def krun():
            return batch_score_banded(pats, plens, txts, tlens, aligner, W).score

        int(np.asarray(krun()[:1])[0])
        KREPS = 2
        t0 = time.time()
        kouts = [krun() for _ in range(KREPS)]
        for s_ in kouts:
            int(np.asarray(s_[:1])[0])
        kdt = (time.time() - t0) / KREPS
        gcups = KB * L * W / kdt / 1e9
        gcups_w17 = gcups

    # ---- Myers bit-parallel edit-distance kernel GCUPS ----------------------
    myers_gcups = 0.0
    if platform == "tpu":
        from nvbio_tpu.align.pallas_kernels import myers_semiglobal_pallas

        MT = L + W - 1
        # large enough that kernel time exceeds the relay submission
        # latency (~30 ms), else the measurement is submission-bound
        MB = KB * 4

        @_jax.jit
        def _mmake():
            k1, k2 = _jax.random.split(_jax.random.PRNGKey(7))
            return (
                _jax.random.randint(k1, (MB, L), 0, 4, jnp.int32),
                _jax.random.randint(k2, (MB, MT), 0, 4, jnp.int32),
                jnp.full((MB,), L, jnp.int32),
                jnp.full((MB,), MT, jnp.int32),
            )

        mp, mt, mpl, mtl = _mmake()
        int(np.asarray(mp[:1, :1].reshape(-1))[0])

        def mrun():
            d, _e = myers_semiglobal_pallas(mp, mpl, mt, mtl)
            return d

        int(np.asarray(mrun()[:1])[0])
        # 3 independent measurement passes, median — the shared remote
        # relay occasionally stalls one pass, which made single-pass
        # numbers swing 30%+ between rounds
        MREPS = 10
        passes = []
        for _ in range(3):
            t0 = time.time()
            mo = [mrun() for _ in range(MREPS)]
            for s_ in mo:
                int(np.asarray(s_[:1])[0])
            passes.append((time.time() - t0) / MREPS)
        mdt = sorted(passes)[1]
        myers_gcups = MB * L * MT / mdt / 1e9

    # fold in the separately-measured index-construction numbers
    # (scripts/index_speed.py writes INDEX_SPEED.json) so the BENCH record
    # carries them
    import os

    def _aux_json(name):
        try:
            with open(os.path.join(
                    os.path.dirname(os.path.abspath(__file__)), name)) as f:
                return json.load(f)
        except Exception:
            return None

    index_speed = _aux_json("INDEX_SPEED.json")
    bwte_speed = _aux_json("BWTE_SPEED.json")
    bwte_speed_device = _aux_json("BWTE_SPEED_DEVICE.json")

    print(
        json.dumps(
            {
                "metric": "reads_aligned_per_sec_per_chip",
                "value": round(reads_per_sec, 1),
                "unit": "reads/s",
                "vs_baseline": round(reads_per_sec / 62500.0, 4),
                "extras": {
                    "platform": platform,
                    "reads_per_sec_single_pass": round(
                        reads_per_sec_single_pass, 1),
                    "pe_reads_per_sec": round(pe_reads_per_sec, 1),
                    "pe_vs_se": round(pe_reads_per_sec / reads_per_sec, 3),
                    "proper_pair_frac": round(proper_frac, 4),
                    "banded_gotoh_gcups": round(gcups, 2),
                    "banded_gotoh_gcups_w17": round(gcups_w17, 2),
                    "gcups_vs_psa_titan_black": round(gcups / 157.73, 3),
                    "myers_edit_gcups": round(myers_gcups, 1),
                    "genome_bp": GENOME,
                    "batch": B,
                    "read_len": L,
                    "mapped_frac": round(mapped_frac, 4),
                    "mapped_frac_single_pass": round(
                        mapped_frac_single_pass, 4),
                    "index_build_s": round(build_s, 1),
                    "local_512_reads_per_sec": round(local_512_rps, 1),
                    "index_speed": index_speed,
                    "bwte_speed": bwte_speed,
                    "bwte_speed_device": bwte_speed_device,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
