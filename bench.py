"""Benchmark: reads aligned/sec/chip through the full device pipeline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline anchor: the project north-star is >1M reads/s on a v5p-16 (16 chips)
=> 62,500 reads/s/chip (BASELINE.md); vs_baseline = value / 62500.

Legs (every leg after the core throughput is FAILURE-ISOLATED — a crash
records extras["errors"][leg] and the run keeps going; round 3 lost its
entire perf record to one un-guarded experimental leg):
  - core: q-gram-seeded default pipeline on a 100 Mbp uniform genome
  - single-pass: reseeding off (cost of the sensitivity machinery)
  - fm: FM-index-seeded pipeline (the reference nvBowtie architecture,
    ``nvBowtie/bowtie2/cuda/mapping.h:57-163``), device-built index
  - pe: paired-end with mate rescue
  - local-512: 512 bp local mode (checkpointed traceback territory)
  - repeat: 100 Mbp repeat-rich genome (~40% repeats) — the honest
    operating point for sensitivity / MAPQ discrimination
  - kernels: banded Gotoh GCUPS (PSA baseline 157.73) + Myers GCUPS
"""

from __future__ import annotations

import json
import time
import traceback

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
    from nvbio_tpu.bowtie.params import MapParams
    from nvbio_tpu.bowtie.pipeline import align_batch_core
    from nvbio_tpu.qgram import build_qgram_index

    rng = np.random.default_rng(0xBEEF)
    dev = jax.devices()[0]
    platform = dev.platform

    extras: dict = {"platform": platform}
    errors: dict = {}

    def leg(name, fn, default=None):
        """Failure isolation: one leg's crash must never kill the record."""
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — record and continue
            errors[name] = f"{type(e).__name__}: {e}"[:400]
            traceback.print_exc()
            return default

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

    # ---- index builds -------------------------------------------------------
    # the flagship index build is the DEVICE FM build (prefix-doubling
    # suffix sort on chip); the q-gram table (native host counting sort)
    # serves the fast-path seeding legs
    fmi_fm = None

    def build_fm():
        nonlocal fmi_fm
        from nvbio_tpu.fmi.index import attach_ftab, build_fmindex

        def once():
            # sa_interval=4 halves the locate LF-walk; ftab k=11 jumps the
            # first 11 backward-search steps (both pure speed, same
            # results)
            t0 = time.time()
            idx = build_fmindex(
                genome, sa_interval=4,
                method="device" if platform == "tpu" else "auto",
            ).device()
            if platform == "tpu":
                idx = attach_ftab(idx, k=11)
                import numpy as _np

                _np.asarray(idx.ftab_lo[:1])  # sync
            return idx, round(time.time() - t0, 1)

        fmi_fm, first_s = once()
        extras["index_build_first_s"] = first_s
        if platform != "tpu":
            return first_s
        # steady state (the first call is jit-compile dominated on the
        # remote relay: 10-300 s of service-load-dependent compiles)
        fmi_fm, steady_s = once()
        return steady_s

    extras["index_build_s"] = leg("fm_build", build_fm)

    t0 = time.time()
    fmi = build_qgram_index(genome, params.qgram_q).device()
    gwords = jnp.asarray(packed.pack(genome, 2))
    extras["qgram_build_s"] = round(time.time() - t0, 1)

    def make_batch(seed, g=genome, gsize=GENOME, truth=False):
        from nvbio_tpu.utils.simgenome import sample_reads

        reads, starts, is_rc = sample_reads(
            g[:gsize], B, L, seed=seed, subst_rate=0.01)
        lens = np.full(B, L, np.int32)
        quals = np.full((B, L), 30, np.uint8)
        arrs = (jnp.asarray(reads), jnp.asarray(lens), jnp.asarray(quals))
        for a in arrs:  # force the host->device upload to finish now
            np.asarray(a[:1])
        return (arrs, starts, is_rc) if truth else arrs

    n_genome = jnp.int32(GENOME)

    def sync_scalar(out):
        return int(np.asarray(out["best_score"][:1])[0])

    def accuracy(out, starts, is_rc, tol):
        """(mapped_frac, sens, mapq10_err): sens = mapped AND within tol of
        the true locus; mapq10_err = wrong-locus rate among mapq >= 10."""
        mapped = np.asarray(out["mapped"])
        pos = (np.asarray(out["window_start"]).astype(np.int64)
               + np.asarray(out["text_start"]).astype(np.int64))
        strand = np.asarray(out["strand"]).astype(bool)
        mapq = np.asarray(out["mapq"])
        correct = mapped & (np.abs(pos - starts) <= tol) & (strand == is_rc)
        conf = mapped & (mapq >= 10)
        mapq10_err = (float(np.sum(conf & ~correct)) / max(1, int(np.sum(conf))))
        return (round(float(mapped.mean()), 4),
                round(float(correct.mean()), 4),
                round(mapq10_err, 4))

    # ---- core pipeline throughput -------------------------------------------
    # Steady-state: several batches in flight (exactly how the map CLI runs —
    # host formatting of batch i overlaps device compute of batch i+1),
    # synced through tiny scalar readbacks (the only reliable sync on the
    # remote-TPU relay; full-array np.asarray would measure the tunnel).
    REPS = 6 if platform != "cpu" else 2

    def throughput(dispatch, batches, warm, reps=None):
        sync_scalar(dispatch(warm))
        t0 = time.time()
        outs = [dispatch(b) for b in batches]
        for o in outs:
            sync_scalar(o)
        return len(batches) * B / (time.time() - t0)

    reads_per_sec = 0.0

    def core_leg():
        nonlocal reads_per_sec

        def dispatch(b):
            return align_batch_core(fmi, gwords, n_genome, *b, params)

        batch0, starts0, rc0 = make_batch(1, truth=True)
        out = dispatch(batch0)
        sync_scalar(out)
        (extras["mapped_frac"], extras["sens"],
         extras["mapq10_err"]) = accuracy(out, starts0, rc0, params.max_dist)
        batches = [make_batch(2 + i) for i in range(REPS)]
        reads_per_sec = throughput(dispatch, batches, batch0)
        extras["reads_per_sec"] = round(reads_per_sec, 1)
        return batches, batch0, starts0, rc0

    core = leg("core", core_leg)
    if core is None:
        batches = [make_batch(2 + i) for i in range(REPS)]
        batch0, starts0, rc0 = make_batch(1, truth=True)
    else:
        batches, batch0, starts0, rc0 = core

    # ---- single-pass configuration (reseeding off) ---------------------------
    import dataclasses as _dc

    def single_pass_leg():
        params_np = _dc.replace(params, max_reseed=0)

        def dispatch_np(b):
            return align_batch_core(fmi, gwords, n_genome, *b, params_np)

        out_np = dispatch_np(batch0)
        sync_scalar(out_np)
        extras["mapped_frac_single_pass"] = round(
            float(np.asarray(out_np["mapped"]).mean()), 4)
        extras["reads_per_sec_single_pass"] = round(
            throughput(dispatch_np, batches, batch0), 1)

    leg("single_pass", single_pass_leg)

    # ---- FM-seeded pipeline (the reference nvBowtie architecture) ------------
    def fm_leg():
        if fmi_fm is None:
            raise RuntimeError("fm index build failed")
        params_fm = _dc.replace(params, seeding="fmi")

        # index CLOSED OVER: XLA embeds the rank/ftab/SSA planes as
        # constants and pre-lays them out for the hot gathers — measured
        # 2.0x vs passing the index as arguments (1560 -> 780 ms at
        # B=32768, r5 bisect). Matches ReadMapper.dispatch's fmi path.
        @jax.jit
        def _fm_step(r, ln, q):
            return align_batch_core(fmi_fm, gwords, n_genome, r, ln, q,
                                    params_fm)

        def dispatch_fm(b):
            return _fm_step(*b)

        out_fm = dispatch_fm(batch0)
        sync_scalar(out_fm)
        (extras["fm_mapped_frac"], extras["fm_sens"], _) = accuracy(
            out_fm, starts0, rc0, params.max_dist)
        extras["fm_reads_per_sec"] = round(
            throughput(dispatch_fm, batches, batch0), 1)

    leg("fm", fm_leg)

    # ---- paired-end throughput -----------------------------------------------
    def pe_leg():
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
        r1_, _r2, pinfo = pdispatch(p0)[:3]
        int(np.asarray(r1_["best_score"][:1])[0])
        extras["proper_pair_frac"] = round(
            float(np.asarray(pinfo["proper"]).mean()), 4)
        PREPS = 4 if platform != "cpu" else 1
        pbatches = [make_pair_batch(102 + i) for i in range(PREPS)]
        t0 = time.time()
        pouts = [pdispatch(pb) for pb in pbatches]
        for o in pouts:
            int(np.asarray(o[0]["best_score"][:1])[0])
        pe_rps = 2 * B * PREPS / (time.time() - t0)
        extras["pe_reads_per_sec"] = round(pe_rps, 1)
        if reads_per_sec:
            extras["pe_vs_se"] = round(pe_rps / reads_per_sec, 3)

    leg("pe", pe_leg)

    # ---- 512 bp local-mode end-to-end -----------------------------------------
    # long-read leg (defs.h:96 MAX_READ_LEN sizing): full map step in local
    # mode at L=512 — exercises the CHECKPOINTED traceback (striped direction
    # plane); VMEM budgets only bind on real hardware
    def local512_leg():
        if platform != "tpu":
            return
        L5, B5 = 512, 4096
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
        extras["local_512_reads_per_sec"] = round(
            B5 * LREPS / (time.time() - t0), 1)

    leg("local_512", local512_leg)

    # ---- repeat-rich genome (the honest operating point) ----------------------
    def repeat_leg():
        from nvbio_tpu.utils.simgenome import repeat_rich_genome

        t0 = time.time()
        rg = repeat_rich_genome(GENOME, seed=0xD1CE, repeat_frac=0.40)
        extras["repeat_genome_gen_s"] = round(time.time() - t0, 1)
        t0 = time.time()
        ridx = build_qgram_index(rg, params.qgram_q).device()
        extras["repeat_qgram_build_s"] = round(time.time() - t0, 1)
        rwords = jnp.asarray(packed.pack(rg, 2))

        def rdispatch(b):
            return align_batch_core(ridx, rwords, n_genome, *b, params)

        rb0, rst0, rrc0 = make_batch(901, g=rg, truth=True)
        out_r = rdispatch(rb0)
        sync_scalar(out_r)
        (extras["repeat_genome_mapped_frac"], extras["repeat_sens"],
         extras["repeat_mapq10_err"]) = accuracy(
            out_r, rst0, rrc0, params.max_dist)
        rbatches = [make_batch(902 + i, g=rg) for i in range(REPS)]
        extras["repeat_reads_per_sec"] = round(
            throughput(rdispatch, rbatches, rb0), 1)

    leg("repeat", repeat_leg)

    # ---- banded extension kernel GCUPS ----------------------------------------
    # measured on the production path: candidate-blocked register-tiled
    # kernel reading text windows straight from the packed genome
    W = params.band
    C = 16
    KB = B * C if platform != "cpu" else 1024

    def gcups_leg():
        if platform != "tpu":
            from nvbio_tpu.align.batch import batch_score_banded
            from nvbio_tpu.align.types import SEMI_GLOBAL, GotohAligner

            TW = L + W - 1
            aligner = GotohAligner(SEMI_GLOBAL, params.scoring)
            pats = jnp.asarray(rng.integers(0, 4, size=(KB, L), dtype=np.int32))
            txts = jnp.asarray(rng.integers(0, 4, size=(KB, TW), dtype=np.int32))
            plens = jnp.full((KB,), L, jnp.int32)
            tlens = jnp.full((KB,), TW, jnp.int32)

            def krun():
                return batch_score_banded(
                    pats, plens, txts, tlens, aligner, W).score

            int(np.asarray(krun()[:1])[0])
            KREPS = 2
            t0 = time.time()
            kouts = [krun() for _ in range(KREPS)]
            for s_ in kouts:
                int(np.asarray(s_[:1])[0])
            kdt = (time.time() - t0) / KREPS
            extras["banded_gotoh_gcups"] = round(KB * L * W / kdt / 1e9, 2)
            extras["banded_gotoh_gcups_w17"] = extras["banded_gotoh_gcups"]
            return

        # pure DP engine on device-resident operands (PSA convention: fixed
        # operand sizes; the reference benchmarks its kernels the same way,
        # prototypes/psa/README.md:30-43). Operands generated ON DEVICE (an
        # upload through the relay would measure the tunnel), ~10 dispatches
        # enqueued back-to-back so the per-dispatch relay latency overlaps.
        from nvbio_tpu.align.pallas_kernels import regtile_score_blocked

        def kernel_gcups(Wk, G_blk, unroll, reps=10):
            Lp = (L + 7) // 8 * 8
            TWp = Lp + Wk
            key = jax.random.PRNGKey(Wk)

            @jax.jit
            def make():
                k1, k2 = jax.random.split(key)
                return (
                    jax.random.randint(k1, (G_blk, Lp, 8, 128), 0, 4,
                                       jnp.int32),
                    jax.random.randint(k2, (G_blk, TWp, 8, 128), 0, 4,
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
        extras["banded_gotoh_gcups"] = round(kernel_gcups(W, 4096, 10), 2)
        extras["banded_gotoh_gcups_w17"] = round(kernel_gcups(17, 4096, 4), 2)
        extras["gcups_vs_psa_titan_black"] = round(
            extras["banded_gotoh_gcups"] / 157.73, 3)

    leg("gcups", gcups_leg)

    # ---- Myers bit-parallel edit-distance kernel GCUPS ------------------------
    def myers_leg():
        if platform != "tpu":
            return
        from nvbio_tpu.align.pallas_kernels import myers_semiglobal_pallas

        MT = L + W - 1
        # large enough that kernel time exceeds the relay submission
        # latency (~30 ms), else the measurement is submission-bound
        MB = KB * 4

        @jax.jit
        def _mmake():
            k1, k2 = jax.random.split(jax.random.PRNGKey(7))
            return (
                jax.random.randint(k1, (MB, L), 0, 4, jnp.int32),
                jax.random.randint(k2, (MB, MT), 0, 4, jnp.int32),
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
        extras["myers_edit_gcups"] = round(MB * L * MT / mdt / 1e9, 1)

    leg("myers", myers_leg)

    # fold in the separately-measured index-construction numbers
    # (scripts/index_speed.py writes INDEX_SPEED.json) so the BENCH record
    # carries them
    def _aux_json(name):
        try:
            with open(os.path.join(
                    os.path.dirname(os.path.abspath(__file__)), name)) as f:
                return json.load(f)
        except Exception:
            return None

    extras["genome_bp"] = GENOME
    extras["batch"] = B
    extras["read_len"] = L
    extras["index_speed"] = _aux_json("INDEX_SPEED.json")
    extras["bwte_speed"] = _aux_json("BWTE_SPEED.json")
    extras["bwte_speed_device"] = _aux_json("BWTE_SPEED_DEVICE.json")
    extras["blockwise_bwt_3g"] = _aux_json("BLOCKWISE_BWT_3G.json")
    if errors:
        extras["errors"] = errors

    print(
        json.dumps(
            {
                "metric": "reads_aligned_per_sec_per_chip",
                "value": round(reads_per_sec, 1),
                "unit": "reads/s",
                "vs_baseline": round(reads_per_sec / 62500.0, 4),
                "extras": extras,
            }
        )
    )


if __name__ == "__main__":
    main()
