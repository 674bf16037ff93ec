"""`nvbio_tpu map` — Bowtie2-style read mapping (nvBowtie equivalent).

Single-end:  nvbio_tpu map <prefix|ref.fa> reads.fq[.gz] -o out.sam
Paired-end:  nvbio_tpu map <prefix|ref.fa> -1 r1.fq -2 r2.fq -o out.sam

Accepts either an index prefix produced by `nvbio_tpu index` or a raw FASTA
(index built on the fly). Streams fixed-size batches to the device and
overlaps host parsing with device compute.
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def add_parser(sub):
    p = sub.add_parser("map", help="map reads (SE or PE) -> SAM")
    p.add_argument("reference", help="index prefix (from `index`) or FASTA")
    p.add_argument("reads", nargs="?", help="single-end FASTQ(.gz)")
    p.add_argument("-1", dest="mate1", help="mate-1 FASTQ (paired-end)")
    p.add_argument("-2", dest="mate2", help="mate-2 FASTQ (paired-end)")
    p.add_argument("-o", "--output", default="-", help="output SAM/BAM by extension (default stdout SAM)")
    p.add_argument("--batch", type=int, default=4096)
    p.add_argument("--max-read-len", type=int, default=128)
    p.add_argument("--seed-len", type=int, default=22)
    p.add_argument("--seed-stride", type=int, default=15)
    p.add_argument("--hits-per-seed", type=int, default=4)
    p.add_argument("--max-dist", type=int, default=15)
    p.add_argument("--seeding", choices=["qgram", "fmi"], default="qgram")
    p.add_argument("--mode", choices=["sw", "ed"], default="sw",
                   help="sw: quality-aware Gotoh (bowtie2-like, default); "
                        "ed: unit-cost edit distance (nvBowtie --ed)")
    p.add_argument("--local", action="store_true",
                   help="local alignment (soft-clipped ends, bowtie2 "
                        "--local scoring + local MAPQ)")
    p.add_argument("--report", help="write an HTML stats report")
    p.add_argument("--profile", metavar="DIR",
                   help="capture a jax.profiler device trace into DIR "
                        "(view with tensorboard / xprof)")
    p.add_argument("--mapq-filter", type=int, default=0, metavar="Q",
                   help="suppress alignments with MAPQ < Q (emitted as "
                        "unmapped; reference output mapq filter)")
    p.add_argument("--debug-output", metavar="FILE",
                   help="also dump binary per-read diagnostics "
                        "(DebugOutput, output_debug.h) — SE only")
    p.add_argument("--config", help="option file: one key=value per line "
                                    "(overrides CLI parameter defaults)")
    p.add_argument("-I", "--minins", type=int, default=0)
    p.add_argument("-X", "--maxins", type=int, default=500)
    p.add_argument("--no-rescue", action="store_true")
    p.add_argument("--pe-policy", choices=["fr", "rf", "ff"], default="fr",
                   help="mate orientation (bowtie2 --fr/--rf/--ff)")
    p.add_argument("--no-discordant", action="store_true",
                   help="do not classify discordant pairs")
    p.add_argument("--max-reseed", type=int, default=1,
                   help="extra seeding passes for unaligned reads")
    p.add_argument("--reseed-frac", type=float, default=0.125,
                   help="reseed queue capacity as a fraction of the batch")
    p.add_argument("--no-1mm-seeding", action="store_true",
                   help="disable 1-mismatch seeding in reseed passes")
    p.add_argument("--all", action="store_true", dest="all_mode",
                   help="report ALL alignments above threshold "
                        "(secondary records), not just the best")
    p.add_argument("--dist", action="store_true",
                   help="multi-host run: jax.distributed init (coordinator "
                        "from --coordinator or JAX_COORDINATOR_ADDRESS env), "
                        "round-robin input striping per host, per-host SAM "
                        "shards merged by process 0")
    p.add_argument("--coordinator", metavar="HOST:PORT",
                   help="jax.distributed coordinator address")
    p.add_argument("--num-processes", type=int)
    p.add_argument("--process-id", type=int)
    p.set_defaults(func=run)
    return p


def _load_reference(path: str, params):
    import os

    from nvbio_tpu.io.reference import Reference

    if path.endswith((".fa", ".fasta", ".fa.gz", ".fasta.gz")):
        return Reference.from_fasta(path), None
    if os.path.exists(path + ".pac") and not os.path.exists(path + ".ref.npz"):
        from nvbio_tpu.io.pac import load_reference_pac

        return load_reference_pac(path), None
    ref = Reference.load(path + ".ref.npz")
    index = None
    if params.seeding == "qgram" and os.path.exists(path + ".qgram.npz"):
        from nvbio_tpu.qgram import QGramIndex

        index = QGramIndex.load(path + ".qgram.npz")
    elif params.seeding == "qgram" and os.path.exists(path + ".qgroup.npz"):
        from nvbio_tpu.qgram import QGroupIndex

        index = QGroupIndex.load(path + ".qgroup.npz")
    elif params.seeding == "fmi" and os.path.exists(path + ".fmi.npz"):
        from nvbio_tpu.fmi.index import FMIndex

        index = FMIndex.load(path + ".fmi.npz")
    return ref, index


def gauge_batch_size(mapper, batch_size: int, max_len: int,
                     floor: int = 64) -> int:
    """Halve the batch size until one probe step fits device memory.

    The analogue of the reference's ComputeThread batch-size gauging
    (``nvBowtie/nvBowtie.cpp`` / ``compute_thread.cu:121-143``): rather than
    dying on RESOURCE_EXHAUSTED mid-run, probe once up front and back off.
    """
    import numpy as np

    from nvbio_tpu.io.fastq import ReadBatch
    from nvbio_tpu.utils.console import log_info

    while True:
        probe = ReadBatch(
            names=[""] * batch_size,
            codes=np.zeros((batch_size, max_len), np.uint8),
            quals=np.zeros((batch_size, max_len), np.uint8),
            lengths=np.zeros(batch_size, np.int32),
        )
        try:
            res = mapper.dispatch(probe)
            np.asarray(res["mapped"][:1])
            return batch_size
        except Exception as e:  # noqa: BLE001 - backend-specific OOM types
            msg = str(e)
            low = msg.lower()
            # covers RESOURCE_EXHAUSTED (HBM), "Ran out of memory in memory
            # space vmem" (compile-time scoped-VMEM overflow — the failure
            # mode that killed round 3's bench), and generic OOM spellings
            oom = ("RESOURCE_EXHAUSTED" in msg or "out of memory" in low
                   or "OOM" in msg or "vmem" in low
                   or "exhausted" in low)
            if not oom or batch_size <= floor:
                raise
            batch_size //= 2
            log_info(f"device OOM at batch {batch_size * 2}; "
                     f"halving to {batch_size}")


def _dump_debug(dbg, mapper, res):
    """Fetch the diagnostic keys of one result batch into DebugOutput."""
    import jax
    import numpy as np

    keys = ("mapped", "strand", "mapq", "nm", "subs", "ins", "dels",
            "has_second", "best_score", "second_score", "window_start",
            "text_start")
    small = {k: np.asarray(v) for k, v in
             jax.device_get({k: res[k] for k in keys}).items()}
    gpos = small["window_start"].astype(np.int64) + small["text_start"]
    cis = np.searchsorted(mapper.ref_offsets, gpos, side="right") - 1
    cis = np.clip(cis, 0, len(mapper.ref_names) - 1)
    local = gpos - mapper.ref_offsets[cis] + 1
    dbg.process_batch(small, cis, local)


def run(args):
    from nvbio_tpu.bowtie.params import MapParams
    from nvbio_tpu.bowtie.pipeline import ReadMapper
    from nvbio_tpu.alphabet import Alphabet
    from nvbio_tpu.io.fastq import fastq_batches
    from nvbio_tpu.io.output import open_alignment_output
    from nvbio_tpu.utils.console import log_info, log_stats
    from nvbio_tpu.utils.stats import AlignmentStats, html_report
    from nvbio_tpu.utils.timers import StageStats, Timer

    paired = args.mate1 is not None
    if paired and not args.mate2:
        raise SystemExit("paired-end needs both -1 and -2")
    if not paired and not args.reads:
        raise SystemExit("provide a reads file (or -1/-2 for paired-end)")

    # multi-host: initialize the distributed runtime, stripe the input per
    # host, and write a per-host output shard (merged below by process 0) —
    # the cross-node generalization of the reference's one-ComputeThread-
    # per-GPU model (nvBowtie.cpp:644-699)
    dist_on = False
    out_path = args.output
    if args.dist or args.coordinator or args.num_processes:
        import jax as _jaxd

        from nvbio_tpu.parallel import dist as _dist

        _dist.init_distributed(args.coordinator, args.num_processes,
                               args.process_id)
        dist_on = _jaxd.process_count() > 1
        if dist_on and args.output != "-":
            out_path = _dist.shard_path(args.output)

    common = dict(
        max_read_len=args.max_read_len,
        seed_len=args.seed_len,
        seed_stride=args.seed_stride,
        hits_per_seed=args.hits_per_seed,
        max_dist=args.max_dist,
        seeding=args.seeding,
        minins=args.minins,
        maxins=args.maxins,
        mate_rescue=not args.no_rescue,
        pe_policy=args.pe_policy,
        pe_discordant=not args.no_discordant,
        max_reseed=args.max_reseed,
        reseed_frac=args.reseed_frac,
        seeding_1mm=not args.no_1mm_seeding,
    )
    if args.local:
        params = MapParams.local(**common)
    elif args.mode == "ed":
        params = MapParams.edit_distance(**common)
    else:
        params = MapParams(**common)
    if args.config:
        from nvbio_tpu.utils.options import Options, apply_to_params

        params = apply_to_params(Options.load(args.config), params)
    t0 = time.time()
    ref, index = _load_reference(args.reference, params)
    mapper = ReadMapper.build(ref, params, index=index)
    log_info(f"reference + index ready in {time.time()-t0:.1f}s "
             f"({ref.total_length:,} bp, seeding={params.seeding})")
    args.batch = gauge_batch_size(mapper, args.batch, args.max_read_len)

    lengths = (ref.offsets[1:] - ref.offsets[:-1]).tolist()
    n_reads = n_mapped = 0
    stats = AlignmentStats()
    stage_stats = []
    t0 = time.time()
    prof = None
    if args.profile:
        # device trace (the reference's nvprof-style per-kernel profiling,
        # SURVEY §5 tracing subsystem)
        import contextlib

        import jax as _jaxp

        prof = contextlib.ExitStack()
        prof.enter_context(_jaxp.profiler.trace(args.profile))
    from nvbio_tpu.io.sam import SamRecord

    def emit(w_, rec):
        nonlocal n_reads, n_mapped
        if args.mapq_filter and not rec.flag & 0x4:
            if rec.flag & 0x100:
                return  # filtered secondaries are dropped outright
            if rec.mapq < args.mapq_filter:
                # below-threshold alignments are reported unmapped
                # (the reference's output mapq filter)
                rec = SamRecord(
                    qname=rec.qname, flag=(rec.flag | 0x4) & ~0x912,
                    rname="*", pos=0, mapq=0, cigar="*",
                    seq=rec.seq, qual=rec.qual)
        w_.write(rec)
        if not rec.flag & 0x100:
            n_reads += 1
            n_mapped += 0 if rec.flag & 0x4 else 1

    def _stripe(it):
        if dist_on:
            from nvbio_tpu.parallel import dist as _dist

            return _dist.host_stripe(it)
        return it

    dbg = None
    if args.debug_output and not paired and not args.all_mode:
        from nvbio_tpu.io.debug import DebugOutput

        dbg = DebugOutput(args.debug_output)
    with open_alignment_output(out_path, ref.names, lengths) as w:
        if paired:
            from nvbio_tpu.bowtie.paired import (
                map_pair_batch,
                map_pair_batch_all,
            )

            it1 = fastq_batches(args.mate1, args.batch, args.max_read_len,
                                alphabet=Alphabet.DNA_N)
            it2 = fastq_batches(args.mate2, args.batch, args.max_read_len,
                                alphabet=Alphabet.DNA_N)
            for b1, b2 in _stripe(zip(it1, it2)):
                if args.all_mode:  # PE all-mapping: every concordant locus
                    recs = map_pair_batch_all(mapper, b1, b2)
                else:
                    recs = map_pair_batch(mapper, b1, b2, stats=stats)
                for rec in recs:
                    emit(w, rec)
        elif args.all_mode:
            for batch in _stripe(
                    fastq_batches(args.reads, args.batch, args.max_read_len,
                                  alphabet=Alphabet.DNA_N)):
                for rec in mapper.map_batch_all(batch):
                    emit(w, rec)
        else:
            # software pipelining: device compute of batch i+1 overlaps the
            # host-side formatting/writing of batch i (async jax dispatch);
            # per-stage host timers = the reference's KernelStats
            # (nvBowtie/bowtie2/cuda/stats.h:45-174)
            st_parse = StageStats("parse")
            st_fmt = StageStats("fetch+format")
            pending = None
            it = iter(_stripe(
                fastq_batches(args.reads, args.batch, args.max_read_len,
                              alphabet=Alphabet.DNA_N)))
            while True:
                with Timer() as tp:
                    batch = next(it, None)
                if batch is not None:
                    st_parse.add(tp.seconds, len(batch.names))
                if batch is None:
                    break
                res = mapper.dispatch(batch)
                if pending is not None:
                    pb, pres = pending
                    import jax as _jax

                    tf = Timer().start()
                    small = _jax.device_get(
                        {k: pres[k] for k in
                         ("mapped", "mapq", "nm", "has_second")})
                    stats.update_from_result(small, pb.lengths)
                    if dbg is not None:
                        _dump_debug(dbg, mapper, pres)
                    for rec in mapper.format_batch(pb, pres):
                        emit(w, rec)
                    st_fmt.add(tf.stop(), len(pb.names))
                pending = (batch, res)
            if pending is not None:
                pb, pres = pending
                import jax as _jax

                small = _jax.device_get(
                    {k: pres[k] for k in
                     ("mapped", "mapq", "nm", "has_second")})
                stats.update_from_result(small, pb.lengths)
                if dbg is not None:
                    _dump_debug(dbg, mapper, pres)
                for rec in mapper.format_batch(pb, pres):
                    emit(w, rec)
            stage_stats = [st_parse, st_fmt]
    if dbg is not None:
        dbg.close()
        log_info(f"debug records written to {args.debug_output}")
    if dist_on and args.output != "-":
        # barrier so every host's shard is closed, then process 0 merges
        import jax as _jaxd
        from jax.experimental import multihost_utils

        from nvbio_tpu.parallel import dist as _dist

        multihost_utils.sync_global_devices("nvbio_tpu_sam_shards")
        if _jaxd.process_index() == 0:
            paths = [_dist.shard_path(args.output, p)
                     for p in range(_jaxd.process_count())]
            nrec = _dist.merge_sam_shards(paths, args.output, remove=True)
            log_info(f"merged {_jaxd.process_count()} SAM shards -> "
                     f"{args.output} ({nrec:,} records)")
    if prof is not None:
        prof.close()
        log_info(f"profiler trace written to {args.profile}")
    dt = time.time() - t0
    log_stats(
        f"{n_reads:,} reads in {dt:.1f}s ({n_reads/max(dt,1e-9):,.0f} reads/s); "
        f"{n_mapped:,} mapped ({100.0*n_mapped/max(n_reads,1):.2f}%)"
    )
    if args.report:
        stats.wall_s = dt
        for st in stage_stats:
            log_stats(st.summary())
        with open(args.report, "w") as f:
            f.write(html_report(stats, stage_stats=stage_stats))
        log_info(f"HTML report written to {args.report}")
    return 0
