"""`nvbio_tpu index` — build reference index artifacts from FASTA.

Equivalent of nvBWT + nvSSA (``nvBWT/nvBWT.cu``, ``nvSSA/nvSSA.cpp``): packs
the genome, builds the FM-index (BWT + occ + sampled SA) and/or the q-gram
table, and writes .npz artifacts next to the output prefix:
  <prefix>.ref.npz   packed reference + contig metadata
  <prefix>.fmi.npz   FM-index (with --fmi)
  <prefix>.qgram.npz q-gram index (default)
  <prefix>.pac/.ann/.amb  BWA-compatible packed reference (with --pac)
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def add_parser(sub):
    p = sub.add_parser("index", help="build reference index artifacts")
    p.add_argument("fasta", help="reference FASTA (.fa/.fa.gz)")
    p.add_argument("prefix", help="output artifact prefix")
    p.add_argument("--fmi", action="store_true", help="also build the FM-index")
    p.add_argument("--no-qgram", action="store_true", help="skip the q-gram table")
    p.add_argument("-q", type=int, default=12, help="q-gram length (default 12)")
    p.add_argument("--sa-interval", type=int, default=8)
    p.add_argument("--sa-backend", choices=("auto", "host", "device"),
                   default="auto",
                   help="suffix-sort backend for --fmi: host SA-IS, "
                        "device prefix doubling (TPU), or auto "
                        "(device when an accelerator is present and the "
                        "genome is >4 Mbp)")
    p.add_argument("--qgroup", type=int, metavar="Q", default=0,
                   help="also build a Q-Group index with this q "
                        "(compact for large q, e.g. 16)")
    p.add_argument("--pac", action="store_true",
                   help="also write BWA-compatible .pac/.ann/.amb")
    p.add_argument("--bwt", action="store_true",
                   help="with --fmi: also write the nvBWT-format .bwt file")
    p.add_argument("--bwt-lz4", action="store_true",
                   help="compress .bwt outputs with the native LZ4 codec "
                        "(file_bwt_lz4.cu parity)")
    p.add_argument("--bwt-blockwise", action="store_true",
                   help="write the nvBWT .bwt via the blockwise device "
                        "suffix sorter (multi-GB texts beyond the int32 "
                        "FM-index cap; nvBWT tool parity, "
                        "sufsort/blockwise_sufsort.h)")
    p.set_defaults(func=run)
    return p


def run(args):
    from nvbio_tpu.io.reference import Reference
    from nvbio_tpu.utils.console import log_info, log_stats

    t0 = time.time()
    ref = Reference.from_fasta(args.fasta)
    log_info(
        f"loaded {len(ref.names)} contigs, {ref.total_length:,} bp "
        f"({time.time()-t0:.1f}s)"
    )
    ref.save(args.prefix + ".ref.npz")

    if not args.no_qgram:
        from nvbio_tpu.qgram import build_qgram_index

        t0 = time.time()
        qg = build_qgram_index(ref.codes, args.q)
        qg.save(args.prefix + ".qgram.npz")
        log_stats(f"q-gram index (q={args.q}) built in {time.time()-t0:.1f}s")

    if args.qgroup:
        from nvbio_tpu.qgram import build_qgroup_index

        t0 = time.time()
        qg2 = build_qgroup_index(ref.codes, args.qgroup)
        qg2.save(args.prefix + ".qgroup.npz")
        log_stats(f"Q-Group index (q={args.qgroup}, "
                  f"{len(qg2.SS)-1:,} unique) built in {time.time()-t0:.1f}s")

    if args.pac:
        from nvbio_tpu.io.pac import save_reference_pac

        save_reference_pac(ref, args.prefix)
        log_info(f"wrote {args.prefix}.pac/.ann/.amb (BWA-compatible)")

    if args.bwt_blockwise:
        from nvbio_tpu.index.blockwise import blockwise_bwt
        from nvbio_tpu.io.pac import save_bwt

        t0 = time.time()
        bwt, primary, bstats = blockwise_bwt(np.asarray(ref.codes))
        save_bwt(bwt, primary, args.prefix + ".bwt",
                 compress="lz4" if args.bwt_lz4 else None)
        log_stats(
            f"blockwise device BWT built in {time.time()-t0:.1f}s "
            f"({bstats['blocks']} blocks / {bstats['superblocks']} "
            f"superblocks, primary={primary})")
        log_info(f"wrote {args.prefix}.bwt (nvBWT format)")

    if args.fmi:
        from nvbio_tpu.fmi.index import build_fmindex
        from nvbio_tpu.index.device_sa import prefer_device_sa

        t0 = time.time()
        if args.sa_backend == "device" or (
                args.sa_backend == "auto"
                and prefer_device_sa(ref.total_length)):
            method = "device"
        else:
            method = "auto"  # host: native SA-IS, numpy fallback
        fmi = build_fmindex(ref.codes, sa_interval=args.sa_interval,
                            method=method)
        fmi.save(args.prefix + ".fmi.npz")
        log_stats(
            f"FM-index built in {time.time()-t0:.1f}s "
            f"({'device' if method == 'device' else 'host'} suffix sort, "
            f"primary={fmi.primary}, SA interval={fmi.sa_interval})"
        )
        if args.bwt:
            from nvbio_tpu import packed as _packed
            from nvbio_tpu.io.pac import save_bwt

            codes = _packed.unpack(fmi.bwt_words, fmi.n, 2)
            save_bwt(codes, fmi.primary, args.prefix + ".bwt",
                     compress="lz4" if args.bwt_lz4 else None)
            log_info(f"wrote {args.prefix}.bwt (nvBWT format)")
    return 0
