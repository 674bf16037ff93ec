"""`nvbio_tpu setbwt` — read-set BWT construction (nvSetBWT equivalent)."""

from __future__ import annotations

import time


def add_parser(sub):
    p = sub.add_parser("setbwt", help="build the BWT of a read set")
    p.add_argument("reads", help="FASTQ(.gz)")
    p.add_argument("output", help="output prefix (.setbwt.npz / .txt)")
    p.add_argument("--txt", action="store_true", help="also write ASCII BWT")
    p.add_argument("--bgz", action="store_true",
                   help="also write BGZF-compressed ASCII BWT (.txt.bgz)")
    p.add_argument("--lz4", action="store_true",
                   help="also write the LZ4-framed packed BWT "
                        "(.setbwt.lz4; native codec, file_bwt_lz4.cu "
                        "parity)")
    p.add_argument("--incremental", type=int, metavar="BLOCK", default=0,
                   help="build block-incrementally with this block size "
                        "(C++ BCR + rank-line interleave merges, the "
                        "bwte.h fast path)")
    p.add_argument("--method",
                   choices=["native", "rank", "device", "paged", "merge"],
                   default="native",
                   help="incremental engine: native (C++ BCR blocks + "
                        "fused-rank-line merges, fastest; falls back to "
                        "rank for ragged sets), rank (numpy static-rank "
                        "one-pass merge), paged (PagedText BCR column "
                        "insertion), merge (Holt-McMillan refinement)")
    p.set_defaults(func=run)
    return p


def run(args):
    from nvbio_tpu.alphabet import Alphabet, string_to_codes
    from nvbio_tpu.index.setbwt import bwt_to_text, save_set_bwt, set_bwt
    from nvbio_tpu.io.fastq import read_fastq
    from nvbio_tpu.utils.console import log_stats

    t0 = time.time()
    recs = read_fastq(args.reads)
    reads = [string_to_codes(s, Alphabet.DNA) for _, s, _ in recs]
    if args.incremental:
        from nvbio_tpu.index.setbwt import mse_bwt_incremental

        tb0 = time.time()
        bwt = mse_bwt_incremental(reads, args.incremental,
                                  method=args.method)
        dt = time.time() - tb0
        log_stats(f"incremental ({args.method}) build: {len(bwt):,} symbols "
                  f"in {dt:.1f}s = {len(bwt)/max(dt,1e-9)/1e6:.2f} M "
                  f"symbols/s")
        primary = -1  # multi-string BWT: one '$' per read, no single primary
    else:
        bwt, primary = set_bwt(reads)
    save_set_bwt(args.output + ".setbwt.npz", bwt, primary)
    if args.txt:
        with open(args.output + ".setbwt.txt", "w") as f:
            f.write(bwt_to_text(bwt))
    if args.bgz:
        from nvbio_tpu.io.bgzf import BgzfWriter

        with BgzfWriter(args.output + ".setbwt.txt.bgz") as f:
            f.write(bwt_to_text(bwt).encode())
    if args.lz4:
        import struct

        import numpy as np

        from nvbio_tpu import native

        # frame the symbol plane (0..4 incl. '$'=0 marker byte stream)
        data = np.asarray(bwt, np.uint8).tobytes()
        with open(args.output + ".setbwt.lz4", "wb") as f:
            f.write(b"NB4s")
            f.write(struct.pack("<Q", len(data)))
            CH = 1 << 24
            for s in range(0, max(len(data), 1), CH):
                seg = data[s:s + CH]
                comp = native.lz4_compress(seg)
                f.write(struct.pack("<II", len(seg), len(comp)))
                f.write(comp.tobytes())
    log_stats(
        f"set-BWT of {len(reads):,} reads ({len(bwt):,} symbols) "
        f"in {time.time()-t0:.1f}s"
    )
    return 0
