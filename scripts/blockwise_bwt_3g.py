"""Whole-genome (3.1 Gbp) monolithic single-string BWT, device blockwise.

The reference's headline sufsort capability — whole human genome BWT in
<2 min on a 2013 Tesla K20, ~70 Msuf/s "practically insensitive to LCP"
(``/root/reference/nvbio/sufsort/sufsort.h:45-60``,
``blockwise_sufsort.h``) — driven here through
``nvbio_tpu.index.blockwise``: the genome stays 2-bit packed on one v5e,
suffix blocks are cut by 13-symbol key ranges, each block sorts at device
speed, and the BWT streams back in order. The artifact is the SAME
single-string nvBWT-format ``.bwt`` file the host SA-IS path writes
(``scripts/human_bwt.py``, 75 min on one core) — not sliced indexes.

Verification (SA-IS at this scale would take 75 min, so the oracle is
structural): (a) symbol counts of the BWT equal the genome's, (b) an
LF-walk from the primary row inverts the transform and must reproduce
the genome's last VERIFY_SYMS symbols exactly, (c) the small-scale
bit-parity suite is tests/test_blockwise.py.

Writes BLOCKWISE_BWT_3G.json (phase breakdown) at the repo root.
Env: N (default 3_100_000_000), OUT_BWT (default /tmp/genome3g.bwt),
VERIFY_SYMS (default 100_000).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ART = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "BLOCKWISE_BWT_3G.json")


def lf_invert_check(bwt: np.ndarray, primary: int, genome: np.ndarray,
                    steps: int):
    """Invert the BWT along ``steps`` LF steps from the primary row and
    compare against the genome's tail. Host-side coarse-checkpoint occ."""
    n = len(bwt)
    K = 1 << 16
    nb = (n + K - 1) // K
    occ = np.zeros((nb + 1, 4), np.int64)
    for b in range(nb):
        occ[b + 1] = occ[b] + np.bincount(bwt[b * K:(b + 1) * K],
                                          minlength=4)[:4]
    cum = np.concatenate([[0], np.cumsum(occ[nb])])  # C[c]

    def occ_at(c, i):  # count of c in bwt[0:i)
        b = i // K
        return occ[b, c] + int(np.count_nonzero(bwt[b * K:i] == c))

    # full-BWT row space includes the primary ($) row at index `primary`;
    # bwt here has it REMOVED (bwt_from_sa convention) — walk with the
    # adjusted indexing (same scheme as fmi/index.py LF). Row 0 is the
    # $-suffix row, whose BWT symbol is T[n-1]; LF from there walks the
    # text backwards.
    i = 0
    out = []
    for _ in range(steps):
        adj = i - (1 if i > primary else 0)
        c = int(bwt[adj])
        out.append(c)
        i = 1 + int(cum[c]) + occ_at(c, adj)
    got = np.array(out[::-1], np.uint8)
    want = genome[-steps:]
    assert np.array_equal(got, want), "LF inversion mismatch"


def main():
    from nvbio_tpu.index.blockwise import blockwise_bwt
    from nvbio_tpu.io.pac import load_bwt, save_bwt

    N = int(os.environ.get("N", 3_100_000_000))
    out_bwt = os.environ.get("OUT_BWT", "/tmp/genome3g.bwt")
    verify_syms = int(os.environ.get("VERIFY_SYMS", 100_000))
    t_all = time.time()

    def log(msg):
        print(f"[{time.time()-t_all:8.1f}s] {msg}", flush=True)

    rng = np.random.default_rng(2026)
    genome = np.empty(N, np.uint8)
    for s in range(0, N, 1 << 28):
        e = min(s + (1 << 28), N)
        genome[s:e] = rng.integers(0, 4, size=e - s, dtype=np.uint8)
    log(f"genome synthesized: {N:,} bp")

    stats = {"n": N}
    t0 = time.time()
    bwt, primary, bstats = blockwise_bwt(
        genome,
        chunk=int(os.environ.get("CHUNK", 1 << 27)),
        sb_cap=int(os.environ.get("SB_CAP", 400 << 20)),
        blk=int(os.environ.get("BLK", 160 << 20)),
        log=log)
    stats["build_s"] = round(time.time() - t0, 1)
    stats.update(bstats)
    stats["msuffixes_per_s"] = round((N + 1) / stats["build_s"] / 1e6, 2)
    log(f"blockwise BWT done: {stats['build_s']} s "
        f"({stats['msuffixes_per_s']} Msuf/s), primary {primary:,}")
    with open(ART, "w") as f:
        json.dump(stats, f, indent=1)

    # ---- verification -------------------------------------------------------
    t0 = time.time()
    cg = np.zeros(4, np.int64)
    cb = np.zeros(4, np.int64)
    for s in range(0, N, 1 << 28):
        cg += np.bincount(genome[s:s + (1 << 28)], minlength=4)[:4]
        cb += np.bincount(bwt[s:s + (1 << 28)], minlength=4)[:4]
    assert np.array_equal(cg, cb), (cg, cb)
    lf_invert_check(bwt, primary, genome, verify_syms)
    stats["verify_s"] = round(time.time() - t0, 1)
    log(f"verified: counts equal + LF inversion over {verify_syms:,} "
        f"symbols reproduces the genome tail")

    t0 = time.time()
    save_bwt(bwt, primary, out_bwt)
    back, primary2, _cum = load_bwt(out_bwt)
    assert primary2 == primary and len(back) == N
    assert np.array_equal(back[:1 << 24], bwt[:1 << 24])
    stats["save_s"] = round(time.time() - t0, 1)
    stats["artifact"] = out_bwt
    stats["artifact_gib"] = round(os.path.getsize(out_bwt) / 2**30, 2)
    stats["total_s"] = round(time.time() - t_all, 1)
    with open(ART, "w") as f:
        json.dump(stats, f, indent=1)
    log(f"nvBWT artifact written + verified: {out_bwt} "
        f"({stats['artifact_gib']} GiB)")
    print(json.dumps(stats))


if __name__ == "__main__":
    main()
