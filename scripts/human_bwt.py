"""Whole-genome single-string BWT: 3.1 Gbp through the 64-bit SA-IS engine.

The reference's headline sufsort capability is the whole-human-genome BWT
(Tesla K20, < 2 min; ``nvbio/sufsort/sufsort.h:45-47``). This is the HOST
fallback path: native O(n) SA-IS with 64-bit indices -> BWT -> the
nvBWT-format .bwt artifact (``io/pac.py:save_bwt``), at NCBI36 scale.
Single host core; working set ~35-45 GB; ~75 min. The DEVICE answer is
``scripts/blockwise_bwt_3g.py`` (index --bwt-blockwise): 17.9 min on one
v5e through a ~2 MB/s relay (BLOCKWISE_BWT_3G.json).

Run:  python scripts/human_bwt.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    from nvbio_tpu import native
    from nvbio_tpu.fmi.index import bwt_from_sa
    from nvbio_tpu.io.pac import load_bwt, save_bwt

    N = 3_100_000_000
    t0 = time.time()

    def log(msg):
        print(f"[{time.time()-t0:7.1f}s] {msg}", flush=True)

    rng = np.random.default_rng(2026)
    genome = np.empty(N, np.uint8)
    for s in range(0, N, 1 << 28):
        e = min(s + (1 << 28), N)
        genome[s:e] = rng.integers(0, 4, size=e - s, dtype=np.uint8)
    log(f"genome synthesized: {N:,} bp")

    sa = native.sais_u8_64(genome)
    log(f"64-bit SA-IS done: {len(sa):,} rows "
        f"({sa.nbytes/2**30:.1f} GiB suffix array)")

    # spot-check suffix order at random rows
    chk = np.random.default_rng(1).integers(1, N, size=1000)
    a = sa[chk - 1]
    b = sa[chk]
    for i in range(0, 1000, 97):
        x, y = int(a[i]), int(b[i])
        la = min(64, N - x)
        lb = min(64, N - y)
        ga, gb = genome[x:x + la], genome[y:y + lb]
        m = min(la, lb)
        cmp = np.nonzero(ga[:m] != gb[:m])[0]
        assert (ga[cmp[0]] < gb[cmp[0]]) if len(cmp) else (la <= lb), i
    log("suffix order spot-checks passed")

    bwt, primary = bwt_from_sa(genome, sa)
    del sa
    log(f"BWT extracted, primary row {primary:,}")

    out = "/tmp/human.bwt"
    save_bwt(bwt, primary, out)
    back, primary2, cum = load_bwt(out)
    assert primary2 == primary and len(back) == N
    assert np.array_equal(back[:10_000_000], bwt[:10_000_000])
    log(f"nvBWT artifact written + verified: {out} "
        f"({os.path.getsize(out)/2**30:.2f} GiB)")
    log("WHOLE-GENOME BWT OK (3.1 Gbp single string, 64-bit SA-IS)")


if __name__ == "__main__":
    main()
