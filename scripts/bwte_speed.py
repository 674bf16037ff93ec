"""Set-BWT (BWTE) throughput measurement at the ≥1 G-symbol scale.

Synthesizes N_READS x READ_LEN random reads, runs the incremental
block-rank BWTE engine (``index/setbwt.py`` ``bwte_merge_block_rank``, the
TPU-repo counterpart of ``/root/reference/nvbio/sufsort/bwte.h:57-229``),
and reports symbols/s. Reference anchor: ~80 M symbols/s on a K40
(``sufsort.h:47-49``). Verifies a small prefix against the whole-set BCR
oracle before timing.

Writes BWTE_SPEED.json at the repo root.

Env: N_READS (default 10_000_000), READ_LEN (default 100),
BLOCK (default 1_000_000 reads/block).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from nvbio_tpu.index.setbwt import mse_bwt_incremental, set_bwt

    n_reads = int(os.environ.get("N_READS", 10_000_000))
    read_len = int(os.environ.get("READ_LEN", 100))
    block = int(os.environ.get("BLOCK", 1_000_000))
    rng = np.random.default_rng(17)

    # spot-check the engine against the whole-set oracle first
    probe = [rng.integers(0, 4, size=read_len, dtype=np.uint8)
             for _ in range(512)]
    got = mse_bwt_incremental(probe, 128, method="rank")
    want, _ = set_bwt(probe)
    assert np.array_equal(np.asarray(got), np.asarray(want)), "engine!=oracle"

    reads = rng.integers(0, 4, size=(n_reads, read_len), dtype=np.uint8)
    n_sym = n_reads * (read_len + 1)  # + per-read sentinel
    t0 = time.time()
    bwt = mse_bwt_incremental(list(reads), block, method="rank")
    dt = time.time() - t0
    out = {
        "n_reads": n_reads, "read_len": read_len, "block": block,
        "symbols": int(len(bwt)), "build_s": round(dt, 1),
        "msymbols_per_s": round(n_sym / dt / 1e6, 2),
    }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           os.pardir, "BWTE_SPEED.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
