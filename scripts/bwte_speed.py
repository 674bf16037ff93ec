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
    from nvbio_tpu.index.setbwt import mse_bwt, mse_bwt_incremental

    n_reads = int(os.environ.get("N_READS", 10_000_000))
    read_len = int(os.environ.get("READ_LEN", 100))
    block = int(os.environ.get("BLOCK", 1_000_000))
    rng = np.random.default_rng(17)

    # spot-check the engine against the whole-set oracle first
    probe = [rng.integers(0, 4, size=read_len, dtype=np.uint8)
             for _ in range(512)]
    got = mse_bwt_incremental(probe, 128, method="rank")
    want, _tags = mse_bwt(probe)
    assert np.array_equal(np.asarray(got), np.asarray(want)), "engine!=oracle"

    reads = rng.integers(0, 4, size=(n_reads, read_len), dtype=np.uint8)
    n_sym = n_reads * (read_len + 1)  # + per-read sentinel
    out = {"n_reads": n_reads, "read_len": read_len, "block": block,
           "symbols": n_sym}
    if os.environ.get("DEVICE"):
        # device-resident engine (bwte_device.BwteDevice): merged BWT stays
        # on the accelerator; per block the host contributes only the
        # block's own SA-IS
        import jax

        from nvbio_tpu.index.bwte_device import BwteDevice

        out["engine"] = f"device:{jax.devices()[0].platform}"
        eng = BwteDevice(capacity=n_sym, n_strings=n_reads)
        eng.add_block(reads[:block])  # compile
        eng.sync()
        eng = BwteDevice(capacity=n_sym, n_strings=n_reads)
        t0 = time.time()
        for i in range(0, n_reads, block):
            eng.add_block(reads[i:i + block])
        eng.sync()
        dt = time.time() - t0
    else:
        out["engine"] = "host:rank"
        t0 = time.time()
        bwt = mse_bwt_incremental(list(reads), block, method="rank")
        dt = time.time() - t0
        assert len(bwt) == n_sym
    out["build_s"] = round(dt, 1)
    out["msymbols_per_s"] = round(n_sym / dt / 1e6, 2)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           os.pardir, "BWTE_SPEED.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
