"""Set-BWT (BWTE) throughput measurement at the ≥1 G-symbol scale.

Synthesizes N_READS x READ_LEN random reads, runs the incremental BWTE
engine (the TPU-repo counterpart of
``/root/reference/nvbio/sufsort/bwte.h:57-229``), and reports symbols/s.
Default engine: the native C++ one (``native/bwte.cpp``: BCR column blocks
+ fused-rank-line merges). Reference anchor: ~80 M symbols/s on a K40
(``sufsort.h:47-49``). Verifies a small prefix against the whole-set BCR
oracle before timing.

Writes BWTE_SPEED.json at the repo root.

Env: N_READS (default 10_000_000), READ_LEN (default 100),
BLOCK (default 250_000 reads/block), DEVICE=1 for the accelerator engine,
HOST_RANK=1 for the numpy static-rank engine.
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
    block = int(os.environ.get("BLOCK", 250_000))
    host_method = "rank" if os.environ.get("HOST_RANK") else "native"
    rng = np.random.default_rng(17)

    # spot-check the engine against the whole-set oracle first
    probe = [rng.integers(0, 4, size=read_len, dtype=np.uint8)
             for _ in range(512)]
    got = mse_bwt_incremental(probe, 128, method=host_method)
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
        out["engine"] = f"host:{host_method}"
        t0 = time.time()
        bwt = mse_bwt_incremental(reads, block, method=host_method)
        dt = time.time() - t0
        assert len(bwt) == n_sym
    out["build_s"] = round(dt, 1)
    out["msymbols_per_s"] = round(n_sym / dt / 1e6, 2)
    artifact = os.environ.get("BWTE_OUT", "BWTE_SPEED.json")
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           os.pardir, artifact), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
