"""Set-BWT (BWTE) throughput measurement at the ≥200 M-symbol scale.

Synthesizes N_READS x READ_LEN random reads, runs the incremental BWTE
engine (the TPU-repo counterpart of
``/root/reference/nvbio/sufsort/bwte.h:57-229``), and reports symbols/s.
Reference anchor: ~80 M symbols/s on a K40 (``sufsort.h:47-49``).

Measurement discipline (round-5): the device number is the MEDIAN OF
``REPS`` (default 3) full builds, each from a fresh engine, synced through
a 1-element fetch (a full-array fetch would measure the relay tunnel, see
CLAUDE.md). A separate instrumented pass splits one block into its phases
(host pack+upload, block suffix sort, rank-walk+merge step) so a
regression is attributable.

Engines:
  default        host native C++ BCR (``native/bwte.cpp``)
  HOST_RANK=1    host numpy static-rank engine
  DEVICE=1       device-resident ``BwteDevice``; BLOCK reads per block
                 (default: the whole set in ONE block when it fits —
                 block 0 merges into an empty plane, so the set-BWT costs
                 exactly one multi-string device suffix sort; BLOCK=<n>
                 forces the incremental multi-block path and its rank-walk
                 + merge machinery)

Writes BWTE_SPEED.json (BWTE_OUT to override) at the repo root.

Env: N_READS (default 10_000_000), READ_LEN (default 100), BLOCK
(reads/block; device default = whole set), REPS (default 3; device only).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# one device block = bn suffixes; the bootstrap sort holds ~8 int32
# bn-planes at peak, so ~256 M suffixes is the comfortable single-block
# ceiling on a 16 GB chip
_SINGLE_BLOCK_MAX_SYM = int(os.environ.get("SINGLE_BLOCK_MAX_SYM",
                                           256_000_000))


def _median(xs):
    return sorted(xs)[len(xs) // 2]


def _run_device(reads, n_reads, read_len, block, reps, out):
    import jax
    import jax.numpy as jnp

    from nvbio_tpu import packed
    from nvbio_tpu.index.bwte_device import BwteDevice

    n_sym = n_reads * (read_len + 1)
    out["engine"] = f"device:{jax.devices()[0].platform}"
    out["block"] = block
    out["reps"] = reps

    def sync1(x):
        int(np.asarray(x.reshape(-1)[:1])[0])

    blocks = [(reads[i:i + block], min(block, n_reads - i))
              for i in range(0, n_reads, block)]

    # host pack (numpy) and relay upload, measured apart: both are inputs
    # the production pipeline stages/overlaps (reference anchor excludes
    # PCIe the same way; the relay here is ~2 MB/s, see CLAUDE.md)
    t0 = time.time()
    words_host = [jnp_pack(packed, b) for b, _ in blocks]
    out["phase_host_pack_s"] = round(time.time() - t0, 2)
    t0 = time.time()
    words_dev = [jax.device_put(w) for w in words_host]
    for w in words_dev:
        sync1(w)
    out["phase_upload_s"] = round(time.time() - t0, 2)
    out["upload_mb"] = round(sum(w.nbytes for w in words_host) / 2**20, 1)

    def build_resident():
        eng = BwteDevice(capacity=n_sym, n_strings=n_reads)
        for w, (_, m) in zip(words_dev, blocks):
            eng.add_block_packed(w, m, read_len)
        eng.sync()
        return eng

    t0 = time.time()
    build_resident()  # compile + warm the relay
    out["first_build_s"] = round(time.time() - t0, 1)

    runs = []
    for _ in range(reps):
        t0 = time.time()
        build_resident()
        runs.append(round(time.time() - t0, 2))
    out["runs_resident_s"] = runs
    dt = _median(runs)
    out["msymbols_per_s_resident"] = round(n_sym / dt / 1e6, 2)

    # end-to-end (host reads -> pack -> upload -> build), median of reps
    e2e = []
    for _ in range(reps):
        t0 = time.time()
        eng = BwteDevice(capacity=n_sym, n_strings=n_reads)
        for b, _m in blocks:
            eng.add_block(b)
        eng.sync()
        e2e.append(round(time.time() - t0, 2))
    out["runs_e2e_s"] = e2e
    out["build_e2e_s"] = _median(e2e)
    out["msymbols_per_s_e2e"] = round(n_sym / _median(e2e) / 1e6, 2)

    # ---- phase breakdown (one block, instrumented) -------------------------
    from nvbio_tpu.index.bwte_device import (
        _block_planes_device, _bwte_device_step, _bwte_first_block)

    m = blocks[0][1]
    L = read_len
    rwords = words_dev[0]

    t0 = time.time()
    planes = _block_planes_device(rwords, jnp.int32(0), m, L)
    sync1(planes[0])
    out["phase_block_sort_s"] = round(time.time() - t0, 2)

    eng0 = BwteDevice(capacity=n_sym, n_strings=n_reads)
    t0 = time.time()
    M, dpos, dtags = _bwte_first_block(
        planes[0], planes[1], eng0.capacity, n_reads)
    sync1(M)
    out["phase_first_block_s"] = round(time.time() - t0, 2)

    if block < n_reads:
        # merge step against a one-block plane (walk + sort-merge)
        t0 = time.time()
        st = _bwte_device_step(M, dpos, dtags, jnp.int32(m * (L + 1)),
                               jnp.int32(m), *planes, L)
        sync1(st[0])
        out["phase_merge_step_s"] = round(time.time() - t0, 2)
    return dt


def jnp_pack(packed, blk):
    return packed.pack(np.asarray(blk, np.uint8), 2)


def main():
    from nvbio_tpu.index.setbwt import mse_bwt, mse_bwt_incremental

    n_reads = int(os.environ.get("N_READS", 10_000_000))
    read_len = int(os.environ.get("READ_LEN", 100))
    reps = int(os.environ.get("REPS", 3))
    host_method = "rank" if os.environ.get("HOST_RANK") else "native"
    rng = np.random.default_rng(17)
    n_sym = n_reads * (read_len + 1)  # + per-read sentinel

    device = bool(os.environ.get("DEVICE"))
    if "BLOCK" in os.environ:
        block = int(os.environ["BLOCK"])
    elif device and n_sym <= _SINGLE_BLOCK_MAX_SYM:
        block = n_reads  # whole set in one block (no merge machinery)
    else:
        block = 250_000

    # spot-check the engine against the whole-set oracle first
    probe = [rng.integers(0, 4, size=read_len, dtype=np.uint8)
             for _ in range(512)]
    if device:
        from nvbio_tpu.index.bwte_device import BwteDevice

        peng = BwteDevice(capacity=512 * (read_len + 1), n_strings=512)
        for i in range(0, 512, 256):  # 2 blocks: exercises first+merge paths
            peng.add_block(np.stack(probe[i:i + 256]))
        got, _ptags = peng.finalize()
    else:
        got = mse_bwt_incremental(probe, 128, method=host_method)
    want, _tags = mse_bwt(probe)
    assert np.array_equal(np.asarray(got), np.asarray(want)), "engine!=oracle"

    reads = rng.integers(0, 4, size=(n_reads, read_len), dtype=np.uint8)
    out = {"n_reads": n_reads, "read_len": read_len, "block": block,
           "symbols": n_sym}
    if device:
        dt = _run_device(reads, n_reads, read_len, block, reps, out)
    else:
        out["engine"] = f"host:{host_method}"
        t0 = time.time()
        bwt = mse_bwt_incremental(reads, block, method=host_method)
        dt = time.time() - t0
        assert len(bwt) == n_sym
    out["build_s"] = round(dt, 1)
    out["msymbols_per_s"] = round(n_sym / dt / 1e6, 2)
    if device:
        out["note"] = (
            "msymbols_per_s = device-resident rate (reads staged on device"
            " ahead, like the reference's PCIe-excluded 80 Msym/s anchor);"
            " *_e2e fields include the host pack + ~2 MB/s relay upload")
    artifact = os.environ.get("BWTE_OUT", "BWTE_SPEED.json")
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           os.pardir, artifact), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
