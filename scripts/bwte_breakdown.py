"""Per-stage cost breakdown of the device BWTE engine (bwte_device.py).

Times, at one representative block (BLOCK reads x READ_LEN):
  * block_planes: the on-device block suffix sort + plane derivation
  * merge_step:   the _bwte_device_step jit (rank walk + interleave)
  * rank_walk:    the merge step's scan alone (no interleave scatters)
so the next optimization hits the real wall. Writes BWTE_BREAKDOWN.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "BWTE_BREAKDOWN.json")


def main():
    import jax
    import jax.numpy as jnp

    from nvbio_tpu import packed
    from nvbio_tpu.index.bwte_device import (
        BwteDevice,
        _block_planes_device,
        _bwte_device_step,
    )

    n_reads = int(os.environ.get("N_READS", 2_000_000))
    read_len = int(os.environ.get("READ_LEN", 100))
    block = int(os.environ.get("BLOCK", 250_000))
    rng = np.random.default_rng(17)
    reads = rng.integers(0, 4, size=(block, read_len), dtype=np.uint8)
    n_sym = n_reads * (read_len + 1)
    out = {"platform": jax.devices()[0].platform, "n_reads": n_reads,
           "read_len": read_len, "block": block, "capacity": n_sym}

    def sync(x):
        jax.tree_util.tree_map(
            lambda a: np.asarray(jnp.ravel(a)[:1]), x)

    def timed(name, fn, reps=4):
        r = fn()
        sync(r)
        t0 = time.time()
        for _ in range(reps):
            r = fn()
        sync(r)
        s = (time.time() - t0) / reps
        out[name + "_s"] = round(s, 3)
        print(f"{name}: {s:.3f} s", flush=True)
        with open(OUT, "w") as fh:
            json.dump(out, fh, indent=1)
        return r

    # stage 1: block planes (device suffix sort of the tagged block text)
    rwords = jnp.asarray(packed.pack(reads, 2))
    s0 = jnp.int32(0)
    planes = timed("block_planes", lambda: _block_planes_device(
        rwords, s0, block, read_len))
    B_bwt, B_tags, sa, revT = planes

    # stage 2: one full merge step at mid-fill (state from 4 real blocks)
    eng = BwteDevice(capacity=n_sym, n_strings=n_reads)
    for i in range(4):
        eng.add_block(reads)  # same content is fine for timing
    eng.sync()
    M, dpos, dtags, n, s = eng.M, eng.dpos, eng.dtags, eng.n, eng.s
    timed("merge_step", lambda: _bwte_device_step(
        M, dpos, dtags, n, s, B_bwt, B_tags, sa, revT, read_len))

    per_block_s = out["block_planes_s"] + out["merge_step_s"]
    msym = block * (read_len + 1) / per_block_s / 1e6
    out["per_block_s"] = round(per_block_s, 3)
    out["msymbols_per_s_est"] = round(msym, 2)
    with open(OUT, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
