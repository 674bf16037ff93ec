"""Proxy timings for the BWTE merge step's pieces at CAP scale.

The merge step measures 3.3 s/block (BWTE_BREAKDOWN.json) but is one jit;
this probes the candidate walls as standalone ops at the same shapes so
the next optimization targets the real one. Writes BWTE_MERGE_PROBE.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "BWTE_MERGE_PROBE.json")

CAP = int(os.environ.get("CAP", 202_000_000))
BN = int(os.environ.get("BN", 101_000_000))   # 1M reads x 101
M = int(os.environ.get("M", 1_000_000))       # reads per block
L = int(os.environ.get("L", 100))


def main():
    import jax
    import jax.numpy as jnp

    from nvbio_tpu.index.bwte_device import RT_K, RT_WORDS, SYM_PER_WORD

    out = {"platform": jax.devices()[0].platform, "CAP": CAP, "BN": BN,
           "M": M, "L": L}
    rng = np.random.default_rng(3)

    def timed(name, fn, *args, reps=4):
        try:
            f = jax.jit(fn)
            r = f(*args)
            np.asarray(jnp.ravel(r)[:1])
            t0 = time.time()
            for _ in range(reps):
                r = f(*args)
            np.asarray(jnp.ravel(r)[:1])
            s = (time.time() - t0) / reps
            out[name + "_s"] = round(s, 3)
            print(f"{name}: {s:.3f} s", flush=True)
        except Exception as e:  # noqa: BLE001
            out[name + "_error"] = str(e)[:200]
            print(f"{name}: ERROR {str(e)[:120]}", flush=True)
        with open(OUT, "w") as fh:
            json.dump(out, fh, indent=1)

    # inputs are synthesized ON DEVICE — uploading CAP-sized planes through
    # the relay (~10-30 MB/s) would cost 25+ minutes
    nw = CAP // SYM_PER_WORD
    key = jax.random.PRNGKey(3)

    @jax.jit
    def gen():
        k1, k2, k3, k4 = jax.random.split(key, 4)
        words = jax.random.bits(k1, (nw,), jnp.uint32)
        Mplane = jax.random.randint(k2, (CAP,), 0, 5, jnp.int32).astype(
            jnp.uint8)
        ror = jnp.sort(jax.random.randint(k3, (BN,), 0, CAP, jnp.int32))
        bb = jax.random.randint(k4, (BN,), 0, 5, jnp.int32).astype(jnp.uint8)
        return words, Mplane, ror, bb

    words, Mplane, r_of_row, B_bwt = gen()
    np.asarray(words[:1])

    # 1. CAP-wide cumsum
    timed("cumsum_cap", lambda h: jnp.cumsum(h),
          jnp.ones(CAP, jnp.int32))

    # 2. the interleave (hist + cumsum + double scatter), as in the step
    def interleave(Mp, ror, bb):
        hist = jnp.zeros(CAP + 1, jnp.int32).at[ror].add(1, mode="drop")
        cnt_le = jnp.cumsum(hist)[:CAP]
        idx = jnp.arange(CAP, dtype=jnp.int32)
        dest_old = idx + cnt_le
        newpos = ror + jnp.arange(BN, dtype=jnp.int32)
        return (jnp.zeros(CAP, Mp.dtype)
                .at[dest_old].set(Mp, mode="drop")
                .at[newpos].set(bb, mode="drop"))
    timed("interleave", interleave, Mplane, r_of_row, B_bwt)

    # 3. ranktab build (fused rows) at CAP
    nbf = CAP // RT_K + 1
    nwp = nbf * RT_WORDS

    def ranktab(words):
        wpad = jnp.zeros((nwp,), jnp.uint32).at[:nw].set(words).reshape(
            nbf, RT_WORDS)
        cs = jnp.arange(4, dtype=jnp.uint32)
        x = wpad[:, None, :] ^ (cs[None, :, None] * jnp.uint32(0x55555555))
        nz = (x | (x >> 1)) & jnp.uint32(0x55555555)
        per = jax.lax.population_count(
            ~nz & jnp.uint32(0x55555555)).astype(jnp.int32).sum(-1)
        occ = jnp.concatenate(
            [jnp.zeros((1, 4), jnp.int32),
             jnp.cumsum(per[:-1], axis=0, dtype=jnp.int32)])
        return jnp.concatenate([occ.astype(jnp.uint32), wpad], axis=1)
    timed("ranktab_build", ranktab, words)

    # 4. the rank walk: L scan steps of M row gathers + an M scatter into
    # a BN plane (carried)
    tab = ranktab(words)

    def walk(tab, q0):
        def step(carry, _):
            q, plane = carry
            row = jnp.take(tab, q % nbf, axis=0)
            s = (row[:, :4].astype(jnp.int32).sum(-1)
                 + jax.lax.population_count(row[:, 4]).astype(jnp.int32))
            q = q + s
            plane = plane.at[q % BN].set(s, mode="drop")
            return (q, plane), None
        (q, plane), _ = jax.lax.scan(
            step, (q0, jnp.zeros(BN, jnp.int32)), None, length=L)
        return plane
    q0 = jnp.asarray(rng.integers(0, nbf, size=M, dtype=np.int32))
    timed("walk_gather_scatter", walk, tab, q0)

    # 5. dollar argsort at 2 x n_strings
    dd = jnp.asarray(rng.integers(0, CAP, size=4_000_000, dtype=np.int32))
    timed("dollar_argsort", lambda d: jnp.argsort(d, stable=True), dd)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
