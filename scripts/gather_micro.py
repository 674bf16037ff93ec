"""Microbenchmark: TPU gather cost model on big HBM tables.

Question: does a gather of K contiguous words per index cost K scalar
loads or one? Decides whether row-batched gathers can cut the
locate/window-extraction walls (flat 1-D gathers measured 14.7 ns/elem).

Caveat learned the hard way: reshaping the table to (N/K, K) for K<128
explodes memory — TPU pads the minor dim to the 128-lane tile (a
(50M, 2) uint32 "pair table" allocates 25.6 GB). Row gathers must use
dynamic-slice-shaped gathers on the 1-D array, or (N/128, 128)
tile-aligned rows. Writes GATHER_MICRO.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "GATHER_MICRO.json")


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    N = int(os.environ.get("TABLE", 100_000_000))   # table entries
    M = int(os.environ.get("QUERIES", 2_359_296))   # ~B*NS*H of the map step
    R = int(os.environ.get("REPS", 8))
    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.integers(0, 1 << 30, size=N, dtype=np.uint32))
    idx = jnp.asarray(rng.integers(0, N - 256, size=M, dtype=np.int32))

    out = {"table": N, "queries": M, "platform": jax.devices()[0].platform}

    def timed(name, body, *args):
        def run(*a):
            def step(c, _):
                return (c + body(c, *a)) & jnp.int32(1), None
            cN, _ = lax.scan(step, jnp.int32(0), None, length=R)
            return cN
        f = jax.jit(run)
        try:
            int(np.asarray(f(*args)))
            t0 = time.time()
            int(np.asarray(f(*args)))
            ms = (time.time() - t0) / R * 1000
        except Exception as e:  # noqa: BLE001 — record and continue
            out[name + "_error"] = str(e)[:200]
            print(f"{name}: ERROR {str(e)[:120]}", flush=True)
            return
        out[name + "_ms"] = round(ms, 2)
        print(f"{name}: {ms:.2f} ms", flush=True)
        with open(OUT, "w") as fh:
            json.dump(out, fh, indent=1)

    def flat_body(c, table, idx):
        g = jnp.take(table, idx + c)
        return g.sum().astype(jnp.int32)

    def dynslice_factory(K, Q):
        # Q gathers of K contiguous words each via vmapped dynamic_slice
        def body(c, table, idx):
            def one(i):
                return lax.dynamic_slice(table, (i,), (K,)).sum()
            g = jax.vmap(one)(idx[:Q] + c)
            return g.sum().astype(jnp.int32)
        return body

    def tilerow_factory(Q):
        # Q gathers of one (1, 128) tile-aligned row each
        def body(c, table, idx):
            t2 = table[: (N // 128) * 128].reshape(N // 128, 128)
            rows = (idx[:Q] // 128) + (c & 1)
            g = jnp.take(t2, rows, axis=0)      # (Q, 128)
            return g.sum().astype(jnp.int32)
        return body

    timed("flat_M", flat_body, table, idx)           # M scalar gathers
    timed("dynslice8_M", dynslice_factory(8, M), table, idx)
    timed("dynslice2_half", dynslice_factory(2, M // 2), table, idx)
    timed("dynslice8_eighth", dynslice_factory(8, M // 8), table, idx)
    timed("dynslice16_16th", dynslice_factory(16, M // 16), table, idx)
    timed("tilerow_M", tilerow_factory(M), table, idx)
    timed("tilerow_tenth", tilerow_factory(M // 10), table, idx)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
