"""Break down the device suffix sort's time at 100 Mbp on real TPU:
bootstrap key build, bootstrap 3-plane sort, rank scatter, doubling round.

Writes SA_BREAKDOWN.json. Guides the 30 -> 60+ Msuf/s work (VERDICT r3 #6).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from nvbio_tpu.index.device_sa import _B5, _base5_keys, _c1p_of

    G = int(os.environ.get("GENOME_BP", 100_000_000))
    m = G + 1
    rng = np.random.default_rng(5)
    genome = rng.integers(0, 4, size=G, dtype=np.uint8)
    out = {"genome_bp": G}

    c1p = _c1p_of(genome)
    int(np.asarray(c1p[:1])[0])

    def t(f, *a, reps=3):
        jf = jax.jit(f)
        r = jf(*a)
        int(np.asarray(jax.tree_util.tree_leaves(r)[0].reshape(-1)[:1])[0])
        t0 = time.time()
        outs = [jf(*a) for _ in range(reps)]
        for o in outs:
            int(np.asarray(
                jax.tree_util.tree_leaves(o)[0].reshape(-1)[:1])[0])
        return (time.time() - t0) / reps

    # 1. bootstrap keys (26 static slices, 2 base-5 keys)
    def keys(c1p):
        return _base5_keys(c1p, 0), _base5_keys(c1p, _B5)

    out["keys_s"] = round(t(keys, c1p), 3)

    k1, k2 = jax.jit(keys)(c1p)
    idx = jnp.arange(m, dtype=jnp.int32)

    # 2. the 3-plane 2-key sort
    def srt(k1, k2, idx):
        return jax.lax.sort((k1, k2, idx), num_keys=2)

    out["sort3_2key_s"] = round(t(srt, k1, k2, idx), 3)

    # 2b. 2-plane 1-key sort (what a fused-key bootstrap would cost)
    def srt2(k1, idx):
        return jax.lax.sort((k1, idx), num_keys=1)

    out["sort2_1key_s"] = round(t(srt2, k1, idx), 3)

    # 3. rank assignment: neighbor-diff + cumsum + scatter
    s1, s2, sa = jax.jit(srt)(k1, k2, idx)

    def rank_of(s1, s2, sa):
        new_grp = jnp.concatenate([
            jnp.ones(1, jnp.int32),
            ((s1[1:] != s1[:-1]) | (s2[1:] != s2[:-1])).astype(jnp.int32)])
        rank_sorted = jnp.cumsum(new_grp).astype(jnp.int32)
        return jnp.zeros(m, jnp.int32).at[sa].set(rank_sorted)

    out["rank_scatter_s"] = round(t(rank_of, s1, s2, sa), 3)

    # 3b. scatter via sort-by-sa instead (2-plane 1-key sort)
    def rank_by_sort(s1, s2, sa):
        new_grp = jnp.concatenate([
            jnp.ones(1, jnp.int32),
            ((s1[1:] != s1[:-1]) | (s2[1:] != s2[:-1])).astype(jnp.int32)])
        rank_sorted = jnp.cumsum(new_grp).astype(jnp.int32)
        _, rank = jax.lax.sort((sa, rank_sorted), num_keys=1)
        return rank

    out["rank_by_sort_s"] = round(t(rank_by_sort, s1, s2, sa), 3)

    # 4. one full doubling round (shift + sort + rank)
    rank = jax.jit(rank_of)(s1, s2, sa)

    def dbl(sa, rank):
        rank_pad = jnp.concatenate([rank, jnp.zeros(m, jnp.int32)])
        second = jax.lax.dynamic_slice(rank_pad, (2 * _B5,), (m,))
        i = jnp.arange(m, dtype=jnp.int32)
        s1, s2, sa = jax.lax.sort((rank, second, i), num_keys=2)
        new_grp = jnp.concatenate([
            jnp.ones(1, jnp.int32),
            ((s1[1:] != s1[:-1]) | (s2[1:] != s2[:-1])).astype(jnp.int32)])
        rank_sorted = jnp.cumsum(new_grp).astype(jnp.int32)
        rank2 = jnp.zeros(m, jnp.int32).at[sa].set(rank_sorted)
        return sa, rank2, rank_sorted[-1] == m

    out["doubling_round_s"] = round(t(dbl, sa, rank), 3)

    # how many rounds does random DNA take?
    _, _, done = jax.jit(dbl)(sa, rank)
    out["done_after_1_round"] = bool(np.asarray(done))

    art = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       os.pardir, "SA_BREAKDOWN.json")
    with open(art, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
