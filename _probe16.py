import time, numpy as np, jax, jax.numpy as jnp
from nvbio_tpu.align.pallas_kernels import regtile_score_blocked, regtile16_score_blocked
from nvbio_tpu.align.types import GotohScoring

SC = GotohScoring(0, -6, -8, -3, -8, -3)
rng = np.random.default_rng(1)
L, W = 100, 17
Lp = (L + 7) // 8 * 8
TWp = Lp + W
KB = 32768 * 16
KCHAIN = 8

def probe(name, blocked_fn, lanes, dt_):
    G = KB // lanes
    sub = lanes // 128
    patsb = jnp.asarray(rng.integers(0, 4, size=(G, Lp, sub, 128)).astype(dt_))
    txtsb = jnp.asarray(rng.integers(0, 4, size=(G, TWp, sub, 128)).astype(dt_))
    mmb = jnp.full((G, Lp, sub, 128), -6, dt_)
    plb = jnp.full((G, 1, sub, 128), L, jnp.int32)
    tlb = jnp.full((G, 1, sub, 128), L + W - 1, jnp.int32)
    np.asarray(patsb[:1,:1,:1,:1])

    @jax.jit
    def chain(p):
        acc = jnp.zeros((G, 1, sub, 128), jnp.int32)
        for _ in range(KCHAIN):
            sc, _ = blocked_fn(p, plb, txtsb, tlb, mmb, scoring=SC, band=W, length=L)
            acc = acc + sc
            p = (p ^ (sc & 1).astype(dt_))
        return acc.reshape(-1)

    int(np.asarray(chain(patsb)[:1])[0])
    t0 = time.time()
    outs = [chain(patsb) for _ in range(6)]
    for o in outs:
        int(np.asarray(o[:1])[0])
    dt = (time.time() - t0) / (6 * KCHAIN)
    gcups = KB * L * W / dt / 1e9
    print(f"{name}: {gcups:.1f} GCUPS  ({dt*1e3:.2f} ms/run)")
    return gcups

g32 = probe("int32 regtile", regtile_score_blocked, 1024, np.int32)
g16 = probe("int16 regtile", regtile16_score_blocked, 2048, np.int16)
print("speedup", g16 / g32, "vs PSA 157.73:", g16 / 157.73)
