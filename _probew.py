import time, numpy as np, jax, jax.numpy as jnp
from nvbio_tpu.align.pallas_kernels import regtile_score_blocked
from nvbio_tpu.align.types import GotohScoring
SC = GotohScoring(0, -6, -8, -3, -8, -3)
rng = np.random.default_rng(1)
L = 100
Lp = 104
G = 1024
KCHAIN = 2
def run(W, unroll):
    TWp = Lp + W
    p2 = jnp.asarray(rng.integers(0, 4, size=(G, Lp, 8, 128), dtype=np.int32))
    t2 = jnp.asarray(rng.integers(0, 4, size=(G, TWp, 8, 128), dtype=np.int32))
    m2 = jnp.full((G, Lp, 8, 128), -6, jnp.int32)
    pl2 = jnp.full((G, 1, 8, 128), L, jnp.int32)
    tl2 = jnp.full((G, 1, 8, 128), L + W - 1, jnp.int32)
    np.asarray(p2[:1,:1,:1,:1])
    @jax.jit
    def chain(p):
        acc = jnp.zeros((G, 1, 8, 128), jnp.int32)
        for _ in range(KCHAIN):
            sc, _ = regtile_score_blocked(p, pl2, t2, tl2, m2, scoring=SC, band=W, length=L,
                                          seq_f=True, full_text=True, uniform_plen=True, unroll=unroll)
            acc = acc + sc
            p = p ^ (sc & 1)
        return acc.reshape(-1)
    int(np.asarray(chain(p2)[:1])[0])
    t0 = time.time()
    outs = [chain(p2) for _ in range(6)]
    for o in outs: int(np.asarray(o[:1])[0])
    dt = (time.time()-t0)/(6*KCHAIN)
    print(f"W={W} unroll={unroll}: {G*1024*L*W/dt/1e9:.1f} GCUPS ({dt*1e3:.2f} ms; {dt/L*1e6:.2f} us/row)")
run(25, 1)
run(33, 1)
run(49, 1)
