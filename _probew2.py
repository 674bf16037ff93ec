import time, numpy as np, jax, jax.numpy as jnp
from nvbio_tpu.align.pallas_kernels import regtile_score_blocked
from nvbio_tpu.align.types import GotohScoring
SC = GotohScoring(0, -6, -8, -3, -8, -3)
L = 100
Lp = 104
def run(W, G, unroll):
    TWp = Lp + W
    key = jax.random.PRNGKey(W)
    @jax.jit
    def make():
        k1, k2 = jax.random.split(key)
        p2 = jax.random.randint(k1, (G, Lp, 8, 128), 0, 4, jnp.int32)
        t2 = jax.random.randint(k2, (G, TWp, 8, 128), 0, 4, jnp.int32)
        m2 = jnp.full((G, Lp, 8, 128), -6, jnp.int32)
        pl2 = jnp.full((G, 1, 8, 128), L, jnp.int32)
        tl2 = jnp.full((G, 1, 8, 128), L + W - 1, jnp.int32)
        return p2, t2, m2, pl2, tl2
    p2, t2, m2, pl2, tl2 = make()
    int(np.asarray(p2[:1,:1,:1,:1].reshape(-1))[0])
    def krun():
        sc, _ = regtile_score_blocked(p2, pl2, t2, tl2, m2, scoring=SC, band=W, length=L,
                                      seq_f=True, full_text=True, uniform_plen=True, unroll=unroll)
        return sc
    int(np.asarray(krun().reshape(-1)[:1])[0])
    reps = 10
    t0 = time.time()
    outs = [krun() for _ in range(reps)]
    for o in outs: int(np.asarray(o.reshape(-1)[:1])[0])
    dt = (time.time()-t0)/reps
    print(f"W={W} G={G} unroll={unroll}: raw {G*1024*L*W/dt/1e9:.1f} GCUPS "
          f"({dt*1e3:.1f} ms); minus-30ms {G*1024*L*W/max(dt-0.030,1e-9)/1e9:.1f}", flush=True)
run(25, 4096, 10)
run(29, 4096, 4)
run(33, 4096, 4)
run(25, 4096, 4)
