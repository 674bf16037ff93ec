import time, numpy as np, jax, jax.numpy as jnp
from nvbio_tpu.align.pallas_kernels import regtile_score_blocked
from nvbio_tpu.align.types import GotohScoring
SC = GotohScoring(0, -6, -8, -3, -8, -3)
rng = np.random.default_rng(1)
L, W = 100, 17
Lp = 104; TWp = Lp + W
G = 16
p2 = jnp.asarray(rng.integers(0, 4, size=(G, Lp, 8, 128), dtype=np.int32))
t2 = jnp.asarray(rng.integers(0, 4, size=(G, TWp, 8, 128), dtype=np.int32))
m2 = jnp.full((G, Lp, 8, 128), -6, jnp.int32)
pl2 = jnp.full((G, 1, 8, 128), L, jnp.int32)
tl2 = jnp.full((G, 1, 8, 128), L + W - 1, jnp.int32)
np.asarray(p2[:1,:1,:1,:1])

def run(name, **kw):
    t0 = time.time()
    sc, _ = regtile_score_blocked(p2, pl2, t2, tl2, m2, scoring=SC, band=W, length=L, **kw)
    s0 = int(np.asarray(sc.reshape(-1)[:1])[0])
    comp = time.time() - t0
    reps = 30
    t0 = time.time()
    outs = [regtile_score_blocked(p2, pl2, t2, tl2, m2, scoring=SC, band=W, length=L, **kw)[0] for _ in range(reps)]
    for o in outs: int(np.asarray(o.reshape(-1)[:1])[0])
    dt = (time.time()-t0)/reps
    print(f"{name}: {G*1024*L*W/dt/1e9:.1f} GCUPS ({dt*1e3:.2f} ms incl dispatch; compile {comp:.0f}s; s0={s0})")
    return dt

run("lazyF base      ", seq_f=False)
run("seqF            ", seq_f=True)
run("seqF+full       ", seq_f=True, full_text=True)
run("seqF+full+unif  ", seq_f=True, full_text=True, uniform_plen=True)
