import time, numpy as np, jax, jax.numpy as jnp
from nvbio_tpu.align.pallas_kernels import regtile_score_blocked
from nvbio_tpu.align.types import GotohScoring
SC = GotohScoring(0, -6, -8, -3, -8, -3)
rng = np.random.default_rng(1)
L, W = 100, 17
Lp = 104; TWp = Lp + W
G = 512
KCHAIN = 8
p2 = jnp.asarray(rng.integers(0, 4, size=(G, Lp, 8, 128), dtype=np.int32))
t2 = jnp.asarray(rng.integers(0, 4, size=(G, TWp, 8, 128), dtype=np.int32))
m2 = jnp.full((G, Lp, 8, 128), -6, jnp.int32)
pl2 = jnp.full((G, 1, 8, 128), L, jnp.int32)
tl2 = jnp.full((G, 1, 8, 128), L + W - 1, jnp.int32)
np.asarray(p2[:1,:1,:1,:1])

def run(name, **kw):
    @jax.jit
    def chain(p):
        acc = jnp.zeros((G, 1, 8, 128), jnp.int32)
        for _ in range(KCHAIN):
            sc, _ = regtile_score_blocked(p, pl2, t2, tl2, m2, scoring=SC, band=W, length=L, **kw)
            acc = acc + sc
            p = p ^ (sc & 1)
        return acc.reshape(-1)
    t0 = time.time()
    int(np.asarray(chain(p2)[:1])[0]); comp = time.time() - t0
    reps = 6
    t0 = time.time()
    outs = [chain(p2) for _ in range(reps)]
    for o in outs: int(np.asarray(o[:1])[0])
    dt = (time.time()-t0)/(reps*KCHAIN)
    print(f"{name}: {G*1024*L*W/dt/1e9:.1f} GCUPS ({dt*1e3:.2f} ms/kernel; compile {comp:.0f}s)")

run("sFu+unroll4     ", seq_f=True, full_text=True, uniform_plen=True, unroll=4)
run("sFu+unroll5     ", seq_f=True, full_text=True, uniform_plen=True, unroll=5)
run("sFu+unroll10    ", seq_f=True, full_text=True, uniform_plen=True, unroll=10)
run("sFu+noT+unroll4 ", seq_f=True, full_text=True, uniform_plen=True, t_regs=False, unroll=4)
run("lazy+unroll4    ", seq_f=False, full_text=True, uniform_plen=True, unroll=4)
