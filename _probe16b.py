import time, numpy as np, jax, jax.numpy as jnp
from nvbio_tpu.align.pallas_kernels import regtile16_score_blocked
from nvbio_tpu.align.types import GotohScoring
SC = GotohScoring(0, -6, -8, -3, -8, -3)
rng = np.random.default_rng(1)
L, W = 100, 17
Lp = 104; TWp = Lp + W
G = 8   # 16384 alignments
patsb = jnp.asarray(rng.integers(0, 4, size=(G, Lp, 16, 128)).astype(np.int16))
txtsb = jnp.asarray(rng.integers(0, 4, size=(G, TWp, 16, 128)).astype(np.int16))
mmb = jnp.full((G, Lp, 16, 128), -6, jnp.int16)
plb = jnp.full((G, 1, 16, 128), L, jnp.int32)
tlb = jnp.full((G, 1, 16, 128), L + W - 1, jnp.int32)
np.asarray(patsb[:1,:1,:1,:1])
t0 = time.time()
sc, kb = regtile16_score_blocked(patsb, plb, txtsb, tlb, mmb, scoring=SC, band=W, length=L)
s0 = int(np.asarray(sc.reshape(-1)[:1])[0])
print("compile+first run", time.time()-t0, "s; sample score", s0)
reps = 20
t0 = time.time()
outs = [regtile16_score_blocked(patsb, plb, txtsb, tlb, mmb, scoring=SC, band=W, length=L)[0] for _ in range(reps)]
for o in outs: int(np.asarray(o.reshape(-1)[:1])[0])
dt = (time.time()-t0)/reps
print(f"int16: {G*2048*L*W/dt/1e9:.1f} GCUPS ({dt*1e3:.2f} ms, incl ~30ms dispatch overhead)")
