"""Compile + time the checkpointed traceback on real TPU at the shapes that
killed round 3's bench (L=512, W=31, B=4096, local mode), plus L=1024.

Writes TB512_CHECK.json at the repo root.
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

    from nvbio_tpu.align.pallas_kernels import (
        _tb_vmem_plan,
        banded_traceback_semiglobal_pallas,
    )
    from nvbio_tpu.align.types import GotohScoring

    platform = jax.devices()[0].platform
    out = {"platform": platform}
    art = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       os.pardir, "TB512_CHECK.json")

    def flush():
        with open(art, "w") as f:
            json.dump(out, f, indent=1)

    sc = GotohScoring(match=2, mismatch=-6,
                      pattern_gap_open=-8, pattern_gap_ext=-3,
                      text_gap_open=-8, text_gap_ext=-3)
    rng = np.random.default_rng(3)

    for L, B, local in ((512, 4096, True), (1024, 2048, True),
                        (512, 4096, False), (2048, 1024, True)):
        W = 31
        TW = L + W - 1
        out[f"plan_L{L}"] = _tb_vmem_plan(L, W, B, 512)
        txts = rng.integers(0, 4, size=(B, TW), dtype=np.int32)
        pats = txts[:, 5:5 + L].copy()
        mut = rng.integers(0, L, size=(B, L // 100))
        np.put_along_axis(
            pats, mut,
            (np.take_along_axis(pats, mut, 1) + 1) % 4, 1)
        plens = np.full(B, L, np.int32)
        tlens = np.full(B, TW, np.int32)
        args = tuple(jnp.asarray(a) for a in (pats, plens, txts, tlens))

        key = f"L{L}_{'local' if local else 'semiglobal'}"
        t0 = time.time()
        try:
            res = banded_traceback_semiglobal_pallas(
                args[0], args[1], args[2], args[3], sc, W, local=local)
            int(np.asarray(res[0][:1])[0])
            out[key + "_compile_s"] = round(time.time() - t0, 1)
            # steady state: 3 enqueued dispatches
            t0 = time.time()
            rs = [banded_traceback_semiglobal_pallas(
                args[0], args[1], args[2], args[3], sc, W, local=local)
                for _ in range(3)]
            for r in rs:
                int(np.asarray(r[0][:1])[0])
            dt = (time.time() - t0) / 3
            out[key + "_ms"] = round(dt * 1e3, 1)
            out[key + "_gcups"] = round(B * L * W / dt / 1e9, 1)
            # sanity: mapped scores should be near-perfect matches
            out[key + "_score0"] = int(np.asarray(res[0][:1])[0])
        except Exception as e:  # noqa: BLE001
            out[key + "_error"] = f"{type(e).__name__}: {e}"[:300]
        flush()

    print(json.dumps(out))


if __name__ == "__main__":
    main()
