"""Index-construction speed: device suffix sort vs host SA-IS.

Measures, on the default (TPU) backend:
  - device-only suffix sort of a 100 Mbp genome (suffixes/s), synced via a
    1-element fetch (full-array fetches would measure the relay tunnel);
  - end-to-end ``build_fmindex(method="device")`` wall time (includes the
    BWT/SSA plane fetch + host occ/pack), first call (with compile) and
    steady state;
  - the host q-gram table build at the same scale, for the bench context.

Reference anchor: nvBWT builds a whole human-genome BWT in <2 min on a
2013 K20 and sustains ~70 M suffixes/s blockwise
(``/root/reference/nvbio/sufsort/sufsort.h:45-60``).

Writes INDEX_SPEED.json at the repo root.
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

    from nvbio_tpu.fmi.index import build_fmindex
    from nvbio_tpu.index.device_sa import _c1p_of, _sa_of

    platform = jax.devices()[0].platform
    GENOME = int(os.environ.get("GENOME_BP", 100_000_000))
    rng = np.random.default_rng(42)
    genome = rng.integers(0, 4, size=GENOME, dtype=np.uint8)
    out = {"platform": platform, "genome_bp": GENOME}

    artifact = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            os.pardir,
                            os.environ.get("OUT", "INDEX_SPEED.json"))

    def flush():
        # progressive dump: a late-stage failure (e.g. an HBM OOM at a new
        # scale point) still leaves the measurements taken so far
        with open(artifact, "w") as f:
            json.dump(out, f, indent=1)

    if os.environ.get("SKIP_SINGLE"):
        # sharded-only run (e.g. the 3.1 Gbp point): skip the single-slice
        # legs so the record is pure
        genome = None
        _run_sharded(out, flush)
        flush()
        print(json.dumps(out))
        return

    # --- device-only suffix sort --------------------------------------------
    t0 = time.time()
    c1p = _c1p_of(genome)
    int(np.asarray(c1p[:1])[0])  # sync upload
    out["upload_s"] = round(time.time() - t0, 1)

    mirror = (genome + 1).astype(np.uint8)  # host tie-resolution text
    t0 = time.time()
    sa = _sa_of(c1p, GENOME + 1, mirror)
    int(np.asarray(sa[:1])[0])
    out["device_sa_first_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    sa = _sa_of(c1p, GENOME + 1, mirror)
    int(np.asarray(sa[:1])[0])
    dt = time.time() - t0
    out["device_sa_s"] = round(dt, 1)
    out["device_sa_msuffixes_per_s"] = round(GENOME / dt / 1e6, 1)
    del sa, c1p
    flush()

    # --- end-to-end FM-index build ------------------------------------------
    t0 = time.time()
    fmi = build_fmindex(genome, method="device")
    out["fmi_build_device_first_s"] = round(time.time() - t0, 1)
    t0 = time.time()
    fmi = build_fmindex(genome, method="device")
    out["fmi_build_device_s"] = round(time.time() - t0, 1)
    out["primary"] = int(fmi.primary)
    flush()

    # device-RESIDENT build: planes stay on chip (the serving form — no
    # host fetch at all except the primary scalar); on the relay this
    # isolates compute from the tunnel's ~10-30 MB/s plane download
    from nvbio_tpu.index.device_sa import build_fmindex_device

    t0 = time.time()
    fd = build_fmindex_device(genome, to_host=False)
    int(np.asarray(fd.bwt_words[:1])[0])
    out["fmi_build_device_resident_s"] = round(time.time() - t0, 1)
    del fd
    flush()

    # spot-check vs the host path on a slice boundary region
    probe = genome[: 1 << 20]
    host = build_fmindex(probe)
    dev = build_fmindex(probe, method="device")
    assert np.array_equal(np.asarray(host.bwt_words),
                          np.asarray(dev.bwt_words))
    assert host.primary == dev.primary
    out["host_parity_1mbp"] = True
    flush()

    # --- host q-gram build (bench context) ----------------------------------
    from nvbio_tpu.qgram import build_qgram_index

    t0 = time.time()
    build_qgram_index(genome, 12)
    out["qgram_build_host_s"] = round(time.time() - t0, 1)
    flush()

    # --- device SA on ADVERSARIAL texts (VERDICT r4 item 5) ------------------
    # The 95.4 Msuf/s headline rode the easy path (random text resolves in
    # one bootstrap round). Measure the tie machinery the hard way:
    # 40%-repeat genome (compacted/full-plane doubling) and a homopolymer-
    # run genome (massive tie groups).
    from nvbio_tpu.utils.simgenome import repeat_rich_genome

    def sa_leg(name, text):
        c1 = _c1p_of(text)
        mir = (text + 1).astype(np.uint8)
        sa1 = _sa_of(c1, len(text) + 1, mir)
        int(np.asarray(sa1[:1])[0])            # compile + first run
        t1 = time.time()
        sa1 = _sa_of(c1, len(text) + 1, mir)
        int(np.asarray(sa1[:1])[0])
        dt1 = time.time() - t1
        out[f"{name}_device_sa_s"] = round(dt1, 1)
        out[f"{name}_device_sa_msuffixes_per_s"] = round(
            len(text) / dt1 / 1e6, 1)
        # parity on a 2 Mbp prefix against host SA-IS
        from nvbio_tpu.index.device_sa import suffix_array_device
        from nvbio_tpu.index.sa import suffix_array

        pro = text[: 1 << 21]
        assert np.array_equal(suffix_array_device(pro),
                              suffix_array(pro))
        del sa1, c1
        flush()

    rg = repeat_rich_genome(GENOME, seed=0xD1CE, repeat_frac=0.40)
    sa_leg("repeat", rg)
    del rg
    # homopolymer-run text: 1% of the genome as embedded poly-A runs of
    # 2-20 kbp (the full-plane doubling path)
    hp = rng.integers(0, 4, size=GENOME, dtype=np.uint8)
    hrng = np.random.default_rng(7)
    budget = GENOME // 100
    while budget > 0:
        ln = int(hrng.integers(2_000, 20_000))
        p = int(hrng.integers(0, GENOME - ln))
        hp[p:p + ln] = 0
        budget -= ln
    sa_leg("homopolymer", hp)
    del hp

    # --- sharded device build (multi-Gbp form) ------------------------------
    del genome
    _run_sharded(out, flush)
    flush()
    print(json.dumps(out))


def _run_sharded(out, flush):
    """SHARDS=D: build a D-slice sharded FM-index with every slice's sort
    on the device (the whole-human path: 3.1 Gbp = 8 device sorts of ~390
    Mbp; one compile serves all slices since shapes match). Set e.g.
    SHARD_GENOME_BP=3100000000 SHARDS=8."""
    import time as _t

    D = int(os.environ.get("SHARDS", 0))
    if not D:
        return
    from nvbio_tpu.fmi.sharded import shard_fmindex

    NB = int(os.environ.get("SHARD_GENOME_BP",
                            int(os.environ.get("GENOME_BP", 100_000_000))))
    big = np.empty(NB, np.uint8)
    rng2 = np.random.default_rng(7)
    for s in range(0, NB, 1 << 28):
        e = min(s + (1 << 28), NB)
        big[s:e] = rng2.integers(0, 4, size=e - s, dtype=np.uint8)
    resident = bool(os.environ.get("RESIDENT"))

    # --- one-slice phase profile (upload / sort / planes): attributes the
    # aggregate rate (VERDICT r4: "unprofiled is unoptimizable") ----------
    from nvbio_tpu.index.device_sa import (
        _bwt_plane, _c1p_of, _pack_occ_planes, _sa_of, _ssa_planes)

    slice_len = (NB + D - 1) // D
    sl0 = np.ascontiguousarray(big[:slice_len + 256], np.uint8)
    t0 = _t.time()
    c1p = _c1p_of(sl0)
    int(np.asarray(c1p[:1])[0])
    out["slice_upload_s"] = round(_t.time() - t0, 1)
    out["slice_upload_mb"] = round(len(sl0) / 4 / 2**20, 1)
    t0 = _t.time()
    sa = _sa_of(c1p, len(sl0) + 1, (sl0 + 1).astype(np.uint8))
    int(np.asarray(sa[:1])[0])
    out["slice_sort_s"] = round(_t.time() - t0, 1)
    t0 = _t.time()
    bwt_u8, _prim = _bwt_plane(c1p, sa, len(sl0))
    m2, c2, v2 = _ssa_planes(sa, 8, len(sl0) // 8 + 1)
    bw, _occ, _cnt = _pack_occ_planes(bwt_u8, len(sl0))
    int(np.asarray(bw[:1])[0])
    out["slice_planes_s"] = round(_t.time() - t0, 1)
    del c1p, sa, bwt_u8, m2, c2, v2, bw, sl0
    flush()

    slice_walls = []
    t0 = _t.time()
    sidx = shard_fmindex(big, D, overlap=256, method="device",
                         resident=resident,
                         on_slice=lambda d, dt: slice_walls.append(
                             round(dt, 1)))
    out["slice_walls_s"] = slice_walls
    if resident:  # sync: planes are device arrays
        np.asarray(sidx.bwt_words[-1, :1])
    dt = _t.time() - t0
    out["shards"] = D
    out["resident"] = resident
    out["sharded_genome_bp"] = NB
    out["sharded_device_build_s"] = round(dt, 1)
    out["sharded_msuffixes_per_s"] = round(NB / dt / 1e6, 1)
    del sidx


if __name__ == "__main__":
    main()
