"""FM-index golden tests (host-built tables vs device queries, mirroring
``nvbio-test/fmindex_test.cu``)."""

import numpy as np
import jax.numpy as jnp

from nvbio_tpu import packed
from nvbio_tpu.fmi.index import FMIndex, build_fmindex, bwt_from_sa
from nvbio_tpu.fmi.rank import build_occ_table, rank, rank_all
from nvbio_tpu.fmi.search import (
    backward_search,
    locate_batch,
    search_1mm,
    extend_backward_all,
)
from nvbio_tpu.index.sa import suffix_array


def brute_sa(codes):
    n = len(codes)
    s = list(codes) + [-1]
    return np.array(
        sorted(range(n + 1), key=lambda i: s[i:]), dtype=np.int64
    )


def test_suffix_array_small(rng):
    for n in [1, 2, 5, 13, 100, 257]:
        codes = rng.integers(0, 4, size=n, dtype=np.uint8)
        sa = suffix_array(codes)
        np.testing.assert_array_equal(sa, brute_sa(codes))


def test_rank_vs_numpy(rng):
    n = 1000
    codes = rng.integers(0, 4, size=n, dtype=np.uint8)
    words = jnp.asarray(packed.pack(codes, 2))
    occ = jnp.asarray(build_occ_table(packed.pack(codes, 2), n))
    idx = rng.integers(0, n + 1, size=200)
    cs = rng.integers(0, 4, size=200)
    got = np.asarray(rank(words, occ, jnp.asarray(cs), jnp.asarray(idx)))
    want = np.array([(codes[:i] == c).sum() for c, i in zip(cs, idx)])
    np.testing.assert_array_equal(got, want)
    # rank_all
    got4 = np.asarray(rank_all(words, occ, jnp.asarray(idx)))
    want4 = np.stack([[(codes[:i] == c).sum() for c in range(4)] for i in idx])
    np.testing.assert_array_equal(got4, want4)


def test_fused_rank_table(rng):
    """The fused interleaved rank rows (one 128-lane tile-row gather per
    query, rank.py RT_*) must match the split occ/words layout and the
    scalar numpy golden model at every boundary (block edges, i=0, i=n),
    and host/device builders must be bit-identical."""
    from nvbio_tpu.fmi.rank import (
        RT_K,
        build_rank_table,
        build_rank_table_device,
        rank_all_fused,
        rank_fused,
        symbol_and_rank_fused,
    )

    for n in [5, RT_K - 1, RT_K, RT_K + 1, 3 * RT_K + 77]:
        codes = rng.integers(0, 4, size=n, dtype=np.uint8)
        w = packed.pack(codes, 2)
        occ = build_occ_table(w, n)
        tab = build_rank_table(w, n, occ)
        np.testing.assert_array_equal(
            tab, np.asarray(build_rank_table_device(w, n)))
        edges = np.array([0, 1, n // 2, n - 1, n, RT_K - 1, RT_K,
                          RT_K + 1], dtype=np.int64)
        idx = np.clip(np.concatenate(
            [edges, rng.integers(0, n + 1, size=64)]), 0, n).astype(np.int32)
        cs = rng.integers(0, 4, size=len(idx)).astype(np.int32)
        got = np.asarray(rank_fused(jnp.asarray(tab), jnp.asarray(cs),
                                    jnp.asarray(idx)))
        want = np.array([(codes[:i] == c).sum() for c, i in zip(cs, idx)])
        np.testing.assert_array_equal(got, want)
        got4 = np.asarray(rank_all_fused(jnp.asarray(tab), jnp.asarray(idx)))
        want4 = np.stack(
            [[(codes[:i] == c).sum() for c in range(4)] for i in idx])
        np.testing.assert_array_equal(got4, want4)
        i2 = np.clip(idx, 0, n - 1)
        sym, rk = symbol_and_rank_fused(jnp.asarray(tab), jnp.asarray(i2))
        np.testing.assert_array_equal(np.asarray(sym), codes[i2])
        want_rk = np.array(
            [(codes[:i] == codes[i]).sum() for i in i2])
        np.testing.assert_array_equal(np.asarray(rk), want_rk)


def test_fused_ranktab_search_parity(rng, monkeypatch):
    """End-to-end FM search with the fused rank rows attached (forced on;
    the auto gate only enables them on accelerators) must be bit-identical
    to the split occ/words layout."""
    import dataclasses

    from nvbio_tpu.fmi.index import attach_ftab, build_fmindex
    from nvbio_tpu.fmi.search import (
        backward_search_core,
        locate_core,
        search_1mm_hybrid,
        search_kmm_core,
    )

    monkeypatch.setenv("NVBIO_TPU_RANKTAB", "1")
    n = 30_000
    codes = rng.integers(0, 4, size=n, dtype=np.uint8)
    fmi = attach_ftab(build_fmindex(codes).device(), k=5)
    assert fmi.ranktab is not None
    split = dataclasses.replace(fmi, ranktab=None)

    B, S = 64, 22
    starts = rng.integers(0, n - S, size=B)
    q = np.stack([codes[s:s + S] for s in starts]).astype(np.int32)
    q[: B // 4, 3] = (q[: B // 4, 3] + 1) % 4  # some mismatching queries
    lens = jnp.asarray(
        rng.integers(S - 6, S + 1, size=B).astype(np.int32))
    qj = jnp.asarray(q)

    lo_f, hi_f = backward_search_core(fmi, qj, lens)
    lo_s, hi_s = backward_search_core(split, qj, lens)
    np.testing.assert_array_equal(np.asarray(lo_f), np.asarray(lo_s))
    np.testing.assert_array_equal(np.asarray(hi_f), np.asarray(hi_s))

    rows = jnp.asarray(rng.integers(0, n + 1, size=512).astype(np.int32))
    pf, df = locate_core(fmi, rows)
    ps, ds = locate_core(split, rows)
    np.testing.assert_array_equal(np.asarray(pf), np.asarray(ps))
    np.testing.assert_array_equal(np.asarray(df), np.asarray(ds))

    outs_f = search_1mm_hybrid(fmi, qj, lens, 8)
    outs_s = search_1mm_hybrid(split, qj, lens, 8)
    for a, b in zip(outs_f, outs_s):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    kf = search_kmm_core(fmi, qj, lens, k=2, max_states=8)
    ks = search_kmm_core(split, qj, lens, k=2, max_states=8)
    for a, b in zip(kf, ks):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _naive_occurrences(text, q):
    q = "".join(map(str, q))
    t = "".join(map(str, text))
    out = []
    start = 0
    while True:
        p = t.find(q, start)
        if p < 0:
            break
        out.append(p)
        start = p + 1
    return sorted(out)


def test_backward_search_and_locate(rng):
    n = 4096
    text = rng.integers(0, 4, size=n, dtype=np.uint8)
    fmi = build_fmindex(text).device()

    B, L = 32, 12
    # half genuine substrings, half random
    queries = np.zeros((B, L), dtype=np.int32)
    qlens = rng.integers(6, L + 1, size=B).astype(np.int32)
    for b in range(B):
        if b % 2 == 0:
            p = rng.integers(0, n - L)
            queries[b, :qlens[b]] = text[p:p + qlens[b]]
        else:
            queries[b, :qlens[b]] = rng.integers(0, 4, size=qlens[b])

    lo, hi = backward_search(fmi, jnp.asarray(queries), jnp.asarray(qlens))
    lo, hi = np.asarray(lo), np.asarray(hi)

    sa = suffix_array(text)
    for b in range(B):
        q = queries[b, :qlens[b]]
        want = _naive_occurrences(text, q)
        cnt = max(0, hi[b] - lo[b])
        assert cnt == len(want), f"b={b}: count {cnt} != {len(want)}"
        if cnt:
            got_pos = sorted(sa[lo[b]:hi[b]].tolist())
            assert got_pos == want

    # locate via sampled SA must reproduce SA values
    rows_with_hits = np.concatenate(
        [np.arange(lo[b], hi[b]) for b in range(B) if hi[b] > lo[b]]
    )[:64]
    pos, done = locate_batch(fmi, jnp.asarray(rows_with_hits, dtype=np.int32))
    assert np.asarray(done).all()
    np.testing.assert_array_equal(np.asarray(pos), sa[rows_with_hits])


def test_search_1mm(rng):
    n = 2048
    text = rng.integers(0, 4, size=n, dtype=np.uint8)
    fmi = build_fmindex(text).device()
    B, L = 8, 10
    queries = np.zeros((B, L), dtype=np.int32)
    qlens = np.full(B, L, dtype=np.int32)
    for b in range(B):
        p = rng.integers(0, n - L)
        queries[b] = text[p:p + L]
        # force one mismatch for odd b
        if b % 2:
            queries[b, rng.integers(0, L)] ^= 1

    ex_lo, ex_hi, mm_lo, mm_hi, _ = search_1mm(
        fmi, jnp.asarray(queries), jnp.asarray(qlens)
    )
    ex_cnt = np.maximum(0, np.asarray(ex_hi) - np.asarray(ex_lo))
    mm_cnt = np.maximum(0, np.asarray(mm_hi) - np.asarray(mm_lo)).sum(axis=(1, 2))

    # golden: count occurrences at distance 0 and exactly 1
    tstr = text
    for b in range(B):
        q = queries[b]
        d0 = d1 = 0
        for p in range(n - L + 1):
            d = int((tstr[p:p + L] != q).sum())
            if d == 0:
                d0 += 1
            elif d == 1:
                d1 += 1
        assert ex_cnt[b] == d0
        assert mm_cnt[b] == d1


def test_extend_backward_all(rng):
    n = 1024
    text = rng.integers(0, 4, size=n, dtype=np.uint8)
    fmi = build_fmindex(text).device()
    # whole-range split by first symbol == count table deltas
    lo = jnp.asarray([0], jnp.int32)
    hi = jnp.asarray([n + 1], jnp.int32)
    lo4, hi4 = extend_backward_all(fmi, lo, hi)
    cnts = np.asarray(hi4 - lo4)[0]
    want = np.bincount(text, minlength=4)
    np.testing.assert_array_equal(cnts, want)


def test_fmindex_save_load(tmp_path, rng):
    text = rng.integers(0, 4, size=512, dtype=np.uint8)
    fmi = build_fmindex(text)
    p = str(tmp_path / "idx.npz")
    fmi.save(p)
    fmi2 = FMIndex.load(p)
    np.testing.assert_array_equal(fmi.bwt_words, fmi2.bwt_words)
    assert fmi.primary == fmi2.primary and fmi.n == fmi2.n


def test_bwt_from_sa_roundtrip(rng):
    """LF-walk over the BWT reconstructs the text reversed."""
    text = rng.integers(0, 4, size=200, dtype=np.uint8)
    fmi = build_fmindex(text).device()
    # locate row of the full-text suffix: primary has SA == 0
    pos, done = locate_batch(fmi, jnp.asarray([fmi.primary], jnp.int32))
    assert np.asarray(pos)[0] == 0


def test_search_kmm_beam(rng):
    """Arbitrary-k mismatch backtracker (backtrack.h:45-172 re-design):
    a k-mutated query's true locus is recovered; k=0 matches exact search."""
    import jax.numpy as jnp

    from nvbio_tpu.fmi.index import build_fmindex
    from nvbio_tpu.fmi.search import (
        backward_search,
        locate_core,
        search_kmm,
    )

    text = rng.integers(0, 4, 3000, np.uint8)
    fmi = build_fmindex(text).device()
    L = 14
    q = text[500:500 + L].astype(np.int32)
    q2 = q.copy()
    q2[4] = (q2[4] + 1) % 4
    q2[9] = (q2[9] + 2) % 4
    qs = jnp.asarray(np.stack([q, q2]))
    lens = jnp.asarray(np.full(2, L, np.int32))

    lo, hi, nm, va = (np.asarray(x) for x in
                      search_kmm(fmi, qs, lens, k=2, max_states=32))
    found = [set() for _ in range(2)]
    for b in range(2):
        for s in range(32):
            if va[b, s] and hi[b, s] > lo[b, s]:
                rows = np.arange(lo[b, s], hi[b, s])
                pos, done = locate_core(fmi, jnp.asarray(rows, np.int32))
                found[b].update(np.asarray(pos)[np.asarray(done)].tolist())
    assert 500 in found[0]          # exact query, nm=0 state
    assert 500 in found[1]          # 2-mismatch query recovered
    assert nm[1][va[1]].min() == 2  # its cheapest state costs 2 mismatches

    # k=0 beam == exact backward search
    lo0, hi0, nm0, va0 = (np.asarray(x) for x in
                          search_kmm(fmi, qs[:1], lens[:1], k=0,
                                     max_states=4))
    elo, ehi = (np.asarray(x) for x in backward_search(fmi, qs[:1], lens[:1]))
    assert va0[0, 0] and (lo0[0, 0], hi0[0, 0]) == (elo[0], ehi[0])


def test_device_suffix_array_matches_host(rng):
    """Prefix-doubling device SA (index/device_sa.py) is bit-exact vs the
    host SA-IS across random, repeat-heavy, and degenerate texts, and
    bwt_device matches bwt_from_sa."""
    from nvbio_tpu.index.device_sa import bwt_device, suffix_array_device

    texts = [
        rng.integers(0, 4, size=997, dtype=np.uint8),        # random, odd n
        np.tile(rng.integers(0, 4, size=37, dtype=np.uint8), 60),  # repeats
        np.zeros(500, dtype=np.uint8),                       # all-same
        rng.integers(0, 4, size=8, dtype=np.uint8),          # < one key block
    ]
    for codes in texts:
        want = suffix_array(codes)
        got = suffix_array_device(codes)
        np.testing.assert_array_equal(got, want)
        bw, pr = bwt_device(codes)
        bw2, pr2 = bwt_from_sa(codes, want)
        np.testing.assert_array_equal(bw, bw2)
        assert pr == pr2


def test_build_fmindex_device_sa(rng):
    """build_fmindex over a device-computed SA produces an index identical
    to the host-built one."""
    from nvbio_tpu.index.device_sa import suffix_array_device

    codes = rng.integers(0, 4, size=2000, dtype=np.uint8)
    host = build_fmindex(codes)
    dev = build_fmindex(codes, sa=suffix_array_device(codes))
    np.testing.assert_array_equal(host.bwt_words, dev.bwt_words)
    np.testing.assert_array_equal(host.occ, dev.occ)
    np.testing.assert_array_equal(host.ssa_vals, dev.ssa_vals)
    assert host.primary == dev.primary


def test_build_fmindex_device_end_to_end(rng):
    """method="device" (SA + BWT + SSA planes all on device) reproduces the
    host-built index field-for-field, including the mark bitvector and its
    popcount prefix, for several sa_intervals and text shapes."""
    texts = [
        rng.integers(0, 4, size=3001, dtype=np.uint8),
        np.tile(rng.integers(0, 4, size=13, dtype=np.uint8), 77),
    ]
    for codes in texts:
        for K in (4, 8, 16):
            host = build_fmindex(codes, sa_interval=K)
            dev = build_fmindex(codes, sa_interval=K, method="device")
            for f in ("bwt_words", "occ", "count", "ssa_marks", "ssa_cum",
                      "ssa_vals"):
                np.testing.assert_array_equal(
                    np.asarray(getattr(host, f)), np.asarray(getattr(dev, f)),
                    err_msg=f"{f} (K={K}, n={len(codes)})")
            assert host.primary == dev.primary and host.n == dev.n


def test_shard_fmindex_device_method(rng):
    """shard_fmindex(method="device") slices equal the host-method slices."""
    from nvbio_tpu.fmi.sharded import shard_fmindex

    codes = rng.integers(0, 4, size=5000, dtype=np.uint8)
    h = shard_fmindex(codes, 4, overlap=64)
    d = shard_fmindex(codes, 4, overlap=64, method="device")
    for f in ("bwt_words", "occ", "count", "primary", "ssa_marks",
              "ssa_cum", "ssa_vals"):
        np.testing.assert_array_equal(
            np.asarray(getattr(h, f)), np.asarray(getattr(d, f)), err_msg=f)


def test_build_fmindex_device_resident(rng):
    """to_host=False keeps every plane on device and the index serves
    searches directly (the built-where-used form)."""
    import jax.numpy as jnp

    from nvbio_tpu.fmi.search import backward_search, locate_batch
    from nvbio_tpu.index.device_sa import build_fmindex_device

    codes = rng.integers(0, 4, size=2000, dtype=np.uint8)
    fd = build_fmindex_device(codes, to_host=False)
    assert isinstance(fd.bwt_words, jnp.ndarray)
    q = codes[500:520].astype(np.int32)[None, :]
    lo, hi = backward_search(fd, q, np.array([20], np.int32))
    assert int(hi[0]) - int(lo[0]) >= 1
    pos, done = locate_batch(fd, lo)
    assert bool(done[0]) and int(pos[0]) == 500


def test_shard_fmindex_parallel_jobs(rng):
    """jobs>1 (process-parallel slice builds) equals the sequential build."""
    from nvbio_tpu.fmi.sharded import shard_fmindex

    codes = rng.integers(0, 4, size=4000, dtype=np.uint8)
    a = shard_fmindex(codes, 2, overlap=64)
    b = shard_fmindex(codes, 2, overlap=64, jobs=2)
    for f in ("bwt_words", "occ", "count", "primary", "ssa_marks",
              "ssa_cum", "ssa_vals"):
        np.testing.assert_array_equal(
            np.asarray(getattr(a, f)), np.asarray(getattr(b, f)), err_msg=f)


def test_ftab_backward_search(rng):
    """ftab-jumped backward search must be bit-identical to the plain scan
    (mixed lengths: above, at, and below ftab_k)."""
    from nvbio_tpu.fmi.index import attach_ftab

    text = rng.integers(0, 4, size=3000).astype(np.uint8)
    fmi = build_fmindex(text).device()
    fmi_ft = attach_ftab(fmi, k=5)

    B, L = 64, 14
    qs = []
    for b in range(B):
        p = int(rng.integers(0, len(text) - L))
        q = text[p:p + L].astype(np.int32).copy()
        if b % 3 == 0:  # some non-matching
            q[int(rng.integers(0, L))] ^= 1
        qs.append(q)
    queries = jnp.asarray(np.stack(qs))
    qlens = jnp.asarray(
        rng.integers(3, L + 1, size=B).astype(np.int32))  # some < k

    lo0, hi0 = backward_search(fmi, queries, qlens)
    lo1, hi1 = backward_search(fmi_ft, queries, qlens)
    # sizes everywhere; values where non-empty (empty intervals freeze at
    # different garbage values in the two paths — callers mask on size)
    s0 = np.asarray(hi0 - lo0)
    np.testing.assert_array_equal(s0, np.asarray(hi1 - lo1))
    nz = s0 > 0
    assert nz.sum() > 0
    np.testing.assert_array_equal(np.asarray(lo0)[nz], np.asarray(lo1)[nz])
    np.testing.assert_array_equal(np.asarray(hi0)[nz], np.asarray(hi1)[nz])


def test_search_1mm_hybrid_vs_full(rng):
    """The hybrid (state-shared) 1-mm ranges must equal the independent
    full re-searches restricted to the approximate positions."""
    import jax

    from nvbio_tpu.fmi.search import search_1mm, search_1mm_hybrid

    text = rng.integers(0, 4, size=4000).astype(np.uint8)
    fmi = build_fmindex(text).device()
    B, L = 48, 16
    A = 8
    qs = []
    for b in range(B):
        p = int(rng.integers(0, len(text) - L))
        q = text[p:p + L].astype(np.int32).copy()
        if b % 2 == 0:  # plant a SNP in the approximate half
            q[int(rng.integers(0, A))] = (q[int(rng.integers(0, A))] + 1) % 4
        qs.append(q)
    queries = jnp.asarray(np.stack(qs))
    qlens = jnp.full((B,), L, jnp.int32)

    e_lo, e_hi, f_lo, f_hi, f_sym = jax.jit(search_1mm)(fmi, queries, qlens)
    he_lo, he_hi, h_lo, h_hi, h_sym = jax.jit(
        search_1mm_hybrid, static_argnames=("n_approx",))(
        fmi, queries, qlens, n_approx=A)
    np.testing.assert_array_equal(np.asarray(e_lo), np.asarray(he_lo))
    np.testing.assert_array_equal(np.asarray(e_hi), np.asarray(he_hi))
    np.testing.assert_array_equal(np.asarray(f_sym)[:, :A], np.asarray(h_sym))
    # range SIZES must agree everywhere; (lo, hi) values only where the
    # range is non-empty (empty intervals freeze at different garbage in
    # the two formulations — callers mask on size > 0)
    fs = np.asarray(f_hi - f_lo)[:, :A]
    hs = np.asarray(h_hi - h_lo)
    np.testing.assert_array_equal(fs, hs)
    nz = fs > 0
    np.testing.assert_array_equal(np.asarray(f_lo)[:, :A][nz],
                                  np.asarray(h_lo)[nz])
    np.testing.assert_array_equal(np.asarray(f_hi)[:, :A][nz],
                                  np.asarray(h_hi)[nz])
    # at least some planted SNPs must be recovered through a mutated range
    assert nz.sum() > 0


def test_ftab_with_hybrid_and_variable_lens(rng):
    """ftab + hybrid compose; variable qlens keep exact parity."""
    from nvbio_tpu.fmi.index import attach_ftab
    from nvbio_tpu.fmi.search import search_1mm, search_1mm_hybrid
    import jax

    text = rng.integers(0, 4, size=2500).astype(np.uint8)
    fmi = build_fmindex(text).device()
    fmi_ft = attach_ftab(fmi, k=4)
    B, L, A = 32, 12, 6
    queries = jnp.asarray(
        rng.integers(0, 4, size=(B, L)).astype(np.int32))
    qlens = jnp.asarray(rng.integers(A, L + 1, size=B).astype(np.int32))
    e0, eh0, l0, h0, _ = jax.jit(search_1mm)(fmi, queries, qlens)
    e1, eh1, l1, h1, _ = jax.jit(
        search_1mm_hybrid, static_argnames=("n_approx",))(
        fmi_ft, queries, qlens, n_approx=A)
    # exact interval: sizes everywhere, values where non-empty (the ftab
    # start makes empty intervals freeze at different garbage)
    s0 = np.asarray(eh0 - e0)
    np.testing.assert_array_equal(s0, np.asarray(eh1 - e1))
    nz0 = s0 > 0
    np.testing.assert_array_equal(np.asarray(e0)[nz0], np.asarray(e1)[nz0])
    fs = np.asarray(h0 - l0)[:, :A]
    hs = np.asarray(h1 - l1)
    np.testing.assert_array_equal(fs, hs)
    nz = fs > 0
    np.testing.assert_array_equal(np.asarray(l0)[:, :A][nz],
                                  np.asarray(l1)[nz])


def test_device_sa_tie_paths(rng):
    """The tie-compacted doubling (group-start ranks, subset resolution)
    and the full-plane fallback must both match SA-IS bit-for-bit on
    repeat-heavy and pathological run texts."""
    from nvbio_tpu.index.device_sa import suffix_array_device
    from nvbio_tpu.index.sa import suffix_array

    unit = rng.integers(0, 4, size=37).astype(np.uint8)
    dup = rng.integers(0, 4, size=100).astype(np.uint8)
    cases = {
        # one duplicated 100-mer in random context: a handful of long
        # ties -> the HOST direct-comparison path (_host_tie_order)
        "host_ties": np.concatenate([
            dup, rng.integers(0, 4, 30_000).astype(np.uint8), dup]),
        # tandem + dispersed copies: thousands of long ties (compact path)
        "repeats": np.concatenate([
            np.tile(unit, 200), rng.integers(0, 4, 20_000).astype(np.uint8),
            np.tile(unit, 60)]),
        # homopolymer runs: ties overflow any subset (fallback path)
        "runs": np.concatenate([
            np.zeros(30_000, np.uint8), np.ones(15_000, np.uint8),
            rng.integers(0, 4, size=2_000).astype(np.uint8)]),
        "all_same": np.zeros(20_000, np.uint8),
    }
    for name, t in cases.items():
        got = suffix_array_device(t)
        want = suffix_array(t)
        assert np.array_equal(got, want), name
    # force the FULL-PLANE doubling fallback explicitly (the capacity
    # ladder would otherwise absorb these tie counts on a compacted rung)
    import nvbio_tpu.index.device_sa as dsa

    old_caps, old_host = dsa._TIE_CAPS, dsa._HOST_TIE_CAP
    dsa._TIE_CAPS, dsa._HOST_TIE_CAP = (), 0
    try:
        t = cases["runs"]
        assert np.array_equal(suffix_array_device(t), suffix_array(t))
    finally:
        dsa._TIE_CAPS, dsa._HOST_TIE_CAP = old_caps, old_host


def test_search_1mm_hybrid_topk(rng):
    """The top-K compacted hybrid keeps exactly the nonempty branch
    ranges of the full hybrid (as (lo, hi) multisets) whenever the
    per-seed survivor count fits K, and never invents ranges."""
    import jax

    from nvbio_tpu.fmi.search import search_1mm_hybrid, search_1mm_hybrid_topk

    text = rng.integers(0, 4, size=4000).astype(np.uint8)
    fmi = build_fmindex(text).device()
    B, L, A, K = 48, 16, 8, 8
    qs = []
    for b in range(B):
        p = int(rng.integers(0, len(text) - L))
        q = text[p:p + L].astype(np.int32).copy()
        if b % 2 == 0:
            q[int(rng.integers(0, A))] = (q[int(rng.integers(0, A))] + 1) % 4
        qs.append(q)
    queries = jnp.asarray(np.stack(qs))
    qlens = jnp.full((B,), L, jnp.int32)

    he_lo, he_hi, h_lo, h_hi, _ = jax.jit(
        search_1mm_hybrid, static_argnames=("n_approx",))(
        fmi, queries, qlens, n_approx=A)
    te_lo, te_hi, t_lo, t_hi = jax.jit(
        search_1mm_hybrid_topk, static_argnames=("n_approx", "K"))(
        fmi, queries, qlens, n_approx=A, K=K)
    np.testing.assert_array_equal(np.asarray(he_lo), np.asarray(te_lo))
    np.testing.assert_array_equal(np.asarray(he_hi), np.asarray(te_hi))
    h_lo, h_hi = np.asarray(h_lo).reshape(B, -1), np.asarray(h_hi).reshape(B, -1)
    t_lo, t_hi = np.asarray(t_lo), np.asarray(t_hi)
    found_any = 0
    for b in range(B):
        want = sorted((int(l), int(h)) for l, h in zip(h_lo[b], h_hi[b])
                      if h > l)
        got = sorted((int(l), int(h)) for l, h in zip(t_lo[b], t_hi[b])
                     if h > l)
        if len(want) <= K:
            assert got == want, b
        else:
            assert len(got) == K
            for r in got:
                assert r in want, b
        found_any += len(got)
    assert found_any > 0
