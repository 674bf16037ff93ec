"""Aux subsystem tests: trie, persist/checksums, shared-memory serving."""

import numpy as np
import jax.numpy as jnp

from nvbio_tpu.trie import CsrTrie, SortedDictionary, pack_keys
from nvbio_tpu.utils.persist import checksum, checksum_tree, diff_persisted, persist
from nvbio_tpu.io.server import export_shared, load_shared


def test_sorted_dictionary(rng):
    strings = [rng.integers(0, 4, size=rng.integers(3, 10)).tolist()
               for _ in range(50)]
    d = SortedDictionary.build(strings)
    qk = pack_keys(strings[:10])
    hit, pay = d.find(qk)
    assert hit.all()
    # payloads map back to the original strings
    for q, p in zip(strings[:10], pay):
        assert strings[int(p)] == q
    miss = pack_keys([[3] * 10])
    hit2, _ = d.find(miss)
    if any(s == [3] * 10 for s in strings):
        assert hit2.all()
    # device lookups agree
    dd = d.device()
    hd, _ = dd.find(jnp.asarray(qk))
    assert np.asarray(hd).all()


def test_prefix_range(rng):
    strings = [[0, 1, 2], [0, 1, 3], [0, 2, 0], [1, 0, 0]]
    d = SortedDictionary.build(strings)
    lo, hi = d.prefix_range([0, 1])
    assert hi - lo == 2


def test_csr_trie(rng):
    strings = [rng.integers(0, 4, size=6).tolist() for _ in range(20)]
    t = CsrTrie.build(strings)
    q = np.array(strings[:8], dtype=np.int32)
    pay = np.asarray(t.walk(q, np.full(8, 6, np.int32)))
    for i, p in enumerate(pay):
        assert strings[int(p)] == strings[i]


def test_checksum_order_invariant(rng):
    a = rng.integers(0, 1 << 30, size=1000).astype(np.int32)
    b = a.copy()
    rng.shuffle(b)
    assert checksum(a) == checksum(b)
    b[0] ^= 1
    assert checksum(a) != checksum(b)


def test_persist_diff(tmp_path, rng):
    tree = {"x": rng.integers(0, 100, size=64), "y": rng.random(16)}
    persist(str(tmp_path / "runA"), "stage1", tree)
    tree2 = dict(tree)
    tree2["x"] = tree["x"].copy()
    tree2["x"][3] += 1
    persist(str(tmp_path / "runB"), "stage1", tree2)
    d = diff_persisted(
        str(tmp_path / "runA.stage1.npz"), str(tmp_path / "runB.stage1.npz")
    )
    assert d["x"] == 1 and d["y"] == 0
    cs = checksum_tree(tree)
    assert set(cs) == {"x", "y"}


def test_shared_export(tmp_path, rng):
    from nvbio_tpu.qgram import QGramIndex, build_qgram_index

    codes = rng.integers(0, 4, size=2000, dtype=np.uint8)
    idx = build_qgram_index(codes, 6)
    export_shared(str(tmp_path), "qg", idx)
    loaded = load_shared(str(tmp_path), "qg", QGramIndex)
    assert isinstance(loaded.offsets, np.memmap)
    np.testing.assert_array_equal(np.asarray(loaded.offsets), idx.offsets)
    assert loaded.q == idx.q and loaded.n == idx.n


def test_fm_server_live(tmp_path):
    """Live FM-server handshake: PING/LIST/GET over the Unix socket, client
    mmaps the served arrays (nvFM-server / mmap.h:93-158 equivalent)."""
    import threading

    import numpy as np

    from nvbio_tpu.io.server import FMClient, FMServer, export_shared
    from nvbio_tpu.qgram import QGramIndex, build_qgram_index

    codes = np.random.default_rng(1).integers(0, 4, 4000, np.uint8)
    idx = build_qgram_index(codes, 6)
    d = str(tmp_path / "shared")
    export_shared(d, "qgramindex", idx)
    sock = str(tmp_path / "fm.sock")
    server = FMServer(d, sock).start()
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        client = FMClient(sock, d)
        assert client.ping()
        assert client.list() == ["qgramindex"]
        got = client.get("qgramindex", QGramIndex)
        assert got.q == idx.q and got.n == idx.n
        np.testing.assert_array_equal(np.asarray(got.positions),
                                      np.asarray(idx.positions))
        np.testing.assert_array_equal(np.asarray(got.offsets),
                                      np.asarray(idx.offsets))
    finally:
        server.stop()
        t.join(timeout=2)


def test_debug_output_roundtrip(tmp_path):
    """DebugOutput binary diagnostic records (output_debug.h equivalent)."""
    import numpy as np

    from nvbio_tpu.io.debug import DebugOutput, read_debug

    B = 16
    rng = np.random.default_rng(2)
    res = dict(
        mapped=rng.random(B) < 0.8,
        strand=rng.random(B) < 0.5,
        mapq=rng.integers(0, 61, B),
        nm=rng.integers(0, 9, B),
        has_second=rng.random(B) < 0.3,
        best_score=-rng.integers(0, 60, B).astype(np.int32),
        second_score=-rng.integers(0, 90, B).astype(np.int32),
    )
    refids = rng.integers(0, 3, B)
    pos = rng.integers(0, 100000, B)
    p = str(tmp_path / "d.dbg")
    with DebugOutput(p) as d:
        d.process_batch(res, refids, pos)
        d.process_batch(res, refids, pos)
    back = read_debug(p)
    assert len(back) == 2 * B
    np.testing.assert_array_equal(back["read_id"][:B], np.arange(B))
    np.testing.assert_array_equal(back["read_id"][B:], B + np.arange(B))
    np.testing.assert_array_equal(back["mapq"][:B], res["mapq"])
    np.testing.assert_array_equal(back["score"][:B], res["best_score"])
    got_unmapped = (back["flag"][:B] & 4) > 0
    np.testing.assert_array_equal(got_unmapped, ~res["mapped"])


def test_debug_output_subs_ins_dels(tmp_path):
    """End-to-end: reads with a substitution / insertion / deletion produce
    nonzero subs/ins/dels in the DebugOutput records (the split
    output_debug.h records, computed on device in finalize_best)."""
    import numpy as np

    from nvbio_tpu.bowtie.params import MapParams
    from nvbio_tpu.bowtie.pipeline import ReadMapper
    from nvbio_tpu.io.debug import DebugOutput, read_debug
    from nvbio_tpu.io.fastq import ReadBatch
    from nvbio_tpu.io.reference import Reference
    from nvbio_tpu.alphabet import codes_to_string
    from nvbio_tpu.apps.map_app import _dump_debug

    rng = np.random.default_rng(5)
    n = 30000
    codes = rng.integers(0, 4, size=n, dtype=np.uint8)
    ref = Reference.from_records([("chrD", codes_to_string(codes))])
    L = 80
    B = 8
    starts = rng.integers(100, n - L - 100, size=B)
    reads = np.stack([codes[s:s + L] for s in starts]).astype(np.uint8)
    # read 0: clean; read 1: 2 substitutions; read 2: 1-bp deletion from the
    # reference (skip a genome base); read 3: 1-bp insertion
    reads[1, 20] = (reads[1, 20] + 1) % 4
    reads[1, 50] = (reads[1, 50] + 2) % 4
    s = int(starts[2])
    reads[2] = np.concatenate([codes[s:s + 40], codes[s + 41:s + L + 1]])
    s = int(starts[3])
    reads[3] = np.concatenate(
        [codes[s:s + 40], [(codes[s + 40] + 1) % 4], codes[s + 40:s + L - 1]])
    batch = ReadBatch(
        names=[f"r{i}" for i in range(B)], codes=reads,
        quals=np.full((B, L), 30, np.uint8), lengths=np.full(B, L, np.int32))
    mapper = ReadMapper.build(ref, MapParams(
        max_read_len=L, seed_len=20, seed_stride=15, hits_per_seed=4,
        max_dist=5, max_reseed=0))
    res = mapper.dispatch(batch)
    p = str(tmp_path / "sid.dbg")
    with DebugOutput(p) as d:
        _dump_debug(d, mapper, res)
    back = read_debug(p)
    assert (back["flag"][:4] & 4 == 0).all(), "first 4 reads must map"
    assert back["subs"][0] == 0 and back["ins"][0] == 0 and back["dels"][0] == 0
    assert back["subs"][1] == 2 and back["ed"][1] == 2
    assert back["dels"][2] == 1, back[2]
    assert back["ins"][3] == 1, back[3]
