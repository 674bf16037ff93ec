"""Options, host DAG pipeline, batched priority queue, TXT input."""

import numpy as np
import pytest

from nvbio_tpu.priority import NEG_INF, BatchPriorityQueue
from nvbio_tpu.utils.options import Options, apply_to_params
from nvbio_tpu.utils.pipeline import Pipeline, PipelineStage


def test_options_parse_and_types(tmp_path):
    o = Options(["seed_len=20", "verbose", "ratio=0.5", "name=foo"])
    assert o.uint("seed_len") == 20
    assert o.flag("verbose")
    assert o.float("ratio") == 0.5
    assert o.string("name") == "foo"
    assert o.uint("missing", 7) == 7
    assert not o.flag("missing")
    p = tmp_path / "cfg"
    p.write_text("# comment\nmax_dist = 5\nmate_rescue = false\n\nseed_len=18\n")
    o2 = Options.load(str(p))
    assert o2.int("max_dist") == 5
    assert not o2.flag("mate_rescue")
    assert o2.int("seed_len") == 18


def test_options_apply_to_params():
    from nvbio_tpu.bowtie.params import MapParams

    p = MapParams(max_read_len=100)
    o = Options(["seed_len=18", "max_dist=5", "mate_rescue=0"])
    p2 = apply_to_params(o, p)
    assert p2.seed_len == 18 and p2.max_dist == 5 and not p2.mate_rescue
    assert p2.max_read_len == 100  # untouched
    assert p.seed_len != 18  # original unchanged


def test_pipeline_dag_order_and_backpressure():
    log = []

    class Src(PipelineStage):
        def source(self):
            for i in range(20):
                log.append(("s", i))
                yield i

    class Double(PipelineStage):
        def process(self, x):
            return x * 2

    class Sink(PipelineStage):
        def process(self, x):
            return x + 1

    pl = Pipeline()
    pl.append_stage(Src(), buffers=2)
    pl.append_stage(Double(), buffers=2)
    pl.append_sink(Sink())
    out = pl.run()
    assert out == [i * 2 + 1 for i in range(20)]


def test_pipeline_propagates_errors():
    class Src(PipelineStage):
        def source(self):
            yield 1

    class Boom(PipelineStage):
        def process(self, x):
            raise ValueError("boom")

    pl = Pipeline()
    pl.append_stage(Src())
    pl.append_sink(Boom())
    with pytest.raises(ValueError):
        pl.run()


def test_pipeline_error_does_not_deadlock():
    # the failing stage stops consuming while the producer streams many more
    # items than its bounded queue holds — run() must still raise promptly
    class Src(PipelineStage):
        def source(self):
            for i in range(1000):
                yield i

    class BoomEarly(PipelineStage):
        def process(self, x):
            if x >= 3:
                raise ValueError("boom")
            return x

    class Sink(PipelineStage):
        def process(self, x):
            return x

    pl = Pipeline()
    pl.append_stage(Src(), buffers=2)
    pl.append_stage(BoomEarly(), buffers=2)
    pl.append_sink(Sink(), buffers=2)
    import time

    t0 = time.time()
    with pytest.raises(ValueError):
        pl.run()
    assert time.time() - t0 < 10


def test_priority_queue_push_pop():
    q = BatchPriorityQueue.make(3, 4)
    keys = np.array([[5, 1, 9, 3, 7], [1, 2, 3, 4, 5], [9, 9, 2, 9, 1]])
    for j in range(5):
        q = q.push(keys[:, j], np.full(3, j, np.int32))
    # capacity 4: top-4 kept, sorted descending
    np.testing.assert_array_equal(q.keys[0], [9, 7, 5, 3])
    np.testing.assert_array_equal(q.keys[1], [5, 4, 3, 2])
    np.testing.assert_array_equal(q.keys[2], [9, 9, 9, 2])
    bk, bv = q.best()
    assert bk[0] == 9 and bv[0] == 2  # value = push index of key 9
    wk, _ = q.worst()
    np.testing.assert_array_equal(wk, [3, 2, 2])
    (k0, v0), q2 = q.pop_best()
    np.testing.assert_array_equal(k0, [9, 5, 9])
    np.testing.assert_array_equal(q2.keys[:, 0], [7, 4, 9])
    np.testing.assert_array_equal(q2.size(), [3, 3, 3])


def test_priority_queue_wide_push():
    """An M-wide push equals M sequential pushes (the beam-frontier form
    used by fmi.search.search_kmm)."""
    rng = np.random.default_rng(3)
    keys = rng.integers(-50, 50, size=(4, 9)).astype(np.int32)
    vals = np.broadcast_to(np.arange(9, dtype=np.int32), (4, 9)).copy()
    mask = rng.random((4, 9)) < 0.7
    wide = BatchPriorityQueue.make(4, 3).push(keys, vals, mask=mask)
    seq = BatchPriorityQueue.make(4, 3)
    for j in range(9):
        seq = seq.push(keys[:, j], vals[:, j], mask=mask[:, j])
    np.testing.assert_array_equal(wide.keys, seq.keys)
    # equal keys may order differently between wide/sequential; values must
    # agree wherever keys are distinct
    distinct = np.sum(wide.keys[:, :, None] == wide.keys[:, None, :],
                      axis=2) == 1
    np.testing.assert_array_equal(wide.values[distinct], seq.values[distinct])


def test_priority_queue_mask_and_empty():
    q = BatchPriorityQueue.make(2, 2)
    q = q.push(np.array([5, 6]), np.array([0, 0]),
               mask=np.array([True, False]))
    assert q.size().tolist() == [1, 0]
    assert q.keys[1, 0] == NEG_INF


def test_txt_read_batches(tmp_path):
    from nvbio_tpu.io.fastq import fastq_batches

    p = tmp_path / "reads.txt"
    p.write_text("ACGT\nGGCCTT\nA\n")
    batches = list(fastq_batches(str(p), 4, 8))
    assert len(batches) == 1
    b = batches[0]
    assert b.lengths.tolist() == [4, 6, 1, 0]
    assert b.names[0] == "read0"
    assert b.codes[1, :6].tolist() == [2, 2, 1, 1, 3, 3]


def test_fastq_truncated_records(tmp_path):
    from nvbio_tpu.io.fastq import fastq_batches

    # complete record + record truncated after '+' (no quality line)
    p = tmp_path / "t.fq"
    p.write_bytes(b"@r0\nACGT\n+\nIIII\n@r1\nGGGG\n+")
    batches = list(fastq_batches(str(p), 4, 8))
    b = batches[0]
    assert b.names[0] == "r0"
    assert (b.lengths > 0).sum() == 1  # partial record dropped
