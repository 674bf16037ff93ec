"""Compile-count audit for the hot entry points (VERDICT r4 item 7).

Silent retraces are how the 240 s ftab regression and the 968 s first
index build happened: a Python-level loop that bakes a traced value into
a static argument recompiles per iteration, and nothing fails — the run
just gets catastrophically slow on the remote-compile relay. These tests
pin (a) that a SECOND identical call compiles ZERO new programs, and
(b) a generous upper bound on the first-call program count (a
level-per-compile regression is O(levels) and blows through it).

Compile counting: ``jax_log_compiles`` emits one
"Compiling jit(<name>) ..." record per XLA compilation on the
``jax._src.interpreters.pxla`` logger.
"""

import logging
from contextlib import contextmanager

import jax
import numpy as np
import pytest

from nvbio_tpu.alphabet import Alphabet, codes_to_string
from nvbio_tpu.bowtie import MapParams, ReadMapper
from nvbio_tpu.io.fastq import ReadBatch
from nvbio_tpu.io.reference import Reference


@contextmanager
def count_compiles(box):
    records = []

    class H(logging.Handler):
        def emit(self, r):
            m = r.getMessage()
            if m.startswith("Compiling "):
                records.append(m)

    h = H()
    logger = logging.getLogger("jax._src.interpreters.pxla")
    old_level = logger.level
    logger.addHandler(h)
    logger.setLevel(logging.DEBUG)
    old = jax.config.jax_log_compiles
    jax.config.update("jax_log_compiles", True)
    try:
        yield records
    finally:
        jax.config.update("jax_log_compiles", old)
        logger.removeHandler(h)
        logger.setLevel(old_level)
    box.extend(records)


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def _batch(rng, codes, B=32, L=60):
    reads = np.stack([codes[p:p + L] for p in
                      rng.integers(0, len(codes) - L, size=B)])
    return ReadBatch(names=[f"r{i}" for i in range(B)],
                     codes=reads.astype(np.uint8),
                     quals=np.full((B, L), 30, np.uint8),
                     lengths=np.full(B, L, np.int32))


def test_device_index_build_compile_counts(rng):
    """build_fmindex_device: a fixed handful of programs, and ZERO new
    compiles on a second same-shape build (shape-keyed retrace = the
    968 s first-build pathology)."""
    from nvbio_tpu.index.device_sa import build_fmindex_device

    codes = rng.integers(0, 4, size=60_000, dtype=np.uint8)
    first, second = [], []
    with count_compiles(first):
        build_fmindex_device(codes, sa_interval=4)
    assert 1 <= len(first) <= 16, first
    with count_compiles(second):
        build_fmindex_device(codes, sa_interval=4)
    assert second == [], second


def test_ftab_attach_compile_counts(rng):
    """attach_ftab must build every level inside ONE jit (the historical
    regression compiled one program per k level)."""
    from nvbio_tpu.fmi.index import attach_ftab, build_fmindex

    codes = rng.integers(0, 4, size=30_000, dtype=np.uint8)
    fmi = build_fmindex(codes).device()
    cc = []
    with count_compiles(cc):
        attach_ftab(fmi, k=7)
    assert len(cc) <= 4, cc


def test_map_batch_compile_counts(rng):
    """ReadMapper.map_batch: fixed program count per (shape, params)
    config; repeat batches of the same shape retrace NOTHING."""
    codes = rng.integers(0, 4, size=50_000, dtype=np.uint8)
    ref = Reference.from_records(
        [("chr_t", codes_to_string(codes, Alphabet.DNA))])
    params = MapParams(max_read_len=60, seed_len=20, seed_stride=12,
                       hits_per_seed=4, max_dist=5)
    mapper = ReadMapper.build(ref, params)
    first, second = [], []
    with count_compiles(first):
        mapper.map_batch(_batch(rng, codes))
    assert 1 <= len(first) <= 24, first
    with count_compiles(second):
        mapper.map_batch(_batch(rng, codes))
    assert second == [], second


def test_blockwise_bwt_compile_counts(rng):
    """blockwise_bwt: the whole multi-superblock decomposition runs on a
    fixed program set; a second build of the same shape compiles
    nothing (each extra program costs 10-300 s on the remote relay)."""
    from nvbio_tpu.index.blockwise import blockwise_bwt

    codes = rng.integers(0, 4, size=40_000, dtype=np.uint8)
    kw = dict(chunk=1 << 13, sb_cap=1 << 14, blk=1 << 12)
    first, second = [], []
    with count_compiles(first):
        blockwise_bwt(codes, **kw)
    assert 1 <= len(first) <= 16, first
    with count_compiles(second):
        blockwise_bwt(codes, **kw)
    assert second == [], second
