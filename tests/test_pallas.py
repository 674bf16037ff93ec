"""Pallas kernel parity vs the scan-based scorer (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from nvbio_tpu.align.batch import batch_score_banded
from nvbio_tpu.align.pallas_kernels import banded_score_semiglobal_pallas
from nvbio_tpu.align.types import SEMI_GLOBAL, GotohAligner, GotohScoring

SC = GotohScoring(0, -6, -8, -3, -8, -3)


def test_pallas_banded_parity(rng):
    B, M, W = 64, 50, 11
    TW = M + W - 1
    pats = rng.integers(0, 4, size=(B, M)).astype(np.int32)
    txts = rng.integers(0, 4, size=(B, TW)).astype(np.int32)
    # make half of them real alignments
    txts[: B // 2, 5:5 + M] = pats[: B // 2]
    plens = rng.integers(M // 2, M + 1, size=B).astype(np.int32)
    tlens = np.full(B, TW, np.int32)
    mm = -rng.integers(2, 7, size=(B, M)).astype(np.int32)

    want = batch_score_banded(
        jnp.asarray(pats), jnp.asarray(plens), jnp.asarray(txts),
        jnp.asarray(tlens), GotohAligner(SEMI_GLOBAL, SC), W,
        mismatch_scores=jnp.asarray(mm),
    )
    got_s, got_k = banded_score_semiglobal_pallas(
        jnp.asarray(pats), jnp.asarray(plens), jnp.asarray(txts),
        jnp.asarray(tlens), SC, W, mismatch_scores=jnp.asarray(mm),
        block=128, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got_s), np.asarray(want.score))


def test_pallas_banded_no_quals(rng):
    B, M, W = 32, 30, 9
    TW = M + W - 1
    pats = rng.integers(0, 4, size=(B, M)).astype(np.int32)
    txts = rng.integers(0, 4, size=(B, TW)).astype(np.int32)
    plens = np.full(B, M, np.int32)
    tlens = np.full(B, TW, np.int32)
    want = batch_score_banded(
        jnp.asarray(pats), jnp.asarray(plens), jnp.asarray(txts),
        jnp.asarray(tlens), GotohAligner(SEMI_GLOBAL, SC), W,
    )
    got_s, _ = banded_score_semiglobal_pallas(
        jnp.asarray(pats), jnp.asarray(plens), jnp.asarray(txts),
        jnp.asarray(tlens), SC, W, block=128, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got_s), np.asarray(want.score))


def test_fused_traceback_parity(rng):
    """Fused Pallas traceback (forward + in-VMEM walk) vs the generic
    scan-based traceback: scores, op sequences, spans, and NM must match."""
    from nvbio_tpu.align.traceback import (
        batch_traceback_banded,
        batch_traceback_banded_fast,
        cigar_to_string,
    )

    B, M, W = 48, 40, 11
    TW = M + W - 1
    pats = rng.integers(0, 4, size=(B, M)).astype(np.int32)
    txts = rng.integers(0, 4, size=(B, TW)).astype(np.int32)
    for b in range(0, B, 2):  # half are real alignments, some with an indel
        t = txts[b, 4:4 + M].copy()
        if b % 4 == 0 and M > 12:
            t = np.concatenate([t[:10], t[11:], t[-1:]])
        pats[b] = t[:M]
    plens = rng.integers(M // 2, M + 1, size=B).astype(np.int32)
    tlens = np.full(B, TW, np.int32)
    mm = -rng.integers(2, 7, size=(B, M)).astype(np.int32)

    aligner = GotohAligner(SEMI_GLOBAL, SC)
    ref = batch_traceback_banded(
        jnp.asarray(pats), jnp.asarray(plens), jnp.asarray(txts),
        jnp.asarray(tlens), aligner, W, jnp.asarray(mm))
    fast, nm = batch_traceback_banded_fast(
        jnp.asarray(pats), jnp.asarray(plens), jnp.asarray(txts),
        jnp.asarray(tlens), SC, W, jnp.asarray(mm), interpret=True)

    np.testing.assert_array_equal(np.asarray(ref.score), np.asarray(fast.score))
    np.testing.assert_array_equal(np.asarray(ref.n_ops), np.asarray(fast.n_ops))
    np.testing.assert_array_equal(np.asarray(ref.text_start),
                                  np.asarray(fast.text_start))
    # fast ops are end->start; CIGARs must agree after host reversal
    for b in range(B):
        want = cigar_to_string(np.asarray(ref.ops)[b], int(ref.n_ops[b]))
        got = cigar_to_string(np.asarray(fast.ops)[b], int(fast.n_ops[b]),
                              reverse=True)
        assert want == got, f"read {b}: {want} != {got}"
    # NM parity vs recompute from the reference walk
    ro = np.asarray(ref.ops)
    for b in range(B):
        pc = int(np.asarray(ref.pattern_start)[b])
        tc = int(np.asarray(ref.text_start)[b])
        want_nm = 0
        for o in ro[b][:int(ref.n_ops[b])]:
            if o == 1:
                want_nm += int(pats[b, pc] != txts[b, tc]); pc += 1; tc += 1
            elif o == 2:
                want_nm += 1; pc += 1
            else:
                want_nm += 1; tc += 1
        assert int(nm[b]) == want_nm, b


def test_fused_traceback_local_parity(rng):
    """LOCAL mode of the fused kernel vs the generic traceback."""
    from nvbio_tpu.align.traceback import (
        batch_traceback_banded,
        batch_traceback_banded_fast,
        cigar_to_string,
    )
    from nvbio_tpu.align.types import LOCAL

    SCL = GotohScoring(2, -3, -5, -2, -5, -2)
    B, M, W = 64, 40, 11
    TW = M + W - 1
    pats = rng.integers(0, 4, size=(B, M)).astype(np.int32)
    txts = rng.integers(0, 4, size=(B, TW)).astype(np.int32)
    for b in range(0, B, 2):  # half have a real local core
        s = int(rng.integers(0, 5))
        ln = int(rng.integers(10, M - 5))
        txts[b, 5:5 + ln] = pats[b, s:s + ln]
    plens = rng.integers(M // 2, M + 1, size=B).astype(np.int32)
    tlens = np.full(B, TW, np.int32)

    ref = batch_traceback_banded(
        jnp.asarray(pats), jnp.asarray(plens), jnp.asarray(txts),
        jnp.asarray(tlens), GotohAligner(LOCAL, SCL), W)
    fast, _nm = batch_traceback_banded_fast(
        jnp.asarray(pats), jnp.asarray(plens), jnp.asarray(txts),
        jnp.asarray(tlens), SCL, W, interpret=True, local=True)
    for name in ("score", "n_ops", "pattern_start", "pattern_end",
                 "text_start", "text_end"):
        np.testing.assert_array_equal(
            np.asarray(getattr(ref, name)), np.asarray(getattr(fast, name)),
            err_msg=name)
    for b in range(B):
        want = cigar_to_string(np.asarray(ref.ops)[b], int(ref.n_ops[b]))
        got = cigar_to_string(np.asarray(fast.ops)[b], int(fast.n_ops[b]),
                              reverse=True)
        assert want == got, (b, want, got)


def test_fused_traceback_max_read_len_512(rng):
    """Fused traceback at the reference's MAX_READ_LEN=512 (defs.h:96):
    correctness at the full supported length, including indel reads."""
    from nvbio_tpu.align.traceback import (
        batch_traceback_banded,
        batch_traceback_banded_fast,
        cigar_to_string,
    )

    B, M, W = 8, 512, 17
    TW = M + W - 1
    pats = rng.integers(0, 4, size=(B, M)).astype(np.int32)
    txts = rng.integers(0, 4, size=(B, TW)).astype(np.int32)
    for b in range(B):
        t = txts[b, 6:6 + M].copy()
        if b % 2 == 0:
            t = np.concatenate([t[:200], t[203:], t[-3:]])  # 3bp indel
        pats[b] = t[:M]
        mut = rng.integers(0, M, 5)
        pats[b, mut] = (pats[b, mut] + 1) % 4
    plens = np.full(B, M, np.int32)
    tlens = np.full(B, TW, np.int32)

    ref = batch_traceback_banded(
        jnp.asarray(pats), jnp.asarray(plens), jnp.asarray(txts),
        jnp.asarray(tlens), GotohAligner(SEMI_GLOBAL, SC), W)
    fast, nm = batch_traceback_banded_fast(
        jnp.asarray(pats), jnp.asarray(plens), jnp.asarray(txts),
        jnp.asarray(tlens), SC, W, interpret=True)
    np.testing.assert_array_equal(np.asarray(ref.score), np.asarray(fast.score))
    for b in range(B):
        want = cigar_to_string(np.asarray(ref.ops)[b], int(ref.n_ops[b]))
        got = cigar_to_string(np.asarray(fast.ops)[b], int(fast.n_ops[b]),
                              reverse=True)
        assert want == got, b


def test_fused_traceback_checkpointed_stripes(rng):
    """Checkpointed (striped) traceback — the TPU re-design of the
    reference's CHECKPOINTS-spaced direction submatrices
    (nvbio/alignment/alignment.h:544-671) — must be bit-exact vs the
    single-plane kernel AND the generic scan walk, for semiglobal and
    local modes, across stripe heights that do and don't divide L."""
    from nvbio_tpu.align.pallas_kernels import (
        banded_traceback_semiglobal_pallas,
    )
    from nvbio_tpu.align.traceback import (
        batch_traceback_banded,
        cigar_to_string,
    )
    from nvbio_tpu.align.types import LOCAL

    B, M, W = 24, 72, 9
    TW = M + W - 1
    pats = rng.integers(0, 4, size=(B, M)).astype(np.int32)
    txts = rng.integers(0, 4, size=(B, TW)).astype(np.int32)
    for b in range(0, B, 2):  # real alignments, some with indels
        t = txts[b, 4:4 + M].copy()
        if b % 4 == 0:
            t = np.concatenate([t[:30], t[32:], t[-2:]])  # 2bp indel
        pats[b] = t[:M]
        mut = rng.integers(0, M, 3)
        pats[b, mut] = (pats[b, mut] + 1) % 4
    plens = rng.integers(M // 2, M + 1, size=B).astype(np.int32)
    tlens = np.full(B, TW, np.int32)

    for local in (False, True):
        sc = GotohScoring(2, -3, -5, -2, -5, -2) if local else SC
        base = banded_traceback_semiglobal_pallas(
            jnp.asarray(pats), jnp.asarray(plens), jnp.asarray(txts),
            jnp.asarray(tlens), sc, W, interpret=True, local=local,
            stripe=M)  # single stripe == the unstriped kernel
        for st in (16, 24, 48):  # 16/24 divide Lp=72 unevenly/evenly
            got = banded_traceback_semiglobal_pallas(
                jnp.asarray(pats), jnp.asarray(plens), jnp.asarray(txts),
                jnp.asarray(tlens), sc, W, interpret=True, local=local,
                stripe=st)
            for a, g, nm_ in zip(base, got,
                                 ("score", "kbest", "ops", "nops", "kfin",
                                  "nm", "iend", "istart")):
                np.testing.assert_array_equal(
                    np.asarray(a), np.asarray(g),
                    err_msg=f"local={local} stripe={st} field={nm_}")
        # cross-check the striped result against the generic scan walk
        aligner = GotohAligner(LOCAL if local else SEMI_GLOBAL, sc)
        ref = batch_traceback_banded(
            jnp.asarray(pats), jnp.asarray(plens), jnp.asarray(txts),
            jnp.asarray(tlens), aligner, W)
        got = banded_traceback_semiglobal_pallas(
            jnp.asarray(pats), jnp.asarray(plens), jnp.asarray(txts),
            jnp.asarray(tlens), sc, W, interpret=True, local=local,
            stripe=24)
        np.testing.assert_array_equal(np.asarray(ref.score),
                                      np.asarray(got[0]))
        n_ops = np.asarray(got[3])
        for b in range(B):
            want = cigar_to_string(np.asarray(ref.ops)[b], int(ref.n_ops[b]))
            have = cigar_to_string(np.asarray(got[2])[b], int(n_ops[b]),
                                   reverse=True)
            assert want == have, (local, b, want, have)


def test_tb_vmem_plan():
    """The VMEM planner must (a) keep the L=100 hot path at a full-width
    single plane, (b) keep the reference's MAX_READ_LEN=512 (defs.h:96)
    single-plane too (v5e VMEM comfortably holds it once the scoped limit
    is raised), (c) engage checkpointed striping rather than narrowing the
    block once the plane outgrows VMEM (L >= ~2k), and (d) never plan past
    the budget it promises (including double-buffered in/out blocks)."""
    from nvbio_tpu.align.pallas_kernels import (
        _ROWS,
        _TB_VMEM_BUDGET,
        _round_up,
        _tb_bytes,
        _tb_vmem_plan,
    )

    blk, stripe, s = _tb_vmem_plan(100, 31, 32768, 512)
    assert s == 1 and blk == 512  # hot path: unchanged single plane
    for M in (512, 1024):
        blk, stripe, s = _tb_vmem_plan(M, 31, 4096, 512)
        assert blk >= 512 and s == 1, (M, blk, s)
        assert _tb_bytes(M, 31, 4096, blk, stripe, s) <= _TB_VMEM_BUDGET
    for M in (2048, 4096):
        blk, stripe, s = _tb_vmem_plan(M, 31, 4096, 512)
        assert blk >= 512, (M, blk)   # stripe rather than narrow the block
        assert s > 1 and stripe % _ROWS == 0
        assert s * stripe >= _round_up(M, _ROWS)
        assert _tb_bytes(M, 31, 4096, blk, stripe, s) <= _TB_VMEM_BUDGET
