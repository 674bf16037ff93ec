"""Error-corrector tests (nvLighter equivalent): simulated 30x coverage."""

import numpy as np
import jax.numpy as jnp

from nvbio_tpu.lighter import LighterParams, correct_batch


def test_error_correction(rng):
    n, L = 20000, 100
    genome = rng.integers(0, 4, size=n, dtype=np.uint8)
    cov = 30
    B = n * cov // L  # ~6000 reads
    starts = rng.integers(0, n - L, size=B)
    reads = genome[starts[:, None] + np.arange(L)].astype(np.int32)
    truth = reads.copy()

    # plant exactly one error in half the reads (away from the edges)
    err_rows = np.arange(0, B, 2)
    err_pos = rng.integers(20, L - 20, size=len(err_rows))
    reads[err_rows, err_pos] = (reads[err_rows, err_pos]
                                + rng.integers(1, 4, size=len(err_rows))) % 4
    pre_errors = int((reads != truth).sum())

    params = LighterParams(k=17, alpha_den=8, solid_cov=9,
                           bloom_bits_a=1 << 21, bloom_bits_b=1 << 21,
                           max_read_len=L)
    lens = np.full(B, L, np.int32)
    corrected, n_corr = correct_batch(reads, lens, params)
    corrected = np.asarray(corrected)

    post_errors = int((corrected != truth).sum())
    # most planted errors corrected, few new errors introduced
    assert post_errors < 0.15 * pre_errors, (pre_errors, post_errors)
    # reads without errors stay untouched for the most part
    clean = np.arange(1, B, 2)
    changed_clean = int((corrected[clean] != truth[clean]).sum())
    assert changed_clean <= 0.01 * len(clean) * L
