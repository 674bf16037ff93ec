"""Batched DP sequence alignment for TPU.

Capability parity with ``nvbio/alignment`` (aligner taxonomy at
``nvbio/alignment/alignment_base.h:54-297``): {EditDistance, SmithWaterman,
Gotoh, Hamming} x {GLOBAL, SEMI_GLOBAL, LOCAL}, full-matrix and banded, score
+ traceback, batched over thousands of alignments.

TPU-first design (NOT a port of the CUDA kernels):
  * the unit of vectorization is the *batch x DP-vector* plane mapped onto the
    8x128 VPU — full-matrix scoring runs an anti-diagonal wavefront where each
    ``lax.scan`` step updates a dense ``(B, M+1)`` diagonal, banded scoring
    scans text rows with a dense ``(B, BAND)`` state (the reference instead
    assigns one alignment per CUDA thread/warp, ``alignment/batched.h:60-76``);
  * integer scores (int32) so results are bit-exact against the numpy oracle;
  * data-dependent termination is replaced by masked updates over padded
    fixed shapes.
"""

from nvbio_tpu.align.types import (  # noqa: F401
    AlignmentType,
    GLOBAL,
    LOCAL,
    SEMI_GLOBAL,
    EditDistanceAligner,
    GotohAligner,
    GotohScoring,
    HammingAligner,
    SmithWatermanAligner,
    SWScoring,
    make_edit_distance_aligner,
    make_gotoh_aligner,
    make_hamming_aligner,
    make_smith_waterman_aligner,
)
from nvbio_tpu.align.batch import (  # noqa: F401
    batch_score_full,
    batch_score_banded,
)
from nvbio_tpu.align.traceback import (  # noqa: F401
    batch_traceback_banded,
    cigar_to_string,
)
