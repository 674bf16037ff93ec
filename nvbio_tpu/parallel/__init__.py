"""Multi-chip scaling: device meshes, sharded pipeline steps, stat merges.

The reference's multi-GPU model is one ComputeThread per device with host-side
stat merging (``nvBowtie.cpp:644-699``); the TPU-native replacement is SPMD:
a 1-D ``reads`` mesh axis, read batches sharded over it, the FM-index and
reference replicated, and mapping statistics merged on-device with ``psum``
over ICI (SURVEY.md §2.5 row 10).
"""

from nvbio_tpu.parallel.mesh import (  # noqa: F401
    make_reads_mesh,
    sharded_align_step,
)
