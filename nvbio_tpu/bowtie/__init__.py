"""Bowtie2-style short-read alignment pipeline (the flagship application).

Re-composition of nvBowtie's seed->select->locate->score->reduce->traceback->
mapq state machine (``nvBowtie/bowtie2/cuda/aligner_best_approx.h:85-840``) as
a dense JAX dataflow: every stage is a fixed-shape batched transform; the
reference's priority deques / ping-pong queues become masked dense arrays and
top-k reductions.
"""

from nvbio_tpu.bowtie.params import MapParams  # noqa: F401
from nvbio_tpu.bowtie.pipeline import ReadMapper  # noqa: F401
