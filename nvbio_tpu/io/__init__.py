"""Sequence I/O: FASTA/FASTQ readers, reference containers, SAM output.

Capability parity with ``nvbio/io`` (sequence containers
``io/sequence/sequence.h:163-691``, FASTA/FASTQ parsers, SAM/BAM output
``io/output/``): host-side parsing into dense packed batches that stream to
the device; alignment output as SAM text (BAM/BGZF planned native).
"""

from nvbio_tpu.io.fasta import read_fasta, write_fasta  # noqa: F401
from nvbio_tpu.io.fastq import read_fastq, fastq_batches  # noqa: F401
from nvbio_tpu.io.reference import Reference  # noqa: F401
from nvbio_tpu.io.sam import SamWriter  # noqa: F401
