"""Sequence I/O: FASTA/FASTQ readers, reference containers, SAM/BAM output.

Capability parity with ``nvbio/io`` (sequence containers
``io/sequence/sequence.h:163-691``, FASTA/FASTQ parsers, SAM/BAM output
``io/output/``, VCF ``io/vcf.cpp``): host-side parsing into dense packed
batches that stream to the device; alignment output as SAM text or BGZF BAM.
"""

from nvbio_tpu.io.fasta import read_fasta, write_fasta  # noqa: F401
from nvbio_tpu.io.fastq import read_fastq, fastq_batches  # noqa: F401
from nvbio_tpu.io.reference import Reference  # noqa: F401
from nvbio_tpu.io.sam import SamWriter  # noqa: F401
from nvbio_tpu.io.bam import BamReader, BamWriter  # noqa: F401
from nvbio_tpu.io.output import open_alignment_output, read_alignments  # noqa: F401
from nvbio_tpu.io.vcf import SNPDatabase, load_vcf  # noqa: F401
