"""Command-line applications (the reference's CLI binary suite).

  nvbio_tpu index     ~ nvBWT + nvSSA  (reference -> index artifacts)
  nvbio_tpu map       ~ nvBowtie       (SE/PE read mapping -> SAM)
  nvbio_tpu aln-diff  ~ nvbio-aln-diff (compare two SAM files)
  nvbio_tpu extract   ~ nvExtractReads

Run as ``python -m nvbio_tpu <command> ...``.
"""
