"""Index construction: suffix arrays, BWT, FM-index artifacts.

Counterpart of the reference's ``nvbio/sufsort`` (GPU blockwise suffix
sorting, ``sufsort.h:86-302``) + the nvBWT/nvSSA apps. Round-1 implementation
is host-side numpy prefix-doubling (correct-first); large-genome native
(SA-IS in C++) and sharded-TPU construction layer on top of the same artifact
format.
"""

from nvbio_tpu.index.sa import suffix_array  # noqa: F401
