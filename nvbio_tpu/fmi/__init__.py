"""FM-index: rank dictionary, backward search, locate, MEM search.

Capability parity with ``nvbio/fmindex`` (rank dictionary
``rank_dictionary.h:82-271``, fm_index ``fmindex.h:341-633``, sampled SA
``ssa.h:76-358``, backtracking ``backtrack.h``, bidirectional ``bidir.h``,
MEM search ``mem.h``).

TPU-first design: all queries are *batched*; rank is a gather + bit-twiddle +
``lax.population_count`` over the 2-bit packed BWT with occurrence checkpoints
every 64 symbols (the reference's OCC_INT, ``io/fmindex/fmindex.h:94``);
backward search is a ``lax.scan`` over query positions updating dense (lo, hi)
interval vectors; locate is a bounded LF-walk (<= SA sampling interval steps)
with masked termination.
"""

from nvbio_tpu.fmi.index import FMIndex, build_fmindex  # noqa: F401
from nvbio_tpu.fmi.rank import rank, rank2  # noqa: F401
from nvbio_tpu.fmi.search import backward_search, locate_batch  # noqa: F401
