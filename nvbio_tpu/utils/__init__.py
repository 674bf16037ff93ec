"""Runtime utilities: logging, timers, options, stats (the reference's
``nvbio/basic`` console/timer/options surface)."""

from nvbio_tpu.utils.console import (  # noqa: F401
    log_debug,
    log_error,
    log_info,
    log_stats,
    log_verbose,
    log_visible,
    set_verbosity,
)
from nvbio_tpu.utils.timers import Timer  # noqa: F401
