from __future__ import annotations

import time
from datetime import timedelta
from functools import wraps

from .logging import log


#: stage decomposition of the LAST top-level estimate call (seconds) —
#: populated by ld.pipeline (disk_s/transfer_s/device_s/write_s for the
#: in-core route) and ld.streaming (stream_read_s/stream_dispatch_s/
#: stream_collect_s component busy-times; the streaming loop overlaps
#: stages by design, so its components can sum past wall-clock).
#: bench.py emits these so a slow end-to-end number is attributable
#: (VERDICT r4 #6).
STAGE_TIMES: dict[str, float] = {}


def stage_add(key: str, t0: float) -> None:
    STAGE_TIMES[key] = STAGE_TIMES.get(key, 0.0) + (time.time() - t0)


def elapsed_time(func):
    """Wall-clock logging decorator (parity: ``nldsc/core/common.py:11-20``)."""

    @wraps(func)
    def wrapper(*args, **kwargs):
        start = time.time()
        result = func(*args, **kwargs)
        log.info("Elapsed time: %s", timedelta(seconds=time.time() - start))
        return result

    return wrapper
