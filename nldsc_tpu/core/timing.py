from __future__ import annotations

import time
from datetime import timedelta
from functools import wraps

from .logging import log


def elapsed_time(func):
    """Wall-clock logging decorator (parity: ``nldsc/core/common.py:11-20``)."""

    @wraps(func)
    def wrapper(*args, **kwargs):
        start = time.time()
        result = func(*args, **kwargs)
        log.info("Elapsed time: %s", timedelta(seconds=time.time() - start))
        return result

    return wrapper
