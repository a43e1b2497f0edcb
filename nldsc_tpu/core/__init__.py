from .errors import NLDSCError, NLDSCParameterError
from .logging import get_logger, log
from .timing import elapsed_time

__all__ = ["NLDSCError", "NLDSCParameterError", "get_logger", "log", "elapsed_time"]
