from .errors import PermanentError, RetryableError
from .sinks import IdempotentParquetSink, RetryPolicy, RetryingSink
from .router import Route, FanoutRouter

__all__ = [
    "PermanentError",
    "RetryableError",
    "IdempotentParquetSink",
    "RetryPolicy",
    "RetryingSink",
    "Route",
    "FanoutRouter",
]
