"""Delivery error taxonomy — consumererror analog.

The reference classifies export failures (consumer/consumererror/
permanent.go:27-43 NewPermanent/IsPermanent; signalerrors.go:56-69 carries
the failed subset for retry; otlpexporter/otlp.go:163-180 maps gRPC codes
to permanent/retryable/throttled). Here:

- PermanentError: never retried, dropped immediately (queued_retry.go:399-407)
- RetryableError: retried with backoff; may carry ``throttle_delay`` (the
  RetryInfo/Retry-After analog, otlphttpexporter/otlp.go:126-205) and a
  ``failed_predicate`` identifying the failed row subset so a retry
  re-drives only those rows (signalerrors.go OnError-shrink analog)
"""

from __future__ import annotations


class PermanentError(Exception):
    """Non-retryable delivery failure (consumererror.NewPermanent analog)."""


class RetryableError(Exception):
    """Retryable delivery failure.

    Attributes:
        throttle_delay: server-requested minimum wait in seconds before the
            next attempt (gRPC RetryInfo / HTTP Retry-After analog); 0 = use
            the client backoff schedule.
        failed_predicate: optional Spark Column predicate selecting the rows
            that failed, so the retry shrinks to the failed subset.
    """

    def __init__(self, msg: str = "", throttle_delay: float = 0.0, failed_predicate=None):
        super().__init__(msg)
        self.throttle_delay = throttle_delay
        self.failed_predicate = failed_predicate


def is_permanent(exc: BaseException) -> bool:
    return isinstance(exc, PermanentError)
