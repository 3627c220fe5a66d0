"""Retry combinator — SURVEY §2.7 (R1-R3, R6) + §2.4 (F1).

The reference retries temporary failures forever (whole-message
reschedule, FuturesProcessor.scala:79-82; actor restart,
AkkaPipelineActors.scala:42-48) and has a bounded recursive combinator
``retry(interval, times)(fn)`` (FuturesProcessor.scala:88-106) that
short-circuits on non-temporary failure.

In the engine, deterministic column transforms never need this (task
retry + checkpoint replay subsume R1/R2); :func:`with_retry` wraps
*external I/O* inside foreachBatch / ForeachWriter — the only place a
transient network/DB error can appear (K1's semantics comment,
Services.scala:79-82: transient write errors are retried internally).
"""

from __future__ import annotations

import time
from collections.abc import Callable
from typing import TypeVar

T = TypeVar("T")

# F1 — temporary-vs-permanent classification
# (FuturesProcessor.scala:76: IOException | TimeoutException).
TEMPORARY_EXCEPTIONS: tuple[type[BaseException], ...] = (IOError, TimeoutError, ConnectionError)


def is_temporary_exception(exc: BaseException) -> bool:
    return isinstance(exc, TEMPORARY_EXCEPTIONS)


class RetryExhausted(Exception):
    """All attempts failed with temporary errors (R3: the recursive retry
    ran out of ``times``). Carries the last cause."""

    def __init__(self, attempts: int, last: BaseException):
        super().__init__(f"retry exhausted after {attempts} attempts: {last!r}")
        self.attempts = attempts
        self.last = last


def with_retry(
    fn: Callable[[], T],
    times: int = 3,
    backoff: float = 0.1,
    timeout: float | None = None,
    classify: Callable[[BaseException], bool] = is_temporary_exception,
    sleep: Callable[[float], None] = time.sleep,
) -> T:
    """R3 — bounded retry with temporary/permanent short-circuit.

    Mirrors FuturesProcessor.scala:88-106: up to ``times`` attempts,
    ``backoff`` seconds between them (the reference's fixed
    ``retryInterval``), permanent failures re-raise immediately (R4
    routing: the caller dead-letters them), temporary failures exhaust
    into :class:`RetryExhausted`. ``timeout`` bounds each attempt's
    duration check (R6) for callables that report elapsed cost —
    enforcement for arbitrary blocking calls belongs to the caller's
    executor, as in the reference (Await.result, AkkaPipelineActors.scala:68).
    """
    last: BaseException | None = None
    for attempt in range(1, times + 1):
        start = time.monotonic()
        try:
            result = fn()
            if timeout is not None and time.monotonic() - start > timeout:
                raise TimeoutError(f"attempt exceeded {timeout}s")
            return result
        except BaseException as exc:  # noqa: BLE001 — classification decides
            if not classify(exc):
                raise  # permanent: fail the record now (R4)
            last = exc
            if attempt < times:
                sleep(backoff)
    raise RetryExhausted(times, last)  # type: ignore[arg-type]
