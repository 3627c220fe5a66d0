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
    into :class:`RetryExhausted`.

    ``timeout`` (R6) bounds each attempt for real: the attempt runs on
    a worker thread and a ``TimeoutError`` is raised at the deadline —
    the reference's ``Await.result`` semantics (AkkaPipelineActors.scala:68).
    As there (and in any timeout-then-retry scheme), an attempt that
    times out may still complete in the background, so wrap only
    idempotent effects (K1's sinks are, by design) when a timeout is
    set. Python threads can't be killed, so the abandoned attempt holds
    its worker until it finishes.
    """
    last: BaseException | None = None
    for attempt in range(1, times + 1):
        try:
            if timeout is None:
                return fn()
            import concurrent.futures as cf

            pool = cf.ThreadPoolExecutor(max_workers=1)
            fut = pool.submit(fn)
            try:
                return fut.result(timeout=timeout)
            except cf.TimeoutError:
                raise TimeoutError(f"attempt exceeded {timeout}s") from None
            finally:
                # wait=False: don't block on an abandoned (timed-out)
                # attempt — its thread drains in the background
                pool.shutdown(wait=False)
        except BaseException as exc:  # noqa: BLE001 — classification decides
            if not classify(exc):
                raise  # permanent: fail the record now (R4)
            last = exc
            if attempt < times:
                sleep(backoff)
    raise RetryExhausted(times, last)  # type: ignore[arg-type]
