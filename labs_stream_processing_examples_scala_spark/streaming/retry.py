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
#
# Two round-12 self-review fixes on the Python rendering of that rule:
# - IOError is an ALIAS of OSError, so the bare isinstance check called
#   FileNotFoundError / PermissionError / IsADirectoryError "temporary"
#   — retrying genuinely permanent errors `times` times and re-raising
#   them as RetryExhausted, hiding the real class from the R4 router.
# - Real transient Spark write failures surface as Py4JJavaError (or a
#   pyspark.errors wrapper), which derives from Exception, not OSError
#   — so the only failure path with_retry exists for was classified
#   permanent and never retried. Those are matched by the JAVA-side
#   class/condition named in the message (IOException, TimeoutException,
#   connection classes — the reference's own predicate, applied to
#   where the JVM actually puts it).
TEMPORARY_EXCEPTIONS: tuple[type[BaseException], ...] = (IOError, TimeoutError, ConnectionError)

#: OSError subclasses that are configuration/caller errors, not
#: transient conditions — fail fast so the DLQ records the real class
PERMANENT_OS_ERRORS: tuple[type[BaseException], ...] = (
    FileNotFoundError,
    PermissionError,
    IsADirectoryError,
    NotADirectoryError,
)

#: substrings that mark a JVM-surfaced exception as the reference's
#: IOException | TimeoutException class (plus the connection family
#: those abstract over)
_JVM_TEMPORARY_MARKERS = (
    "IOException",
    "TimeoutException",
    "SocketException",
    "ConnectException",
    "UnknownHostException",
    "Connection reset",
    "Connection refused",
    "FetchFailed",
    "temporarily unavailable",
)


def is_temporary_exception(exc: BaseException) -> bool:
    if isinstance(exc, PERMANENT_OS_ERRORS):
        return False
    if isinstance(exc, TEMPORARY_EXCEPTIONS):
        return True
    mod = type(exc).__module__ or ""
    if type(exc).__name__ == "Py4JJavaError" or mod.startswith(
        ("py4j", "pyspark")
    ):
        msg = str(exc)
        return any(m in msg for m in _JVM_TEMPORARY_MARKERS)
    return False


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
