"""Failure detection + recovery for long-running device jobs
(SURVEY.md section 5: the reference's only failure handling is a solver
status print + fallback, admm.py:144-145,210-213).

TPU runtime failures surface as JaxRuntimeError with UNAVAILABLE /
UNIMPLEMENTED payloads (worker crash/restart, tunnel hiccups); the worker
self-recovers after a cooldown.  ``device_retry`` wraps a device-touching
callable with detection + exponential-backoff retries so epoch-scale jobs
(dataset labelling, training loops) survive transient device loss; combined
with the trainer's checkpoint/resume, a hard failure costs at most one epoch.
"""

from __future__ import annotations

import functools
import time
from typing import Callable, Tuple

RETRYABLE_MARKERS: Tuple[str, ...] = (
    "UNAVAILABLE",
    "worker process crashed",
    "DEADLINE_EXCEEDED",
    "INTERNAL",
    "Socket closed",
)

# FAILED_PRECONDITION alone is a status class that also covers persistent
# programming errors (deleted/donated buffers, device ordinal mismatch) --
# retrying those burns the full backoff budget (~12.5 min) before surfacing.
# The transient failure actually observed (2026-08-20: worker crash
# mid-execution surfacing on the fetch) carries the "TPU backend error"
# payload; only that co-occurrence is retried.
_PRECONDITION_MARKERS: Tuple[str, ...] = ("FAILED_PRECONDITION", "FailedPrecondition")


def is_retryable(exc: BaseException) -> bool:
    msg = str(exc)
    if any(m in msg for m in RETRYABLE_MARKERS):
        return True
    return "TPU backend error" in msg and any(
        m in msg for m in _PRECONDITION_MARKERS
    )


def device_retry(
    fn: Callable = None,
    *,
    attempts: int = 3,
    cooldown_s: float = 300.0,
    backoff: float = 1.5,
    log_fn: Callable[[str], None] = print,
):
    """Decorator/wrapper retrying ``fn`` on transient device failures."""

    def deco(f):
        @functools.wraps(f)
        def wrapper(*args, **kwargs):
            delay = cooldown_s
            for attempt in range(attempts):
                try:
                    return f(*args, **kwargs)
                except Exception as exc:  # noqa: BLE001 - filtered below
                    if attempt + 1 >= attempts or not is_retryable(exc):
                        raise
                    log_fn(
                        f"device failure ({type(exc).__name__}): retrying in "
                        f"{delay:.0f}s ({attempt + 1}/{attempts - 1} retries "
                        f"used): {str(exc)[:120]}"
                    )
                    time.sleep(delay)
                    delay *= backoff
            raise RuntimeError("unreachable")

        return wrapper

    if fn is not None:
        return deco(fn)
    return deco
