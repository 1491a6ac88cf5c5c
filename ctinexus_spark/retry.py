"""Bounded retry for model calls inside UDF batches.

Contract mirrors the reference decorator (llm_processor.py:140-160):
up to `max_attempts` tries, re-raise on exhaustion. Stage-level
durability comes from checkpoint.py (resume from last committed
snapshot), so this only covers transient per-call failures.
"""

from __future__ import annotations

import functools
import logging
import time

logger = logging.getLogger(__name__)


def with_retry(max_attempts: int = 5, backoff_sec: float = 0.0):
    def decorator(fn):
        @functools.wraps(fn)
        def wrapper(*args, **kwargs):
            last_err: Exception | None = None
            for attempt in range(max_attempts):
                try:
                    return fn(*args, **kwargs)
                except Exception as e:  # noqa: BLE001 — mirror reference: retry any error
                    last_err = e
                    logger.error("attempt %d/%d failed: %s", attempt + 1, max_attempts, e)
                    if backoff_sec and attempt < max_attempts - 1:
                        time.sleep(backoff_sec * (2**attempt))
            raise last_err

        return wrapper

    return decorator
