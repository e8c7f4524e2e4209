"""Param-keyed TTL result cache (SURVEY T6).

Re-expresses the reference's analysis cache
(/root/reference/pspcz_analyzer/services/analysis_cache.py:11-48):
thread-safe get-or-compute keyed by a query-param string, fixed TTL,
prefix invalidation (so a data refresh can drop every "loyalty:*" entry).
The clock is injectable for deterministic tests.
"""

from __future__ import annotations

import threading
import time
from collections.abc import Callable
from typing import Any


class TTLCache:
    def __init__(self, ttl_seconds: float = 3600.0, clock: Callable[[], float] = time.monotonic):
        self._ttl = ttl_seconds
        self._clock = clock
        self._lock = threading.Lock()
        self._store: dict[str, tuple[float, Any]] = {}

    def get_or_compute(self, key: str, compute: Callable[[], Any]) -> Any:
        now = self._clock()
        with self._lock:
            hit = self._store.get(key)
            if hit is not None and now - hit[0] < self._ttl:
                return hit[1]
        value = compute()  # compute outside the lock: one slow query must
        # not serialize every other key (duplicate work on a race is fine)
        with self._lock:
            self._store[key] = (now, value)
        return value

    def invalidate_prefix(self, prefix: str) -> int:
        with self._lock:
            doomed = [k for k in self._store if k.startswith(prefix)]
            for k in doomed:
                del self._store[k]
            return len(doomed)

    def clear(self) -> None:
        with self._lock:
            self._store.clear()
