"""Per-key token-bucket rate limiter (serving envelope parity).

The reference rate-limits each endpoint class (60/min analysis, 120/min
browse, 30/min charts — BASELINE.md envelope, slowapi decorators at
/root/reference/pspcz_analyzer/routes/voting.py:24). A token bucket keyed
by (endpoint, client) gives the same contract framework-free; the HTTP
layer maps a True/False check to 429. Clock is injectable for tests.
"""

from __future__ import annotations

import threading
import time
from collections.abc import Callable


class RateLimiter:
    def __init__(
        self,
        limit: int,
        per_seconds: float = 60.0,
        clock: Callable[[], float] = time.monotonic,
        max_keys: int = 100_000,
    ):
        self._capacity = float(limit)
        self._rate = limit / per_seconds  # tokens replenished per second
        self._clock = clock
        self._lock = threading.Lock()
        self._state: dict[str, tuple[float, float]] = {}  # key -> (tokens, at)
        self._max_keys = max_keys

    def _evict(self, now: float) -> None:
        """Drop buckets that have fully refilled — indistinguishable from
        absent keys, so eviction never changes an allow() outcome. Runs
        only when the key count crosses ``max_keys`` (a long-lived public
        server sees unbounded distinct client IPs; without pruning the
        state dict would grow forever). O(n) sweep amortized over at
        least one insert per swept key."""
        full_after = self._capacity / self._rate  # seconds to refill from 0
        self._state = {
            k: (tok, at)
            for k, (tok, at) in self._state.items()
            if now - at < full_after and tok + (now - at) * self._rate < self._capacity
        }

    def allow(self, key: str) -> bool:
        """Consume one token for ``key``; False when the bucket is empty."""
        now = self._clock()
        with self._lock:
            if len(self._state) >= self._max_keys and key not in self._state:
                self._evict(now)
            tokens, at = self._state.get(key, (self._capacity, now))
            tokens = min(self._capacity, tokens + (now - at) * self._rate)
            if tokens < 1.0:
                self._state[key] = (tokens, now)
                return False
            self._state[key] = (tokens - 1.0, now)
            return True
