"""Query-result cache with per-table generation invalidation.

Reference: 50 MB ``TreeCache`` keyed by query signature, invalidated when
the table's write generation changes (query_executor.dart:34-50, 813-860,
3217-3254; query_cache.dart:7+).

Spark-first note: Spark already caches *plans* (``df.cache()``) — this layer
caches collected *results* for the reference's repeated-small-query shape
(dashboards, watch() re-queries).  Entries are bounded by count and byte
estimate; a write to any involved table invalidates via the generation key,
so no explicit eviction hooks are needed.
"""

from __future__ import annotations

import sys
import time
from collections import OrderedDict
from typing import Any, Optional


class QueryResultCache:
    def __init__(self, max_bytes: int = 50 * 1024 * 1024, max_entries: int = 512):
        self._store: OrderedDict[tuple, tuple[Any, int, float]] = OrderedDict()
        self._max_bytes = max_bytes
        self._max_entries = max_entries
        self._bytes = 0
        self.hits = 0
        self.misses = 0

    @staticmethod
    def key(signature: str, generations: tuple[tuple[str, int], ...]) -> tuple:
        return (signature, generations)

    def get(self, key: tuple, max_age_s: Optional[float] = None) -> Optional[Any]:
        if key in self._store:
            value, size, ts = self._store[key]
            if max_age_s is not None and time.monotonic() - ts > max_age_s:
                # per-query expiry (useQueryCache(expiry)): stale → drop
                del self._store[key]
                self._bytes -= size
                self.misses += 1
                return None
            self.hits += 1
            self._store.move_to_end(key)
            return value
        self.misses += 1
        return None

    def put(self, key: tuple, value: Any) -> None:
        size = _estimate_bytes(value)
        if size > self._max_bytes:
            return
        if key in self._store:
            self._bytes -= self._store[key][1]
        self._store[key] = (value, size, time.monotonic())
        self._store.move_to_end(key)
        self._bytes += size
        while self._store and (self._bytes > self._max_bytes
                               or len(self._store) > self._max_entries):
            _, (_, old_size, _) = self._store.popitem(last=False)
            self._bytes -= old_size

    def clear_signature(self, signature: str) -> None:
        """Drop every generation's entry for one query signature
        (clearQueryCache, query_builder.dart:272-289)."""
        for k in [k for k in self._store if k[0] == signature]:
            self._bytes -= self._store[k][1]
            del self._store[k]

    def clear(self) -> None:
        self._store.clear()
        self._bytes = 0


def _estimate_bytes(value: Any) -> int:
    """Recursive size estimate: run() stores a (rows, flags, tokens) tuple,
    so the tuple is unwrapped and every row of the list is sized (not just
    the container), keeping the documented byte bound effective."""
    if isinstance(value, tuple):
        return 16 + sum(_estimate_bytes(v) for v in value)
    if isinstance(value, list):
        return 64 + sum(_estimate_bytes(v) for v in value)
    if isinstance(value, dict):
        return 64 + sum(sys.getsizeof(k) + sys.getsizeof(v)
                        for k, v in value.items())
    return sys.getsizeof(value)
