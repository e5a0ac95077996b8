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
from collections import OrderedDict
from typing import Any, Optional


class QueryResultCache:
    def __init__(self, max_bytes: int = 50 * 1024 * 1024, max_entries: int = 512):
        self._store: OrderedDict[tuple, tuple[Any, int]] = OrderedDict()
        self._max_bytes = max_bytes
        self._max_entries = max_entries
        self._bytes = 0
        self.hits = 0
        self.misses = 0

    @staticmethod
    def key(signature: str, generations: tuple[tuple[str, int], ...]) -> tuple:
        return (signature, generations)

    def get(self, key: tuple) -> Optional[Any]:
        if key in self._store:
            self.hits += 1
            self._store.move_to_end(key)
            return self._store[key][0]
        self.misses += 1
        return None

    def put(self, key: tuple, value: Any) -> None:
        size = _estimate_bytes(value)
        if size > self._max_bytes:
            return
        if key in self._store:
            self._bytes -= self._store[key][1]
        self._store[key] = (value, size)
        self._store.move_to_end(key)
        self._bytes += size
        while self._store and (self._bytes > self._max_bytes
                               or len(self._store) > self._max_entries):
            _, (_, old_size) = self._store.popitem(last=False)
            self._bytes -= old_size

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
