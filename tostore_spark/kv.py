"""KV namespace over a managed 4-column table.

Reference: ``KvStore`` (lib/src/Interface/kv_store.dart:9-140), backed by a
system table (kv_store.dart:17); per-key TTL, global vs space-local keys,
``setIncrement`` atomic counters (data_store_impl.dart:5986-6240).

Layout: (space, key, value:string(json), expires_at:timestamp|null, is_global)
— reads filter expired keys; writes are upsert-style rewrites.  At scale this
table would be Delta + MERGE; the semantics here are identical.
"""

from __future__ import annotations

import datetime
import json
from typing import Any, Optional

from pyspark.sql import functions as F
from pyspark.sql import types as T

_KV_SCHEMA = T.StructType([
    T.StructField("space", T.StringType(), False),
    T.StructField("key", T.StringType(), False),
    T.StructField("value", T.StringType(), True),
    T.StructField("expires_at", T.TimestampType(), True),
])


class KvStore:
    def __init__(self, engine):
        self._engine = engine
        self._df = engine.spark.createDataFrame([], _KV_SCHEMA)

    def _space(self, is_global: bool) -> str:
        return "global" if is_global else self._engine.current_space

    def _live(self):
        now = F.current_timestamp()
        return self._df.filter(F.col("expires_at").isNull() |
                               (F.col("expires_at") > now))

    def set_value(self, key: str, value: Any, is_global: bool = False,
                  ttl_ms: Optional[int] = None) -> None:
        self.set_many({key: value}, is_global=is_global, ttl_ms=ttl_ms)

    def set_many(self, kvs: dict[str, Any], is_global: bool = False,
                 ttl_ms: Optional[int] = None) -> None:
        space = self._space(is_global)
        exp = (datetime.datetime.now() + datetime.timedelta(milliseconds=ttl_ms)
               if ttl_ms else None)
        rows = [(space, k, json.dumps(v), exp) for k, v in kvs.items()]
        new = self._engine.spark.createDataFrame(rows, _KV_SCHEMA)
        keys = [(space, k) for k in kvs]
        keydf = self._engine.spark.createDataFrame(keys, ["space", "key"])
        keep = self._df.join(F.broadcast(keydf), on=["space", "key"], how="left_anti")
        self._df = keep.unionByName(new)
        self._notify()

    def get_value(self, key: str, is_global: bool = False) -> Any:
        space = self._space(is_global)
        rows = (self._live()
                .filter((F.col("space") == space) & (F.col("key") == key))
                .select("value").take(1))
        return json.loads(rows[0]["value"]) if rows else None

    def remove_value(self, key: str, is_global: bool = False) -> None:
        space = self._space(is_global)
        self._df = self._df.filter(
            ~((F.col("space") == space) & (F.col("key") == key)))
        self._notify()

    def get_keys(self, is_global: bool = False) -> list[str]:
        space = self._space(is_global)
        return [r["key"] for r in
                self._live().filter(F.col("space") == space)
                .select("key").distinct().collect()]

    def set_ttl(self, key: str, ttl_ms: int, is_global: bool = False) -> None:
        space = self._space(is_global)
        exp = datetime.datetime.now() + datetime.timedelta(milliseconds=ttl_ms)
        hit = (F.col("space") == space) & (F.col("key") == key)
        self._df = self._df.withColumn(
            "expires_at", F.when(hit, F.lit(exp)).otherwise(F.col("expires_at")))

    def set_increment(self, key: str, by: float = 1, is_global: bool = False) -> float:
        cur = self.get_value(key, is_global=is_global) or 0
        new = cur + by
        self.set_value(key, new, is_global=is_global)
        return new

    def watch_value(self, key: str, callback, is_global: bool = False):
        """Per-key value stream with distinct suppression
        (tostore.dart:738-791): emits current value now and on every KV
        write that changes it."""
        state = {"last": object()}

        def emit():
            v = self.get_value(key, is_global=is_global)
            if v != state["last"]:
                state["last"] = v
                callback(v)

        emit()
        self._watch_callbacks = getattr(self, "_watch_callbacks", [])
        self._watch_callbacks.append(emit)
        return emit

    def _notify(self):
        for cb in getattr(self, "_watch_callbacks", []):
            cb()

    def df(self):
        """The live KV table as a DataFrame (for watch/value queries)."""
        return self._live()
