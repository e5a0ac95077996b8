"""KV namespace: driver-state store exposed as a DataFrame.

Reference: ``KvStore`` (lib/src/Interface/kv_store.dart:9-140), backed by a
system table (kv_store.dart:17); per-key TTL, global vs space-local keys,
``setIncrement`` atomic counters (data_store_impl.dart:5986-6240).

Spark-first shape: KV writes always originate on the driver with driver
values, and the reference itself serves KV from an in-memory cache in front
of its WAL.  So the authoritative state here is a driver dict — O(1) per
write, no lineage growth no matter how many sequential writes — and
``df()`` materializes a (cached) DataFrame view for distributed queries;
the KV table is broadcast-sized by construction.  At warehouse scale with
multiple writers this becomes a Delta/Iceberg table with MERGE upserts —
same read schema, same semantics.

An earlier version rewrote a DataFrame per set (left_anti + union): after a
few hundred writes the chained plan needed periodic localCheckpoint barriers
costing tens of seconds each.  The dict design removes that failure mode.
"""

from __future__ import annotations

import datetime
import json
from typing import Any, Optional

from pyspark.sql import functions as F
from pyspark.sql import types as T
from tostore_spark.localdf import local_df

_KV_SCHEMA = T.StructType([
    T.StructField("space", T.StringType(), False),
    T.StructField("key", T.StringType(), False),
    T.StructField("value", T.StringType(), True),
    T.StructField("expires_at", T.TimestampType(), True),
])


class KvStore:
    def __init__(self, engine):
        self._engine = engine
        # (space, key) -> (value_json, expires_at | None)
        self._data: dict[tuple[str, str], tuple[str, Optional[datetime.datetime]]] = {}
        self._df_cache = None

    def _space(self, is_global: bool) -> str:
        return "global" if is_global else self._engine.current_space

    @staticmethod
    def _expired(exp: Optional[datetime.datetime]) -> bool:
        return exp is not None and exp <= datetime.datetime.now()

    # ---- writes -------------------------------------------------------
    def set_value(self, key: str, value: Any, is_global: bool = False,
                  ttl_ms: Optional[int] = None) -> None:
        self.set_many({key: value}, is_global=is_global, ttl_ms=ttl_ms)

    def set_many(self, kvs: dict[str, Any], is_global: bool = False,
                 ttl_ms: Optional[int] = None) -> None:
        space = self._space(is_global)
        exp = (datetime.datetime.now() + datetime.timedelta(milliseconds=ttl_ms)
               if ttl_ms else None)
        for k, v in kvs.items():
            self._data[(space, k)] = (json.dumps(v), exp)
        self._df_cache = None
        self._notify()

    def remove_value(self, key: str, is_global: bool = False) -> None:
        self._data.pop((self._space(is_global), key), None)
        self._df_cache = None
        self._notify()

    def set_ttl(self, key: str, ttl_ms: int, is_global: bool = False) -> None:
        k = (self._space(is_global), key)
        if k in self._data:
            exp = (datetime.datetime.now()
                   + datetime.timedelta(milliseconds=ttl_ms))
            self._data[k] = (self._data[k][0], exp)
            self._df_cache = None

    def set_increment(self, key: str, by: float = 1, is_global: bool = False) -> float:
        """Atomic counter (data_store_impl.dart:5986-6240): single-writer
        driver state, so read-add-write here IS atomic."""
        new = (self.get_value(key, is_global=is_global) or 0) + by
        self.set_value(key, new, is_global=is_global)
        return new

    # ---- reads --------------------------------------------------------
    def get_value(self, key: str, is_global: bool = False) -> Any:
        ent = self._data.get((self._space(is_global), key))
        if ent is None or self._expired(ent[1]):
            return None
        return json.loads(ent[0])

    def get_keys(self, is_global: bool = False) -> list[str]:
        space = self._space(is_global)
        return [k for (sp, k), (_, exp) in self._data.items()
                if sp == space and not self._expired(exp)]

    # ---- transaction snapshot (transaction.py) ------------------------
    def snapshot(self) -> dict:
        return dict(self._data)

    def restore(self, snap: dict) -> None:
        self._data = dict(snap)
        self._df_cache = None

    # ---- watch --------------------------------------------------------
    def watch_value(self, key: str, callback, is_global: bool = False,
                    default_value: Any = None, distinct: bool = True):
        """Per-key value stream (tostore.dart:758-767): emits the current
        value now and on every KV write; ``distinct`` suppresses unchanged
        emissions; ``default_value`` substitutes for missing keys."""
        state = {"last": object()}

        def emit():
            v = self.get_value(key, is_global=is_global)
            if v is None:
                v = default_value
            if not distinct or v != state["last"]:
                state["last"] = v
                callback(v)

        emit()
        self._watch_callbacks = getattr(self, "_watch_callbacks", [])
        self._watch_callbacks.append(emit)
        return emit

    def watch_values(self, keys: list[str], callback, is_global: bool = False,
                     distinct: bool = True):
        """Plural form (tostore.dart:784-799): emits the snapshot MAP
        {key: value} on subscribe and whenever any watched key changes,
        with distinct suppression on the whole snapshot."""
        state = {"last": object()}

        def emit():
            snap = {k: self.get_value(k, is_global=is_global) for k in keys}
            if not distinct or snap != state["last"]:
                state["last"] = dict(snap)
                callback(snap)

        emit()
        self._watch_callbacks = getattr(self, "_watch_callbacks", [])
        self._watch_callbacks.append(emit)
        return emit

    def _notify(self):
        for cb in getattr(self, "_watch_callbacks", []):
            cb()

    # ---- DataFrame view ----------------------------------------------
    def df(self):
        """The live KV table as a DataFrame (for queries/joins); built from
        driver state on demand, cached until the next write, TTL-filtered at
        read time."""
        if self._df_cache is None:
            rows = [(sp, k, v, exp) for (sp, k), (v, exp) in self._data.items()]
            self._df_cache = local_df(self._engine.spark, rows, _KV_SCHEMA)
        now = F.current_timestamp()
        return self._df_cache.filter(F.col("expires_at").isNull()
                                     | (F.col("expires_at") > now))
