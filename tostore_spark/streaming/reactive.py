"""Reactive queries: ``watch()`` / ``streamQuery`` in micro-batch form, plus
Structured Streaming helpers for true stream analytics.

Reference surface:
- ``watch()``: emits the full result list on subscribe, then re-queries on
  matching table-change events with in-flight coalescing
  (query_builder.dart:473-543; notification_manager.dart:9-40)
- ``streamQuery``: per-record pull stream with where/select
  (stream_query_builder.dart:26-140)
- ``watchValue``: per-key KV stream with distinct suppression
  (tostore.dart:738-791)

Spark mapping: the reference is an embedded reactive store; in a batch/
micro-batch engine ``watch`` is a change-driven re-query — the engine fires
change notifications on every write (engine.set_df), and the watcher
re-collects and emits the full snapshot, coalescing bursts.  ``streamQuery``
is ``toLocalIterator`` (one partition in flight at a time on the driver).

For genuine stream analytics the reference has nothing (SURVEY.md §2.9);
``stream_events`` shows the Structured Streaming shape (watermark + tumbling
window) used for event tables at scale.
"""

from __future__ import annotations

import threading
from typing import Any, Callable, Iterator, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class Watcher:
    """Change-driven full-snapshot re-query (the reference's watch())."""

    def __init__(self, builder, callback: Callable[[list[dict]], None]):
        self._builder = builder
        self._callback = callback
        self._lock = threading.Lock()
        self._pending = False
        self._active = True
        # initial emission on subscribe (query_builder.dart:480-543)
        self._emit()

    def _emit(self) -> None:
        if not self._active:
            return
        result = self._builder.clone().run()
        self._callback(result.records)

    def notify_change(self, table: str) -> None:
        """Called by the engine on writes; coalesces bursts — if a re-query
        is already queued, further notifications fold into it."""
        if table != self._builder._table or not self._active:
            return
        with self._lock:
            if self._pending:
                return
            self._pending = True
        try:
            self._emit()
        finally:
            with self._lock:
                self._pending = False

    def cancel(self) -> None:
        self._active = False


class StreamQueryBuilder:
    """Per-record pull stream (stream_query_builder.dart:26-140): lazily
    iterates the query result partition-by-partition — bounded driver
    memory, no full collect."""

    def __init__(self, builder):
        self._builder = builder

    def stream(self) -> Iterator[dict]:
        df = self._builder.df()
        for row in df.toLocalIterator(prefetchPartitions=True):
            yield row.asDict(recursive=True)

    def for_each(self, fn: Callable[[dict], Any]) -> int:
        n = 0
        for rec in self.stream():
            fn(rec)
            n += 1
        return n


def start_manifest_stream(engine, trigger: str = "1 second"):
    """Event-PUSH cross-engine watch: a Structured Streaming file source
    on the warehouse's ``_events`` directory (``store.flush_tables``
    writes one event file per committed flush), replacing mtime polling —
    watch latency drops from poll-interval to the micro-batch trigger.

    Each arriving event batch with a seq past this engine's loaded seq
    drives the SAME fold path a poll would (``check_remote_changes``:
    refresh + watcher re-query notifications), so stream and poll
    observe identical state.  A true write conflict is recorded on
    ``engine.last_remote_error`` and the stream keeps running (local
    state kept; the owner resolves via refresh/re-derive) — the same
    contract as ``engine.start_remote_watch``.

    Returns the ``StreamingQuery``; stop with ``.stop()``.  Reference:
    in-process change-event push, notification_manager.dart:9-40.

    Scale shape: the source lists one tiny directory per trigger and
    reads only NEW event files (bytes, not tables); the fold reads the
    manifest once per remote commit.  Old events are pruned by
    ``vacuum()``; a fresh stream skips pre-existing events via the seq
    guard."""
    from pyspark.sql.types import (ArrayType, LongType, StringType,
                                   StructField, StructType)

    from tostore_spark import fs as _fsmod
    from tostore_spark import store as _store

    if not getattr(engine, "_warehouse", None):
        raise ValueError("start_manifest_stream needs a warehouse")
    evdir = _fsmod.join(engine._warehouse, _store._EVENTS_DIR)
    _store._fs(engine).mkdirs(evdir)   # source dir must exist at start
    schema = StructType([StructField("seq", LongType()),
                         StructField("tables", ArrayType(StringType())),
                         StructField("ts", StringType())])
    engine.last_remote_error = None

    def _on_batch(batch_df, _batch_id):
        try:
            seqs = [r["seq"] for r in batch_df.select("seq").collect()]
            if any(s > getattr(engine, "_store_seq", 0) for s in seqs):
                engine.check_remote_changes()
        except Exception as exc:   # conflict or transient FS error
            engine.last_remote_error = exc

    return (engine.spark.readStream.schema(schema).json(evdir)
            .writeStream.foreachBatch(_on_batch)
            .trigger(processingTime=trigger)
            .queryName(f"tostore-manifest-watch-{id(engine)}")
            .start())


def stream_events(spark, source_dir: str, schema, window: str = "1 hour",
                  watermark: str = "2 hours",
                  value_field: str = "value", ts_field: str = "ts") -> DataFrame:
    """Structured Streaming shape for event analytics: file source →
    watermark → tumbling-window aggregate.  Late data beyond the watermark
    is dropped; state is bounded.  (Parity-plus: the reference has no
    event-time windowing.)"""
    # Parquet event tables read as TIMESTAMP_NTZ on Spark 4.1, which the
    # watermark operator rejects — normalize event time to TIMESTAMP.
    stream = (spark.readStream.schema(schema).parquet(source_dir)
              .withColumn(ts_field, F.col(ts_field).cast("timestamp"))
              .withWatermark(ts_field, watermark)
              .groupBy(F.window(F.col(ts_field), window))
              .agg(F.count(F.lit(1)).alias("n"),
                   F.sum(F.col(value_field)).alias("sum_value")))
    return stream


def stream_rolling_active(spark, source_dir: str, schema,
                          window_days: int = 7,
                          watermark: str = "2 days",
                          entity: str = "user_id",
                          ts_field: str = "ts") -> DataFrame:
    """Streaming WAU/MAU: sliding-window APPROXIMATE distinct actives —
    the Structured Streaming analog of the batch
    ``functions.timeseries.rolling_distinct``.

    Exact sliding distinct needs the full (day, entity) distinct frame
    per window — unbounded state on a stream — so the streaming form is
    the HLL path the batch docstring names: watermark → sliding window
    (``window_days`` wide, 1-day slide) → ``approx_count_distinct`` of
    the entity.  HLL sketches merge associatively (per-register max),
    so the result is DETERMINISTIC for given data — the pytest pins the
    streaming result EQUAL to the identical batch expression, and
    within HLL tolerance (~5% default rsd) of the exact batch count.
    State per window is one constant-size sketch; the watermark bounds
    how many windows stay open."""
    stream = (spark.readStream.schema(schema).parquet(source_dir)
              .withColumn(ts_field, F.col(ts_field).cast("timestamp"))
              .withWatermark(ts_field, watermark)
              .groupBy(F.window(F.col(ts_field), f"{int(window_days)} days",
                                "1 day"))
              .agg(F.approx_count_distinct(entity).alias("n_active_approx")))
    return stream
