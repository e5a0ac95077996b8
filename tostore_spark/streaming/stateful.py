"""Custom stateful streaming operator: per-user session windows.

The reference has no event-time stream processing (SURVEY.md §2.9) — this
is the parity-plus Structured Streaming path for the same sessionization
the batch window query (q_events_sessions) computes: per-user sessions
closed when the gap between consecutive events exceeds ``gap_seconds``.

Shape: ``groupBy(user).applyInPandasWithState`` — Arrow-batched per-group
state (session start / last-seen / count), ``append`` output of CLOSED
sessions, event-time timeout so idle sessions close when the watermark
passes last_seen + gap.  State is bounded per key; late events beyond the
watermark are dropped by the engine before reaching the operator.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_SCHEMA = ("user_id long, session_start timestamp, "
                  "session_end timestamp, n_events long")
_STATE_SCHEMA = "start_us long, last_us long, n long"


def sessionize_stream(events: DataFrame, gap_seconds: int = 3600,
                      user_field: str = "user_id",
                      ts_field: str = "ts",
                      watermark: str = "2 hours") -> DataFrame:
    """events (streaming DataFrame) → closed sessions, one row per session:
    (user_id, session_start, session_end, n_events)."""
    gap_us = gap_seconds * 1_000_000

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState
           ) -> Iterator[pd.DataFrame]:
        (uid,) = key
        cols = ["user_id", "session_start", "session_end", "n_events"]

        def frame(rows):
            return pd.DataFrame(
                [(uid, pd.Timestamp(s, unit="us"), pd.Timestamp(e, unit="us"), n)
                 for s, e, n in rows], columns=cols)

        if state.hasTimedOut:
            start_us, last_us, n = state.get
            state.remove()
            yield frame([(start_us, last_us, n)])
            return
        batches = [p for p in pdfs if len(p)]
        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us = last_us = None
            n = 0
        closed = []
        if batches:
            ts = pd.concat([p[ts_field] for p in batches]).sort_values()
            for t in (ts.astype("int64") // 1000):  # ns → us
                t = int(t)
                if last_us is None:
                    start_us, last_us, n = t, t, 1
                elif t - last_us > gap_us:
                    closed.append((start_us, last_us, n))
                    start_us, last_us, n = t, t, 1
                else:
                    last_us, n = t, n + 1
        if last_us is not None:
            state.update((int(start_us), int(last_us), int(n)))
            # close the open session when the watermark passes last + gap
            state.setTimeoutTimestamp(last_us // 1000 + gap_seconds * 1000)
        yield frame(closed)

    return (events
            # watermark rejects TIMESTAMP_NTZ (Spark 4.1 parquet default)
            .withColumn(ts_field, F.col(ts_field).cast("timestamp"))
            .withWatermark(ts_field, watermark)
            .groupBy(F.col(user_field).alias("user_id"))
            .applyInPandasWithState(fn, SESSION_SCHEMA, _STATE_SCHEMA,
                                    "append",
                                    GroupStateTimeout.EventTimeTimeout))


def dedup_stream(docs: DataFrame, text_field: str = "text",
                 ts_field: str | None = None,
                 watermark: str = "1 hour") -> DataFrame:
    """Streaming exact dedup for incremental corpus ingest: emit only the
    FIRST occurrence of each content hash; later duplicates are dropped by
    the engine's keyed state store — the streaming counterpart of
    llmops.dedup.exact_dedup for a corpus that arrives batch by batch.

    With ``ts_field`` the state is bounded: duplicates are only tracked
    within the ``watermark`` horizon (``dropDuplicatesWithinWatermark``) —
    the right trade for a firehose where dupes cluster in time.  Without a
    timestamp the hash state grows with distinct-document count (exact
    global dedup; pair with the batch ``minhash_band_index`` artifact when
    the corpus outgrows state)."""
    out = docs.withColumn("text_hash", F.md5(F.col(text_field)))
    if ts_field:
        out = out.withColumn(ts_field, F.col(ts_field).cast("timestamp"))
        return (out.withWatermark(ts_field, watermark)
                   .dropDuplicatesWithinWatermark(["text_hash"]))
    return out.dropDuplicates(["text_hash"])


def clean_stream(docs: DataFrame, span_freq: DataFrame, k: int = 8,
                 max_doc_freq: int = 1, text_field: str = "text",
                 id_field: str = "doc_id", ts_field: str | None = None,
                 watermark: str = "1 hour",
                 unbounded_state: bool = False) -> DataFrame:
    """Streaming boilerplate removal: scrub each arriving document
    against a PERSISTED corpus span-frequency index
    (``llmops.dedup.span_freq_index`` read back as a static frame) — the
    ingest-side application of the batch artifact.

    Shape: a stream-static left join (each micro-batch against the
    static index — that part is stateless), then a STATEFUL streaming
    aggregation: the per-document ordered rebuild is a groupBy(doc_id)
    collecting span structs, so the state store holds one entry per
    in-flight document.

    State bounds — pick one:
    - ``ts_field`` given (recommended for long-running ingest): the
      stream is watermarked and the rebuild groups on (id, event time),
      so a document's state is evicted once the watermark passes its
      timestamp.  A doc_id re-arriving AFTER eviction starts a fresh
      group (emitting a second cleaned row) instead of corrupting the
      evicted one; within the watermark horizon it would merge, so
      doc_ids must be unique within the horizon.
    - ``ts_field=None``: NO state eviction — one state entry per
      distinct doc_id for the stream's lifetime, and doc_ids must be
      unique across the whole stream (a re-arriving id merges its spans
      with the retained state, producing corrupted rebuilt text).  Only
      for bounded backfills — and therefore OPT-IN: the caller must
      pass ``unbounded_state=True`` to acknowledge the forever-growing
      state store; without it a long-running ingest cannot reach this
      mode by accident.

    The index is corpus truth as of its build; rebuild it on the batch
    side as the corpus grows."""
    from tostore_spark.llmops.dedup import _rebuild_clean, _span_rows

    if ts_field is None:
        if not unbounded_state:
            raise ValueError(
                "clean_stream with ts_field=None keeps one state entry "
                "per doc_id FOREVER (no watermark eviction). Pass a "
                "ts_field + watermark for long-running ingest, or opt in "
                "explicitly with unbounded_state=True for a bounded "
                "backfill.")
        ex = _span_rows(docs, k, text_field, id_field)
        joined = (ex.join(span_freq, on="h", how="left")
                    .withColumn("span_df",
                                F.coalesce(F.col("span_df"), F.lit(0))))
        return _rebuild_clean(joined, max_doc_freq)
    # watermarked shape: carry the event-time column through the span
    # explode (one ts per document) and into the group keys so the state
    # store can evict expired groups.  _span_rows/_rebuild_clean drop
    # non-key columns, so the k-span split is restated here with the ts
    # column threaded through — same span semantics as the batch path.
    wm = docs.withColumn(ts_field, F.col(ts_field).cast("timestamp")) \
             .withWatermark(ts_field, watermark)
    from tostore_spark.functions.colutil import let_array as _let

    def _spans(w):
        # let-bound: the split runs once per row, not once per span
        n_spans = F.ceil(F.size(w) / F.lit(k)).cast("int")
        return F.transform(
            F.sequence(F.lit(0), F.greatest(n_spans, F.lit(1)) - 1),
            lambda i: F.array_join(F.slice(w, i * k + 1, k), " "))

    spans = _let(F.split(F.col(text_field), " "), _spans)
    ex = (wm.select(F.col(id_field).alias("id"), F.col(ts_field),
                    F.posexplode(spans))
            .withColumnRenamed("pos", "span_pos")
            .withColumnRenamed("col", "span")
            .withColumn("h", F.md5(F.col("span"))))
    joined = (ex.join(span_freq, on="h", how="left")
                .withColumn("span_df",
                            F.coalesce(F.col("span_df"), F.lit(0))))
    return (joined.groupBy("id", F.col(ts_field))
            .agg(F.array_join(
                     F.transform(
                         F.array_sort(F.collect_list(F.when(
                             F.col("span_df") <= max_doc_freq,
                             F.struct(F.col("span_pos").alias("p"),
                                      F.col("span").alias("s"))))),
                         lambda st: st["s"]),
                     " ").alias("clean_text"),
                 F.count(F.lit(1)).alias("n_spans"),
                 F.sum(F.when(F.col("span_df") > max_doc_freq, 1)
                       .otherwise(0)).alias("n_dropped")))


def interval_join_stream(left: DataFrame, right: DataFrame, key: str,
                         max_delay_seconds: int = 1800,
                         left_ts: str = "ts", right_ts: str = "ts",
                         watermark: str = "1 hour",
                         how: str = "inner",
                         dedup_right=None) -> DataFrame:
    """Watermarked stream-stream INTERVAL join — the attribution shape:
    each right event joins the left events with the same ``key`` whose
    timestamp precedes it by at most ``max_delay_seconds`` (click joins
    the views it followed within the window).  (Parity-plus: the
    reference has no stream processing, SURVEY.md §2.9; this is the
    canonical Structured Streaming symmetric hash join.)

    State is BOUNDED because both sides carry event-time watermarks and
    the join condition brackets the two event times: the engine can
    evict a buffered left row once the right watermark passes
    ``left_ts + max_delay`` (and vice versa) — without the time bracket
    a stream-stream join must buffer every row forever, which is why
    the bracket is built in rather than left to the caller.

    ``how='leftOuter'`` emits unmatched left rows with null right
    columns once the watermark proves no match can still arrive —
    results therefore trail the watermark; inner results emit as soon
    as both sides meet.  ``how='rightOuter'`` is the symmetric shape
    (unmatched RIGHT rows with null left columns — "clicks that
    followed no view"); the same bracket bounds its state.  Output:
    left columns + right columns with the right timestamp as
    ``<right_ts>_r`` (and the duplicate key column dropped), plus
    ``delay_sec``.

    DUPLICATE CONTRACT: the join matches EVERY buffered right row, so
    a right event delivered twice (at-least-once sources) produces its
    attribution pairs twice — a stream join cannot distinguish a
    redelivery from a genuine repeat event.  Pass ``dedup_right`` (the
    column(s) identifying a right event, e.g. ``["click_id"]``) to
    drop redeliveries inside the right watermark before the join
    (``dropDuplicatesWithinWatermark`` — state bounded by the same
    watermark that already bounds the join buffer); leave it None when
    the source is exactly-once and repeats are real events.
    """
    if how not in ("inner", "leftOuter", "rightOuter"):
        raise ValueError(
            f"interval_join_stream supports how='inner'|'leftOuter'|"
            f"'rightOuter', got {how!r} (full outer would emit every "
            "row of both sides; derive it as leftOuter UNION unmatched "
            "rightOuter if genuinely needed)")
    if max_delay_seconds <= 0:
        raise ValueError(f"max_delay_seconds must be > 0, "
                         f"got {max_delay_seconds}")
    rts_out = f"{right_ts}_r" if right_ts == left_ts else right_ts
    r = right.withColumnRenamed(right_ts, rts_out) \
        if rts_out != right_ts else right
    l = (left.withColumn(left_ts, F.col(left_ts).cast("timestamp"))
             .withWatermark(left_ts, watermark).alias("l"))
    r = (r.withColumn(rts_out, F.col(rts_out).cast("timestamp"))
          .withWatermark(rts_out, watermark))
    if dedup_right:
        r = r.dropDuplicatesWithinWatermark(list(dedup_right))
    r = r.alias("r")
    cond = ((F.col(f"l.{key}") == F.col(f"r.{key}"))
            & (F.col(f"r.{rts_out}") >= F.col(f"l.{left_ts}"))
            & (F.col(f"r.{rts_out}")
               <= F.col(f"l.{left_ts}")
               + F.expr(f"INTERVAL {int(max_delay_seconds)} SECONDS")))
    # the surviving key column must COALESCE the two sides: an outer
    # row's null side would otherwise null the key itself (rightOuter
    # unmatched rows previously emitted key=null — the r10 fix)
    out = (l.join(r, cond, how)
            .withColumn("__k", F.coalesce(F.col(f"l.{key}"),
                                          F.col(f"r.{key}")))
            .drop(F.col(f"l.{key}")).drop(F.col(f"r.{key}"))
            .withColumnRenamed("__k", key))
    return out.withColumn(
        "delay_sec",
        (F.unix_timestamp(F.col(rts_out))
         - F.unix_timestamp(F.col(left_ts))).cast("long"))
