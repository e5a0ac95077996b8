"""applyInPandasWithState sessionization vs the batch window computation.

A sentinel event far past the last real event flushes every open session,
so the streamed CLOSED sessions must equal the batch sessionization of the
real events exactly (same gap rule, same counts).
"""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
GAP = 3600  # seconds


@pytest.fixture(scope="module")
def session_source(spark, tmp_path_factory):
    from tostore_spark import ToStoreSpark
    db = ToStoreSpark(spark, data_dir=SF)
    ev = db.df("events").select("user_id", "ts").filter(F.col("user_id") < 20)
    sentinel_ts = ev.agg(F.max("ts")).collect()[0][0]
    sentinels = (ev.select("user_id").distinct()
                 .withColumn("ts", F.lit(sentinel_ts) + F.expr("INTERVAL 100 HOURS")))
    src = str(tmp_path_factory.mktemp("sess_src"))
    ev.unionByName(sentinels).write.mode("overwrite").parquet(src)
    return db, ev, src


def test_stream_sessions_match_batch(spark, session_source):
    from tostore_spark.streaming.stateful import sessionize_stream
    db, ev, src = session_source

    stream = spark.readStream.schema("user_id bigint, ts timestamp").parquet(src)
    sessions = sessionize_stream(stream, gap_seconds=GAP, watermark="0 seconds")
    q = (sessions.writeStream.format("memory").queryName("sess_out")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = (spark.table("sess_out")
           .groupBy("user_id")
           .agg(F.count(F.lit(1)).alias("n_sessions"),
                F.sum("n_events").alias("n_events"))
           .collect())
    got = {r["user_id"]: (r["n_sessions"], r["n_events"]) for r in got}

    # batch truth: gap-marking window over the REAL events only
    from pyspark.sql import Window
    w = Window.partitionBy("user_id").orderBy("ts")
    from tostore_spark.functions.colutil import epoch_us
    us = epoch_us(F.col("ts"))
    gap = us - F.lag(us).over(w)
    marked = ev.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > GAP * 1_000_000), F.lit(1)).otherwise(F.lit(0)))
    want = {r["user_id"]: (r["n_sessions"], r["n_events"]) for r in
            (marked.groupBy("user_id")
             .agg(F.sum("new_session").alias("n_sessions"),
                  F.count(F.lit(1)).alias("n_events")).collect())}
    assert got == want


def test_stream_sessions_bounds(spark, session_source):
    from tostore_spark.streaming.stateful import sessionize_stream
    _, ev, src = session_source
    stream = spark.readStream.schema("user_id bigint, ts timestamp").parquet(src)
    sessions = sessionize_stream(stream, gap_seconds=GAP, watermark="0 seconds")
    q = (sessions.writeStream.format("memory").queryName("sess_b")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    out = spark.table("sess_b")
    # session invariants: end >= start, positive counts, one user per row
    bad = out.filter((F.col("session_end") < F.col("session_start"))
                     | (F.col("n_events") <= 0)).count()
    assert bad == 0
    assert out.count() > 0


def test_stream_dedup_matches_batch(spark, tmp_path_factory):
    """Streamed exact dedup emits each distinct content hash exactly once —
    equal to the batch exact_dedup groups on the same (duplicated) data."""
    from tostore_spark import ToStoreSpark
    from tostore_spark.llmops.dedup import exact_dedup
    from tostore_spark.streaming.stateful import dedup_stream
    db = ToStoreSpark(spark, data_dir="/root/testdata/sf0.001")
    docs = db.df("documents").select("doc_id", "text").limit(100)
    doubled = docs.unionByName(docs)   # every doc arrives twice
    src = str(tmp_path_factory.mktemp("dedup_src"))
    doubled.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema("doc_id bigint, text string").parquet(src)
    q = (dedup_stream(stream).writeStream.format("memory")
         .queryName("dedup_out").outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.table("dedup_out")
    want = exact_dedup(doubled)
    assert got.count() == want.count()          # one row per distinct text
    assert got.groupBy("text_hash").count().filter("count > 1").count() == 0
    sa = {r["text_hash"] for r in got.select("text_hash").collect()}
    sb = {r["text_hash"] for r in want.select("text_hash").collect()}
    assert sa == sb


def test_stream_upsert_sink_into_table(spark, tmp_path_factory):
    """readStream -> foreachBatch merge: streamed rows upsert into a
    registered table by PK; replayed keys take the latest value."""
    from tostore_spark import ToStoreSpark
    from tostore_spark.schema import PrimaryKeyConfig, TableSchema
    from tostore_spark.streaming.sink import write_stream_to_table
    db = ToStoreSpark(spark)
    base = spark.createDataFrame(
        [(0, "old0"), (1, "old1"), (2, "old2")], ["id", "val"])
    db.register_table("ing", df=base,
                      schema=TableSchema(name="ing",
                                         primary_key=PrimaryKeyConfig(name="id")))
    src = str(tmp_path_factory.mktemp("ing_src"))
    spark.createDataFrame(
        [(1, "new1"), (3, "new3")], ["id", "val"]
    ).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("id bigint, val string").parquet(src)
    q = write_stream_to_table(
        db, stream, "ing",
        checkpoint=str(tmp_path_factory.mktemp("ing_ckpt")))
    q.awaitTermination(120)
    got = {r["id"]: r["val"] for r in db.df("ing").collect()}
    assert got == {0: "old0", 1: "new1", 2: "old2", 3: "new3"}


def test_stream_sink_flushes_to_warehouse(spark, tmp_path_factory):
    """flush_each_batch: a fresh engine on the same warehouse sees the
    streamed rows after the query completes."""
    from tostore_spark import ToStoreSpark
    from tostore_spark.schema import PrimaryKeyConfig, TableSchema
    from tostore_spark.streaming.sink import write_stream_to_table
    wh = str(tmp_path_factory.mktemp("wh_stream"))
    db = ToStoreSpark(spark, warehouse=wh)
    db.register_table("ing2", df=spark.createDataFrame(
        [(0, "seed")], ["id", "val"]),
        schema=TableSchema(name="ing2",
               primary_key=PrimaryKeyConfig(name="id")))
    src = str(tmp_path_factory.mktemp("ing2_src"))
    spark.createDataFrame([(7, "streamed")], ["id", "val"]) \
         .write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("id bigint, val string").parquet(src)
    q = write_stream_to_table(
        db, stream, "ing2", flush_each_batch=True,
        checkpoint=str(tmp_path_factory.mktemp("ing2_ckpt")))
    q.awaitTermination(120)
    db2 = ToStoreSpark(spark, warehouse=wh)
    got = {r["id"]: r["val"] for r in db2.df("ing2").collect()}
    assert got == {0: "seed", 7: "streamed"}


def test_clean_stream_scrubs_against_static_index(spark, tmp_path_factory):
    """Streamed documents are scrubbed against the persisted batch span
    index (stream-static join): corpus boilerplate is dropped from NEW
    streamed docs; their unique content survives."""
    from tostore_spark.llmops.dedup import span_freq_index
    from tostore_spark.streaming.stateful import clean_stream
    boiler = "all rights reserved by the example corp inc"  # 8 words
    corpus = spark.createDataFrame([
        (1, boiler + " alpha beta gamma delta one two three four"),
        (2, boiler + " epsilon zeta eta theta five six seven eight"),
    ], ["doc_id", "text"])
    idx_dir = str(tmp_path_factory.mktemp("span_idx"))
    span_freq_index(corpus, k=8).write.mode("overwrite").parquet(idx_dir)

    src = str(tmp_path_factory.mktemp("stream_src"))
    spark.createDataFrame(
        [(10, boiler + " fresh streamed words never indexed before now")],
        ["doc_id", "text"]).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("doc_id bigint, text string").parquet(src)
    # the unbounded (no-watermark) state mode is opt-in: without the
    # acknowledgement flag a long-running ingest must not reach it
    import pytest
    with pytest.raises(ValueError, match="unbounded_state"):
        clean_stream(stream, spark.read.parquet(idx_dir), k=8)
    cleaned = clean_stream(stream, spark.read.parquet(idx_dir), k=8,
                           unbounded_state=True)
    q = (cleaned.writeStream.format("memory").queryName("clean_out")
         .outputMode("update").trigger(availableNow=True).start())
    q.awaitTermination(120)
    out = spark.table("clean_out").collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_dropped"] == 1
    assert r["clean_text"] == "fresh streamed words never indexed before now"


def test_gap_sessionization_vs_native_session_window(spark, db):
    """Our lag-gap sessionization must count sessions exactly like
    Spark's built-in session_window aggregation (same 1h gap): an
    independent engine-internal implementation agreeing with the
    window-function formulation pins both."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from tostore_spark.functions.colutil import epoch_us
    ev = (db.df("events").filter(F.col("user_id") < 100)
          .select("user_id", F.col("ts").cast("timestamp").alias("ts")))
    # lag-gap formulation (the q_events_sessions shape)
    w = Window.partitionBy("user_id").orderBy("ts")
    us = epoch_us(F.col("ts"))
    gap = us - F.lag(us).over(w)
    ours = (ev.withColumn("ns", F.when(gap.isNull()
                                       | (gap > 3600 * 1_000_000), 1)
                          .otherwise(0))
            .groupBy("user_id").agg(F.sum("ns").alias("n_sessions")))
    # native session_window formulation
    native = (ev.groupBy("user_id",
                         F.session_window("ts", "1 hour"))
              .count()
              .groupBy("user_id")
              .agg(F.count(F.lit(1)).alias("n_sessions")))
    a = {r.user_id: r.n_sessions for r in ours.collect()}
    b = {r.user_id: r.n_sessions for r in native.collect()}
    assert a == b and len(a) > 10


def test_stream_rolling_active_matches_batch(spark, db, tmp_path):
    """Streaming sliding-window approx distinct actives == the identical
    batch windowed expression (HLL merge is associative → deterministic),
    and within HLL tolerance of the exact batch rolling_distinct."""
    from pyspark.sql import functions as F

    from tostore_spark.functions.timeseries import rolling_distinct
    from tostore_spark.streaming.reactive import stream_rolling_active

    src = str(tmp_path / "ev_src")
    ev = db.df("events")
    ev.write.mode("overwrite").parquet(src)
    agg = stream_rolling_active(spark, src, ev.schema, window_days=7,
                                watermark="2 days")
    q = (agg.writeStream.format("memory").queryName("wau_stream")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["window"]["start"], r["window"]["end"]): r["n_active_approx"]
           for r in spark.sql("select * from wau_stream").collect()}

    batch = (ev.withColumn("ts", F.col("ts").cast("timestamp"))
               .groupBy(F.window("ts", "7 days", "1 day"))
               .agg(F.approx_count_distinct("user_id").alias("n")))
    want = {(r["window"]["start"], r["window"]["end"]): r["n"]
            for r in batch.collect()}
    assert got == want and len(got) > 0       # streaming ≡ batch HLL

    # HLL tolerance vs the EXACT sliding distinct: compare each day's
    # exact count to the approx of the window ENDING after that day
    exact = {r["day"]: r["n_active"] for r in
             rolling_distinct(ev, "ts", "user_id", 7).collect()}
    import datetime
    checked = 0
    for (ws, we), n_approx in got.items():
        day = (we - datetime.timedelta(days=1)).date()
        if day in exact and exact[day] >= 5:
            # HLL default rsd ~5%; small counts carry absolute jitter
            assert abs(n_approx - exact[day]) <= max(3, 0.2 * exact[day])
            checked += 1
    assert checked > 0


def test_exactly_once_processor_skips_replayed_batch(spark, tmp_path_factory):
    """Crash-replay contract, driven directly: the same batch_id applied
    twice in mode='append' merges ONCE — the ledger, not PK idempotence,
    is what blocks the duplicate — and a LATER batch still lands."""
    from tostore_spark import ToStoreSpark
    from tostore_spark.streaming.sink import exactly_once_processor
    wh = str(tmp_path_factory.mktemp("wh_eo"))
    db = ToStoreSpark(spark, warehouse=wh)
    db.register_table("eo", df=spark.createDataFrame(
        [(0, "seed")], ["id", "val"]))
    proc = exactly_once_processor(db, "eo", mode="append")
    b1 = spark.createDataFrame([(1, "b1")], ["id", "val"])
    proc(b1, 0)
    proc(b1, 0)                       # framework replay after "crash"
    proc(spark.createDataFrame([(2, "b2")], ["id", "val"]), 1)
    rows = db.df("eo").collect()
    assert sorted((r.id, r.val) for r in rows) == \
        [(0, "seed"), (1, "b1"), (2, "b2")]
    # ledger + data committed together: a fresh engine on the same
    # warehouse sees both, and its processor ALSO skips the replay
    db2 = ToStoreSpark(spark, warehouse=wh)
    proc2 = exactly_once_processor(db2, "eo", mode="append")
    proc2(b1, 1)                      # replay of last committed batch
    assert db2.df("eo").count() == 3
    assert db2.get_value("__stream_ledger__:eo:default") == 1


def test_exactly_once_stream_end_to_end(spark, tmp_path_factory):
    """Full Structured Streaming run with exactly_once=True: rows land
    once, the ledger records the final batch id, and a reopened engine
    agrees."""
    from tostore_spark import ToStoreSpark
    from tostore_spark.streaming.sink import write_stream_to_table
    wh = str(tmp_path_factory.mktemp("wh_eo2"))
    db = ToStoreSpark(spark, warehouse=wh)
    db.register_table("eo2", df=spark.createDataFrame(
        [(0, "seed")], ["id", "val"]))
    src = str(tmp_path_factory.mktemp("eo2_src"))
    spark.createDataFrame([(7, "s7"), (8, "s8")], ["id", "val"]) \
         .write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("id bigint, val string").parquet(src)
    q = write_stream_to_table(
        db, stream, "eo2", mode="append", exactly_once=True,
        checkpoint=str(tmp_path_factory.mktemp("eo2_ckpt")))
    q.awaitTermination(120)
    db2 = ToStoreSpark(spark, warehouse=wh)
    got = sorted((r.id, r.val) for r in db2.df("eo2").collect())
    assert got == [(0, "seed"), (7, "s7"), (8, "s8")]
    assert db2.get_value("__stream_ledger__:eo2:default") is not None


def test_exactly_once_multi_sink_atomic_commit(spark, tmp_path_factory):
    """Multi-table exactly-once (the r9 verdict's two-table crash
    window): one batch fans into TWO tables + ONE group ledger entry,
    all durable in a single manifest CAS — a replay merges zero rows
    into BOTH, even in mode='append' where PK idempotence can't help,
    and a fresh engine's processor agrees."""
    from pyspark.sql import functions as F
    from tostore_spark import ToStoreSpark
    from tostore_spark.streaming.sink import exactly_once_multi_processor
    wh = str(tmp_path_factory.mktemp("wh_eom"))
    db = ToStoreSpark(spark, warehouse=wh)
    db.register_table("raw_t", df=spark.createDataFrame(
        [(0, 10)], ["id", "v"]))
    db.register_table("dbl_t", df=spark.createDataFrame(
        [(0, 20)], ["id", "v2"]))
    proc = exactly_once_multi_processor(db, [
        {"table": "raw_t", "mode": "append"},
        {"table": "dbl_t", "mode": "append",
         "transform": lambda b: b.select(
             "id", (F.col("v") * 2).alias("v2"))},
    ])
    b1 = spark.createDataFrame([(1, 11)], ["id", "v"])
    proc(b1, 0)
    proc(b1, 0)                       # framework replay after "crash"
    proc(spark.createDataFrame([(2, 12)], ["id", "v"]), 1)
    assert sorted((r.id, r.v) for r in db.df("raw_t").collect()) == \
        [(0, 10), (1, 11), (2, 12)]
    assert sorted((r.id, r.v2) for r in db.df("dbl_t").collect()) == \
        [(0, 20), (1, 22), (2, 24)]
    # atomicity across the crash boundary: a FRESH engine on the same
    # warehouse sees both tables at the same batch frontier, and its
    # replay of the last committed batch is a no-op on BOTH
    db2 = ToStoreSpark(spark, warehouse=wh)
    proc2 = exactly_once_multi_processor(db2, [
        {"table": "raw_t", "mode": "append"},
        {"table": "dbl_t", "mode": "append",
         "transform": lambda b: b.select(
             "id", (F.col("v") * 2).alias("v2"))},
    ])
    proc2(spark.createDataFrame([(2, 12)], ["id", "v"]), 1)
    assert db2.df("raw_t").count() == 3
    assert db2.df("dbl_t").count() == 3
    assert db2.get_value("__stream_ledger__:raw_t+dbl_t:default") == 1


def test_neardup_ingest_processor(spark, tmp_path_factory):
    """Near-dup-filtered ingest: batch docs colliding with the corpus
    band index (or with a smaller-id batch doc) drop; survivors land in
    the table AND the index in one commit; a crash-replay no-ops both."""
    from tostore_spark import ToStoreSpark
    from tostore_spark.llmops.dedup import minhash_band_index
    from tostore_spark.streaming.sink import neardup_ingest_processor

    t_corp = ("the quick brown fox jumps over the lazy dog near the "
              "riverbank every single morning in spring")
    t_uniq = ("completely different content about distributed query "
              "engines and columnar storage formats at scale")
    t_pair = ("another text that appears twice inside the same arriving "
              "micro batch with identical shingle structure")
    wh = str(tmp_path_factory.mktemp("wh_ndi"))
    db = ToStoreSpark(spark, warehouse=wh)
    corpus = spark.createDataFrame([(1, t_corp)], ["doc_id", "text"])
    db.register_table("corp", df=corpus)
    db.register_table("corp_idx", df=minhash_band_index(corpus)
                      .localCheckpoint(eager=True))
    db.flush()

    batch = spark.createDataFrame(
        [(10, t_corp),        # collides with the corpus -> drop
         (11, t_uniq),        # unique -> keep
         (12, t_pair),        # within-batch pair: smaller id -> keep
         (13, t_pair)],       # larger id -> drop
        ["doc_id", "text"])
    proc = neardup_ingest_processor(db, "corp", "corp_idx")
    assert proc(batch, 0) == 2
    assert sorted(r.doc_id for r in db.df("corp").collect()) == [1, 11, 12]
    assert sorted(r.id for r in
                  db.df("corp_idx").select("id").distinct().collect()) \
        == [1, 11, 12]
    # crash-replay: fresh engine, same batch id -> zero rows merged
    db2 = ToStoreSpark(spark, warehouse=wh)
    proc2 = neardup_ingest_processor(db2, "corp", "corp_idx")
    assert proc2(batch, 0) == 0
    assert db2.df("corp").count() == 3
    assert db2.df("corp_idx").select("id").distinct().count() == 3
    # a LATER batch still filters against the GROWN index
    batch2 = spark.createDataFrame(
        [(20, t_uniq),        # collides with doc 11's bands -> drop
         (21, "a genuinely novel string of words about astronomy and "
              "deep space telescopes orbiting far away")],
        ["doc_id", "text"])
    assert proc2(batch2, 1) == 1
    assert sorted(r.doc_id for r in db2.df("corp").collect()) \
        == [1, 11, 12, 21]
