"""Watermarked stream-stream interval join vs the identical batch join.

Inner results are emission-order-free, so the streamed inner join over a
file source run to completion must equal the batch join of the same
frames exactly.  The leftOuter variant needs the watermark to pass
left_ts + max_delay before unmatched rows emit, so the source carries a
far-future sentinel row to advance it; sentinels are dropped from both
sides of the comparison.
"""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"
DELAY = 1800  # seconds


def _batch_pairs(views, clicks, delay=DELAY):
    v, c = views.alias("l"), clicks.alias("r")
    cond = ((F.col("l.user_id") == F.col("r.user_id"))
            & (F.col("r.ts_r") >= F.col("l.ts"))
            & (F.col("r.ts_r") <= F.col("l.ts")
               + F.expr(f"INTERVAL {delay} SECONDS")))
    return v.join(c, cond).select("l.view_id", "r.click_id")


@pytest.fixture(scope="module")
def join_source(spark, tmp_path_factory):
    from tostore_spark import ToStoreSpark
    db = ToStoreSpark(spark, data_dir=SF)
    ev = db.df("events").withColumn("ts", F.col("ts").cast("timestamp"))
    views = (ev.filter(F.col("event_type") == "view")
               .select(F.col("event_id").alias("view_id"), "user_id", "ts"))
    clicks = (ev.filter(F.col("event_type") == "click")
                .select(F.col("event_id").alias("click_id"), "user_id",
                        F.col("ts").alias("ts_r")))
    vdir = str(tmp_path_factory.mktemp("views_src"))
    cdir = str(tmp_path_factory.mktemp("clicks_src"))
    # far-future sentinels advance BOTH watermarks past every real
    # left_ts + delay so leftOuter unmatched rows can emit
    far = ev.agg(F.max("ts")).collect()[0][0]
    vs = views.unionByName(
        views.limit(1).select(F.lit(-1).alias("view_id"),
                              F.lit(-1).alias("user_id"),
                              (F.lit(far) + F.expr("INTERVAL 100 HOURS"))
                              .alias("ts")))
    cs = clicks.unionByName(
        clicks.limit(1).select(F.lit(-1).alias("click_id"),
                               F.lit(-1).alias("user_id"),
                               (F.lit(far) + F.expr("INTERVAL 100 HOURS"))
                               .alias("ts_r")))
    vs.write.mode("overwrite").parquet(vdir)
    cs.write.mode("overwrite").parquet(cdir)
    return views, clicks, vdir, cdir


def _run_stream(spark, vdir, cdir, how, name, dedup_right=None,
                keep="left"):
    from tostore_spark.streaming.stateful import interval_join_stream
    lv = spark.readStream.schema(
        "view_id bigint, user_id bigint, ts timestamp").parquet(vdir)
    rc = spark.readStream.schema(
        "click_id bigint, user_id bigint, ts_r timestamp").parquet(cdir)
    out = interval_join_stream(lv, rc, "user_id",
                               max_delay_seconds=DELAY,
                               left_ts="ts", right_ts="ts_r",
                               watermark="0 seconds", how=how,
                               dedup_right=dedup_right)
    q = (out.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    t = spark.table(name)
    if keep == "right":       # rightOuter rows carry null view_id
        return t.filter((F.col("click_id") >= 0)
                        & (F.col("view_id").isNull()
                           | (F.col("view_id") >= 0)))
    return t.filter(F.col("view_id") >= 0)


def test_stream_interval_join_inner_matches_batch(spark, join_source):
    views, clicks, vdir, cdir = join_source
    got = sorted((r["view_id"], r["click_id"]) for r in
                 _run_stream(spark, vdir, cdir, "inner", "ij_inner")
                 .select("view_id", "click_id").collect())
    want = sorted((r["view_id"], r["click_id"]) for r in
                  _batch_pairs(views, clicks).collect())
    assert got == want and len(want) > 0
    # delay bracket actually holds on the streamed rows
    bad = (_run_stream(spark, vdir, cdir, "inner", "ij_inner2")
           .filter((F.col("delay_sec") < 0)
                   | (F.col("delay_sec") > DELAY)).count())
    assert bad == 0


def test_stream_interval_join_left_outer(spark, join_source):
    views, clicks, vdir, cdir = join_source
    out = _run_stream(spark, vdir, cdir, "leftOuter", "ij_left")
    matched = set(r["view_id"] for r in
                  _batch_pairs(views, clicks).select("view_id")
                  .distinct().collect())
    got_null = set(r["view_id"] for r in
                   out.filter(F.col("click_id").isNull())
                   .select("view_id").collect())
    all_views = set(r["view_id"] for r in views.select("view_id").collect())
    # every view either matched or emitted exactly as an unmatched row
    assert got_null == all_views - matched
    # and the matched side still equals the batch inner join
    got_pairs = sorted((r["view_id"], r["click_id"]) for r in
                       out.filter(F.col("click_id").isNotNull())
                       .select("view_id", "click_id").collect())
    want_pairs = sorted((r["view_id"], r["click_id"]) for r in
                        _batch_pairs(views, clicks).collect())
    assert got_pairs == want_pairs


def test_stream_interval_join_right_outer(spark, join_source):
    """rightOuter == batch right join: unmatched clicks emit exactly
    once with null left columns, matched pairs equal the inner join."""
    views, clicks, vdir, cdir = join_source
    out = _run_stream(spark, vdir, cdir, "rightOuter", "ij_right",
                      keep="right")
    matched = set(r["click_id"] for r in
                  _batch_pairs(views, clicks).select("click_id")
                  .distinct().collect())
    nulls = out.filter(F.col("view_id").isNull()) \
               .select("click_id", "user_id").collect()
    got_null = set(r["click_id"] for r in nulls)
    # the JOIN KEY must survive on unmatched rows (it coalesces from
    # the non-null side — the r10 fix; it used to emit key=null)
    assert all(r["user_id"] is not None for r in nulls)
    all_clicks = set(r["click_id"] for r in
                     clicks.select("click_id").collect())
    assert got_null == all_clicks - matched and len(got_null) > 0
    got_pairs = sorted((r["view_id"], r["click_id"]) for r in
                       out.filter(F.col("view_id").isNotNull())
                       .select("view_id", "click_id").collect())
    want_pairs = sorted((r["view_id"], r["click_id"]) for r in
                        _batch_pairs(views, clicks).collect())
    assert got_pairs == want_pairs


def test_stream_interval_join_duplicate_contract(spark, join_source,
                                                 tmp_path):
    """The documented at-least-once contract: a redelivered right
    event doubles its attribution pairs; dedup_right=['click_id']
    drops the redelivery inside the watermark and restores exact
    batch-join parity."""
    views, clicks, vdir, cdir = join_source
    dup_dir = str(tmp_path / "clicks_dup")
    dup = spark.read.parquet(cdir)
    # redeliver every real click once (sentinel stays single)
    dup.unionByName(dup.filter(F.col("click_id") >= 0)) \
       .write.mode("overwrite").parquet(dup_dir)
    want = sorted((r["view_id"], r["click_id"]) for r in
                  _batch_pairs(views, clicks).collect())
    doubled = sorted((r["view_id"], r["click_id"]) for r in
                     _run_stream(spark, vdir, dup_dir, "inner",
                                 "ij_dup").select("view_id", "click_id")
                     .collect())
    assert doubled == sorted(want + want)   # each pair exactly twice
    deduped = sorted((r["view_id"], r["click_id"]) for r in
                     _run_stream(spark, vdir, dup_dir, "inner",
                                 "ij_dedup",
                                 dedup_right=["click_id"])
                     .select("view_id", "click_id").collect())
    assert deduped == want


def test_interval_join_rejects_bad_args(spark):
    from tostore_spark.streaming.stateful import interval_join_stream
    df = spark.range(1).select(F.col("id").alias("user_id"),
                               F.current_timestamp().alias("ts"))
    with pytest.raises(ValueError, match="inner"):
        interval_join_stream(df, df, "user_id", how="full")
    with pytest.raises(ValueError, match="max_delay"):
        interval_join_stream(df, df, "user_id", max_delay_seconds=0)


def test_stream_interval_join_ts_name_collision(spark, join_source):
    """When BOTH sides call their event-time column `ts`, the right
    side is renamed `ts_r` and results match the explicit-name run."""
    from tostore_spark.streaming.stateful import interval_join_stream
    views, clicks, vdir, cdir = join_source
    # rewrite the clicks source with the colliding name
    import tempfile
    cdir2 = tempfile.mkdtemp(prefix="clicks_ts_")
    spark.read.parquet(cdir).withColumnRenamed("ts_r", "ts") \
        .write.mode("overwrite").parquet(cdir2)
    lv = spark.readStream.schema(
        "view_id bigint, user_id bigint, ts timestamp").parquet(vdir)
    rc = spark.readStream.schema(
        "click_id bigint, user_id bigint, ts timestamp").parquet(cdir2)
    out = interval_join_stream(lv, rc, "user_id",
                               max_delay_seconds=DELAY,
                               left_ts="ts", right_ts="ts",
                               watermark="0 seconds")
    assert "ts_r" in out.columns and out.columns.count("ts") == 1
    q = (out.writeStream.format("memory").queryName("ij_collide")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted((r["view_id"], r["click_id"]) for r in
                 spark.table("ij_collide")
                 .filter(F.col("view_id") >= 0)
                 .select("view_id", "click_id").collect())
    want = sorted((r["view_id"], r["click_id"]) for r in
                  _batch_pairs(views, clicks).collect())
    assert got == want
