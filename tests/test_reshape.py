"""SCD2 history merge, incremental MV maintenance, pivot/unpivot,
grouping sets, heavy hitters, query set ops, topic-balanced sampling."""

import pytest
from pyspark.sql import functions as F

from tostore_spark.functions.skew import heavy_hitters
from tostore_spark.plans.mv import mv_build, mv_delta, mv_merge
from tostore_spark.plans.pivot import pivot_table, unpivot
from tostore_spark.plans.rollup import grouping_sets
from tostore_spark.plans.scd import scd2_apply, scd2_init


# ---------------------------------------------------------------- SCD2
def _hist(spark):
    dim = spark.createDataFrame(
        [(1, "gold", "EU"), (2, "silver", "US"), (3, "gold", "APAC")],
        "k int, tier string, region string")
    return scd2_init(dim, effective="2020-01-01 00:00:00")


def test_scd2_init_all_open(spark):
    h = _hist(spark)
    rows = h.collect()
    assert len(rows) == 3
    assert all(r.is_current and r.valid_to is None for r in rows)


def test_scd2_change_new_unchanged_and_stale(spark):
    h = _hist(spark)
    upd = spark.createDataFrame(
        [(1, "plat", "EU", "2021-06-01 00:00:00"),     # changed attr
         (2, "silver", "US", "2021-06-01 00:00:00"),   # unchanged → no-op
         (4, "bronze", "EU", "2021-06-01 00:00:00"),   # brand-new key
         (3, "stale", "APAC", "2019-01-01 00:00:00")], # older than open row
        "k int, tier string, region string, effective_ts string")
    upd = upd.withColumn("effective_ts",
                         F.col("effective_ts").cast("timestamp"))
    out = scd2_apply(h, upd, keys=["k"], tracked=["tier", "region"])
    rows = {(r.k, r.is_current): r for r in out.collect()}
    assert len(rows) == 5  # 3 open survivors/new + closed k=1 + new k=1
    closed = rows[(1, False)]
    assert str(closed.valid_to).startswith("2021-06-01")
    assert closed.tier == "gold"
    assert rows[(1, True)].tier == "plat"
    assert rows[(2, True)].tier == "silver"       # idempotent no-op
    assert rows[(4, True)].tier == "bronze"       # new key opened
    assert rows[(3, True)].tier == "gold"         # stale update ignored


def test_scd2_latest_update_per_key_wins(spark):
    h = _hist(spark)
    upd = spark.createDataFrame(
        [(1, "a", "EU", "2021-01-01 00:00:00"),
         (1, "b", "EU", "2021-02-01 00:00:00")],
        "k int, tier string, region string, effective_ts string")
    upd = upd.withColumn("effective_ts",
                         F.col("effective_ts").cast("timestamp"))
    out = scd2_apply(h, upd, keys=["k"], tracked=["tier", "region"])
    cur = out.filter(F.col("is_current") & (F.col("k") == 1)).collect()
    assert len(cur) == 1 and cur[0].tier == "b"


def test_scd2_second_batch_composes(spark):
    h = _hist(spark)
    mk = lambda rows: (  # noqa: E731
        h.sparkSession.createDataFrame(
            rows, "k int, tier string, region string, effective_ts string")
        .withColumn("effective_ts", F.col("effective_ts").cast("timestamp")))
    h1 = scd2_apply(h, mk([(1, "plat", "EU", "2021-01-01 00:00:00")]),
                    ["k"], ["tier", "region"])
    h2 = scd2_apply(h1, mk([(1, "diamond", "EU", "2022-01-01 00:00:00")]),
                    ["k"], ["tier", "region"])
    k1 = sorted(h2.filter(F.col("k") == 1).collect(),
                key=lambda r: str(r.valid_from))
    assert [r.tier for r in k1] == ["gold", "plat", "diamond"]
    assert [r.is_current for r in k1] == [False, False, True]
    # closed intervals chain: valid_to == next valid_from
    assert k1[0].valid_to == k1[1].valid_from
    assert k1[1].valid_to == k1[2].valid_from


# ---------------------------------------------------------------- MV
def test_mv_incremental_matches_recompute(spark, db):
    orders = db.df("orders")
    base = orders.filter(F.col("o_orderkey") % 3 != 0)
    ins = orders.filter(F.col("o_orderkey") % 3 == 0)
    dele = base.filter(F.col("o_orderkey") % 5 == 0)

    mv = mv_build(base, ["o_custkey"], sums=["o_totalprice"])
    merged = mv_merge(mv,
                      mv_delta(ins, ["o_custkey"], sums=["o_totalprice"]),
                      mv_delta(dele, ["o_custkey"], sums=["o_totalprice"],
                               sign=-1))
    truth = mv_build(
        base.exceptAll(dele).unionByName(ins),
        ["o_custkey"], sums=["o_totalprice"])
    got = {r.o_custkey: (r.n, r["sum_o_totalprice"])
           for r in merged.collect()}
    want = {r.o_custkey: (r.n, r["sum_o_totalprice"])
            for r in truth.collect()}
    assert got == want  # decimal partials → bit-exact retraction


def test_mv_full_retraction_drops_group(spark):
    fact = spark.createDataFrame([(1, 10.0), (2, 5.0)], "k int, v double")
    mv = mv_build(fact, ["k"], sums=["v"])
    merged = mv_merge(mv, mv_delta(fact.filter("k = 1"), ["k"],
                                   sums=["v"], sign=-1))
    assert [r.k for r in merged.collect()] == [2]


# ------------------------------------------------------- pivot/unpivot
def test_pivot_counts_and_sums(spark, db, duck):
    orders = db.df("orders")
    out = pivot_table(orders, ["o_orderpriority"], "o_orderstatus",
                      values=["F", "O", "P"], agg="count").collect()
    want = {r[0]: (r[1], r[2], r[3]) for r in duck.execute("""
        SELECT o_orderpriority,
               count(*) FILTER (o_orderstatus='F'),
               count(*) FILTER (o_orderstatus='O'),
               count(*) FILTER (o_orderstatus='P')
        FROM orders GROUP BY 1""").fetchall()}
    got = {r.o_orderpriority: (r.F_count, r.O_count, r.P_count)
           for r in out}
    assert got == want


def test_pivot_requires_known_agg(spark, db):
    with pytest.raises(ValueError):
        pivot_table(db.df("orders"), ["o_orderpriority"],
                    "o_orderstatus", ["F"], agg="median")


def test_unpivot_roundtrip_count(spark, db):
    cust = db.df("customer").limit(50)
    long = unpivot(cust, ["c_custkey"], ["c_acctbal", "c_nationkey"])
    assert long.count() == 100
    back = (long.groupBy("c_custkey")
            .pivot("variable", ["c_acctbal", "c_nationkey"])
            .agg(F.first("value")))
    orig = {r.c_custkey: (r.c_acctbal, float(r.c_nationkey))
            for r in cust.collect()}
    got = {r.c_custkey: (r.c_acctbal, r.c_nationkey)
           for r in back.collect()}
    assert got == orig


# ------------------------------------------------------- grouping sets
def test_grouping_sets_matches_duck(spark, db, duck):
    out = grouping_sets(db.df("orders"),
                        [["o_orderstatus", "o_orderpriority"],
                         ["o_orderstatus"], []],
                        value_field="o_totalprice")
    got = {(r.o_orderstatus, r.o_orderpriority, r.gid):
           (r.n, round(r.sum_value, 4)) for r in out.collect()}
    want = {(s, p, g): (n, round(sv, 4)) for s, p, g, n, sv in duck.execute("""
        SELECT o_orderstatus, o_orderpriority,
               grouping(o_orderstatus, o_orderpriority) AS gid,
               count(1) AS n,
               CAST(sum(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), ())""").fetchall()}
    assert got == want


# ------------------------------------------------------- heavy hitters
def test_heavy_hitters_exact(spark, db, duck):
    out = heavy_hitters(db.df("events"), ["event_type"], min_share=0.1)
    got = {r.event_type: (r.n, round(r.share, 9)) for r in out.collect()}
    want = {t: (n, round(s, 9)) for t, n, s in duck.execute("""
        WITH c AS (SELECT event_type, count(*) AS n FROM events GROUP BY 1),
        t AS (SELECT count(*) AS total FROM events)
        SELECT event_type, n, n / total FROM c, t
        WHERE n / total >= 0.1""").fetchall()}
    assert got == want
    # the result is bounded by 1/s regardless of input size
    assert len(got) <= 10


# ------------------------------------------------------------- set ops
def test_query_set_ops(db, duck):
    big = (db.query("customer").where("c_acctbal", ">", 8000)
           .select(["c_custkey"]))
    seg = (db.query("customer").where("c_mktsegment", "=", "BUILDING")
           .select(["c_custkey"]))
    n_union = big.union(seg).count()
    n_inter = big.intersect(seg).count()
    n_exc = big.except_(seg).count()
    w_union, w_inter, w_exc = [duck.execute(f"""
        SELECT count(*) FROM (
          SELECT c_custkey FROM customer WHERE c_acctbal > 8000
          {op}
          SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        """).fetchone()[0] for op in ("UNION", "INTERSECT", "EXCEPT")]
    assert (n_union, n_inter, n_exc) == (w_union, w_inter, w_exc)
    # inclusion-exclusion sanity: |A∪B| = |A| + |B| − |A∩B|
    assert n_union == big.df().count() + seg.df().count() - n_inter


def test_query_set_ops_all_variants(db):
    a = db.query("orders").select(["o_orderstatus"])
    b = db.query("orders").where("o_orderstatus", "=", "F") \
        .select(["o_orderstatus"])
    total = a.df().count()
    nf = b.df().count()
    assert a.union(b, all=True).count() == total + nf
    assert a.intersect(b, all=True).count() == nf
    assert a.except_(b, all=True).count() == total - nf


# ------------------------------------------- topic-balanced sampling
def test_topic_balanced_sample(spark, db):
    from tostore_spark.llmops.pipeline import topic_balanced_sample
    from tostore_spark.llmops.similarity import fixed_centroids

    emb = db.df("embeddings")
    dim = len(emb.select("embedding").first()[0])
    cents = fixed_centroids(dim, 8)
    out = topic_balanced_sample(emb, per_cell=5, n_cells=8,
                                centroids=cents)
    per = {r.cell_id: r.n for r in
           out.groupBy("cell_id").agg(F.count("*").alias("n")).collect()}
    assert all(n <= 5 for n in per.values())
    # deterministic: same call → same ids
    ids1 = sorted(r.vec_id for r in out.select("vec_id").collect())
    out2 = topic_balanced_sample(emb, per_cell=5, n_cells=8,
                                 centroids=cents)
    ids2 = sorted(r.vec_id for r in out2.select("vec_id").collect())
    assert ids1 == ids2


# ------------------------------------------- streaming MV maintenance
def test_stream_mv_matches_batch_build(spark, tmp_path_factory):
    """Micro-batched folds into the MV must equal one batch mv_build."""
    from tostore_spark.plans.mv import mv_build
    from tostore_spark.streaming.sink import write_stream_to_mv
    from tostore_spark import ToStoreSpark

    rows = [(i, f"k{i % 7}", float(i % 11)) for i in range(200)]
    df = spark.createDataFrame(rows, "id bigint, k string, v double")
    src = str(tmp_path_factory.mktemp("mv_src"))
    # three files → multiple micro-batches under availableNow
    for part in range(3):
        df.filter(F.col("id") % 3 == part).write.mode("append").parquet(src)

    db = ToStoreSpark(spark)
    stream = spark.readStream.schema("id bigint, k string, v double") \
        .option("maxFilesPerTrigger", 1).parquet(src)
    q = write_stream_to_mv(db, stream, "mv_k", keys=["k"], sums=["v"],
                           checkpoint=str(tmp_path_factory.mktemp("mv_ck")))
    q.awaitTermination(120)

    got = {r.k: (r.n, float(r.sum_v)) for r in db.df("mv_k").collect()}
    want = {r.k: (r.n, float(r.sum_v))
            for r in mv_build(df, ["k"], sums=["v"]).collect()}
    assert got == want


def test_stream_mv_cdc_retractions(spark, tmp_path_factory):
    """A +1/-1 change feed maintains the MV under deletes; fully
    retracted groups vanish."""
    from tostore_spark.streaming.sink import write_stream_to_mv
    from tostore_spark import ToStoreSpark

    ins = [(i, f"k{i % 3}", 2.0, 1) for i in range(30)]
    dels = [(i, f"k{i % 3}", 2.0, -1) for i in range(30) if i % 3 == 0]
    df = spark.createDataFrame(ins + dels,
                               "id bigint, k string, v double, op int")
    src = str(tmp_path_factory.mktemp("cdc_src"))
    df.write.mode("overwrite").parquet(src)

    db = ToStoreSpark(spark)
    stream = spark.readStream \
        .schema("id bigint, k string, v double, op int").parquet(src)
    q = write_stream_to_mv(db, stream, "mv_cdc", keys=["k"], sums=["v"],
                           op_field="op",
                           checkpoint=str(tmp_path_factory.mktemp("cdc_ck")))
    q.awaitTermination(120)

    got = {r.k: (r.n, float(r.sum_v)) for r in db.df("mv_cdc").collect()}
    # k0 got 10 inserts and 10 retractions → gone entirely
    assert got == {"k1": (10, 20.0), "k2": (10, 20.0)}


# ----------------------------- review-fix regressions (round 6 review)
def test_scd2_equal_ts_correction_applies(spark):
    """An update stamped with the SAME effective_ts as the open row but
    different attrs is a correction, not a replay — it must apply."""
    h = _hist(spark)
    upd = spark.createDataFrame(
        [(1, "fixed", "EU", "2020-01-01 00:00:00")],
        "k int, tier string, region string, effective_ts string") \
        .withColumn("effective_ts", F.col("effective_ts").cast("timestamp"))
    out = scd2_apply(h, upd, ["k"], ["tier", "region"])
    k1 = {r.is_current: r for r in out.filter("k = 1").collect()}
    assert k1[True].tier == "fixed"
    assert k1[False].tier == "gold" and k1[False].valid_to == k1[False].valid_from


def test_scd2_no_separator_collision(spark):
    """('x\\x1fy','z') vs ('x','y\\x1fz') are DIFFERENT tracked tuples."""
    dim = spark.createDataFrame([(1, "x\x1fy", "z")],
                                "k int, a string, b string")
    h = scd2_init(dim, effective="2020-01-01 00:00:00")
    upd = spark.createDataFrame(
        [(1, "x", "y\x1fz", "2021-01-01 00:00:00")],
        "k int, a string, b string, effective_ts string") \
        .withColumn("effective_ts", F.col("effective_ts").cast("timestamp"))
    out = scd2_apply(h, upd, ["k"], ["a", "b"])
    cur = out.filter("is_current").collect()
    assert len(cur) == 1 and cur[0].a == "x" and cur[0].b == "y\x1fz"
    assert out.filter("not is_current").count() == 1


def test_mv_merge_explicit_keys_with_awkward_names(spark):
    fact = spark.createDataFrame([("sum_a", 1.0), ("sum_a", 2.0),
                                  ("n", 3.0)], "sum_region string, v double")
    mv = mv_build(fact, ["sum_region"], sums=["v"])
    merged = mv_merge(mv, mv_delta(fact, ["sum_region"], sums=["v"]),
                      keys=["sum_region"])
    got = {r.sum_region: (r.n, float(r.sum_v)) for r in merged.collect()}
    assert got == {"sum_a": (4, 6.0), "n": (2, 6.0)}


def test_pivot_sum_without_agg_field_raises(spark, db):
    with pytest.raises(ValueError, match="agg_field"):
        pivot_table(db.df("orders"), ["o_orderpriority"],
                    "o_orderstatus", ["F"], agg="sum")


# ------------------------------------------- builder explain / sample
def test_query_explain_returns_plan(db):
    plan = (db.query("orders").where("o_totalprice", ">", 100000)
            .order_by_desc("o_totalprice").limit(5).explain())
    assert "TakeOrderedAndProject" in plan
    assert "PushedFilters" in plan


def test_query_sample_deterministic_and_filtering(db, duck):
    q = db.query("orders").sample(0.25, hash_field="o_orderkey")
    n1, n2 = q.df().count(), q.clone().df().count()
    assert n1 == n2  # deterministic (md5 filter, not rand())
    total = db.query("orders").count()
    assert 0 < n1 < total
    # matches the same md5 permyriad filter in DuckDB
    want = duck.execute("""
        SELECT count(*) FROM orders
        WHERE CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)),
                                   1, 8)) AS BIGINT) % 10000
              < 2500""").fetchone()[0]
    assert n1 == want


def test_scd2_lookup_point_in_time(spark):
    import datetime as dt
    from tostore_spark.plans.scd import scd2_lookup
    t = lambda s: dt.datetime.fromisoformat(s)
    hist = spark.createDataFrame(
        [(1, "bronze", t("2020-01-01"), t("2024-02-01"), False),
         (1, "silver", t("2024-02-01"), None, True),
         (2, "gold", t("2020-01-01"), None, True)],
        ["uid", "tier", "valid_from", "valid_to", "is_current"])
    facts = spark.createDataFrame(
        [(10, 1, t("2024-01-15")),   # before the switch -> bronze
         (11, 1, t("2024-02-01")),   # boundary: valid_from inclusive -> silver
         (12, 1, t("2024-03-01")),   # after -> silver
         (13, 2, t("2024-01-01")),   # single-version key
         (14, 3, t("2024-01-01"))],  # no dimension row
        ["fid", "uid", "ts"])
    out = {r.fid: r for r in scd2_lookup(facts, hist, "uid", "ts").collect()}
    assert out[10].tier == "bronze" and out[11].tier == "silver"
    assert out[12].tier == "silver" and out[13].tier == "gold"
    assert out[14].tier is None            # left join keeps the orphan
    # inner drops it
    assert 14 not in {r.fid for r in
                      scd2_lookup(facts, hist, "uid", "ts",
                                  how="inner").collect()}
    # exactly one version matches per fact (intervals partition time)
    assert len(out) == 5
    import pytest as _pt
    with _pt.raises(ValueError):
        scd2_lookup(facts, hist, "uid", "ts", how="right")


def test_scd2_lookup_collision_suffix(spark):
    import datetime as dt
    from tostore_spark.plans.scd import scd2_lookup
    t0 = dt.datetime(2024, 1, 1)
    hist = spark.createDataFrame(
        [(1, "x", t0, None)],
        "uid long, tier string, valid_from timestamp, valid_to timestamp")
    facts = spark.createDataFrame(
        [(1, t0, "f")], ["uid", "ts", "tier"])   # fact has its own 'tier'
    out = scd2_lookup(facts, hist, "uid", "ts")
    assert "tier" in out.columns and "tier_dim" in out.columns
    r = out.collect()[0]
    assert r.tier == "f" and r.tier_dim == "x"
