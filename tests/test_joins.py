"""asof_join / range_join semantics vs brute-force oracles."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def small(spark):
    rows = [
        # (key, ts_seconds, side_tag, id)
        ("a", 10, "L", 1), ("a", 25, "L", 2), ("a", 5, "R", 101),
        ("a", 20, "R", 102), ("a", 25, "R", 103),
        ("b", 7, "L", 3), ("b", 9, "R", 104),   # right AFTER left
    ]
    df = spark.createDataFrame(rows, "k string, sec long, side string, id long")
    df = df.withColumn("ts", F.timestamp_seconds("sec"))
    left = df.filter("side = 'L'").select("k", "ts", F.col("id").alias("lid"))
    right = df.filter("side = 'R'").select("k", "ts", F.col("id").alias("rid"))
    return left, right


def test_asof_backward_with_ties(spark, small):
    from tostore_spark.joins import asof_join
    left, right = small
    out = {r["lid"]: r["rid_r"] for r in
           asof_join(left, right, on="k").collect()}
    # lid=1 (t=10) -> rid=101 (t=5); lid=2 (t=25) -> rid=103 (equal ts matches)
    # lid=3 (t=7) -> no click at-or-before -> null
    assert out == {1: 101, 2: 103, 3: None}


def test_asof_forward(spark, small):
    from tostore_spark.joins import asof_join
    left, right = small
    out = {r["lid"]: r["rid_r"] for r in
           asof_join(left, right, on="k", direction="forward").collect()}
    # forward: smallest right ts >= left ts
    assert out == {1: 102, 2: 103, 3: 104}


def test_asof_tolerance(spark, small):
    from tostore_spark.joins import asof_join
    left, right = small
    out = {r["lid"]: r["rid_r"] for r in
           asof_join(left, right, on="k", tolerance_ms=5000).collect()}
    # lid=1 match is 5s away (kept at 5000ms), lid=2 is 0s away
    assert out == {1: 101, 2: 103, 3: None}
    out2 = {r["lid"]: r["rid_r"] for r in
            asof_join(left, right, on="k", tolerance_ms=4000).collect()}
    assert out2 == {1: None, 2: 103, 3: None}


def test_range_join_matches_theta(spark, db):
    from tostore_spark.joins import range_join
    bands = spark.createDataFrame(
        [("x", 0.0, 3.0), ("y", 3.0, 9.5), ("z", 9.5, 40.0)],
        "band string, lo double, hi double")
    ev = db.df("events").select("event_id", "value")
    got = sorted((r["event_id"], r["band"]) for r in
                 range_join(ev, bands, "value", "lo", "hi", bin_width=4.0)
                 .collect())
    want = sorted((r["event_id"], r["band"]) for r in
                  ev.join(bands, (F.col("value") >= F.col("lo"))
                          & (F.col("value") < F.col("hi"))).collect())
    assert got == want and got


def test_range_join_plan_is_equijoin(spark, db):
    from tostore_spark.joins import range_join
    bands = spark.createDataFrame([("x", 0.0, 10.0)],
                                  "band string, lo double, hi double")
    plan = (range_join(db.df("events").select("event_id", "value"),
                       bands, "value", "lo", "hi", bin_width=5.0)
            ._jdf.queryExecution().executedPlan().toString())
    assert "NestedLoop" not in plan  # bin bucketing keeps it an equi-join


def test_asof_property_random(spark):
    """Randomized check vs a pure-Python as-of reference (both directions)."""
    import random
    from tostore_spark.joins import asof_join
    rnd = random.Random(7)
    for trial in range(3):
        lrows = [(rnd.choice("abc"), rnd.randrange(0, 1000), i)
                 for i in range(40)]
        rrows = [(rnd.choice("abc"), rnd.randrange(0, 1000), 100 + i)
                 for i in range(40)]
        left = spark.createDataFrame(
            [(k, s, i) for k, s, i in lrows], "k string, sec long, lid long") \
            .selectExpr("k", "timestamp_seconds(sec) as ts", "lid")
        right = spark.createDataFrame(
            [(k, s, i) for k, s, i in rrows], "k string, sec long, rid long") \
            .selectExpr("k", "timestamp_seconds(sec) as ts", "rid")

        def expect(direction):
            out = {}
            for k, s, i in lrows:
                if direction == "backward":
                    cands = [(rs, ri) for rk, rs, ri in rrows
                             if rk == k and rs <= s]
                    best = max(cands) if cands else None
                else:
                    cands = [(rs, ri) for rk, rs, ri in rrows
                             if rk == k and rs >= s]
                    best = min(cands) if cands else None
                out[i] = best[1] if best else None
            return out

        for direction in ("backward", "forward"):
            got = {r["lid"]: r["rid_r"] for r in
                   asof_join(left, right, on="k",
                             direction=direction).collect()}
            want = expect(direction)
            # ties on (ts) between right rows: both pick A right row at the
            # boundary ts; compare matched ts instead of id in that case
            ts_of = {ri: rs for _, rs, ri in rrows}
            for lid in want:
                g, w = got[lid], want[lid]
                if g != w:
                    assert g is not None and w is not None \
                        and ts_of[g] == ts_of[w], (direction, lid, g, w)


def test_asof_null_payload_travels_with_own_row(spark):
    """A genuine NULL in one right payload column must NOT be back-filled
    from an older right row (fields of the matched row travel together)."""
    from tostore_spark.joins import asof_join
    left = spark.createDataFrame([("a", 10, 1)], "k string, sec long, lid long") \
        .selectExpr("k", "timestamp_seconds(sec) as ts", "lid")
    right = spark.createDataFrame(
        [("a", 1, 5.0, "A"), ("a", 2, None, "B")],
        "k string, sec long, value double, tag string") \
        .selectExpr("k", "timestamp_seconds(sec) as ts", "value", "tag")
    row = asof_join(left, right, on="k").collect()[0]
    # the match is the ts=2 row: tag B, value genuinely NULL
    assert row["tag_r"] == "B" and row["value_r"] is None


def test_asof_tolerance_uses_matched_row_ts(spark):
    """Tolerance must gauge the gap against the matched row's own ts even
    when that row carries NULL payload fields."""
    from tostore_spark.joins import asof_join
    left = spark.createDataFrame([("a", 10, 1)], "k string, sec long, lid long") \
        .selectExpr("k", "timestamp_seconds(sec) as ts", "lid")
    right = spark.createDataFrame(
        [("a", 1, 5.0, "A"), ("a", 9, None, "B")],
        "k string, sec long, value double, tag string") \
        .selectExpr("k", "timestamp_seconds(sec) as ts", "value", "tag")
    # matched row is ts=9 (1s gap); with 2s tolerance it must be kept
    row = asof_join(left, right, on="k", tolerance_ms=2000).collect()[0]
    assert row["tag_r"] == "B" and row["value_r"] is None
    # with 0.5s tolerance the ts=9 match is dropped — NOT replaced by ts=1
    row2 = asof_join(left, right, on="k", tolerance_ms=500).collect()[0]
    assert row2["tag_r"] is None and row2["value_r"] is None


def test_range_join_left_keeps_unmatched(spark):
    from tostore_spark.joins import range_join
    pts = spark.createDataFrame([(1, 5.0), (2, 99.0)], "pid long, v double")
    bands = spark.createDataFrame([("x", 0.0, 10.0)],
                                  "band string, lo double, hi double")
    got = {r["pid"]: r["band"] for r in
           range_join(pts, bands, "v", "lo", "hi", bin_width=5.0,
                      how="left").collect()}
    assert got == {1: "x", 2: None}


def test_range_join_rejects_right_outer(spark):
    from tostore_spark.joins import range_join
    pts = spark.createDataFrame([(1, 5.0)], "pid long, v double")
    bands = spark.createDataFrame([("x", 0.0, 10.0)],
                                  "band string, lo double, hi double")
    with pytest.raises(ValueError):
        range_join(pts, bands, "v", "lo", "hi", bin_width=5.0, how="right")


def test_asof_tolerance_ntz_inputs(spark, small):
    """Spark 4.1 reads plain parquet timestamps as TIMESTAMP_NTZ; the
    tolerance gap must compute on NTZ inputs too (epoch_us casts)."""
    from tostore_spark.joins import asof_join
    left, right = small
    l_ntz = left.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    r_ntz = right.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    want = {(r["lid"], r["rid_r"]) for r in
            asof_join(left, right, on="k", tolerance_ms=5000).collect()}
    got = {(r["lid"], r["rid_r"]) for r in
           asof_join(l_ntz, r_ntz, on="k", tolerance_ms=5000).collect()}
    assert got == want and len(got) == 3


def test_semi_anti_full_join_types(spark, db, duck):
    semi = db.query("customer").semi_join(
        "orders", "customer.c_custkey", "=", "orders.o_custkey").df()
    anti = db.query("customer").anti_join(
        "orders", "customer.c_custkey", "=", "orders.o_custkey").df()
    # semi keeps only customer columns, no fan-out on multi-order keys
    assert semi.columns == db.df("customer").columns
    n_semi = semi.count()
    assert n_semi == duck.execute(
        "select count(*) from customer c where exists "
        "(select 1 from orders o where o.o_custkey = c.c_custkey)"
    ).fetchone()[0]
    # semi + anti partition the main table
    assert n_semi + anti.count() == db.df("customer").count()
    # full outer keeps unmatched rows from both sides
    full = db.query("customer").full_join(
        "orders", "customer.c_custkey", "=", "orders.o_custkey").df()
    assert full.count() == duck.execute(
        "select count(*) from customer c full outer join orders o "
        "on c.c_custkey = o.o_custkey").fetchone()[0]
    assert "o_orderkey" in full.columns and "c_custkey" in full.columns


def test_semi_join_theta_and_fk(spark, db, duck):
    # theta semi: suppliers whose acctbal strictly exceeds some customer's
    got = (db.query("supplier")
             .semi_join("customer", "supplier.s_acctbal", ">",
                        "customer.c_acctbal").df().count())
    want = duck.execute(
        "select count(*) from supplier s where exists "
        "(select 1 from customer c where s.s_acctbal > c.c_acctbal)"
    ).fetchone()[0]
    assert got == want
    # FK auto-join honors how='semi' (no right-side columns)
    from tostore_spark.schema import ForeignKeySchema
    sch = db.schema("orders")
    if not sch.foreign_keys:
        sch.foreign_keys.append(ForeignKeySchema(
            fields=["o_custkey"], referenced_table="customer",
            referenced_fields=["c_custkey"]))
    fk = db.query("orders").join_with_foreign_key("customer", how="semi").df()
    assert fk.columns == db.df("orders").columns
    assert fk.count() == duck.execute(
        "select count(*) from orders o where exists "
        "(select 1 from customer c where c.c_custkey = o.o_custkey)"
    ).fetchone()[0]


def test_join_hint_broadcast_and_shuffle(spark, db):
    hinted = (db.query("orders")
                .join("customer", "o_custkey", "=", "c_custkey")
                .join_hint("customer", "broadcast"))
    plan = hinted.df()._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    forced = (db.query("orders")
                .join("customer", "o_custkey", "=", "c_custkey")
                .join_hint("customer", "shuffle"))
    plan2 = forced.df()._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan2 and "BroadcastHashJoin" not in plan2
    import pytest as _pt
    with _pt.raises(ValueError):
        db.query("orders").join_hint("customer", "nested_loop")


def test_asof_nearest_direction(spark, small):
    from tostore_spark.joins import asof_join
    left, right = small
    out = {r["lid"]: r["rid_r"] for r in
           asof_join(left, right, on="k", direction="nearest").collect()}
    # lid=1 (t=10): backward rid=101 (gap 5) vs forward rid=102 (gap 10)
    # lid=2 (t=25): exact tie at t=25 -> backward/equal match rid=103
    # lid=3 (t=7): no backward; forward rid=104 (t=9)
    assert out == {1: 101, 2: 103, 3: 104}
    # tolerance applies to the chosen match's own gap
    tight = {r["lid"]: r["rid_r"] for r in
             asof_join(left, right, on="k", direction="nearest",
                       tolerance_ms=1000).collect()}
    assert tight == {1: None, 2: 103, 3: None}


def test_asof_nearest_differential(spark):
    import random
    from tostore_spark.joins import asof_join
    rnd = random.Random(17)
    lrows = [(rnd.choice("ab"), rnd.randrange(0, 500), i)
             for i in range(30)]
    rrows = [(rnd.choice("ab"), rnd.randrange(0, 500), 100 + i)
             for i in range(30)]
    left = spark.createDataFrame(lrows, "k string, sec long, lid long") \
        .selectExpr("k", "timestamp_seconds(sec) as ts", "lid")
    right = spark.createDataFrame(rrows, "k string, sec long, rid long") \
        .selectExpr("k", "timestamp_seconds(sec) as ts", "rid")
    got = {r["lid"]: r["rid_r"] for r in
           asof_join(left, right, on="k", direction="nearest").collect()}
    ts_of = {ri: rs for _, rs, ri in rrows}
    for k, s, lid in lrows:
        cands = [(abs(rs - s), rs, ri) for rk, rs, ri in rrows if rk == k]
        if not cands:
            assert got[lid] is None
            continue
        best_gap = min(c[0] for c in cands)
        # accept any candidate at the best gap (ties among equal-ts
        # right rows are frame-order picks on both engines)
        assert got[lid] is not None \
            and abs(ts_of[got[lid]] - s) == best_gap, (lid, got[lid])


def test_fuzzy_join_levenshtein_blocking(spark):
    """fuzzy_join finds pairs within max_dist edits; the length band is
    lossless (derived from the metric), the optional prefix block is
    the documented lossy knob; distances match a Python reference."""
    from pyspark.sql import functions as F

    from tostore_spark.joins import fuzzy_join
    left = spark.createDataFrame(
        [(1, "smith"), (2, "smyth"), (3, "smithe"), (4, "jones"),
         (5, "jonse"), (6, "a")], ["id", "name"])
    right = spark.createDataFrame(
        [(11, "smith"), (12, "smythe"), (13, "jones"), (14, "ab")],
        ["rid", "nm"])
    got = {(r["id"], r["rid"]): r["dist"] for r in
           fuzzy_join(left, right, "name", right_field="nm",
                      max_dist=2, blocking="length").collect()}

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                         prev + (ca != cb))
        return dp[len(b)]

    want = {(i, ri): lev(a, b)
            for i, a in [(1, "smith"), (2, "smyth"), (3, "smithe"),
                         (4, "jones"), (5, "jonse"), (6, "a")]
            for ri, b in [(11, "smith"), (12, "smythe"), (13, "jones"),
                          (14, "ab")]
            if lev(a, b) <= 2}
    assert got == want
    # length band is honored: "a" vs "smith" never even reaches the
    # levenshtein filter (different buckets) — absent above already;
    # prefix blocking drops the cross-prefix pair (smyth/smith share
    # 'sm' but not 3 chars)
    pref = {(r["id"], r["rid"]) for r in
            fuzzy_join(left, right, "name", right_field="nm",
                       max_dist=2, block_prefix=3).collect()}
    assert (2, 11) not in pref and (1, 11) in pref
    # self-join field-name collision renames the right side
    cols = fuzzy_join(left, left.withColumnRenamed("id", "id2"),
                      "name", max_dist=1).columns
    assert "name" in cols and "name_r" in cols
    # outer joins are rejected: the bucket explode duplicates unmatched
    # rows and the distance filter would drop them anyway
    import pytest as _pytest
    with _pytest.raises(ValueError, match="inner"):
        fuzzy_join(left, right, "name", right_field="nm", how="left")


def test_fuzzy_join_default_prefix_block_subquadratic(spark):
    """The DEFAULT blocking ('prefix') keeps the candidate set
    sub-quadratic on a skewed-length corpus where the lossless length
    band alone degrades to near-all-pairs: 1000 same-length names →
    band-only candidates = N^2, prefix-blocked candidates collapse by
    the prefix fan-out.  Recall inside a shared prefix is unaffected
    (the band refinement still applies), and the documented loss —
    an edit inside the first q chars — is pinned."""
    from tostore_spark.joins import fuzzy_candidates, fuzzy_join

    n = 1000
    # all names length 10 (one hot length band), 26 distinct prefixes
    rows = [(i, chr(97 + i % 26) + "x" + f"{i:08d}") for i in range(n)]
    df = spark.createDataFrame(rows, ["id", "name"])
    right = df.withColumnRenamed("id", "rid")
    n_band = fuzzy_candidates(df, right, "name", max_dist=1,
                              blocking="length").count()
    n_pref = fuzzy_candidates(df, right, "name", max_dist=1,
                              blocking="prefix").count()
    assert n_band == n * n               # the hot band IS all-pairs
    assert n_pref * 20 <= n_band         # prefix splits the hot band
    # matches within a prefix survive; an edit in the prefix escapes
    probe_l = spark.createDataFrame(
        [(1, "smith"), (2, "zmith")], ["id", "name"])
    probe_r = spark.createDataFrame([(11, "smyth")], ["rid", "nm"])
    got = {(r["id"], r["rid"]) for r in
           fuzzy_join(probe_l, probe_r, "name", right_field="nm",
                      max_dist=2).collect()}
    assert got == {(1, 11)}              # (2, 11) escapes the 'sm' block
    # the candidate join is an equi-join on (bucket, prefix): no
    # cartesian anywhere in the plan
    import contextlib
    import io
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        fuzzy_join(df, right, "name", max_dist=1).explain("formatted")
    assert "CartesianProduct" not in buf.getvalue()
    assert "BroadcastNestedLoopJoin" not in buf.getvalue()
    # an explicit non-zero block_prefix contradicts blocking='length'
    # and raises instead of being silently discarded
    import pytest as _pytest
    with _pytest.raises(ValueError, match="conflicts"):
        fuzzy_join(df, right, "name", max_dist=1, block_prefix=2,
                   blocking="length")
    # block_prefix=0 is consistent with 'length' and stays accepted
    assert fuzzy_candidates(df.limit(5), right.limit(5), "name",
                            max_dist=1, block_prefix=0,
                            blocking="length").count() > 0


def test_rolling_distinct_matches_bruteforce(spark):
    """rolling_distinct == per-day brute-force distinct over the
    trailing window, including gap days absent from the data."""
    import datetime

    from tostore_spark.functions.timeseries import rolling_distinct
    rows = []
    base = datetime.datetime(2024, 3, 1)
    data = {0: [1, 2], 1: [2, 3], 2: [3], 5: [1], 6: [4, 5], 9: [1]}
    for off, users in data.items():
        for u in users:
            rows.append((base + datetime.timedelta(days=off,
                                                   hours=u), u))
    df = spark.createDataFrame(rows, "ts timestamp, user_id long")
    got = {str(r["day"]): r["n_active"] for r in
           rolling_distinct(df, "ts", "user_id", window_days=3)
           .collect()}
    want = {}
    for off in data:
        day = (base + datetime.timedelta(days=off)).date()
        seen = set()
        for o2, us in data.items():
            if off - 3 < o2 <= off:
                seen.update(us)
        want[str(day)] = len(seen)
    assert got == want
    # approx tier: HLL at default lgConfigK is EXACT at these
    # cardinalities (sparse mode) — per-day sketches, corpus touched
    # once, window unions sketch rows only
    approx = {str(r["day"]): r["n_active"] for r in
              rolling_distinct(df, "ts", "user_id", window_days=3,
                               exact=False).collect()}
    assert approx == want
    # error bound at real cardinality: 20k entities over 10 days,
    # 3-day window — HLL relative error must stay under 5%
    big = spark.range(0, 60000).selectExpr(
        "timestamp'2024-03-01' + make_interval(0,0,0,CAST(id % 10 AS INT)"
        ",0,0,0) AS ts",
        "CAST(hash(id) % 20000 AS LONG) AS user_id")
    ex = {str(r["day"]): r["n_active"] for r in
          rolling_distinct(big, "ts", "user_id", window_days=3).collect()}
    ap = {str(r["day"]): r["n_active"] for r in
          rolling_distinct(big, "ts", "user_id", window_days=3,
                           exact=False).collect()}
    assert set(ap) == set(ex)
    for d, n in ex.items():
        assert abs(ap[d] - n) <= 0.05 * n, (d, ap[d], n)
