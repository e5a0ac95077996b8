"""Hypertable-style continuous aggregates: multi-granularity time rollups.

The continuous-aggregate pattern (TimescaleDB hypertable rollups, Druid
rollup segments): the finest granularity aggregates the raw events ONCE;
every coarser granularity re-aggregates the next finer level — sums and
counts merge associatively, so day/month rollups never rescan raw data.
At 100 TB this is the difference between one scan and one scan per
granularity; the decimal sums keep the re-aggregation bit-exact.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_GRAIN_ORDER = ["hour", "day", "month", "year"]


def time_rollup(df: DataFrame, ts_field: str = "ts",
                value_field: str = "value",
                granularities: tuple[str, ...] = ("hour", "day", "month"),
                scale: int = 6) -> DataFrame:
    """One frame per granularity, unioned with a ``granularity`` column:
    (granularity, bucket, n, sum_value).  Buckets are date_trunc'd
    timestamps; coarser levels reaggregate the finer level's partial sums
    (exact: decimal sums are associative)."""
    grains = sorted(granularities, key=_GRAIN_ORDER.index)
    finest = grains[0]
    level = (df.groupBy(F.date_trunc(finest, F.col(ts_field)).alias("bucket"))
             .agg(F.count(F.lit(1)).alias("n"),
                  F.sum(F.col(value_field).cast(f"decimal(18,{scale})"))
                   .alias("__dec")))
    frames = [level.withColumn("granularity", F.lit(finest))]
    for g in grains[1:]:
        level = (level.groupBy(F.date_trunc(g, F.col("bucket")).alias("bucket"))
                 .agg(F.sum("n").alias("n"),
                      F.sum("__dec").alias("__dec")))
        frames.append(level.withColumn("granularity", F.lit(g)))
    out = reduce(lambda a, b: a.unionByName(b), frames)
    return out.select("granularity", "bucket", "n",
                      F.col("__dec").cast("double").alias("sum_value"))


def grouping_sets(df: DataFrame, sets: list[list[str]],
                  value_field: str, scale: int = 6) -> DataFrame:
    """GROUP BY GROUPING SETS — arbitrary grouping combinations in ONE
    pass (rollup/cube are the special cases; this is the general form).

    Expressed through Spark SQL's native GROUPING SETS (a single Expand
    + hash-aggregate: the input is scanned once and expanded to one
    replica per set, each partial-aggregated map-side) rather than a
    union of per-set groupBys, which would scan the input once PER SET —
    at 100 TB, len(sets) full scans vs one.

    Output: (all grouping columns with null for "not in this set",
    grouping_id, n, sum_value).  Decimal sums keep cross-set totals
    bit-identical to a single-set groupBy.
    """
    all_cols = []
    for s in sets:
        for c in s:
            if c not in all_cols:
                all_cols.append(c)
    sets_sql = ", ".join("(" + ", ".join(s) + ")" for s in sets)
    cols_sql = ", ".join(all_cols)
    return df.sparkSession.sql(
        f"""SELECT {cols_sql}, grouping_id({cols_sql}) AS gid,
                   count(1) AS n,
                   CAST(sum(CAST({value_field} AS DECIMAL(28,{scale})))
                        AS DOUBLE) AS sum_value
            FROM {{df}} GROUP BY GROUPING SETS ({sets_sql})""",
        df=df)
