"""Behavioral event analytics: ordered funnels and cohort retention.

The two workhorse product-analytics queries over an events table, at
hypertable scale.  Both are expressed as per-entity hash-aggregates —
never a self-join per funnel step (the naive k-step funnel is a k-way
self-join on user_id; at 100 TB that's k shuffles of the fact table and
a skew trap on hot users).

- Funnel: ONE shuffle on the entity key; each step's earliest
  qualifying timestamp is a conditional min computed stepwise over the
  previous step's time — a per-key fold, exact ordered-sequence
  semantics (step i must happen strictly AFTER step i-1).
- Retention: cohort = each entity's first-activity bucket (one
  hash-agg), activity = distinct (entity, bucket) pairs (one hash-agg),
  then a cohort × offset count over entity-keyed data.  Three
  hash-aggregates total, all on uniform keys.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel(df: DataFrame, steps: Sequence[str],
           entity_field: str = "user_id", ts_field: str = "ts",
           type_field: str = "event_type") -> DataFrame:
    """Ordered-funnel completion counts: how many entities reached step
    1, then step 2 strictly after their step 1, and so on.

    Returns one row per step: (step long 1-based, step_name,
    n_entities).  Semantics: per entity, t1 = min ts of step-1 events;
    t_i = min ts of step-i events with ts > t_{i-1}; an entity counts
    for every step whose t_i exists.  Exactly reproducible in SQL as
    nested conditional mins — no session windows, no ordering
    assumptions beyond the timestamps themselves."""
    steps = list(steps)
    if not steps:
        raise ValueError("funnel needs at least one step")
    relevant = df.filter(F.col(type_field).isin(steps)).select(
        entity_field, type_field, F.col(ts_field).alias("__ts"))
    # Step times fold stepwise: the |entities|-row frame of step times
    # so far joins (entity-keyed) only the NEXT step's events, then
    # re-aggregates back to one row per entity — len(steps)-1 bounded
    # equi-joins, never a fact × fact self-join per step.
    per = relevant.groupBy(entity_field).agg(
        F.min(F.when(F.col(type_field) == steps[0], F.col("__ts")))
        .alias("__t0"))
    for i, s in enumerate(steps[1:], start=1):
        nxt = (relevant.filter(F.col(type_field) == s)
               .select(entity_field, "__ts"))
        per = (per.join(nxt, entity_field, "left")
               .withColumn("__q", F.when(
                   F.col(f"__t{i - 1}").isNotNull()
                   & (F.col("__ts") > F.col(f"__t{i - 1}")),
                   F.col("__ts")))
               .groupBy(entity_field,
                        *[f"__t{j}" for j in range(i)])
               .agg(F.min("__q").alias(f"__t{i}")))
    counts = per.agg(*[
        F.count(f"__t{i}").alias(f"__n{i}") for i in range(len(steps))])
    rows = None
    for i, s in enumerate(steps):
        one = counts.select(F.lit(i + 1).cast("long").alias("step"),
                            F.lit(s).alias("step_name"),
                            F.col(f"__n{i}").alias("n_entities"))
        rows = one if rows is None else rows.unionByName(one)
    return rows


def cohort_retention(df: DataFrame, entity_field: str = "user_id",
                     ts_field: str = "ts",
                     granularity: str = "week") -> DataFrame:
    """Cohort retention matrix: entities grouped by their FIRST activity
    bucket (the cohort), counted in each later bucket they were active.

    Returns (cohort timestamp, offset long >= 0, n_active, cohort_size,
    retention double) — offset in ``granularity`` units from the cohort
    bucket.  Three uniform-key hash-aggregates; the cohort frame
    (|entities| rows) joins back entity-keyed, and cohort sizes fold in
    with one more aggregate on the (tiny) matrix itself."""
    bucket = F.date_trunc(granularity, F.col(ts_field))
    first = (df.groupBy(entity_field)
             .agg(F.min(bucket).alias("cohort")))
    active = (df.select(entity_field, bucket.alias("bucket")).distinct())
    unit = {"day": 86400, "week": 7 * 86400}.get(granularity)
    if unit is None:
        raise ValueError("granularity must be 'day' or 'week' "
                         "(month arithmetic is not fixed-width)")
    from tostore_spark.functions.colutil import epoch_us
    joined = (active.join(first, entity_field)
              .withColumn("offset",
                          ((epoch_us(F.col("bucket"))
                            - epoch_us(F.col("cohort")))
                           / (unit * 1_000_000)).cast("long")))
    mat = (joined.groupBy("cohort", "offset")
           .agg(F.count_distinct(F.col(entity_field)).alias("n_active")))
    sizes = (first.groupBy("cohort")
             .agg(F.count(F.lit(1)).alias("cohort_size")))
    return (mat.join(sizes, "cohort")
            .withColumn("retention",
                        F.col("n_active") / F.col("cohort_size")))


def attribution(df: DataFrame, touch_types: Sequence[str],
                conversion_type: str, model: str = "last",
                lookback_s: int = 7 * 86400,
                entity_field: str = "user_id", ts_field: str = "ts",
                type_field: str = "event_type",
                id_field: str = "event_id") -> DataFrame:
    """Touch attribution: for every conversion event, the touch event
    (of a ``touch_types`` kind) it is credited to — ``last``-touch (the
    most recent touch at or before the conversion) or ``first``-touch
    (the earliest touch inside the lookback), both within
    ``lookback_s`` seconds.  Unattributed conversions keep null credit.

    One entity-partitioned RANGE window over the event-time epoch does
    everything: the touch candidates ride as a conditional struct and
    ``last``/``first`` with ignorenulls picks the credited one — no
    self-join of the fact table against itself, no per-conversion scan.

    Caveat: events of one entity sharing an EXACT timestamp are RANGE
    peers, and the pick among tied touches follows frame order (not
    deterministic across engines) — event streams with sub-second
    timestamps are effectively tie-free; pre-disambiguate if yours are
    not.
    """
    if model not in ("last", "first"):
        raise ValueError("model must be 'last' or 'first'")
    from tostore_spark.functions.colutil import epoch_us
    us = int(lookback_s) * 1_000_000
    w = (Window.partitionBy(entity_field)
               .orderBy(epoch_us(F.col(ts_field)))
               .rangeBetween(-us, 0))
    touch = F.when(F.col(type_field).isin(list(touch_types)),
                   F.struct(F.col(ts_field).alias("touch_ts"),
                            F.col(id_field).alias("touch_id"),
                            F.col(type_field).alias("touch_type")))
    pick = (F.last(touch, ignorenulls=True) if model == "last"
            else F.first(touch, ignorenulls=True))
    out = (df.withColumn("__credit", pick.over(w))
             .filter(F.col(type_field) == conversion_type))
    return out.select(
        entity_field, F.col(id_field).alias("conversion_id"),
        F.col(ts_field).alias("conversion_ts"),
        F.col("__credit.touch_id").alias("touch_id"),
        F.col("__credit.touch_ts").alias("touch_ts"),
        F.col("__credit.touch_type").alias("touch_type"))


def event_paths(df: DataFrame, entity: str, order, event: str,
                n: int = 2, top_k: int = 20) -> DataFrame:
    """Top event-type n-gram paths across entities — "what do users do
    next" (view→click, click→purchase): one entity-partitioned ordered
    window emits each entity's consecutive event n-grams; one
    hash-aggregate counts them corpus-wide.

    ``order`` is the within-entity ordering (pass a list, e.g.
    ``["ts", "event_id"]``, to break timestamp ties deterministically —
    the same contract as ``moving_features``).  Output: (path, n_occur)
    with path = "a>b[>c...]", ordered (n_occur desc, path), top_k —
    bounded final sort (TakeOrderedAndProject).

    Scale shape: lead() windows are entity-partitioned (one shuffle on
    the entity key, no global window); the n-gram strings are bounded
    (n × event-type length); the count is a uniform-key hash-aggregate.
    Never a self-join per step (the k-way join formulation explodes;
    this is linear in events)."""
    if n < 2:
        raise ValueError("n must be >= 2")
    orders = [order] if isinstance(order, str) else list(order)
    w = Window.partitionBy(entity).orderBy(*orders)
    steps = [F.col(event)] + [F.lead(event, i).over(w)
                              for i in range(1, n)]
    path = F.concat_ws(">", *steps)
    return (df.select(path.alias("path"),
                      steps[-1].isNotNull().alias("__complete"))
              .filter(F.col("__complete"))
              .groupBy("path")
              .agg(F.count(F.lit(1)).alias("n_occur"))
              .orderBy(F.col("n_occur").desc(), F.col("path").asc())
              .limit(top_k))
