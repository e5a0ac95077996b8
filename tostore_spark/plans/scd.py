"""Slowly-changing-dimension Type-2 merge: dimension history maintenance.

The reference keeps dimensions current-state-only (upsert overwrites —
``data_store_impl.dart`` upsert path; see SURVEY §2.1 #9); a training /
analytics warehouse additionally needs the HISTORY form: every change to
a tracked attribute closes the open row (``valid_to``, ``is_current``)
and opens a new one.  This is the standard warehouse SCD Type-2 merge,
expressed Spark-first.

Scale shape (100 TB fact, ~10-100 GB dimension, ~MB-scale delta):
- the delta is reduced to ONE row per key first (latest by effective
  timestamp — a per-key window over the DELTA only, never the history);
- only OPEN rows (``is_current``) join the delta — closed history rows
  pass through untouched (a filter + union, no join, no shuffle of the
  closed majority of the history);
- the open-rows-vs-delta join is broadcast when the delta is small
  (AQE picks it; deltas are by nature micro-batches).

Nothing here scans the fact table; history grows append-only, so the
output can be written with a partition-overwrite on ``is_current`` +
append of closed rows.
"""

from __future__ import annotations

from functools import reduce
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

HIST_COLS = ("valid_from", "valid_to", "is_current")


def scd2_init(dim: DataFrame, effective: str = "1970-01-01 00:00:00"
              ) -> DataFrame:
    """Bootstrap a history table from a current-state dimension: every
    row open from ``effective``."""
    return (dim.withColumn("valid_from",
                           F.lit(effective).cast("timestamp"))
               .withColumn("valid_to", F.lit(None).cast("timestamp"))
               .withColumn("is_current", F.lit(True)))


def scd2_apply(history: DataFrame, updates: DataFrame,
               keys: Sequence[str], tracked: Sequence[str],
               effective_field: str = "effective_ts") -> DataFrame:
    """Apply one delta batch to an SCD2 history table.

    ``history`` carries ``keys`` + ``tracked`` + HIST_COLS; ``updates``
    carries ``keys`` + ``tracked`` + ``effective_field``.  Per key the
    LATEST update (by effective ts, ties by tracked values for
    determinism) is compared against the open row:

    - attrs differ  → close the open row (valid_to = effective ts) and
      open a new row (valid_from = effective ts);
    - attrs equal   → no-op (idempotent re-delivery is safe);
    - new key       → open a new row;
    - an update STRICTLY older than the open row's valid_from is
      ignored (late/duplicate replay guard); an equal-timestamp update
      with different attrs is a correction — it closes the open row
      with a zero-length interval and opens the corrected one (sources
      that truncate timestamps to day granularity deliver these).
    """
    keys = list(keys)
    tracked = list(tracked)
    base_cols = keys + tracked

    # one row per key from the delta — window over the (small) delta only
    w = Window.partitionBy(*keys).orderBy(
        F.col(effective_field).desc(), *[F.col(t).desc() for t in tracked])
    upd = (updates
           .withColumn("__rn", F.row_number().over(w))
           .filter(F.col("__rn") == 1)
           .select(*[F.col(c).alias(f"u_{c}") for c in base_cols],
                   F.col(effective_field).alias("u_eff")))

    closed = history.filter(~F.col("is_current"))
    open_rows = history.filter(F.col("is_current"))

    joined = open_rows.join(
        upd, on=[F.col(k) == F.col(f"u_{k}") for k in keys], how="full")

    changed = F.col("u_eff").isNotNull() & (
        F.col(keys[0]).isNull()  # brand-new key
        | (
            (F.col("u_eff") >= F.col("valid_from"))
            # per-column null-safe comparison: no separator/sentinel
            # collisions (a concat-based compare conflates
            # ('x\x1fy','z') with ('x','y\x1fz'))
            & ~reduce(lambda a, b: a & b,
                      [F.col(t).eqNullSafe(F.col(f"u_{t}"))
                       for t in tracked])
        )
    )

    # surviving open rows: untouched keys + unchanged-attr matches
    keep_open = (joined.filter(F.col(keys[0]).isNotNull() & ~changed)
                 .select(*base_cols, *HIST_COLS))
    # closing rows: had an open row and it changed
    closing = (joined.filter(F.col(keys[0]).isNotNull() & changed)
               .select(*base_cols, "valid_from",
                       F.col("u_eff").alias("valid_to"))
               .withColumn("is_current", F.lit(False)))
    # opening rows: changed or brand-new
    opening = (joined.filter(changed)
               .select(*[F.col(f"u_{c}").alias(c) for c in base_cols],
                       F.col("u_eff").alias("valid_from"))
               .withColumn("valid_to", F.lit(None).cast("timestamp"))
               .withColumn("is_current", F.lit(True)))

    return (closed.select(*base_cols, *HIST_COLS)
            .unionByName(keep_open)
            .unionByName(closing)
            .unionByName(opening))


def scd2_lookup(facts: DataFrame, history: DataFrame, key: str,
                ts_field: str, how: str = "left") -> DataFrame:
    """Point-in-time dimension join: each fact row picks the dimension
    version whose validity interval covers the fact's timestamp
    (``valid_from <= ts < valid_to``, open row = null ``valid_to``).
    The standard way facts join an SCD2 history without leaking
    future attribute values into past events.

    Scale shape: an equi-join on the dimension key (uniform; AQE
    broadcasts the dimension when it fits) with the interval bounds as
    additional join conjuncts — per-key version counts are small, so
    the post-equi filter discards a bounded number of candidates per
    fact.  Epoch comparison is NTZ-safe (colutil.epoch_us).

    Collision rule: history columns that clash with fact columns
    (other than ``key``) are suffixed ``_dim``."""
    from tostore_spark.functions.colutil import epoch_us
    if how not in ("left", "inner"):
        raise ValueError("how must be 'left' or 'inner'")
    hist = history
    for c in hist.columns:
        if c != key and c in facts.columns:
            hist = hist.withColumnRenamed(c, f"{c}_dim")
    vf = "valid_from_dim" if "valid_from" in facts.columns else "valid_from"
    vt = "valid_to_dim" if "valid_to" in facts.columns else "valid_to"
    ts = epoch_us(F.col(ts_field))
    cond = ((facts[key] == hist[key])
            & (ts >= epoch_us(hist[vf]))
            & (hist[vt].isNull() | (ts < epoch_us(hist[vt]))))
    out = facts.join(hist, on=cond, how=how)
    # drop the duplicate key column from the history side
    return out.drop(hist[key])
