"""Incremental materialized-view maintenance (algebraic aggregate MVs).

The reference's query-result cache invalidates whole cached results on
any table write (``query_cache.dart:7+``, generation counters — SURVEY
§2.12); at 100 TB "recompute on invalidation" is not a plan.  The
warehouse-native form is an ALGEBRAIC materialized view maintained by
delta merging: the fact table is scanned once at MV build, and every
subsequent batch folds in as a partial aggregate — inserts as +1 rows,
deletes as retractions (-1) — without ever rescanning the base.

Scale shape:
- the delta batch is partially aggregated FIRST (map-side combine on the
  micro-batch — tiny);
- merge = unionByName(MV, delta-partial) + one groupBy over MV-sized
  data (the MV is |distinct keys|, orders of magnitude below the fact
  table); with the MV bucketed on its keys the merge shuffle is
  one-sided;
- sums ride DECIMAL so retraction is bit-exact (float retraction drifts:
  (a+b)-b != a in doubles); groups whose count reaches 0 vanish —
  delete-maintenance keeps the MV exact, not approximate.

count/sum/avg (sum+count) are self-maintainable; min/max are NOT under
deletes (a retracted minimum needs a rescan of that group) — refuse
them rather than silently corrupt.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SCALE = 6


def mv_build(fact: DataFrame, keys: Sequence[str],
             sums: Sequence[str] = ()) -> DataFrame:
    """One full scan of the fact table → MV frame
    (keys..., n, sum_<f> decimal partials)."""
    keys = list(keys)
    aggs = [F.count(F.lit(1)).alias("n")]
    for f in sums:
        aggs.append(F.sum(F.col(f).cast(f"decimal(28,{_SCALE})"))
                    .alias(f"sum_{f}"))
    return fact.groupBy(*keys).agg(*aggs)


def mv_delta(batch: DataFrame, keys: Sequence[str],
             sums: Sequence[str] = (), sign: int = 1) -> DataFrame:
    """Partial-aggregate one change batch. ``sign=+1`` for inserts,
    ``-1`` for deletes (retractions); mixed batches: union two calls."""
    keys = list(keys)
    aggs = [F.sum(F.lit(sign)).alias("n")]
    for f in sums:
        aggs.append(F.sum(F.col(f).cast(f"decimal(28,{_SCALE})")
                          * F.lit(sign)).alias(f"sum_{f}"))
    return batch.groupBy(*keys).agg(*aggs)


def mv_merge(mv: DataFrame, *deltas: DataFrame,
             keys: Sequence[str] | None = None) -> DataFrame:
    """Fold partial-aggregate deltas into the MV: union + re-sum per key;
    groups whose merged count hits 0 are dropped (fully retracted).

    ``keys`` defaults to every column that is not ``n``/``sum_*``.
    That inference is WRONG for a grouping key itself named ``n`` or
    ``sum_*`` (it would be summed as a measure) — pass ``keys=[...]``
    explicitly whenever key names aren't under your control;
    ``write_stream_to_mv`` always does.
    """
    out = mv
    for d in deltas:
        out = out.unionByName(d)
    if keys is None:
        keys = [c for c in mv.columns
                if c != "n" and not c.startswith("sum_")]
    else:
        keys = list(keys)
    sum_cols = [c for c in mv.columns
                if c.startswith("sum_") and c not in keys]
    merged = out.groupBy(*keys).agg(
        F.sum("n").alias("n"),
        *[F.sum(c).alias(c) for c in sum_cols])
    return merged.filter(F.col("n") != 0)
