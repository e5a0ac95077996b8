"""Pivot / unpivot reshaping (parity-plus; no equivalent in the reference).

Pivot with EXPLICIT value lists only: ``df.groupBy(...).pivot(col)``
without values launches an eager distinct-collect job over the full
input to discover the columns — at 100 TB that is a hidden extra scan
before the real plan even builds, and the output schema becomes
data-dependent (a streaming/incremental hazard).  Explicit values keep
pivot a single hash-aggregate (one shuffle on the row keys, map-side
partials; unknown categories are dropped, matching SQL conditional
aggregation).

Unpivot is the Spark-native ``DataFrame.unpivot`` (melt): a per-row
generator, no shuffle at all.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_AGG = {"count": lambda c: F.count(c), "sum": F.sum, "avg": F.avg,
        "min": F.min, "max": F.max}


def pivot_table(df: DataFrame, row_keys: Sequence[str], pivot_field: str,
                values: Sequence[str], agg: str = "count",
                agg_field: str | None = None,
                scale: int = 2) -> DataFrame:
    """Wide conditional aggregation: one output column per pivot value,
    named ``<value>_<agg>``.  ``values`` is REQUIRED (see module note).
    count fills absent cells with 0; other aggs leave null (SQL
    conditional-aggregation semantics).  Sums ride decimal for exact,
    order-independent totals."""
    if agg not in _AGG:
        raise ValueError(f"unsupported pivot aggregate: {agg}")
    if agg != "count" and agg_field is None:
        raise ValueError(f"pivot agg={agg!r} requires agg_field")
    col = (F.lit(1) if agg == "count" and agg_field is None
           else F.col(agg_field))
    if agg == "sum":
        col = col.cast(f"decimal(28,{scale})")
    piv = (df.groupBy(*row_keys)
             .pivot(pivot_field, list(values))
             .agg(_AGG[agg](col)))
    out = piv
    for v in values:
        c = F.col(f"`{v}`")
        if agg == "count":
            c = F.coalesce(c, F.lit(0))
        elif agg == "sum":
            c = c.cast("double")
        out = out.withColumn(f"{v}_{agg}", c)
    return out.select(*row_keys, *[f"{v}_{agg}" for v in values])


def unpivot(df: DataFrame, ids: Sequence[str], value_fields: Sequence[str],
            var_name: str = "variable", value_name: str = "value"
            ) -> DataFrame:
    """Wide → long: one output row per (id row × value field).  Values
    are cast to a common double type (unpivot requires it); nulls kept
    so long-form row count is exactly rows × len(value_fields)."""
    casted = df.select(
        *ids, *[F.col(f).cast("double").alias(f) for f in value_fields])
    return casted.unpivot(list(ids), list(value_fields),
                          var_name, value_name)
