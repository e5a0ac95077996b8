"""Group-wise ranking: top-k rows per group without a global sort.

``top_k_per_group`` is the public form of the two-stage top-k used
inside the ANN search paths (similarity.py): a group-partitioned
``row_number``/``rank`` bounded by ``k``.  Spark ≥3.5 rewrites the
rank-filter shape into ``WindowGroupLimit`` — each shuffle partition
keeps only its per-group top-k BEFORE the final window, so no partition
ever materializes a full group's rows for hot groups.  The plan-shape
audit pins that operator (tools/explain_audit.py).

Reference scope: the reference's orderBy+limit is global only
(query_executor.dart top-k); per-group limits are parity-plus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k_per_group(df: DataFrame, group: str | list[str],
                    order: str | Column | list, k: int,
                    method: str = "row_number",
                    keep_rank: bool = False) -> DataFrame:
    """Keep the top ``k`` rows of every group.

    ``order``: a column name / Column / list of either — wrap with
    ``F.col(...).desc()`` (or pass ``"-field"``) for descending.
    ``method``: ``row_number`` (exactly k, ties broken by order),
    ``rank`` (ties share a rank — may return >k on boundary ties), or
    ``dense_rank``.  ``keep_rank`` appends the rank column ``__rank``.
    """
    if method not in ("row_number", "rank", "dense_rank"):
        raise ValueError(f"unknown method {method!r}")
    groups = [group] if isinstance(group, str) else list(group)
    orders = order if isinstance(order, list) else [order]

    def to_col(o):
        if isinstance(o, str):
            return F.col(o[1:]).desc() if o.startswith("-") else F.col(o)
        return o

    w = Window.partitionBy(*groups).orderBy(*[to_col(o) for o in orders])
    fn = {"row_number": F.row_number, "rank": F.rank,
          "dense_rank": F.dense_rank}[method]
    out = df.withColumn("__rank", fn().over(w)).filter(F.col("__rank") <= k)
    return out if keep_rank else out.drop("__rank")
