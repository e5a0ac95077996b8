"""Time-series window features over event streams: lag/lead, moving
aggregates, cumulative sums — the feature-engineering staples for
sessionized event data.

Every window here is PARTITIONED (by the entity key), so the work spreads
across the cluster: one shuffle on the key, per-key ordered scan inside
each partition.  No unpartitioned window ever appears (the global-window
anti-pattern the plan audit guards against).  All semantics are exact
ANSI-SQL window functions, reproducible in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def moving_features(df: DataFrame, partition: str,
                    order: str | list[str], value: str,
                    window_rows: int = 5) -> DataFrame:
    """Per-``partition`` ordered features on ``value``:

    - ``lag_1`` / ``lead_1``: previous / next value
    - ``delta``: value - lag_1
    - ``moving_avg`` / ``moving_min`` / ``moving_max``: over the current
      and preceding ``window_rows - 1`` rows
    - ``cum_sum``: running total from the partition start
    - ``row_idx``: 1-based position within the partition

    Pass a list as ``order`` (e.g. ``["ts", "event_id"]``) to break
    timestamp ties deterministically."""
    orders = [order] if isinstance(order, str) else list(order)
    w_ord = Window.partitionBy(partition).orderBy(*orders)
    w_mov = w_ord.rowsBetween(-(window_rows - 1), 0)
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, 0)
    v = F.col(value)
    return df.select(
        "*",
        F.lag(v, 1).over(w_ord).alias("lag_1"),
        F.lead(v, 1).over(w_ord).alias("lead_1"),
        (v - F.lag(v, 1).over(w_ord)).alias("delta"),
        F.avg(v).over(w_mov).alias("moving_avg"),
        F.min(v).over(w_mov).alias("moving_min"),
        F.max(v).over(w_mov).alias("moving_max"),
        F.sum(v).over(w_cum).alias("cum_sum"),
        F.row_number().over(w_ord).alias("row_idx"))
