"""Column-expression utilities.

``let_array`` / ``let_scalar`` implement let-binding for Column expressions:
evaluate an expensive sub-expression ONCE per row and reference it as a
lambda variable.  Catalyst performs no common-subexpression elimination
inside higher-order-function lambdas, so a multiply-referenced sub-expression
(e.g. a regex normalization referenced per array element) re-executes per
reference; binding it through a single-element array + ``transform`` turns
every inner reference into a cheap variable lookup.  This is a plan-shape
technique, not a data trick — it holds at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_us(col: Column) -> Column:
    """Microseconds-since-epoch for TIMESTAMP *or* TIMESTAMP_NTZ columns.

    Spark 4.1 reads plain parquet timestamps (isAdjustedToUTC=false) as
    TIMESTAMP_NTZ, which ``unix_micros`` rejects at analysis time.  The
    cast to TIMESTAMP interprets an NTZ value in the session timezone;
    ``get_spark`` pins that to UTC so the offset is constant (a
    DST-shifting zone would bend gap arithmetic by an hour across
    transitions) and cancels in every difference this helper feeds
    (sessionization, as-of tolerance).
    """
    return F.unix_micros(col.cast("timestamp"))


def let_array(bound: Column, body) -> Column:
    """body(var) must return an ARRAY column; evaluates ``bound`` once."""
    return F.flatten(F.transform(F.array(bound), body))


def let_scalar(bound: Column, body) -> Column:
    """body(var) returns a scalar column; evaluates ``bound`` once."""
    return F.transform(F.array(bound), body).getItem(0)
