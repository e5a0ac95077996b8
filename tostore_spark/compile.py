"""Condition-tree → Spark Column compiler: the heart of the engine.

This is the faithful re-expression of the reference's row-at-a-time
``ValueMatcher`` (lib/src/handler/value_matcher.dart:337-613) as declarative
Column expressions, so Catalyst gets full predicate pushdown / pruning while
the *semantics* stay two-valued (no SQL three-valued logic):

- ``!=`` is TRUE for a null record value (value_matcher.dart:573-575 via
  ``loose_eq`` returning false) — compiled as ``isNull() | (col != v)``;
- ``NOT IN`` on a null record value is TRUE (value_matcher.dart:587-589);
- ordered compares are FALSE on null (value_matcher.dart:576-583);
- a field absent from the schema evaluates as null (``IS null`` matches);
- loose numeric-string typing (``1 == "1"``) is resolved at *compile time* by
  value normalization against the field type (query_condition.dart:743-835),
  keeping literals typed so Parquet pushdown survives;
- LIKE uses SQL ``%``/``_`` wildcards with no escape character
  (value_matcher.dart:318-331) — compiled to ``like`` when safe (pushes
  down), ``rlike`` with the reference's regex otherwise.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tostore_spark.condition import ConditionNode, like_to_regex
from tostore_spark.schema import DataType

# resolver: field name -> (Column, spark DataType) or None when the field
# does not exist (missing fields evaluate as null).
Resolver = Callable[[str], Optional[tuple[Column, T.DataType]]]


def _is_numeric(st: T.DataType) -> bool:
    return isinstance(st, T.NumericType)


def _value_compatible(value, st: T.DataType) -> bool:
    """Can `value` be compared against a column of Spark type `st` without
    Spark's implicit casts changing the reference's outcome?"""
    if value is None:
        return True
    if _is_numeric(st):
        return isinstance(value, (int, float)) and not isinstance(value, bool)
    if isinstance(st, T.BooleanType):
        return isinstance(value, bool)
    if isinstance(st, (T.TimestampType, T.DateType)):
        import datetime

        return isinstance(value, (datetime.datetime, datetime.date, str))
    return True


def _lit(value) -> Column:
    return F.lit(value)


def _leaf_to_column(field: str, op: str, value, resolver: Resolver) -> Column:
    resolved = resolver(field)
    if resolved is None:
        # missing field == null record value (value_matcher.dart:517-531)
        if op == "IS" and value is None:
            return F.lit(True)
        if op in ("IS NOT",) and value is None:
            return F.lit(False)
        if op in ("!=", "<>"):
            return F.lit(True) if value is not None else F.lit(False)
        if op == "NOT IN":
            return F.lit(True)
        if op == "=" and value is None:
            return F.lit(True)
        return F.lit(False)

    col, st = resolved

    if op == "=":
        if value is None:
            return col.isNull()
        if not _value_compatible(value, st):
            return F.lit(False)
        return col == _lit(value)

    if op in ("!=", "<>"):
        if value is None:
            return col.isNotNull()
        if not _value_compatible(value, st):
            return F.lit(True)
        return col.isNull() | (col != _lit(value))

    if op in (">", ">=", "<", "<="):
        if value is None or not _value_compatible(value, st):
            return F.lit(False)
        lit = _lit(value)
        return {">": col > lit, ">=": col >= lit,
                "<": col < lit, "<=": col <= lit}[op]

    if op == "IN":
        vals = [v for v in (value or []) if v is not None and _value_compatible(v, st)]
        if not vals:
            return F.lit(False)
        return col.isin(vals)

    if op == "NOT IN":
        vals = [v for v in (value or []) if v is not None and _value_compatible(v, st)]
        if not vals:
            return F.lit(True)
        return col.isNull() | ~col.isin(vals)

    if op == "BETWEEN":
        lo, hi = value["start"], value["end"]
        if lo is None or hi is None or not _value_compatible(lo, st) or not _value_compatible(hi, st):
            return F.lit(False)
        return (col >= _lit(lo)) & (col <= _lit(hi))

    if op in ("LIKE", "NOT LIKE"):
        pat = str(value)
        scol = col if isinstance(st, T.StringType) else col.cast("string")
        if "\\" in pat:
            # Spark `like` treats backslash as an escape char; the reference
            # has no escape — fall back to the reference's anchored regex.
            expr = scol.rlike(like_to_regex(pat))
        else:
            expr = scol.like(pat)
        if op == "NOT LIKE":
            # null record value → NOT LIKE is false (matcher returns false on
            # null input), so guard with isNotNull, not a bare negation.
            return col.isNotNull() & ~expr
        return expr

    if op == "IS":
        if value is None:
            return col.isNull()
        if not _value_compatible(value, st):
            return F.lit(False)
        return col == _lit(value)

    if op == "IS NOT":
        if value is None:
            return col.isNotNull()
        if not _value_compatible(value, st):
            return F.lit(True)
        return col.isNull() | (col != _lit(value))

    raise ValueError(f"unsupported operator: {op}")


def coerce_where_values(node: ConditionNode, schema) -> ConditionNode:
    """Light loose-typing normalization of a freestanding where-node
    against a Spark ``StructType`` (the foreign-read analog of
    query._normalize_node, shared by read_delta/read_iceberg):
    numeric strings coerce to numbers on numeric columns, integral
    floats to ints on integer columns, ISO strings to date/datetime on
    temporal columns (datetimes tz-normalized to naive-UTC, the
    engine's pinned session timezone).  Mis-typed values that survive
    stay harmless — skipping keeps the file and the compiled row
    filter applies the engine's two-valued compatibility rules."""
    import datetime
    types = {f.name: f.dataType for f in schema.fields}

    def cv(v, dt):
        if isinstance(v, bool) or dt is None:
            return v
        if isinstance(dt, T.DateType):
            if isinstance(v, str):
                try:
                    return datetime.date.fromisoformat(v)
                except ValueError:
                    return v
            return v
        if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
            if isinstance(v, str):
                try:
                    v = datetime.datetime.fromisoformat(
                        v.replace("Z", "+00:00"))
                except ValueError:
                    return v
            if isinstance(v, datetime.datetime) and v.tzinfo is not None:
                return v.astimezone(datetime.timezone.utc) \
                    .replace(tzinfo=None)
            return v
        if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType,
                           T.LongType)):
            if isinstance(v, str):
                try:
                    f = float(v)
                    return int(f) if f == int(f) else f
                except ValueError:
                    return v
            if isinstance(v, float) and v.is_integer():
                return int(v)
        if isinstance(dt, (T.FloatType, T.DoubleType)):
            if isinstance(v, str):
                try:
                    return float(v)
                except ValueError:
                    return v
            if isinstance(v, int):
                return float(v)
        return v

    def walk(n):
        if n.kind != "leaf":
            return ConditionNode(n.kind,
                                 children=[walk(c) for c in n.children])
        dt = types.get(n.field)
        v = n.value
        if n.op in ("IN", "NOT IN") and isinstance(v, (list, tuple)):
            v = [cv(x, dt) for x in v]
        elif n.op == "BETWEEN" and isinstance(v, dict):
            v = {"start": cv(v.get("start"), dt),
                 "end": cv(v.get("end"), dt)}
        else:
            v = cv(v, dt)
        return ConditionNode("leaf", n.field, n.op, v)

    return walk(node)


def where_filter_column(node: ConditionNode, schema) -> Column:
    """Compile a freestanding where-node into the row-side filter over
    a frame with ``schema`` — the re-application half of foreign-read
    scan planning (pruning narrows, this defines)."""
    fields = {f.name: f.dataType for f in schema.fields}
    return condition_to_column(
        node, lambda name: ((F.col(name), fields[name])
                            if name in fields else None))


def condition_to_column(node: ConditionNode, resolver: Resolver) -> Column:
    if node.kind == "leaf":
        return _leaf_to_column(node.field, node.op, node.value, resolver)
    if not node.children:
        return F.lit(True)
    cols = [condition_to_column(c, resolver) for c in node.children]
    out = cols[0]
    for c in cols[1:]:
        out = (out & c) if node.kind == "and" else (out | c)
    return out


def parse_order_field(spec: str) -> tuple[str, bool]:
    """``-field`` or ``"field DESC"`` → (field, descending)
    (chain_builder.dart:42-55; query_executor.dart:2372-2387)."""
    s = spec.strip()
    if s.startswith("-"):
        return s[1:].strip(), True
    parts = s.split()
    if len(parts) == 2 and parts[1].upper() in ("ASC", "DESC"):
        return parts[0], parts[1].upper() == "DESC"
    return s, False


def order_columns(order_by: list[str], resolver: Resolver) -> list[Column]:
    """Reference null ordering: null sorts before any non-null in ASC
    (value_matcher.dart:163-165), i.e. nulls-first ASC / nulls-last DESC —
    Spark's defaults, made explicit here."""
    out = []
    for spec in order_by:
        name, desc = parse_order_field(spec)
        resolved = resolver(name)
        col = resolved[0] if resolved else F.lit(None)
        out.append(col.desc_nulls_last() if desc else col.asc_nulls_first())
    return out
