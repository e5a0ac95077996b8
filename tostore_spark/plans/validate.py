"""Declarative data-quality validation (a deequ-style rule report).

``validate_table`` evaluates a rule list against a DataFrame and returns
one report row per rule: ``(rule, kind, field, n_violations, n_rows)``.
Training-data pipelines run this as the admission gate before a corpus
or fact table enters the warehouse.

Scale shape: every ROW-level rule (not_null / in_range / in_set /
matches) compiles to one conditional-sum column inside a SINGLE
aggregate — one scan of the table no matter how many such rules.
``unique`` rules each add one hash-aggregate on their key; ``fk`` rules
each add one broadcast-able anti-join count.  Nothing is collected; the
report is a union of 1-row aggregates.

Reference scope: the reference enforces unique/non-null at write time
(data_store_impl.dart:1592-1610, write.py:110-210 here); this operator is
the standalone AUDIT form — read-only, composable over any frame.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def not_null(field: str) -> dict:
    return {"kind": "not_null", "field": field}


def in_range(field: str, lo, hi) -> dict:
    return {"kind": "in_range", "field": field, "lo": lo, "hi": hi}


def in_set(field: str, values) -> dict:
    return {"kind": "in_set", "field": field, "values": list(values)}


def matches(field: str, pattern: str) -> dict:
    return {"kind": "matches", "field": field, "pattern": pattern}


def unique(*fields: str) -> dict:
    return {"kind": "unique", "field": ",".join(fields),
            "fields": list(fields)}


def fk(field: str, parent: DataFrame, parent_field: str) -> dict:
    return {"kind": "fk", "field": field, "parent": parent,
            "parent_field": parent_field}


def _row_violation(rule: dict):
    c = F.col(rule["field"])
    kind = rule["kind"]
    if kind == "not_null":
        return c.isNull()
    if kind == "in_range":
        # null is a missing value, not a range violation (pair with
        # not_null to reject nulls too)
        return c.isNotNull() & ~c.between(F.lit(rule["lo"]), F.lit(rule["hi"]))
    if kind == "in_set":
        return c.isNotNull() & ~c.isin(rule["values"])
    if kind == "matches":
        return c.isNotNull() & ~c.rlike(rule["pattern"])
    return None


def validate_table(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Evaluate ``rules`` (built with the helpers above) against ``df``.

    ``n_violations`` semantics: rows failing the predicate (row rules);
    rows whose key value occurs more than once (unique); non-null child
    rows with no parent match (fk — null keys are not violations, SQL
    FK semantics).  ``n_rows`` is the population the rule was checked
    against (for fk: the non-null child rows)."""
    total = F.count(F.lit(1))
    row_rules = [(i, r) for i, r in enumerate(rules)
                 if _row_violation(r) is not None]
    parts: list[DataFrame] = []
    if row_rules:
        agg = df.agg(total.alias("__n"),
                     *[F.sum(_row_violation(r).cast("long")).alias(f"__r{i}")
                       for i, r in row_rules])
        # report rows built from F.lit() columns, never interpolated into
        # a selectExpr string: a field name containing a quote is legal
        # in Spark (backtick-escaped) and must not break or mislabel the
        # generated report
        structs = [
            F.struct(F.lit(f"{r['kind']}:{r['field']}").alias("rule"),
                     F.lit(r["kind"]).alias("kind"),
                     F.lit(r["field"]).alias("field"),
                     F.col(f"__r{i}").alias("n_violations"))
            for i, r in row_rules]
        parts.append(agg.select(F.explode(F.array(*structs)).alias("__s"),
                                F.col("__n").alias("n_rows"))
                        .select("__s.*", "n_rows"))
    for r in rules:
        if r["kind"] == "unique":
            keys = [F.col(f) for f in r["fields"]]
            dup = (df.groupBy(*keys).agg(F.count(F.lit(1)).alias("__c")))
            parts.append(dup.agg(
                F.lit(f"unique:{r['field']}").alias("rule"),
                F.lit("unique").alias("kind"),
                F.lit(r["field"]).alias("field"),
                F.coalesce(F.sum(F.when(F.col("__c") > 1, F.col("__c"))),
                           F.lit(0)).alias("n_violations"),
                F.coalesce(F.sum("__c"), F.lit(0)).alias("n_rows")))
        elif r["kind"] == "fk":
            child = df.filter(F.col(r["field"]).isNotNull())
            parent_keys = (r["parent"]
                           .select(F.col(r["parent_field"]).alias(r["field"]))
                           .distinct())
            # n_rows = child rows checked; orphan = no parent match
            tagged = child.join(parent_keys.withColumn("__hit", F.lit(1)),
                                on=r["field"], how="left")
            parts.append(tagged.agg(
                F.lit(f"fk:{r['field']}").alias("rule"),
                F.lit("fk").alias("kind"),
                F.lit(r["field"]).alias("field"),
                F.coalesce(F.sum(F.when(F.col("__hit").isNull(), 1)),
                           F.lit(0)).alias("n_violations"),
                F.count(F.lit(1)).alias("n_rows")))
    if not parts:
        raise ValueError("no rules given")
    out = reduce(lambda a, b: a.unionByName(b), parts)
    return out.select("rule", "kind", "field",
                      F.col("n_violations").cast("long").alias("n_violations"),
                      F.col("n_rows").cast("long").alias("n_rows"))
