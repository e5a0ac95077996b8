"""Token-budget corpus mixing: compose a training mix from weighted
sources under a global cost budget.

The sampling-ratio / source-mix stage of an LLM data pipeline (the knob
published as "data mixture" in LLaMA/Pile/Dolma-style recipes): given
per-source weights and a total budget in cost units (tokens, chars,
bytes — any numeric column), take a deterministic pseudo-random prefix
of each source worth ``weight/sum(weights) * budget`` cost.

Spark shape: one window per source partition (``PARTITION BY source``,
never global — the cumulative sum shuffles on the source key and each
partition streams), so the plan is flat at any corpus size.  Order
within a source is ``md5(id)`` — a deterministic shuffle that is
reproducible in SQL and insensitive to id/content correlation (same
idiom as pipeline.stratified_take).  Greedy-prefix semantics: a
document is taken iff the cumulative cost of the documents *before* it
(in md5 order) is still under its source's allocation, so each source
overshoots by at most one document — exact, order-stable, and
oracle-reproducible (no float accumulation: costs are summed as longs).

Reference: corpus-shaping parity-plus — the reference engine stops at
per-table queries (data_store_impl.dart); the mix is the layer a
100 TB training build runs on top.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def allocations(weights: Mapping[str, float], budget: float) -> dict[str, float]:
    """Per-source cost allocation: ``weight / sum(weights) * budget``.
    Weights need not be normalized."""
    total = float(sum(weights.values()))
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    return {s: float(w) * float(budget) / total for s, w in weights.items()}


def mix_corpus(df: DataFrame, weights: Mapping[str, float], budget: float,
               source_field: str = "source", cost_field: str = "n_chars",
               id_field: str = "doc_id") -> DataFrame:
    """The mixed corpus: every document whose source is weighted and whose
    cumulative-cost-before (md5-of-id order within the source) is under
    the source's allocation.  Unlisted sources are dropped."""
    alloc = allocations(weights, budget)
    amap = F.create_map(*[F.lit(x) for kv in alloc.items() for x in kv])
    w = (Window.partitionBy(source_field)
         .orderBy(F.md5(F.col(id_field).cast("string")), F.col(id_field)))
    cum_before = (F.sum(F.col(cost_field).cast("long")).over(w)
                  - F.col(cost_field).cast("long"))
    return (df.filter(F.col(source_field).isin(list(weights)))
              .withColumn("__cb", cum_before)
              .filter(F.col("__cb") < amap[F.col(source_field)])
              .drop("__cb"))


def mix_report(df: DataFrame, weights: Mapping[str, float], budget: float,
               source_field: str = "source", cost_field: str = "n_chars",
               id_field: str = "doc_id") -> DataFrame:
    """Per-source audit of a mix: documents taken, cost taken, allocation,
    and fill ratio — the sanity table to eyeball before a training run."""
    alloc = allocations(weights, budget)
    amap = F.create_map(*[F.lit(x) for kv in alloc.items() for x in kv])
    taken = mix_corpus(df, weights, budget, source_field=source_field,
                       cost_field=cost_field, id_field=id_field)
    return (taken.groupBy(source_field)
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum(F.col(cost_field).cast("long")).alias("cost_taken"))
            .withColumn("allocation", amap[F.col(source_field)])
            .withColumn("fill_ratio",
                        F.col("cost_taken") / F.col("allocation")))
