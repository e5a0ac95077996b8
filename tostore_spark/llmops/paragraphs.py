"""Paragraph-level deduplication (Dolma / RefinedWeb-style).

Exact dedup at PARAGRAPH granularity: a paragraph that already appeared
earlier in the corpus (first occurrence in (doc_id, pos) order wins) is
removed from every later document, and each document's text is rebuilt
from its surviving paragraphs in original order.  This is the
between-document boilerplate pass that document-level exact dedup misses
(shared headers/footers/navigation inside otherwise-distinct pages) and
that ``remove_repeated_spans`` (frequency-threshold spans) complements:
here ONE prior occurrence is enough to drop the copy, and the unit is the
author's paragraph break, not a fixed k-word window.

Scale shape: posexplode (per-row fanout, no shuffle) → one hash-agg on
the paragraph digest (uniform md5 keys) with a digest-partitioned
row_number to pick the global first occurrence → equi-join back on the
digest → per-doc ordered rebuild (doc-partitioned aggregation).  Two
shuffles on uniform keys, never all-pairs, nothing collected — the same
plan family as ``exact_dedup`` (dedup.py), one level finer.

Reference scope: the reference has no corpus curation (SURVEY §2 north-star
operators); semantics follow the public Dolma/RefinedWeb recipes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def split_paragraphs(df: DataFrame, text_field: str = "text",
                     id_field: str = "doc_id",
                     delimiter: str = r"\n{2,}") -> DataFrame:
    """Explode documents into (id, pos, para) rows — ``pos`` is the
    0-based paragraph position; empty/whitespace-only paragraphs are
    dropped (they carry no content and would all collide on one digest)."""
    # spread: the split+explode is the CPU-heavy per-row stage and a
    # one-file corpus would serialize it on one core (dedup._spread —
    # no-op when the scan already splits >= cores wide)
    from tostore_spark.llmops.dedup import _spread
    return (_spread(df)
              .select(F.col(id_field).alias("__pid"),
                      F.posexplode(F.split(F.col(text_field), delimiter))
                       .alias("pos", "para"))
              .withColumn("para", F.trim("para"))
              .filter(F.length("para") > 0)
              .select(F.col("__pid").alias(id_field), "pos", "para"))


def paragraph_dedup(df: DataFrame, text_field: str = "text",
                    id_field: str = "doc_id",
                    delimiter: str = r"\n{2,}",
                    rejoin: str = "\n\n",
                    drop_empty: bool = True) -> DataFrame:
    """Remove every paragraph whose exact text appeared earlier in the
    corpus (earlier = smaller (doc_id, pos)); rebuild each doc's text.

    Output: (id_field, text_clean, n_para_kept, n_para_total) — documents
    whose every paragraph was seen before are dropped when ``drop_empty``
    (a fully-boilerplate page), else kept with empty text.
    """
    paras = split_paragraphs(df, text_field, id_field, delimiter)
    digested = paras.withColumn("__h", F.md5(F.col("para")))
    # global first occurrence per digest: digest-partitioned window —
    # md5 keys are uniform, so no partition can be skewed by a hot value
    w = Window.partitionBy("__h").orderBy(id_field, "pos")
    kept = (digested
            .withColumn("__rn", F.row_number().over(w))
            .withColumn("__keep", F.col("__rn") == 1))
    agg = (kept.groupBy(id_field)
           .agg(F.count(F.lit(1)).alias("n_para_total"),
                F.sum(F.when(F.col("__keep"), 1).otherwise(0))
                 .alias("n_para_kept"),
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(
                            F.when(F.col("__keep"),
                                   F.struct(F.col("pos"), F.col("para"))))),
                        lambda s: s["para"]),
                    rejoin).alias("text_clean")))
    if drop_empty:
        agg = agg.filter(F.col("n_para_kept") > 0)
    return agg.select(id_field, "text_clean", "n_para_kept", "n_para_total")
