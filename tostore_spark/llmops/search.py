"""BM25 keyword retrieval over the corpus — the lexical-search side of
corpus curation (find documents about X, pull eval-adjacent passages,
seed data-selection queries), complementing the embedding ANN path.

Spark shape: ONE corpus pass explodes tokens, an ``isin(query terms)``
filter cuts the stream to the query's postings immediately (the explode
never materializes non-query tokens past the filter), and everything
downstream — per-(doc, term) tf, per-term df, doc length, the global
(N, avgdl) scalars — is hash-aggregates joined back on tiny keys.  The
two corpus-wide scalars stay IN the plan as a broadcast nested-loop of
one row (the quality_filter idiom), never a driver collect.

Determinism contract for the oracle: the final score is the sum of
per-term partial scores added in FIXED (sorted-term) order via a pivot,
not a float aggregate in arbitrary order — bit-stable across engines.

Parity-plus: the reference has no full-text search surface (its queries
are record predicates, data_store_impl.dart); BM25 is the standard
corpus-retrieval baseline (Robertson-Sparck Jones idf, k1/b as in
Robertson et al., TREC-3).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tostore_spark.llmops.text import WORD_RE, tokens


def query_terms(query: str) -> list[str]:
    """The query tokenized exactly like the corpus (lowercase word
    regex), de-duplicated, sorted — the fixed term order the score sum
    uses."""
    return sorted(set(re.findall(WORD_RE, query.lower())))


def bm25_search(docs: DataFrame, query: str, k: int = 10,
                k1: float = 1.2, b: float = 0.75,
                text_field: str = "text",
                id_field: str = "doc_id") -> DataFrame:
    """Top-k documents by BM25 for ``query``.

    score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)),
    idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)); terms absent from a doc
    contribute 0.  Returns (id, score, per-term tf columns are internal).
    Output: ``(id_field, score)`` ordered by (score desc, id) — a
    TakeOrderedAndProject, bounded at any corpus size.
    """
    terms = query_terms(query)
    if not terms:
        raise ValueError("query has no indexable terms")
    toks = tokens(F.col(text_field))
    base = docs.select(F.col(id_field).alias("id"),
                       F.explode(toks).alias("tok"))
    hits = base.filter(F.col("tok").isin(terms))
    tf = hits.groupBy("id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = hits.groupBy("tok").agg(
        F.countDistinct("id").alias("term_df"))
    dl = docs.select(F.col(id_field).alias("id"),
                     F.size(toks).cast("long").alias("dl"))
    stats = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"),
                     F.avg(F.size(toks).cast("long")).alias("avgdl"))
    scored = (tf.join(F.broadcast(dfreq), "tok")
                .join(dl, "id")
                .crossJoin(F.broadcast(stats)))
    idf = F.log(F.lit(1.0) + (F.col("n_docs") - F.col("term_df") + 0.5)
                / (F.col("term_df") + 0.5))
    part = (idf * (F.col("tf").cast("double") * (k1 + 1.0))
            / (F.col("tf").cast("double")
               + k1 * (1.0 - b + b * F.col("dl").cast("double")
                       / F.col("avgdl"))))
    per_term = (scored.withColumn("part", part)
                .groupBy("id").pivot("tok", terms).agg(F.first("part")))
    score = None
    for t in terms:   # fixed-order sum: bit-stable, oracle-reproducible
        c = F.coalesce(F.col(f"`{t}`"), F.lit(0.0))
        score = c if score is None else score + c
    return (per_term.select(F.col("id").alias(id_field),
                            score.alias("score"))
            .orderBy(F.col("score").desc(), F.col(id_field))
            .limit(k))


def bm25_build_index(docs: DataFrame, path: str,
                     text_field: str = "text",
                     id_field: str = "doc_id") -> dict:
    """Persist the inverted index so repeated searches never rescan the
    corpus text: ``postings/`` (tok, id, tf) range-partitioned and
    sorted on the token — parquet footer min/max prune to the query
    terms' row groups — ``doclens/`` (id, dl), and a tiny JSON sidecar
    with the (N, avgdl) scalars (the centroid-sidecar idiom,
    similarity.py).  One corpus pass builds everything.  Returns the
    sidecar dict."""
    import json
    import os

    toks = tokens(F.col(text_field))
    base = docs.select(F.col(id_field).alias("id"),
                       F.explode(toks).alias("tok"))
    tf = base.groupBy("tok", "id").agg(F.count(F.lit(1)).alias("tf"))
    (tf.repartitionByRange(32, "tok").sortWithinPartitions("tok")
       .write.mode("overwrite").parquet(os.path.join(path, "postings")))
    dl = docs.select(F.col(id_field).alias("id"),
                     F.size(toks).cast("long").alias("dl"))
    dl.write.mode("overwrite").parquet(os.path.join(path, "doclens"))
    n_docs, avgdl = docs.agg(
        F.count(F.lit(1)).cast("double"),
        F.avg(F.size(toks).cast("long"))).first()
    meta = {"n_docs": float(n_docs), "avgdl": float(avgdl)}
    with open(os.path.join(path, "bm25_meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


def bm25_search_indexed(spark, path: str, query: str, k: int = 10,
                        k1: float = 1.2, b: float = 0.75,
                        id_field: str = "doc_id") -> DataFrame:
    """BM25 top-k against a persisted ``bm25_build_index`` artifact —
    identical scores to ``bm25_search`` (pytest-pinned) but the only
    data read is the query terms' postings (token predicate pushed into
    the range-sorted parquet) plus the doc-length table.  Per-term df is
    computed from the filtered postings (df is only needed for the
    query's own terms)."""
    import json
    import os

    terms = query_terms(query)
    if not terms:
        raise ValueError("query has no indexable terms")
    with open(os.path.join(path, "bm25_meta.json")) as f:
        meta = json.load(f)
    hits = (spark.read.parquet(os.path.join(path, "postings"))
            .filter(F.col("tok").isin(terms)))
    dl = spark.read.parquet(os.path.join(path, "doclens"))
    dfreq = hits.groupBy("tok").agg(F.countDistinct("id").alias("term_df"))
    scored = (hits.join(F.broadcast(dfreq), "tok").join(dl, "id"))
    n_docs = F.lit(float(meta["n_docs"]))
    avgdl = F.lit(float(meta["avgdl"]))
    idf = F.log(F.lit(1.0) + (n_docs - F.col("term_df") + 0.5)
                / (F.col("term_df") + 0.5))
    part = (idf * (F.col("tf").cast("double") * (k1 + 1.0))
            / (F.col("tf").cast("double")
               + k1 * (1.0 - b + b * F.col("dl").cast("double") / avgdl)))
    per_term = (scored.withColumn("part", part)
                .groupBy("id").pivot("tok", terms).agg(F.first("part")))
    score = None
    for t in terms:   # same fixed-order sum as bm25_search
        c = F.coalesce(F.col(f"`{t}`"), F.lit(0.0))
        score = c if score is None else score + c
    return (per_term.select(F.col("id").alias(id_field),
                            score.alias("score"))
            .orderBy(F.col("score").desc(), F.col(id_field))
            .limit(k))
