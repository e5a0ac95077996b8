"""Similarity search over embedding columns: brute-force top-k baseline and
an IVF (inverted-file) scale path.

Brute-force: queries × corpus as a broadcast nested-loop (queries are small;
the corpus streams), per-query top-k via a ranking window — the exact
baseline every ANN variant is judged against.

IVF: k centroids (deterministic seed rows or provided), each vector assigned
to its nearest centroid map-side; a query probes `nprobe` nearest cells only.
At 100 TB the corpus is partitioned by cell id, so a probe touches
nprobe/k of the data — the classic IVF trade.  No Python in the scoring
path; everything is higher-order-function column math.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dot_cols(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0),
                              lambda acc, x: acc + x.cast("double") * x.cast("double")))


def cosine_distance_cols(a: Column, b: Column) -> Column:
    return F.lit(1.0) - _dot_cols(a, b) / (_norm(a) * _norm(b))


def l2_distance_cols(a: Column, b: Column) -> Column:
    return F.sqrt(F.aggregate(F.zip_with(a, b, lambda x, y:
                                         (x.cast("double") - y.cast("double"))
                                         * (x.cast("double") - y.cast("double"))),
                              F.lit(0.0), lambda acc, x: acc + x))


def knn_join(queries: DataFrame, corpus: DataFrame, k: int = 10,
             query_vec: str = "embedding", corpus_vec: str = "embedding",
             query_id: str = "vec_id", corpus_id: str = "vec_id",
             metric: str = "cosine", exclude_self: bool = True) -> DataFrame:
    """Brute-force k-NN join: for every query row, the k nearest corpus rows.

    Output: (query_id, neighbor_id, distance, rank).  The query side is
    broadcast; the corpus side streams — one pass, then a per-query top-k
    window (rank ties broken by neighbor id for determinism).
    """
    q = queries.select(F.col(query_id).alias("query_id"),
                       F.col(query_vec).alias("__qv"))
    c = corpus.select(F.col(corpus_id).alias("neighbor_id"),
                      F.col(corpus_vec).alias("__cv"))
    joined = c.crossJoin(F.broadcast(q))
    if exclude_self:
        joined = joined.filter(F.col("query_id") != F.col("neighbor_id"))
    dist_fn = cosine_distance_cols if metric == "cosine" else l2_distance_cols
    dist = dist_fn(F.col("__qv"), F.col("__cv")).alias("distance")
    scored = joined.select("query_id", "neighbor_id", dist)
    w = Window.partitionBy("query_id").orderBy(F.col("distance").asc(),
                                               F.col("neighbor_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= k))


def ivf_build(corpus: DataFrame, n_cells: int = 16, vec_field: str = "embedding",
              id_field: str = "vec_id") -> tuple[DataFrame, list[tuple[int, list[float]]]]:
    """Assign each vector to its nearest of `n_cells` centroids.

    Centroids are the first n_cells vectors by id — deterministic and cheap;
    swap in k-means for production quality (same assignment plan).
    Returns (corpus + cell_id column, centroid list).
    """
    import math

    cents = [(i, [float(x) for x in r[vec_field]])
             for i, r in enumerate(corpus.orderBy(F.col(id_field).asc())
                                   .select(id_field, vec_field).take(n_cells))]
    v = F.col(vec_field)
    # argmin via a distance array + array_position: flat expression, one
    # distance evaluation per centroid.  (A chained when(d < best_dist)
    # fold duplicates each distance expression exponentially in depth.)
    # ||v|| is staged as a column (referenced per centroid, no CSE in
    # expressions) and centroid norms are plain Python constants.
    corpus = corpus.withColumn("__nv", _norm(v))
    dists = F.array(*[
        F.lit(1.0) - _dot_cols(v, F.array(*[F.lit(x) for x in cent]))
        / (F.col("__nv") * F.lit(math.sqrt(sum(x * x for x in cent)) or 1.0))
        for _, cent in cents])
    staged = corpus.withColumn("__cell_dists", dists)
    out = (staged.withColumn(
        "cell_id",
        (F.array_position(F.col("__cell_dists"),
                          F.array_min(F.col("__cell_dists"))) - 1).cast("int"))
        .drop("__cell_dists", "__nv"))
    return out, cents


def ivf_search(indexed: DataFrame, centroids: list[tuple[int, list[float]]],
               query_vector: Sequence[float], k: int = 10, nprobe: int = 2,
               vec_field: str = "embedding", id_field: str = "vec_id") -> DataFrame:
    """Probe the `nprobe` nearest cells, exact-rank inside them."""
    import math

    def cos_d(a: Sequence[float], b: Sequence[float]) -> float:
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a)) or 1.0
        nb = math.sqrt(sum(x * x for x in b)) or 1.0
        return 1.0 - dot / (na * nb)

    probe = sorted(centroids, key=lambda c: cos_d(c[1], list(query_vector)))[:nprobe]
    cells = [cid for cid, _ in probe]
    from tostore_spark.vector import vector_search
    return vector_search(indexed.filter(F.col("cell_id").isin(cells)),
                         vec_field, query_vector, top_k=k, metric="cosine",
                         pk=id_field)
