"""Distributed linear algebra over embedding columns: exact covariance
moments and PCA projection — the preprocessing pass in front of ANN
indexing (dimensionality reduction before IVF/PQ, whitening before
cosine thresholds).

Scale shape: the covariance is ONE aggregate over the corpus — per
dimension pair a DECIMAL product sum (exact, order-independent, the
repo-wide float policy) — reshaped long-form by a single explode; the
eigendecomposition runs driver-side on the (dims × dims) matrix (a
64-dim covariance is 4 KB — the one part of PCA that is legitimately
not distributed); the projection is map-side column math with the
rotation broadcast in-plan.  The corpus is scanned once to fit and
once to transform; nothing row-sized ever reaches the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: values are rounded to 6dp before the moment sums, so every product
#: has exactly 12 decimal places and the DECIMAL arithmetic is exact in
#: both engines (the q_quality_filter rounding precedent)
_ROUND_DP = 6


def embedding_covariance(emb: DataFrame, vec_field: str = "embedding",
                         dims: int | None = None) -> DataFrame:
    """Exact population covariance of the first ``dims`` embedding
    dimensions, long-form: (i, j, n, cov) for the upper triangle
    (i <= j), 0-indexed.

    Engine-exact by construction: each value rounds to 6dp (identical
    half-away-from-zero rounding in Spark and DuckDB), so sums of
    values (6dp) and products (12dp) are EXACT decimals with no further
    rounding; the covariance assembles from identical doubles with the
    same operation order: (n·sxy − sx·sy) / n².

    Practical bound: the aggregate is O(dims²) columns wide (64 dims →
    2,080 sums), which strains codegen and driver plan-build well
    before it strains executors.  For wide embeddings fit on a
    ``pipeline.hash_sample`` of the corpus (sample-covariance error
    shrinks as 1/√n — a million-row deterministic sample fits any
    rotation you would trust anyway) or restrict ``dims`` to the head
    dimensions being reduced."""
    n_dims = dims
    if n_dims is None:
        one = emb.select(F.size(vec_field).alias("d")).first()
        n_dims = int(one["d"])
    vals = [F.round(F.element_at(F.col(vec_field), i + 1).cast("double"),
                    _ROUND_DP).alias(f"__v{i}")
            for i in range(n_dims)]
    base = emb.select(*vals)
    pairs = [(i, j) for i in range(n_dims) for j in range(i, n_dims)]
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i in range(n_dims):
        aggs.append(F.sum(F.col(f"__v{i}").cast("decimal(18,6)"))
                     .cast("double").alias(f"__s{i}"))
    for i, j in pairs:
        aggs.append(
            F.sum(F.col(f"__v{i}").cast("decimal(14,6)")
                  * F.col(f"__v{j}").cast("decimal(14,6)"))
             .cast("double").alias(f"__p{i}_{j}"))
    one = base.agg(*aggs)
    n = F.col("__n").cast("double")
    structs = []
    for i, j in pairs:
        cov = ((n * F.col(f"__p{i}_{j}")
                - F.col(f"__s{i}") * F.col(f"__s{j}")) / (n * n))
        structs.append(F.struct(
            F.lit(i).alias("i"), F.lit(j).alias("j"),
            F.col("__n").cast("long").alias("n"), cov.alias("cov")))
    return (one.select(F.explode(F.array(*structs)).alias("s"))
               .select("s.*"))


def pca_components(emb: DataFrame, k: int,
                   vec_field: str = "embedding",
                   dims: int | None = None) -> list[list[float]]:
    """Top-``k`` principal directions of the embedding corpus (rows of
    the returned list, unit-norm, eigenvalue-descending).  The corpus
    contributes only through ``embedding_covariance``; the (dims×dims)
    eigendecomposition itself is driver-side numpy — bounded by the
    embedding width, never the corpus.  Deterministic sign convention:
    each component's largest-magnitude entry is positive."""
    import numpy as np

    rows = embedding_covariance(emb, vec_field, dims).collect()
    n_dims = max(r["j"] for r in rows) + 1
    cov = np.zeros((n_dims, n_dims))
    for r in rows:
        cov[r["i"], r["j"]] = cov[r["j"], r["i"]] = r["cov"]
    w, v = np.linalg.eigh(cov)           # ascending eigenvalues
    comps = []
    for idx in np.argsort(w)[::-1][:k]:
        c = v[:, idx]
        if c[int(np.argmax(np.abs(c)))] < 0:
            c = -c
        comps.append([float(x) for x in c])
    return comps


def pca_project(emb: DataFrame, components: list[list[float]],
                vec_field: str = "embedding",
                out_field: str = "pca") -> DataFrame:
    """Map-side projection onto fitted ``pca_components``: adds
    ``out_field`` = array<double> of length k.  The rotation rides into
    the plan as literals (k·dims doubles — a 64→16 reduction is 4 KB);
    no shuffle, no Python, one scan.  The whole expression is built as
    ONE SQL string (single parse): a k×dims Column-chain would cost
    k·dims py4j round trips of serial driver plan-build time — the
    exact cost profiled out of the minhash index build in r5."""
    dots = []
    for comp in components:
        terms = " + ".join(
            f"CAST(`{vec_field}`[{i}] AS DOUBLE) * {float(w)!r}"
            for i, w in enumerate(comp))
        dots.append(f"({terms})")
    return emb.withColumn(out_field, F.expr("array(" + ", ".join(dots) + ")"))


def truncate_normalize(emb: DataFrame, dims: int,
                       vec_field: str = "embedding",
                       out_field: str = "embedding_trunc",
                       renorm: bool = True) -> DataFrame:
    """Matryoshka-style truncation (Kusupati et al., arXiv:2205.13147):
    keep the first ``dims`` coordinates and (by default) L2-renormalize
    — the standard cost/recall knob for embedding search when the model
    was trained with nested-representation objectives (and a cheap
    approximation when it wasn't; measure recall via
    ``ivf_measure_recall`` before committing).

    Pure map-side column math — ``slice`` + one fused norm expression;
    the 4x-shorter vectors shrink every downstream shuffle/scan by the
    same factor.  The left-to-right norm fold matches the repo's other
    vector math, so an oracle reproduces it bit-for-bit."""
    if dims < 1:
        raise ValueError("dims must be >= 1")
    sl = F.slice(F.col(vec_field), 1, int(dims))
    if not renorm:
        return emb.withColumn(out_field, sl)
    from tostore_spark.functions.colutil import let_array as _la

    def _scaled(s):
        # both the slice and the norm are let-bound: an expression
        # referenced inside a transform lambda is re-evaluated per
        # ELEMENT (no CSE in lambda bodies), which would make the
        # norm fold O(dims^2) per row
        nrm = F.sqrt(F.greatest(
            F.aggregate(s, F.lit(0.0),
                        lambda a, x: a + x.cast("double") * x.cast("double")),
            F.lit(1e-30)))
        return _la(nrm,
                   lambda nv: F.transform(s, lambda x: x.cast("double") / nv))

    return emb.withColumn(out_field, _la(sl, _scaled))
