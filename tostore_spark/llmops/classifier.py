"""Learned quality-classifier filter (fasttext-style linear model).

DCLM/CCNet-shape pipelines follow the perplexity cut with a LEARNED
quality classifier.  The scale-correct Spark form is a linear model over
deterministic column features — trained once with Spark ML logistic
regression (distributed lbfgs), then scored map-side as pure Column
arithmetic: no per-row Python, no model object on the hot path, and the
score is bit-reproducible in ANSI SQL for the oracle.

Features (fixed order, all SQL-expressible):
  0  f_len    capped token count  (n_tokens / 100, max 1)
  1  f_punct  punctuation ratio
  2  f_stop   stopword ratio
  3  f_mtl    mean token length
  4-7 f_h0..f_h3  hashed bag-of-words: fraction of tokens whose 32-bit
      md5 prefix falls in hash bin j of 4 (the fasttext n-gram bucket
      trick, degree 4)

Scoring compares on the LOGIT, not the sigmoid: the logit is +,*,/
arithmetic (IEEE-identical across engines) while exp() differs in the
last ulp between libm implementations — a threshold on the logit is the
same decision boundary with none of the cross-engine rounding risk
(sigmoid is monotone).

Reference: the reference's quality surface is schema validation only;
this is parity-plus for the training-data pipeline (SURVEY.md §2's LLM
extension), following the DCLM baseline's classifier stage in shape.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tostore_spark.llmops import text as TX

#: feature column names, in weight order
CLF_FEATURES = ["f_len", "f_punct", "f_stop", "f_mtl",
                "f_h0", "f_h1", "f_h2", "f_h3"]
N_HASH_BINS = 4


def _hash_bin(tok: Column) -> Column:
    """Token -> hash bin in [0, N_HASH_BINS): first 32 md5 bits mod 4 —
    the same md5-prefix integer trick the dedup/sampling family uses, so
    the oracle reproduces it with ('0x' || substr(md5(t),1,8))::BIGINT."""
    return (F.conv(F.substring(F.md5(tok), 1, 8), 16, 10)
            .cast("long") % N_HASH_BINS)


def clf_features(df: DataFrame, text_field: str = "text") -> DataFrame:
    """Attach the 8 feature columns (pure Column math, one scan)."""
    t = F.col(text_field)
    toks = TX.tokens(t)
    n = TX.token_count(t)
    nd = F.greatest(n, F.lit(1)).cast("double")
    out = (df.withColumn("f_len",
                         F.least(n.cast("double") / F.lit(100.0),
                                 F.lit(1.0)))
             .withColumn("f_punct", TX.punct_ratio(t))
             .withColumn("f_stop", TX.stopword_ratio(t))
             .withColumn("f_mtl", TX.mean_token_length(t)))
    def bin_pred(j):
        # single-arg lambda factory, NOT `lambda x, j=j`: pyspark HOFs
        # dispatch on lambda arity, so a two-parameter lambda would be
        # called as (element, array_index) and silently shadow j
        return lambda x: _hash_bin(x) == j

    for j in range(N_HASH_BINS):
        out = out.withColumn(
            f"f_h{j}",
            F.size(F.filter(toks, bin_pred(j))).cast("double") / nd)
    return out


def logit_column(weights: list[float], intercept: float) -> Column:
    """intercept + Σ w_i · f_i as one left-associated chain (the oracle
    mirrors the exact same op order)."""
    if len(weights) != len(CLF_FEATURES):
        raise ValueError(f"expected {len(CLF_FEATURES)} weights, "
                         f"got {len(weights)}")
    z = F.lit(float(intercept))
    for w, name in zip(weights, CLF_FEATURES):
        z = z + F.lit(float(w)) * F.col(name)
    return z


def score_quality(df: DataFrame, weights: list[float], intercept: float,
                  text_field: str = "text") -> DataFrame:
    """Map-side scoring: adds ``clf_logit`` (the oracle-exact decision
    value) and ``clf_score`` (its sigmoid, for humans)."""
    out = clf_features(df, text_field=text_field)
    z = logit_column(weights, intercept)
    return (out.withColumn("clf_logit", z)
               .withColumn("clf_score",
                           F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("clf_logit")))))


def quality_classifier_filter(df: DataFrame, weights: list[float],
                              intercept: float, threshold: float = 0.5,
                              text_field: str = "text") -> DataFrame:
    """Keep documents the classifier scores >= ``threshold``.  The
    probability threshold converts to a logit bound driver-side
    (sigmoid is monotone), so the executed filter is pure arithmetic."""
    if not 0.0 < threshold < 1.0:
        raise ValueError(f"threshold must be in (0, 1), got {threshold}")
    z_min = math.log(threshold / (1.0 - threshold))
    return (score_quality(df, weights, intercept, text_field=text_field)
            .filter(F.col("clf_logit") >= F.lit(z_min)))


def train_quality_classifier(labeled: DataFrame, label_field: str = "label",
                             text_field: str = "text",
                             max_iter: int = 100,
                             reg_param: float = 0.01
                             ) -> tuple[list[float], float]:
    """Train the linear model with Spark ML logistic regression over the
    fixed feature set; returns (weights, intercept) ready for
    ``score_quality``.  Distributed lbfgs over a deterministic feature
    frame — same data in, same model out (pytest pins it).

    ``labeled`` needs ``label_field`` in {0, 1} (1 = keep-quality; the
    usual recipe: positives from a trusted corpus, negatives from raw
    crawl — the CCNet/DCLM construction)."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import VectorAssembler

    feats = clf_features(labeled, text_field=text_field)
    asm = VectorAssembler(inputCols=CLF_FEATURES, outputCol="__fv")
    lr = LogisticRegression(featuresCol="__fv",
                            labelCol=label_field,
                            maxIter=max_iter, regParam=reg_param,
                            standardization=True, family="binomial")
    model = lr.fit(asm.transform(feats))
    return [float(c) for c in model.coefficients], float(model.intercept)
