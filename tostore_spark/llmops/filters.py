"""Named document-quality rule presets from the public literature.

``gopher_filter`` implements the document-level heuristics of Rae et
al., "Scaling Language Models: Methods, Analysis & Insights from
Training Gopher" (arXiv:2112.11446, App. A1.1) — the standard first
quality gate of web-corpus pipelines, complementing this package's
statistical filters (perplexity, classifier, DSIR):

- word count within [min_words, max_words]
- mean word length within [3, 10]
- symbol-to-word ratio (``#`` and ``...``) below 0.1
- fraction of words with at least one alphabetic character above 0.8
- at least ``min_stopwords`` distinct common stopwords present

(The Gopher line-shape rules — bullet/ellipsis line fractions — need
line structure; apply them via ``text_stats`` when the corpus carries
newlines.  The repetition rules live in ``text.repetition_stats``.)

Everything is pure column math over ONE whitespace tokenization bound
through a let (no per-rule re-split), zero Python in the hot path, and
each rule lands as its own boolean column so the report aggregate and
the filter share a plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_flags(df: DataFrame, text_field: str = "text",
                 min_words: int = 50, max_words: int = 100_000,
                 min_stopwords: int = 2) -> DataFrame:
    """Annotate each document with the per-rule booleans plus the
    conjunction ``gopher_keep`` (no rows dropped — compose with
    ``.filter("gopher_keep")`` or feed the report aggregate)."""
    toks = F.split(F.trim(F.col(text_field)), r"\s+")
    n = F.size(toks)
    charsum = F.aggregate(F.transform(toks, F.length),
                          F.lit(0), lambda a, x: a + x)
    mean_len = charsum.cast("double") / n
    n_alpha = F.size(F.filter(toks, lambda w: w.rlike("[a-zA-Z]")))
    n_sym = (F.size(F.filter(toks, lambda w: w.contains("#")))
             + F.size(F.filter(toks, lambda w: w.contains("..."))))
    n_stop = F.size(F.array_intersect(
        F.transform(toks, F.lower),
        F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])))
    out = (df.withColumn("__n_words", n)
             .withColumn("r_word_count",
                         (F.col("__n_words") >= min_words)
                         & (F.col("__n_words") <= max_words))
             .withColumn("r_mean_word_len",
                         mean_len.between(3.0, 10.0))
             .withColumn("r_symbol_ratio",
                         n_sym.cast("double") / F.col("__n_words") < 0.1)
             .withColumn("r_alpha_fraction",
                         n_alpha.cast("double") / F.col("__n_words") > 0.8)
             .withColumn("r_stopwords", n_stop >= min_stopwords))
    rules = ["r_word_count", "r_mean_word_len", "r_symbol_ratio",
             "r_alpha_fraction", "r_stopwords"]
    keep = None
    for r in rules:
        keep = F.col(r) if keep is None else keep & F.col(r)
    return out.withColumn("gopher_keep", keep).drop("__n_words")


def gopher_filter(df: DataFrame, text_field: str = "text",
                  **kw) -> DataFrame:
    """Documents passing every Gopher rule, rule columns dropped."""
    flagged = gopher_flags(df, text_field=text_field, **kw)
    extra = [c for c in flagged.columns if c.startswith("r_")] \
        + ["gopher_keep"]
    return flagged.filter(F.col("gopher_keep")).drop(*extra)


def calibrate_scores(df: DataFrame, score_field: str,
                     by: str = "source",
                     out_field: str = "score_pct") -> DataFrame:
    """Per-group percentile calibration: replace a raw quality score
    with its within-group cumulative fraction (``cume_dist``), so a
    single global threshold means the same thing in every source — raw
    scores are NOT comparable across domains (a mediocre wiki page can
    outscore a good forum post), calibrated ranks are.  One
    group-partitioned window; ties share a rank (both engines define
    cume_dist identically), so the result is engine-exact."""
    w = Window.partitionBy(by).orderBy(F.col(score_field).asc())
    return df.withColumn(out_field, F.cume_dist().over(w))
