"""Bloom-filter pruning (functions/bloom.py) + deterministic corpus split
(llmops/pipeline.py split_corpus)."""

import os

import pytest
from pyspark.sql import functions as F

from tostore_spark.functions.bloom import (
    bloom_build, bloom_join, bloom_prune,
)
from tostore_spark.llmops.pipeline import hash_fraction, split_corpus


@pytest.fixture(scope="module")
def frames(spark):
    probe = spark.range(0, 20000).withColumn("k", F.col("id") % 997)
    build = spark.range(0, 120).select((F.col("id") * 7).alias("k"))
    return probe, build


def test_bloom_join_exact(spark, frames):
    probe, build = frames
    expect = sorted(r["id"] for r in probe.join(build, "k").collect())
    got = sorted(r["id"] for r in bloom_join(probe, build, on="k").collect())
    assert got == expect


def test_bloom_no_false_negatives_even_when_tiny(spark, frames):
    # a deliberately saturated 128-bit filter: lots of false positives,
    # but pruning must NEVER drop a true match, and the final join must
    # still be exact
    probe, build = frames
    expect = sorted(r["id"] for r in probe.join(build, "k").collect())
    got = sorted(
        r["id"] for r in
        bloom_join(probe, build, on="k", m_bits=128, k_hashes=2).collect())
    assert got == expect
    pruned = bloom_prune(probe, bloom_build(build, "k", 128, 2), "k", 128, 2)
    assert pruned.count() >= len(expect)


def test_bloom_prune_selectivity(spark, frames):
    # at the default 1 Mbit / 5 hashes and ~120 build keys, false
    # positives are ~0: the prune should pass only the matching rows
    probe, build = frames
    bloom = bloom_build(build, "k")
    n_true = probe.join(build.select("k").distinct(), "k").count()
    n_pruned = bloom_prune(probe, bloom, "k").count()
    assert n_pruned == n_true


def test_bloom_artifact_deterministic_and_persistable(spark, frames, tmp_path):
    # same keys -> byte-identical artifact; reading it back prunes the same
    _, build = frames
    a = sorted(map(tuple, bloom_build(build, "k").collect()))
    b = sorted(map(tuple, bloom_build(build, "k").collect()))
    assert a == b
    path = os.path.join(str(tmp_path), "bloom.parquet")
    bloom_build(build, "k").write.parquet(path)
    reread = spark.read.parquet(path)
    probe = spark.range(0, 5000).withColumn("k", F.col("id") % 997)
    assert (bloom_prune(probe, reread, "k").count()
            == bloom_prune(probe, bloom_build(build, "k"), "k").count())


def test_bloom_join_rejects_outer(spark, frames):
    probe, build = frames
    with pytest.raises(ValueError):
        bloom_join(probe, build, on="k", how="left")


def test_bloom_null_keys_never_match(spark):
    probe = spark.range(0, 10).select(
        F.when(F.col("id") < 5, F.col("id")).alias("k"))
    build = spark.range(0, 3).select(F.col("id").alias("k"))
    got = bloom_join(probe, build, on="k").count()
    assert got == probe.join(build, "k").count() == 3
    # the PRUNE itself already drops nulls (xxhash64 skips null inputs,
    # so without the explicit filter every null would share one phantom
    # position set and could leak through as a permanent false positive)
    pruned = bloom_prune(probe, bloom_build(build, "k"), "k")
    assert pruned.filter(F.col("k").isNull()).count() == 0


def test_bloom_plan_shape(spark, frames):
    # the prune must ride a BROADCAST of the 1-row compact bitmap and
    # keep the probe side shuffle-free before the filter
    probe, build = frames
    plan = bloom_prune(probe, bloom_build(build, "k"), "k") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_contamination_bloom_prefilter_exact(spark, db):
    # the bloom prefilter must not change the contamination pair set —
    # no false negatives, false positives die in the exact gram join
    from tostore_spark.llmops.dedup import (
        bench_gram_bloom, contamination_pairs,
    )
    docs = db.df("documents")
    train = docs.filter(F.col("doc_id") % 3 != 0)
    bench = docs.filter(F.col("doc_id") % 3 == 0).limit(40)
    base = sorted(map(tuple, contamination_pairs(
        train, bench, n=5, min_overlap=1,
        bloom_prefilter=False).collect()))
    on = sorted(map(tuple, contamination_pairs(
        train, bench, n=5, min_overlap=1).collect()))
    assert on == base and len(base) > 0
    # persisted-artifact path: prebuilt bloom gives the same pairs
    art = bench_gram_bloom(bench, n=5)
    via_art = sorted(map(tuple, contamination_pairs(
        train, bench, n=5, min_overlap=1, bench_bloom=art).collect()))
    assert via_art == base


def test_split_corpus_deterministic_partition(spark):
    docs = spark.range(0, 8000).select(F.col("id").alias("doc_id"))
    out = split_corpus(docs, {"train": 0.9, "val": 0.05, "test": 0.05})
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 8000            # exactly one split each
    assert counts["train"] > 6 * (counts["val"] + counts["test"])
    again = split_corpus(docs, {"train": 0.9, "val": 0.05, "test": 0.05})
    assert (out.exceptAll(again).count() == 0
            and again.exceptAll(out).count() == 0)  # pure function of ids


def test_split_corpus_matches_hash_boundaries(spark):
    # the label is exactly the documented cumulative md5 bucket rule
    docs = spark.range(0, 2000).select(F.col("id").alias("doc_id"))
    out = split_corpus(docs, {"a": 0.5, "b": 0.5})
    bad = out.withColumn("frac", hash_fraction(F.col("doc_id"))) \
             .filter(((F.col("frac") < 5000) & (F.col("split") != "a")) |
                     ((F.col("frac") >= 5000) & (F.col("split") != "b")))
    assert bad.count() == 0


def test_split_corpus_weight_normalization(spark):
    # weights need not sum to 1 — 3:1 behaves like 0.75/0.25
    docs = spark.range(0, 4000).select(F.col("id").alias("doc_id"))
    a = split_corpus(docs, {"x": 3.0, "y": 1.0})
    b = split_corpus(docs, {"x": 0.75, "y": 0.25})
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
