"""Corpus shaping: per-source caps, sequence packing, chunking."""

import pytest
from pyspark.sql import functions as F

SF01 = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs(spark):
    from tostore_spark import ToStoreSpark
    return ToStoreSpark(spark, data_dir=SF01).df("documents")


def test_cap_per_source_bounds_and_orders(spark, docs):
    from tostore_spark.llmops.packing import cap_per_source
    capped = cap_per_source(docs, 20, order_field="n_chars")
    sizes = {r["source"]: r["n"] for r in
             capped.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert all(n <= 20 for n in sizes.values())
    # top-by-n_chars: the kept minimum >= the dropped maximum per source
    src = docs.filter(F.col("source") == "src0")
    kept = sorted(r["n_chars"] for r in
                  cap_per_source(src, 5, order_field="n_chars").collect())
    all_chars = sorted((r["n_chars"] for r in src.collect()), reverse=True)
    assert kept == sorted(all_chars[:5])
    # deterministic md5 draw without order_field: same rows twice
    a = sorted(r["doc_id"] for r in cap_per_source(docs, 7).collect())
    b = sorted(r["doc_id"] for r in cap_per_source(docs, 7).collect())
    assert a == b and len(a) > 0


def test_pack_sequences_fills_budget(spark, docs):
    from tostore_spark.llmops.packing import pack_sequences
    packed = pack_sequences(docs, budget_tokens=512, n_shards=4)
    rows = packed.select("doc_id", "n_tokens", "shard", "example_id",
                         "offset").collect()
    assert len(rows) == docs.count()
    # within each (shard, example) offsets start below budget and examples
    # are dense: replaying the running sum reproduces (example_id, offset)
    by_shard = {}
    for r in sorted(rows, key=lambda r: (r["shard"], r["example_id"], r["offset"], r["doc_id"])):
        by_shard.setdefault(r["shard"], []).append(r)
    import hashlib
    for shard, members in by_shard.items():
        members.sort(key=lambda r: (hashlib.md5(str(r["doc_id"]).encode()).hexdigest(), r["doc_id"]))
        run = 0
        for r in members:
            assert r["example_id"] == run // 512
            assert r["offset"] == run % 512
            run += r["n_tokens"]


def test_chunk_documents_windows(spark):
    from tostore_spark.llmops.packing import chunk_documents
    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10))), (2, "solo"), (3, "")],
        ["doc_id", "text"])
    out = chunk_documents(df, chunk_tokens=4, overlap=1)
    rows = {(r["doc_id"], r["chunk_id"]): r for r in out.collect()}
    # doc 1: 10 tokens, step 3 -> starts 0,3,6,9
    assert [rows[(1, i)]["chunk_text"] for i in range(4)] == [
        "t0 t1 t2 t3", "t3 t4 t5 t6", "t6 t7 t8 t9", "t9"]
    assert rows[(1, 3)]["n_chunk_tokens"] == 1
    assert rows[(2, 0)]["chunk_text"] == "solo"
    assert not any(d == 3 for d, _ in rows)  # empty doc -> no chunks
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, chunk_tokens=4, overlap=4)


def test_quality_percentile_filter(spark, docs):
    from tostore_spark.llmops.packing import quality_percentile_filter
    kept = quality_percentile_filter(docs, pct=0.2)
    n_all, n_kept = docs.count(), kept.count()
    # ~80% survive (ties at the threshold can keep a few extra)
    assert 0.75 * n_all <= n_kept <= 0.85 * n_all
    # the dropped docs are exactly the lowest-quality ones: min kept
    # quality >= max dropped quality
    from tostore_spark.llmops import text as TX
    scored = docs.withColumn("q", TX.quality_score(F.col("text")))
    kept_ids = {r["doc_id"] for r in kept.collect()}
    qs = [(r["doc_id"], r["q"]) for r in scored.collect()]
    min_kept = min(q for d, q in qs if d in kept_ids)
    dropped = [q for d, q in qs if d not in kept_ids]
    assert not dropped or max(dropped) <= min_kept
    # threshold is one broadcast aggregate: single plan, no driver loop
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


# ---------------------------------------------------------------- mixing
def test_mix_corpus_greedy_prefix(spark, db):
    """Each source contributes exactly its maximal greedy md5-order prefix
    under weight/sum * budget; unlisted sources are dropped."""
    import hashlib

    from tostore_spark.llmops import mixing as M
    docs = db.df("documents")
    out = M.mix_corpus(docs, {"src0": 1.0, "src1": 1.0}, budget=8000)
    assert out.filter(~F.col("source").isin(["src0", "src1"])).count() == 0
    pdf = (docs.filter(F.col("source").isin(["src0", "src1"]))
           .select("source", "doc_id", "n_chars").toPandas())
    for s in ("src0", "src1"):
        sub = pdf[pdf.source == s].copy()
        sub["h"] = sub.doc_id.map(
            lambda i: hashlib.md5(str(i).encode()).hexdigest())
        sub = sub.sort_values(["h", "doc_id"])
        cum, take = 0, set()
        for _, r in sub.iterrows():
            if cum < 4000.0:
                take.add(r.doc_id)
            cum += r.n_chars
        got = {r["doc_id"] for r in
               out.filter(F.col("source") == s).select("doc_id").collect()}
        assert got == take, s


def test_mix_report_fill(spark, db):
    from tostore_spark.llmops import mixing as M
    docs = db.df("documents")
    rep = {r["source"]: r for r in
           M.mix_report(docs, {"src0": 3.0, "src1": 1.0},
                        budget=4000).collect()}
    assert rep["src0"]["allocation"] == 3000.0
    assert rep["src1"]["allocation"] == 1000.0
    for r in rep.values():   # greedy prefix: overshoot by < one doc
        assert r["cost_taken"] - r["allocation"] < 1000
        assert r["fill_ratio"] > 0.5


def test_length_grouped_batches_reduce_padding(spark, db):
    """Length grouping must (a) assign every doc to exactly one
    fixed-count batch in token-desc order within its shard, and
    (b) waste materially less padding than hash-order batching."""
    from tostore_spark.llmops.packing import (
        length_grouped_batches, padding_stats,
    )
    docs = db.df("documents")
    out = length_grouped_batches(docs, batch_size=16, n_shards=4)
    assert out.count() == docs.count()
    # within (shard, batch): all lengths >= any length of the next batch
    rows = out.select("shard", "batch_id", "n_tokens").collect()
    by_batch = {}
    for r in rows:
        by_batch.setdefault((r.shard, r.batch_id), []).append(r.n_tokens)
    for (s, b), toks in by_batch.items():
        nxt = by_batch.get((s, b + 1))
        if nxt:
            assert min(toks) >= max(nxt), (s, b)
        assert len(toks) <= 16
    stats = padding_stats(out)
    grouped_waste = stats.agg(F.sum("pad_waste")).collect()[0][0]
    # baseline: batch in md5(id) order (random lengths per batch)
    from pyspark.sql import Window
    w = (Window.partitionBy("shard")
         .orderBy(F.md5(F.col("doc_id").cast("string"))))
    rand = (out.drop("batch_id")
            .withColumn("batch_id",
                        ((F.row_number().over(w) - 1) / 16).cast("long")))
    rand_waste = padding_stats(rand).agg(F.sum("pad_waste")).collect()[0][0]
    assert grouped_waste < 0.5 * rand_waste


def test_padding_stats_arithmetic(spark, db):
    from tostore_spark.llmops.packing import (
        length_grouped_batches, padding_stats,
    )
    out = length_grouped_batches(db.df("documents"), batch_size=8,
                                 n_shards=2)
    for r in padding_stats(out).collect():
        assert r.pad_waste == r.n_docs * r.max_tokens - r.total_tokens
        assert r.pad_waste >= 0


def test_pack_materialize_differential(spark):
    """The materialized examples must equal a direct Python
    reconstruction of the concatenate-then-cut stream: same shards,
    same example cuts, same token order, straddling docs split."""
    import hashlib
    import re

    from tostore_spark.llmops.packing import pack_materialize

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{i}x{j}" for j in range(1 + (i * 7) % 13)))
         for i in range(40)], ["doc_id", "text"])
    B, S = 10, 4
    out = pack_materialize(docs, B, n_shards=S).collect()

    def h(x):
        return hashlib.md5(str(x).encode()).hexdigest()

    shards = {}
    for r in sorted(docs.collect(), key=lambda r: (h(r.doc_id), r.doc_id)):
        s = int(h(r.doc_id)[:8], 16) % S
        toks = re.findall(r"[a-z0-9]+", r.text.lower())
        if toks:
            shards.setdefault(s, []).extend(toks)
    expect = {}
    for s, stream in shards.items():
        for e in range((len(stream) + B - 1) // B):
            expect[(s, e)] = stream[e * B:(e + 1) * B]
    got = {(r.shard, r.example_id): r.example_text.split(" ") for r in out}
    assert got == expect
    # every example is exactly B tokens except <= one partial per shard
    partial = [r for r in out if r.n_example_tokens < B]
    assert len(partial) <= S
    assert all(r.n_example_tokens == B for r in out
               if (r.shard, r.example_id + 1) in got)
