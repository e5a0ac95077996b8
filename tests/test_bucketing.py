"""Bucketed co-located joins: same results, zero shuffle exchanges.

SURVEY.md §4.2: the reference's B+tree co-location maps to Spark bucketing —
pre-shuffled, pre-sorted storage so repeated equi-joins/aggs on the bucket
key skip the exchange entirely.
"""

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def bucketed(spark, db):
    db.bucket_table("lineitem", ["l_orderkey"], n_buckets=8, alias="li_b")
    db.bucket_table("orders", ["o_orderkey"], n_buckets=8, alias="o_b")
    return db


def test_bucketed_join_no_exchange(spark, bucketed):
    db = bucketed
    j = (db.df("li_b").hint("merge")
         .join(db.df("o_b"), F.col("l_orderkey") == F.col("o_orderkey"))
         .select("l_orderkey", "l_quantity", "o_totalprice"))
    assert "Exchange" not in _plan(j), _plan(j)
    # identical result to the unbucketed join
    j2 = (db.df("lineitem")
          .join(db.df("orders"), F.col("l_orderkey") == F.col("o_orderkey")))
    assert j.count() == j2.count()


def test_unbucketed_join_has_exchange(spark, db):
    j = (db.df("lineitem").hint("merge")
         .join(db.df("orders"), F.col("l_orderkey") == F.col("o_orderkey"))
         .select("l_orderkey", "o_totalprice"))
    assert "Exchange" in _plan(j)


def test_bucketed_agg_no_exchange(spark, bucketed):
    db = bucketed
    agg = db.df("li_b").groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
    assert "Exchange" not in _plan(agg), _plan(agg)
    want = (db.df("lineitem").groupBy("l_orderkey")
            .agg(F.sum("l_quantity").alias("q")))
    assert sorted((r["l_orderkey"], r["q"]) for r in agg.collect()) == \
           sorted((r["l_orderkey"], r["q"]) for r in want.collect())
