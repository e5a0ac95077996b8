"""convert_to_delta: in-place cataloging of plain parquet directories
— flat and hive-partitioned — with immediate stats skipping and
lifecycle composition (optimize/vacuum/time-travel)."""
import os

import pytest
from pyspark.sql import functions as F

from tostore_spark.plans.delta_export import (_replay, convert_to_delta,
                                              read_delta)


def _rows(df):
    cols = sorted(df.columns)
    return sorted(map(tuple, df.select(*cols).collect()))


def test_flat_directory(spark, tmp_path):
    src = str(tmp_path / "plain")
    df = spark.range(100).selectExpr("id", "id % 7 as grp",
                                     "cast(id as string) as s")
    df.repartitionByRange(4, "id").write.parquet(src)
    rep = convert_to_delta(spark, src)
    assert rep["files"] == 4 and rep["partition_columns"] == []
    assert _rows(read_delta(spark, src)) == _rows(df)
    # footer stats landed in the adds: a range predicate prunes
    st = _replay(src, None)
    assert all("stats" in a and a["stats"] for a in st["files"].values())
    from tests.test_delta_skipping import _pruned_count
    kept, total = _pruned_count(src, {"id": {"<": 10}})
    assert total == 4 and kept == 1
    got = _rows(read_delta(spark, src, where={"id": {"<": 10}}))
    assert got == _rows(df.filter(F.col("id") < 10))


def test_hive_partitioned_directory(spark, tmp_path):
    src = str(tmp_path / "hive")
    df = spark.range(60).selectExpr("id", "id % 3 as p")
    df.write.partitionBy("p").parquet(src)
    rep = convert_to_delta(spark, src)
    assert rep["partition_columns"] == ["p"]
    out = read_delta(spark, src)
    assert _rows(out) == _rows(df)
    assert dict(out.dtypes)["p"] in ("int", "bigint")
    # partitionValues recorded per file — equality on p prunes
    st = _replay(src, None)
    assert {a["partitionValues"]["p"]
            for a in st["files"].values()} == {"0", "1", "2"}
    got = _rows(read_delta(spark, src, where={"p": 1}))
    assert got == _rows(df.filter(F.col("p") == 1))


class TestLifecycle:
    def test_optimize_and_vacuum_after_convert(self, spark, tmp_path):
        src = str(tmp_path / "plain")
        df = spark.range(100).selectExpr("id", "id % 7 as grp")
        df.repartition(6).write.parquet(src)
        convert_to_delta(spark, src)
        before = _rows(read_delta(spark, src))
        from tostore_spark.plans.delta_export import (optimize_delta,
                                                      vacuum_delta)
        rep = optimize_delta(spark, src, target_file_bytes=64 << 20)
        assert rep["files"] == 1 and rep["rewritten"] == 6
        assert _rows(read_delta(spark, src)) == before
        # v0 still time-travels to the pre-compaction file set
        assert read_delta(spark, src, version=0).count() == 100
        vrep = vacuum_delta(src, keep_versions=1)
        assert vrep["deleted"]
        assert _rows(read_delta(spark, src)) == before

    def test_refusals(self, spark, tmp_path):
        src = str(tmp_path / "plain")
        spark.range(5).write.parquet(src)
        convert_to_delta(spark, src)
        with pytest.raises(ValueError, match="already has"):
            convert_to_delta(spark, src)
        empty = str(tmp_path / "empty")
        os.makedirs(empty)
        with pytest.raises(ValueError, match="no parquet files"):
            convert_to_delta(spark, empty)
        # a non-hive nested layout refuses rather than guessing
        weird = str(tmp_path / "weird" / "sub")
        os.makedirs(weird)
        spark.range(5).coalesce(1).write.mode("append").parquet(weird)
        with pytest.raises(ValueError, match="non-hive"):
            convert_to_delta(spark, str(tmp_path / "weird"))
