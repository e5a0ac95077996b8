"""Durable mutation persistence: flush -> versioned parquet + manifest ->
reopen resumes the flushed state (the WAL-recovery analog of
wal_manager.dart / table_data_manager.dart:4378, without porting the WAL)."""

import os

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _fresh(spark, tmp_path_factory, tag):
    from tostore_spark import ToStoreSpark
    wh = str(tmp_path_factory.mktemp(f"wh_{tag}"))
    return ToStoreSpark(spark, data_dir=SF, warehouse=wh), wh


def test_flush_reopen_preserves_mutations(spark, tmp_path_factory):
    from tostore_spark import ToStoreSpark
    db, wh = _fresh(spark, tmp_path_factory, "roundtrip")
    n0 = db.df("nation").count()
    db.update("nation", {"n_name": "FLUSHED"}) \
      .where("n_nationkey", "=", 0).execute()
    db.delete("nation").where("n_nationkey", "=", 1).execute()
    flushed = db.flush()
    assert flushed == ["nation"]
    # a brand-new engine on the same warehouse resumes the flushed state
    db2 = ToStoreSpark(spark, data_dir=SF, warehouse=wh)
    got = db2.df("nation")
    assert got.count() == n0 - 1
    assert got.filter("n_nationkey = 0").collect()[0]["n_name"] == "FLUSHED"
    assert got.filter("n_nationkey = 1").count() == 0
    # while untouched tables still read straight from the data_dir source
    assert "testdata" in db2._tables[("default", "region")]["path"]


def test_flush_writes_only_dirty_tables(spark, tmp_path_factory):
    """At 100 TB flush must not rewrite clean source tables."""
    db, wh = _fresh(spark, tmp_path_factory, "dirty_only")
    db.update("region", {"r_name": "XX"}) \
      .where("r_regionkey", "=", 0).execute()
    assert db.flush() == ["region"]
    assert os.path.isdir(os.path.join(wh, "default", "region"))
    for big in ("lineitem", "orders", "customer", "nation"):
        assert not os.path.exists(os.path.join(wh, "default", big))
    # a second flush with no new mutations writes nothing
    assert db.flush() == []


def test_flush_roundtrips_kv_spaces_versions(spark, tmp_path_factory):
    from tostore_spark import ToStoreSpark
    db, wh = _fresh(spark, tmp_path_factory, "kv")
    db.kv.set_value("greeting", "hello")
    db.set_version(7)
    db.switch_space("analytics")
    db.switch_space("default")
    db.update("region", {"r_name": "XX"}) \
      .where("r_regionkey", "=", 0).execute()
    db.flush()
    db2 = ToStoreSpark(spark, data_dir=SF, warehouse=wh)
    assert db2.kv.get_value("greeting") == "hello"
    assert db2.get_version() == 7
    assert "analytics" in db2.list_spaces()


def test_flush_versions_accumulate_and_vacuum(spark, tmp_path_factory):
    db, wh = _fresh(spark, tmp_path_factory, "vacuum")
    tdir = os.path.join(wh, "default", "region")
    for i in range(3):
        db.update("region", {"r_name": f"GEN{i}"}) \
          .where("r_regionkey", "=", 0).execute()
        db.flush()
    assert len(os.listdir(tdir)) == 3
    removed = db.vacuum(keep=1)
    assert removed == 2 and len(os.listdir(tdir)) == 1
    # current state still readable after vacuum
    assert db.df("region").filter("r_regionkey = 0") \
             .collect()[0]["r_name"] == "GEN2"


def test_flush_without_warehouse_is_memory_only(spark, tmp_path_factory):
    from tostore_spark import ToStoreSpark
    db = ToStoreSpark(spark, data_dir=SF)
    db.update("region", {"r_name": "VOLATILE"}) \
      .where("r_regionkey", "=", 0).execute()
    assert db.flush() == []           # nothing became durable
    db2 = ToStoreSpark(spark, data_dir=SF)
    assert db2.df("region").filter("r_regionkey = 0") \
              .collect()[0]["r_name"] != "VOLATILE"


def test_manifest_is_atomic(spark, tmp_path_factory):
    db, wh = _fresh(spark, tmp_path_factory, "atomic")
    db.update("region", {"r_name": "XX"}) \
      .where("r_regionkey", "=", 0).execute()
    db.flush()
    assert os.path.exists(os.path.join(wh, "manifest.json"))
    assert not os.path.exists(os.path.join(wh, "manifest.json.tmp"))


def test_created_table_survives_flush_reopen(spark, tmp_path_factory):
    from tostore_spark import ToStoreSpark
    from tostore_spark.schema import (DataType, FieldSchema, PrimaryKeyConfig,
                                      TableSchema)
    db, wh = _fresh(spark, tmp_path_factory, "created")
    db.create_table(TableSchema(
        name="notes", primary_key=PrimaryKeyConfig(name="id"),
        fields=[FieldSchema(name="id", type=DataType.text),
                FieldSchema(name="body", type=DataType.text)]))
    db.insert("notes", {"id": "n1", "body": "remember"})
    db.flush()
    db2 = ToStoreSpark(spark, data_dir=SF, warehouse=wh)
    rows = db2.df("notes").collect()
    assert len(rows) == 1 and rows[0]["body"] == "remember"


def test_concurrent_flush_detected(spark, tmp_path_factory):
    """Two engines on one warehouse: the second flush fails with
    ConcurrentWriteError instead of silently clobbering the first."""
    from tostore_spark import ToStoreSpark
    from tostore_spark.store import ConcurrentWriteError
    wh = str(tmp_path_factory.mktemp("wh_cas"))
    a = ToStoreSpark(spark, data_dir=SF, warehouse=wh)
    b = ToStoreSpark(spark, data_dir=SF, warehouse=wh)
    a.update("region", {"r_name": "A"}).where("r_regionkey", "=", 0).execute()
    a.flush()
    b.update("region", {"r_name": "B"}).where("r_regionkey", "=", 0).execute()
    with pytest.raises(ConcurrentWriteError):
        b.flush()
    # a reopened engine sees A's state and can flush again
    c = ToStoreSpark(spark, data_dir=SF, warehouse=wh)
    assert c.df("region").filter("r_regionkey = 0") \
            .collect()[0]["r_name"] == "A"
    c.update("region", {"r_name": "C"}).where("r_regionkey", "=", 0).execute()
    c.flush()
    d = ToStoreSpark(spark, data_dir=SF, warehouse=wh)
    assert d.df("region").filter("r_regionkey = 0") \
            .collect()[0]["r_name"] == "C"


def test_time_travel_reads_old_versions(spark, tmp_path_factory):
    db, wh = _fresh(spark, tmp_path_factory, "tt")
    for i in range(3):
        db.update("region", {"r_name": f"V{i}"}) \
          .where("r_regionkey", "=", 0).execute()
        db.flush()
    vs = db.table_versions("region")
    assert len(vs) == 3 and vs == sorted(vs)
    assert db.df_at("region", vs[0]).filter("r_regionkey = 0") \
             .collect()[0]["r_name"] == "V0"
    assert db.df_at("region", vs[-1]).filter("r_regionkey = 0") \
             .collect()[0]["r_name"] == "V2"
    with pytest.raises(FileNotFoundError, match="available"):
        db.df_at("region", 9999)
    # vacuum keeps the newest `keep` and time travel degrades gracefully
    db.vacuum(keep=1)
    assert db.table_versions("region") == [vs[-1]]
