"""Schema migration, backup/restore, batch export, TTL, watch/stream."""

import time

import pytest

from tostore_spark.schema import (DataType, FieldSchema, PrimaryKeyConfig,
                                  PrimaryKeyType, TableSchema, TableTtlConfig)


def fresh(spark):
    from tostore_spark import ToStoreSpark

    return ToStoreSpark(spark)


def _mk_users(db, n=5):
    db.create_table(TableSchema(
        name="m_users",
        fields=[FieldSchema("name"), FieldSchema("age", DataType.integer)],
        primary_key=PrimaryKeyConfig(name="id", type=PrimaryKeyType.none)))
    db.batch_insert("m_users", [
        {"id": f"u{i}", "name": f"n{i}", "age": 20 + i} for i in range(n)])


def test_schema_migrations(spark):
    db = fresh(spark)
    _mk_users(db)
    status = (db.schema_builder("m_users")
              .add_field(FieldSchema("score", DataType.double, default_value=1.5))
              .rename_field("name", "full_name")
              .modify_field("age", type=DataType.double)
              .execute())
    assert status["status"] == "completed"
    rows = db.query("m_users").order_by_asc("id").run()
    assert rows[0]["score"] == 1.5
    assert rows[0]["full_name"] == "n0"
    assert isinstance(rows[0]["age"], float)
    db.schema_builder("m_users").remove_field("score").rename_table("m_users2").execute()
    assert "score" not in db.df("m_users2").columns
    assert "m_users2" in db.table_names()


def test_backup_restore(spark, tmp_path):
    db = fresh(spark)
    _mk_users(db, 4)
    bdir = str(tmp_path / "bk")
    db.backup(bdir)
    db2 = fresh(spark)
    restored = db2.restore(bdir)
    assert "m_users" in restored
    assert db2.query("m_users").count() == 4
    assert sorted(r["id"] for r in db2.query("m_users").run()) == \
        ["u0", "u1", "u2", "u3"]


def test_query_each_batch_resume(db):
    batches, tokens = [], []

    def on_batch(records, token):
        batches.append([r["c_custkey"] for r in records])
        tokens.append(token)
        return len(batches) < 2  # stop after two batches

    resume = db.query_each_batch("customer", batch_size=40, on_batch=on_batch,
                                 order_by=["c_custkey"])
    assert len(batches) == 2 and all(len(b) == 40 for b in batches)
    assert resume is not None
    # resume from checkpoint: next batch continues where we stopped
    more = []
    db.query_each_batch("customer", batch_size=40,
                        on_batch=lambda r, t: (more.append([x["c_custkey"] for x in r]), False)[1],
                        checkpoint_cursor=resume, order_by=["c_custkey"])
    flat = [x for b in batches + more[:1] for x in b]
    assert flat == sorted(set(flat))[: len(flat)]  # strictly increasing walk


def test_ttl_read_filter(spark):
    import datetime

    db = fresh(spark)
    sch = TableSchema(
        name="ttl_t",
        fields=[FieldSchema("v", DataType.integer),
                FieldSchema("created", DataType.datetime)],
        primary_key=PrimaryKeyConfig(name="id", type=PrimaryKeyType.none),
        ttl=TableTtlConfig(ttl_ms=60_000, source_field="created"))
    db.create_table(sch)
    now = datetime.datetime.now()
    old = now - datetime.timedelta(hours=1)
    db.batch_insert("ttl_t", [
        {"id": "fresh", "v": 1, "created": now},
        {"id": "stale", "v": 2, "created": old},
    ])
    ids = [r["id"] for r in db.query("ttl_t").run()]
    assert ids == ["fresh"]


def test_watch_reacts_to_writes(spark):
    db = fresh(spark)
    _mk_users(db, 2)
    snapshots = []
    db.query("m_users").order_by_asc("id").watch(
        lambda recs: snapshots.append([r["id"] for r in recs]))
    assert snapshots == [["u0", "u1"]]
    db.insert("m_users", {"id": "u9", "name": "x", "age": 1})
    assert snapshots[-1] == ["u0", "u1", "u9"]


def test_stream_query(db):
    n = 0
    for rec in (db.query("nation").where("n_regionkey", "=", 0)
                .order_by_asc("n_nationkey").stream()):
        assert "n_name" in rec
        n += 1
    assert n == db.query("nation").where("n_regionkey", "=", 0).count()
