"""Delta Lake export interop (plans/delta_export): the exported
directory must be a structurally valid Delta v0 commit AND its
documented no-library read-back path (plain parquet read of a fresh
export) must be hash-equal to ``engine.df(table)`` — including across
resolved deletion vectors and replace epochs, which external readers
cannot see through the store's own manifest."""
import json
import os

from pyspark.sql.types import StructType

from tostore_spark.engine import ToStoreSpark
from tostore_spark.schema import (DataType, FieldSchema, PrimaryKeyConfig,
                                  TableSchema)


def _mk(spark, wh, rows=30):
    db = ToStoreSpark(spark, warehouse=wh)
    db.create_table(TableSchema(
        name="notes", primary_key=PrimaryKeyConfig(name="id"),
        fields=[FieldSchema(name="body", type=DataType.text),
                FieldSchema(name="n", type=DataType.integer)]))
    db.batch_insert("notes", [
        {"id": f"k{i:03d}", "body": f"b{i}", "n": i} for i in range(rows)])
    db.flush()
    return db


def _collect_sorted(df):
    cols = sorted(df.columns)
    return sorted(map(tuple, df.select(*cols).collect()))


class TestDeltaExport:
    def test_export_resolves_vectors_and_reads_back(self, spark, tmp_path):
        wh, dest = str(tmp_path / "wh"), str(tmp_path / "dx")
        db = _mk(spark, wh)
        # leave a merge-on-read recipe behind: delete epoch + replace
        # epoch — exactly the states an external reader cannot resolve
        db.delete("notes").where("n", "<", 5).execute()
        db.flush()
        db.batch_upsert("notes", [{"id": "k010", "body": "EDIT"},
                                  {"id": "zz", "body": "NEW", "n": 99}])
        db.flush()
        report = db.export_delta("notes", dest, target_files=2)
        assert report["rows"] == 26 and report["files"] <= 2
        # documented fallback read-back: a fresh v0 export has every
        # listed file live, so a plain parquet read IS the snapshot
        back = spark.read.parquet(dest)
        assert _collect_sorted(back) == _collect_sorted(db.df("notes"))

    def test_log_is_a_valid_delta_v0_commit(self, spark, tmp_path):
        wh, dest = str(tmp_path / "wh"), str(tmp_path / "dx")
        db = _mk(spark, wh, rows=12)
        db.export_delta("notes", dest, target_files=1)
        log = os.path.join(dest, "_delta_log",
                           f"{0:020d}.json")
        assert os.path.exists(log)
        actions = [json.loads(line) for line in open(log)]
        protos = [a["protocol"] for a in actions if "protocol" in a]
        metas = [a["metaData"] for a in actions if "metaData" in a]
        adds = [a["add"] for a in actions if "add" in a]
        assert len(protos) == 1 and len(metas) == 1 and adds
        assert protos[0] == {"minReaderVersion": 1, "minWriterVersion": 2}
        # schemaString parses back as the exported Spark schema
        sch = StructType.fromJson(json.loads(metas[0]["schemaString"]))
        assert sch == db.df("notes").schema
        assert metas[0]["format"] == {"provider": "parquet",
                                      "options": {}}
        total = 0
        for add in adds:
            f = os.path.join(dest, add["path"])
            assert os.path.exists(f)
            assert add["size"] == os.path.getsize(f)
            assert add["dataChange"] is True
            stats = json.loads(add["stats"])
            total += stats["numRecords"]
            # per-file stats bound the integer column
            assert stats["minValues"]["n"] >= 0
            assert stats["maxValues"]["n"] <= 11
        assert total == 12
        # every data file in the directory is accounted for in the log
        listed = {a["path"] for a in adds}
        on_disk = {f for f in os.listdir(dest) if f.endswith(".parquet")}
        assert listed == on_disk

    def test_overwrite_semantics(self, spark, tmp_path):
        import pytest
        wh, dest = str(tmp_path / "wh"), str(tmp_path / "dx")
        db = _mk(spark, wh, rows=5)
        db.export_delta("notes", dest)
        with pytest.raises(ValueError):
            db.export_delta("notes", dest)
        db.batch_insert("notes", [{"id": "p1", "body": "x", "n": 50}])
        db.flush()
        rep = db.export_delta("notes", dest, mode="overwrite",
                              target_files=1)
        assert rep["rows"] == 6
        assert spark.read.parquet(dest).count() == 6
