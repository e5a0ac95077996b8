"""Iceberg partition-transform pruning (plans/iceberg_transforms):
the spec's Murmur3-x86-32 bucket hash byte-pinned against the
PUBLISHED Appendix-B test vectors, transform semantics, the leaf
soundness rules, and end-to-end manifest-level pruning of a foreign
bucket-partitioned and a day-partitioned table."""
import datetime
import json
import os
import struct

import pytest

from tostore_spark.condition import to_condition_node
from tostore_spark.plans.avro_io import write_container_file
from tostore_spark.plans.iceberg import read_iceberg
from tostore_spark.plans.iceberg_transforms import (leaf_keeps,
                                                    murmur3_32,
                                                    parse_transform,
                                                    transform_value)


class TestSpecHashVectors:
    """Iceberg spec Appendix B publishes these exact values — they pin
    the hash (and therefore every bucket assignment) to the spec."""

    def test_long_34(self):
        assert murmur3_32(struct.pack("<q", 34)) == 2017239379

    def test_string_iceberg(self):
        assert murmur3_32(b"iceberg") == 1210000089

    def test_date_2017_11_16(self):
        days = (datetime.date(2017, 11, 16)
                - datetime.date(1970, 1, 1)).days
        assert days == 17486
        assert murmur3_32(struct.pack("<q", days)) == -653330422

    def test_timestamp_2017_11_16T22_31_08(self):
        us = 1510871468000000
        assert murmur3_32(struct.pack("<q", us)) == -2047944441


class TestTransformSemantics:
    def test_parse(self):
        assert parse_transform("bucket[16]") == ("bucket", 16)
        assert parse_transform("truncate[10]") == ("truncate", 10)
        assert parse_transform("day") == ("day", None)
        assert parse_transform("void") is None
        assert parse_transform("bucket[0]") is None
        assert parse_transform("zorder[4]") is None

    def test_bucket(self):
        # int and long hash identically (both widen to 8-byte LE)
        assert transform_value("bucket", 16, "int", 34) == \
            transform_value("bucket", 16, "long", 34) == \
            (2017239379 & 0x7FFFFFFF) % 16
        assert transform_value("bucket", 8, "string", "iceberg") == \
            (1210000089 & 0x7FFFFFFF) % 8
        assert transform_value("bucket", 4, "date",
                               datetime.date(2017, 11, 16)) == \
            ((-653330422) & 0x7FFFFFFF) % 4
        assert transform_value("bucket", 4, "decimal(9, 2)", 1) is None
        assert transform_value("bucket", 4, "int", True) is None

    def test_truncate_floor_semantics(self):
        assert transform_value("truncate", 10, "int", 1) == 0
        assert transform_value("truncate", 10, "int", -1) == -10
        assert transform_value("truncate", 3, "string", "iceberg") \
            == "ice"
        assert transform_value("truncate", 10, "string", "ab") == "ab"

    def test_temporal_ordinals(self):
        d = datetime.date(2017, 11, 16)
        assert transform_value("year", None, "date", d) == 47
        assert transform_value("month", None, "date", d) == 574
        assert transform_value("day", None, "date", d) == 17486
        ts = datetime.datetime(2017, 11, 16, 22, 31, 8)
        assert transform_value("hour", None, "timestamptz", ts) == \
            1510871468000000 // 3_600_000_000
        # pre-epoch floors correctly
        assert transform_value("year", None, "date",
                               datetime.date(1969, 12, 31)) == -1
        # ISO strings parse; garbage stays conservative
        assert transform_value("day", None, "date", "2017-11-16") \
            == 17486
        assert transform_value("day", None, "date", "not-a-date") is None


class TestLeafSoundness:
    B = ("bucket", 4, "long")
    D = ("day", None, "date")

    def test_bucket_equality(self):
        b34 = transform_value("bucket", 4, "long", 34)
        assert leaf_keeps(*self.B, b34, "=", 34)
        assert not leaf_keeps(*self.B, (b34 + 1) % 4, "=", 34)
        # bucket never refutes ranges (not monotone)
        assert leaf_keeps(*self.B, 0, ">", 34)
        assert leaf_keeps(*self.B, 0, "BETWEEN",
                          {"start": 1, "end": 2})

    def test_in_list(self):
        vals = [34, 35, 36]
        buckets = {transform_value("bucket", 4, "long", v)
                   for v in vals}
        missing = next(b for b in range(4) if b not in buckets) \
            if len(buckets) < 4 else None
        assert leaf_keeps(*self.B,
                          transform_value("bucket", 4, "long", 35),
                          "IN", vals)
        if missing is not None:
            assert not leaf_keeps(*self.B, missing, "IN", vals)
        assert not leaf_keeps(*self.B, 0, "IN", [])

    def test_monotone_ranges(self):
        d17486 = datetime.date(2017, 11, 16)
        assert not leaf_keeps(*self.D, 17485, ">", d17486)
        assert leaf_keeps(*self.D, 17486, ">", d17486)   # same day may
        assert not leaf_keeps(*self.D, 17487, "<", d17486)
        assert leaf_keeps(*self.D, 17486, "<", d17486)
        assert not leaf_keeps(
            *self.D, 17490, "BETWEEN",
            {"start": datetime.date(2017, 11, 10), "end": d17486})

    def test_null_recorded(self):
        assert not leaf_keeps(*self.B, None, "=", 34)
        assert leaf_keeps(*self.B, None, "=", None)
        assert not leaf_keeps(*self.D, None, ">",
                              datetime.date(2020, 1, 1))
        assert not leaf_keeps(*self.B, None, "IN", [1, 2])

    def test_negations_never_refute(self):
        assert leaf_keeps(*self.B, 0, "!=", 34)
        assert leaf_keeps(*self.B, 0, "NOT IN", [34])
        assert leaf_keeps(*self.B, 0, "IS NOT", None)


# ------------------------------------------------------ end-to-end

def _pa_field(name, typ, fid):
    import pyarrow as pa
    return pa.field(name, typ, metadata={b"PARQUET:field_id":
                                         str(fid).encode()})


def _foreign_table(tmp_path, files, part_avro_type, schema_json,
                   spec_fields, part_key):
    """Assemble a minimal foreign v2 table: ``files`` is
    [(name, pa_table, partition_value)]."""
    import copy

    import pyarrow.parquet as pq

    from tostore_spark.plans.iceberg import (_MANIFEST_ENTRY_SCHEMA,
                                             _MANIFEST_LIST_SCHEMA)
    loc = str(tmp_path / "ft")
    ddir, mdir = os.path.join(loc, "data"), os.path.join(loc, "metadata")
    os.makedirs(ddir)
    os.makedirs(mdir)
    mes = copy.deepcopy(_MANIFEST_ENTRY_SCHEMA)
    part_field = next(f for f in mes["fields"][4]["type"]["fields"]
                      if f["name"] == "partition")
    part_field["type"]["fields"] = [
        {"name": part_key, "type": ["null", part_avro_type],
         "field-id": 1000, "default": None}]
    entries = []
    for name, table, pv in files:
        fp = os.path.join(ddir, name)
        pq.write_table(table, fp)
        entries.append({
            "status": 1, "snapshot_id": 7, "sequence_number": 1,
            "file_sequence_number": 1,
            "data_file": {"content": 0, "file_path": fp,
                          "file_format": "PARQUET",
                          "partition": {part_key: pv},
                          "record_count": table.num_rows,
                          "file_size_in_bytes": os.path.getsize(fp),
                          "value_counts": None,
                          "null_value_counts": None,
                          "lower_bounds": None, "upper_bounds": None,
                          "equality_ids": None}})
    mp = os.path.join(mdir, "m0.avro")
    write_container_file(
        mp, mes, entries,
        meta={"schema": json.dumps(schema_json),
              "partition-spec": json.dumps(spec_fields),
              "partition-spec-id": "0", "format-version": "2",
              "content": "data"})
    ml = os.path.join(mdir, "snap-7.avro")
    write_container_file(ml, _MANIFEST_LIST_SCHEMA, [{
        "manifest_path": mp, "manifest_length": os.path.getsize(mp),
        "partition_spec_id": 0, "content": 0, "sequence_number": 1,
        "min_sequence_number": 1, "added_snapshot_id": 7,
        "added_files_count": len(entries), "existing_files_count": 0,
        "deleted_files_count": 0,
        "added_rows_count": sum(t.num_rows for _, t, _ in files),
        "existing_rows_count": 0, "deleted_rows_count": 0,
        "key_metadata": None}], meta={"format-version": "2"})
    meta = {"format-version": 2, "location": loc,
            "last-sequence-number": 1, "current-schema-id": 0,
            "schemas": [schema_json], "default-spec-id": 0,
            "partition-specs": [{"spec-id": 0, "fields": spec_fields}],
            "current-snapshot-id": 7,
            "snapshots": [{"snapshot-id": 7, "sequence-number": 1,
                           "timestamp-ms": 1000,
                           "summary": {"operation": "append"},
                           "manifest-list": ml, "schema-id": 0}]}
    with open(os.path.join(mdir, "v1.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    with open(os.path.join(mdir, "version-hint.text"), "w") as fh:
        fh.write("1")
    return loc


def test_bucket_partition_pruning_end_to_end(spark, tmp_path):
    import pyarrow as pa
    dschema = pa.schema([_pa_field("id", pa.int64(), 1)])
    by_bucket = {}
    for v in range(1, 60):
        by_bucket.setdefault(
            transform_value("bucket", 4, "long", v), []).append(v)
    assert len(by_bucket) == 4
    files = [(f"b{b}.parquet",
              pa.table({"id": ids}, schema=dschema), b)
             for b, ids in sorted(by_bucket.items())]
    schema_json = {"type": "struct", "schema-id": 0, "fields": [
        {"id": 1, "name": "id", "required": False, "type": "long"}]}
    spec = [{"name": "id_bucket", "transform": "bucket[4]",
             "source-id": 1, "field-id": 1000}]
    loc = _foreign_table(tmp_path, files, "int", schema_json, spec,
                         "id_bucket")
    assert read_iceberg(spark, loc).count() == 59
    probe = 34
    want_bucket = transform_value("bucket", 4, "long", probe)
    out = read_iceberg(spark, loc, where={"id": probe})
    assert [r["id"] for r in out.collect()] == [probe]
    scanned = out.inputFiles()
    assert len(scanned) == 1 and f"b{want_bucket}.parquet" in scanned[0]
    # IN across two buckets keeps exactly those two files
    vals = [34, 35]
    keep = {transform_value("bucket", 4, "long", v) for v in vals}
    out = read_iceberg(spark, loc, where={"id": {"IN": vals}})
    assert sorted(r["id"] for r in out.collect()) == vals
    assert len(out.inputFiles()) == len(keep)
    # a range predicate cannot use buckets: all files scanned, rows exact
    out = read_iceberg(spark, loc, where={"id": {"<": 5}})
    assert sorted(r["id"] for r in out.collect()) == [1, 2, 3, 4]
    assert len(out.inputFiles()) == 4


def test_day_partition_range_pruning_end_to_end(spark, tmp_path):
    import pyarrow as pa
    dschema = pa.schema([_pa_field("d", pa.date32(), 1),
                         _pa_field("n", pa.int64(), 2)])
    d0 = datetime.date(2024, 1, 1)
    days = [(d0 + datetime.timedelta(days=k)) for k in range(3)]
    files = []
    for i, d in enumerate(days):
        t = pa.table({"d": [d, d], "n": [i * 2, i * 2 + 1]},
                     schema=dschema)
        files.append((f"d{i}.parquet", t,
                      (d - datetime.date(1970, 1, 1)).days))
    schema_json = {"type": "struct", "schema-id": 0, "fields": [
        {"id": 1, "name": "d", "required": False, "type": "date"},
        {"id": 2, "name": "n", "required": False, "type": "long"}]}
    spec = [{"name": "d_day", "transform": "day",
             "source-id": 1, "field-id": 1000}]
    loc = _foreign_table(tmp_path, files, "int", schema_json, spec,
                         "d_day")
    out = read_iceberg(spark, loc, where={"d": {">=": days[2]}})
    assert sorted(r["n"] for r in out.collect()) == [4, 5]
    assert len(out.inputFiles()) == 1
    out = read_iceberg(spark, loc, where={
        "d": {"BETWEEN": {"start": days[0], "end": days[1]}}})
    assert sorted(r["n"] for r in out.collect()) == [0, 1, 2, 3]
    assert len(out.inputFiles()) == 2
    out = read_iceberg(spark, loc, where={"d": days[1]})
    assert sorted(r["n"] for r in out.collect()) == [2, 3]
    assert len(out.inputFiles()) == 1
