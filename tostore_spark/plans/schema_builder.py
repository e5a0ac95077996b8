"""Schema evolution: chained migration operations.

Reference: ``SchemaBuilder`` — add/remove/rename/modify field, add/remove
index, rename table, set PK config, set TTL, add/remove/modify FK
(lib/src/chain/schema_builder.dart:16-258), executed asynchronously by
migration_manager.dart with task polling (lib/tostore.dart:1098-1124).

Spark-first: each migration compiles to a DataFrame transform (select with
cast/rename/default-fill) plus a catalog-metadata update; execution is
synchronous (a Spark job), the async task-status surface is preserved as a
completed-status record for API parity.
"""

from __future__ import annotations

from typing import Any, Optional

from pyspark.sql import functions as F

from tostore_spark.schema import (DataType, FieldSchema, ForeignKeySchema,
                                  IndexSchema, PrimaryKeyConfig,
                                  TableTtlConfig, spark_type_for)


class SchemaBuilder:
    def __init__(self, engine, table: str):
        self._engine = engine
        self._table = table
        self._ops: list[tuple] = []

    # ---- chained ops (schema_builder.dart:16-258) ---------------------
    def add_field(self, field: FieldSchema) -> "SchemaBuilder":
        self._ops.append(("add_field", field))
        return self

    def remove_field(self, name: str) -> "SchemaBuilder":
        self._ops.append(("remove_field", name))
        return self

    def rename_field(self, old: str, new: str) -> "SchemaBuilder":
        self._ops.append(("rename_field", old, new))
        return self

    def modify_field(self, name: str, type: Optional[DataType] = None,
                     nullable: Optional[bool] = None,
                     default_value: Any = None) -> "SchemaBuilder":
        self._ops.append(("modify_field", name, type, nullable, default_value))
        return self

    def add_index(self, index: IndexSchema) -> "SchemaBuilder":
        self._ops.append(("add_index", index))
        return self

    def remove_index(self, actual_name: str) -> "SchemaBuilder":
        self._ops.append(("remove_index", actual_name))
        return self

    def rename_table(self, new_name: str) -> "SchemaBuilder":
        self._ops.append(("rename_table", new_name))
        return self

    def set_primary_key_config(self, pk: PrimaryKeyConfig) -> "SchemaBuilder":
        self._ops.append(("set_pk", pk))
        return self

    def set_ttl(self, ttl: Optional[TableTtlConfig]) -> "SchemaBuilder":
        self._ops.append(("set_ttl", ttl))
        return self

    def add_foreign_key(self, fk: ForeignKeySchema) -> "SchemaBuilder":
        self._ops.append(("add_fk", fk))
        return self

    def remove_foreign_key(self, referenced_table: str) -> "SchemaBuilder":
        self._ops.append(("remove_fk", referenced_table))
        return self

    # ---- execution ----------------------------------------------------
    def execute(self) -> dict:
        """Apply all ops; returns a migration-task status record registered
        with the engine so queryMigrationTaskStatus can poll it
        (API parity with the async surface, tostore.dart:1098-1124)."""
        applied = []
        for op in self._ops:
            self._apply(op)
            applied.append(op[0])
        record = {"table": self._table, "status": "completed", "ops": applied}
        self._engine._register_migration(record)
        return record

    def _apply(self, op: tuple) -> None:
        engine, table = self._engine, self._table
        sch = engine.schema(table)
        df = engine.df(table)
        kind = op[0]

        if kind == "add_field":
            field: FieldSchema = op[1]
            default = F.lit(field.default_value).cast(spark_type_for(field.type))
            engine.set_df(table, df.withColumn(field.name, default))
            sch.fields.append(field)
        elif kind == "remove_field":
            name = op[1]
            engine.set_df(table, df.drop(name))
            sch.fields = [f for f in sch.fields if f.name != name]
        elif kind == "rename_field":
            old, new = op[1], op[2]
            engine.set_df(table, df.withColumnRenamed(old, new))
            for f in sch.fields:
                if f.name == old:
                    f.name = new
        elif kind == "modify_field":
            name, new_type, nullable, default = op[1], op[2], op[3], op[4]
            fs = sch.field(name)
            if fs is None:
                raise ValueError(f"unknown field {name}")
            out = df
            if new_type is not None and new_type != fs.type:
                out = out.withColumn(name, F.col(name).cast(spark_type_for(new_type)))
                fs.type = new_type
            if default is not None:
                out = out.withColumn(name, F.coalesce(F.col(name),
                                                      F.lit(default).cast(spark_type_for(fs.type))))
                fs.default_value = default
            if nullable is not None:
                fs.nullable = nullable
            engine.set_df(table, out)
        elif kind == "add_index":
            sch.indexes.append(op[1])
        elif kind == "remove_index":
            sch.indexes = [ix for ix in sch.indexes if ix.actual_name != op[1]]
        elif kind == "rename_table":
            new_name = op[1]
            key = engine._resolve(table)
            ent = engine._tables.pop(key)
            ent["schema"].name = new_name
            engine._tables[(key[0], new_name)] = ent
            self._table = new_name
        elif kind == "set_pk":
            sch.primary_key = op[1]
        elif kind == "set_ttl":
            sch.ttl = op[1]
        elif kind == "add_fk":
            sch.foreign_keys.append(op[1])
        elif kind == "remove_fk":
            sch.foreign_keys = [fk for fk in sch.foreign_keys
                                if fk.referenced_table != op[1]]
        else:
            raise ValueError(f"unknown migration op {kind}")
