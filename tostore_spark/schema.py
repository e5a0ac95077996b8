"""Schema system: tostore's declared-schema model mapped onto Spark types.

Reference surface (all cites into /root/reference):
- ``DataType`` enum            lib/src/model/table_schema.dart:1888-1899
- ``FieldSchema``              lib/src/model/table_schema.dart:1177-1216
- ``PrimaryKeyConfig``         lib/src/model/table_schema.dart:1917-1999
- ``IndexSchema``              lib/src/model/table_schema.dart:1704-1727
- ``ForeignKeySchema``         lib/src/model/table_schema.dart:2756-2885
- ``TableTtlConfig``           lib/src/model/table_schema.dart:1804-1885
- implicit indexes             lib/src/model/table_schema.dart:79-195

Spark has no constraint engine, so nullable/unique/min/max/FK are carried as
catalog metadata and enforced by validation transforms at write time
(see write.py).  Index metadata is inert (Parquet row-group stats + partition
pruning replace B+trees) but still drives upsert key choice and FK auto-joins.
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass, field as dc_field
from enum import Enum
from typing import Any, Optional

from pyspark.sql import types as T


class DataType(str, Enum):
    integer = "integer"
    bigInt = "bigInt"
    double = "double"
    text = "text"
    blob = "blob"
    boolean = "boolean"
    datetime = "datetime"
    array = "array"
    vector = "vector"
    json = "json"


_SPARK_TYPE: dict[DataType, T.DataType] = {
    DataType.integer: T.LongType(),
    DataType.bigInt: T.DecimalType(38, 0),
    DataType.double: T.DoubleType(),
    DataType.text: T.StringType(),
    DataType.blob: T.BinaryType(),
    DataType.boolean: T.BooleanType(),
    DataType.datetime: T.TimestampType(),
    DataType.array: T.ArrayType(T.StringType()),
    DataType.vector: T.ArrayType(T.FloatType()),
    DataType.json: T.StringType(),
}


def spark_type_for(dt: DataType) -> T.DataType:
    return _SPARK_TYPE[dt]


def datatype_for_spark(st: T.DataType) -> DataType:
    """Best-effort reverse mapping used when adopting an existing DataFrame."""
    if isinstance(st, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return DataType.integer
    if isinstance(st, T.DecimalType):
        return DataType.bigInt
    if isinstance(st, (T.FloatType, T.DoubleType)):
        return DataType.double
    if isinstance(st, T.BooleanType):
        return DataType.boolean
    if isinstance(st, (T.TimestampType, T.DateType)):
        return DataType.datetime
    if isinstance(st, T.BinaryType):
        return DataType.blob
    if isinstance(st, T.ArrayType):
        if isinstance(st.elementType, (T.FloatType, T.DoubleType)):
            return DataType.vector
        return DataType.array
    return DataType.text


class DefaultValueType(str, Enum):
    # table_schema.dart:1908-1914
    none = "none"
    currentTimestamp = "currentTimestamp"


class PrimaryKeyType(str, Enum):
    # table_schema.dart:1917-1932
    none = "none"
    sequential = "sequential"
    timestampBased = "timestampBased"
    datePrefixed = "datePrefixed"
    shortCode = "shortCode"


@dataclass
class VectorFieldConfig:
    # table_schema.dart:2406-2498
    dimensions: int = 0
    precision: str = "float32"


@dataclass
class FieldSchema:
    name: str
    type: DataType = DataType.text
    nullable: bool = True
    default_value: Any = None
    unique: bool = False
    create_index: bool = False
    max_length: Optional[int] = None
    min_length: Optional[int] = None
    min_value: Optional[float] = None
    max_value: Optional[float] = None
    comment: Optional[str] = None
    default_value_type: DefaultValueType = DefaultValueType.none
    vector_config: Optional[VectorFieldConfig] = None
    #: at-rest encryption (tostore_spark.at_rest): stored ciphertext
    #: between the engine boundaries; text fields only, and never a
    #: key/index/TTL/partition column (validated at create_table)
    encrypted: bool = False

    def to_struct_field(self) -> T.StructField:
        return T.StructField(self.name, spark_type_for(self.type), self.nullable)


@dataclass
class SequentialIdConfig:
    # table_schema.dart:1935-1949
    initial_value: int = 1
    increment: int = 1
    use_random_increment: bool = False


@dataclass
class PrimaryKeyConfig:
    """PKs are always strings in the reference regardless of generation
    strategy (table_schema.dart:2033-2052); we keep that contract."""

    name: str = "id"
    type: PrimaryKeyType = PrimaryKeyType.none
    sequential_config: SequentialIdConfig = dc_field(default_factory=SequentialIdConfig)

    def data_type(self) -> DataType:
        return DataType.text


class IndexType(str, Enum):
    btree = "btree"
    vector = "vector"


@dataclass
class IndexSchema:
    fields: list[str]
    index_name: Optional[str] = None
    unique: bool = False
    type: IndexType = IndexType.btree
    vector_config: Optional[dict] = None

    @property
    def actual_name(self) -> str:
        # table_schema.dart:1704-1727: uniq_/idx_ + name-or-joined-fields
        base = self.index_name or "_".join(self.fields)
        return ("uniq_" if self.unique else "idx_") + base


class ForeignKeyAction(str, Enum):
    restrict = "restrict"
    cascade = "cascade"
    setNull = "setNull"
    setDefault = "setDefault"
    noAction = "noAction"


@dataclass
class ForeignKeySchema:
    fields: list[str]
    referenced_table: str
    referenced_fields: list[str]
    on_delete: ForeignKeyAction = ForeignKeyAction.restrict
    on_update: ForeignKeyAction = ForeignKeyAction.restrict
    name: Optional[str] = None


@dataclass
class TableTtlConfig:
    # table_schema.dart:1804-1885; default source = internal ingest timestamp
    ttl_ms: int = 0
    source_field: Optional[str] = None


@dataclass
class TableSchema:
    name: str
    fields: list[FieldSchema] = dc_field(default_factory=list)
    primary_key: Optional[PrimaryKeyConfig] = None
    indexes: list[IndexSchema] = dc_field(default_factory=list)
    foreign_keys: list[ForeignKeySchema] = dc_field(default_factory=list)
    ttl: Optional[TableTtlConfig] = None
    is_global: bool = False

    def field(self, name: str) -> Optional[FieldSchema]:
        for f in self.fields:
            if f.name == name:
                return f
        return None

    def field_names(self) -> list[str]:
        names = []
        if self.primary_key is not None:
            names.append(self.primary_key.name)
        names.extend(f.name for f in self.fields if f.name not in names)
        return names

    def to_struct_type(self) -> T.StructType:
        cols: list[T.StructField] = []
        if self.primary_key is not None:
            cols.append(T.StructField(self.primary_key.name, T.StringType(), False))
        for f in self.fields:
            if self.primary_key is not None and f.name == self.primary_key.name:
                continue
            cols.append(f.to_struct_field())
        return T.StructType(cols)

    def all_indexes(self) -> list[IndexSchema]:
        """Declared + implicit indexes (table_schema.dart:79-195): unique
        fields, createIndex fields, TTL source field, FK fields."""
        out = list(self.indexes)
        covered = {tuple(ix.fields) for ix in out}

        def add(fields: list[str], unique: bool) -> None:
            key = tuple(fields)
            if key not in covered:
                covered.add(key)
                out.append(IndexSchema(fields=fields, unique=unique))

        for f in self.fields:
            if f.unique:
                add([f.name], True)
            elif f.create_index:
                add([f.name], False)
        if self.ttl is not None and self.ttl.source_field:
            add([self.ttl.source_field], False)
        for fk in self.foreign_keys:
            add(list(fk.fields), False)
        return out

    def unique_key_sets(self) -> list[list[str]]:
        """Candidate keys for upsert matching: PK first, then unique indexes."""
        out: list[list[str]] = []
        if self.primary_key is not None:
            out.append([self.primary_key.name])
        for ix in self.all_indexes():
            if ix.unique:
                out.append(list(ix.fields))
        return out

    @staticmethod
    def from_struct_type(name: str, st: T.StructType, **kw) -> "TableSchema":
        fields = [
            FieldSchema(name=f.name, type=datatype_for_spark(f.dataType), nullable=f.nullable)
            for f in st.fields
        ]
        return TableSchema(name=name, fields=fields, **kw)


def coerce_to_type(value: Any, dt: DataType) -> Any:
    """Coerce a Python condition value to a field's schema type, mirroring
    ``QueryCondition.normalize`` (query_condition.dart:743-835) and the loose
    numeric-string coercion in value_matcher.dart:151-173 (``1 == "1"``).

    Returns the original value unchanged when coercion is impossible — the
    matcher then compares raw (and typically misses), same as the reference.
    """
    if value is None:
        return None
    try:
        if dt == DataType.integer or dt == DataType.bigInt:
            if isinstance(value, bool):
                return int(value)
            if isinstance(value, int):
                return value
            if isinstance(value, float):
                return int(value) if value.is_integer() else value
            if isinstance(value, str):
                s = value.strip()
                try:
                    return int(s)
                except ValueError:
                    return float(s)
        elif dt == DataType.double:
            if isinstance(value, bool):
                return float(value)
            if isinstance(value, (int, float)):
                return float(value)
            if isinstance(value, str):
                return float(value.strip())
        elif dt == DataType.text or dt == DataType.json:
            if isinstance(value, bool):
                return "true" if value else "false"
            if not isinstance(value, str):
                return str(value)
        elif dt == DataType.boolean:
            if isinstance(value, bool):
                return value
            if isinstance(value, str):
                if value.lower() == "true":
                    return True
                if value.lower() == "false":
                    return False
            if isinstance(value, (int, float)):
                return bool(value)
        elif dt == DataType.datetime:
            if isinstance(value, (_dt.datetime, _dt.date)):
                return value
            if isinstance(value, str):
                return _dt.datetime.fromisoformat(value)
    except (ValueError, TypeError):
        return value
    return value
