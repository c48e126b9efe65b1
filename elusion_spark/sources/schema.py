"""Predefined-schema surface: ``FileSchema`` / ``SchemaBuilder`` fluent
builder and the JSON schema spec.

Parity: features/with_schema.rs:14-71 (builder), :338-392
(``schema_from_json`` — type-name table reproduced below; unsigned Arrow
ints map to the next-wider signed Spark type since Spark has no unsigned
integers)."""

from __future__ import annotations

import json

from pyspark.sql import types as T

# with_schema.rs:367-386 type-name table → Spark types
_TYPE_MAP: dict[str, T.DataType] = {
    "int64": T.LongType(), "i64": T.LongType(),
    "int32": T.IntegerType(), "i32": T.IntegerType(),
    "int16": T.ShortType(), "i16": T.ShortType(),
    "int8": T.ByteType(), "i8": T.ByteType(),
    # unsigned → next-wider signed (Spark has no unsigned ints)
    "uint64": T.DecimalType(20, 0), "u64": T.DecimalType(20, 0),
    "uint32": T.LongType(), "u32": T.LongType(),
    "uint16": T.IntegerType(), "u16": T.IntegerType(),
    "uint8": T.ShortType(), "u8": T.ShortType(),
    "float64": T.DoubleType(), "f64": T.DoubleType(), "double": T.DoubleType(),
    "float32": T.FloatType(), "f32": T.FloatType(), "float": T.FloatType(),
    "string": T.StringType(), "text": T.StringType(), "varchar": T.StringType(),
    "bool": T.BooleanType(), "boolean": T.BooleanType(),
    "date": T.DateType(), "date32": T.DateType(),
    "timestamp": T.TimestampType(),
    "binary": T.BinaryType(),
}


def _resolve_type(name) -> T.DataType:
    if isinstance(name, T.DataType):
        return name
    key = str(name).strip().lower()
    if key not in _TYPE_MAP:
        raise ValueError(
            f"Unsupported data type: {name!r} "
            f"(with_schema.rs:383-385; supported: {sorted(_TYPE_MAP)})"
        )
    return _TYPE_MAP[key]


class FileSchema:
    """Wraps a Spark StructType (the reference wraps an Arrow SchemaRef)."""

    def __init__(self, struct: T.StructType):
        self.struct = struct

    @classmethod
    def new(cls, fields: list[tuple]) -> "FileSchema":
        """fields: [(name, type, nullable?), …]; type is a name from the
        spec table or a Spark DataType."""
        sf = [
            T.StructField(f[0], _resolve_type(f[1]),
                          f[2] if len(f) > 2 else True)
            for f in fields
        ]
        return cls(T.StructType(sf))

    @classmethod
    def builder(cls) -> "SchemaBuilder":
        return SchemaBuilder()

    def schema_ref(self) -> T.StructType:
        return self.struct


class SchemaBuilder:
    """Fluent builder (with_schema.rs:20-44):
    ``SchemaBuilder().field("id", "int64", False).field(...).build()``."""

    def __init__(self):
        self._fields: list[T.StructField] = []

    def field(self, name: str, data_type, nullable: bool = True) -> "SchemaBuilder":
        self._fields.append(T.StructField(name, _resolve_type(data_type), nullable))
        return self

    def build(self) -> FileSchema:
        return FileSchema(T.StructType(self._fields))


def schema_from_json(json_spec: str) -> FileSchema:
    """JSON spec ``{"fields": [{"name": …, "type": …, "nullable": …}]}``
    (with_schema.rs:338-392)."""
    try:
        parsed = json.loads(json_spec)
    except json.JSONDecodeError as e:
        raise ValueError(f"Invalid JSON schema specification: {e}")
    fields = parsed.get("fields")
    if not isinstance(fields, list):
        raise ValueError("Schema must contain 'fields' array")
    out = []
    for spec in fields:
        if "name" not in spec:
            raise ValueError("Field must have 'name'")
        if "type" not in spec:
            raise ValueError("Field must have 'type'")
        out.append(
            T.StructField(
                spec["name"],
                _resolve_type(spec["type"]),
                bool(spec.get("nullable", True)),
            )
        )
    return FileSchema(T.StructType(out))
