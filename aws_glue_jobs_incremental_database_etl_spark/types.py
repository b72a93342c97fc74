"""Hive/Glue-catalog type-string ↔ Spark type mapping.

The reference passes through Glue-catalog Hive type strings untouched
(schema = ``[{'Name','Type'}]`` dicts, ``jdbc_incremental.py:90-94,
104-109``); casting to those types is done by Glue's ApplyMapping
(``jdbc_incremental.py:199-203``).  Here we give those strings real
Spark types so ``apply_mapping`` can cast with Catalyst expressions.

Type universe per SURVEY.md §1.2: the Hive primitive set (no nested
types appear in the reference).  We additionally support
``array<T>``/``map<K,V>``/``struct<...>`` because the driver testdata
has an ``array<float>`` embedding column.
"""

from __future__ import annotations

import re

from pyspark.sql import types as T

_PRIMITIVES: dict[str, T.DataType] = {
    "tinyint": T.ByteType(),
    "smallint": T.ShortType(),
    "int": T.IntegerType(),
    "integer": T.IntegerType(),
    "bigint": T.LongType(),
    "long": T.LongType(),
    "float": T.FloatType(),
    "real": T.FloatType(),
    "double": T.DoubleType(),
    "string": T.StringType(),
    "boolean": T.BooleanType(),
    "date": T.DateType(),
    "timestamp": T.TimestampType(),
    # Hive 4 / Spark "timestamp without time zone"; parquet files with
    # isAdjustedToUTC=false infer as NTZ in Spark 4.
    "timestamp_ntz": T.TimestampNTZType(),
    "binary": T.BinaryType(),
}

_DECIMAL_RE = re.compile(r"^decimal\s*(?:\(\s*(\d+)\s*(?:,\s*(\d+)\s*)?\))?$")
_CHAR_RE = re.compile(r"^(?:var)?char\s*\(\s*\d+\s*\)$")
_ARRAY_RE = re.compile(r"^array\s*<(.+)>$")
_MAP_RE = re.compile(r"^map\s*<(.+)>$")


def _split_top_level(s: str) -> list[str]:
    """Split on commas not nested inside <...> brackets."""
    parts, depth, cur = [], 0, []
    for ch in s:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return [p.strip() for p in parts]


def hive_to_spark(type_str: str) -> T.DataType:
    """Parse a Hive/Glue type string into a Spark DataType."""
    s = type_str.strip().lower()
    if s in _PRIMITIVES:
        return _PRIMITIVES[s]
    m = _DECIMAL_RE.match(s)
    if m:
        p = int(m.group(1)) if m.group(1) else 10
        sc = int(m.group(2)) if m.group(2) else 0
        return T.DecimalType(p, sc)
    if _CHAR_RE.match(s):
        # char/varchar collapse to string outside the DDL boundary,
        # matching Spark's own read-path behavior.
        return T.StringType()
    m = _ARRAY_RE.match(s)
    if m:
        return T.ArrayType(hive_to_spark(m.group(1)))
    m = _MAP_RE.match(s)
    if m:
        k, v = _split_top_level(m.group(1))
        return T.MapType(hive_to_spark(k), hive_to_spark(v))
    if s.startswith("struct<") and s.endswith(">"):
        fields = []
        for part in _split_top_level(s[len("struct<") : -1]):
            name, _, ftype = part.partition(":")
            fields.append(T.StructField(name.strip(), hive_to_spark(ftype)))
        return T.StructType(fields)
    raise ValueError(f"unsupported catalog type string: {type_str!r}")


def spark_to_hive(dt: T.DataType) -> str:
    """Render a Spark DataType as a Hive/Glue catalog type string."""
    if isinstance(dt, T.ByteType):
        return "tinyint"
    if isinstance(dt, T.ShortType):
        return "smallint"
    if isinstance(dt, T.IntegerType):
        return "int"
    if isinstance(dt, T.LongType):
        return "bigint"
    if isinstance(dt, T.FloatType):
        return "float"
    if isinstance(dt, T.DoubleType):
        return "double"
    if isinstance(dt, T.DecimalType):
        return f"decimal({dt.precision},{dt.scale})"
    if isinstance(dt, T.StringType):
        return "string"
    if isinstance(dt, T.BooleanType):
        return "boolean"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, T.TimestampType):
        return "timestamp"
    if isinstance(dt, T.TimestampNTZType):
        return "timestamp_ntz"
    if isinstance(dt, T.BinaryType):
        return "binary"
    if isinstance(dt, T.ArrayType):
        return f"array<{spark_to_hive(dt.elementType)}>"
    if isinstance(dt, T.MapType):
        return f"map<{spark_to_hive(dt.keyType)},{spark_to_hive(dt.valueType)}>"
    if isinstance(dt, T.StructType):
        inner = ",".join(f"{f.name}:{spark_to_hive(f.dataType)}" for f in dt.fields)
        return f"struct<{inner}>"
    raise ValueError(f"unsupported Spark type: {dt!r}")


def schema_to_columns(schema: T.StructType) -> list[dict[str, str]]:
    """Spark schema → catalog column list ``[{'Name','Type'}]``.

    Mirrors the wire shape the reference passes around
    (``jdbc_incremental.py:90-94``).
    """
    return [{"Name": f.name, "Type": spark_to_hive(f.dataType)} for f in schema.fields]
