"""HDK type-string → Spark type mapping.

The reference's type lattice lives in omniscidb/IR/Type.h:23-40 (kNull,
kBoolean, kInteger, kFloatingPoint, kDecimal, kVarChar, kText, kDate,
kTime, kTimestamp, kInterval, kFixedLenArray, kVarLenArray,
kExtDictionary, ...); pyhdk exposes them as short strings ("int64",
"fp64", "text", "dict", "date32", "timestamp[ms]", "dec(10,2)",
"array(int32)").  We accept that same string syntax and return Spark
``DataType``s (SURVEY.md §1.2 records the mapping decisions: Time →
seconds-since-midnight LongType; ns timestamps → µs TimestampType;
dictionary-encoded text → plain StringType, the dictionary being an
encoding detail Spark/Parquet own).
"""

from __future__ import annotations

import re

from pyspark.sql import types as T

_SIMPLE = {
    "null": T.NullType(),
    "bool": T.BooleanType(),
    "boolean": T.BooleanType(),
    "int8": T.ByteType(),
    "int16": T.ShortType(),
    "int32": T.IntegerType(),
    "int64": T.LongType(),
    "int": T.LongType(),
    "fp32": T.FloatType(),
    "float": T.FloatType(),
    "fp64": T.DoubleType(),
    "double": T.DoubleType(),
    "text": T.StringType(),
    "dict": T.StringType(),  # ExtDictionary(Text) — encoding detail
    "date": T.DateType(),
    "date16": T.DateType(),
    "date32": T.DateType(),
    "date64": T.DateType(),
    # No native time-of-day type in Spark: seconds since midnight.
    "time": T.LongType(),
    "time16": T.LongType(),
    "time32": T.LongType(),
    "time64": T.LongType(),
    "timestamp": T.TimestampType(),
}

_DECIMAL_RE = re.compile(r"^dec(?:imal)?\((\d+)\s*,\s*(\d+)\)$")
_VARCHAR_RE = re.compile(r"^varchar\((\d+)\)$")
_TIMESTAMP_RE = re.compile(r"^timestamp\[(s|ms|us|ns)\]$")
_ARRAY_RE = re.compile(r"^array\((.+)\)$")
_FIXED_ARRAY_RE = re.compile(r"^array\((.+)\)\[\d+\]$")


def to_spark_type(hdk_type: str | T.DataType) -> T.DataType:
    """Convert an HDK type string to the equivalent Spark ``DataType``."""
    if isinstance(hdk_type, T.DataType):
        return hdk_type
    s = hdk_type.strip().lower()
    nullable = True
    if s.endswith("?"):  # pyhdk nullability suffix
        s = s[:-1]
    del nullable  # nullability is carried by StructField, not DataType
    if s in _SIMPLE:
        return _SIMPLE[s]
    m = _DECIMAL_RE.match(s)
    if m:
        return T.DecimalType(int(m.group(1)), int(m.group(2)))
    m = _VARCHAR_RE.match(s)
    if m:
        return T.StringType()
    m = _TIMESTAMP_RE.match(s)
    if m:
        # Spark timestamps are µs; ns declared as µs (SURVEY §1.2).
        return T.TimestampType()
    m = _FIXED_ARRAY_RE.match(s) or _ARRAY_RE.match(s)
    if m:
        return T.ArrayType(to_spark_type(m.group(1)))
    raise ValueError(f"unsupported HDK type string: {hdk_type!r}")


def to_schema(columns: list[tuple[str, str | T.DataType]]) -> T.StructType:
    """Build a StructType from [(name, hdk_type_string), ...] pairs,
    mirroring the reference's createTable(name, [(col, type)...])
    (reference omniscidb/ArrowStorage/ArrowStorage.h:81)."""
    fields = []
    for name, typ in columns:
        nullable = True
        if isinstance(typ, str) and typ.strip().endswith("?"):
            nullable = True
        fields.append(T.StructField(name, to_spark_type(typ), nullable))
    return T.StructType(fields)
