"""DynamoDB attribute-value codec (SURVEY.md §2 B3, §1.1).

The PITR export the reference's grant produces
(``dynamodb:ExportTableToPointInTime``, reference ts:135) is
newline-delimited JSON of ``{"Item": {attr: {TYPE: value}}}`` with the
ten-type attribute-value model: S, N (arbitrary-precision number as
string), B (base64 binary), BOOL, NULL, M (map), L (heterogeneous
list), SS/NS/BS (sets).

Decode strategy (all JVM-side: from_json + struct field access):
* scalars land as typed columns (N -> DECIMAL(38,18) by default,
  exact — DynamoDB numbers exceed double; SURVEY §7 risk register)
* sets land as deduplicated arrays (set invariant via array_distinct)
* deep M/L stay JSON strings (no stable StructType for heterogeneous
  content — SURVEY §7), query-able via get_json_object (D47)
"""

from __future__ import annotations

import base64
import json
from decimal import Decimal
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: decode target kinds supported per attribute
KINDS = (
    "string",
    "number",       # exact DECIMAL(38,18)
    "number_double",
    "boolean",
    "binary",
    "string_set",
    "number_set",
    "binary_set",
    "map_json",     # M kept as JSON string
    "list_json",    # L kept as JSON string
)


def attribute_value_schema(depth: int = 3) -> T.StructType:
    """Recursive schema of one attribute value, to ``depth`` levels of
    M/L nesting (beyond that, from_json yields null and the column
    should stay JSON via map_json/list_json)."""
    fields = [
        T.StructField("S", T.StringType()),
        T.StructField("N", T.StringType()),
        T.StructField("B", T.StringType()),
        T.StructField("BOOL", T.BooleanType()),
        T.StructField("NULL", T.BooleanType()),
        T.StructField("SS", T.ArrayType(T.StringType())),
        T.StructField("NS", T.ArrayType(T.StringType())),
        T.StructField("BS", T.ArrayType(T.StringType())),
    ]
    if depth > 0:
        inner = attribute_value_schema(depth - 1)
        fields.append(T.StructField("M", T.MapType(T.StringType(), inner)))
        fields.append(T.StructField("L", T.ArrayType(inner)))
    return T.StructType(fields)


def item_schema(attr_names: list[str], depth: int = 3) -> T.StructType:
    av = attribute_value_schema(depth)
    return T.StructType([T.StructField(n, av) for n in attr_names])


def _decode_attr(attr: Column, kind: str) -> Column:
    if kind == "string":
        return attr.getField("S")
    if kind == "number":
        return attr.getField("N").cast("decimal(38,18)")
    if kind == "number_double":
        return attr.getField("N").cast("double")
    if kind == "boolean":
        return attr.getField("BOOL")
    if kind == "binary":
        return F.unbase64(attr.getField("B"))
    if kind == "string_set":
        return F.array_distinct(attr.getField("SS"))
    if kind == "number_set":
        return F.array_distinct(
            F.transform(attr.getField("NS"), lambda x: x.cast("decimal(38,18)"))
        )
    if kind == "binary_set":
        return F.array_distinct(
            F.transform(attr.getField("BS"), lambda x: F.unbase64(x))
        )
    if kind == "map_json":
        return F.to_json(attr.getField("M"))
    if kind == "list_json":
        return F.to_json(attr.getField("L"))
    raise ValueError(f"unknown decode kind {kind!r}; expected one of {KINDS}")


def decode_item_column(
    df: DataFrame, item_col: str, fields: dict[str, str], depth: int = 3
) -> DataFrame:
    """Decode a JSON string column of DynamoDB items into typed
    columns per ``fields`` (attr name -> kind). NULL-typed attributes
    decode to SQL NULL automatically (absent tag -> null field)."""
    for kind in fields.values():
        if kind not in KINDS:
            raise ValueError(f"unknown decode kind {kind!r}; expected one of {KINDS}")
    parsed = df.withColumn(
        "__item", F.from_json(F.col(item_col), item_schema(list(fields), depth))
    )
    cols = [
        # getField, not a dotted F.col path: DynamoDB attribute names
        # legally contain dots (and other column-path metacharacters),
        # which a string path would mis-parse as nesting (r8 review)
        _decode_attr(F.col("__item").getField(name), kind).alias(name)
        for name, kind in fields.items()
    ]
    others = [c for c in df.columns if c != item_col]
    return parsed.select(*others, *cols)


def decode_export(
    spark: SparkSession,
    path: str,
    fields: dict[str, str],
    depth: int = 3,
    item_key: str = "Item",
) -> DataFrame:
    """B1+B3: read a PITR-export directory (NDJSON of
    ``{"Item": {...}}``) and decode to typed columns. The text scan
    parallelizes per file-split; decode is whole-stage codegen."""
    raw = spark.read.text(path)
    with_item = raw.select(
        F.get_json_object(F.col("value"), f"$.{item_key}").alias("__raw_item")
    )
    return decode_item_column(with_item, "__raw_item", fields, depth)


# ---------------------------------------------------------------------------
# Python-side encoder (test fixtures; FIXTURES.md §B.1 round-trip law)
# ---------------------------------------------------------------------------

def encode_value(v: Any) -> dict[str, Any]:
    if v is None:
        return {"NULL": True}
    if isinstance(v, bool):
        return {"BOOL": v}
    if isinstance(v, (int, float)):
        return {"N": repr(v) if isinstance(v, float) else str(v)}
    if isinstance(v, Decimal):
        # DynamoDB N is arbitrary-precision decimal-as-string; Decimal
        # is its exact Python form (floats round-trip via repr above)
        return {"N": format(v, "f")}
    if isinstance(v, str):
        return {"S": v}
    if isinstance(v, bytes):
        return {"B": base64.b64encode(v).decode()}
    if isinstance(v, set):
        vals = sorted(v)
        if all(isinstance(x, str) for x in vals):
            return {"SS": vals}
        # bool is an int subclass: without the explicit check a set
        # like {True, 2} would emit NS ["2", "True"] — invalid wire
        # text the decimal decode silently turns into NULL (the
        # scalar path already orders its checks bool-first)
        if all(
            isinstance(x, (int, float)) and not isinstance(x, bool)
            for x in vals
        ):
            return {"NS": [str(x) for x in vals]}
        raise TypeError(f"unsupported set element types in {vals!r}")
    if isinstance(v, dict):
        return {"M": {k: encode_value(x) for k, x in v.items()}}
    if isinstance(v, (list, tuple)):
        return {"L": [encode_value(x) for x in v]}
    raise TypeError(f"cannot encode {type(v).__name__}")


def encode_item_json(row: dict[str, Any]) -> str:
    """One item body (the map decode_item_column consumes)."""
    return json.dumps({k: encode_value(v) for k, v in row.items()})


def encode_row_to_ddb_json(row: dict[str, Any]) -> str:
    """One item in export wire form: ``{"Item": {...}}``."""
    return json.dumps({"Item": {k: encode_value(v) for k, v in row.items()}})
