"""Attribute-value codec round-trip tests (FIXTURES.md §B.1):
decode(encode(row)) == row across all ten DynamoDB types."""

from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from dynamodb_zero_etl_s3tables_spark.functions.decode import (
    decode_export,
    decode_item_column,
    encode_item_json,
    encode_row_to_ddb_json,
)

FIELDS = {
    "PK": "string",
    "SK": "string",
    "qty": "number",
    "score": "number_double",
    "flag": "boolean",
    "blob": "binary",
    "tags": "string_set",
    "nums": "number_set",
    "props": "map_json",
    "items": "list_json",
    "missing": "string",
}

ROWS = [
    {
        "PK": "USER#1",
        "SK": "EVT#10",
        "qty": 3,
        "score": 1.5,
        "flag": True,
        "blob": b"\x00\x01abc",
        "tags": {"b", "a"},
        "nums": {1, 2},
        "props": {"k": "v", "n": 2},
        "items": ["x", 1, None],
        "missing": None,
    },
    {
        "PK": "USER#2",
        "SK": "EVT#20",
        "qty": 98765432109876543,
        "score": 0.25,
        "flag": False,
        "blob": b"",
        "tags": {"only"},
        "nums": {7},
        "props": {},
        "items": [],
        "missing": None,
    },
]


def test_roundtrip_all_types(spark):
    wire = [(encode_item_json(r),) for r in ROWS]
    df = spark.createDataFrame(wire, ["item_json"])
    out = decode_item_column(df, "item_json", FIELDS).orderBy("PK").collect()

    r0 = out[0]
    assert r0.PK == "USER#1" and r0.SK == "EVT#10"
    assert r0.qty == Decimal("3")
    assert r0.score == 1.5
    assert r0.flag is True
    assert bytes(r0.blob) == b"\x00\x01abc"
    assert sorted(r0.tags) == ["a", "b"]
    assert sorted(r0.nums) == [Decimal("1"), Decimal("2")]
    # M stays in attribute-value JSON form (queryable via D47 paths)
    assert '"k":{"S":"v"}' in r0.props.replace(" ", "")
    assert r0.missing is None  # NULL-typed attribute -> SQL NULL

    r1 = out[1]
    # N is arbitrary precision: survives > 2^53 exactly (doubles don't)
    assert r1.qty == Decimal("98765432109876543")
    assert bytes(r1.blob) == b""


def test_decode_export_file(spark, tmp_path):
    p = tmp_path / "export"
    p.mkdir()
    (p / "part-0.json").write_text(
        "\n".join(encode_row_to_ddb_json(r) for r in ROWS)
    )
    out = decode_export(spark, str(p), FIELDS)
    assert out.count() == 2
    assert set(out.columns) == set(FIELDS)


def test_number_set_dedup_invariant(spark):
    wire = [('{"nums": {"NS": ["2", "2.0", "1"]}}',)]
    df = spark.createDataFrame(wire, ["item_json"])
    out = decode_item_column(df, "item_json", {"nums": "number_set"}).collect()[0]
    # set invariant enforced post-cast: 2 and 2.0 collapse
    assert sorted(out.nums) == [Decimal("1"), Decimal("2")]


def test_unknown_kind_rejected(spark):
    df = spark.createDataFrame([("{}",)], ["item_json"])
    with pytest.raises(ValueError, match="unknown decode kind"):
        decode_item_column(df, "item_json", {"x": "uuid"})


# -- property-based round trip (hypothesis) ----------------------------------
# SURVEY §5.2(6): the codec's self-inverse law — encode(row) decoded
# with the right kinds reproduces the row — for ARBITRARY values, not
# just the golden fixture.

from hypothesis import given, settings, strategies as st  # noqa: E402

_text = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd"), max_codepoint=0x7F),
    min_size=0, max_size=24,
)
_row = st.fixed_dictionaries(
    {
        "pk": st.integers(min_value=0, max_value=2**40),
        "name": _text,
        "price": st.decimals(
            min_value=Decimal("-1e12"), max_value=Decimal("1e12"),
            allow_nan=False, allow_infinity=False, places=6,
        ),
        "active": st.booleans(),
        "tags": st.sets(_text, max_size=4),
    }
)


@settings(max_examples=30, deadline=None)
@given(rows=st.lists(_row, min_size=1, max_size=8))
def test_roundtrip_property(spark, rows):
    import json as _json

    ndjson = "\n".join(
        _json.dumps({"Item": _json.loads(encode_item_json(r))}) for r in rows
    )
    df = spark.createDataFrame([(line,) for line in ndjson.splitlines()], "value string")
    from pyspark.sql import functions as F2

    with_item = df.select(
        F2.get_json_object(F2.col("value"), "$.Item").alias("__raw_item")
    )
    out = decode_item_column(
        with_item, "__raw_item",
        {"pk": "number", "name": "string", "price": "number",
         "active": "boolean", "tags": "string_set"},
    )
    got = sorted(
        (
            int(r.pk), r.name, Decimal(r.price).normalize(),
            r.active, tuple(sorted(r.tags or [])),
        )
        for r in out.collect()
    )
    want = sorted(
        (
            r["pk"], r["name"], Decimal(r["price"]).normalize(),
            r["active"], tuple(sorted(set(r["tags"]))),
        )
        for r in rows
    )
    assert got == want


def test_dotted_attribute_name_decodes(spark):
    """r8 review: DynamoDB attribute names legally contain dots; the
    decoder must bind them via getField, not a dotted column path
    (which Spark parses as nesting)."""
    from dynamodb_zero_etl_s3tables_spark.functions.decode import (
        decode_item_column,
        encode_item_json,
    )

    line = encode_item_json({"user.name": "ada", "pk": 1})
    df = spark.createDataFrame([(line,)], "item string")
    out = decode_item_column(df, "item", {"pk": "number", "user.name": "string"})
    row = out.first()
    assert row["pk"] == 1 and row["user.name"] == "ada"


def test_bool_in_number_set_rejected():
    """r8 review: bool is an int subclass — {True, 2} must refuse
    loudly, not emit NS wire text 'True' that decodes to NULL."""
    from dynamodb_zero_etl_s3tables_spark.functions.decode import encode_value

    with pytest.raises(TypeError, match="set element"):
        encode_value({True, 2})
    assert encode_value({1, 2}) == {"NS": ["1", "2"]}
