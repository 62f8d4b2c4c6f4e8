"""Property-based tests for the text-Ion codec (functions/ion.py):
the roundtrip law — any AttributeValue item map survives
item_json_to_ion -> ion_to_item_json unchanged — for ARBITRARY
values (full unicode strings with quotes/escapes/newlines, signed
decimals, nested maps/lists, all three set types), not just the b01c
fixture shapes. Pure Python: no SparkSession needed."""

import base64
import json

from hypothesis import given, settings
from hypothesis import strategies as st

from dynamodb_zero_etl_s3tables_spark.functions import ion

# strings: any unicode except surrogates (JSON itself can't carry
# lone surrogates); includes quotes, backslashes, newlines, emoji
_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=40
)
# N is a *string* of decimal text on the wire — in the CANONICAL
# plain form both codec directions emit (no exponent; "0E-8" in would
# come back "0.00000000", which is byte-roundtrip only up to Decimal
# equality — the writer normalizes exactly so non-canonical inputs
# converge in one hop, pinned by the fixpoint test below)
_numtext = st.decimals(
    min_value="-1e20", max_value="1e20", allow_nan=False, allow_infinity=False,
    places=8,
).map(lambda d: format(d, "f"))
_blob = st.binary(max_size=24).map(lambda b: base64.b64encode(b).decode())

_scalar = st.one_of(
    st.fixed_dictionaries({"S": _text}),
    st.fixed_dictionaries({"N": _numtext}),
    st.fixed_dictionaries({"B": _blob}),
    st.fixed_dictionaries({"BOOL": st.booleans()}),
    st.fixed_dictionaries({"NULL": st.just(True)}),
    st.fixed_dictionaries({"SS": st.lists(_text, min_size=1, max_size=3)}),
    st.fixed_dictionaries({"NS": st.lists(_numtext, min_size=1, max_size=3)}),
    st.fixed_dictionaries({"BS": st.lists(_blob, min_size=1, max_size=3)}),
)
_av = st.recursive(
    _scalar,
    lambda children: st.one_of(
        st.fixed_dictionaries({"L": st.lists(children, max_size=3)}),
        st.fixed_dictionaries(
            {"M": st.dictionaries(_text.filter(bool), children, max_size=3)}
        ),
    ),
    max_leaves=8,
)
_item = st.dictionaries(_text.filter(bool), _av, min_size=0, max_size=5)


@settings(max_examples=300, deadline=None)
@given(item=_item)
def test_ion_roundtrip_property(item):
    wire = json.dumps({"Item": item})
    line = ion.item_json_to_ion(wire)
    assert line.startswith("$ion_1_0 ")
    assert "\n" not in line  # NDJSON-safe: one document per line
    assert json.loads(ion.ion_to_item_json(line)) == item


@settings(max_examples=100, deadline=None)
@given(item=_item)
def test_ion_roundtrip_is_stable(item):
    # encode is deterministic and re-encoding the parsed form is a
    # fixpoint (canonical text on both sides of the trip)
    wire = json.dumps({"Item": item})
    line1 = ion.item_json_to_ion(wire)
    line2 = ion.item_json_to_ion(
        json.dumps({"Item": json.loads(ion.ion_to_item_json(line1))})
    )
    assert line1 == line2


def test_malformed_hex_escapes_raise_ion_parse_error():
    """ADVICE r7 #4: truncated/malformed \\x, \\u, \\U escapes must
    raise IonParseError with offset context, never a bare ValueError
    or a silent short-slice parse."""
    import pytest

    from dynamodb_zero_etl_s3tables_spark.functions.ion import (
        IonParseError,
        ion_to_item_json,
    )

    for bad in (
        '$ion_1_0 {Item:{s:{S:"\\xZZ"}}}',     # non-hex digits
        '$ion_1_0 {Item:{s:{S:"\\x4"}}}',       # truncated (quote eats width)
        '$ion_1_0 {Item:{s:{S:"\\uBEEZ"}}}',   # non-hex in \\u
        '$ion_1_0 {Item:{s:{S:"\\UFFFFFFFF"}}}',  # beyond U+10FFFF
    ):
        with pytest.raises(IonParseError):
            ion_to_item_json(bad)
    # the happy path still decodes
    ok = ion_to_item_json('$ion_1_0 {Item:{s:{S:"\\x41\\u0042"}}}')
    assert '"AB"' in ok


def test_item_json_to_ion_udf_null_passthrough(spark):
    """ADVICE r7 #5: a NULL wire line maps to NULL (not a TypeError
    inside the Arrow task)."""
    from pyspark.sql import functions as F

    from dynamodb_zero_etl_s3tables_spark.functions.ion import (
        item_json_to_ion_udf,
    )

    df = spark.createDataFrame(
        [('{"Item": {"pk": {"N": "1"}}}',), (None,)], "line string"
    )
    rows = df.select(item_json_to_ion_udf()(F.col("line")).alias("ion")).collect()
    assert rows[0].ion.startswith("$ion_1_0")
    assert rows[1].ion is None


def test_triple_quoted_clob_refused():
    """r8 review: BOTH Ion clob forms must refuse — the triple-quoted
    one was silently accepted as base64 blob text."""
    import pytest

    line = "{Item:{pk:{B:{{'''hello'''}}}}}"
    with pytest.raises(ion.IonParseError, match="clob"):
        ion.ion_to_item_json(line)
