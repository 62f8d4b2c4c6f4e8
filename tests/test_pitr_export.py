"""PITR export-directory source (SURVEY.md §2 B1/B3): layout
round-trip law + manifest-contract failure modes. The oracle-gated
end-to-end run is b01b_pitr_export_bootstrap; these tests cover what
an oracle can't — error paths and manifest bookkeeping."""

import gzip
import json
from pathlib import Path

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from dynamodb_zero_etl_s3tables_spark.sources.pitr_export import (
    ExportManifestError,
    av_bool,
    av_n,
    av_null,
    av_s,
    av_ss,
    find_export_dir,
    items_to_wire,
    read_export,
    write_export_fixture,
)

FIELDS = {"pk": "string", "v": "number", "ok": "boolean", "tags": "string_set"}


def _fixture(spark, root: str, export_id: str = "01700000000000-abc") -> str:
    df = spark.createDataFrame(
        [Row(pk=f"K#{i}", v=i * 10, ok=(i % 2 == 0)) for i in range(1, 21)]
    )
    wire = df.select(
        items_to_wire(
            {
                "pk": av_s(F.col("pk")),
                "v": av_n(F.col("v")),
                "ok": av_bool(F.col("ok")),
                "tags": av_ss(F.array(F.lit("a"), F.lit("b"), F.lit("a"))),
                "gap": av_null(),
            }
        )
    )
    return write_export_fixture(wire, root, export_id, shards=3)


def test_export_roundtrip_and_manifest(spark, tmp_path):
    export_dir = Path(_fixture(spark, str(tmp_path)))
    # layout contract
    shards = list((export_dir / "data").glob("*.gz"))
    assert len(shards) == 3
    summary = json.loads((export_dir / "manifest-summary.json").read_text())
    assert summary["itemCount"] == 20
    assert summary["outputFormat"] == "DYNAMODB_JSON"
    entries = [
        json.loads(l)
        for l in (export_dir / "manifest-files.json").read_text().splitlines()
    ]
    assert sum(e["itemCount"] for e in entries) == 20
    # wire form is genuine gzipped AttributeValue NDJSON
    line = gzip.open(shards[0], "rt").readline()
    item = json.loads(line)["Item"]
    assert set(item["pk"]) == {"S"} and set(item["v"]) == {"N"}
    assert item["gap"] == {"NULL": True}
    # decode round trip, count-validated
    out = read_export(spark, str(tmp_path), FIELDS, validate_counts=True)
    rows = {r.pk: r for r in out.collect()}
    assert len(rows) == 20
    assert rows["K#3"].v == 30 and rows["K#3"].ok is False
    assert sorted(rows["K#3"].tags) == ["a", "b"]  # set invariant held


def test_newest_export_picked_without_id(spark, tmp_path):
    _fixture(spark, str(tmp_path), "01600000000000-old")
    _fixture(spark, str(tmp_path), "01700000000000-new")
    assert find_export_dir(str(tmp_path)).name == "01700000000000-new"


def test_missing_data_file_raises(spark, tmp_path):
    export_dir = Path(_fixture(spark, str(tmp_path)))
    victim = next((export_dir / "data").glob("*.gz"))
    victim.unlink()
    with pytest.raises(ExportManifestError, match="missing data file"):
        read_export(spark, str(tmp_path), FIELDS)


def test_count_mismatch_raises(spark, tmp_path):
    export_dir = Path(_fixture(spark, str(tmp_path)))
    summary_path = export_dir / "manifest-summary.json"
    s = json.loads(summary_path.read_text())
    s["itemCount"] = 19
    summary_path.write_text(json.dumps(s))
    with pytest.raises(ExportManifestError, match="manifest-summary says 19"):
        read_export(spark, str(tmp_path), FIELDS, validate_counts=True)
    # without validation the read still succeeds (no extra action)
    assert read_export(spark, str(tmp_path), FIELDS).count() == 20


def test_unsupported_format_and_empty_root(spark, tmp_path):
    with pytest.raises(ExportManifestError, match="no exports"):
        read_export(spark, str(tmp_path / "nowhere"), FIELDS)
    export_dir = Path(_fixture(spark, str(tmp_path)))
    summary_path = export_dir / "manifest-summary.json"
    s = json.loads(summary_path.read_text())
    s["outputFormat"] = "CSV"
    summary_path.write_text(json.dumps(s))
    with pytest.raises(ExportManifestError, match="unsupported outputFormat"):
        read_export(spark, str(tmp_path), FIELDS)


# -- ION wire form (VERDICT r6 #2) ------------------------------------------

def test_ion_export_reads_identically(spark, tmp_path):
    """The same rows through the ION wire form must decode to the
    same frame as the JSON form (the b01b/b01c law, pinned here at
    unit scale)."""
    from dynamodb_zero_etl_s3tables_spark.functions.ion import (
        item_json_to_ion_udf,
    )

    _fixture(spark, str(tmp_path / "json"))
    df = spark.createDataFrame(
        [Row(pk=f"K#{i}", v=i * 10, ok=(i % 2 == 0)) for i in range(1, 21)]
    )
    wire = df.select(
        items_to_wire(
            {
                "pk": av_s(F.col("pk")),
                "v": av_n(F.col("v")),
                "ok": av_bool(F.col("ok")),
                "tags": av_ss(F.array(F.lit("a"), F.lit("b"), F.lit("a"))),
                "gap": av_null(),
            }
        ).alias("j")
    )
    ion_lines = wire.select(item_json_to_ion_udf()(F.col("j")))
    write_export_fixture(
        ion_lines, str(tmp_path / "ion"), "01700000000000-ion",
        shards=3, output_format="ION",
    )
    import gzip as _gz

    shard = next((Path(tmp_path / "ion") / "AWSDynamoDB"
                  / "01700000000000-ion" / "data").glob("*.gz"))
    line = _gz.open(shard, "rt").readline()
    assert line.startswith("$ion_1_0 {Item:{")  # genuine text-Ion
    a = read_export(spark, str(tmp_path / "json"), FIELDS, validate_counts=True)
    b = read_export(spark, str(tmp_path / "ion"), FIELDS, validate_counts=True)
    ra = sorted((r.pk, str(r.v), r.ok, tuple(sorted(r.tags))) for r in a.collect())
    rb = sorted((r.pk, str(r.v), r.ok, tuple(sorted(r.tags))) for r in b.collect())
    assert ra == rb


def test_ion_parser_subset_and_roundtrip():
    from dynamodb_zero_etl_s3tables_spark.functions import ion

    wire = json.dumps({"Item": {
        "pk": {"S": 'quo"te\\and\nnewline'},
        "n_int": {"N": "370"},
        "n_dec": {"N": "-123.45"},
        "flag": {"BOOL": True},
        "gone": {"NULL": True},
        "blob": {"B": "aGVsbG8="},
        "ss": {"SS": ["x", "y"]},
        "ns": {"NS": ["1", "2.5"]},
        "bs": {"BS": ["aQ==", "ag=="]},
        "m": {"M": {"inner": {"L": [{"S": "s"}, {"N": "-4"}]}}},
        "weird name!": {"S": "q"},
    }})
    line = ion.item_json_to_ion(wire)
    assert line.startswith("$ion_1_0 ")
    assert json.loads(ion.ion_to_item_json(line)) == json.loads(wire)["Item"]

    # Ion-isms the parser must accept: typed null, d-exponent
    # decimals, comments, trailing commas, quoted field names
    got = json.loads(ion.ion_to_item_json(
        "$ion_1_0 {Item:{a: null.string, b: 15d-1, /*c*/ 'q f': 2,}}"
    ))
    assert got == {"a": {"NULL": True}, "b": {"N": "1.5"}, "q f": {"N": "2"}}

    # loud refusals for constructs outside the export subset
    for bad, msg in [
        ("{Item:{t: 2020-06-30T00:00:00Z}}", "timestamp"),
        ("{Item:{s: (a b)}}", "s-expression"),
        ("{Item:{s: sym}}", "bare symbol"),
        ("{NotItem:{}}", "not an {Item"),
        ("{Item:{x: $dynamodb_SS::3}}", "non-list"),
        ('{Item:{x: 1}} trailing', "trailing content"),
    ]:
        with pytest.raises(ion.IonParseError, match=msg):
            ion.ion_to_item_json(bad)


def test_manifest_key_escape_refused(spark, tmp_path):
    """r8 review: a manifest entry whose dataFileS3Key is absolute (or
    walks out via ..) must refuse — pathlib's `/` would otherwise
    discard the export root and ingest an arbitrary host file."""
    import json as _json

    from dynamodb_zero_etl_s3tables_spark.sources.pitr_export import (
        ExportManifestError,
        read_export,
        write_export_fixture,
    )
    from dynamodb_zero_etl_s3tables_spark.functions.decode import (
        encode_row_to_ddb_json,
    )

    root = tmp_path / "exp"
    wire = spark.createDataFrame(
        [(encode_row_to_ddb_json({"pk": 1}),)], "line string"
    )
    export_dir = write_export_fixture(wire, str(root), export_id="01-esc")
    files = _json.loads(
        open(f"{export_dir}/manifest-files.json").read().splitlines()[0]
    )
    files["dataFileS3Key"] = "/etc/passwd"
    with open(f"{export_dir}/manifest-files.json", "w") as fh:
        fh.write(_json.dumps(files) + "\n")
    with pytest.raises(ExportManifestError, match="escapes"):
        read_export(spark, str(root), {"pk": "long"})
