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
    s["outputFormat"] = "ION"
    summary_path.write_text(json.dumps(s))
    with pytest.raises(ExportManifestError, match="unsupported outputFormat"):
        read_export(spark, str(tmp_path), FIELDS)
