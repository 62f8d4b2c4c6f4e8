"""Dump `.explain("formatted")` plans for the queries touched in the
r11 optimization round into plans/r11/<query>_<tag>.txt.

Usage: python tools/dump_r11_plans.py <tag> [query ...]

  tag    "before" (run from pre-optimization code) or "after"

For the streaming h2x journeys the FINAL returned frame reads the
drain's parquet output, so the file additionally records the
STREAMING SOURCE relation (`stream.explain()` before start): that is
where the r11 change is visible — the Python DataSource scan
(`PythonDataSourceV2`/`table_changelog`) becomes a JVM
`FileStreamSource`/`StreamingRelation parquet` after the staged-file
rewrite.
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

TAG = sys.argv[1] if len(sys.argv) > 1 else "after"
ONLY = set(sys.argv[2:])
ROOT = Path(__file__).resolve().parent.parent
OUT = ROOT / "plans" / "r11"
SF_DIR = "/root/testdata/sf0.001"

QUERIES = [
    "e86_logreg_quality_training",
    "h27_out_of_order_cdc",
    "h24_streaming_index_maintenance",
    "h26_cow_changelog_stream",
    "h28_nested_changelog_stream",
    "c23_sql_dml_journey",
    "c30_dml_subquery_journey",
    "e64_knn_pagerank",
]

sys.path.insert(0, str(ROOT))

from dynamodb_zero_etl_s3tables_spark.session import get_spark  # noqa: E402
from dynamodb_zero_etl_s3tables_spark.operators import QUERY_REGISTRY  # noqa: E402

#: streaming-source explains captured by the monkeypatched drain
#: helpers while the journey runs (filled by _capture below)
_STREAM_PLANS: list[str] = []


def fmt(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def fmt_stream_source(df) -> str:
    """Pre-start logical explain of a streaming frame: names the
    source relation (python DataSource vs JVM file stream)."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(extended=True)
    return buf.getvalue()


def _capture() -> None:
    """Wrap both drain entrypoints so every stream a journey starts
    leaves its source-relation explain in _STREAM_PLANS."""
    from dynamodb_zero_etl_s3tables_spark.streaming import table_source

    orig = table_source.drain_changelog

    def wrapped(stream_df, *a, **kw):
        _STREAM_PLANS.append(fmt_stream_source(stream_df))
        return orig(stream_df, *a, **kw)

    table_source.drain_changelog = wrapped
    try:
        from dynamodb_zero_etl_s3tables_spark.streaming import changelog_files

        orig2 = changelog_files.drain_changelog_files

        def wrapped2(stream_df, *a, **kw):
            _STREAM_PLANS.append(fmt_stream_source(stream_df))
            return orig2(stream_df, *a, **kw)

        changelog_files.drain_changelog_files = wrapped2
    except ImportError:
        pass  # before-tag tree predates the module


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    _capture()
    spark = get_spark(app_name=f"dump-r11-plans-{TAG}")
    for name in QUERIES:
        if ONLY and name not in ONLY:
            continue
        _STREAM_PLANS.clear()
        df = QUERY_REGISTRY[name].build(spark, SF_DIR)
        text = (
            f"# {name} — FINAL returned frame, .explain('formatted'), {TAG}\n"
            "# Journey queries run side-effecting statements during "
            "build(); this is the plan of the frame the driver hashes.\n"
            + fmt(df)
        )
        for i, p in enumerate(_STREAM_PLANS):
            text += (
                f"\n# --- streaming source relation #{i + 1} started during "
                "build() (pre-start explain; the r11 change swaps the "
                "PythonDataSource scan for a JVM file stream) ---\n" + p
            )
        (OUT / f"{name}_{TAG}.txt").write_text(text)
        print(f"wrote {name}_{TAG}.txt ({len(text)} bytes)")
    spark.stop()


if __name__ == "__main__":
    main()
