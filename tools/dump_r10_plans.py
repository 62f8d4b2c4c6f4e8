"""Dump `.explain("formatted")` plans for the queries touched in the
r10 optimization round into plans/r10/<query>_<tag>.txt.

Usage: python tools/dump_r10_plans.py <tag> [repo_root]

  tag        "before" (run from a pre-optimization checkout) or "after"
  repo_root  engine package to import (default: this file's parent's
             parent) — pass an exported HEAD~1 tree to produce the
             _before plans without touching the working tree.

Also dumps the subquery-DML partition-prune SUBPLAN (the frame
`_matching_commit` collects to learn which partitions to rewrite),
restated standalone on a c30-shaped partitioned table: before the r10
change that frame was `read().join(keys, semi).select(pcols).distinct()`
(a second full-table scan + join per DML statement); after, it is
`keys.select(pcols).distinct()` over the key frame the WHERE scan
already produced. Output: c30_prune_subplan_<tag>.txt.
"""

from __future__ import annotations

import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

TAG = sys.argv[1] if len(sys.argv) > 1 else "after"
ROOT = Path(sys.argv[2]).resolve() if len(sys.argv) > 2 else (
    Path(__file__).resolve().parent.parent
)
OUT = Path(__file__).resolve().parent.parent / "plans" / "r10"
SF_DIR = "/root/testdata/sf0.001"

QUERIES = [
    "c30_dml_subquery_journey",
    "e86_logreg_quality_training",
    "e64_knn_pagerank",
    "h27_out_of_order_cdc",
]

sys.path.insert(0, str(ROOT))

from dynamodb_zero_etl_s3tables_spark.session import get_spark  # noqa: E402
from dynamodb_zero_etl_s3tables_spark.operators import QUERY_REGISTRY  # noqa: E402


def fmt(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name=f"dump-r10-plans-{TAG}")
    for name in QUERIES:
        df = QUERY_REGISTRY[name].build(spark, SF_DIR)
        text = (
            f"# {name} — FINAL returned frame, .explain('formatted'), "
            f"{TAG} (engine at {ROOT})\n"
            "# Journey queries run side-effecting statements during "
            "build(); this is the plan of the frame the driver hashes.\n"
            + fmt(df)
        )
        (OUT / f"{name}_{TAG}.txt").write_text(text)
        print(f"wrote {name}_{TAG}.txt ({len(text)} bytes)")

    # --- the subquery-DML prune subplan, c30-shaped ---------------------
    from pyspark.sql import functions as F  # noqa: E402

    from dynamodb_zero_etl_s3tables_spark.spec import TableSpec  # noqa: E402
    from dynamodb_zero_etl_s3tables_spark.sources.testdata import load  # noqa: E402
    from dynamodb_zero_etl_s3tables_spark.table.catalog import Catalog  # noqa: E402

    import tempfile

    wh = tempfile.mkdtemp(prefix="prune_plan_")
    t = Catalog(spark, wh).create_table(
        TableSpec(
            namespace="ns",
            name="orders_part",
            key_columns=("pk",),
            partition_columns=("status",),
        )
    )
    base = load(spark, SF_DIR, "orders").select(
        F.col("o_orderkey").alias("pk"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("price"),
    )
    t.bootstrap(base)
    # the key frame the SQL door hands _matching_commit: the WHERE
    # scan's output (keys [+ partition values, r10])
    view = t.read()
    if TAG == "before":
        keys = view.filter(F.col("price") > 100000).select("pk")
        prune = (
            t.read()
            .join(keys.dropDuplicates(["pk"]), ["pk"], "left_semi")
            .select("status")
            .distinct()
        )
        note = (
            "# BEFORE: prune set = second full-table scan semi-joined "
            "against the key set\n"
        )
    else:
        keys = view.filter(F.col("price") > 100000).select("pk", "status")
        prune = keys.select("status").distinct()
        note = (
            "# AFTER: prune set = distinct over the partition values the "
            "WHERE scan already carried on the key frame — no second "
            "table scan, no semi-join\n"
        )
    text = (
        "# c30 subquery-DML partition-prune SUBPLAN (the frame "
        "_matching_commit collects\n# to choose rewrite vs carry), "
        f"restated standalone on a c30-shaped table — {TAG}\n" + note + fmt(prune)
    )
    (OUT / f"c30_prune_subplan_{TAG}.txt").write_text(text)
    print(f"wrote c30_prune_subplan_{TAG}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
