"""Multimodal column handling (SURVEY.md §2 E6): opaque binary
payloads + typed metadata structs, with Arrow-batched featurizers.

Decode is an optional-dependency dispatch (``decode_payload``): when
Pillow is importable AND the payload bytes decode as a real image,
real width/height/n_frames come out; otherwise the deterministic
``decode_stub`` fake answers (this container has no codec libs, and
the synthesized payloads are UTF-8 text, so the stub path is what the
registered queries exercise — their oracles replay its arithmetic).
The Spark-side plumbing — binary columns, metadata structs,
mapInPandas batch shapes, partition-parallel featurization — is real
and tested either way. At 100 TB the payload column stays in
executors (never collected); featurizers stream Arrow batches through
Python workers.
"""

from __future__ import annotations

import importlib.util
import io
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from dynamodb_zero_etl_s3tables_spark.operators.registry import query
from dynamodb_zero_etl_s3tables_spark.sources.testdata import load

#: evaluated once per process (Python worker or driver)
HAS_PIL = importlib.util.find_spec("PIL") is not None


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthesize an opaque-media table from documents: payload =
    UTF-8 bytes of the text (stand-in for image/audio bytes), plus a
    typed metadata struct — the schema shape of a real media lake."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit("application/fake").alias("content_type"),
            F.length(F.col("text")).alias("n_bytes"),
            (F.col("doc_id") % 4).cast("int").alias("shard"),
        ).alias("media_meta"),
    )


@query(
    "e06_binary_plumbing",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS payload_bytes,
           sha256(text) AS payload_sha256,
           LENGTH(text) AS meta_n_bytes,
           CAST(doc_id % 4 AS INTEGER) AS meta_shard
    FROM documents
    """,
)
def e06_binary_plumbing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6: binary payload column + metadata struct fields — all
    JVM-side (length/sha over BinaryType)."""
    m = media_table(spark, sf_dir)
    return m.select(
        "doc_id",
        F.length(F.col("payload")).alias("payload_bytes"),
        F.sha2(F.col("payload"), 256).alias("payload_sha256"),
        F.col("media_meta.n_bytes").alias("meta_n_bytes"),
        F.col("media_meta.shard").alias("meta_shard"),
    )


def decode_stub(payload: bytes) -> dict:
    """STUB decoder — deterministic fake in place of a real image/
    audio codec (libs not present in this container). Derives pseudo
    width/height/duration from the payload bytes; ``decode_payload``
    upgrades to Pillow automatically where it exists and keeps every
    shape the same."""
    n = len(payload)
    return {
        "width": 16 + (n % 64),
        "height": 16 + ((n // 64) % 64),
        "n_frames": 1 + (n % 7),
        "ok": True,
        "codec": "stub",
    }


def decode_payload(payload: bytes) -> dict:
    """Optional-dependency decode dispatch (VERDICT r2 #7): real codec
    when Pillow is importable and the bytes are a decodable image;
    the deterministic stub otherwise. Same dict shape on both paths
    (``codec`` says which answered), so the mapInPandas featurizer and
    every downstream schema are identical wherever this runs. The
    registered e06* queries stay on the stub path by construction —
    their synthesized payloads are UTF-8 text, which no image codec
    accepts — which is what keeps their replayed-arithmetic oracles
    valid with or without Pillow installed."""
    if HAS_PIL:
        try:
            from PIL import Image

            with Image.open(io.BytesIO(payload)) as im:
                w, h = im.size
                return {
                    "width": int(w),
                    "height": int(h),
                    "n_frames": int(getattr(im, "n_frames", 1)),
                    "ok": True,
                    "codec": "pil",
                }
        except Exception:
            pass  # undecodable bytes -> deterministic stub
    return decode_stub(payload)


_FEAT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload_bytes", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("aspect", T.DoubleType()),
    ]
)


def _featurize_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: Arrow batch in -> feature batch out."""
    for pdf in batches:
        feats = pdf["payload"].map(decode_payload)
        out = pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "payload_bytes": pdf["payload"].map(len).astype("int32"),
                "width": feats.map(lambda f: f["width"]).astype("int32"),
                "height": feats.map(lambda f: f["height"]).astype("int32"),
                "n_frames": feats.map(lambda f: f["n_frames"]).astype("int32"),
            }
        )
        out["aspect"] = (out["width"] / out["height"]).round(6)
        yield out


@query(
    "e06b_media_featurize",
    oracle="""
    WITH m AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents)
    SELECT doc_id,
           CAST(n AS INTEGER) AS payload_bytes,
           CAST(16 + (n % 64) AS INTEGER) AS width,
           CAST(16 + ((n // 64) % 64) AS INTEGER) AS height,
           CAST(1 + (n % 7) AS INTEGER) AS n_frames,
           ROUND(CAST(16 + (n % 64) AS DOUBLE) / (16 + ((n // 64) % 64)), 6) AS aspect
    FROM m
    """,
)
def e06b_media_featurize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6: Arrow-batched media featurization via mapInPandas — the
    real distributed plumbing around the stubbed decode; the oracle
    replays the stub's arithmetic in SQL."""
    m = media_table(spark, sf_dir)
    return m.select("doc_id", "payload").mapInPandas(_featurize_batches, _FEAT_SCHEMA)


@query(
    "e06c_frame_sample",
    oracle="""
    WITH f AS (
      SELECT doc_id,
             CAST(1 + (octet_length(encode(text)) % 7) AS INTEGER) AS n_frames
      FROM documents
    )
    SELECT doc_id, n_frames,
           CAST(UNNEST(range(0, n_frames)) AS INTEGER) AS frame_idx
    FROM f
    """,
)
def e06c_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6: frame sampling — expand each media row into its (stubbed)
    per-frame rows via posexplode of a generated frame index; the
    shape of video-frame extraction at scale. The stub's frame count
    is a pure function of payload length, so the oracle replays it."""
    m = media_table(spark, sf_dir)
    n = F.length(F.col("payload"))
    n_frames = (F.lit(1) + (n % 7)).cast("int")
    return (
        m.select(
            "doc_id",
            n_frames.alias("n_frames"),
            F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx", "_f"),
        )
        .select("doc_id", "n_frames", "frame_idx")
    )


@query(
    "e06d_media_exact_dedup",
    oracle="""
    SELECT sha256(text) AS content_sha256,
           COUNT(*) AS n_copies,
           MIN(doc_id) AS keeper_doc_id,
           MIN(octet_length(encode(text))) AS payload_bytes
    FROM documents
    GROUP BY sha256(text)
    """,
)
def e06d_media_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E6: content-hash dedup over the BINARY payload — e01's exact
    dedup applied to media: identical bytes (re-uploaded images,
    mirrored files) collapse to one keeper regardless of filename or
    metadata. sha256 computes executor-side over BinaryType (the
    payload never leaves the JVM, never hits Python); one shuffle on
    the uniform 256-bit key. At 100 TB this is the first pass of any
    media-lake ingest, upstream of perceptual/near-dup hashing."""
    m = media_table(spark, sf_dir)
    return (
        m.select("doc_id", F.sha2(F.col("payload"), 256).alias("content_sha256"),
                 F.length("payload").alias("nb"))
        .groupBy("content_sha256")
        .agg(
            F.count("*").alias("n_copies"),
            F.min("doc_id").alias("keeper_doc_id"),
            F.min("nb").alias("payload_bytes"),
        )
    )
