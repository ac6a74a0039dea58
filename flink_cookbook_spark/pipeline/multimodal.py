"""Multimodal-column conventions: opaque binary payloads + typed metadata.

Image/audio/video data in a Spark pipeline is an opaque ``binary`` column
plus a metadata struct; decode / feature-extract / resize / frame-sample
run as Arrow-batched pandas iterators (``mapInPandas``) so each Python
worker sees whole record batches, never single rows.

The container has no codec libraries, so the decode step is STUBBED: a
clearly-marked deterministic fake (byte statistics standing in for pixel
statistics) behind ``decode_stub``; the real decoder raises
``NotImplementedError``. Everything Spark-side — schema, partitioning,
UDF signature, Arrow batch shape — is real and tested
(tests/test_pipeline.py).

The fixture has no binary table, so ``documents.text`` is encoded to
UTF-8 bytes as the stand-in payload; a production table would read
``binary`` parquet columns the same way.

Scale notes (100 TB): payload columns dominate I/O — the metadata query
below never touches Python and prunes to the columns it needs; the
feature extraction path repartitions by doc_id so decode work spreads
evenly, and each mapInPandas batch is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flink_cookbook_spark.catalog import load
from flink_cookbook_spark.registry import register, rnd


def with_payload(docs: DataFrame) -> DataFrame:
    """Attach the opaque binary payload + typed metadata struct."""
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("content_type"),
            F.octet_length(F.encode("text", "utf-8")).alias("n_bytes"),
            F.col("source").alias("origin"),
        ).alias("meta"),
    )


def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only scan over binary payloads: sizes, checksums, and
    size-band distribution — no Python, no payload decode; the shape of
    'list my corpus' at 100 TB."""
    docs = load(spark, sf_dir, "documents")
    payload = with_payload(docs)
    return payload.select(
        "doc_id",
        F.col("meta.content_type").alias("content_type"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.origin").alias("origin"),
        F.md5("payload").alias("payload_md5"),
        (F.col("meta.n_bytes") / 128).cast("int").alias("size_band"),
    )


register(
    "multimodal_metadata",
    oracle="""
SELECT doc_id,
       'application/octet-stream' AS content_type,
       CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
       source AS origin,
       md5(text) AS payload_md5,  -- VARCHAR md5 hashes the same UTF-8 bytes
       CAST(octet_length(encode(text)) // 128 AS INTEGER) AS size_band
FROM documents
""",
    tags=("multimodal", "llm-pipeline"),
)(multimodal_metadata)


#: feature schema produced by the decode/extract stage.
FEATURE_SCHEMA = (
    "doc_id long, n_bytes int, mean_byte double, max_byte int, "
    "n_frames int, feature array<double>"
)


def decode_real(payload: bytes) -> dict:
    """The real codec path — requires image/audio libraries not present
    in this container."""
    raise NotImplementedError(
        "codec libraries (PIL/ffmpeg/soundfile) are not installed; "
        "use decode_stub for the deterministic fake"
    )


def decode_stub(payload: bytes) -> dict:
    """Deterministic fake decode: byte statistics stand in for decoded
    pixel/sample statistics; 'frames' are 64-byte chunks standing in for
    video frame sampling."""
    if not payload:
        return {"n_bytes": 0, "mean_byte": 0.0, "max_byte": 0, "n_frames": 0, "feature": [0.0] * 4}
    n = len(payload)
    mean = sum(payload) / n
    frames = [payload[i : i + 64] for i in range(0, n, 64)]
    # 4-dim fake feature: mean, max, first-byte, frame count (normalized)
    feature = [mean / 255.0, max(payload) / 255.0, payload[0] / 255.0, len(frames) / 64.0]
    return {
        "n_bytes": n,
        "mean_byte": mean,
        "max_byte": max(payload),
        "n_frames": len(frames),
        "feature": feature,
    }


def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: Arrow batch in -> decoded feature batch out."""
    for pdf in batches:
        decoded = [decode_stub(p) for p in pdf["payload"]]
        out = pd.DataFrame(decoded)
        out.insert(0, "doc_id", pdf["doc_id"].values)
        yield out


def multimodal_features_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + feature-extract over binary payloads via mapInPandas
    (Arrow-batched) — the internal form, keeping ``feature`` as
    ``array<double>`` for downstream vector consumers (similarity search,
    training pipelines)."""
    docs = load(spark, sf_dir, "documents")
    payload = with_payload(docs).select("doc_id", "payload")
    # spread decode work evenly regardless of upstream file layout
    return payload.repartition(F.col("doc_id")).mapInPandas(
        _extract_batches, schema=FEATURE_SCHEMA
    )


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered driver-checkable form: the decode stub is pure byte
    arithmetic, so every output — including the 4-dim fake feature — is
    projected as rounded scalar doubles and verified against a DuckDB
    oracle that recomputes the same byte statistics in SQL. (Arrays are
    kept out of the registered projection: the driver's canonicalizer
    sorts via pandas, which cannot factorize Python lists.)"""
    feats = multimodal_features_df(spark, sf_dir)
    return feats.select(
        "doc_id",
        "n_bytes",
        rnd("mean_byte", 6).alias("mean_byte"),
        "max_byte",
        "n_frames",
        rnd(F.col("feature")[0], 6).alias("f0"),
        rnd(F.col("feature")[1], 6).alias("f1"),
        rnd(F.col("feature")[2], 6).alias("f2"),
        rnd(F.col("feature")[3], 6).alias("f3"),
    )


register(
    "multimodal_features",
    oracle="""
-- The decode stub is deterministic byte math (mean/max/first byte,
-- 64-byte 'frames'), so DuckDB can recompute it exactly: the corpus is
-- ASCII (verified), so unicode(char) == byte value and the integer sum
-- followed by one double division matches Python's sum(payload)/n
-- bit-for-bit.
WITH b AS (
  SELECT doc_id,
         octet_length(encode(text)) AS nb,
         CAST(list_sum([unicode(substring(text, i, 1))
                        for i in range(1, length(text)+1)]) AS DOUBLE)
           / length(text) AS mb,
         list_max([unicode(substring(text, i, 1))
                   for i in range(1, length(text)+1)]) AS xb,
         unicode(substring(text, 1, 1)) AS fb,
         (octet_length(encode(text)) - 1) // 64 + 1 AS nf
  FROM documents
  WHERE length(text) > 0
)
SELECT doc_id,
       CAST(nb AS INTEGER) AS n_bytes,
       round(mb + 0.000001, 6) AS mean_byte,
       CAST(xb AS INTEGER) AS max_byte,
       CAST(nf AS INTEGER) AS n_frames,
       round(mb / 255.0 + 0.000001, 6) AS f0,
       round(xb / 255.0 + 0.000001, 6) AS f1,
       round(fb / 255.0 + 0.000001, 6) AS f2,
       round(nf / 64.0 + 0.000001, 6) AS f3
FROM b
""",
    tags=("multimodal", "llm-pipeline"),
)(multimodal_features)


def frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: one output row per sampled 64-byte 'frame' (every
    4th), the video-pipeline explode pattern — pure Spark (posexplode
    over byte-range slices), no Python."""
    docs = load(spark, sf_dir, "documents")
    payload = with_payload(docs).select(
        "doc_id", "payload", F.col("meta.n_bytes").alias("n_bytes")
    )
    frames = (
        payload.where(F.col("n_bytes") > 0)  # empty payload => no frames
        .select(
            "doc_id",
            F.posexplode(
                F.expr(
                    "transform(sequence(0, int(floor((n_bytes-1)/64))),"
                    " i -> substring(payload, i*64+1, 64))"
                )
            ).alias("frame_no", "frame_bytes"),
        )
        .where(F.col("frame_no") % 4 == 0)
    )
    return frames.select(
        "doc_id",
        "frame_no",
        F.octet_length("frame_bytes").alias("frame_size"),
        F.md5("frame_bytes").alias("frame_md5"),
    )


register(
    "frame_sample",
    oracle="""
-- payloads are ASCII here, so char slicing == byte slicing; DuckDB md5
-- over VARCHAR hashes the same UTF-8 bytes Spark hashes over BINARY.
WITH p AS (SELECT doc_id, text, octet_length(encode(text)) AS n_bytes
           FROM documents),
frames AS (
  -- per-row range: no arbitrary frame cap, empty payloads yield no rows
  SELECT doc_id,
         unnest(range(0, greatest((n_bytes - 1) // 64 + 1, 0))) AS frame_no,
         text
  FROM p WHERE n_bytes > 0
)
SELECT doc_id, CAST(frame_no AS INTEGER) AS frame_no,
       CAST(octet_length(encode(substring(text, frame_no*64 + 1, 64))) AS INTEGER)
         AS frame_size,
       md5(substring(text, frame_no*64 + 1, 64)) AS frame_md5
FROM frames WHERE frame_no % 4 = 0
""",
    tags=("multimodal", "llm-pipeline"),
)(frame_sample)
