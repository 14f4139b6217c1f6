"""Multimodal column plumbing (SURVEY.md §2c): image/audio/video payloads as
opaque ``binary`` columns with typed metadata, plus decode / feature-extract
/ frame-sample operators.

The container has no image/audio codecs, so the DECODE step is stubbed
(deterministic fake features behind a clearly-marked gate; the real decoder
raises NotImplementedError) — but the Spark-side plumbing is real and
tested: binary column construction, schema contracts, Arrow batch shape
through mapInPandas, and partition-parallel frame sampling. Swapping the
fake for Pillow/ffmpeg is a one-function change.

The fixtures carry no binary columns, so payloads are derived
deterministically from documents.text (utf-8 bytes) — the plumbing is
identical to real media bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocs_duckdb_runner_spark.registry import load_table, query

FRAME_BYTES = 16  # "frame" = 16-byte block of the payload ("video" stand-in)
FRAME_STRIDE = 64  # sample one frame every 64 bytes


def _with_payload(df: DataFrame) -> DataFrame:
    """Attach the opaque binary payload + typed metadata columns — the
    schema a real multimodal table would carry (bytes, mime, byte_len)."""
    blob = F.col("text").cast("binary")
    return df.select(
        "doc_id",
        blob.alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.octet_length(blob).cast("long").alias("byte_len"),
    )


@query(
    "mm_binary_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           md5(text) AS payload_md5,
           lower(hex(encode(substring(text, 1, 4)))) AS magic_hex
    FROM documents
    """,
    tags=("llm", "multimodal"),
)
def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over an opaque binary column: byte length, content
    hash, magic-bytes prefix (how real pipelines sniff jpeg/png/wav) —
    all JVM-side, no decode."""
    d = load_table(spark, sf_dir, "documents")
    p = _with_payload(d)
    return p.select(
        "doc_id",
        "byte_len",
        F.md5("payload").alias("payload_md5"),
        F.lower(F.hex(F.substring(F.col("payload"), 1, 4))).alias("magic_hex"),
    )


@query(
    "mm_frame_sample",
    oracle=f"""
    WITH p AS (SELECT doc_id, text,
                      octet_length(encode(text)) AS byte_len
               FROM documents)
    SELECT doc_id, CAST(i AS INT) AS frame_idx,
           md5(substring(text, CAST(i * {FRAME_STRIDE} + 1 AS INT),
                         {FRAME_BYTES})) AS frame_md5
    FROM p, unnest(generate_series(0,
           CAST(floor((byte_len - {FRAME_BYTES}) / {FRAME_STRIDE}) AS BIGINT)))
         AS t(i)
    WHERE byte_len >= {FRAME_BYTES}
    """,
    tags=("llm", "multimodal"),
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over a binary payload (video keyframe analog): every
    FRAME_STRIDE bytes, slice a FRAME_BYTES block and fingerprint it.
    Pure lateral explode over a generated index — partition-parallel,
    no Python, and oracle-checked byte-for-byte."""
    d = load_table(spark, sf_dir, "documents")
    p = _with_payload(d).filter(F.col("byte_len") >= FRAME_BYTES)
    n_frames = F.floor(
        (F.col("byte_len") - F.lit(FRAME_BYTES)) / F.lit(FRAME_STRIDE)
    ).cast("int")
    idx = F.explode(F.sequence(F.lit(0), n_frames)).alias("frame_idx")
    return p.select("doc_id", "payload", idx).select(
        "doc_id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        F.md5(
            F.substring(
                F.col("payload"), F.col("frame_idx") * FRAME_STRIDE + 1, FRAME_BYTES
            )
        ).alias("frame_md5"),
    )


def decode_image(payload: bytes) -> dict:
    """REAL decoder entry point — intentionally unimplemented: the
    container ships no codecs. Swap in Pillow/torchaudio/ffmpeg here."""
    raise NotImplementedError(
        "media codecs are not available in this environment; "
        "mm_decode_features uses the deterministic stub instead"
    )


def _fake_decode_features(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic stand-in feature extractor with the SAME Arrow batch
    shape a real decoder would have: payload bytes in → fixed-width
    feature row out (byte stats + 4-bin histogram)."""
    for pdf in it:
        payloads = pdf["payload"]
        rows = {
            "doc_id": pdf["doc_id"],
            "n_bytes": payloads.map(len).astype("int64"),
            "mean_byte": payloads.map(
                lambda b: float(sum(b)) / len(b) if len(b) else 0.0
            ),
            "hist_q1": payloads.map(lambda b: sum(1 for x in b if x < 64)),
            "hist_q2": payloads.map(lambda b: sum(1 for x in b if 64 <= x < 128)),
            "hist_q3": payloads.map(lambda b: sum(1 for x in b if 128 <= x < 192)),
            "hist_q4": payloads.map(lambda b: sum(1 for x in b if x >= 192)),
        }
        yield pd.DataFrame(rows)


@query("mm_decode_features", oracle=None, tags=("llm", "multimodal", "stub"))
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/feature-extract via mapInPandas (Arrow batch iterator) — the
    real plumbing for a codec UDF: binary in, fixed-schema features out,
    partition-parallel. Decode itself is the deterministic stub
    (_fake_decode_features); decode_image is the marked real entry point."""
    d = load_table(spark, sf_dir, "documents")
    p = _with_payload(d)
    return p.mapInPandas(
        _fake_decode_features,
        schema=(
            "doc_id long, n_bytes long, mean_byte double, "
            "hist_q1 long, hist_q2 long, hist_q3 long, hist_q4 long"
        ),
    )


EMBED_DIM = 4  # fixed output width — the "resize to model input" analog


def _fake_embed(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic stand-in embedding extractor: payload byte i → channel
    i scaled to [0,1], zero-padded to EMBED_DIM — the fixed-width resize+
    normalize contract of a real vision/audio encoder, minus the codec."""
    for pdf in it:
        payloads = pdf["payload"]
        rows = {"doc_id": pdf["doc_id"]}
        for i in range(EMBED_DIM):
            rows[f"e{i}"] = payloads.map(
                lambda b, i=i: round(b[i] / 255.0, 6) if len(b) > i else 0.0
            )
        yield pd.DataFrame(rows)


@query(
    "mm_embed_extract",
    oracle=f"""
    SELECT doc_id,
           {", ".join(
               f"round(CASE WHEN octet_length(encode(text)) > {i} THEN "
               f"ord(substring(text, {i + 1}, 1)) / 255.0 ELSE 0.0 END, 6)"
               f" AS e{i}" for i in range(4)
           )}
    FROM documents
    """,
    tags=("llm", "multimodal", "embed"),
)
def mm_embed_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction to a FIXED-WIDTH embedding via mapInPandas —
    unlike mm_decode_features this one is EXACTLY oracle-checked: the stub
    embedding (byte i / 255, zero-padded) is SQL-expressible, so a pass
    proves the Arrow round trip (binary → pandas → double columns) is
    byte-exact, not merely that it runs. Swap _fake_embed's body for a
    real encoder and the schema/partitioning/batching contract is already
    validated. ASCII fixture text ⇒ ord(char) == byte value in the
    oracle."""
    d = load_table(spark, sf_dir, "documents")
    p = _with_payload(d)
    schema = "doc_id long, " + ", ".join(f"e{i} double" for i in range(EMBED_DIM))
    return p.mapInPandas(_fake_embed, schema=schema)
