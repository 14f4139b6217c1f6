"""Multimodal column plumbing (SURVEY.md §2c): image/audio/video payloads as
opaque ``binary`` columns with typed metadata, plus decode / feature-extract
/ frame-sample operators.

The environment ships no media libraries, so the codec implemented here is
binary Netpbm (P5 grayscale / P6 RGB) — a real public image format simple
enough to both ENCODE (JVM-side, so containers exist without external
fixtures) and DECODE (regex header parse + numpy pixel stats) without any
dependency, which makes the full encode → Arrow → parse → stats path
oracle-checkable byte-for-byte. Heavier codecs (jpeg/wav/mp4 via
Pillow/ffmpeg) would slot into the same mapInPandas batch contract.

The fixtures carry no binary columns, so payloads are derived
deterministically from documents.text (utf-8 bytes) — the plumbing is
identical to real media bytes.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocs_duckdb_runner_spark.registry import load_table, query, spread

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


# Netpbm header: magic, whitespace-separated width/height/maxval, ONE
# whitespace byte, then raw pixel data — the real P5/P6 grammar.
_PNM_HEADER = re.compile(rb"^(P[56])\s+(\d+)\s+(\d+)\s+(\d+)\s")
# every 17th doc gets a deliberately over-declared height: a truncated
# container, so the decoder's malformed-input path is exercised (and
# oracle-checked) instead of merely existing
_CORRUPT_EVERY = 17


def decode_pnm(buf: bytes) -> dict:
    """REAL decoder for binary Netpbm images (P5 grayscale / P6 RGB):
    parse the ASCII header, then numpy over the raw pixel bytes —
    np.frombuffer + vectorized stats, no per-byte Python. Raises
    ValueError on a non-PNM payload (how a real codec surfaces junk
    bytes). Truncated pixel data (header promises more than the buffer
    holds) is decoded as far as it goes and flagged — the lenient mode a
    bulk media pipeline wants, vs erroring out a whole batch."""
    m = _PNM_HEADER.match(buf)
    if not m:
        raise ValueError("not a PNM (P5/P6) payload")
    fmt = m.group(1).decode()
    width, height, maxval = (int(m.group(i)) for i in (2, 3, 4))
    channels = 3 if fmt == "P6" else 1
    n_expected = width * height * channels
    px = np.frombuffer(buf, dtype=np.uint8, offset=m.end())[:n_expected]
    chan = [
        float(px[k::channels].mean()) if px[k::channels].size else 0.0
        for k in range(channels)
    ]
    return {
        "fmt": fmt,
        "width": width,
        "height": height,
        "maxval": maxval,
        "n_px": int(px.size),
        "truncated": px.size < n_expected,
        "mean_px": float(px.mean()) if px.size else 0.0,
        "max_px": int(px.max()) if px.size else 0,
        "c0_mean": chan[0],
        "c1_mean": chan[1] if channels == 3 else 0.0,
        "c2_mean": chan[2] if channels == 3 else 0.0,
    }


def _decode_pnm_features(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched decode: one decode_pnm per payload (variable-length
    buffers can't cross-row vectorize), numpy-vectorized within each
    payload."""
    cols = (
        "fmt width height maxval n_px truncated mean_px max_px "
        "c0_mean c1_mean c2_mean"
    ).split()
    for pdf in it:
        feats = [decode_pnm(bytes(b)) for b in pdf["payload"]]
        out = {"doc_id": pdf["doc_id"]}
        out.update({c: [f[c] for f in feats] for c in cols})
        yield pd.DataFrame(out)


def _with_pnm_payload(df: DataFrame) -> DataFrame:
    """Encode each document's bytes as a REAL binary Netpbm container,
    JVM-side: doc_id parity picks P5 (1 channel) or P6 (RGB), width
    4+doc_id%8, height = floor(byte_len / (width*channels)) so the pixel
    plane fills from the text bytes. Every _CORRUPT_EVERY-th doc
    over-declares height by 1 — a truncated file, on purpose."""
    blen = F.octet_length(F.col("text").cast("binary"))
    c = F.when(F.col("doc_id") % 2 == 1, F.lit(3)).otherwise(F.lit(1))
    w = (F.lit(4) + F.col("doc_id") % 8).cast("int")
    h = F.greatest(F.lit(1), F.floor(blen / (w * c))).cast("int") + F.when(
        F.col("doc_id") % _CORRUPT_EVERY == 0, F.lit(1)
    ).otherwise(F.lit(0))
    header = F.concat_ws(
        "",
        F.when(c == 3, F.lit("P6")).otherwise(F.lit("P5")),
        F.lit("\n"),
        w.cast("string"),
        F.lit(" "),
        h.cast("string"),
        F.lit("\n255\n"),
    )
    return df.select(
        "doc_id",
        F.concat(
            header.cast("binary"),
            F.substring(F.col("text").cast("binary"), 1, w * h * c),
        ).alias("payload"),
        F.when(c == 3, F.lit("image/x-portable-pixmap"))
        .otherwise(F.lit("image/x-portable-graymap"))
        .alias("mime"),
    )


@query(
    "mm_decode_features",
    oracle=f"""
    WITH p AS (
      SELECT doc_id, hex(encode(text)) AS hx,
             octet_length(encode(text)) AS blen,
             CASE WHEN doc_id % 2 = 1 THEN 3 ELSE 1 END AS c,
             4 + doc_id % 8 AS w
      FROM documents),
    q AS (
      SELECT *, greatest(1, CAST(floor(blen / (w * c)) AS BIGINT))
                + CASE WHEN doc_id % {_CORRUPT_EVERY} = 0 THEN 1 ELSE 0 END AS h
      FROM p),
    r AS (SELECT *, least(blen, w * h * c) AS n_px, w * h * c AS n_exp FROM q),
    px AS (
      -- byte-true pixel extraction via the hex dump (ord() over substring
      -- is CHARACTER-wise and mis-reads multi-byte UTF-8 payload bytes)
      SELECT r.doc_id, r.c, i,
             (strpos('0123456789ABCDEF',
                     substring(r.hx, CAST(2 * i - 1 AS INT), 1)) - 1) * 16
             + strpos('0123456789ABCDEF',
                      substring(r.hx, CAST(2 * i AS INT), 1)) - 1 AS v
      FROM r, unnest(generate_series(1, r.n_px)) AS t(i)),
    agg AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_px,
             avg(v) AS mean_px,
             CAST(max(v) AS INTEGER) AS max_px,
             avg(v) FILTER ((i - 1) % c = 0) AS c0_mean,
             CASE WHEN any_value(c) = 3
                  THEN avg(v) FILTER ((i - 1) % c = 1)
                  ELSE 0.0 END AS c1_mean,
             CASE WHEN any_value(c) = 3
                  THEN avg(v) FILTER ((i - 1) % c = 2)
                  ELSE 0.0 END AS c2_mean
      FROM px GROUP BY doc_id)
    SELECT r.doc_id,
           CASE WHEN r.c = 3 THEN 'P6' ELSE 'P5' END AS fmt,
           CAST(r.w AS INTEGER) AS width,
           CAST(r.h AS INTEGER) AS height,
           255 AS maxval,
           a.n_px,
           r.n_px < r.n_exp AS truncated,
           a.mean_px, a.max_px, a.c0_mean, a.c1_mean, a.c2_mean
    FROM r JOIN agg a USING (doc_id)
    """,
    tags=("llm", "multimodal", "codec"),
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + feature-extract over binary image payloads via mapInPandas
    — with a REAL codec: payloads are binary Netpbm (P5/P6) containers
    built JVM-side from the fixture bytes, and decode_pnm parses the
    actual header grammar and runs numpy over the raw pixel plane
    (dimensions, channel means, truncation detection). The oracle rebuilds
    the same features from byte arithmetic in DuckDB, so the whole
    encode → Arrow batch → parse → vectorized-stats path is hash-checked,
    including deliberately truncated containers. Swapping decode_pnm for
    Pillow/ffmpeg keeps the identical batch contract."""
    d = load_table(spark, sf_dir, "documents")
    # widen the single-object scan BEFORE the Python stage: one parquet
    # object = one split, which would serialize every decode on one core
    p = spread(_with_pnm_payload(d))
    return p.mapInPandas(
        _decode_pnm_features,
        schema=(
            "doc_id long, fmt string, width int, height int, maxval int, "
            "n_px long, truncated boolean, mean_px double, max_px int, "
            "c0_mean double, c1_mean double, c2_mean double"
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
    -- byte i extracted from the hex dump (byte-true for any UTF-8 payload,
    -- unlike character-wise ord(substring(...)))
    WITH p AS (
        SELECT doc_id, hex(encode(text)) AS hx,
               octet_length(encode(text)) AS blen
        FROM documents)
    SELECT doc_id,
           {", ".join(
               f"round(CASE WHEN blen > {i} THEN "
               f"((strpos('0123456789ABCDEF', substring(hx, {2 * i + 1}, 1)) - 1) * 16"
               f" + strpos('0123456789ABCDEF', substring(hx, {2 * i + 2}, 1)) - 1)"
               f" / 255.0 ELSE 0.0 END, 6)"
               f" AS e{i}" for i in range(4)
           )}
    FROM p
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
    # widen before the Python stage (single-object scan = single split)
    p = spread(_with_payload(d))
    schema = "doc_id long, " + ", ".join(f"e{i} double" for i in range(EMBED_DIM))
    return p.mapInPandas(_fake_embed, schema=schema)


# ---- audio: RIFF/WAVE (8-bit PCM) codec ----
#
# Same philosophy as the Netpbm image codec above: a REAL public container
# format simple enough to encode JVM-side (so binary audio columns exist
# without external fixtures) and decode with numpy — here RIFF/WAVE with
# 8-bit unsigned PCM, whose data chunk is raw sample bytes. The header's
# u32/u16 fields are little-endian BINARY (unlike Netpbm's ASCII header),
# so the encoder exercises byte-level binary construction (unhex of
# byte-swapped hex) and the decoder a real chunk walker.


def _le_hex(expr: str, n_bytes: int) -> str:
    """Spark SQL fragment: integer expression -> little-endian hex string
    of n_bytes (concat of per-byte hex, low byte first)."""
    parts = ", ".join(
        f"lpad(hex(({expr}) div {256 ** i} % 256), 2, '0')"
        for i in range(n_bytes)
    )
    return f"concat({parts})"


def _with_wav_payload(df: DataFrame) -> DataFrame:
    """Encode each document's bytes as a real RIFF/WAVE container with
    8-bit mono PCM: 44-byte canonical header (RIFF size, fmt chunk with
    format=1/channels=1/rate/byte-rate/align/bits=8, data size), then the
    text bytes as samples. Sample rate varies per doc (8/12/16/20 kHz) so
    the decoder's header parse is load-bearing, not constant."""
    blen = "octet_length(cast(text as binary))"
    rate = "8000 + cast(doc_id % 4 as int) * 4000"
    # RIFF chunks are word-aligned: an odd-length data chunk gets one pad
    # byte (not counted in the chunk's own size, but counted in the RIFF
    # container size = file bytes after offset 8)
    header_hex = (
        "concat("
        "'52494646', "  # 'RIFF'
        f"{_le_hex(f'36 + {blen} + ({blen} % 2)', 4)}, "
        "'57415645', "  # 'WAVE'
        "'666d7420', "  # 'fmt '
        f"{_le_hex('16', 4)}, "  # fmt chunk size
        f"{_le_hex('1', 2)}, "  # audio format: PCM
        f"{_le_hex('1', 2)}, "  # channels: mono
        f"{_le_hex(rate, 4)}, "  # sample rate
        f"{_le_hex(rate, 4)}, "  # byte rate (rate * 1 ch * 1 B)
        f"{_le_hex('1', 2)}, "  # block align
        f"{_le_hex('8', 2)}, "  # bits per sample
        "'64617461', "  # 'data'
        f"{_le_hex(blen, 4)})"
    )
    pad = f"CASE WHEN {blen} % 2 = 1 THEN unhex('00') ELSE unhex('') END"
    return df.select(
        "doc_id",
        F.expr(
            f"concat(unhex({header_hex}), cast(text as binary), {pad})"
        ).alias("payload"),
        F.lit("audio/wav").alias("mime"),
    )


def decode_wav(buf: bytes) -> dict:
    """REAL decoder for RIFF/WAVE 8-bit PCM: verify the RIFF/WAVE magic,
    walk the chunk list (id + u32 LE size, as the format specifies — no
    fixed-offset shortcuts), parse fmt, then numpy over the sample bytes.
    Raises ValueError on non-WAV payloads, like decode_pnm."""
    if len(buf) < 12 or buf[0:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        size = int.from_bytes(buf[pos + 4 : pos + 8], "little")
        body = buf[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            rate = int.from_bytes(body[4:8], "little")
            if int.from_bytes(body[14:16], "little") != 8:
                raise ValueError("only 8-bit PCM supported")
        elif cid == b"data":
            samples = np.frombuffer(body, dtype=np.uint8)
        pos += 8 + size + (size % 2)  # RIFF chunks are word-aligned
    if rate is None or samples is None:
        raise ValueError("missing fmt or data chunk")
    n = int(samples.size)
    centered = samples.astype(np.int64) - 128
    return {
        "sample_rate": rate,
        "n_samples": n,
        "duration_ms": n * 1000 // rate,
        # integer sums in float64 are exact (< 2^53), so mean matches the
        # oracle's avg() bit-for-bit
        "mean_amp": float(samples.mean()) if n else 0.0,
        "peak": int(samples.max()) if n else 0,
        "energy": int((centered * centered).sum()),
    }


def _decode_wav_stats(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    cols = "sample_rate n_samples duration_ms mean_amp peak energy".split()
    for pdf in it:
        feats = [decode_wav(bytes(b)) for b in pdf["payload"]]
        out = {"doc_id": pdf["doc_id"]}
        out.update({c: [f[c] for f in feats] for c in cols})
        yield pd.DataFrame(out)


@query(
    "mm_audio_stats",
    oracle="""
    WITH p AS (
        SELECT doc_id, hex(encode(text)) AS hx,
               CAST(octet_length(encode(text)) AS BIGINT) AS n,
               CAST(8000 + doc_id % 4 * 4000 AS INT) AS rate
        FROM documents),
    px AS (
        -- byte-true sample extraction via the hex dump (ord() over
        -- substring is CHARACTER-wise and would mis-read multi-byte
        -- UTF-8; hex digits are exact for any payload)
        SELECT p.doc_id,
               (strpos('0123456789ABCDEF',
                       substring(p.hx, CAST(2 * i - 1 AS INT), 1)) - 1) * 16
               + strpos('0123456789ABCDEF',
                        substring(p.hx, CAST(2 * i AS INT), 1)) - 1 AS v
        FROM p, unnest(generate_series(1, p.n)) AS t(i)),
    agg AS (
        SELECT doc_id, avg(v) AS mean_amp,
               CAST(max(v) AS INT) AS peak,
               CAST(sum((v - 128) * (v - 128)) AS BIGINT) AS energy
        FROM px GROUP BY doc_id)
    SELECT p.doc_id, p.rate AS sample_rate, p.n AS n_samples,
           CAST(p.n * 1000 // p.rate AS BIGINT) AS duration_ms,
           -- LEFT JOIN + coalesce: an empty payload has no sample rows but
           -- the decoder still reports it (mean 0.0, peak 0, energy 0)
           coalesce(a.mean_amp, 0.0) AS mean_amp,
           coalesce(a.peak, 0) AS peak,
           coalesce(a.energy, 0) AS energy
    FROM p LEFT JOIN agg a USING (doc_id)
    """,
    tags=("llm", "multimodal", "codec", "audio"),
)
def mm_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + analyze binary AUDIO payloads via mapInPandas — the audio
    leg of the multimodal surface, with a real codec: payloads are
    RIFF/WAVE 8-bit-PCM containers encoded JVM-side (binary little-endian
    header built with unhex — byte-level binary construction, unlike
    Netpbm's ASCII header), and decode_wav walks the actual RIFF chunk
    grammar before numpy computes duration/peak/mean/energy. The oracle
    rebuilds the same stats from byte arithmetic over the shared view, so
    the whole encode → Arrow → chunk-walk → vectorized-stats path is
    hash-checked. A real resampler/fbank extractor (librosa/torchaudio)
    drops into this exact batch contract; per-payload stats stay
    embarrassingly parallel at 100 TB (no shuffle at all)."""
    d = load_table(spark, sf_dir, "documents")
    # same single-split hazard as mm_decode_features: widen before Python
    p = spread(_with_wav_payload(d))
    return p.mapInPandas(
        _decode_wav_stats,
        schema=(
            "doc_id long, sample_rate int, n_samples long, duration_ms long, "
            "mean_amp double, peak int, energy long"
        ),
    )


def _dispatch_decode(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Heterogeneous batch decode: inspect each payload's magic bytes and
    route to the matching codec — the ingestion shape of a mixed-media
    corpus (one binary column, many container formats)."""
    for pdf in it:
        ids, modality, n_units, mean_val = [], [], [], []
        for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
            buf = bytes(b)
            if buf[:4] == b"RIFF":
                f = decode_wav(buf)
                modality.append("audio")
                n_units.append(f["n_samples"])
                mean_val.append(f["mean_amp"])
            else:
                f = decode_pnm(buf)
                modality.append("image")
                n_units.append(f["n_px"])
                mean_val.append(f["mean_px"])
            ids.append(doc_id)
        yield pd.DataFrame(
            {
                "doc_id": ids,
                "modality": modality,
                "n_units": n_units,
                "mean_val": mean_val,
            }
        )


@query(
    "mm_dispatch_decode",
    oracle=f"""
    WITH p AS (
        SELECT doc_id, hex(encode(text)) AS hx,
               CAST(octet_length(encode(text)) AS BIGINT) AS blen
        FROM documents),
    dims AS (
        -- odd docs are P6 images: 3 channels, width 4+doc_id%8, height as
        -- the encoder declares (over-declared every {_CORRUPT_EVERY}th doc)
        SELECT doc_id, hx, blen,
               CASE WHEN doc_id % 2 = 0 THEN blen
                    ELSE least(blen,
                         (4 + doc_id % 8) * 3 *
                         (greatest(1, blen // ((4 + doc_id % 8) * 3))
                          + CASE WHEN doc_id % {_CORRUPT_EVERY} = 0
                                 THEN 1 ELSE 0 END))
               END AS n_units
        FROM p),
    px AS (
        SELECT d.doc_id,
               (strpos('0123456789ABCDEF',
                       substring(d.hx, CAST(2 * i - 1 AS INT), 1)) - 1) * 16
               + strpos('0123456789ABCDEF',
                        substring(d.hx, CAST(2 * i AS INT), 1)) - 1 AS v
        FROM dims d, unnest(generate_series(1, d.n_units)) AS t(i)),
    agg AS (SELECT doc_id, avg(v) AS mean_val FROM px GROUP BY doc_id)
    SELECT d.doc_id,
           CASE WHEN d.doc_id % 2 = 0 THEN 'audio' ELSE 'image' END
             AS modality,
           d.n_units,
           coalesce(a.mean_val, 0.0) AS mean_val
    FROM dims d LEFT JOIN agg a USING (doc_id)
    """,
    tags=("llm", "multimodal", "codec", "dispatch"),
)
def mm_dispatch_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-modality ingestion: HALF the corpus is encoded as RIFF/WAVE
    audio (even doc_id), half as binary Netpbm images (odd doc_id), all in
    ONE binary payload column — and a single mapInPandas pass dispatches
    each payload to the right codec by its magic bytes (RIFF vs P5/P6),
    the way a real media lake decodes a heterogeneous crawl. Emits the
    modality-agnostic summary (modality, unit count, mean amplitude/pixel).

    The oracle reproduces both codecs' unit counts from the container
    arithmetic (audio: data bytes; image: the width x height x channels
    plane, truncation-capped) over the byte-true hex dump. Plan: two
    map-side encoder projections unioned, then Arrow-batched decode —
    partition-parallel, no shuffle at any scale; the union is planned as
    two scans of the same file with disjoint pushed filters."""
    d = load_table(spark, sf_dir, "documents")
    wav = _with_wav_payload(d.filter(F.col("doc_id") % 2 == 0))
    pnm = _with_pnm_payload(d.filter(F.col("doc_id") % 2 == 1))
    p = spread(wav.unionByName(pnm, allowMissingColumns=True))
    return p.select("doc_id", "payload").mapInPandas(
        _dispatch_decode,
        schema="doc_id long, modality string, n_units long, mean_val double",
    )


def _resize_pnm_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched nearest-neighbor 2x downscale of P5 payloads: decode,
    reshape (h, w), stride [::2, ::2] — the numpy idiom a real image
    pipeline uses before feature extraction."""
    for pdf in it:
        rows = {
            "doc_id": [], "out_w": [], "out_h": [],
            "n_out": [], "sum_px": [], "mean_px": [],
        }
        for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
            buf = bytes(b)
            m = _PNM_HEADER.match(buf)
            if not m or m.group(1) != b"P5":
                raise ValueError("resize expects a P5 payload")
            w, h = int(m.group(2)), int(m.group(3))
            # plane may be truncated below w*h (blen < w clamps h to 1):
            # keep-by-index arithmetic matches the oracle's r/c derivation
            # for partial planes and equals reshape(h, w)[::2, ::2] on full
            # ones; zero-pixel payloads drop out like the oracle's empty
            # generate_series
            px = np.frombuffer(buf, dtype=np.uint8, offset=m.end())[: w * h]
            idx = np.arange(px.size)
            kept = px[((idx // w) % 2 == 0) & ((idx % w) % 2 == 0)]
            if kept.size == 0:
                continue
            rows["doc_id"].append(doc_id)
            rows["out_w"].append((w + 1) // 2)
            rows["out_h"].append((h + 1) // 2)
            rows["n_out"].append(int(kept.size))
            rows["sum_px"].append(int(kept.astype(np.int64).sum()))
            rows["mean_px"].append(round(float(kept.mean()), 9))
        yield pd.DataFrame(rows)


@query(
    "mm_image_resize",
    oracle=f"""
    WITH p AS (
      SELECT doc_id, hex(encode(text)) AS hx,
             octet_length(encode(text)) AS blen,
             4 + doc_id % 8 AS w
      FROM documents
      WHERE doc_id % 2 = 0 AND doc_id % {_CORRUPT_EVERY} <> 0),
    q AS (SELECT *, greatest(1, CAST(floor(blen / w) AS BIGINT)) AS h FROM p),
    px AS (
      SELECT q.doc_id, q.w, q.h, t.i,
             ((t.i - 1) // q.w) AS r, ((t.i - 1) % q.w) AS c,
             (strpos('0123456789ABCDEF',
                     substring(q.hx, CAST(2 * t.i - 1 AS INT), 1)) - 1) * 16
             + strpos('0123456789ABCDEF',
                      substring(q.hx, CAST(2 * t.i AS INT), 1)) - 1 AS v
      FROM q, unnest(generate_series(1, least(q.blen, q.w * q.h))) AS t(i)),
    kept AS (SELECT * FROM px WHERE r % 2 = 0 AND c % 2 = 0)
    SELECT doc_id,
           CAST((any_value(w) + 1) // 2 AS BIGINT) AS out_w,
           CAST((any_value(h) + 1) // 2 AS BIGINT) AS out_h,
           CAST(count(*) AS BIGINT) AS n_out,
           CAST(sum(v) AS BIGINT) AS sum_px,
           round(CAST(sum(v) AS DOUBLE) / count(*), 9) AS mean_px
    FROM kept GROUP BY doc_id
    """,
    tags=("llm", "multimodal", "codec", "resize"),
)
def mm_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image RESIZE as a real pixel transform (not just stats): P5
    grayscale payloads decode to an (h, w) numpy grid and downscale 2x by
    nearest-neighbor striding — the cheap pre-filter step every vision
    ingestion pipeline runs before feature extraction (Pillow/opencv
    would slot into the same mapInPandas contract with interpolating
    kernels). Corrupt/truncated containers are excluded upstream by the
    same parity/corrupt gates the encoder uses, so the pixel plane is
    always full. The oracle recomputes the kept-pixel set (even row, even
    col) byte-true from the hex dump — output dims, count, integer pixel
    sum, and mean must all match exactly.

    Plan: encode + gate are JVM expressions; the resize is one Arrow
    mapInPandas pass (per-payload numpy, no per-byte Python); no shuffle
    anywhere."""
    d = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") % 2 == 0) & (F.col("doc_id") % _CORRUPT_EVERY != 0)
    )
    payload = _with_pnm_payload(d).select("doc_id", "payload")
    out = payload.mapInPandas(
        _resize_pnm_batches,
        "doc_id long, out_w long, out_h long, n_out long, sum_px long,"
        " mean_px double",
    )
    return out


def _phash_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched perceptual block-hash of P5 payloads: decode,
    bincount pixel sums/counts onto a 4x4 cell grid, then 12 horizontal
    + 12 vertical neighbor comparisons -> 24-bit hash. Comparisons use
    the integer cross-multiply s_a*n_b > s_b*n_a (cell MEANS compared
    without ever forming a float), so the hash is bit-exact against the
    SQL oracle."""
    for pdf in it:
        ids, hashes = [], []
        for did, b in zip(pdf["doc_id"], pdf["payload"]):
            buf = bytes(b)
            m = _PNM_HEADER.match(buf)
            if not m or m.group(1) != b"P5":
                raise ValueError("phash expects a P5 payload")
            w, h = int(m.group(2)), int(m.group(3))
            px = np.frombuffer(buf, dtype=np.uint8, offset=m.end())[
                : w * h
            ].astype(np.int64)
            idx = np.arange(px.size)
            cell = (idx // w * 4) // h * 4 + (idx % w * 4) // w
            s = np.bincount(cell, weights=px, minlength=16).astype(np.int64)
            n = np.bincount(cell, minlength=16).astype(np.int64)
            ph = 0
            for rr in range(4):
                for cc in range(3):
                    a, bb = rr * 4 + cc, rr * 4 + cc + 1
                    if s[a] * n[bb] > s[bb] * n[a]:
                        ph |= 1 << (rr * 3 + cc)
            for rr in range(3):
                for cc in range(4):
                    a, bb = rr * 4 + cc, (rr + 1) * 4 + cc
                    if s[a] * n[bb] > s[bb] * n[a]:
                        ph |= 1 << (12 + rr * 4 + cc)
            ids.append(did)
            hashes.append(ph)
        yield pd.DataFrame({"doc_id": ids, "phash": hashes})


# the full phash pipeline as a reusable oracle CTE chain (ends at
# `ph AS (doc_id, phash)`) — shared by mm_image_phash and the banded
# hamming-pair join below
_SQL_PHASH = f"""
    p AS (
      SELECT doc_id, hex(encode(text)) AS hx,
             octet_length(encode(text)) AS blen,
             4 + doc_id % 8 AS w
      FROM documents
      WHERE doc_id % 2 = 0 AND doc_id % {_CORRUPT_EVERY} <> 0),
    q AS (SELECT *, greatest(1, CAST(floor(blen / w) AS BIGINT)) AS h FROM p),
    px AS (
      SELECT q.doc_id, q.w, q.h, ((t.i - 1) // q.w) AS r,
             ((t.i - 1) % q.w) AS c,
             (strpos('0123456789ABCDEF',
                     substring(q.hx, CAST(2 * t.i - 1 AS INT), 1)) - 1) * 16
             + strpos('0123456789ABCDEF',
                      substring(q.hx, CAST(2 * t.i AS INT), 1)) - 1 AS v
      FROM q, unnest(generate_series(1, least(q.blen, q.w * q.h))) AS t(i)),
    cells AS (
      SELECT doc_id, (r * 4) // h AS rc, (c * 4) // w AS cc,
             CAST(sum(v) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n
      FROM px GROUP BY doc_id, rc, cc),
    hbits AS (
      SELECT a.doc_id,
             CAST(coalesce(sum(CASE WHEN a.s * b.n > b.s * a.n
                  THEN CAST(1 AS BIGINT) << CAST(a.rc * 3 + a.cc AS INT)
                  ELSE 0 END), 0) AS BIGINT) AS hb
      FROM cells a JOIN cells b
        ON a.doc_id = b.doc_id AND a.rc = b.rc AND b.cc = a.cc + 1
      GROUP BY a.doc_id),
    vbits AS (
      SELECT a.doc_id,
             CAST(coalesce(sum(CASE WHEN a.s * b.n > b.s * a.n
                  THEN CAST(1 AS BIGINT) << CAST(12 + a.rc * 4 + a.cc AS INT)
                  ELSE 0 END), 0) AS BIGINT) AS vb
      FROM cells a JOIN cells b
        ON a.doc_id = b.doc_id AND b.rc = a.rc + 1 AND a.cc = b.cc
      GROUP BY a.doc_id),
    ph AS (SELECT h.doc_id, h.hb + v.vb AS phash
           FROM hbits h JOIN vbits v USING (doc_id))
"""


def _phash_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, phash) for the clean P5 subset — the Spark twin of the
    `ph` oracle CTE."""
    d = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") % 2 == 0) & (F.col("doc_id") % _CORRUPT_EVERY != 0)
    )
    payload = _with_pnm_payload(d).select("doc_id", "payload")
    return payload.mapInPandas(_phash_batches, "doc_id long, phash long")


@query(
    "mm_image_phash",
    oracle=f"""
    WITH {_SQL_PHASH},
    canon AS (SELECT phash, min(doc_id) AS keeper FROM ph GROUP BY phash)
    SELECT ph.doc_id, ph.phash,
           CASE WHEN c.keeper < ph.doc_id THEN c.keeper END AS dup_of,
           c.keeper < ph.doc_id AS is_dup
    FROM ph JOIN canon c USING (phash)
    """,
    tags=("llm", "multimodal", "dedup", "phash"),
)
def mm_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image dedup — the vision analog of dedup_simhash: each
    P5 image reduces to a 24-bit block-hash (4x4 cell-mean grid, one bit
    per horizontal/vertical neighbor ordering), and images sharing a
    hash collapse to the lowest doc_id keeper. Block-hash survives
    re-encoding and brightness-preserving noise exactly the way a
    training-data pipeline needs for near-identical frame/thumbnail
    collapse; a production variant widens the grid (pHash/dHash 64-bit)
    and adds a hamming-ball band join — same plumbing.

    Exactness: cell means are never formed — bit b compares integer
    cross-products s_a*n_b vs s_b*n_a, so the hash, the keeper, and the
    dup flags are bit-identical to the byte-true DuckDB oracle (which
    rebuilds pixels from the hex dump).

    Plan: encode + gate JVM-side, ONE Arrow mapInPandas pass for the
    hash (numpy bincount per payload, no per-byte Python), then a
    key-only groupBy/join on the 24-bit hash — the dedup collapse
    shuffles 12-byte rows regardless of image size. At 100 TB of
    images the hash pass is embarrassingly parallel and the join is a
    bounded-key exchange."""
    ph = _phash_frame(spark, sf_dir)
    canon = ph.groupBy("phash").agg(F.min("doc_id").alias("keeper"))
    return ph.join(canon, "phash").select(
        "doc_id",
        "phash",
        F.when(F.col("keeper") < F.col("doc_id"), F.col("keeper")).alias(
            "dup_of"
        ),
        (F.col("keeper") < F.col("doc_id")).alias("is_dup"),
    )


_HAM_BANDS = 3  # 3 bands x 8 bits over the 24-bit hash
_HAM_MAX = 2  # pigeonhole: d <= bands-1 pairs always share a band


@query(
    "mm_phash_hamming_pairs",
    oracle=f"""
    WITH {_SQL_PHASH},
    bands AS (
        SELECT doc_id, phash, t.j,
               (phash >> CAST(8 * t.j AS INT)) & 255 AS bv
        FROM ph, unnest(generate_series(0, {_HAM_BANDS - 1})) AS t(j)),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
               a.phash AS pa, b.phash AS pb
        FROM bands a JOIN bands b
          ON a.j = b.j AND a.bv = b.bv AND a.doc_id < b.doc_id)
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(pa, pb)) AS BIGINT) AS hamming
    FROM cand WHERE bit_count(xor(pa, pb)) <= {_HAM_MAX}
    """,
    tags=("llm", "multimodal", "dedup", "phash", "lsh"),
)
def mm_phash_hamming_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR-duplicate image pairs under Hamming distance <= {_HAM_MAX} on
    the 24-bit block-hash — the banded LSH join that turns mm_image_phash
    from exact-collision dedup into perceptual-radius dedup (one or two
    flipped comparison bits = slight brightness/noise change). The
    3-bands-of-8-bits split is the pigeonhole guarantee: any pair within
    distance 2 agrees on at least one full band, so candidates = pairs
    sharing a band value and recall at the radius is exactly 1 — the
    same band trick dedup_minhash uses for Jaccard, applied to Hamming
    space.

    Plan: the hash frame (one Arrow pass) explodes to {_HAM_BANDS} band
    rows per image; candidates come from an equi-join on (band index,
    band value) — never an all-pairs product — then one map-side
    bit_count(xor) gate. Candidate volume is sum of squared bucket
    sizes, the LSH-bounded quantity; at 100 TB the band join is the
    identical shuffle the MinHash path already scales, with 16-byte
    rows."""
    ph = _phash_frame(spark, sf_dir)
    jdx = spark.range(_HAM_BANDS).select(F.col("id").alias("j"))
    bands = ph.crossJoin(F.broadcast(jdx)).select(
        "doc_id",
        "phash",
        "j",
        F.expr("shiftright(phash, CAST(8 * j AS INT)) & 255").alias("bv"),
    )
    a = bands.toDF("doc_a", "pa", "j", "bv")
    b = bands.toDF("doc_b", "pb", "j", "bv")
    cand = (
        a.join(b, ["j", "bv"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "pa", "pb")
        .distinct()
    )
    ham = F.bit_count(F.col("pa").bitwiseXOR(F.col("pb")))
    return cand.filter(ham <= _HAM_MAX).select(
        "doc_a", "doc_b", ham.cast("long").alias("hamming")
    )


_VAD_FRAME = 160  # samples per analysis frame (10-20 ms at 8-16 kHz)
_VAD_T = 2500  # mean-square activity threshold (integer grid)


def _vad_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched activity segmentation: decode WAV, frame the sample
    stream, frame energy = integer sum of squared centered samples,
    active iff energy > _VAD_T * frame_len (integer cross-multiply, no
    float), then run-length the active mask for segment stats."""
    for pdf in it:
        rows = {
            "doc_id": pdf["doc_id"], "n_frames": [], "n_active": [],
            "n_segments": [], "longest_run": [],
        }
        for b in pdf["payload"]:
            d = decode_wav(bytes(b))
            n = d["n_samples"]
            # reconstruct centered samples for framing
            buf = bytes(b)
            pos = buf.index(b"data") + 8
            samples = np.frombuffer(
                buf, dtype=np.uint8, count=n, offset=pos
            ).astype(np.int64) - 128
            nf = -(-n // _VAD_FRAME) if n else 0
            e = np.zeros(nf, dtype=np.int64)
            cnt = np.zeros(nf, dtype=np.int64)
            if n:
                fidx = np.arange(n) // _VAD_FRAME
                np.add.at(e, fidx, samples * samples)
                np.add.at(cnt, fidx, 1)
            act = e > _VAD_T * cnt
            starts = int(
                (act & ~np.concatenate(([False], act[:-1]))).sum()
            )
            longest = 0
            run = 0
            for a in act:
                run = run + 1 if a else 0
                longest = max(longest, run)
            rows["n_frames"].append(nf)
            rows["n_active"].append(int(act.sum()))
            rows["n_segments"].append(starts)
            rows["longest_run"].append(longest)
        yield pd.DataFrame(rows)


@query(
    "mm_audio_vad_segments",
    oracle=f"""
    WITH p AS (
        SELECT doc_id, hex(encode(text)) AS hx,
               CAST(octet_length(encode(text)) AS BIGINT) AS n
        FROM documents),
    px AS (
        SELECT p.doc_id, (t.i - 1) // {_VAD_FRAME} AS f,
               (strpos('0123456789ABCDEF',
                       substring(p.hx, CAST(2 * t.i - 1 AS INT), 1)) - 1) * 16
               + strpos('0123456789ABCDEF',
                        substring(p.hx, CAST(2 * t.i AS INT), 1)) - 1 - 128
                   AS v
        FROM p, unnest(generate_series(1, p.n)) AS t(i)),
    frames AS (
        SELECT doc_id, f, CAST(sum(v * v) AS BIGINT) AS e,
               CAST(count(*) AS BIGINT) AS nf
        FROM px GROUP BY doc_id, f),
    flag AS (SELECT *, e > {_VAD_T} * nf AS act FROM frames),
    isl AS (
        SELECT doc_id, f,
               f - row_number() OVER (PARTITION BY doc_id ORDER BY f) AS grp
        FROM flag WHERE act),
    seg AS (SELECT doc_id, grp, CAST(count(*) AS BIGINT) AS len
            FROM isl GROUP BY doc_id, grp),
    per_seg AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segments,
               CAST(max(len) AS BIGINT) AS longest_run
        FROM seg GROUP BY doc_id),
    per_frame AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_frames,
               CAST(sum(CASE WHEN act THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_active
        FROM flag GROUP BY doc_id)
    SELECT p.doc_id,
           coalesce(pf.n_frames, 0) AS n_frames,
           coalesce(pf.n_active, 0) AS n_active,
           coalesce(ps.n_segments, 0) AS n_segments,
           coalesce(ps.longest_run, 0) AS longest_run
    FROM p
    LEFT JOIN per_frame pf USING (doc_id)
    LEFT JOIN per_seg ps USING (doc_id)
    """,
    tags=("llm", "multimodal", "audio", "vad"),
)
def mm_audio_vad_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity segmentation over audio payloads — the VAD-shaped pass a
    speech-data pipeline runs to cut silence and measure usable speech:
    frame the 8-bit PCM stream ({_VAD_FRAME} samples/frame), mark frames
    whose mean-square energy clears a threshold (compared as the integer
    cross-product energy > T*len — no float forms), then run-length the
    active mask into segments (count, longest run). A real VAD
    (webrtcvad / silero) slots into the identical per-payload batch
    contract; the framing, thresholding, and run-length bookkeeping are
    what the engine owns either way.

    Plan: ONE Arrow mapInPandas pass, zero shuffle — framing and
    run-length are numpy per payload; the oracle rebuilds frames from
    the hex dump and runs the classic gaps-and-islands SQL. Per-doc
    stats stay embarrassingly parallel at 100 TB."""
    d = load_table(spark, sf_dir, "documents")
    p = spread(_with_wav_payload(d))
    return p.mapInPandas(
        _vad_batches,
        schema=(
            "doc_id long, n_frames long, n_active long,"
            " n_segments long, longest_run long"
        ),
    )


def _mm_feat_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """One decode per payload serving both consumers: the block-hash and
    the header geometry come out of the same Arrow batch pass."""
    for pdf in it:
        hashed = next(_phash_batches(iter([pdf])))
        dims = [decode_pnm(bytes(b)) for b in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "phash": hashed["phash"],
                "width": [f["width"] for f in dims],
                "height": [f["height"] for f in dims],
            }
        )


@query(
    "pipeline_mm_curation",
    oracle=f"""
    WITH {_SQL_PHASH},
    canon AS (SELECT phash, min(doc_id) AS keeper FROM ph GROUP BY phash),
    keep AS (
        SELECT ph.doc_id, ph.phash FROM ph
        JOIN canon c USING (phash) WHERE c.keeper = ph.doc_id),
    audio AS (
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n,
               CAST(8000 + doc_id % 4 * 4000 AS INT) AS rate
        FROM documents)
    SELECT k.doc_id, k.phash,
           CAST(p.w AS INTEGER) AS width,
           CAST(q.h AS INTEGER) AS height,
           CAST(a.n * 1000 // a.rate AS BIGINT) AS duration_ms
    FROM keep k
    JOIN p ON p.doc_id = k.doc_id
    JOIN q ON q.doc_id = k.doc_id
    JOIN audio a ON a.doc_id = k.doc_id
    """,
    tags=("llm", "multimodal", "pipeline", "dedup"),
)
def pipeline_mm_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal curation end-to-end — the composed pass a training-data
    pipeline runs over a mixed media corpus: decode the image payloads
    (real Netpbm parse), collapse perceptual duplicates to their lowest-
    id keeper (block-hash groupBy), and emit a per-keeper manifest row
    joining image geometry with the audio leg's decoded duration — one
    row per surviving asset, ready for an export sharder.

    Plan: two independent Arrow decode passes (image hash+dims, audio
    stats) that never shuffle, one key-only hash join on the 24-bit
    phash for the keeper set, and doc_id equi-joins for the manifest —
    the composition adds NO new shuffle class beyond its parts, which
    is the property that lets these pipelines stack at 100 TB. The
    oracle rebuilds the keeper set from the shared byte-true phash CTE
    chain and the geometry/duration from the container grammar."""
    d = load_table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") % 2 == 0) & (F.col("doc_id") % _CORRUPT_EVERY != 0)
    )
    payload = _with_pnm_payload(d).select("doc_id", "payload")
    feats = payload.mapInPandas(
        _mm_feat_batches, "doc_id long, phash long, width int, height int"
    )
    canon = feats.groupBy("phash").agg(F.min("doc_id").alias("keeper"))
    keep = feats.join(canon, "phash").filter(
        F.col("keeper") == F.col("doc_id")
    )
    audio = spread(_with_wav_payload(d)).mapInPandas(
        _decode_wav_stats,
        schema=(
            "doc_id long, sample_rate int, n_samples long, duration_ms long, "
            "mean_amp double, peak int, energy long"
        ),
    ).select("doc_id", "duration_ms")
    return keep.join(audio, "doc_id").select(
        "doc_id", "phash", "width", "height", "duration_ms"
    )


@query(
    "mm_frame_reuse_across_docs",
    oracle=f"""
    WITH p AS (SELECT doc_id, text,
                      octet_length(encode(text)) AS byte_len
               FROM documents),
    frames AS (
        SELECT doc_id,
               md5(substring(text, CAST(i * {FRAME_STRIDE} + 1 AS INT),
                             {FRAME_BYTES})) AS frame_md5
        FROM p, unnest(generate_series(0,
               CAST(floor((byte_len - {FRAME_BYTES}) / {FRAME_STRIDE})
                    AS BIGINT))) AS t(i)
        WHERE byte_len >= {FRAME_BYTES})
    SELECT frame_md5,
           CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(count(*) AS BIGINT) AS n_occurrences,
           CAST(min(doc_id) AS BIGINT) AS first_doc
    FROM frames
    GROUP BY frame_md5
    HAVING count(DISTINCT doc_id) >= 2
    """,
    tags=("llm", "multimodal", "dedup", "reuse"),
)
def mm_frame_reuse_across_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document frame reuse — which byte-level frames appear
    verbatim in MORE THAN ONE asset: the stock-footage / re-encoded-
    segment detector that catches partial copies whole-file hashing
    (dedup_exact) and whole-image hashing (mm_image_phash) both miss.
    Reuses mm_frame_sample's fingerprint grid; a frame shared by >= 2
    distinct documents is reported with its spread and earliest source.

    Plan: the frame explode is map-side; ONE hash aggregate keyed on
    the 16-byte frame fingerprint (map-side combine collapses
    within-doc repeats first) — the shuffle carries fingerprints, never
    payload bytes, the inverted-index shape every dedup operator here
    scales on."""
    d = load_table(spark, sf_dir, "documents")
    p = _with_payload(d).filter(F.col("byte_len") >= FRAME_BYTES)
    n_frames = F.floor(
        (F.col("byte_len") - F.lit(FRAME_BYTES)) / F.lit(FRAME_STRIDE)
    ).cast("int")
    idx = F.explode(F.sequence(F.lit(0), n_frames)).alias("frame_idx")
    frames = p.select("doc_id", "payload", idx).select(
        "doc_id",
        F.md5(
            F.substring(
                F.col("payload"),
                F.col("frame_idx") * FRAME_STRIDE + 1,
                FRAME_BYTES,
            )
        ).alias("frame_md5"),
    )
    return (
        frames.groupBy("frame_md5")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min("doc_id").alias("first_doc"),
        )
        .filter(F.col("n_docs") >= 2)
    )
