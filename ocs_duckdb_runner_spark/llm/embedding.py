"""Text embedding via Arrow-batched mapInPandas (SURVEY.md §2c follow-on):
the one LLM-pipeline staple that inherently lives on the Python side of the
Arrow boundary — a per-batch encoder producing a fixed-width vector column.

The encoder here is the feature-hashing trick (Weinberger et al.: hash each
token into one of D signed buckets, sum, L2-normalize) — deterministic and
md5-based, so the SAME arithmetic is expressible in DuckDB and the whole
Arrow round trip (text batches in → vector column out) is hash-checked,
exactly the way a real sentence-encoder swap-in would be validated on a
sample. Exactness: bucket sums are integers (exact), the L2 norm is one
sqrt and one divide per component — IEEE-correctly-rounded on both
engines, so no rounding fudge is needed.

Batch shape is the real knob at scale: mapInPandas receives Arrow batches
of up to spark.sql.execution.arrow.maxRecordsPerBatch rows (default 10k).
A transformer encoder wants batches sized to device memory (hundreds of
rows); this hash encoder wants them as LARGE as fits in heap, since its
cost per batch is one Python dispatch + a vocabulary-cached hash per
token. See SCALING.md for measurements.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from functools import lru_cache

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ocs_duckdb_runner_spark.registry import load_table, query, spread

EMBED_BUCKETS = 8  # D: output dimensionality of the hashed embedding


@lru_cache(maxsize=1 << 16)
def _token_bucket_sign(tok: str) -> tuple[int, int]:
    """(bucket, sign) from the first two hex chars of md5(token) — the
    exact arithmetic the DuckDB oracle mirrors with strpos over the hex
    string. Cached: real corpora hit a head-heavy vocabulary, so the md5
    runs once per distinct token per executor, not once per occurrence."""
    h = hashlib.md5(tok.encode("utf-8")).hexdigest()
    return int(h[0], 16) % EMBED_BUCKETS, 1 if int(h[1], 16) % 2 == 0 else -1


def _embed_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """One Arrow batch in → one batch of L2-normalized vectors out.
    Bucket accumulation is a numpy int matrix (exact); the normalize is
    vectorized across the whole batch."""
    for pdf in it:
        mat = np.zeros((len(pdf), EMBED_BUCKETS), dtype=np.int64)
        for i, text in enumerate(pdf["text"]):
            for tok in text.split(" "):
                b, s = _token_bucket_sign(tok)
                mat[i, b] += s
        norm = np.sqrt((mat.astype(np.float64) ** 2).sum(axis=1))
        safe = np.where(norm == 0.0, 1.0, norm)
        emb = mat.astype(np.float64) / safe[:, None]
        yield pd.DataFrame(
            {"doc_id": pdf["doc_id"], "embedding": list(emb)}
        )


def _oracle_sql() -> str:
    """Generated oracle: 8 pivoted signed-count columns, then the same
    sqrt/divide. strpos('0123456789abcdef', ch)-1 is hex-digit value."""
    hexval = "strpos('0123456789abcdef', substr(md5(t), {pos}, 1)) - 1"
    b = hexval.format(pos=1)
    s = hexval.format(pos=2)
    sgn = f"CASE WHEN ({s}) % 2 = 0 THEN 1 ELSE -1 END"
    raws = ",\n             ".join(
        f"CAST(sum(CASE WHEN ({b}) % {EMBED_BUCKETS} = {d} "
        f"THEN {sgn} ELSE 0 END) AS BIGINT) AS r{d}"
        for d in range(EMBED_BUCKETS)
    )
    sq = " + ".join(f"r{d} * r{d}" for d in range(EMBED_BUCKETS))
    comp_case = " ".join(
        f"WHEN {d} THEN CASE WHEN nrm = 0 THEN 0.0 ELSE r{d} / nrm END"
        for d in range(EMBED_BUCKETS)
    )
    return f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
    agg AS (
      SELECT doc_id,
             {raws}
      FROM tok GROUP BY doc_id),
    n AS (SELECT *, sqrt(CAST({sq} AS DOUBLE)) AS nrm FROM agg)
    SELECT doc_id, CAST(p.pos AS INT) AS pos,
           CASE p.pos {comp_case} END AS component
    FROM n CROSS JOIN
         (SELECT unnest(generate_series(0, {EMBED_BUCKETS - 1})) AS pos) p
    """


@query("text_embedding", oracle=_oracle_sql(), tags=("llm", "text", "embedding", "arrow"))
def text_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-based text embedding (feature hashing, D=8, L2-normalized) as
    an Arrow-batched mapInPandas encoder — the batch contract a real
    sentence encoder uses: text column in, array<double> vector column
    out, partition-parallel, no shuffle. The md5 arithmetic is mirrored
    in the DuckDB oracle, so the vector values (not just shapes) are
    hash-checked through the Arrow boundary.

    Output shape: the vector is posexploded to (doc_id, pos, component)
    rows — scalar columns only, since the harness canonicalizer (pandas
    sort) cannot hash array cells (r3 postmortem). The explode is a
    map-side projection: no shuffle is introduced."""
    from pyspark.sql import functions as F

    d = spread(load_table(spark, sf_dir, "documents"))
    emb = d.select("doc_id", "text").mapInPandas(
        _embed_batches, schema="doc_id long, embedding array<double>"
    )
    return emb.select(
        "doc_id", F.posexplode("embedding").alias("pos", "component")
    )


# ---- end-to-end RAG index build: chunk -> hash-embed -> LSH bucket ----

import random as _random

from pyspark.sql import functions as F

RAG_PLANES_N = 4  # 16 index buckets
_rag_rng = _random.Random(11)
RAG_PLANES: list[list[int]] = [
    [_rag_rng.choice((-1, 1)) for _ in range(EMBED_BUCKETS)]
    for _ in range(RAG_PLANES_N)
]


def _rag_oracle() -> str:
    from ocs_duckdb_runner_spark.llm.curation import CHUNK_S, CHUNK_W

    hexval = "strpos('0123456789abcdef', substr(md5(t), {pos}, 1)) - 1"
    b = hexval.format(pos=1)
    sgn = f"CASE WHEN ({hexval.format(pos=2)}) % 2 = 0 THEN 1 ELSE -1 END"
    raws = ",\n             ".join(
        f"CAST(sum(CASE WHEN ({b}) % {EMBED_BUCKETS} = {d} "
        f"THEN {sgn} ELSE 0 END) AS BIGINT) AS r{d}"
        for d in range(EMBED_BUCKETS)
    )
    bits = " + ".join(
        "(CASE WHEN ("
        + " + ".join(
            f"r{d} * ({RAG_PLANES[i][d]})" for d in range(EMBED_BUCKETS)
        )
        + f") > 0 THEN {1 << i} ELSE 0 END)"
        for i in range(RAG_PLANES_N)
    )
    return f"""
    WITH tok AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             len(string_split(text, ' ')) AS n
      FROM documents),
    grid AS (
      SELECT doc_id, toks, n,
             unnest(generate_series(0,
                 (greatest(n - {CHUNK_W}, 0) + {CHUNK_S} - 1) // {CHUNK_S}
             )) AS chunk_idx
      FROM tok),
    ctok AS (
      SELECT doc_id, chunk_idx,
             unnest(toks[chunk_idx * {CHUNK_S} + 1 :
                         least(n, chunk_idx * {CHUNK_S} + {CHUNK_W})]) AS t
      FROM grid),
    vec AS (
      SELECT doc_id, chunk_idx,
             {raws}
      FROM ctok GROUP BY doc_id, chunk_idx),
    idx AS (
      SELECT doc_id, chunk_idx, ({bits}) AS bucket FROM vec)
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_chunks,
           CAST(min(doc_id * 1000 + chunk_idx) AS BIGINT) AS min_chunk_key
    FROM idx GROUP BY bucket
    """


@query(
    "pipeline_rag_index",
    oracle=_rag_oracle(),
    tags=("llm", "pipeline", "embedding", "lsh"),
)
def pipeline_rag_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG index construction in ONE query — the retrieval-side sibling of
    pipeline_pretrain_end2end: sliding-window chunking (chunk_documents'
    64/48 grid) → feature-hash chunk embeddings (text_embedding's signed
    md5 buckets, kept as exact integer vectors — normalization cancels in
    sign-projection LSH so it is skipped) → SRP-LSH bucketing (4 fixed ±1
    planes over the 8 integer dims) → per-bucket index report. At serve
    time a query embeds + buckets the same way and probes one bucket.

    Plan shape at 100 TB: chunking is a map-side Generate; token→(chunk,
    bucket-count) is ONE word-count-shaped aggregate keyed by chunk (the
    only data-sized shuffle); plane projection + bucket id are whole-stage
    codegen arithmetic; the final report aggregates into ≤16 buckets.
    Every value is integer, so the full pipeline — grid, signed counts,
    projections, bucket boundaries — is oracle-exact."""
    from ocs_duckdb_runner_spark.llm.curation import CHUNK_S, CHUNK_W

    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    grid = d.select(
        "doc_id",
        toks.alias("toks"),
        F.explode(
            F.sequence(
                F.lit(0),
                F.floor(
                    (F.greatest(n - CHUNK_W, F.lit(0)) + (CHUNK_S - 1))
                    / CHUNK_S
                ).cast("int"),
            )
        ).alias("chunk_idx"),
    )
    ctok = grid.select(
        "doc_id",
        "chunk_idx",
        F.explode(
            F.slice(F.col("toks"), F.col("chunk_idx") * CHUNK_S + 1, CHUNK_W)
        ).alias("t"),
    )
    hx = lambda pos: F.conv(F.substring(F.md5("t"), pos, 1), 16, 10).cast("int")  # noqa: E731
    bkt = hx(1) % EMBED_BUCKETS
    sgn = F.when(hx(2) % 2 == 0, F.lit(1)).otherwise(F.lit(-1))
    vec = ctok.groupBy("doc_id", "chunk_idx").agg(
        *[
            F.sum(F.when(bkt == dd, sgn).otherwise(F.lit(0)))
            .cast("long")
            .alias(f"r{dd}")
            for dd in range(EMBED_BUCKETS)
        ]
    )
    bucket = None
    for i in range(RAG_PLANES_N):
        dot = sum(
            F.col(f"r{dd}") * F.lit(RAG_PLANES[i][dd])
            for dd in range(EMBED_BUCKETS)
        )
        bit = F.when(dot > 0, F.lit(1 << i)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    idx = vec.select("doc_id", "chunk_idx", bucket.alias("bucket"))
    return idx.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.min(F.col("doc_id") * 1000 + F.col("chunk_idx"))
        .cast("long")
        .alias("min_chunk_key"),
    ).select(F.col("bucket").cast("long").alias("bucket"), "n_chunks",
             "min_chunk_key")


@query(
    "embed_norm_outliers",
    oracle="""
    WITH fp AS (
        SELECT vec_id,
               CAST(list_sum(list_transform(embedding,
                    x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT)
                         * CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT)))
                    AS BIGINT) AS sq_norm_u
        FROM embeddings
    ),
    stats AS (
        -- both moments EXACT (HUGEINT) before ONE cast to double: a
        -- float sum of squares is partition-order-dependent, and the
        -- n*s2 - s1^2 cancellation amplifies those last-ulp differences
        -- into the 4th digit (measured at the 10x probe)
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(sq_norm_u AS HUGEINT)) AS DOUBLE) AS s1,
               CAST(sum(CAST(sq_norm_u AS HUGEINT) * sq_norm_u)
                    AS DOUBLE) AS s2
        FROM fp
    ),
    z AS (
        SELECT f.vec_id, f.sq_norm_u,
               (CAST(f.sq_norm_u AS DOUBLE) - s.s1 / s.n)
               / sqrt((s.n * s.s2 - s.s1 * s.s1)
                      / (CAST(s.n AS DOUBLE) * (s.n - 1))) AS zscore
        FROM fp f, stats s
    )
    SELECT CAST(vec_id AS BIGINT) AS vec_id, sq_norm_u, zscore
    FROM z WHERE abs(zscore) > 2.5
    ORDER BY abs(zscore) DESC, vec_id LIMIT 20
    """,
    tags=("llm", "embedding", "qa"),
)
def embed_norm_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-norm outlier detection — the cheapest vector-QA gate a
    pipeline runs after every encoder batch: a squared-L2 norm far from
    the population marks truncated, zeroed, or exploded vectors long
    before any retrieval metric notices. Norms are exact integer
    micro-unit sums (the fp_vec grid); mean/std come from the integer
    (n, Σx, Σx²) triple cast to double — identical operands both
    engines, so the z-threshold comparisons agree exactly (Σx² is
    computed in doubles on both sides since squared-norm squares
    overflow int64; conversion rounding is IEEE-identical). Top-20 by
    |z|, threshold 2.5.

    Plan: norm computation is one map-side higher-order fold (no
    Python); the stats frame is a 1-row aggregate broadcast back; the
    filter+top-k is map-side + TakeOrderedAndProject. ONE corpus scan,
    one 1-row exchange — embedding vectors never shuffle."""
    from pyspark.sql import functions as F

    from ocs_duckdb_runner_spark.registry import load_table
    e = load_table(spark, sf_dir, "embeddings")
    fpv = F.transform(
        F.col("embedding"),
        lambda x: F.round(x.cast("double") * 1e6).cast("long"),
    )
    sq = F.aggregate(
        F.transform(fpv, lambda v: v * v),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    fp = e.select("vec_id", sq.alias("sq_norm_u"))
    # exact decimal(38,0) moments, ONE cast to double each (see oracle
    # comment: float-summed s2 + variance cancellation broke the 10x
    # probe hash in the 4th digit)
    sqd = F.col("sq_norm_u").cast("decimal(38,0)")
    stats = fp.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(sqd).cast("double").alias("s1"),
        F.sum(sqd * F.col("sq_norm_u")).cast("double").alias("s2"),
    )
    z = fp.crossJoin(F.broadcast(stats)).withColumn(
        "zscore",
        (F.col("sq_norm_u").cast("double") - F.col("s1") / F.col("n"))
        / F.sqrt(
            (F.col("n") * F.col("s2") - F.col("s1") * F.col("s1"))
            / (F.col("n").cast("double") * (F.col("n") - 1))
        ),
    )
    return (
        z.filter(F.abs(F.col("zscore")) > 2.5)
        .select("vec_id", "sq_norm_u", "zscore")
        .orderBy(F.abs(F.col("zscore")).desc(), F.col("vec_id"))
        .limit(20)
    )


_PCA_ITERS = 3
_PCA_DIM = 64
_PCA_V0 = 125_000  # round(1e6 / sqrt(64)): deterministic uniform unit init
_PCA_DOT_DESCALE = 1_000_000_000


def _pca_oracle() -> str:
    # one unrolled power iteration: integer dots (descaled), per-dim
    # integer sums list-assembled in dim order, exact HUGEINT norm²,
    # re-gridded unit vector
    it = """,
    dots{i} AS (
        SELECT f.xu,
               CAST(list_sum(list_transform(generate_series(1, {dim}),
                    d -> f.xu[d] * v.vu[d])) AS BIGINT)
                    // {descale} AS ds
        FROM fp f, v{p} v
    ),
    wd{i} AS (
        SELECT t.d AS d, CAST(sum(xu[t.d] * ds) AS BIGINT) AS s
        FROM dots{i}, unnest(generate_series(1, {dim})) AS t(d)
        GROUP BY t.d
    ),
    wl{i} AS (SELECT list(s ORDER BY d) AS wl FROM wd{i}),
    nrm{i} AS (
        SELECT wl,
               sqrt(CAST((SELECT sum(CAST(s AS HUGEINT) * s) FROM wd{i})
                         AS DOUBLE)) AS nrm
        FROM wl{i}
    ),
    v{i} AS (
        SELECT list_transform(wl, x ->
            CAST(round(CAST(x AS DOUBLE) / nrm * 1e6) AS BIGINT)) AS vu
        FROM nrm{i}
    )"""
    body = "".join(
        it.format(i=i, p=i - 1, dim=_PCA_DIM, descale=_PCA_DOT_DESCALE)
        for i in range(1, _PCA_ITERS + 1)
    )
    return f"""
    WITH fp AS (
        SELECT list_transform(embedding,
               x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS xu
        FROM embeddings
    ),
    v0 AS (SELECT list_transform(generate_series(1, {_PCA_DIM}),
                                 d -> CAST({_PCA_V0} AS BIGINT)) AS vu){body},
    final_dots AS (
        SELECT CAST(list_sum(list_transform(generate_series(1, {_PCA_DIM}),
                    d -> f.xu[d] * v.vu[d])) AS BIGINT) AS df,
               CAST(list_sum(list_transform(f.xu, x -> x * x)) AS BIGINT)
                   AS xsq
        FROM fp f, v{_PCA_ITERS} v
    ),
    share AS (
        SELECT CAST(round(
                   CAST((SELECT sum(CAST(df AS HUGEINT) * df)
                         FROM final_dots) AS DOUBLE)
                   / (CAST((SELECT sum(CAST(xsq AS HUGEINT)) FROM final_dots)
                           AS DOUBLE)
                      * CAST((SELECT CAST(list_sum(list_transform(vu,
                                 x -> x * x)) AS BIGINT) FROM v{_PCA_ITERS})
                             AS DOUBLE))
                   * 1e6) AS BIGINT) AS ev_share_micro
    ),
    loadings AS (
        SELECT t.d AS dim, vu[t.d] AS loading_u
        FROM v{_PCA_ITERS}, unnest(generate_series(1, {_PCA_DIM})) AS t(d)
    )
    SELECT CAST(row_number() OVER (ORDER BY abs(loading_u) DESC, dim)
                AS BIGINT) AS rank_,
           CAST(dim AS BIGINT) AS dim, CAST(loading_u AS BIGINT) AS loading_u,
           s.ev_share_micro
    FROM loadings, share s
    ORDER BY abs(loading_u) DESC, dim LIMIT 5
    """


@query("embed_pca_power_iter", oracle=_pca_oracle(), tags=("llm", "embedding", "pca"))
def embed_pca_power_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal component of the embedding corpus by matrix-free
    POWER ITERATION (3 unrolled rounds, deterministic uniform unit
    init): v ← normalize(Σᵢ xᵢ(xᵢ·v)) — the scalable PCA that never
    materializes the 64×64 covariance, the primitive behind embedding
    whitening, drift detection, and anisotropy diagnostics. Output: the
    5 largest-|loading| dimensions of the converged direction plus the
    explained-variance share (Rayleigh quotient) in integer micro-units.

    Exactness discipline (the iterative-algorithm policy of
    kmeans_embeddings, extended to linear algebra): per-row dots are
    integer folds on the fp grid, descaled by integer division; per-dim
    accumulations are integer sums; norm² is an exact 128-bit integer
    (w[d]² ≈ 1e27 — decimal(38,0) in Spark, HUGEINT in DuckDB) so the
    normalizing sqrt and the 1e6 re-gridding see identical doubles —
    the direction vector is BIT-IDENTICAL cross-engine after every
    iteration, which is what lets a 3-iteration unroll hash-match.

    Plan per iteration: ONE corpus pass (broadcast 64-long v, map-side
    integer fold), then a 64-key per-dim partial-sum exchange, then a
    1-row normalize — the corpus never shuffles, and the only state
    crossing an exchange is 64 longs per partition. At 100 TB that is
    scan-bound with a constant-size reduce, the textbook distributed
    power-iteration profile."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    e = load_table(spark, sf_dir, "embeddings")
    xu = F.transform(
        F.col("embedding"), lambda x: F.round(x.cast("double") * 1e6).cast("long")
    )
    fp = e.select(xu.alias("xu"))
    v = spark.range(1).select(
        F.array(*[F.lit(_PCA_V0).cast("long")] * _PCA_DIM).alias("vu")
    )
    for _ in range(_PCA_ITERS):
        dots = fp.crossJoin(F.broadcast(v)).select(
            "xu",
            F.expr(
                "aggregate(zip_with(xu, vu, (x, y) -> x * y),"
                f" CAST(0 AS BIGINT), (acc, p) -> acc + p)"
                f" DIV {_PCA_DOT_DESCALE}"
            ).alias("ds"),
        )
        wd = (
            dots.select(
                F.posexplode(
                    F.transform(F.col("xu"), lambda x: x * F.col("ds"))
                ).alias("d0", "term")
            )
            .groupBy("d0")
            .agg(F.sum("term").alias("s"))
        )
        wl = wd.agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("d0", "s"))),
                lambda t: t.s,
            ).alias("wl")
        )
        nrm = wl.select(
            "wl",
            F.sqrt(
                F.aggregate(
                    F.col("wl"),
                    F.lit(0).cast("decimal(38,0)"),
                    lambda acc, x: acc + x.cast("decimal(38,0)") * x,
                ).cast("double")
            ).alias("nrm"),
        )
        v = nrm.select(
            F.transform(
                F.col("wl"),
                lambda x: F.round(x.cast("double") / F.col("nrm") * 1e6).cast(
                    "long"
                ),
            ).alias("vu")
        ).localCheckpoint(eager=True)
    final_dots = fp.crossJoin(F.broadcast(v)).select(
        F.expr(
            "aggregate(zip_with(xu, vu, (x, y) -> x * y),"
            " CAST(0 AS BIGINT), (acc, p) -> acc + p)"
        ).alias("df"),
        F.expr(
            "aggregate(transform(xu, x -> x * x),"
            " CAST(0 AS BIGINT), (acc, p) -> acc + p)"
        ).alias("xsq"),
    )
    sums = final_dots.agg(
        F.sum(F.col("df").cast("decimal(38,0)") * F.col("df")).alias("num"),
        F.sum(F.col("xsq").cast("decimal(38,0)")).alias("xden"),
    )
    vsq = v.select(
        F.expr(
            "aggregate(transform(vu, x -> x * x),"
            " CAST(0 AS BIGINT), (acc, p) -> acc + p)"
        ).alias("vsq")
    )
    share = (
        sums.crossJoin(vsq)
        .select(
            F.round(
                F.col("num").cast("double")
                / (F.col("xden").cast("double") * F.col("vsq").cast("double"))
                * 1e6
            )
            .cast("long")
            .alias("ev_share_micro")
        )
    )
    loadings = v.select(
        F.posexplode(F.col("vu")).alias("d0", "loading_u")
    ).select((F.col("d0") + 1).cast("long").alias("dim"), "loading_u")
    w = Window.orderBy(F.abs(F.col("loading_u")).desc(), F.col("dim"))
    return (
        loadings.crossJoin(F.broadcast(share))
        .withColumn("rank_", F.row_number().over(w).cast("long"))
        .orderBy(F.abs(F.col("loading_u")).desc(), F.col("dim"))
        .limit(5)
        .select("rank_", "dim", "loading_u", "ev_share_micro")
    )


_JL_OUT_DIMS = 16  # projected dimensionality (64 -> 16)
_JL_PAIR_STRIDE = 251  # fixed odd vec_id stride defining the probe pairs

# deterministic +-1 sign for (in-dim i, out-dim j): parity of the first
# hex char of md5("i_j") — both engines produce the same lowercase hex
_JL_SIGN = (
    "CAST(1 - 2 * (ascii(substr(md5(concat(CAST(i AS STRING), '_',"
    " CAST(j AS STRING))), 1, 1)) % 2) AS BIGINT)"
)


@query(
    "eval_jl_distortion",
    oracle=f"""
    WITH sgn AS (
        SELECT list_transform(range(0, {_JL_OUT_DIMS}), j ->
                   list_transform(range(0, 64), i ->
                       CAST(1 - 2 * (ascii(substr(md5(CAST(i AS VARCHAR) || '_'
                            || CAST(j AS VARCHAR)), 1, 1)) % 2) AS BIGINT)))
               AS m
    ),
    fp AS (
        SELECT vec_id,
               list_transform(embedding,
                   x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT)) AS xu
        FROM embeddings
    ),
    pairs AS (
        SELECT a.vec_id AS va,
               list_transform(range(1, 65), k -> a.xu[k] - b.xu[k]) AS dx
        FROM fp a JOIN fp b ON b.vec_id = a.vec_id + {_JL_PAIR_STRIDE}
    ),
    dist AS (
        SELECT va,
               CAST(list_sum(list_transform(dx, x -> x * x)) AS BIGINT) AS d2o,
               CAST(list_sum(list_transform(
                   list_transform(s.m, row ->
                       CAST(list_sum(list_transform(range(1, 65),
                            k -> row[k] * dx[k])) AS BIGINT)),
                   v -> v * v)) AS BIGINT) AS d2p
        FROM pairs, sgn s
    ),
    r AS (
        SELECT CAST(round(CAST(d2p AS DOUBLE)
                    / ({_JL_OUT_DIMS} * CAST(d2o AS DOUBLE)) * 1e6) AS BIGINT)
                   AS ratio_ppm
        FROM dist WHERE d2o > 0
    )
    SELECT CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(ratio_ppm) // count(*) AS BIGINT) AS mean_ratio_ppm,
           CAST(min(ratio_ppm) AS BIGINT) AS min_ratio_ppm,
           CAST(max(ratio_ppm) AS BIGINT) AS max_ratio_ppm
    FROM r
    """,
    tags=("llm", "embedding", "eval", "jl"),
)
def eval_jl_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss distortion audit for a signed random
    projection (64 -> {_JL_OUT_DIMS} dims): for a deterministic sample of
    vector pairs (vec_id, vec_id+{_JL_PAIR_STRIDE}), compare the squared
    distance of the PROJECTED difference against k·(squared original
    distance) — the JL lemma says the ratio concentrates near 1, and this
    query reports its observed mean/min/max in ppm. This is the go/no-go
    gate before swapping full embeddings for a cheap projection in a
    dedup or retrieval pipeline (the projection matrix here is the
    Achlioptas +-1 scheme, signs derived from md5(i_j) parity so both
    engines build the identical matrix).

    Exactness: components live on the micro-unit integer grid, the
    projection is integer dot products against the +-1 matrix (|dy_j| <=
    64·4e6 keeps every square inside int64), and the single
    ratio division runs on identical doubles, rounded to ppm before the
    integer mean/min/max aggregate.

    Plan: the 16x64 sign matrix is built ONCE on a 1-row frame and
    broadcast — the per-pair work is pure map-side higher-order folds
    (whole-stage codegen, no Python, no md5 per element). The pair join
    is a self-equi-join on vec_id+stride — co-partitioned by the key at
    scale. One corpus scan + one key-only shuffle regardless of SF."""
    e = load_table(spark, sf_dir, "embeddings")
    sgn = spark.range(1).select(
        F.expr(
            f"transform(sequence(0, {_JL_OUT_DIMS - 1}), j ->"
            f" transform(sequence(0, 63), i -> {_JL_SIGN}))"
        ).alias("m")
    )
    fp = e.select(
        "vec_id",
        F.expr(
            "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1e6)"
            " AS BIGINT))"
        ).alias("xu"),
    )
    a = fp.toDF("va", "xua")
    b = fp.toDF("vb", "xub")
    pairs = a.join(b, F.col("vb") == F.col("va") + _JL_PAIR_STRIDE).select(
        "va", F.expr("zip_with(xua, xub, (x, y) -> x - y)").alias("dx")
    )
    dist = pairs.crossJoin(F.broadcast(sgn)).select(
        "va",
        F.expr(
            "aggregate(transform(dx, x -> x * x), CAST(0 AS BIGINT),"
            " (acc, x) -> acc + x)"
        ).alias("d2o"),
        F.expr(
            "aggregate(transform(transform(m, row ->"
            " aggregate(zip_with(row, dx, (s, x) -> s * x), CAST(0 AS BIGINT),"
            " (acc, x) -> acc + x)), v -> v * v), CAST(0 AS BIGINT),"
            " (acc, x) -> acc + x)"
        ).alias("d2p"),
    )
    r = dist.filter(F.col("d2o") > 0).select(
        F.round(
            F.col("d2p").cast("double")
            / (_JL_OUT_DIMS * F.col("d2o").cast("double"))
            * 1e6
        )
        .cast("long")
        .alias("ratio_ppm")
    )
    return r.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.expr("CAST(sum(ratio_ppm) DIV count(*) AS BIGINT)").alias(
            "mean_ratio_ppm"
        ),
        F.min("ratio_ppm").alias("min_ratio_ppm"),
        F.max("ratio_ppm").alias("max_ratio_ppm"),
    )
