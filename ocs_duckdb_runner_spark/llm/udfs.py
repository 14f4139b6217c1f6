"""UDF surface (SURVEY.md §2c `udf_surface`): one row-at-a-time Python UDF,
one Arrow-vectorized pandas UDF, and one applyInPandas grouped-map — the
three Python extension points, each deliberately replicating a
SQL-expressible function so the DuckDB oracle can check them.

These exist to prove the slow path works, not to use it: everything in this
file could (and in the other modules, does) run as built-in JVM expressions.
The pandas variants move data via Arrow batches (columnar, zero-copy-ish);
the row UDF is the documented worst case.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ocs_duckdb_runner_spark.registry import load_table, query


@F.udf(T.StringType())
def _band_py(n_chars: int) -> str:
    """Row-at-a-time Python UDF (pickled per row — the slow path)."""
    if n_chars is None:
        return None
    if n_chars > 400:
        return "long"
    if n_chars > 150:
        return "mid"
    return "short"


@F.pandas_udf(T.LongType())
def _tok_est_pd(n_chars: pd.Series) -> pd.Series:
    """Vectorized pandas UDF: whole Arrow batches, ~10-100× the row UDF."""
    return (n_chars * 2 + 7) % 97


def _delta_per_lang(pdf: pd.DataFrame) -> pd.DataFrame:
    """Grouped-map (applyInPandas): per-language char-count delta vs the
    group minimum — integer math, exact."""
    pdf = pdf.copy()
    pdf["delta_chars"] = pdf["n_chars"] - pdf["n_chars"].min()
    return pdf


@query(
    "udf_surface",
    oracle="""
    SELECT doc_id, lang, n_chars,
           CASE WHEN n_chars > 400 THEN 'long'
                WHEN n_chars > 150 THEN 'mid'
                ELSE 'short' END AS band,
           CAST((n_chars * 2 + 7) % 97 AS BIGINT) AS tok_est,
           CAST(n_chars - min(n_chars) OVER (PARTITION BY lang) AS BIGINT)
             AS delta_chars
    FROM documents
    """,
    tags=("llm", "udf"),
)
def udf_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All three Python extension points in one plan, each checked against
    its pure-SQL twin: Python UDF (CASE bands), pandas UDF (modular
    arithmetic), applyInPandas (per-group min delta)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    with_delta = d.groupBy("lang").applyInPandas(
        _delta_per_lang,
        schema="doc_id long, lang string, n_chars long, delta_chars long",
    )
    return with_delta.select(
        "doc_id",
        "lang",
        "n_chars",
        _band_py(F.col("n_chars")).alias("band"),
        _tok_est_pd(F.col("n_chars")).alias("tok_est"),
        "delta_chars",
    )


@F.pandas_udf(T.LongType())
def _sum_sq_udaf(n_chars: pd.Series) -> int:  # type: ignore[misc]
    """GROUPED_AGG pandas UDF — a true UDAF: the whole group's column
    arrives as one Arrow batch, one scalar returns. Integer math, exact."""
    return int((n_chars.astype("int64") ** 2).sum())


@F.pandas_udf(T.DoubleType())
def _median_udaf(n_chars: pd.Series) -> float:  # type: ignore[misc]
    """UDAF #2: median (numpy interpolated-midpoint == DuckDB median())."""
    return float(n_chars.median())


@F.pandas_udf(T.LongType())
def _count_udaf(n_chars: pd.Series) -> int:  # type: ignore[misc]
    """UDAF #3: count — Spark disallows mixing GROUPED_AGG pandas UDFs
    with built-in aggregates in one .agg(), so the count rides along as a
    UDAF too."""
    return int(len(n_chars))


@query(
    "udaf_surface",
    oracle="""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars * n_chars) AS BIGINT) AS sum_sq_chars,
           CAST(median(n_chars) AS DOUBLE) AS median_chars
    FROM documents
    GROUP BY lang
    """,
    tags=("llm", "udf", "udaf"),
)
def udaf_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-defined AGGREGATE functions via GROUPED_AGG pandas UDFs — the
    fourth Python extension point (udf_surface covers scalar/pandas/
    grouped-map): each language group's column ships to Python as one
    Arrow batch and reduces to a scalar, composed in the same .agg() as a
    built-in count. Checked against pure-SQL twins: an exact integer
    sum-of-squares and an interpolated median (numpy's midpoint rule ==
    DuckDB's median()). Production note: a UDAF has NO partial-aggregate
    (map-side combine) path — the full group's values shuffle to one
    reducer, so at 100 TB it is the right tool only for group-bounded
    cardinalities; unbounded reductions belong in built-ins or
    applyInPandasWithState."""
    d = load_table(spark, sf_dir, "documents").select("lang", "n_chars")
    return d.groupBy("lang").agg(
        _count_udaf(F.col("n_chars")).alias("n_docs"),
        _sum_sq_udaf(F.col("n_chars")).alias("sum_sq_chars"),
        _median_udaf(F.col("n_chars")).alias("median_chars"),
    )


UDTF_CHUNK = 1000  # span width for the range-splitting table function


@query(
    "udtf_surface",
    oracle=f"""
    SELECT d.doc_id,
           CAST(s.i * {UDTF_CHUNK} AS BIGINT) AS start,
           CAST(least({UDTF_CHUNK}, d.n_chars - s.i * {UDTF_CHUNK}) AS BIGINT)
             AS length
    FROM documents d,
         unnest(generate_series(0, (d.n_chars - 1) // {UDTF_CHUNK})) AS s(i)
    WHERE d.n_chars > 0 AND d.doc_id % 10 = 0
    """,
    tags=("llm", "udf", "udtf"),
)
def udtf_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python user-defined TABLE function (Spark 4 @udtf) — the fifth
    Python extension point (after udf_surface's scalar/pandas/grouped-map
    and udaf_surface's grouped-agg): a per-row generator yielding a
    variable number of output rows, consumed via a LATERAL join. The
    UDTF splits each document's char range into fixed spans — the shape
    a real pipeline uses for byte-range chunking of blobs too big for
    one task. Deliberately SQL-replicable (generate_series arithmetic)
    so the lateral expansion is oracle-exact; like udf_surface, it
    proves the extension point, not the fast path — chunk_documents is
    the production JVM-side equivalent."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="start: bigint, length: bigint")
    class SplitSpans:
        def eval(self, n_chars: int):
            if n_chars is None or n_chars <= 0:
                return
            s = 0
            while s < n_chars:
                yield s, min(UDTF_CHUNK, n_chars - s)
                s += UDTF_CHUNK

    spark.udtf.register("ocs_split_spans", SplitSpans)
    d = load_table(spark, sf_dir, "documents").filter(
        (F.col("n_chars") > 0) & (F.col("doc_id") % 10 == 0)
    )
    d.createOrReplaceTempView("udtf_surface_docs")
    return spark.sql(
        """
        SELECT d.doc_id, s.start, s.length
        FROM udtf_surface_docs d,
             LATERAL ocs_split_spans(CAST(d.n_chars AS INT)) s
        """
    )


@query(
    "udf_arrow_surface",
    oracle="""
    SELECT l_orderkey,
           CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
               AS net_c
    FROM lineitem
    WHERE l_linenumber = 1
    """,
    tags=("udf", "arrow"),
)
def udf_arrow_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow — the sixth and lowest-overhead Python extension point
    (after udf_surface's scalar/pandas/grouped-map trio, udaf_surface's
    grouped-agg, and udtf_surface's table function):
    batches arrive as pyarrow.RecordBatch with NO pandas materialization,
    so the only per-batch cost is the Arrow IPC hop itself. This is the
    surface to reach for when the Python side is itself Arrow-native
    (vector libs, Arrow-backed model featurizers) — at 100 TB the
    difference between per-row pickling and zero-copy columnar transfer
    is the difference between a UDF stage that dominates the job and one
    that disappears into it. Like udf_surface, the computation (net
    price in exact cents) deliberately replicates a SQL-expressible
    expression so the oracle checks the Arrow path end-to-end; the
    rounding mode is pinned to half-towards-infinity (= away from zero) to match both
    engines' round() (pyarrow defaults to half-to-even, which WOULD
    diverge on exact .5 cents)."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_linenumber") == 1)
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )

    def _net_cents(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for b in batches:
            net = pc.multiply(
                pc.multiply(
                    b.column("l_extendedprice"),
                    pc.subtract(pa.scalar(1.0), b.column("l_discount")),
                ),
                pa.scalar(100.0),
            )
            net_c = pc.cast(
                pc.round(net, round_mode="half_towards_infinity"), pa.int64()
            )
            yield pa.RecordBatch.from_arrays(
                [b.column("l_orderkey"), net_c], ["l_orderkey", "net_c"]
            )

    return li.mapInArrow(_net_cents, "l_orderkey long, net_c long")


@query(
    "udtf_analyze_surface",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents WHERE doc_id % 20 = 0),
    g AS (SELECT doc_id, unnest(generate_series(1, len(toks) - 1)) AS i,
                 toks
          FROM t)
    SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS gram,
           CAST(i - 1 AS INT) AS pos
    FROM g
    """,
    tags=("llm", "udf", "udtf", "spark4", "polymorphic"),
)
def udtf_analyze_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POLYMORPHIC Python UDTF (Spark 4 static `analyze()`): the output
    schema is computed at ANALYSIS time from the call's literal
    arguments — here the n-gram width names its own column (gram_2 for
    n=2) — the API a reusable table function needs when its shape
    depends on how it's called (unpivot-N-columns, parse-with-schema,
    top-K-wide). udtf_surface is the fixed-schema sibling; this one
    proves the analyzer round-trip: AnalyzeArgument.value carries the
    literal into analyze(), the planner trusts the returned StructType,
    and eval() rows are validated against it. Like every Python UDTF
    this is the deliberate slow path (per-row generator over Arrow
    batches); text_ngram_stats is the JVM-side production equivalent.

    The test locks the polymorphism itself: calling with n=3 must yield
    a `gram_3` column (tests/test_round11_ops.py)."""
    from pyspark.sql.functions import udtf

    spark.udtf.register("ocs_ngrams_poly", _ngrams_poly_udtf())
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 20 == 0)
    d.createOrReplaceTempView("udtf_poly_docs")
    return spark.sql(
        """
        SELECT d.doc_id, s.gram_2 AS gram, s.pos
        FROM udtf_poly_docs d, LATERAL ocs_ngrams_poly(d.text, 2) s
        """
    )


def _ngrams_poly_udtf():
    """The polymorphic n-gram UDTF class, importable by tests: analyze()
    derives (gram_<n> string, pos int) from the literal width."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
    )
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class NGramsPoly:
        @staticmethod
        def analyze(
            text: AnalyzeArgument, n: AnalyzeArgument
        ) -> AnalyzeResult:
            width = n.value
            # type() is int, not isinstance: bool subclasses int, and a
            # BOOLEAN literal would otherwise pass the guard and emit a
            # nonsensical gram_True column (r11 ADVICE)
            if type(width) is not int or width < 1:
                raise ValueError(
                    "ocs_ngrams_poly: n must be a positive INT literal"
                )
            return AnalyzeResult(
                schema=StructType(
                    [
                        StructField(f"gram_{width}", StringType()),
                        StructField("pos", IntegerType()),
                    ]
                )
            )

        def eval(self, text, n):
            toks = (text or "").split(" ")
            for i in range(len(toks) - n + 1):
                yield " ".join(toks[i : i + n]), i

    return udtf(NGramsPoly)


@query(
    "udtf_arrow_surface",
    oracle="""
    WITH base AS (
      SELECT doc_id,
             (list_filter(string_split(text, ' '), x -> x <> ''))[1:9]
                 AS toks
      FROM documents WHERE doc_id % 10 = 0)
    SELECT doc_id,
           CAST(s.i AS BIGINT) AS pos,
           concat(toks[s.i], ' ', toks[s.i + 1]) AS gram
    FROM base, unnest(generate_series(1, length(toks) - 1)) AS s(i)
    WHERE length(toks) >= 2
    """,
    tags=("llm", "udf", "udtf", "arrow", "spark4"),
)
def udtf_arrow_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARROW-OPTIMIZED Python UDTF (@udtf(useArrow=True), Spark 4) — the
    vectorized-transport variant of udtf_surface: same lateral
    generator surface, but rows cross the Python boundary as Arrow
    record batches instead of pickled rows, the same 10-100x serializer
    win pandas UDFs have over row-at-a-time UDFs. The round-11
    local-cluster finding motivates locking this path separately:
    Arrow transport has its own worker protocol, and local[*] hides
    worker-env failures that real executors surface.

    The generator emits token bigrams with 1-based positions for every
    10th document (first 9 tokens → ≤8 rows/doc, so output is bounded
    and corpus-linear). Oracle: the same bigrams via list slicing +
    generate_series. The eval-type is asserted to be the ARROW table
    UDF in tests/test_round12_ops.py — without that, a silently
    fallen-back pickle path would pass this oracle vacuously."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos: bigint, gram: string", useArrow=True)
    class Bigrams:
        def eval(self, text: str):
            toks = [t for t in (text or "").split(" ") if t][:9]
            for i in range(len(toks) - 1):
                yield i + 1, toks[i] + " " + toks[i + 1]

    spark.udtf.register("ocs_bigrams_arrow", Bigrams)
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") % 10 == 0)
    d.createOrReplaceTempView("udtf_arrow_docs")
    return spark.sql(
        """
        SELECT d.doc_id, s.pos, s.gram
        FROM udtf_arrow_docs d, LATERAL ocs_bigrams_arrow(d.text) s
        """
    )
