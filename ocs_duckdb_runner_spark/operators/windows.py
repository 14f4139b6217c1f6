"""Window functions (SURVEY.md §2c EXT): ranking, analytic (lag/lead/
first/last), and framed running aggregates.

All windows here order by a UNIQUE key within each partition, so ranks,
offsets, and frames are tie-free and deterministic across engines (the
SURVEY §7 ties risk). Physically each distinct (partitionBy) spec costs one
hash exchange + per-partition sort; the three specs below share partition
keys where possible so AQE can reuse the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ocs_duckdb_runner_spark.registry import load_table, query


@query(
    "window_rank",
    oracle="""
    SELECT c_custkey, c_nationkey, c_acctbal,
           CAST(row_number() OVER w AS BIGINT) AS rn,
           CAST(rank()       OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk,
           CAST(ntile(4)     OVER w AS BIGINT) AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey)
    """,
    tags=("window",),
)
def window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank / ntile per nation, ordered by
    balance with the unique custkey as tie-break."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return c.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.row_number().over(w).cast("long").alias("rn"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


@query(
    "window_analytic",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice,
           lag(o_totalprice)  OVER w AS prev_price,
           lead(o_totalprice) OVER w AS next_price,
           first_value(o_totalprice) OVER
             (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_price,
           last_value(o_totalprice) OVER
             (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_last
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
    """,
    tags=("window",),
)
def window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/first_value/last_value per customer over order-key time;
    explicit ROWS frames so both engines agree on the last_value frame."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.first("o_totalprice").over(wf).alias("first_price"),
        F.last("o_totalprice").over(wf).alias("running_last"),
    )


@query(
    "window_frame_agg",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER
             (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS running_price_c,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER
             (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
             AS BIGINT) AS price_3row_c,
           CAST(count(*) OVER
             (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS n_so_far
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
    """,
    tags=("window",),
)
def window_frame_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running and sliding framed aggregates (ROWS BETWEEN): cumulative
    spend, 3-row moving sum, running count per customer over order-key
    time — in exact fixed-point so the running sums are order-stable
    bit-for-bit. Ordering key o_orderkey is unique → frames are
    deterministic (lineitem's (orderkey, linenumber) is NOT unique in the
    fixtures, which makes running sums engine-dependent)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    last3 = w.rowsBetween(-2, Window.currentRow)
    price_c = F.round(F.col("o_totalprice") * 100).cast("long")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(price_c).over(run).alias("running_price_c"),
        F.sum(price_c).over(last3).alias("price_3row_c"),
        F.count(F.lit(1)).over(run).alias("n_so_far"),
    )


@query(
    "window_topk_per_group",
    oracle="""
    SELECT c_nationkey, c_custkey, c_acctbal FROM (
      SELECT c_nationkey, c_custkey, c_acctbal,
             row_number() OVER (PARTITION BY c_nationkey
                                ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer) t
    WHERE rn <= 3
    """,
    tags=("window", "topk"),
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group — the canonical window+filter pattern (top-3
    customers by balance per nation). Spark pushes the rn<=3 limit into
    the window sort (WindowGroupLimit) so each partition keeps only k rows
    before the full window evaluates — the at-scale-safe idiom."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        c.select(
            "c_nationkey", "c_custkey", "c_acctbal", F.row_number().over(w).alias("rn")
        )
        .filter(F.col("rn") <= 3)
        .select("c_nationkey", "c_custkey", "c_acctbal")
    )


@query(
    "window_distribution",
    oracle="""
    SELECT c_custkey,
           c_nationkey,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume,
           CAST(ntile(4) OVER w AS INT) AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
    """,
    tags=("window", "distribution"),
)
def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions — percent_rank / cume_dist / ntile
    per nation over account balance (the percentile-bucketing shape for
    per-segment score normalization). The order key carries c_custkey so
    ranks are tie-free and both engines agree exactly; the doubles are
    integer-rank ratios, so no rounding is needed. One shuffle on the
    partition key, one in-partition sort."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.ntile(4).over(w).alias("quartile"),
    )


@query(
    "window_nth_value",
    oracle="""
    SELECT o_orderkey, o_custkey,
           nth_value(o_orderkey, 2) OVER w AS second_order,
           first_value(o_orderkey) OVER w AS first_order,
           CAST(count(*) OVER (PARTITION BY o_custkey) AS BIGINT) AS n_orders
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    tags=("window", "nth"),
)
def window_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value / first_value over a full-partition frame plus an
    unordered partition count — per-customer 'their second-ever order'
    lookup. The full-partition ROWS frame makes nth_value deterministic
    (default frames stop at CURRENT ROW and would leave it NULL for early
    rows); one shuffle on the partition key serves all three windows."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    wc = Window.partitionBy("o_custkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
        F.first("o_orderkey").over(w).alias("first_order"),
        F.count(F.lit(1)).over(wc).alias("n_orders"),
    )


@query(
    "window_skyline_pareto",
    oracle="""
    WITH pts AS (
        SELECT DISTINCT CAST(round(o_totalprice * 100) AS BIGINT) AS price_c,
               CAST(o_orderdate AS TIMESTAMP) AS odate
        FROM orders
    ),
    ranked AS (
        SELECT price_c, odate,
               max(odate) OVER (ORDER BY price_c DESC, odate DESC
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND 1 PRECEDING) AS prev_max
        FROM pts
    )
    SELECT price_c, odate
    FROM ranked
    WHERE prev_max IS NULL OR prev_max < odate
    ORDER BY price_c DESC
    """,
    tags=("window", "skyline"),
)
def window_skyline_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SKYLINE (Pareto-front) operator — the classic DB operator for
    'best trade-offs': orders not dominated on (price, recency), i.e.
    no other order is ≥ in both and > in one. The naive formulation is
    a quadratic NOT EXISTS self-join; the single-sort identity replaces
    it: after deduping exact ties, sort by (price desc, date desc) —
    a point is on the front iff its date strictly exceeds the running
    max date of all prior (higher-or-equal-price) points. One window,
    O(n log n), exact integers.

    Plan: distinct collapses map-side; ONE global-sort window (at 100 TB
    you'd pre-prune per partition — each partition's local skyline is a
    superset filter — then run this on the survivors: the standard
    two-phase skyline). The front itself is ~log n points."""
    o = load_table(spark, sf_dir, "orders")
    pts = o.select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_c"),
        F.col("o_orderdate").alias("odate"),
    ).distinct()
    w = Window.orderBy(
        F.col("price_c").desc(), F.col("odate").desc()
    ).rowsBetween(Window.unboundedPreceding, -1)
    ranked = pts.select(
        "price_c", "odate", F.max("odate").over(w).alias("prev_max")
    )
    return (
        ranked.filter(
            F.col("prev_max").isNull() | (F.col("prev_max") < F.col("odate"))
        )
        .select("price_c", "odate")
        .orderBy(F.col("price_c").desc())
    )


@query(
    "window_ignore_nulls",
    oracle="""
    WITH g AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
             CASE WHEN CAST(round(value * 100) AS BIGINT) % 5 = 0
                  THEN NULL ELSE value END AS v
      FROM events),
    filled AS (
      SELECT event_id, user_id, v,
             last_value(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_locf,
             lag(v IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS v_prev
      FROM g)
    SELECT event_id, user_id, v_locf, v_prev
    FROM filled WHERE v IS NULL
    """,
    tags=("windows", "timeseries"),
)
def window_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS window frames — last-observation-carried-forward
    gap-fill, the standard sensor/time-series densify step: for every
    missing reading, the most recent non-null value in the user's
    event-time order (last_value IGNORE NULLS) and the previous non-null
    regardless of recency (lag IGNORE NULLS). Nulls are planted
    deterministically (value-cents % 5 — identical arithmetic in both
    engines) because the fixture column is fully populated; the output
    is only the filled gaps, so result size is the gap count, not the
    corpus.

    Scale: one hash exchange on user_id + per-partition sort — the same
    single-window budget as event_sessionize; IGNORE NULLS is evaluated
    inside the frame scan, not as a self-join (the pre-SQL:2008
    workaround doubled the exchange). Ordering key is (ts, event_id) so
    tie timestamps can't make the carried value nondeterministic.

    Uses registry.load_table's events normalization (ts dtype dispatch,
    UTC session)."""
    e = load_table(spark, sf_dir, "events")
    e.createOrReplaceTempView("win_in_events")
    return spark.sql(
        """
        WITH g AS (
          SELECT event_id, user_id, ts,
                 CASE WHEN CAST(round(value * 100) AS BIGINT) % 5 = 0
                      THEN NULL ELSE value END AS v
          FROM win_in_events),
        filled AS (
          SELECT event_id, user_id, v,
                 last_value(v) IGNORE NULLS OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS v_locf,
                 lag(v) IGNORE NULLS OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS v_prev
          FROM g)
        SELECT event_id, user_id, v_locf, v_prev
        FROM filled WHERE v IS NULL
        """
    )
