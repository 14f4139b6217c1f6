"""Multi-operator analytic query shapes (TPC-H-style) over the star schema.

The reference exercises exactly one analytic shape — scan → box filter →
grouped min/avg → sort (/root/reference/runner.cc:174-182); these queries
compose the SAME primitive operators (scan, filter, hash join, hash
aggregate, sort, limit) into the canonical warehouse query patterns, proving
the composed surface, not just each operator in isolation.

Exactness: all revenue aggregates are fixed-point (exactness.py) — integer
sums are order-independent, so results are bit-identical at any partition
count / cluster size. Dates compare as DATE on both sides.

Scale notes (the 100 TB plan for each shape):
- Q3/Q10: fact tables filter FIRST (predicate pushdown to parquet row-group
  stats), dims broadcast — the only shuffle is the final group-by on the
  filtered/joined rows.
- Q4: EXISTS compiles to a left-semi hash join on l_orderkey; the non-equi
  residual (l_shipdate > o_orderdate) stays a post-probe filter, never a
  nested loop.
- Q5: a 6-table star; the three true dims (region, nation, supplier) are
  broadcast so the fact chain customer→orders→lineitem shuffles only on its
  join keys — with AQE free to re-plan sizes at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ocs_duckdb_runner_spark.registry import load_table, query

# revenue in 1e-4 units: l_extendedprice has 2 decimals, l_discount 2 ⇒
# price*(1-disc) has exactly 4; round() makes the per-row double identical
# in both engines, integer sum is order-independent.
_REV = "CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)"


def _rev_e4() -> F.Column:
    return F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("long")


@query(
    "tpch_q3_toporders",
    oracle=f"""
    SELECT o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
           CAST(sum({_REV}) AS BIGINT) AS revenue_e4,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-07-01'
      AND l.l_shipdate > TIMESTAMP '1998-07-01'
    GROUP BY o.o_orderkey, strftime(o.o_orderdate, '%Y-%m-%d')
    ORDER BY revenue_e4 DESC, o.o_orderkey
    LIMIT 10
    """,
    tags=("analytics", "tpch", "join", "topk"),
)
def tpch_q3_toporders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping priority): segment-filtered customers ⋈
    date-filtered orders ⋈ date-filtered lineitem → revenue per order →
    top-10. Both date predicates push down to parquet row-group stats;
    customer grows with SF so it carries no forced broadcast hint — the
    planner/AQE broadcasts it while it fits and shuffle-joins beyond; the
    top-10 is TakeOrderedAndProject (per-partition heaps), never a global
    sort."""
    cut = F.lit("1998-07-01").cast("timestamp")
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cut)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cut)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        )
        .agg(
            F.sum(_rev_e4()).alias("revenue_e4"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy(F.col("revenue_e4").desc(), "o_orderkey")
        .limit(10)
    )


@query(
    "tpch_q4_order_priority",
    oracle="""
    SELECT o.o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o.o_orderpriority
    """,
    tags=("analytics", "tpch", "subquery", "semi"),
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order priority checking): correlated EXISTS with a
    non-equi residual — orders in a date window having at least one line
    shipped after the order date. Spark plans the semi join as a hash join
    on l_orderkey with l_shipdate > o_orderdate as the post-probe
    condition; each qualifying order counts once regardless of line
    multiplicity (semi-join semantics, not join+distinct)."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@query(
    "tpch_q5_nation_revenue",
    oracle=f"""
    SELECT n.n_name,
           CAST(sum({_REV}) AS BIGINT) AS revenue_e4,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN supplier s ON s.s_nationkey = n.n_nationkey
    JOIN customer c ON c.c_nationkey = s.s_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
                   AND l.l_suppkey = s.s_suppkey
    WHERE r.r_name IN ('ASIA', 'EUROPE')
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1999-01-01'
    GROUP BY n.n_name
    """,
    tags=("analytics", "tpch", "join", "star"),
)
def tpch_q5_nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (local supplier volume): the 6-table star with the
    cycle condition c_nationkey = s_nationkey — revenue by nation where the
    ordering customer and the shipping supplier share a nation. region and
    nation are broadcast (constant-size dims, map-side, zero shuffle);
    supplier grows with SF so it carries no hint — AQE broadcasts it while
    it fits; the fact chain customer→orders→lineitem shuffles on its keys
    only."""
    r = load_table(spark, sf_dir, "region").filter(
        F.col("r_name").isin("ASIA", "EUROPE")
    )
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (li.l_suppkey == s.s_suppkey)
              & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.sum(_rev_e4()).alias("revenue_e4"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "tpch_q10_returned",
    oracle=f"""
    SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(sum({_REV}) AS BIGINT) AS revenue_e4
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue_e4 DESC, c.c_custkey
    LIMIT 20
    """,
    tags=("analytics", "tpch", "join", "topk"),
)
def tpch_q10_returned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item reporting): lost revenue per customer
    from returned lines in a quarter-year window, top-20. The returnflag
    and date predicates prune at the scan; nation broadcasts onto customer;
    the only wide exchange is the group-by on c_custkey."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_rev_e4()).alias("revenue_e4"))
        .orderBy(F.col("revenue_e4").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "tpch_q6_forecast",
    oracle="""
    SELECT CAST(sum(CAST(round(l_extendedprice * l_discount * 10000) AS BIGINT))
                AS BIGINT) AS revenue_e4,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    tags=("analytics", "tpch", "filter", "agg"),
)
def tpch_q6_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape (revenue-change forecast): pure scan → conjunctive
    filter → ungrouped sum. The whole predicate (date range + discount band
    + quantity cap) pushes to the parquet scan, so at 100 TB this reads only
    row groups whose min/max stats overlap the band — no shuffle at all; the
    single-row answer is a partial-agg + one-row final merge.

    Exactness: l_extendedprice (2 dp) × l_discount (2 dp) has exactly 4
    decimals — round(x*1e4) is an integer, and integer sums are
    order-independent across any partitioning."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_rev = F.round(
        F.col("l_extendedprice") * F.col("l_discount") * 10000
    ).cast("long")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(disc_rev).alias("revenue_e4"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "tpch_q8_market_share",
    oracle=f"""
    SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
           CAST(sum({_REV}) FILTER (WHERE n2.n_name = 'NATION_5') AS BIGINT)
               AS nation_rev_e4,
           CAST(sum({_REV}) AS BIGINT) AS total_rev_e4,
           CAST(sum({_REV}) FILTER (WHERE n2.n_name = 'NATION_5') AS DOUBLE)
               / CAST(sum({_REV}) AS DOUBLE) AS mkt_share
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON n1.n_nationkey = c.c_nationkey
    JOIN region r   ON r.r_regionkey = n1.n_regionkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n2  ON n2.n_nationkey = s.s_nationkey
    WHERE r.r_name = 'ASIA'
    GROUP BY year(o.o_orderdate)
    ORDER BY o_year
    """,
    tags=("analytics", "tpch", "join", "star"),
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): of all revenue sold into the
    ASIA region, the fraction supplied by NATION_5, per order-year. Two
    distinct roles for ``nation`` (customer side and supplier side) — the
    same dim broadcast twice under different aliases. The share is a ratio
    of two order-independent integer sums; dividing the same two BIGINTs as
    doubles is one IEEE op, bit-identical on both engines.

    100 TB plan: region/nation broadcast (constant-size); supplier is
    unhinted — AQE broadcasts while it fits; the fact chain
    lineitem→orders→customer shuffles on join keys only, and the final
    group-by is on ~7 distinct years — a near-free exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").alias("n1")
    n2 = load_table(spark, sf_dir, "nation").alias("n2")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation_rev = F.when(F.col("n2.n_name") == "NATION_5", _rev_e4())
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1.n_nationkey"))
        .join(F.broadcast(r), F.col("n1.n_regionkey") == r.r_regionkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), s.s_nationkey == F.col("n2.n_nationkey"))
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            F.sum(nation_rev).alias("nation_rev_e4"),
            F.sum(_rev_e4()).alias("total_rev_e4"),
            (
                F.sum(nation_rev).cast("double")
                / F.sum(_rev_e4()).cast("double")
            ).alias("mkt_share"),
        )
        .orderBy("o_year")
    )


@query(
    "tpch_q13_custdist",
    oracle="""
    SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
    FROM (
        SELECT c.c_custkey, CAST(count(o.o_orderkey) AS BIGINT) AS c_count
        FROM customer c
        LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                          AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    tags=("analytics", "tpch", "join", "agg"),
)
def tpch_q13_custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer order distribution): LEFT join with an
    extra non-key predicate INSIDE the join condition (not a post-filter —
    that would drop the zero-order customers), per-customer order count
    including zeros, then the distribution of those counts. Two chained
    aggregations: the first shuffles on c_custkey, the second on the tiny
    c_count domain (≤ tens of values) — the classic wide-then-narrow
    re-aggregation whose second exchange is negligible at any scale."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderpriority"
    )
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey)
            & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@query(
    "tpch_q17_small_qty",
    oracle=f"""
    WITH lines AS (
        SELECT l.l_partkey, {_REV} AS rev_e4,
               CAST(round(l.l_quantity * 100) AS BIGINT) AS q_e2
        FROM lineitem l
        JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand = 'Brand#13'
    ), win AS (
        SELECT rev_e4, q_e2,
               sum(q_e2) OVER (PARTITION BY l_partkey) AS sum_q_e2,
               count(*) OVER (PARTITION BY l_partkey) AS n_part_lines
        FROM lines
    )
    SELECT CAST(sum(rev_e4) AS BIGINT) AS small_qty_rev_e4,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM win
    WHERE 5 * n_part_lines * q_e2 < sum_q_e2
    """,
    tags=("analytics", "tpch", "window", "join"),
)
def tpch_q17_small_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): revenue from lines
    whose quantity is below 20% of the per-part average, for one brand.
    The correlated AVG subquery is expressed as a window over l_partkey —
    one shuffle on partkey instead of a self-join (half the scans). The
    fractional comparison q < sum/(5n) is cross-multiplied to
    5·n·q_e2 < sum_q_e2 — pure integer arithmetic, no division, exact on
    both engines.

    100 TB plan: part grows with SF, so the brand-filtered side carries no
    forced broadcast hint — AQE measures the post-filter size at runtime
    and broadcasts while it fits (a ~1/25 brand slice of a 100 TB-scale
    part is still tens of GB, where a forced hint would OOM); the window
    shuffle keys on l_partkey which is high-cardinality and unskewed, and
    AQE coalesces the post-filter partitions."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13")
    q_e2 = F.round(F.col("l_quantity") * 100).cast("long")
    w = Window.partitionBy("l_partkey")
    lines = li.join(p, li.l_partkey == p.p_partkey).select(
        "l_partkey",
        _rev_e4().alias("rev_e4"),
        q_e2.alias("q_e2"),
    )
    win = lines.select(
        "rev_e4",
        "q_e2",
        F.sum("q_e2").over(w).alias("sum_q_e2"),
        F.count(F.lit(1)).over(w).alias("n_part_lines"),
    )
    return (
        win.filter(5 * F.col("n_part_lines") * F.col("q_e2") < F.col("sum_q_e2"))
        .agg(
            F.sum("rev_e4").alias("small_qty_rev_e4"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "tpch_q18_large_orders",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS order_date,
           CAST(round(o.o_totalprice * 100) AS BIGINT) AS totalprice_e2,
           CAST(sum(CAST(round(l.l_quantity * 100) AS BIGINT)) AS BIGINT)
               AS sum_qty_e2
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING sum(CAST(round(l_quantity * 100) AS BIGINT)) > 25000
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey,
             strftime(o.o_orderdate, '%Y-%m-%d'), o.o_totalprice
    ORDER BY totalprice_e2 DESC, o.o_orderkey
    LIMIT 100
    """,
    tags=("analytics", "tpch", "subquery", "topk"),
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): orders whose total line
    quantity exceeds a threshold, joined back to customer, top-100 by
    price. The IN-subquery is an aggregate-then-semi-join: Spark computes
    the qualifying keyset with a partial-agg pipeline and semi-joins it
    into the fact — at 100 TB the keyset is a vanishing fraction of orders
    (AQE turns the semi join into a broadcast automatically when it fits).
    Quantities are e2 fixed-point so the HAVING threshold is an exact
    integer comparison."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    q_e2 = F.round(F.col("l_quantity") * 100).cast("long")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(q_e2).alias("tot_q_e2"))
        .filter(F.col("tot_q_e2") > 25000)
        .select("l_orderkey")
    )
    return (
        li.join(big.withColumnRenamed("l_orderkey", "big_key"),
                F.col("l_orderkey") == F.col("big_key"), "left_semi")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            F.round(F.col("o_totalprice") * 100).cast("long").alias(
                "totalprice_e2"
            ),
        )
        .agg(F.sum(q_e2).alias("sum_qty_e2"))
        .orderBy(F.col("totalprice_e2").desc(), "o_orderkey")
        .limit(100)
    )


@query(
    "tpch_q22_idle_balance",
    oracle="""
    WITH pos AS (
        SELECT CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
                   AS sum_e2,
               CAST(count(*) AS BIGINT) AS cnt
        FROM customer
        WHERE c_acctbal > 0.0
          AND c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
    )
    SELECT c.c_nationkey,
           CAST(count(*) AS BIGINT) AS n_cust,
           CAST(sum(CAST(round(c.c_acctbal * 100) AS BIGINT)) AS BIGINT)
               AS total_acctbal_e2
    FROM customer c, pos
    WHERE c.c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
      AND CAST(round(c.c_acctbal * 100) AS BIGINT) * pos.cnt > pos.sum_e2
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-06-01')
    GROUP BY c.c_nationkey
    ORDER BY c.c_nationkey
    """,
    tags=("analytics", "tpch", "subquery", "anti"),
)
def tpch_q22_idle_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): customers in a country
    set with above-average positive balance and NO RECENT orders — a
    scalar aggregate subquery feeding a filter, plus an anti join whose
    build side is itself date-filtered. The schema has no c_phone, so the
    country code is c_nationkey directly.

    The above-average test is cross-multiplied (bal_e2 · cnt > sum_e2) —
    exact integers, no division, no float averaging drift. The scalar
    (sum, count) pair is a one-row broadcast; the anti join keys on
    o_custkey. At 100 TB the anti join is the only wide exchange, and the
    orders side can be pre-projected to the single join column (column
    pruning reaches the scan)."""
    nations = [1, 3, 5, 7, 9, 11, 13]
    bal_e2 = F.round(F.col("c_acctbal") * 100).cast("long")
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_nationkey").isin(nations)
    )
    pos = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            F.sum(bal_e2).alias("sum_e2"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-06-01").cast("timestamp"))
        .select("o_custkey")
    )
    return (
        c.crossJoin(F.broadcast(pos))
        .filter(bal_e2 * F.col("cnt") > F.col("sum_e2"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.sum(bal_e2).alias("total_acctbal_e2"),
        )
        .orderBy("c_nationkey")
    )


@query(
    "agg_pareto_share",
    oracle="""
    WITH rev AS (
        SELECT o_custkey,
               CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                 AS r
        FROM orders GROUP BY o_custkey
    ),
    ranked AS (
        SELECT r,
               row_number() OVER (ORDER BY r DESC, o_custkey) AS rk,
               sum(r) OVER (ORDER BY r DESC, o_custkey
                            ROWS UNBOUNDED PRECEDING) AS cum,
               sum(r) OVER () AS tot,
               count(*) OVER () AS n
        FROM rev
    )
    SELECT CAST(min(rk) AS BIGINT) AS n_top_customers,
           CAST(any_value(n) AS BIGINT) AS n_customers,
           round(CAST(min(rk) AS DOUBLE) / any_value(n) * 100, 9)
             AS top_pct_of_customers,
           CAST(any_value(tot) AS BIGINT) AS total_revenue_c
    FROM ranked
    WHERE cum * 10 >= tot * 8
    """,
    tags=("agg", "pareto", "reporting"),
)
def agg_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration (the 80/20 report): the smallest number of
    top customers whose cumulative revenue reaches 80% of the total —
    the skew summary behind account prioritization AND the empirical
    basis for expecting hot keys in this data (join_skew_salted /
    agg_skew_salted exist because this number is small). The 80%
    threshold compares exact integers cross-multiplied (cum·10 ≥
    tot·8) — no float boundary at all; only the final percentage
    divides.

    Plan: per-customer revenue is one key aggregate; the ranked
    cumulative is one global-ordered window over customers (at 100 TB:
    pre-aggregate to revenue-band histograms and scan the tail, the
    standard decomposition); the answer is a 1-row min."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    rev = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("r")
    )
    wr = Window.orderBy(F.col("r").desc(), "o_custkey")
    ranked = rev.select(
        "r",
        F.row_number().over(wr).alias("rk"),
        F.sum("r").over(wr.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
    )
    tots = rev.agg(
        F.sum("r").cast("long").alias("tot"), F.count(F.lit(1)).alias("n")
    )
    return (
        ranked.crossJoin(F.broadcast(tots))
        .filter(F.col("cum") * 10 >= F.col("tot") * 8)
        .agg(
            F.min("rk").cast("long").alias("n_top_customers"),
            F.max("n").cast("long").alias("n_customers"),
            F.round(
                F.min("rk").cast("double") / F.max("n") * 100, 9
            ).alias("top_pct_of_customers"),
            F.max("tot").cast("long").alias("total_revenue_c"),
        )
    )


# correlation-matrix measures: (name, SQL scaled-integer expr, scale)
_CORR_VARS = (
    ("qty", "CAST(round(l_quantity) AS BIGINT)"),
    ("price", "CAST(round(l_extendedprice * 100) AS BIGINT)"),
    ("disc", "CAST(round(l_discount * 100) AS BIGINT)"),
    ("tax", "CAST(round(l_tax * 100) AS BIGINT)"),
)
_CORR_PAIRS = tuple(
    (_CORR_VARS[i][0], _CORR_VARS[j][0])
    for i in range(len(_CORR_VARS))
    for j in range(i + 1, len(_CORR_VARS))
)


def _corr_matrix_oracle() -> str:
    scaled = ", ".join(f"{expr} AS {name}" for name, expr in _CORR_VARS)
    # second moments overflow BIGINT at the 10x probe (Σprice_cents² ≈
    # 6e20 > 2^63 — caught by the probe, not the sf0.01 gate), so they are
    # summed in 128-bit: DuckDB's sum(BIGINT) is already HUGEINT; the
    # double cast happens once, on the exact integer total
    sums = ["CAST(count(*) AS DOUBLE) AS n"]
    for name, _ in _CORR_VARS:
        sums.append(f"CAST(sum({name}) AS DOUBLE) AS s_{name}")
        sums.append(f"CAST(sum({name} * {name}) AS DOUBLE) AS ss_{name}")
    for x, y in _CORR_PAIRS:
        sums.append(f"CAST(sum({x} * {y}) AS DOUBLE) AS sp_{x}_{y}")
    corrs = ", ".join(
        f"(n * sp_{x}_{y} - s_{x} * s_{y})"
        f" / sqrt(n * ss_{x} - s_{x} * s_{x})"
        f" / sqrt(n * ss_{y} - s_{y} * s_{y}) AS corr_{x}_{y}"
        for x, y in _CORR_PAIRS
    )
    return f"""
    WITH scaled AS (SELECT {scaled} FROM lineitem),
    sums AS (SELECT {', '.join(sums)} FROM scaled)
    SELECT {corrs} FROM sums
    """


@query("agg_corr_matrix", oracle=_corr_matrix_oracle(), tags=("agg", "corr"))
def agg_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact pairwise Pearson correlation matrix over the four lineitem
    measures (quantity, extendedprice, discount, tax) — the feature-
    screening pass a modeling pipeline runs before training. Unlike
    agg_stats's corr (engine-native, rounded to absorb float order),
    every moment here is an ORDER-INDEPENDENT integer sum on the fixed
    decimal grid; the classic n·Σxy−ΣxΣy formula is then evaluated on
    those integers cast to double, so each of the 6 coefficients is
    bit-identical cross-engine with NO rounding — the same exactness
    escalation fx_sum applies to sums, extended to second moments.

    Plan: ONE scan and ONE 1-row aggregate computing all 15 moments
    (4 sums + 4 squares + 6 cross-products + count) as map-side integer
    partials — the shuffle carries 15 numbers per partition regardless of
    data size; the coefficient arithmetic is a scalar projection on the
    1-row frame. Second-moment sums are 128-bit (decimal(38,0) in Spark,
    HUGEINT promotion in DuckDB) because Σprice_cents² already overflows
    int64 at the 10× probe — the probe caught exactly this before it
    shipped on int64."""
    li = load_table(spark, sf_dir, "lineitem")
    cols = {
        "qty": F.round(F.col("l_quantity")).cast("long"),
        "price": F.round(F.col("l_extendedprice") * 100).cast("long"),
        "disc": F.round(F.col("l_discount") * 100).cast("long"),
        "tax": F.round(F.col("l_tax") * 100).cast("long"),
    }
    # per-row products fit a long (≤ ~1e14); their SUMS don't at 10×+, so
    # accumulate in decimal(38,0) — the Spark twin of DuckDB's HUGEINT
    # promotion — and cast the exact total to double once
    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    for name in cols:
        aggs.append(F.sum(cols[name]).cast("double").alias(f"s_{name}"))
        aggs.append(
            F.sum((cols[name] * cols[name]).cast("decimal(38,0)"))
            .cast("double")
            .alias(f"ss_{name}")
        )
    for x, y in _CORR_PAIRS:
        aggs.append(
            F.sum((cols[x] * cols[y]).cast("decimal(38,0)"))
            .cast("double")
            .alias(f"sp_{x}_{y}")
        )
    sums = li.agg(*aggs)
    n = F.col("n")
    out = [
        (
            (n * F.col(f"sp_{x}_{y}") - F.col(f"s_{x}") * F.col(f"s_{y}"))
            / F.sqrt(n * F.col(f"ss_{x}") - F.col(f"s_{x}") * F.col(f"s_{x}"))
            / F.sqrt(n * F.col(f"ss_{y}") - F.col(f"s_{y}") * F.col(f"s_{y}"))
        ).alias(f"corr_{x}_{y}")
        for x, y in _CORR_PAIRS
    ]
    return sums.select(*out)


@query(
    "agg_ship_latency_histogram",
    oracle="""
    WITH lat AS (
        SELECT l.l_returnflag,
               CAST(date_diff('day', CAST(o.o_orderdate AS TIMESTAMP),
                              CAST(l.l_shipdate AS TIMESTAMP)) AS BIGINT)
                   AS lat_days
        FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    ),
    bucketed AS (
        SELECT l_returnflag,
               CASE WHEN lat_days < 0 THEN 'neg'
                    WHEN lat_days < 7 THEN '0-6d'
                    WHEN lat_days < 30 THEN '7-29d'
                    WHEN lat_days < 90 THEN '30-89d'
                    ELSE '90d+' END AS bucket
        FROM lat
    )
    SELECT l_returnflag, bucket, CAST(count(*) AS BIGINT) AS n_lines
    FROM bucketed GROUP BY l_returnflag, bucket
    ORDER BY l_returnflag, bucket
    """,
    tags=("agg", "ops", "latency"),
)
def agg_ship_latency_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency histogram by return flag — the fulfillment
    SLA report: day-granular latency (shipdate − orderdate) bucketed
    into operational bands, counted per flag. Day differences and
    bucket edges are pure integer arithmetic, so the histogram is exact
    cross-engine.

    Plan: ONE fact-fact equi-join on the order key — at 100 TB both
    sides shuffle-partition on l_orderkey/o_orderkey (or read
    pre-bucketed on it and skip the exchange entirely, the
    join_bucketed layout); the join output immediately collapses to
    (flag, bucket) partial counts, so the post-join exchange carries a
    ~15-row key space. Nothing wider than the two key+date columns is
    ever read (column pruning pinned by the scan's ReadSchema)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_shipdate"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    lat = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_returnflag",
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).alias("lat_days"),
    )
    bucket = (
        F.when(F.col("lat_days") < 0, "neg")
        .when(F.col("lat_days") < 7, "0-6d")
        .when(F.col("lat_days") < 30, "7-29d")
        .when(F.col("lat_days") < 90, "30-89d")
        .otherwise("90d+")
    )
    return (
        lat.select("l_returnflag", bucket.alias("bucket"))
        .groupBy("l_returnflag", "bucket")
        .agg(F.count(F.lit(1)).alias("n_lines"))
        .orderBy("l_returnflag", "bucket")
    )


@query(
    "agg_ols_two_factor",
    oracle="""
    WITH m AS (
        SELECT l_returnflag AS grp,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS s1,
               CAST(sum(CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) AS s2,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sy,
               CAST(sum(CAST(round(l_quantity) AS BIGINT)
                        * CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS s11,
               CAST(sum(CAST(round(l_quantity) AS BIGINT)
                        * CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) AS s12,
               CAST(sum(CAST(round(l_discount * 100) AS BIGINT)
                        * CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) AS s22,
               CAST(sum(CAST(round(l_quantity) AS BIGINT)
                        * CAST(round(l_extendedprice * 100) AS BIGINT)) AS HUGEINT) AS s1y,
               CAST(sum(CAST(round(l_discount * 100) AS BIGINT)
                        * CAST(round(l_extendedprice * 100) AS BIGINT)) AS HUGEINT) AS s2y,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                        * CAST(round(l_extendedprice * 100) AS BIGINT)) AS HUGEINT) AS syy
        FROM lineitem GROUP BY l_returnflag
    ),
    c AS (
        SELECT grp, n,
               CAST(CAST(n AS HUGEINT) * s11 - CAST(s1 AS HUGEINT) * s1 AS DOUBLE) AS c11,
               CAST(CAST(n AS HUGEINT) * s12 - CAST(s1 AS HUGEINT) * s2 AS DOUBLE) AS c12,
               CAST(CAST(n AS HUGEINT) * s22 - CAST(s2 AS HUGEINT) * s2 AS DOUBLE) AS c22,
               CAST(CAST(n AS HUGEINT) * s1y - CAST(s1 AS HUGEINT) * sy AS DOUBLE) AS c1y,
               CAST(CAST(n AS HUGEINT) * s2y - CAST(s2 AS HUGEINT) * sy AS DOUBLE) AS c2y,
               CAST(CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE) AS cyy,
               CAST(s1 AS DOUBLE) AS d1, CAST(s2 AS DOUBLE) AS d2,
               CAST(sy AS DOUBLE) AS dy
        FROM m
    )
    SELECT grp AS l_returnflag, n,
           round((c22 * c1y - c12 * c2y) / (c11 * c22 - c12 * c12), 9) AS b_qty_c,
           round((c11 * c2y - c12 * c1y) / (c11 * c22 - c12 * c12), 9) AS b_disc_c,
           round((dy - (c22 * c1y - c12 * c2y) / (c11 * c22 - c12 * c12) * d1
                     - (c11 * c2y - c12 * c1y) / (c11 * c22 - c12 * c12) * d2)
                 / n, 9) AS intercept_c,
           round(((c22 * c1y - c12 * c2y) / (c11 * c22 - c12 * c12) * c1y
                + (c11 * c2y - c12 * c1y) / (c11 * c22 - c12 * c12) * c2y)
                 / cyy, 9) AS r2
    FROM c ORDER BY l_returnflag
    """,
    tags=("agg", "stats", "regression"),
)
def agg_ols_two_factor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-factor ordinary least squares per return flag — price_cents ~
    quantity + discount_pct, solved in closed form from the CENTERED
    normal equations: b = [C22*C1y - C12*C2y, C11*C2y - C12*C1y] / det,
    det = C11*C22 - C12², where every C term is n*Σxixj − ΣxiΣxj on the
    exact integer moment grid. extends event_trend_regression (single
    regressor) to the multiple-regression shape feature pipelines
    actually fit, plus R² from the same moments.

    Exactness: nine integer moments per group (map-side combined, order
    independent); the centered products leave BIGINT range around sf100
    (n·Σx1y ~ 1e26), so both engines widen to 128-bit integers
    (HUGEINT / decimal(38,0)) BEFORE the subtraction, cast the exact
    C terms to double, and then run the identical IEEE expression tree —
    bit-equal b/intercept/R² at any partition count.

    Plan: one partial-aggregated moments pass over the scan (3 groups →
    9-long rows), all regression algebra on a 3-row frame. At 100 TB this
    is a single fact scan + a 3-key exchange — the cheapest possible
    shape for a fitted model."""
    li = load_table(spark, sf_dir, "lineitem")
    x1 = F.round(F.col("l_quantity")).cast("long")
    x2 = F.round(F.col("l_discount") * 100).cast("long")
    y = F.round(F.col("l_extendedprice") * 100).cast("long")
    m = li.groupBy(F.col("l_returnflag").alias("grp")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x1).cast("long").alias("s1"),
        F.sum(x2).cast("long").alias("s2"),
        F.sum(y).cast("long").alias("sy"),
        F.sum(x1 * x1).cast("long").alias("s11"),
        F.sum(x1 * x2).cast("long").alias("s12"),
        F.sum(x2 * x2).cast("long").alias("s22"),
        F.sum((x1 * y).cast("decimal(38,0)")).alias("s1y"),
        F.sum((x2 * y).cast("decimal(38,0)")).alias("s2y"),
        F.sum((y * y).cast("decimal(38,0)")).alias("syy"),
    )

    def cen(sij: str, si: str, sj: str) -> F.Column:
        big = "decimal(38,0)"
        return (
            F.col("n").cast(big) * F.col(sij).cast(big)
            - F.col(si).cast(big) * F.col(sj).cast(big)
        ).cast("double")

    c = m.select(
        "grp",
        "n",
        cen("s11", "s1", "s1").alias("c11"),
        cen("s12", "s1", "s2").alias("c12"),
        cen("s22", "s2", "s2").alias("c22"),
        cen("s1y", "s1", "sy").alias("c1y"),
        cen("s2y", "s2", "sy").alias("c2y"),
        cen("syy", "sy", "sy").alias("cyy"),
        F.col("s1").cast("double").alias("d1"),
        F.col("s2").cast("double").alias("d2"),
        F.col("sy").cast("double").alias("dy"),
    )
    det = F.col("c11") * F.col("c22") - F.col("c12") * F.col("c12")
    b1 = (F.col("c22") * F.col("c1y") - F.col("c12") * F.col("c2y")) / det
    b2 = (F.col("c11") * F.col("c2y") - F.col("c12") * F.col("c1y")) / det
    return c.select(
        F.col("grp").alias("l_returnflag"),
        "n",
        F.round(b1, 9).alias("b_qty_c"),
        F.round(b2, 9).alias("b_disc_c"),
        F.round(
            (F.col("dy") - b1 * F.col("d1") - b2 * F.col("d2")) / F.col("n"), 9
        ).alias("intercept_c"),
        F.round((b1 * F.col("c1y") + b2 * F.col("c2y")) / F.col("cyy"), 9).alias(
            "r2"
        ),
    ).orderBy("l_returnflag")


@query(
    "agg_order_backlog_curve",
    oracle="""
    WITH pts AS (
        SELECT date_trunc('month', o.o_orderdate) AS m, 1 AS d
        FROM orders o
        UNION ALL
        SELECT date_trunc('month', l.l_shipdate + INTERVAL 1 MONTH), -1
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE l.l_linenumber = 1
    ),
    monthly AS (
        SELECT m, CAST(sum(d) AS BIGINT) AS delta FROM pts GROUP BY m
    )
    SELECT CAST(m AS TIMESTAMP) AS month,
           delta,
           CAST(sum(delta) OVER (ORDER BY m
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS open_orders
    FROM monthly ORDER BY month
    """,
    tags=("agg", "backlog", "sweepline"),
)
def agg_order_backlog_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog over time — the operations curve 'how many
    orders were placed but not yet (first-line) shipped, by month',
    computed as a SWEEP-LINE: +1 at the order month, −1 the month after
    the first line ships, cumulative-summed over the tiny monthly frame.
    The same endpoint-delta identity event_concurrency_sweepline uses,
    applied to a business interval (order→ship) instead of a session —
    and the reason neither needs the quadratic month×order interval
    join.

    Plan: the ship-side endpoint needs one key-only join (line 1 →
    order); both endpoint streams partial-aggregate map-side onto month
    keys; the running sum is a window over #months rows. At 100 TB the
    only data-sized operation is the equi-join; everything after is
    bounded by the calendar."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_linenumber") == 1
    )
    opens = o.select(
        F.date_trunc("month", F.col("o_orderdate")).alias("m"),
        F.lit(1).alias("d"),
    )
    closes = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            F.date_trunc(
                "month", F.col("l_shipdate") + F.expr("INTERVAL 1 MONTH")
            ).alias("m"),
            F.lit(-1).alias("d"),
        )
    )
    monthly = (
        opens.unionAll(closes)
        .groupBy("m")
        .agg(F.sum("d").cast("long").alias("delta"))
    )
    w = Window.orderBy("m").rowsBetween(Window.unboundedPreceding, 0)
    return monthly.select(
        F.col("m").cast("timestamp").alias("month"),
        "delta",
        F.sum("delta").over(w).cast("long").alias("open_orders"),
    ).orderBy("month")


@query(
    "agg_price_index_laspeyres",
    oracle="""
    WITH li AS (
        SELECT l_partkey,
               date_trunc('month', l_shipdate) AS m,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
               CAST(round(l_quantity) AS BIGINT) AS q
        FROM lineitem),
    bounds AS (SELECT min(m) AS m0, max(m) AS m1 FROM li),
    per AS (
        SELECT l_partkey, m,
               CAST(sum(pc) AS BIGINT) AS sc,
               CAST(sum(q) AS BIGINT) AS sq
        FROM li GROUP BY l_partkey, m),
    p0 AS (SELECT per.* FROM per, bounds WHERE per.m = bounds.m0),
    p1 AS (SELECT per.* FROM per, bounds WHERE per.m = bounds.m1),
    terms AS (
        SELECT p0.sc AS base_spend_c,
               CAST(round(CAST(p1.sc AS DOUBLE) * p0.sq / p1.sq)
                    AS BIGINT) AS repriced_c
        FROM p0 JOIN p1 USING (l_partkey))
    SELECT CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(base_spend_c) AS BIGINT) AS base_spend_c,
           CAST(sum(repriced_c) AS BIGINT) AS repriced_c,
           round(CAST(sum(repriced_c) AS DOUBLE) / sum(base_spend_c), 9)
               AS laspeyres_index
    FROM terms
    """,
    tags=("agg", "economics", "index"),
)
def agg_price_index_laspeyres(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Laspeyres price index between the first and last shipping month —
    the fixed-basket inflation measure (what would period-0's basket
    cost at period-1 prices): Σp₁q₀ / Σp₀q₀ over parts traded in both
    periods. Exactness: Σp₀q₀ per part IS its period-0 spend (no
    division ever happens on the base side); the repriced term
    p₁·q₀ = s1c·s0q/s1q is rounded to integer cents PER PART before
    summation — the one double expression is per-key deterministic, so
    the sum is exact integer and immune to partition-order float drift
    (the embed_norm_outliers lesson, applied at design time).

    Plan: one (part, month) hash aggregate (map-side combined), a
    broadcast 1-row bounds frame, one part-keyed equi-join of the two
    period slices, one 1-row reduction — linear in the fact table."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.date_trunc("month", F.col("l_shipdate")).alias("m"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("pc"),
        F.round(F.col("l_quantity")).cast("long").alias("q"),
    )
    bounds = li.agg(F.min("m").alias("m0"), F.max("m").alias("m1"))
    per = li.groupBy("l_partkey", "m").agg(
        F.sum("pc").cast("long").alias("sc"),
        F.sum("q").cast("long").alias("sq"),
    )
    pb = per.crossJoin(F.broadcast(bounds))
    p0 = pb.filter(F.col("m") == F.col("m0")).select(
        "l_partkey", F.col("sc").alias("s0c"), F.col("sq").alias("s0q")
    )
    p1 = pb.filter(F.col("m") == F.col("m1")).select(
        "l_partkey", F.col("sc").alias("s1c"), F.col("sq").alias("s1q")
    )
    terms = p0.join(p1, "l_partkey").select(
        F.col("s0c").alias("base_spend_c"),
        F.round(
            F.col("s1c").cast("double") * F.col("s0q") / F.col("s1q")
        ).cast("long").alias("repriced_c"),
    )
    return terms.agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum("base_spend_c").cast("long").alias("base_spend_c"),
        F.sum("repriced_c").cast("long").alias("repriced_c"),
        F.round(
            F.sum("repriced_c").cast("double") / F.sum("base_spend_c"), 9
        ).alias("laspeyres_index"),
    )


@query(
    "agg_price_index_fisher",
    oracle="""
    WITH li AS (
        SELECT l_partkey,
               date_trunc('month', l_shipdate) AS m,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS pc,
               CAST(round(l_quantity) AS BIGINT) AS q
        FROM lineitem),
    bounds AS (SELECT min(m) AS m0, max(m) AS m1 FROM li),
    per AS (
        SELECT l_partkey, m,
               CAST(sum(pc) AS BIGINT) AS sc,
               CAST(sum(q) AS BIGINT) AS sq
        FROM li GROUP BY l_partkey, m),
    p0 AS (SELECT per.* FROM per, bounds WHERE per.m = bounds.m0),
    p1 AS (SELECT per.* FROM per, bounds WHERE per.m = bounds.m1),
    terms AS (
        SELECT p0.sc AS l_den,
               CAST(round(CAST(p1.sc AS DOUBLE) * p0.sq / p1.sq)
                    AS BIGINT) AS l_num,
               p1.sc AS p_num,
               CAST(round(CAST(p0.sc AS DOUBLE) * p1.sq / p0.sq)
                    AS BIGINT) AS p_den
        FROM p0 JOIN p1 USING (l_partkey)),
    s AS (
        SELECT CAST(count(*) AS BIGINT) AS n_parts,
               CAST(sum(l_num) AS BIGINT) AS ln_, CAST(sum(l_den) AS BIGINT) AS ld,
               CAST(sum(p_num) AS BIGINT) AS pn, CAST(sum(p_den) AS BIGINT) AS pd
        FROM terms)
    SELECT n_parts,
           round(CAST(ln_ AS DOUBLE) / ld, 9) AS laspeyres,
           round(CAST(pn AS DOUBLE) / pd, 9) AS paasche,
           round(sqrt((CAST(ln_ AS DOUBLE) / ld)
                      * (CAST(pn AS DOUBLE) / pd)), 9) AS fisher
    FROM s
    """,
    tags=("agg", "economics", "index"),
)
def agg_price_index_fisher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full index-number triple: Laspeyres (period-0 basket at new
    prices — overstates inflation under substitution), Paasche
    (period-1 basket at old prices — understates it), and Fisher's
    ideal index (their geometric mean, the superlative index national
    accounts use). Same exactness discipline as
    agg_price_index_laspeyres: each basket side that CAN be a pure
    integer spend stays one (Σp₀q₀ = period-0 spend, Σp₁q₁ = period-1
    spend), and each repriced term rounds to integer cents per part
    before summation — no float crosses an aggregate.

    Plan: identical to the Laspeyres plan (one (part, month) aggregate,
    broadcast bounds, one part-keyed join); all three indexes fold from
    one 1-row exact-integer frame."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.date_trunc("month", F.col("l_shipdate")).alias("m"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("pc"),
        F.round(F.col("l_quantity")).cast("long").alias("q"),
    )
    bounds = li.agg(F.min("m").alias("m0"), F.max("m").alias("m1"))
    per = li.groupBy("l_partkey", "m").agg(
        F.sum("pc").cast("long").alias("sc"),
        F.sum("q").cast("long").alias("sq"),
    )
    pb = per.crossJoin(F.broadcast(bounds))
    p0 = pb.filter(F.col("m") == F.col("m0")).select(
        "l_partkey", F.col("sc").alias("s0c"), F.col("sq").alias("s0q")
    )
    p1 = pb.filter(F.col("m") == F.col("m1")).select(
        "l_partkey", F.col("sc").alias("s1c"), F.col("sq").alias("s1q")
    )
    terms = p0.join(p1, "l_partkey").select(
        F.col("s0c").alias("l_den"),
        F.round(F.col("s1c").cast("double") * F.col("s0q") / F.col("s1q"))
        .cast("long")
        .alias("l_num"),
        F.col("s1c").alias("p_num"),
        F.round(F.col("s0c").cast("double") * F.col("s1q") / F.col("s0q"))
        .cast("long")
        .alias("p_den"),
    )
    s = terms.agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum("l_num").cast("long").alias("ln_"),
        F.sum("l_den").cast("long").alias("ld"),
        F.sum("p_num").cast("long").alias("pn"),
        F.sum("p_den").cast("long").alias("pd"),
    )
    lasp = F.col("ln_").cast("double") / F.col("ld")
    paas = F.col("pn").cast("double") / F.col("pd")
    return s.select(
        "n_parts",
        F.round(lasp, 9).alias("laspeyres"),
        F.round(paas, 9).alias("paasche"),
        F.round(F.sqrt(lasp * paas), 9).alias("fisher"),
    )


@query(
    "agg_abc_classification",
    oracle="""
    WITH rev AS (
        SELECT l_partkey,
               CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                    AS BIGINT) AS r
        FROM lineitem GROUP BY l_partkey),
    tot AS (SELECT CAST(sum(r) AS BIGINT) AS t FROM rev),
    ranked AS (
        SELECT l_partkey, r,
               CAST(sum(r) OVER (ORDER BY r DESC, l_partkey
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        FROM rev),
    classed AS (
        SELECT CASE WHEN cum * 100 <= t * 80 THEN 'A'
                    WHEN cum * 100 <= t * 95 THEN 'B'
                    ELSE 'C' END AS abc_class,
               r
        FROM ranked, tot)
    SELECT abc_class,
           CAST(count(*) AS BIGINT) AS n_parts,
           CAST(sum(r) AS BIGINT) AS revenue_c
    FROM classed GROUP BY abc_class ORDER BY abc_class
    """,
    tags=("agg", "abc", "inventory"),
)
def agg_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory classification — parts bucketed by cumulative
    revenue share (A: first 80%, B: to 95%, C: tail), the Pareto cut
    procurement and warehouse-slotting run on every catalog; the class
    report is agg_pareto_share's sibling with assignments instead of a
    single threshold. Class boundaries compare integer cross-products
    (cum*100 vs t*80), so no float boundary can flip a part's class
    between engines; the (revenue desc, partkey) order makes the cumsum
    deterministic under revenue ties.

    Plan: one part-keyed revenue aggregate (map-side combined), one
    ordered cumulative window over the PART frame (catalog-sized, not
    fact-sized; the band-histogram decomposition documented at
    agg_pareto_share is the 100 TB form), one 3-key class rollup."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_partkey").agg(
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
        .cast("long")
        .alias("r")
    )
    tot = rev.agg(F.sum("r").cast("long").alias("t"))
    w = Window.orderBy(F.col("r").desc(), "l_partkey").rowsBetween(
        Window.unboundedPreceding, 0
    )
    ranked = rev.select(
        "r", F.sum("r").over(w).cast("long").alias("cum")
    ).crossJoin(F.broadcast(tot))
    cls = (
        F.when(F.col("cum") * 100 <= F.col("t") * 80, "A")
        .when(F.col("cum") * 100 <= F.col("t") * 95, "B")
        .otherwise("C")
    )
    return (
        ranked.select(cls.alias("abc_class"), "r")
        .groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("r").cast("long").alias("revenue_c"),
        )
        .orderBy("abc_class")
    )


@query(
    "join_conformed_date_dim",
    oracle="""
    WITH bounds AS (
        SELECT CAST(min(date_trunc('day', o_orderdate)) AS TIMESTAMP) AS d0,
               CAST(max(date_trunc('day', o_orderdate)) AS TIMESTAMP) AS d1
        FROM orders),
    dim AS (
        SELECT CAST(d0 + to_days(CAST(i AS INT)) AS TIMESTAMP) AS day,
               dayofweek(d0 + to_days(CAST(i AS INT))) + 1 AS dow,
               dayofweek(d0 + to_days(CAST(i AS INT))) + 1 IN (1, 7)
                   AS is_weekend
        FROM bounds,
             unnest(generate_series(0,
                 CAST(date_diff('day', d0, d1) AS BIGINT))) AS t(i)),
    facts AS (
        SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
               CAST(round(o_totalprice * 100) AS BIGINT) AS pc
        FROM orders)
    SELECT dim.is_weekend,
           CAST(count(DISTINCT dim.day) AS BIGINT) AS n_days,
           CAST(count(f.pc) AS BIGINT) AS n_orders,
           CAST(coalesce(sum(f.pc), 0) AS BIGINT) AS revenue_c
    FROM dim LEFT JOIN facts f USING (day)
    GROUP BY dim.is_weekend ORDER BY dim.is_weekend
    """,
    tags=("join", "date-dim", "star-schema"),
)
def join_conformed_date_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conformed date dimension built IN-ENGINE and joined back to the
    facts — the warehouse spine pattern: generate every calendar day
    between the fact bounds (so zero-activity days exist — the LEFT
    side no GROUP BY on raw facts can produce), attribute it (dow,
    weekend flag, pinned to one cross-engine convention), and report
    the weekend/weekday revenue split with day coverage. This is the
    dimension event_gap_fill's spine logic generalizes from; any
    holiday table would join onto the same dim.

    Plan: the dim is a generated lateral from a broadcast 1-row bounds
    frame (hundreds of rows per year — never data-sized); the fact join
    is day-keyed; the report is a 2-key rollup. At 100 TB the dim stays
    calendar-sized and broadcast."""
    o = load_table(spark, sf_dir, "orders")
    day = F.date_trunc("day", F.col("o_orderdate"))
    bounds = o.agg(
        F.min(day).alias("d0"), F.max(day).alias("d1")
    )
    dim = bounds.select(
        "d0",
        F.explode(
            F.sequence(
                F.lit(0),
                F.datediff(F.col("d1"), F.col("d0")).cast("int"),
            )
        ).alias("i"),
    ).select(F.expr("d0 + make_interval(0, 0, 0, i, 0, 0, 0)").alias("day"))
    dim = dim.select(
        "day",
        F.dayofweek("day").alias("dow"),
        F.dayofweek("day").isin(1, 7).alias("is_weekend"),
    )
    facts = o.select(
        day.cast("timestamp").alias("day"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("pc"),
    )
    return (
        dim.join(facts, "day", "left")
        .groupBy("is_weekend")
        .agg(
            F.countDistinct("day").alias("n_days"),
            F.count("pc").alias("n_orders"),
            F.coalesce(F.sum("pc"), F.lit(0)).cast("long").alias("revenue_c"),
        )
        .orderBy("is_weekend")
    )
