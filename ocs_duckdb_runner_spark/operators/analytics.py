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

from pyspark.sql import DataFrame, SparkSession
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
    customer is the broadcast side; the top-10 is TakeOrderedAndProject
    (per-partition heaps), never a global sort."""
    cut = F.lit("1998-07-01").cast("timestamp")
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cut)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cut)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
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
    ordering customer and the shipping supplier share a nation. region,
    nation, supplier are broadcast (map-side, zero shuffle); the fact chain
    customer→orders→lineitem shuffles on its keys only."""
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
        .join(F.broadcast(s), (li.l_suppkey == s.s_suppkey)
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
