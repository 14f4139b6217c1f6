"""The remaining TPC-H query shapes (Q2, Q7, Q9, Q11, Q12, Q14, Q15, Q16,
Q19, Q20, Q21) — completing all 22 against the reduced star schema.

operators/analytics.py carries Q1/Q3/Q4/Q5/Q6/Q8/Q10/Q13/Q17/Q18/Q22; this
module adds the eleven shapes it lacked, so a user running any TPC-H query
pattern against the reference's operator surface (scan, filter, hash join,
hash aggregate, sort, limit — /root/reference/runner.cc:174-182) finds the
composed form here.

Schema adaptations (the fixtures are a REDUCED TPC-H: no partsupp table, no
l_commitdate/l_receiptdate/l_shipmode, no p_container/p_mfgr, no comment
columns) — each documented on the query it affects:
- partsupp is DERIVED from lineitem: the distinct (l_partkey, l_suppkey)
  pairs, with unit cost min(round(l_extendedprice / l_quantity · 1e4)) —
  observed floor price per pair (Q2, Q11, Q16, Q20).
- "late" is l_shipdate > o_orderdate + N days, replacing the
  commit/receipt-date lateness predicates (Q12, Q21).
- l_returnflag stands in for l_shipmode as the line-level dimension (Q12),
  p_type/p_size/p_brand for the container predicates (Q19), s_acctbal < 0
  for the customer-complaints comment scan (Q16).

Exactness follows the repo contract: money aggregates are fixed-point
integer sums (order-independent ⇒ identical at any partition count), ratios
are ONE double division of identical integers rounded to a shared grid.
Every shape names the 100 TB plan in its docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocs_duckdb_runner_spark.registry import load_table, query

# revenue in 1e-4 units — same grid as operators/analytics.py
_REV = "CAST(round(l_extendedprice * (1 - l_discount) * 10000) AS BIGINT)"


def _rev_e4() -> F.Column:
    return F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("long")


# unit cost of one (part, supplier) pair in 1e-4 units: the observed floor
# price per unit across that pair's lines — the derived-partsupp cost column
_COST = "CAST(round(l_extendedprice / l_quantity * 10000) AS BIGINT)"

_SQL_PS = f"""
    ps AS (
        SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
               min({_COST}) AS ps_cost_e4,
               CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT)
                 AS ps_qty
        FROM lineitem GROUP BY 1, 2
    )
"""


def _derived_ps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The derived partsupp: one row per observed (part, supplier) pair
    with floor unit cost (e4 grid) and total shipped quantity. One
    key-only aggregate over the 2-key fact slice; at 100 TB this is the
    same shuffle any partsupp scan would pay, keyed identically."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    cost = F.round(
        F.col("l_extendedprice") / F.col("l_quantity") * 10000
    ).cast("long")
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(
        F.min(cost).alias("ps_cost_e4"),
        F.sum(F.round(F.col("l_quantity")).cast("long")).cast("long").alias("ps_qty"),
    )


@query(
    "tpch_q2_min_cost_supplier",
    oracle=f"""
    WITH {_SQL_PS},
    eur AS (
        SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
        FROM supplier s
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        JOIN region r ON r.r_regionkey = n.n_regionkey
        WHERE r.r_name = 'EUROPE'
    ),
    cand AS (
        SELECT p.p_partkey, ps.ps_suppkey, ps.ps_cost_e4
        FROM ps
        JOIN part p ON p.p_partkey = ps.ps_partkey
        JOIN eur ON eur.s_suppkey = ps.ps_suppkey
        WHERE p.p_size = 15 AND p.p_type = 'STANDARD'
    ),
    best AS (
        SELECT p_partkey, min(ps_cost_e4) AS min_cost_e4
        FROM cand GROUP BY p_partkey
    )
    SELECT e.s_acctbal, e.s_name, e.n_name, c.p_partkey,
           c.ps_cost_e4 AS cost_e4
    FROM cand c
    JOIN best b ON b.p_partkey = c.p_partkey
               AND c.ps_cost_e4 = b.min_cost_e4
    JOIN eur e ON e.s_suppkey = c.ps_suppkey
    ORDER BY e.s_acctbal DESC, e.n_name, e.s_name, c.p_partkey
    LIMIT 100
    """,
    tags=("analytics", "tpch", "subquery", "join"),
)
def tpch_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): for each part in a
    size/type slice, the European supplier(s) quoting the minimum cost —
    the correlated-MIN-subquery pattern, decorrelated into an aggregate +
    self-equi-join. partsupp is the derived pair table (module header).

    Plan: region→nation→supplier is a broadcast dim chain; the derived ps
    aggregate shuffles on (partkey, suppkey); the per-part MIN is a
    key-only reaggregate joined back on (partkey, cost) — Catalyst keeps
    both sides partitioned by p_partkey, so the min-join adds no extra
    fact shuffle. At 100 TB the only wide exchange is the ps build."""
    ps = _derived_ps(spark, sf_dir)
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    s = load_table(spark, sf_dir, "supplier")
    eur = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "STANDARD")
    )
    cand = (
        ps.join(F.broadcast(p), ps.ps_partkey == p.p_partkey)
        .join(F.broadcast(eur), ps.ps_suppkey == eur.s_suppkey)
        .select("p_partkey", "ps_suppkey", "ps_cost_e4",
                "s_acctbal", "s_name", "n_name")
    )
    best = cand.groupBy(F.col("p_partkey").alias("b_partkey")).agg(
        F.min("ps_cost_e4").alias("min_cost_e4")
    )
    return (
        cand.join(
            best,
            (cand.p_partkey == best.b_partkey)
            & (cand.ps_cost_e4 == best.min_cost_e4),
        )
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey",
            F.col("ps_cost_e4").alias("cost_e4"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "tpch_q7_volume_shipping",
    oracle=f"""
    SELECT r1.r_name AS supp_region, r2.r_name AS cust_region,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           CAST(sum({_REV}) AS BIGINT) AS revenue_e4
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
    JOIN region r1 ON r1.r_regionkey = n1.n_regionkey
    JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
    JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
    WHERE ((r1.r_name = 'ASIA' AND r2.r_name = 'EUROPE')
        OR (r1.r_name = 'EUROPE' AND r2.r_name = 'ASIA'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY 1, 2, 3
    ORDER BY supp_region, cust_region, l_year
    """,
    tags=("analytics", "tpch", "join"),
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping): bilateral trade volume between
    two geographies by year — the two-role dimension join (the nation→
    region chain joined TWICE under different keys) with a disjunctive
    cross-filter. Region-level pairing (vs the spec's nation pair)
    because the sf0.001 fixture samples only 10 suppliers and any single
    nation can be empty there; the join topology — Q7's point — is
    identical, with one extra broadcast hop per role.

    Plan: nation/region ×2 and supplier broadcast; the customer→orders→
    lineitem chain shuffles on its join keys only; the date predicate
    pushes to row-group stats; the pair filter is a post-join codegen
    conjunct. Group-by space is 2 regions × 2 years — map-side partials
    collapse almost everything before the final exchange."""
    cut0 = F.lit("1996-01-01").cast("timestamp")
    cut1 = F.lit("1998-01-01").cast("timestamp")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= cut0) & (F.col("l_shipdate") < cut1)
    )
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    geo = n.join(r, n.n_regionkey == r.r_regionkey).select(
        "n_nationkey", "r_name"
    )
    g1 = geo.select(F.col("n_nationkey").alias("g1_key"),
                    F.col("r_name").alias("supp_region"))
    g2 = geo.select(F.col("n_nationkey").alias("g2_key"),
                    F.col("r_name").alias("cust_region"))
    pair = (
        (F.col("supp_region") == "ASIA") & (F.col("cust_region") == "EUROPE")
    ) | (
        (F.col("supp_region") == "EUROPE") & (F.col("cust_region") == "ASIA")
    )
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(g1), F.col("s_nationkey") == F.col("g1_key"))
        .join(F.broadcast(g2), F.col("c_nationkey") == F.col("g2_key"))
        .filter(pair)
        .groupBy(
            "supp_region",
            "cust_region",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(F.sum(_rev_e4()).alias("revenue_e4"))
        .orderBy("supp_region", "cust_region", "l_year")
    )


@query(
    "tpch_q9_product_profit",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           CAST(sum({_REV}) AS BIGINT) AS profit_e4
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY 1, 2
    ORDER BY nation, o_year DESC
    """,
    tags=("analytics", "tpch", "join"),
)
def tpch_q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit): profit per supplier nation
    per year for a product family selected by a LIKE on p_name. Adapted:
    the fixtures carry no ps_supplycost, so profit is the discounted
    revenue (the join/aggregation topology — the point of Q9 — is
    unchanged; only the measure's cost term is dropped).

    Plan: part is pre-filtered by the LIKE then broadcast (it shrinks to
    the family), supplier/nation broadcast, orders shuffles on orderkey
    with lineitem. Group space = 25 nations × ~7 years."""
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%widget%")
    )
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(F.sum(_rev_e4()).alias("profit_e4"))
        .orderBy("nation", F.col("o_year").desc())
    )


@query(
    "tpch_q11_important_stock",
    oracle=f"""
    WITH {_SQL_PS},
    natps AS (
        SELECT ps.ps_partkey,
               CAST(ps.ps_cost_e4 * ps.ps_qty AS BIGINT) AS value_e4
        FROM ps
        JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
        JOIN nation n ON n.n_nationkey = s.s_nationkey
        WHERE n.n_nationkey < 13
    ),
    pv AS (
        SELECT ps_partkey, CAST(sum(value_e4) AS BIGINT) AS part_value_e4
        FROM natps GROUP BY ps_partkey
    ),
    thresh AS (
        SELECT 2.0 * CAST(sum(part_value_e4) AS DOUBLE) / count(*) AS t
        FROM pv
    )
    SELECT ps_partkey, part_value_e4
    FROM pv CROSS JOIN thresh
    WHERE part_value_e4 > thresh.t
    ORDER BY part_value_e4 DESC, ps_partkey
    """,
    tags=("analytics", "tpch", "subquery", "having"),
)
def tpch_q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock): per-part inventory value held
    by one geography's suppliers (nationkey < 13 — a nation-range slice
    rather than the spec's single nation, which can be empty in the
    10-supplier sf0.001 sample), keeping parts above a GLOBAL-scalar
    threshold — the HAVING-against-a-scalar-subquery pattern. The
    threshold is 2× the mean part value (the spec's FRACTION·total
    scales as 1/SF precisely because a fixed fraction degenerates as
    the part count grows; the mean-relative form is the
    size-independent equivalent). Value = derived-ps cost × shipped
    quantity (module header).

    Plan: the scalar total is a broadcast 1-row aggregate crossJoined in
    (never a driver-side collect); the per-part aggregate and the total
    read the SAME natps frame. Threshold comparison is
    integer·double — one multiplication, identical in both engines."""
    ps = _derived_ps(spark, sf_dir)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(
        F.col("n_nationkey") < 13
    )
    natps = (
        ps.join(F.broadcast(s), ps.ps_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select(
            "ps_partkey",
            (F.col("ps_cost_e4") * F.col("ps_qty")).cast("long").alias("value_e4"),
        )
    )
    pv = natps.groupBy("ps_partkey").agg(
        F.sum("value_e4").cast("long").alias("part_value_e4")
    )
    thresh = pv.agg(
        (
            2.0 * F.sum("part_value_e4").cast("double") / F.count(F.lit(1))
        ).alias("t")
    )
    return (
        pv.crossJoin(F.broadcast(thresh))
        .filter(F.col("part_value_e4") > F.col("t"))
        .select("ps_partkey", "part_value_e4")
        .orderBy(F.col("part_value_e4").desc(), "ps_partkey")
    )


@query(
    "tpch_q12_late_lines_priority",
    oracle="""
    SELECT l.l_returnflag AS line_class,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY 1
    ORDER BY line_class
    """,
    tags=("analytics", "tpch", "case-agg"),
)
def tpch_q12_late_lines_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping modes / order priority): for LATE lines
    in one year, how many belong to high- vs low-priority orders, split
    by a line-level dimension — the conditional-aggregation (CASE-sum)
    pattern. Adapted: lateness is l_shipdate > o_orderdate + 60 days (no
    commit/receipt dates in the fixtures) and l_returnflag stands in for
    l_shipmode.

    Plan: the year predicate pushes to the lineitem scan; the join
    shuffles on orderkey; the lateness residual is a post-probe codegen
    filter; both CASE-sums fold into ONE aggregate pass over 3 groups."""
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy(F.col("l_returnflag").alias("line_class"))
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(hi, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
        .orderBy("line_class")
    )


@query(
    "tpch_q14_promo_revenue",
    oracle=f"""
    SELECT round(100.0 * CAST(sum(CASE WHEN p.p_type = 'PROMO'
                                       THEN {_REV} ELSE 0 END) AS DOUBLE)
                 / CAST(sum({_REV}) AS DOUBLE), 9) AS promo_share_pct,
           CAST(sum({_REV}) AS BIGINT) AS total_rev_e4
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
      AND l.l_shipdate < TIMESTAMP '1997-10-01'
    """,
    tags=("analytics", "tpch", "ratio"),
)
def tpch_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion effect): the share of one month's
    revenue from PROMO-type parts — the conditional-sum-over-sum ratio
    pattern. Both sums are exact e4 integers; the percentage is one
    double division rounded to a shared 9-digit grid, so the single
    output row is bit-identical cross-engine.

    Plan: the month predicate prunes the fact scan; part broadcasts;
    one aggregate, no group keys — a pure map-side-partial collapse."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part")
    promo = F.when(F.col("p_type") == "PROMO", _rev_e4()).otherwise(F.lit(0))
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0 * F.sum(promo).cast("double") / F.sum(_rev_e4()).cast("double"),
                9,
            ).alias("promo_share_pct"),
            F.sum(_rev_e4()).cast("long").alias("total_rev_e4"),
        )
    )


@query(
    "tpch_q15_top_supplier",
    oracle=f"""
    WITH rev AS (
        SELECT l_suppkey AS supplier_no,
               CAST(sum({_REV}) AS BIGINT) AS total_rev_e4
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY 1
    ),
    mx AS (SELECT max(total_rev_e4) AS m FROM rev)
    SELECT s.s_suppkey, s.s_name, r.total_rev_e4
    FROM rev r
    JOIN mx ON r.total_rev_e4 = mx.m
    JOIN supplier s ON s.s_suppkey = r.supplier_no
    ORDER BY s.s_suppkey
    """,
    tags=("analytics", "tpch", "subquery", "view"),
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): the supplier(s) with maximum
    quarterly revenue — the view + scalar-MAX-subquery pattern (ties all
    surface, exactly as the spec's equality against max requires).

    Plan: the quarter predicate prunes the fact scan; revenue is one
    key-only aggregate (100 suppliers); the max is a broadcast 1-row
    aggregate crossJoined as an equality filter; supplier broadcasts.
    Exact e4 integers make the max and the tie-equality deterministic."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev_e4()).alias("total_rev_e4")
    )
    mx = rev.agg(F.max("total_rev_e4").alias("m"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev_e4") == F.col("m"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_rev_e4")
        .orderBy("s_suppkey")
    )


@query(
    "tpch_q16_parts_supplier_cnt",
    oracle=f"""
    WITH {_SQL_PS}
    SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
           CAST(count(DISTINCT ps.ps_suppkey) AS BIGINT) AS supplier_cnt
    FROM ps
    JOIN part p ON p.p_partkey = ps.ps_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 14, 19, 24, 29, 49)
      AND ps.ps_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p_size
    LIMIT 20
    """,
    tags=("analytics", "tpch", "anti", "distinct"),
)
def tpch_q16_parts_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): distinct supplier
    count per (brand, type, size) bucket, excluding a brand/type slice
    and a NOT-IN supplier denylist. Adapted: partsupp is the derived
    pair table; the complaints comment scan becomes s_acctbal < 0.

    Plan: part pre-filters then broadcasts; the denylist is a tiny
    broadcast ANTI join (NOT IN with non-nullable keys ⇒ null-safety
    degenerates to anti-join semantics); the distinct-count shuffles
    once on the 3-key group space."""
    ps = _derived_ps(spark, sf_dir)
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 9, 14, 19, 24, 29, 49))
    )
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select(F.col("s_suppkey").alias("bad_key"))
    return (
        ps.join(F.broadcast(p), ps.ps_partkey == p.p_partkey)
        .join(F.broadcast(bad), ps.ps_suppkey == F.col("bad_key"), "left_anti")
        .groupBy("p_brand", "p_type", F.col("p_size").cast("long").alias("p_size"))
        .agg(F.countDistinct("ps_suppkey").cast("long").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
        .limit(20)
    )


@query(
    "tpch_q19_disjunctive_rev",
    oracle=f"""
    SELECT CAST(sum({_REV}) AS BIGINT) AS revenue_e4,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#11' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity >= 1 AND l.l_quantity <= 11)
       OR (p.p_brand = 'Brand#22' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity >= 10 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 20 AND l.l_quantity <= 30)
    """,
    tags=("analytics", "tpch", "disjunction"),
)
def tpch_q19_disjunctive_rev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue, disjunctive predicates): one
    revenue total over an OR of three brand/size/quantity conjunctions —
    the pattern that stresses OR-of-AND predicate handling across a
    join. Adapted: p_brand/p_size/l_quantity carry the three disjuncts
    (no p_container/l_shipmode in the fixtures).

    Plan: Catalyst extracts the common part-side constraint (the brand
    IN-set and max size range) BELOW the join as a pre-filter, keeps the
    mixed residual above it, and broadcasts the filtered part — check
    .explain: the scan shows PushedFilters on p_brand/p_size."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    d1 = (
        (F.col("p_brand") == "Brand#11")
        & F.col("p_size").between(1, 5)
        & F.col("l_quantity").between(1, 11)
    )
    d2 = (
        (F.col("p_brand") == "Brand#22")
        & F.col("p_size").between(1, 10)
        & F.col("l_quantity").between(10, 20)
    )
    d3 = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(20, 30)
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(d1 | d2 | d3)
        .agg(
            F.sum(_rev_e4()).cast("long").alias("revenue_e4"),
            F.count(F.lit(1)).cast("long").alias("n_lines"),
        )
    )


@query(
    "tpch_q20_excess_suppliers",
    oracle=f"""
    WITH bolts AS (
        SELECT p_partkey FROM part WHERE p_name LIKE '%bolt%'
    ),
    supply96 AS (
        SELECT l_suppkey, l_partkey,
               CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_partkey IN (SELECT p_partkey FROM bolts)
        GROUP BY 1, 2
    )
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_nationkey < 13
      AND s.s_suppkey IN (
          SELECT l_suppkey FROM supply96 WHERE qty > 30)
    ORDER BY s.s_name
    """,
    tags=("analytics", "tpch", "semi", "nested"),
)
def tpch_q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): suppliers from one
    geography (nationkey < 13 — a range slice; a single nation can be
    empty in the 10-supplier sf0.001 sample) who moved excess volume of
    a name-matched part family in one year — the nested-semi-join chain
    (part-family IN → per-pair aggregate with threshold → supplier IN).
    Adapted: 'excess' is shipped qty > 30 against the derived supply
    aggregate (no ps_availqty in the fixtures).

    Plan: the part family broadcasts into a semi join that prunes the
    fact scan BEFORE the (suppkey, partkey) aggregate; the surviving
    supplier keys broadcast into the final semi join. Supplier/nation
    never shuffle."""
    bolts = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%bolt%")
    ).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    supply = (
        li.join(F.broadcast(bolts), li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.round(F.col("l_quantity")).cast("long")).cast("long").alias("qty"))
        .filter(F.col("qty") > 30)
        .select("l_suppkey")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_nationkey") < 13)
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey, "left_semi")
        .join(F.broadcast(supply), s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


@query(
    "tpch_q21_waiting_suppliers",
    oracle="""
    WITH late AS (
        SELECT l.l_orderkey, l.l_suppkey
        FROM lineitem l
        JOIN orders o ON o.o_orderkey = l.l_orderkey
        WHERE o.o_orderstatus = 'F'
          AND l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
        GROUP BY 1, 2
    ),
    multi AS (
        SELECT l1.l_orderkey, l1.l_suppkey
        FROM late l1
        WHERE EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM late l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey)
    )
    SELECT s.s_name, CAST(count(*) AS BIGINT) AS numwait
    FROM multi m
    JOIN supplier s ON s.s_suppkey = m.l_suppkey
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
    tags=("analytics", "tpch", "semi", "anti"),
)
def tpch_q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): suppliers
    who were the SOLE late supplier on a finalized multi-supplier order
    — the EXISTS + NOT-EXISTS double-correlation, the hardest join
    pattern in the suite. Adapted: late is l_shipdate > o_orderdate +
    90 days; one (orderkey, suppkey) counts once (the distinct late-pair
    grain) so multiplicities don't depend on line counts.

    Plan: the late-pair build joins orders once on orderkey; the EXISTS
    is a left-semi self-join on orderkey with the supplier-inequality
    residual; the NOT EXISTS an anti join on the same key — all three
    exchanges share the orderkey partitioning, so AQE reuses one
    shuffle layout. The final count groups 100 supplier names."""
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    l2 = li.select(
        F.col("l_orderkey").alias("x_okey"), F.col("l_suppkey").alias("x_skey")
    )
    l3 = late.select(
        F.col("l_orderkey").alias("y_okey"), F.col("l_suppkey").alias("y_skey")
    )
    multi = (
        late.join(
            l2,
            (F.col("l_orderkey") == F.col("x_okey"))
            & (F.col("l_suppkey") != F.col("x_skey")),
            "left_semi",
        ).join(
            l3,
            (F.col("l_orderkey") == F.col("y_okey"))
            & (F.col("l_suppkey") != F.col("y_skey")),
            "left_anti",
        )
    )
    s = load_table(spark, sf_dir, "supplier")
    return (
        multi.join(F.broadcast(s), multi.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("long").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )
