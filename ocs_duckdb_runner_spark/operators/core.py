"""Core reference surface: scan, projection, filter, aggregate, sort.

This module covers R1-R6 of the reference inventory (SURVEY.md §2a) — the
entire query shape the reference actually executes
(/root/reference/runner.cc:174-182):

    SELECT min(vertex_id) AS VID, min(x) AS X, min(y) AS Y, min(z) AS Z,
           avg(e) AS E
    FROM '<s3 parquet object>'
    WHERE x > 1.5 AND x < 1.6 AND y > 1.5 AND y < 1.6 AND z > 1.5 AND z < 1.6
    GROUP BY vertex_id ORDER BY E

re-expressed on the ``lineitem`` fixture with the same types (int key,
double measures). All plans are declarative DataFrame ops: Catalyst pushes
the conjunctive range predicate into the parquet scan (row-group stat
pruning — the same effect the reference gets from DuckDB's zone maps),
prunes columns to the referenced set, and runs partial+final hash
aggregation (map-side combine before the single shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocs_duckdb_runner_spark.exactness import fx_avg, fx_sum, sql_fx_avg, sql_fx_sum
from ocs_duckdb_runner_spark.registry import load_table, query

# The 3-D box predicate analog (/root/reference/runner.cc:178-179) on
# lineitem's double measure columns; selectivity ~3.5% like the reference's.
BOX = (
    "l_quantity > 10 AND l_quantity < 20 "
    "AND l_extendedprice > 20000 AND l_extendedprice < 60000 "
    "AND l_discount > 0.02 AND l_discount < 0.08"
)


def _box_filter(df: DataFrame) -> DataFrame:
    return df.filter(
        (F.col("l_quantity") > 10)
        & (F.col("l_quantity") < 20)
        & (F.col("l_extendedprice") > 20000)
        & (F.col("l_extendedprice") < 60000)
        & (F.col("l_discount") > 0.02)
        & (F.col("l_discount") < 0.08)
    )


@query(
    "flagship",
    oracle=f"""
    SELECT l_orderkey AS VID,
           min(l_quantity) AS X,
           min(l_extendedprice) AS Y,
           min(l_discount) AS Z,
           {sql_fx_avg('l_tax', 4)} AS E
    FROM lineitem
    WHERE {BOX}
    GROUP BY l_orderkey
    ORDER BY E, VID
    """,
    tags=("reference", "R1", "R2", "R3", "R4", "R5"),
)
def flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's fixed query shape (runner.cc:174-182): box filter →
    grouped min×4 + avg → sort by the average. avg is computed
    order-independently (fixed-point) so the result is bit-stable from
    local[1] to a 1000-executor cluster."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        _box_filter(li)
        .groupBy(F.col("l_orderkey").alias("VID"))
        .agg(
            F.min("l_quantity").alias("X"),
            F.min("l_extendedprice").alias("Y"),
            F.min("l_discount").alias("Z"),
            fx_avg("l_tax", 4).alias("E"),
        )
        .orderBy("E", "VID")
    )


@query(
    "scan_parquet",
    oracle="SELECT count(*) AS n_rows FROM lineitem",
    tags=("reference", "R1"),
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full parquet scan + row count (the reference's 'hits' accounting,
    runner.cc:220-227). count(*) over parquet is metadata-only in Spark —
    no row materialization."""
    return load_table(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("n_rows"))


@query(
    "scan_projection",
    oracle="""
    SELECT l_orderkey AS okey, l_linenumber AS line,
           l_extendedprice AS price, l_returnflag AS flag
    FROM lineitem
    """,
    tags=("reference", "R4"),
)
def scan_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-pruned projection with aliases (runner.cc:177-178 AS VID..E).
    Catalyst's ColumnPruning means the parquet reader materializes only
    these 4 of 11 columns (check ReadSchema in .explain)."""
    return load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("okey"),
        F.col("l_linenumber").alias("line"),
        F.col("l_extendedprice").alias("price"),
        F.col("l_returnflag").alias("flag"),
    )


@query(
    "filter_box",
    oracle=f"""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
    FROM lineitem WHERE {BOX}
    """,
    tags=("reference", "R2"),
)
def filter_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 3-D conjunctive range filter alone (runner.cc:178-179). The
    predicate is pushed to the parquet scan (PushedFilters: GreaterThan/
    LessThan on all three columns) so row groups outside the box are
    skipped via footer statistics — the scale-out analog of DuckDB's
    zone-map pruning that made the reference read 46 MB instead of the
    whole object."""
    return _box_filter(load_table(spark, sf_dir, "lineitem")).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount"
    )


@query(
    "filter_in_null",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_orderpriority, o_totalprice
    FROM orders
    WHERE o_orderstatus IN ('O', 'F')
      AND o_orderpriority IS NOT NULL
      AND o_totalprice BETWEEN 50000 AND 200000
      AND NOT (o_custkey IS NULL)
    """,
    tags=("filter",),
)
def filter_in_null(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-list, NULL tests, BETWEEN, NOT — the predicate surface beyond
    the reference's pure range conjunction."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderstatus").isin("O", "F")
        & F.col("o_orderpriority").isNotNull()
        & F.col("o_totalprice").between(50000, 200000)
        & ~F.col("o_custkey").isNull()
    ).select("o_orderkey", "o_orderstatus", "o_orderpriority", "o_totalprice")


@query(
    "agg_basic",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           count(*) AS n_rows,
           count(l_quantity) AS n_qty,
           sum(l_quantity) AS sum_qty,
           {sql_fx_sum('l_extendedprice')} AS sum_price_c,
           min(l_extendedprice) AS min_price,
           max(l_extendedprice) AS max_price,
           {sql_fx_avg('l_discount')} AS avg_disc
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "R3"),
)
def agg_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped count/sum/min/max/avg (reference exercises min+avg,
    runner.cc:177). sum(l_quantity) is exact (integral doubles); money
    sums/avgs use the fixed-point helpers for order independence. The
    physical plan is partial HashAggregate → single shuffle on the group
    keys → final HashAggregate; low-cardinality keys make the map-side
    combine absorb nearly all rows before the exchange."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("l_quantity").alias("n_qty"),
        F.sum("l_quantity").alias("sum_qty"),
        fx_sum("l_extendedprice").alias("sum_price_c"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        fx_avg("l_discount").alias("avg_disc"),
    )


@query(
    "agg_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity) AS sum_qty,
           {sql_fx_sum('l_extendedprice')} AS sum_base_price_c,
           {sql_fx_sum('l_extendedprice * (1 - l_discount)', 4)} AS sum_disc_price_e4,
           {sql_fx_sum('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 6)}
             AS sum_charge_e6,
           {sql_fx_avg('l_quantity', 0)} AS avg_qty,
           {sql_fx_avg('l_extendedprice')} AS avg_price,
           {sql_fx_avg('l_discount')} AS avg_disc,
           CAST(count(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2024-11-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    tags=("agg", "tpch"),
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TPC-H Q1 pricing-summary shape — the canonical OLAP scan+agg:
    date filter, 8 aggregates incl. compound expressions
    (price·(1−disc)·(1+tax)), two group keys, ordered output. All money
    aggregates in exact fixed point (per-row IEEE products are identical
    across engines; integer sums are order-free), so the result is
    bit-stable at any parallelism."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2024-11-01 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            fx_sum("l_extendedprice").alias("sum_base_price_c"),
            fx_sum(disc_price, 4).alias("sum_disc_price_e4"),
            fx_sum(charge, 6).alias("sum_charge_e6"),
            fx_avg("l_quantity", 0).alias("avg_qty"),
            fx_avg("l_extendedprice").alias("avg_price"),
            fx_avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "sort_multi",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    ORDER BY o_orderstatus ASC, o_totalprice DESC NULLS LAST, o_orderkey ASC
    """,
    tags=("sort", "R5"),
)
def sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key ASC/DESC global sort with explicit null placement
    (extends R5). Spark's SortExec range-partitions on a sampled key
    distribution, so the global sort scales out instead of funnelling
    through one node."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    ).orderBy(
        F.col("o_orderstatus").asc(),
        F.col("o_totalprice").desc_nulls_last(),
        F.col("o_orderkey").asc(),
    )


@query(
    "topk_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 25
    """,
    tags=("sort", "limit"),
)
def topk_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT top-k. Spark compiles this to
    TakeOrderedAndProject — a per-partition heap of k rows then a k-way
    driver merge, O(n log k) with no global sort shuffle; the tie-break on
    the unique o_orderkey makes the row SET deterministic."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(25)
    )


@query(
    "distinct_rows",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus, l_tax FROM lineitem",
    tags=("distinct",),
)
def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row deduplication — physically a hash aggregate on all columns, so
    map-side partial dedup shrinks the shuffle to (distinct values ×
    partitions) before the exchange."""
    return load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_tax"
    ).distinct()
