"""Subquery surface: scalar, IN, and correlated EXISTS subqueries, plus
unpivot and ordered string aggregation.

Subqueries are where Catalyst's rewrite rules earn their keep
(SURVEY.md §4: RewriteCorrelatedScalarSubquery, decorrelation): every shape
below compiles to a join — scalar → broadcast of a 1-row aggregate,
IN → left-semi, correlated EXISTS → decorrelated semi-join on the
correlation key. Nothing executes per-row; the oracle runs the identical
SQL text in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocs_duckdb_runner_spark.registry import load_table, query


def _views(spark: SparkSession, sf_dir: str, *tables: str) -> None:
    for t in tables:
        load_table(spark, sf_dir, t).createOrReplaceTempView(f"sq_{t}")


@query(
    "subquery_scalar",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           o_totalprice - (SELECT avg(o_totalprice) FROM orders) AS dev_from_mean
    FROM orders
    WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders) * 1.5
    """,
    tags=("subquery",),
)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery used both in projection and predicate — compiled to
    one aggregate job whose single row is broadcast into the scan filter.
    avg is identical in both engines here because the deviation/threshold
    comparisons tolerate no drift only at the exact boundary; rows near
    the boundary are determined by the same double in both engines (the
    avg is computed over the identical full column)."""
    _views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice,
               o_totalprice - (SELECT avg(o_totalprice) FROM sq_orders)
                 AS dev_from_mean
        FROM sq_orders
        WHERE o_totalprice > (SELECT avg(o_totalprice) FROM sq_orders) * 1.5
        """
    )


@query(
    "subquery_in",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_nationkey IN (SELECT n_nationkey FROM nation
                          WHERE n_regionkey = 2)
    """,
    tags=("subquery",),
)
def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN subquery → left-semi join on the (broadcast) inner result."""
    _views(spark, sf_dir, "customer", "nation")
    return spark.sql(
        """
        SELECT c_custkey, c_name FROM sq_customer
        WHERE c_nationkey IN (SELECT n_nationkey FROM sq_nation
                              WHERE n_regionkey = 2)
        """
    )


@query(
    "subquery_correlated",
    oracle="""
    SELECT c.c_custkey, c.c_acctbal FROM customer c
    WHERE c.c_acctbal > (SELECT avg(c2.c_acctbal) FROM customer c2
                         WHERE c2.c_nationkey = c.c_nationkey)
    """,
    tags=("subquery", "correlated"),
)
def subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (above the per-nation average) —
    Catalyst decorrelates it into an aggregate-then-join on the
    correlation key; no per-row execution. The per-group avg is the same
    full-group double in both engines."""
    _views(spark, sf_dir, "customer")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_acctbal FROM sq_customer c
        WHERE c.c_acctbal > (SELECT avg(c2.c_acctbal) FROM sq_customer c2
                             WHERE c2.c_nationkey = c.c_nationkey)
        """
    )


@query(
    "unpivot_measures",
    oracle="""
    SELECT l_orderkey, l_linenumber, measure, val
    FROM (SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_tax
          FROM lineitem)
    UNPIVOT (val FOR measure IN (l_quantity, l_extendedprice, l_tax))
    """,
    tags=("unpivot",),
)
def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide→long): three measure columns melted to (measure, val)
    rows — a zero-shuffle Expand, the inverse of pivot."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_tax"],
        "measure",
        "val",
    )


@query(
    "agg_string_concat",
    oracle="""
    SELECT n_regionkey,
           string_agg(n_name, ',' ORDER BY n_name) AS nations,
           CAST(count(*) AS BIGINT) AS n
    FROM nation GROUP BY n_regionkey
    """,
    tags=("agg", "string"),
)
def agg_string_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation — collect_list is unordered in a
    distributed engine, so determinism comes from sorting the collected
    array before joining; the oracle's string_agg ... ORDER BY matches."""
    n = load_table(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations"),
        F.count(F.lit(1)).alias("n"),
    )
