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


# fixed-point scalar mean: identical integer sum -> identical double in
# both engines at ANY row count (a raw avg() drifts in the last ulps once
# the table is big enough for partial-aggregation order to differ — seen
# at 1.5M rows in the 10x scale probe)
_EXACT_AVG = (
    "(SELECT CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)"
    " / count(o_totalprice) / CAST(100 AS DOUBLE) FROM {tbl})"
)


@query(
    "subquery_scalar",
    oracle=f"""
    SELECT o_orderkey, o_totalprice,
           o_totalprice - {_EXACT_AVG.format(tbl='orders')} AS dev_from_mean
    FROM orders
    WHERE o_totalprice > {_EXACT_AVG.format(tbl='orders')} * CAST(1.5 AS DOUBLE)
    """,
    tags=("subquery",),
)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery used both in projection and predicate — compiled to
    one aggregate job whose single row is broadcast into the scan filter.
    The mean is computed in exact fixed point so the boundary rows and
    deviations are bit-identical to the oracle at any scale."""
    _views(spark, sf_dir, "orders")
    return spark.sql(
        f"""
        SELECT o_orderkey, o_totalprice,
               o_totalprice - {_EXACT_AVG.format(tbl='sq_orders')} AS dev_from_mean
        FROM sq_orders
        WHERE o_totalprice > {_EXACT_AVG.format(tbl='sq_orders')}
              * CAST(1.5 AS DOUBLE)
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
    WHERE c.c_acctbal >
          (SELECT CAST(sum(CAST(round(c2.c_acctbal * 100) AS BIGINT)) AS DOUBLE)
                  / count(c2.c_acctbal) / CAST(100 AS DOUBLE)
           FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
    """,
    tags=("subquery", "correlated"),
)
def subquery_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (above the per-nation average) —
    Catalyst decorrelates it into an aggregate-then-join on the
    correlation key; no per-row execution. The per-group mean is exact
    fixed point so boundary rows never drift at scale."""
    _views(spark, sf_dir, "customer")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_acctbal FROM sq_customer c
        WHERE c.c_acctbal >
              (SELECT CAST(sum(CAST(round(c2.c_acctbal * 100) AS BIGINT))
                           AS DOUBLE)
                      / count(c2.c_acctbal) / CAST(100 AS DOUBLE)
               FROM sq_customer c2 WHERE c2.c_nationkey = c.c_nationkey)
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


@query(
    "join_lateral",
    oracle="""
    SELECT c.c_custkey, c.c_name, t.max_price, t.n_orders
    FROM customer c,
    LATERAL (SELECT max(o.o_totalprice) AS max_price,
                    CAST(count(*) AS BIGINT) AS n_orders
             FROM orders o WHERE o.o_custkey = c.c_custkey) t
    """,
    tags=("join", "lateral", "subquery"),
)
def join_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL derived table — the 'for each row, run this
    subquery' surface. An aggregate lateral emits exactly one row per
    outer row (NULL max / zero count for customers with no orders), so
    it composes like a left join without writing one. Catalyst
    decorrelates it into the same aggregate+join plan the hand-written
    formulation would produce — the point is the surface, the plan cost
    is identical."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name, t.max_price, t.n_orders
        FROM customer c,
        LATERAL (SELECT max(o.o_totalprice) AS max_price,
                        count(*) AS n_orders
                 FROM orders o WHERE o.o_custkey = c.c_custkey) t
        """
    )


@query(
    "subquery_quantified",
    oracle="""
    WITH march AS (
        SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS pc
        FROM orders
        WHERE date_trunc('month', o_orderdate) = TIMESTAMP '1998-03-01')
    SELECT o_orderkey,
           CAST(round(o_totalprice * 100) AS BIGINT) AS price_c,
           CAST(round(o_totalprice * 100) AS BIGINT)
               > ALL (SELECT pc FROM march) AS above_all_march,
           CAST(round(o_totalprice * 100) AS BIGINT)
               > ANY (SELECT pc FROM march) AS above_any_march
    FROM orders
    WHERE o_orderkey % 100 = 0
    ORDER BY o_orderkey
    """,
    tags=("subquery", "quantified"),
)
def subquery_quantified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantified subquery comparisons (> ALL / > ANY) — the SQL surface
    Spark lacks as syntax, expressed by its algebraic reduction:
    x > ALL(S) ⟺ x > max(S), x > ANY(S) ⟺ x > min(S) (for non-empty S
    — the fixture guarantees March orders exist; the empty-set
    vacuous-truth case is a documented semantic difference a production
    rewrite guards with a count). The oracle runs DuckDB's NATIVE
    quantified forms, so the reduction itself is what is verified.

    Plan: the subquery collapses to a broadcast 1-row (min, max) frame
    crossJoined into a map-side projection — the reduction turns a
    quantified comparison into O(1) state, which is also why it is the
    right plan at 100 TB."""
    o = load_table(spark, sf_dir, "orders")
    pc = F.round(F.col("o_totalprice") * 100).cast("long")
    march = o.filter(
        F.date_trunc("month", F.col("o_orderdate"))
        == F.lit("1998-03-01").cast("timestamp")
    ).agg(F.max(pc).alias("mx"), F.min(pc).alias("mn"))
    return (
        o.filter(F.col("o_orderkey") % 100 == 0)
        .crossJoin(F.broadcast(march))
        .select(
            "o_orderkey",
            pc.alias("price_c"),
            (pc > F.col("mx")).alias("above_all_march"),
            (pc > F.col("mn")).alias("above_any_march"),
        )
        .orderBy("o_orderkey")
    )
