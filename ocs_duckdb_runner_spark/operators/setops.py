"""Set operators (SURVEY.md §2c EXT): UNION [ALL], INTERSECT [ALL],
EXCEPT [ALL].

Spark maps UNION ALL to a zero-shuffle concatenation of children;
the DISTINCT variants add one hash-aggregate exchange; INTERSECT/EXCEPT
compile to left-semi/left-anti joins over distinct inputs — all built-in,
no custom operators needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocs_duckdb_runner_spark.registry import load_table, query


def _sides(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Two overlapping projections of orders: big orders vs urgent orders."""
    o = load_table(spark, sf_dir, "orders")
    big = o.filter(F.col("o_totalprice") > 150000).select("o_orderkey", "o_orderstatus")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", "o_orderstatus"
    )
    return big, urgent


_BIG = "SELECT o_orderkey, o_orderstatus FROM orders WHERE o_totalprice > 150000"
_URGENT = (
    "SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderpriority = '1-URGENT'"
)


@query("setop_union_all", oracle=f"{_BIG} UNION ALL {_URGENT}", tags=("setop",))
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL — bag union, duplicates kept; physically just a Union node
    (partitions of both children concatenated, no shuffle)."""
    big, urgent = _sides(spark, sf_dir)
    return big.unionAll(urgent)


@query("setop_union", oracle=f"{_BIG} UNION {_URGENT}", tags=("setop",))
def setop_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) — bag union then hash-dedup (one exchange)."""
    big, urgent = _sides(spark, sf_dir)
    return big.union(urgent).distinct()


@query("setop_intersect", oracle=f"{_BIG} INTERSECT {_URGENT}", tags=("setop",))
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct) — compiles to distinct + left-semi hash join."""
    big, urgent = _sides(spark, sf_dir)
    return big.intersect(urgent)


@query("setop_except", oracle=f"{_BIG} EXCEPT {_URGENT}", tags=("setop",))
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct) — compiles to distinct + left-anti hash join."""
    big, urgent = _sides(spark, sf_dir)
    return big.subtract(urgent)


@query(
    "setop_intersect_all",
    oracle=f"{_BIG} INTERSECT ALL {_URGENT}",
    tags=("setop",),
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — multiplicity-preserving (min of the two bag counts)."""
    big, urgent = _sides(spark, sf_dir)
    return big.intersectAll(urgent)


@query("setop_except_all", oracle=f"{_BIG} EXCEPT ALL {_URGENT}", tags=("setop",))
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — multiplicity-preserving bag difference."""
    big, urgent = _sides(spark, sf_dir)
    return big.exceptAll(urgent)
