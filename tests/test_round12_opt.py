"""Locks for the round-12 optimization pass (OPTIMIZATION_r12.md).

1. text_char_ngram_entropy moved its per-count ln() micro-nat grid from
   a Spark expression (F.round(F.log(c)*1e6)) into the mapInArrow batch
   function (math.log + floor(x+0.5)). The move is only sound if both
   produce the SAME integer for every count value a document can
   exhibit — lock the two grids against each other over a range far
   beyond any realistic per-doc trigram count.
2. The mapInArrow rewrite must keep the shuffle-free shape: no
   corpus-sized exchange in the plan (the only exchange is the spread()
   round-robin of the narrow (doc_id, text) projection).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from tests.test_plans import plan_of


def test_entropy_log_grid_parity(spark):
    # 2M: the verified envelope stated as a contract in
    # text_char_ngram_entropy's docstring — a count above it means ONE
    # document repeating a single trigram >2M times (a 6 MB+ degenerate
    # doc). Keep this constant and the docstring's bound in sync.
    n = 2_000_000
    pdf = (
        spark.range(1, n + 1)
        .select(
            F.col("id"),
            F.round(F.log(F.col("id").cast("double")) * 1000000)
            .cast("long")
            .alias("fx"),
        )
        .toPandas()
    )
    ids = pdf["id"].to_numpy()
    fx = pdf["fx"].to_numpy()
    # the UDF's grid is Python math.log (libm), NOT numpy's SIMD log —
    # the comparison must go through the same call the UDF makes
    for i in range(len(ids)):
        want = math.floor(math.log(int(ids[i])) * 1e6 + 0.5)
        assert fx[i] == want, (ids[i], fx[i], want)


def test_entropy_plan_is_shuffle_free_arrow_map(spark):
    plan = plan_of(spark, "text_char_ngram_entropy")
    assert "MapInArrow" in plan or "ArrowEvalPython" in plan or "PythonMapInArrow" in plan
    # only the spread() round-robin exchange of the narrow projection —
    # no hash-partitioned (gram-keyed) exchange survives
    assert "hashpartitioning" not in plan
