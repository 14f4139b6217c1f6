"""Locks for the round-7 profiling rework (promised by
operators/quality.py's table_profile_columns_approx docstring):

1. semantics lock — the HLL (rsd=0.01) approx NDVs must agree with the
   exact twin's NDVs within an rsd-consistent tolerance per column, so
   the rows-only oracle exemption still has a cross-checked meaning;
2. plan lock — the approx profile must stay ONE scan + ONE 1-row
   sketch-merge exchange: no Expand (the DISTINCT rewrite the exact
   rework removed) and no per-(column,value) shuffle.
"""

from __future__ import annotations

import re

from ocs_duckdb_runner_spark.registry import get_query
from tests.conftest import SF_DIR
from tests.test_plans import plan_of


def test_profile_approx_ndv_within_rsd_of_exact(spark):
    exact = {
        r["column_name"]: r["n_distinct"]
        for r in get_query("table_profile_columns").fn(spark, SF_DIR).collect()
    }
    approx = {
        r["column_name"]: r["n_distinct_approx"]
        for r in get_query("table_profile_columns_approx")
        .fn(spark, SF_DIR)
        .collect()
    }
    assert set(approx) == set(exact)
    for col, est in approx.items():
        nd = exact[col]
        # HLL++ at rsd=0.01 is ~1% relative standard error; allow 6 sigma
        # plus a +/-2 absolute floor for tiny-NDV columns (status/priority)
        tol = max(2.0, 6 * 0.01 * nd)
        assert abs(est - nd) <= tol, (
            f"{col}: approx NDV {est} vs exact {nd} outside tolerance {tol}"
        )
    # null counts and min/max are exact registers in both variants
    ex_rows = {
        r["column_name"]: (r["n_nulls"], r["min_value"], r["max_value"])
        for r in get_query("table_profile_columns").fn(spark, SF_DIR).collect()
    }
    ap_rows = {
        r["column_name"]: (r["n_nulls"], r["min_value"], r["max_value"])
        for r in get_query("table_profile_columns_approx")
        .fn(spark, SF_DIR)
        .collect()
    }
    assert ex_rows == ap_rows


def test_profile_approx_plan_one_scan_no_expand_one_exchange(spark):
    plan = plan_of(spark, "table_profile_columns_approx")
    assert "Expand" not in plan
    assert plan.count("Scan parquet") == 2  # ONE scan (tree + detail line)
    # exactly one exchange: the single-partition HLL-sketch merge; a second
    # would mean the per-(col,value) shuffle the approx variant exists to avoid
    assert plan.count("Exchange") == 2  # tree line + detail header


def test_agg_approx_distinct_within_tolerance_of_exact(spark):
    """Semantics lock for the last rows-only query without one: the HLL
    NDV estimates must agree with the exact per-group count(DISTINCT)
    twin within the sketch's default rsd (~5%, 6-sigma band), and the
    approximate quantiles must land inside the group's exact value range
    with rank error <= the default 1/10000-accuracy bound (asserted
    loosely as p50 <= p95 plus containment in [min, max])."""
    from pyspark.sql import functions as F

    from ocs_duckdb_runner_spark.sources.connectors import load_table

    li = load_table(spark, SF_DIR, "lineitem")
    exact = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("orders"),
            F.countDistinct("l_partkey").alias("parts"),
            F.min("l_extendedprice").alias("lo"),
            F.max("l_extendedprice").alias("hi"),
            F.median("l_extendedprice").alias("med"),
        )
        .collect()
    }
    approx = get_query("agg_approx_distinct").fn(spark, SF_DIR).collect()
    assert {r["l_returnflag"] for r in approx} == set(exact)
    for r in approx:
        ex = exact[r["l_returnflag"]]
        for est_col, ex_col in (("approx_orders", "orders"), ("approx_parts", "parts")):
            est, nd = r[est_col], ex[ex_col]
            tol = max(2.0, 6 * 0.05 * nd)  # default HLL rsd is 0.05
            assert abs(est - nd) <= tol, (
                f"{r['l_returnflag']}.{est_col}: {est} vs exact {nd} (tol {tol})"
            )
        assert ex["lo"] <= r["approx_median_price"] <= ex["hi"]
        assert ex["lo"] <= r["approx_p95_price"] <= ex["hi"]
        assert r["approx_median_price"] <= r["approx_p95_price"]
        # percentile_approx at default accuracy has rank error ~1e-4;
        # against the exact median allow a generous 2% value band
        assert abs(r["approx_median_price"] - ex["med"]) <= 0.02 * ex["med"]
