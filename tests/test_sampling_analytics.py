"""Unit + plan tests for the deterministic-sampling and TPC-H-shape
operators: sampling must be reproducible under repartitioning and hit its
target fraction; the analytic shapes must keep their scale-critical plan
properties (broadcast dims, pushed-down date predicates, heap-based top-k,
shuffle-free sampling)."""

from __future__ import annotations

import pytest

from ocs_duckdb_runner_spark.registry import get_query, load_table
from tests.conftest import SF_DIR
from tests.test_plans import plan_of


def test_bernoulli_sample_fraction_and_determinism(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    total = li.count()
    sampled = get_query("sample_hash_bernoulli").fn(spark, SF_DIR)
    n = sampled.count()
    frac = n / total
    # 0x1999/0x10000 ≈ 10.0%; binomial 3σ at n≈6000 is ~±1.2pp
    assert 0.07 < frac < 0.13, frac
    # membership is a pure function of the row key: identical under any
    # physical layout (the cluster-independence property)
    again = get_query("sample_hash_bernoulli").fn(spark, SF_DIR)
    a = {tuple(r) for r in sampled.collect()}
    b = {tuple(r) for r in again.repartition(13).collect()}
    assert a == b


def test_stratified_rates_ordered_by_threshold(spark):
    rows = {
        r["l_returnflag"]: r["n_sampled"]
        for r in get_query("sample_stratified").fn(spark, SF_DIR).collect()
    }
    li = load_table(spark, SF_DIR, "lineitem")
    totals = {
        r["l_returnflag"]: r["cnt"]
        for r in li.groupBy("l_returnflag").count().withColumnRenamed(
            "count", "cnt"
        ).collect()
    }
    # per-stratum realized rates must track the configured 50/25/5%
    assert 0.4 < rows["R"] / totals["R"] < 0.6
    assert 0.17 < rows["A"] / totals["A"] < 0.33
    assert rows["N"] / totals["N"] < 0.12


def test_uniform_k_returns_exactly_k_unique(spark):
    pdf = get_query("sample_uniform_k").fn(spark, SF_DIR).toPandas()
    assert len(pdf) == 100
    assert pdf["o_orderkey"].nunique() == 100


def test_sample_plan_is_shuffle_free(spark):
    # a 100 TB sample must reject rows at the scan, not move them
    plan = plan_of(spark, "sample_hash_bernoulli")
    assert "Exchange" not in plan, plan


def test_tpch_q3_broadcasts_dim_and_heaps_topk(spark):
    plan = plan_of(spark, "tpch_q3_toporders")
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    # order-date predicate reaches the orders scan
    assert "o_orderdate" in plan.split("PushedFilters")[1].splitlines()[0] or (
        "LessThan(o_orderdate" in plan
    )


def test_tpch_q4_plans_semi_join_not_aggregate_dedup(spark):
    plan = plan_of(spark, "tpch_q4_order_priority")
    assert "LeftSemi" in plan


def test_tpch_q5_broadcasts_all_three_dims(spark):
    plan = plan_of(spark, "tpch_q5_nation_revenue")
    assert plan.count("BroadcastHashJoin") >= 3
    assert "r_name" in plan  # region filter survived into the plan


@pytest.mark.parametrize("name", ["tpch_q10_returned"])
def test_tpch_q10_filter_pushdown(spark, name):
    plan = plan_of(spark, name)
    assert "EqualTo(l_returnflag,R)" in plan
    assert "TakeOrderedAndProject" in plan


def test_bloom_filter_no_false_negatives(spark):
    rows = {
        (r.actually_present, r.bloom_says): r.n
        for r in get_query("agg_bloom_filter").fn(spark, SF_DIR).collect()
    }
    # every present key must be found: the (True, False) cell cannot exist
    assert (True, False) not in rows
    present = sum(n for (a, _), n in rows.items() if a)
    absent_pass = rows.get((False, True), 0)
    absent = absent_pass + rows.get((False, False), 0)
    assert present > 0 and absent > 0
    # false-positive rate stays near the configured budget
    assert absent_pass / absent < 0.05


def test_hll_merged_partials_equal_direct_sketch(spark):
    """The mergeability contract: union of per-(lang,source) partial
    sketches must estimate exactly what the direct per-lang sketch does,
    and both must be within 5% of the exact distinct count."""
    rows = get_query("agg_hll_partitioned_merge").fn(spark, SF_DIR).collect()
    assert rows, "no output"
    for r in rows:
        assert r.est_direct == r.est_merged, r
        assert abs(r.est_direct - r.exact_n) <= 0.05 * r.exact_n, r
