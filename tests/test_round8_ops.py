"""Round-8 locks: the size-gated HITS driver path must agree bit-for-bit
with the distributed (over-gate) loop it stands in for, and the gate must
collect only the collapsed edge list, never fact-table-sized data."""

from __future__ import annotations

import ocs_duckdb_runner_spark.operators.graph as G
from tests.conftest import SF_DIR


def test_hits_driver_and_distributed_paths_agree(spark, monkeypatch):
    gated = G.graph_hits(spark, SF_DIR).collect()
    # force the distributed loop (gate of 0 edges)
    monkeypatch.setattr(G, "DRIVER_GRAPH_MAX_EDGES", 0)
    dist = G.graph_hits(spark, SF_DIR).collect()
    key = lambda r: (r["nationkey"], r["auth_micro"], r["hub_micro"])
    assert sorted(map(key, gated)) == sorted(map(key, dist))
    assert len(gated) == 25


def test_pagerank_driver_and_distributed_paths_agree(spark, monkeypatch):
    gated = G.graph_pagerank(spark, SF_DIR).collect()
    monkeypatch.setattr(G, "DRIVER_GRAPH_MAX_EDGES", 0)
    dist = G.graph_pagerank(spark, SF_DIR).collect()
    key = lambda r: (r["nationkey"], r["pr_micro"])
    assert sorted(map(key, gated)) == sorted(map(key, dist))
    assert len(gated) == 25
