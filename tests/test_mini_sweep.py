"""Un-gated mini oracle sweep at sf0.01 (r7 verdict Next #7): a fixed
marker set spanning every module family, value-compared against DuckDB at
10× the default test fixture on every plain `pytest tests/` run. The
sf0.001 suite catches scale-independent breaks (binder errors, schema
drift); a VALUE-level regression can alias at 6k rows — this net runs the
same driver-style comparison where aggregates have enough mass to drift.
Costs ~30 s; the full sweep stays behind --run-sweep.

Validated by mutation: injecting a rank off-by-one-bucket into
agg_weighted_median's drill-down (min_by(cw - bw) → min_by(cw)) fails
test_mini_sweep_sf001x10[agg_weighted_median] on plain pytest. (Mutations
that are semantically invisible on the data — e.g. ≥ vs > on a 2·cw = tw
boundary no integer-weight group hits, or round vs floor on integral
l_quantity — change no output and are untestable by construction.)
"""

from __future__ import annotations

import json
import os
import time

import duckdb
import pytest

from ocs_duckdb_runner_spark.registry import TABLES
from tests.conftest import assert_matches_oracle

MINI_SF_DIR = os.environ.get("SPARK_GRAFT_MINI_SF_DIR", "/root/testdata/sf0.01")

# one representative oracle-bearing query per module family
MINI_SET = [
    "agg_weighted_median",        # operators/grouping: exact order stats
    "tpch_q15_top_supplier",      # operators/tpch_suite: view + window max
    "window_frame_agg",           # operators/windows
    "join_theta_range",           # operators/joins: non-equi
    "graph_pagerank",             # operators/graph: iterative integer PR
    "table_profile_columns",      # operators/quality: profiling
    "agg_corr_matrix",            # operators/analytics: stats layer
    "event_sessionize",           # events: gap sessionization
    "dedup_ngram_jaccard_unique", # llm/dedup: df-capped inverted index
    "sim_ann_lsh_topk",           # llm/similarity: SRP-LSH ANN
    "text_tfidf",                 # llm/text
    "mm_image_resize",            # llm/multimodal codec
    "corpus_token_budget",        # llm/curation
    "catalog_describe",           # sources/connectors: catalog/sink leg
    "stream_tumbling_wm",         # streaming: drained-stream oracle
    "src_python_datasource",      # sources/python_datasource: custom source
]


@pytest.fixture(scope="module")
def duck_mini():
    con = duckdb.connect()
    for t in TABLES:
        path = f"{MINI_SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    yield con
    con.close()


_WALL: dict[str, float] = {}


@pytest.mark.parametrize("name", MINI_SET)
def test_mini_sweep_sf001x10(spark, duck_mini, name):
    if not os.path.isdir(MINI_SF_DIR):
        pytest.skip(f"{MINI_SF_DIR} not present")
    t0 = time.monotonic()
    assert_matches_oracle(spark, duck_mini, name, MINI_SF_DIR)
    _WALL[name] = time.monotonic() - t0


def test_zz_mini_sweep_wall_vs_committed_band():
    """Surface gross ambient-host drift on every plain pytest run (r9
    verdict Next #7): print this run's mini-sweep wall next to the
    committed reference so a 1.4x band day is visible at test time, not
    discovered at bench time. Report-only — the wall measures the HOST,
    not the code, so drift never fails the suite; correctness has its
    own assertions above."""
    if len(_WALL) < len(MINI_SET):
        pytest.skip("mini sweep did not run in full (filtered/skipped)")
    wall = sum(_WALL.values())
    ref_path = os.path.join(os.path.dirname(__file__), "MINI_SWEEP_WALL.json")
    try:
        with open(ref_path) as fh:
            ref = json.load(fh)["wall_sec"]
    except (OSError, ValueError, KeyError):
        print(f"\nmini-sweep wall {wall:.1f}s (no committed reference)")
        return
    print(
        f"\nmini-sweep wall {wall:.1f}s vs committed {ref:.1f}s "
        f"(band factor {wall / ref:.2f}x — ambient host load, not code)"
    )
