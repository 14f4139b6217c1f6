"""Round-12 semantic locks for the new queries.

The oracle sweep proves cross-engine equality; these lock what an oracle
can't: the arrow UDTF must actually take the Arrow eval path (a silent
pickle fallback would pass the oracle vacuously), content-defined
chunking must be offset-invariant (the property fixed-size chunking
lacks — equal outputs alone can't show WHY), the MaxSim scorer must stay
a single map-side stage (its 100 TB claim), and CUPED's theta must match
an independent numpy derivation.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tests.conftest import SF_DIR

pytestmark = pytest.mark.usefixtures("spark")


def test_udtf_arrow_surface_takes_arrow_eval_path():
    """@udtf(useArrow=True) must produce the ARROW table-UDF eval type;
    anything else means the vectorized transport silently fell back and
    the query is exercising the same path as udtf_surface."""
    from pyspark.sql.functions import udtf
    from pyspark.util import PythonEvalType

    @udtf(returnType="pos: bigint, gram: string", useArrow=True)
    class Probe:
        def eval(self, text: str):
            yield 1, text

    assert Probe.evalType == PythonEvalType.SQL_ARROW_TABLE_UDF


def test_cdc_chunks_are_offset_invariant(spark, tmp_path):
    """The content-defined property: the same passage embedded at
    DIFFERENT token offsets in two documents must produce identical
    interior chunks (boundaries come from token content, not position).
    The passage carries two boundary tokens ('delta', 'echo' — md5
    bucket ≡ 0 mod 8), so the chunk between them is fully interior and
    must dedup across both docs despite unequal prefixes."""
    from ocs_duckdb_runner_spark.llm.dedup import dedup_cdc_chunks

    passage = "delta kilo lima mike echo"  # boundary ... interior ... boundary
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": [
                "alpha bravo " + passage + " golf",
                "foxtrot hotel india charlie " + passage + " oscar papa",
            ],
            "lang": ["en", "en"],
            "source": ["t", "t"],
            "n_chars": [0, 0],
        }
    )
    docs.to_parquet(tmp_path / "documents.parquet")
    row = dedup_cdc_chunks(spark, str(tmp_path)).collect()[0]
    # the interior chunk ('kilo lima mike echo', cut-after semantics)
    # is shared; prefix/suffix chunks differ
    assert row["max_chunk_copies"] >= 2
    assert row["n_distinct"] < row["n_chunks"]
    assert row["dup_ppm"] > 0


def test_maxsim_plan_is_single_map_stage(spark):
    """sim_maxsim_colbert's scale claim: no hash-partitioned exchange
    anywhere — the query matrix broadcasts, scoring is map-side, and
    the only ordering operator is TakeOrderedAndProject's 10-row heap."""
    from ocs_duckdb_runner_spark.llm.similarity import sim_maxsim_colbert

    plan = sim_maxsim_colbert(spark, SF_DIR)._jdf.queryExecution().toString()
    assert "TakeOrderedAndProject" in plan
    assert "hashpartitioning" not in plan


def test_cuped_theta_matches_numpy(spark):
    """theta = cov(pre, post)/var(pre) recomputed independently with
    numpy from the same per-user split must match the query's 9-dp
    value (same inputs, fixed IEEE sequence)."""
    import duckdb

    from ocs_duckdb_runner_spark.operators.grouping import (
        agg_cuped_adjustment,
    )

    got = agg_cuped_adjustment(spark, SF_DIR).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'"
    )
    u = con.execute(
        """
        WITH b AS (
          SELECT (CAST(epoch_us(min(CAST(ts AS TIMESTAMP))) AS BIGINT)
                  + CAST(epoch_us(max(CAST(ts AS TIMESTAMP))) AS BIGINT))
                 // 2 AS mid FROM events)
        SELECT user_id,
               CAST(COALESCE(sum(CASE WHEN CAST(epoch_us(CAST(ts AS
                 TIMESTAMP)) AS BIGINT) < b.mid THEN CAST(round(value *
                 100) AS BIGINT) END), 0) AS BIGINT) AS pre_c,
               CAST(COALESCE(sum(CASE WHEN CAST(epoch_us(CAST(ts AS
                 TIMESTAMP)) AS BIGINT) >= b.mid THEN CAST(round(value *
                 100) AS BIGINT) END), 0) AS BIGINT) AS post_c
        FROM events CROSS JOIN b GROUP BY user_id
        """
    ).df()
    pre = u["pre_c"].to_numpy(dtype=np.float64)
    post = u["post_c"].to_numpy(dtype=np.float64)
    n = len(u)
    theta_np = ((pre * post).sum() - pre.sum() / n * post.sum()) / (
        (pre * pre).sum() - pre.sum() / n * pre.sum()
    )
    for t in got["theta"]:
        assert abs(t - theta_np) < 1e-6


def test_dsir_rle_pairs_equal_naive_token_counts(spark):
    """The round-12 DSIR rewrite emits (bucket, count) pairs via sorted
    run-length encoding instead of a row per token; the per-bucket
    corpus totals must equal the naive per-token derivation exactly
    (this is the algebraic identity the unchanged oracle relies on)."""
    import hashlib

    import duckdb

    from ocs_duckdb_runner_spark.llm.curation import _DSIR_DIM

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{SF_DIR}/documents.parquet'"
    )
    texts = con.execute("SELECT text FROM documents").df()["text"]
    naive: dict[int, int] = {}
    for t in texts:
        for w in t.split(" "):
            if not w:
                continue
            b = (
                int(hashlib.md5(w.encode()).hexdigest()[:8], 16)
                % _DSIR_DIM
            )
            naive[b] = naive.get(b, 0) + 1
    from ocs_duckdb_runner_spark.llm.curation import quality_dsir_weights

    got = quality_dsir_weights(spark, SF_DIR).toPandas()
    # total token mass through the RLE path == naive python count
    assert int(got["n_tokens"].sum()) == sum(naive.values())
