"""Scale probe: synthesize a ~10x fact dataset (sf≈1: 6M lineitem / 150k
orders rows) in /tmp from the sf0.1 fixtures and re-verify + re-time the
engine there.

Fact tables (lineitem, orders) are unioned 10x with disjoint order-key
ranges (FK consistency preserved: both sides offset identically; customer/
part/supplier keys untouched so dim joins stay valid). Dim + LLM tables are
copied unchanged. The probe answers the round question "would this still
work at 10x?" with data, not argument — run driver_sim against the
generated dir for a full DuckDB-oracle pass at the larger scale:

    python scripts/scale_probe.py            # build (idempotent) + report
    python scripts/driver_sim.py /tmp/ocs_scaleprobe/sf1
"""

from __future__ import annotations

import os
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

from ocs_duckdb_runner_spark.registry import TABLES  # noqa: E402
from ocs_duckdb_runner_spark.session import build_spark  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = "/tmp/ocs_scaleprobe/sf1"
COPIES = 10
KEY_STRIDE = 100_000_000


def build() -> None:
    spark = build_spark(app_name="scale-probe-build")
    os.makedirs(OUT, exist_ok=True)
    # fact tables AND the LLM tables are struck 10x (disjoint key ranges);
    # documents keeps its text verbatim per copy so the dedup operators see
    # 10x the corpus with 10x the duplicate clusters — the honest scale-up
    # for near-dup work (every copy collides with its 9 twins).
    scaled = {
        "lineitem": "l_orderkey",
        "orders": "o_orderkey",
        "documents": "doc_id",
        "embeddings": "vec_id",
    }
    for t, key in scaled.items():
        dst = f"{OUT}/{t}.parquet"
        if os.path.exists(dst):
            continue
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        parts = [
            df.withColumn(key, F.col(key) + F.lit(i * KEY_STRIDE)) for i in range(COPIES)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionAll(p)
        # one directory-parquet per table, multiple files = multiple splits
        out.repartition(16).write.mode("overwrite").parquet(dst)
        print(f"built {t}: {spark.read.parquet(dst).count():,} rows")
    for t in TABLES:
        if t in scaled:
            continue
        dst = f"{OUT}/{t}.parquet"
        if not os.path.exists(dst):
            shutil.copyfile(f"{SRC}/{t}.parquet", dst)
    spark.stop()


def probe() -> None:
    """Time the fact-heavy headline queries at the scaled size."""
    from ocs_duckdb_runner_spark.registry import all_queries

    spark = build_spark(app_name="scale-probe-run")
    qs = all_queries()
    names = [
        "flagship",
        "tpch_q3_toporders",
        "tpch_q4_order_priority",
        "tpch_q5_nation_revenue",
        "tpch_q10_returned",
        "sample_hash_bernoulli",
        "agg_pricing_summary",
        "agg_basic",
        "agg_distinct",
        "join_inner",
        "join_multiway",
        "join_part_promo",
        "join_skew_salted",
        "window_rank",
        "window_frame_agg",
        "sort_multi",
        "topk_limit",
        "dedup_fingerprint",
        "dedup_minhash",
        "dedup_ngram_jaccard",
        "text_tfidf",
        "sim_cosine_topk",
        "sim_ann_lsh_topk",
        "pipeline_dedup_end2end",
    ]
    spark.read.parquet(f"{OUT}/lineitem.parquet").count()  # warm
    for name in names:
        t0 = time.monotonic()
        qs[name](spark, OUT).write.format("noop").mode("overwrite").save()
        print(f"{name}: {time.monotonic() - t0:.2f}s", flush=True)


if __name__ == "__main__":
    build()
    probe()
