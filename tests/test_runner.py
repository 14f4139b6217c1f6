"""Fan-out runner tests: report shape, determinism, per-task error
isolation (reference R9-R15 semantics)."""

from __future__ import annotations

from ocs_duckdb_runner_spark.runner import FanoutRunner, split_objects
from tests.conftest import SF_DIR


def _sources(spark):
    import os

    objdir = split_objects(spark, SF_DIR, 4)
    return sorted(
        f"{objdir}/{f}" for f in os.listdir(objdir) if f.endswith(".parquet")
    )


def test_fanout_report_and_determinism(spark):
    files = _sources(spark)
    r1 = FanoutRunner(spark, threads=4).run(files)
    r2 = FanoutRunner(spark, threads=2).run(files)
    assert r1["sources"] == len(files) == 4
    assert r1["failures"] == 0
    assert r1["hits"] > 0
    # hits are a property of the data, not of the pool size or schedule
    assert r1["hits"] == r2["hits"]
    assert r1["per_file_hits"] == r2["per_file_hits"]
    # the split preserves every lineitem row across objects
    total = sum(
        spark.read.parquet(f).count() for f in files
    )
    assert total == spark.read.parquet(f"{SF_DIR}/lineitem.parquet").count()


def test_fanout_isolates_bad_source(spark):
    files = [*_sources(spark), "/nonexistent/object.parquet"]
    rep = FanoutRunner(spark, threads=4).run(files)
    assert rep["failures"] == 1  # bad file logged, run completed (R14)
    assert rep["hits"] > 0
