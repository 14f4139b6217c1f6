"""ocs_duckdb_runner_spark — a PySpark-native analytics engine with the query
and data-processing capabilities of ``lanl-ocs/ocs-duckdb-runner``.

The reference (/root/reference/runner.cc) is a C++ harness that fans one fixed
analytical SQL query (3-D box filter + grouped min/avg + sort,
runner.cc:174-182) out over S3 parquet objects, one embedded single-threaded
DuckDB instance per object (runner.cc:197-201), with an I/O-monitoring
filesystem (runner.cc:56-172) and a wall-time/hits/bytes report
(runner.cc:334-359).

This package re-expresses that surface — plus the extended relational and
LLM-data-pipeline operator inventory declared in SURVEY.md §2c — Spark-first:
declarative DataFrame/SQL plans optimized by Catalyst, vectorized parquet
scans, broadcast/shuffle strategies chosen by AQE, Structured Streaming for
the streaming twin, and Arrow-batched pandas UDFs only where built-in
operators cannot express the semantics.
"""

from ocs_duckdb_runner_spark.registry import all_oracles, all_queries, get_query
from ocs_duckdb_runner_spark.session import build_spark

__all__ = ["all_oracles", "all_queries", "get_query", "build_spark"]
