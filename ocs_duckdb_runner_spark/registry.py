"""Central query registry — the single source of truth for the driver
contract (__spark_entry__.py): every operator ships as a named query with a
(spark, sf_dir) -> DataFrame callable and, where SQL-expressible, an
equivalent DuckDB oracle SQL string.

Column-name discipline: the driver's compare sorts columns by name before
hashing values, so every computed column is aliased identically in the Spark
plan and the oracle SQL. Float discipline: cross-engine aggregation order
differs, so float aggregates are either made exact (fixed-point integer
sums) or rounded on both sides (see SURVEY.md §7 risks).
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable
from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # None => driver records rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = ()):
    """Decorator: register a (spark, sf_dir) -> DataFrame query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(name, fn, oracle, tuple(tags), fn.__doc__ or "")
        return fn

    return deco


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    import ocs_duckdb_runner_spark.operators.analytics  # noqa: F401
    import ocs_duckdb_runner_spark.operators.changes  # noqa: F401
    import ocs_duckdb_runner_spark.operators.core  # noqa: F401
    import ocs_duckdb_runner_spark.operators.graph  # noqa: F401
    import ocs_duckdb_runner_spark.operators.grouping  # noqa: F401
    import ocs_duckdb_runner_spark.operators.joins  # noqa: F401
    import ocs_duckdb_runner_spark.operators.quality  # noqa: F401
    import ocs_duckdb_runner_spark.operators.sampling  # noqa: F401
    import ocs_duckdb_runner_spark.operators.setops  # noqa: F401
    import ocs_duckdb_runner_spark.operators.subqueries  # noqa: F401
    import ocs_duckdb_runner_spark.operators.tpch_suite  # noqa: F401
    import ocs_duckdb_runner_spark.operators.windows  # noqa: F401
    import ocs_duckdb_runner_spark.functions.complex  # noqa: F401
    import ocs_duckdb_runner_spark.functions.scalar  # noqa: F401
    import ocs_duckdb_runner_spark.llm.curation  # noqa: F401
    import ocs_duckdb_runner_spark.llm.dedup  # noqa: F401
    import ocs_duckdb_runner_spark.llm.embedding  # noqa: F401
    import ocs_duckdb_runner_spark.llm.export  # noqa: F401
    import ocs_duckdb_runner_spark.llm.similarity  # noqa: F401
    import ocs_duckdb_runner_spark.llm.text  # noqa: F401
    import ocs_duckdb_runner_spark.llm.multimodal  # noqa: F401
    import ocs_duckdb_runner_spark.llm.udfs  # noqa: F401
    import ocs_duckdb_runner_spark.events.timeseries  # noqa: F401
    import ocs_duckdb_runner_spark.events.windows  # noqa: F401
    import ocs_duckdb_runner_spark.sources.connectors  # noqa: F401
    import ocs_duckdb_runner_spark.sources.python_datasource  # noqa: F401
    import ocs_duckdb_runner_spark.streaming.stream_queries  # noqa: F401
    import ocs_duckdb_runner_spark.runner  # noqa: F401


_REPO_ROOT = Path(__file__).resolve().parent.parent


def _driver_green_names() -> frozenset[str]:
    """Query names that already have a green row in any driver-produced
    ``CORRECTNESS_r*.json`` artifact at the repo root.

    The driver sweeps ``queries()`` in dict order with a per-round budget,
    so round 1 only reached the first ~50 names. Ordering not-yet-checked
    queries first lets coverage accumulate across rounds until every
    operator has a driver-side correctness row.
    """
    green: set[str] = set()
    for path in _REPO_ROOT.glob("CORRECTNESS_r*.json"):
        try:
            data = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            hash_green = bool(row.get("hash_match"))
            # rows-only-by-design queries terminate as err:"no_oracle"
            # with a recorded spark_rows — that IS their green state
            rows_green = (
                row.get("err") == "no_oracle"
                and row.get("spark_rows") is not None
            )
            if hash_green or rows_green:
                green.add(name)
    return frozenset(green)


def specs() -> dict[str, QuerySpec]:
    """All registered specs, driver-unchecked names first (see
    :func:`_driver_green_names`); registration order within each group."""
    _load_all()
    green = _driver_green_names()
    ordered = sorted(_REGISTRY.values(), key=lambda s: s.name in green)
    return {s.name: s for s in ordered}


def get_query(name: str) -> QuerySpec:
    return specs()[name]


def all_queries() -> dict[str, QueryFn]:
    return {n: s.fn for n, s in specs().items()}


def all_oracles() -> dict[str, str]:
    return {n: s.oracle for n, s in specs().items() if s.oracle is not None}


def spread(df: DataFrame) -> DataFrame:
    """Widen a narrow scan to the session's parallelism.

    Small parquet objects arrive as ONE input split, which serializes any
    compute-heavy per-row operator (hashing, shingling, fingerprints) on a
    single core no matter how many the cluster has. For such operators the
    one extra round-robin shuffle of the (small) input is repaid many times
    over. No-op when the scan is already wide — so at 100 TB, where the
    input has thousands of splits, this adds nothing.

    Width signal is len(inputFiles()) — file-listing metadata only. The
    earlier df.rdd.getNumPartitions() forced a full plan→RDD conversion
    on every construction (ADVICE r1); a file count under-estimates width
    for huge multi-split files, but those are exactly the inputs that are
    already wide enough not to need spreading."""
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        width = len(df.inputFiles())
    except Exception:
        width = 0
    if width >= target:
        return df
    return df.repartition(target)


# Row cap for forcing a broadcast of a data-dependent small side (hot
# shingle/gram sets, boilerplate fingerprints). Below it the set is
# driver-materialized and broadcast; above it the join is left un-hinted
# so AQE picks the strategy from measured size. 100k keys × ~40 B ≈ 4 MB
# — far under any executor broadcast budget, and the probe that counts
# them is bounded by the same cap (limit(cap+1)), so driver memory is
# constant even on an adversarial corpus where the "small" side is huge.
HOT_BROADCAST_MAX_ROWS = 100_000


def gated_broadcast(
    small: DataFrame, max_rows: int = HOT_BROADCAST_MAX_ROWS
) -> DataFrame:
    """Size-gate a forced broadcast hint (ADVICE r9: a bare
    ``F.broadcast(hot)`` bypasses autoBroadcastJoinThreshold entirely, so
    an adversarial corpus where the hot set is corpus-sized OOMs the
    driver instead of degrading).

    Probes the frame with ``limit(max_rows+1).collect()`` — the probe IS
    the small-case fetch, the same bounded-collect pattern as the CC
    union-find head probe — and:

    - ≤ max_rows: rebuilds the rows as a driver-local relation and
      broadcasts THAT, so the aggregate feeding ``small`` runs exactly
      once (no recompute when the broadcast materializes) and the join
      probe side never shuffles;
    - > max_rows: returns ``small`` PERSISTED (memory-and-disk) and
      un-hinted — the probe's partial materialization is cached, so the
      degenerate (all-boilerplate) corpus pays the aggregate once rather
      than probe+join (ADVICE r10), and AQE chooses the join strategy
      from runtime size. The cached entry lives for the session — one
      bounded aggregate per adversarial invocation, spilling to disk,
      which at scale is the cheap side of re-running a corpus-sized
      aggregate; callers that loop may ``unpersist()`` the returned
      frame after the join materializes."""
    from pyspark import StorageLevel

    # Persist BEFORE the probe: limit().collect() computes only the
    # partitions the limit touches, but those land in the cache, and on
    # the adversarial path the join's full materialization completes the
    # cache instead of recomputing the probe's work from scratch.
    persisted = small.persist(StorageLevel.MEMORY_AND_DISK)
    rows = persisted.limit(max_rows + 1).collect()
    if len(rows) <= max_rows:
        # gated path: the rows are already driver-local — the cache has
        # nothing left to contribute; release it immediately.
        persisted.unpersist(False)
        from pyspark.sql import functions as F

        local = small.sparkSession.createDataFrame(rows, small.schema)
        return F.broadcast(local)
    return persisted


def release_local_checkpoint(df: DataFrame) -> None:
    """Deterministically release a ``localCheckpoint(eager=True)``
    frame's pinned blocks (ADVICE r10: in an iterative loop each round's
    checkpointed RDD otherwise stays in executor storage until the py4j
    finalizer happens to run, so storage accumulates nondeterministically
    over hundreds of rounds).

    The checkpointed Dataset's analyzed plan is the LogicalRDD holding
    the pinned RDD — unpersist THAT RDD, not ``df.rdd`` (a derived
    conversion whose unpersist is a no-op on the checkpoint blocks;
    measured). Only call this on a frame the loop will never read again:
    a localCheckpoint cannot recompute, so a released frame is dead.
    Best-effort — a plan shape this helper doesn't recognize degrades to
    the old GC-based release, never an error."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass


def checkpoint_release(df: DataFrame, *caches: DataFrame) -> DataFrame:
    """``localCheckpoint(eager=True)`` the result, then ALWAYS unpersist
    the intermediate caches — the unpersists sit in a finally block so an
    exception during materialization cannot leak persisted frames into
    the shared long-lived session (r11 ADVICE on sim_hybrid_bm25_cosine /
    agg_bitmap_builtins; every checkpoint-then-unpersist site in the repo
    routes through here so the fix is structural, not per-site)."""
    try:
        return df.localCheckpoint(eager=True)
    finally:
        for c in caches:
            c.unpersist()


def fixture_fingerprint(
    sf_dir: str, table: str | tuple[str, ...] | None = None
) -> str:
    """Cheap content fingerprint — file names, sizes, mtimes; no data
    read — of one table's files, a tuple of tables' files, or every table
    in the fixture dir when ``table`` is None. Every on-disk cache DERIVED
    from the fixtures must carry this in its key: a cache keyed by sf_dir
    path alone goes silently stale the moment a probe rebuilds its
    fixtures in place (the r8 10x finding: stream_incremental_mv's 4-way
    split source predated the events striking and the MV summed a
    100k-row copy against a 1M-row oracle — exactly 10x off, caught only
    because the query is oracle-checked).

    Always 12 hex chars, whatever the table set — cache keys built from
    this compose as ``tag_<12hex>`` and stay matchable by
    ``vacuum_cache_siblings``'s generation regex (ADVICE r9: the bucketed
    cache concatenated two fingerprints into an 18-hex suffix the vacuum
    never matched, so stale bucketed generations leaked under /tmp
    forever)."""
    import hashlib

    h = hashlib.md5()

    def _add(path: str) -> None:
        # mtime at NANOSECOND precision: a whole-second truncation leaves
        # a same-name same-size rebuild within one second undetected —
        # the exact staleness class this helper exists to close
        if os.path.isdir(path):
            for f in sorted(os.listdir(path)):
                fp = os.path.join(path, f)
                st = os.stat(fp)
                h.update(f"{f}:{st.st_size}:{st.st_mtime_ns};".encode())
        elif os.path.exists(path):
            st = os.stat(path)
            h.update(f"{path}:{st.st_size}:{st.st_mtime_ns};".encode())

    if table is None:
        names: tuple[str, ...] = TABLES
    elif isinstance(table, str):
        names = (table,)
    else:
        names = tuple(table)
    for t in names:
        _add(f"{sf_dir}/{t}.parquet")
    return h.hexdigest()[:12]


def vacuum_cache_siblings(parent: str, tag: str, keep: str) -> None:
    """Remove superseded fingerprint generations of a derived cache:
    every entry under ``parent`` that is the bare ``tag`` (the
    pre-fingerprint layout) or ``tag_<other-fingerprint>``, except
    ``keep``. Without this, every in-place fixture rebuild leaks a full
    derived copy (split objects, round-trip fixtures, stream splits)
    under /tmp forever.

    Sibling matching is anchored to the hex fingerprint suffix, NOT a
    bare prefix: tags can extend each other (``sf0.1`` vs ``sf0.1_alt``),
    and a prefix match would let the shorter tag's vacuum delete the
    longer tag's perfectly valid cache generation, forcing spurious
    rebuilds. The suffix width is 12-18 hex: current keys are always 12
    (fixture_fingerprint's contract), but r9's bucketed cache
    concatenated two fingerprints into an 18-hex suffix the exact-12
    pattern never matched (ADVICE r10) — the wider match reclaims those
    already-leaked generations while staying anchored (an extending tag's
    ``_alt_...`` suffix contains non-hex characters and can't match)."""
    import re
    import shutil

    if not os.path.isdir(parent):
        return
    gen = re.compile(re.escape(tag) + r"_[0-9a-f]{12,18}$")
    for name in os.listdir(parent):
        if name == keep:
            continue
        if name == tag or gen.fullmatch(name):
            shutil.rmtree(os.path.join(parent, name), ignore_errors=True)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Path-based parquet scan — the reference's data model is one
    self-describing parquet object per table, no catalog
    (/root/reference/runner.cc:176-180, schema from the parquet footer).

    ``events.ts`` has shipped as parquet timestamp[ns] (older fixtures) and
    timestamp[us] (current ones); this loader must accept both and hand every
    downstream query the same thing: a native session-µs TimestampType under
    UTC semantics — the truncation the oracle applies with
    CAST(ts AS TIMESTAMP). Dispatch is on the *resolved* Spark dtype, never
    on an assumed physical type (the r3 postmortem: a hard-coded ns
    assumption broke the moment the fixtures moved to µs):

    - plain read succeeds, ts is TimestampType      → pass through
    - plain read succeeds, ts is TimestampNTZType   → cast to TimestampType
      (session TZ is UTC, so the wall-clock value is preserved bit-for-bit)
    - plain read rejects the footer (timestamp[ns]) → re-read with
      nanosAsLong, then truncate ns→µs via timestamp_micros(ts DIV 1000)

    Session side effect (API boundary): the session time zone is pinned to
    UTC — oracle parity is only defined under UTC timestamp semantics
    (DuckDB is UTC-naive), and it must hold even when the caller's session
    was built elsewhere (e.g. the driver's own SparkSession). The
    nanosAsLong legacy flag, by contrast, is scoped to the events read and
    restored: it changes how ANY later ns-timestamp parquet in the same
    session is typed, which is not this function's call to make (ADVICE
    r1). Scoping is sound because the flag is consulted when
    ``spark.read.parquet`` resolves the schema, not at execution time.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        return _load_events(spark, f"{sf_dir}/{name}.parquet")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# resolved ts-branch per (path, mtime): the dtype probe forces an EAGER
# footer read (analysis) on every load; queries touching events paid it
# per call (~the r4→r2 event_tumbling bench regression). The branch is a
# property of the file bytes, so cache it and let the common µs branch
# stay fully lazy (schema resolves once, at execution).
_EVENTS_TS_BRANCH: dict[tuple[str, int], str] = {}


def _events_mtime(path: str) -> int:
    try:
        st = os.stat(path)
        return st.st_mtime_ns
    except OSError:  # remote/directory-parquet oddities — don't cache
        return -1


def _load_events(spark: SparkSession, path: str) -> DataFrame:
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    key = (path, _events_mtime(path))
    branch = _EVENTS_TS_BRANCH.get(key) if key[1] >= 0 else None

    if branch == "plain":
        return spark.read.parquet(path)
    if branch == "ntz":
        return spark.read.parquet(path).withColumn(
            "ts", F.col("ts").cast(T.TimestampType())
        )
    # unknown (first touch) or ns: probe / re-read under the scoped flag
    if branch != "ns":
        try:
            df = spark.read.parquet(path)
            ts_type = df.schema["ts"].dataType
            if isinstance(ts_type, T.TimestampNTZType):
                _EVENTS_TS_BRANCH[key] = "ntz"
                return df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
            if not isinstance(ts_type, T.LongType):
                _EVENTS_TS_BRANCH[key] = "plain"
                return df
            # LongType without the flag: another loader set nanosAsLong
            # session-wide — normalize exactly like the ns branch below
            _EVENTS_TS_BRANCH[key] = "ns"
            return df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts DIV 1000"))
            )
        except Exception:
            _EVENTS_TS_BRANCH[key] = "ns"
    # timestamp[ns] footer — Spark refuses it without the legacy flag.
    # The flag is consulted at schema RESOLUTION, so resolve eagerly
    # inside the scoped set/restore (can't defer to execution).
    prev = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        df = spark.read.parquet(path)
        df.schema  # force resolution under the flag
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
        else:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prev)
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
