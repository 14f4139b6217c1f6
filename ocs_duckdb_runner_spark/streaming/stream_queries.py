"""Structured Streaming twins of the batch event queries (SURVEY.md §2c
`stream_tumbling_wm`): file source over the events parquet → event-time
window aggregation with a watermark → memory sink.

Every query here is ORACLE-CHECKED like the batch queries: a stream
drained to completion over finite input (`availableNow` trigger) emits a
deterministic final result — complete-mode window aggregates equal their
batch twins, append-mode joins emit exactly the matched pairs — so the
same DuckDB SQL that validates events/windows.py validates these. The
determinism contract each oracle relies on is stated per query (single
micro-batch under default file-source options where it matters). In
production the source line changes to kafka/kinesis and the sink to a
Delta/parquet writer; the plan in between is identical (that is the point
of Structured Streaming's unified batch/stream model).

Late-data/watermark drop behavior can't be exercised with a single file
micro-batch (the watermark only advances between batches), so it is locked
by the multi-batch unit test in tests/test_streaming.py instead.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ocs_duckdb_runner_spark.exactness import fx_sum, sql_fx_sum
from ocs_duckdb_runner_spark.registry import load_table, query

def _events_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )


_COUNTER = {"n": 0}


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet, normalized to session-µs
    TimestampType under UTC — the same contract as the batch loader
    (registry.load_table), and the same dtype dispatch: the file source
    needs a user-supplied schema, so probe the footer with a one-off batch
    read (metadata only, no data scan) rather than assuming a physical
    type (the r3 postmortem: fixtures moved ns→µs under a hard-coded ns
    assumption). Layout dispatch: events.parquet ships as a single FILE
    in the standard fixtures but as a DIRECTORY of part files from the
    scale probe — a glob filter for the file name matches nothing in the
    directory layout and the source silently streams ZERO rows (the r8
    10x-sweep finding: every stream query 'passed' rows-only on empty
    input), so point the source at whichever layout exists. The
    file-vs-directory probe goes through the Hadoop FileSystem API
    (r13, same class of bug as _stream_shuffle_width's sizing): a
    driver-local os.path.isdir is False for ANY object-store path, so an
    s3a:// sf_dir with the directory layout silently hit the
    glob-filter branch and streamed zero rows — reproduced, then fixed,
    against the live loopback s3a endpoint (S3AWIDTH_r13.json)."""
    import os

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    events_path = f"{sf_dir}/events.parquet"

    def _is_dir(path: str) -> bool:
        try:
            jvm = spark.sparkContext._jvm
            hpath = jvm.org.apache.hadoop.fs.Path(path)
            fs = hpath.getFileSystem(
                spark.sparkContext._jsc.hadoopConfiguration()
            )
            return fs.getFileStatus(hpath).isDirectory()
        except Exception:
            return os.path.isdir(path)

    def _source(schema: T.StructType) -> DataFrame:
        if _is_dir(events_path):
            # directory-parquet: stream the part files directly
            return spark.readStream.schema(schema).parquet(events_path)
        # single file: the file source requires a directory; glob-filter
        # the listing down to the events file
        return (
            spark.readStream.schema(schema)
            .option("pathGlobFilter", "events.parquet")
            .parquet(sf_dir)
        )

    try:
        ts_type = spark.read.parquet(events_path).schema["ts"].dataType
    except Exception:  # ns footer — batch read refuses without legacy flag
        ts_type = None
    if ts_type is None:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw = _source(_events_schema(T.LongType()))
        return raw.withColumn(
            "ts", F.timestamp_micros(F.expr("ts DIV 1000"))
        )
    raw = _source(_events_schema(ts_type))
    if isinstance(ts_type, T.TimestampNTZType):
        raw = raw.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    elif isinstance(ts_type, T.LongType):
        # ns fixture probed *after* a prior call set nanosAsLong: the footer
        # resolves as raw nanosecond longs — normalize exactly like the
        # except-branch (and registry.load_table's LongType dispatch) does.
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return raw


def _events_fingerprint(sf_dir: str) -> str:
    """Content fingerprint of the events fixture, used to content-address
    the derived split-source cache (see registry.fixture_fingerprint for
    why path-keyed derived caches are a staleness hazard)."""
    from ocs_duckdb_runner_spark.registry import fixture_fingerprint

    return fixture_fingerprint(sf_dir, "events")


def _stream_scratch(suffix: str = "", parent: str = "/tmp/ocs_stream_sink") -> str:
    """Fresh uuid scratch path under /tmp/ocs_stream_sink for a
    per-query sink/checkpoint, vacuuming siblings older than 24h on the
    way. These dirs are dead the moment their query returns but carry no
    completion marker to prove it, so the rule is age-only with a cutoff
    far beyond any legitimate run (the full sweep pair is ~2h) — the
    same crash-fallback tier _vacuum_stale_sink_runs uses, without the
    marker tier it can afford (its sinks publish manifests; these
    don't). Without this every sweep leaked ~60 uuid dirs forever (the
    r9-ADVICE /tmp-leak class, third sighting)."""
    import os
    import shutil
    import time
    import uuid

    try:
        cutoff = time.time() - 86400
        for name in os.listdir(parent):
            p = os.path.join(parent, name)
            try:
                if os.stat(p).st_mtime < cutoff:
                    shutil.rmtree(p, ignore_errors=True)
            except OSError:
                pass
    except OSError:
        pass
    return f"{parent}/{uuid.uuid4().hex}{suffix}"


_STREAM_TARGET_BYTES = 4 << 20  # one stateful partition per ~4 MB of source


def _stream_shuffle_width(spark: SparkSession, sf_dir: str) -> int:
    """Stateful-shuffle width for the streaming twins, derived from INPUT
    SIZE rather than the session's core count (r12 optimization, guide
    §2.2): AQE cannot coalesce a streaming aggregation's state shuffle,
    so the session default (cores) puts 32 near-empty state stores behind
    every stateful operator — measured at sf0.1: stream_tumbling_wm
    2.6s -> 1.1s and stream_stream_join 8.6s -> 2.5s going 32 -> small,
    almost all of it per-partition state-store commit + task overhead.
    One partition per ~4 MB of source parquet, clamped to [1, session
    parallelism]: the sf0.1 fixture (2 MB) gets 1, the 10x probe (20 MB)
    gets 5, a 100 TB source saturates the cluster-width clamp. The 4 MB
    target was swept at the 10x probe: key-heavy state (dropDuplicates
    over 1M event ids, session windows) runs 12-14 s at width 1 but
    4.3-6 s at widths 4-10, while key-light windows prefer narrow (2.0 s
    at 32 vs 1.1-1.5 s at 1-4) — 4 MB/partition sits at the joint
    optimum and keeps growing the width with the data.
    SPARK_GRAFT_STREAM_SHUFFLE overrides for deployments that know
    their key cardinality. Partition count never changes WHAT a drained
    stream emits — only where keys hash.

    Scope: JVM-stateful operators only (window aggregates, dedup,
    stream-stream joins, the state reader). The PYTHON-stateful family
    (applyInPandasWithState / transformWithState) deliberately keeps the
    session compute width: its per-row cost is the Python worker, so
    narrowing to the state-store-optimal width serializes the Python
    work and LOSES (measured at sf0.1, 3-rep medians: tws_session_gap
    8.0s at width 1 vs 6.9s at 32; custom_state 5.1 vs 3.7)."""
    env = os.environ.get("SPARK_GRAFT_STREAM_SHUFFLE")
    if env:
        return max(1, int(env))
    parallelism = spark.sparkContext.defaultParallelism
    path = f"{sf_dir}/events.parquet"
    # Size the source through the Hadoop FileSystem API, not os.path
    # (r13, VERDICT r12 #2): the driver-local stat only works for a
    # local filesystem — an object-store sf_dir (s3a://, hdfs://, ...)
    # raised and the old except branch returned width 1, serializing
    # every JVM-stateful drain at exactly the scale where that hurts
    # most. getContentSummary resolves any scheme the session can read
    # and sums directories recursively.
    try:
        jvm = spark.sparkContext._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = hpath.getFileSystem(
            spark.sparkContext._jsc.hadoopConfiguration()
        )
        size = fs.getContentSummary(hpath).getLength()
    except Exception:
        # Unknown/unreadable source: fail WIDE (session parallelism),
        # never narrow — an over-wide stateful shuffle costs near-empty
        # state-store commits; an under-wide one serializes the drain.
        return parallelism
    return max(1, min(parallelism, -(-size // _STREAM_TARGET_BYTES)))


class _scoped_stream_shuffle:
    """Set spark.sql.shuffle.partitions to the input-derived stream width
    for the duration of one stream drain, restoring the session value on
    the way out (the fn_time_type try/finally conf discipline).

    SEQUENTIAL-DRAIN ASSUMPTION (ADVICE r12): this mutates the
    session-global conf, so two streams drained CONCURRENTLY in one
    session would race — one could be planned at the other's width or
    have its restore clobbered. Every drain in this module runs
    synchronously on the calling thread (queries()/bench/tests all drain
    one stream at a time), which is what makes the scoped set/restore
    sound. If concurrent drains ever become a surface, guard with a
    module-level lock or move the width onto a per-query conf."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.width = _stream_shuffle_width(spark, sf_dir)

    def __enter__(self):
        try:
            self.prev = self.spark.conf.get("spark.sql.shuffle.partitions")
        except Exception:
            self.prev = None
        self.spark.conf.set("spark.sql.shuffle.partitions", str(self.width))
        return self

    def __exit__(self, *exc):
        if self.prev is None:
            self.spark.conf.unset("spark.sql.shuffle.partitions")
        else:
            self.spark.conf.set("spark.sql.shuffle.partitions", self.prev)
        return False


def _run_to_memory(agg: DataFrame, mode: str, sf_dir: str | None = None) -> str:
    """Drive a streaming aggregation to completion against the memory sink
    (single micro-batch over the fixture file) and return the table name.
    When ``sf_dir`` is given, the drain runs under the input-derived
    stateful-shuffle width (see _stream_shuffle_width)."""
    _COUNTER["n"] += 1
    name = f"stream_out_{_COUNTER['n']}"

    def _start_and_drain() -> None:
        q = (
            agg.writeStream.outputMode(mode)
            .format("memory")
            .queryName(name)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    if sf_dir is None:
        _start_and_drain()
    else:
        with _scoped_stream_shuffle(agg.sparkSession, sf_dir):
            _start_and_drain()
    return name


@query(
    "stream_tumbling_wm",
    oracle=f"""
    SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n,
           {sql_fx_sum('value')} AS sum_value_c
    FROM events
    GROUP BY 1, 2
    """,
    tags=("streaming",),
)
def stream_tumbling_wm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming tumbling-window aggregation with a 10-minute watermark —
    the streaming twin of event_tumbling (same windows, same exact
    fixed-point sum). Complete mode re-emits EVERY window on the final
    micro-batch regardless of how availableNow splits the drain, so the
    drained result equals the batch aggregate deterministically — checked
    against event_tumbling's own oracle (window('1 hour').start ≡
    date_trunc('hour'))."""
    events = read_events_stream(spark, sf_dir).withWatermark("ts", "10 minutes")
    agg = (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), fx_sum("value").alias("sum_value_c"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n", "sum_value_c"
        )
    )
    return spark.table(_run_to_memory(agg, "complete", sf_dir))


@query(
    "stream_sliding_wm",
    oracle=f"""
    WITH e AS (SELECT epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_type, value
               FROM events),
    w AS (SELECT make_timestamp((us // 1800000000) * 1800000000) AS window_start,
                 event_type, value FROM e
          UNION ALL
          SELECT make_timestamp((us // 1800000000) * 1800000000
                                - 1800000000) AS window_start,
                 event_type, value FROM e)
    SELECT window_start, event_type,
           CAST(count(*) AS BIGINT) AS n,
           {sql_fx_sum('value')} AS sum_value_c
    FROM w
    GROUP BY 1, 2
    """,
    tags=("streaming",),
)
def stream_sliding_wm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming SLIDING-window aggregation (1 hour every 30 minutes)
    with a 10-minute watermark — the streaming twin of event_sliding:
    each event lands in exactly two overlapping windows, the state
    store carries both, and the watermark bounds how long each window
    stays open. Same exact fixed-point sum as the batch twin; complete
    mode re-emits every window on the final micro-batch, so the drained
    result equals the batch aggregate deterministically — checked against
    event_sliding's oracle (explicit µs bucket arithmetic reconstructs
    Spark's epoch-aligned window starts); batch-twin equality also locked
    in tests/test_streaming.py."""
    events = read_events_stream(spark, sf_dir).withWatermark("ts", "10 minutes")
    agg = (
        events.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"), fx_sum("value").alias("sum_value_c"))
        .select(
            F.col("w.start").alias("window_start"), "event_type", "n", "sum_value_c"
        )
    )
    return spark.table(_run_to_memory(agg, "complete", sf_dir))


def _user_totals_state(key, pdfs, state):
    """Custom stateful operator body (applyInPandasWithState): per-user
    running (event count, exact value-cents sum) carried in the state
    store across micro-batches; emits one updated row per batch.

    Rounding: cents come from sign-aware floor(|v|+0.5) — round HALF AWAY
    FROM ZERO — because both engines' round() (Spark HALF_UP, DuckDB
    half-away) use that tie rule, while pandas Series.round() is numpy
    round-half-to-EVEN and would diverge from the oracle on any value
    whose cents land exactly on .5 (2-decimal fixtures never do, but the
    operator must not depend on that fixture accident)."""
    import numpy as np
    import pandas as pd

    (user_id,) = key
    n, cents = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        v = pdf["value"].fillna(0.0).to_numpy() * 100.0
        cents += int(
            (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype("int64").sum()
        )
    state.update((n, cents))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "sum_value_c": [cents]}
    )


@query(
    "stream_custom_state",
    oracle="""
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(round(coalesce(value, 0) * 100) AS BIGINT))
                AS BIGINT) AS sum_value_c
    FROM events
    GROUP BY user_id
    """,
    tags=("streaming", "stateful"),
)
def stream_custom_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary stateful streaming via applyInPandasWithState — the
    extension point for operators Structured Streaming doesn't ship
    (custom sessionizers, CEP, online aggregates). State is per-key and
    store-backed, so it scales with distinct users, not events.

    Oracle determinism: update mode emits one row per key PER BATCH, so
    the oracle (one final total per user) relies on availableNow draining
    the file listing in a single micro-batch — the file source's default
    when maxFilesPerTrigger is unset, which holds for both fixture
    layouts (single file and the probe's part-file directory; verified
    at sf0.001/sf0.01/10x). A multi-batch drain would duplicate keys and
    fail the row-count check loudly, not silently. The same totals are
    also cross-checked against the batch aggregate by
    tests/test_streaming.py, which DOES exercise the multi-batch path.

    Spark 4's successor API (transformWithStateInPandas: typed value/list/
    map state, timers, TTL) is covered by stream_transform_with_state —
    the same totals behind a StatefulProcessor, env-dispatched on
    transform_with_state_available() because the TWS state server needs
    google.protobuf, which this container lacks."""
    from pyspark.sql.types import (
        LongType,
        StructField,
        StructType,
    )

    events = read_events_stream(spark, sf_dir)
    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("sum_value_c", LongType()),
        ]
    )
    state_schema = StructType(
        [StructField("n", LongType()), StructField("cents", LongType())]
    )
    # r12 optimization (guide §4.1): the stateful body reads only
    # `value` — project before the state exchange, or every event ships
    # all six columns (including the props JSON payload) through the
    # shuffle AND the Arrow boundary. Catalyst cannot prune through the
    # opaque Python function.
    events = events.select("user_id", "value")
    totals = events.groupBy("user_id").applyInPandasWithState(
        _user_totals_state,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf="NoTimeout",
    )
    return spark.table(_run_to_memory(totals, "update"))


def transform_with_state_available() -> bool:
    """True when Spark 4's transformWithStateInPandas can actually run
    here: its Python worker speaks a protobuf protocol to the JVM-side
    state server, so ``google.protobuf`` must be importable in the
    worker env. This container lacks it — the API surface imports fine
    but the TWS driver worker crashes on startup (probed r10:
    'TransformWithStateInPySpark driver worker exited unexpectedly') —
    while any real deployment with the pyspark[connect] extras has it.
    Same dispatch contract as sources.hadoop_aws_available(): the gated
    query takes the real path unchanged the moment the dependency
    exists."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def _totals_out_schema() -> T.StructType:
    return T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("sum_value_c", T.LongType()),
        ]
    )


def _make_user_totals_processor():
    """Build the StatefulProcessor twin of _user_totals_state for
    transformWithStateInPandas — same per-user (count, exact value-cents
    sum) semantics, same half-away-from-zero rounding, carried in a
    typed ValueState instead of the legacy GroupState tuple. Built by a
    factory (not at module import) so importing this module never
    requires the StatefulProcessor ABC at class-definition time on
    stripped-down envs; the class body itself has no protobuf imports —
    only the state-server transport does."""
    from pyspark.sql.streaming import StatefulProcessor

    class _UserTotalsProcessor(StatefulProcessor):
        def init(self, handle) -> None:
            self._state = handle.getValueState(
                "totals",
                T.StructType(
                    [
                        T.StructField("n", T.LongType()),
                        T.StructField("cents", T.LongType()),
                    ]
                ),
            )

        def handleInputRows(self, key, rows, timerValues):
            import numpy as np
            import pandas as pd

            n, cents = self._state.get() if self._state.exists() else (0, 0)
            for pdf in rows:
                n += len(pdf)
                v = pdf["value"].fillna(0.0).to_numpy() * 100.0
                cents += int(
                    (np.sign(v) * np.floor(np.abs(v) + 0.5))
                    .astype("int64")
                    .sum()
                )
            self._state.update((n, cents))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "sum_value_c": [cents],
                }
            )

        def close(self) -> None:
            pass

    return _UserTotalsProcessor()


@query(
    "stream_transform_with_state",
    oracle="""
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(round(coalesce(value, 0) * 100) AS BIGINT))
                AS BIGINT) AS sum_value_c
    FROM events
    GROUP BY user_id
    """,
    tags=("streaming", "stateful", "spark4"),
)
def stream_transform_with_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user stateful totals on Spark 4's transformWithStateInPandas —
    the successor of applyInPandasWithState (typed value/list/map state,
    timers, TTL, initial state) and the API a user migrating stateful
    pipelines to Spark 4 hits first.

    ENV-DISPATCHED, stated plainly: the TWS state server needs
    google.protobuf in the worker env (transform_with_state_available —
    absent in this container, present on any pyspark[connect] cluster).
    With it, the query runs the real StatefulProcessor path; without it,
    the SAME per-user totals run through the legacy
    applyInPandasWithState operator, so the oracle checks identical
    semantics either way and the processor body itself is twin-locked
    against the legacy function by tests/test_streaming.py (fake-handle
    drive, multi-batch). The two operator bodies share rounding and
    state shape line-for-line — swapping the transport is the ONLY
    difference, which is exactly the migration story the API promises.

    Scale: state is per-user (distinct keys), not per-event; RocksDB
    state store + changelog checkpointing on a cluster. Oracle
    determinism: update mode emits one row per key per batch; the
    availableNow drain over the fixture listing is a single micro-batch
    (same contract as stream_custom_state, multi-batch path locked in
    tests/test_streaming.py)."""
    events = read_events_stream(spark, sf_dir)
    out_schema = _totals_out_schema()
    # guide §4.1: both stateful bodies read only `value` — project
    # before the state exchange (see stream_custom_state)
    grouped = events.select("user_id", "value").groupBy("user_id")
    if transform_with_state_available():
        totals = grouped.transformWithStateInPandas(
            _make_user_totals_processor(),
            outputStructType=out_schema,
            outputMode="Update",
            timeMode="None",
        )
    else:
        totals = grouped.applyInPandasWithState(
            _user_totals_state,
            outputStructType=out_schema,
            stateStructType=T.StructType(
                [
                    T.StructField("n", T.LongType()),
                    T.StructField("cents", T.LongType()),
                ]
            ),
            outputMode="update",
            timeoutConf="NoTimeout",
        )
    return spark.table(_run_to_memory(totals, "update"))


_SESSION_GAP_MS = 600_000  # 10 min, matching the sessionize family


def _count_sessions(ts_ms, last_ms, n_sessions, n_events):
    """Shared gap-count math for both stateful bodies: given this batch's
    SORTED event times (ms) and the carried state, return the updated
    (last_ms, n_sessions, n_events). A gap STRICTLY greater than
    _SESSION_GAP_MS starts a new session — the same rule as the
    event_sessionize / stream_sessionize oracles."""
    import numpy as np

    if len(ts_ms) == 0:
        return last_ms, n_sessions, n_events
    if last_ms is None or ts_ms[0] - last_ms > _SESSION_GAP_MS:
        n_sessions += 1
    n_sessions += int((np.diff(ts_ms) > _SESSION_GAP_MS).sum())
    n_events += len(ts_ms)
    return int(ts_ms[-1]), n_sessions, n_events


def _batch_ts_ms(pdfs):
    """All of a micro-batch's event times as one sorted int64-ms array."""
    import numpy as np

    arrs = [
        pdf["ts"].to_numpy(dtype="datetime64[ms]").astype("int64")
        for pdf in pdfs
    ]
    ts = np.concatenate(arrs) if arrs else np.empty(0, dtype="int64")
    ts.sort()
    return ts


def _session_row(user_id, n_sessions, n_events):
    import pandas as pd

    return pd.DataFrame(
        {
            "user_id": [user_id],
            "n_sessions": [n_sessions],
            "n_events": [n_events],
        }
    )


def _user_sessions_state(key, pdfs, state):
    """Legacy applyInPandasWithState body with EVENT-TIME TIMEOUT state
    eviction: per-user gap-session counts where the activity half of the
    state (last_ms) is DROPPED once the watermark passes last_ms + gap.

    Eviction is semantically invisible BY CONSTRUCTION: after the
    watermark passes last_ms + gap, every future event has
    ts > watermark >= last_ms + gap, i.e. it starts a NEW session whether
    last_ms is remembered or not — so forgetting it changes nothing about
    the answer and everything about state size: live state is bounded by
    users active within one gap window, not by all users ever seen. The
    running totals stay (they're the answer), carried as the same tuple
    with a null last_ms. Multi-batch + eviction path locked by
    tests/test_streaming.py (live stream, maxFilesPerTrigger) and the
    fake-handle twin drive."""
    (user_id,) = key
    if state.hasTimedOut:
        # watermark passed last_ms + gap: evict the activity half
        _, n_sessions, n_events = state.get
        state.update((None, n_sessions, n_events))
        return
    last_ms, n_sessions, n_events = (
        state.get if state.exists else (None, 0, 0)
    )
    ts = _batch_ts_ms(pdfs)
    last_ms, n_sessions, n_events = _count_sessions(
        ts, last_ms, n_sessions, n_events
    )
    state.update((last_ms, n_sessions, n_events))
    if last_ms is not None:
        # the timeout must be strictly beyond the current watermark or
        # Spark rejects it (late-arriving final events can leave
        # last_ms + gap already behind the watermark)
        state.setTimeoutTimestamp(
            max(last_ms + _SESSION_GAP_MS, state.getCurrentWatermarkMs() + 1)
        )
    yield _session_row(user_id, n_sessions, n_events)


def _make_user_sessions_processor():
    """StatefulProcessor twin of _user_sessions_state for
    transformWithStateInPandas — the r10 verdict's 'beyond the basic
    path' ask: EVENT-TIME TIMERS (registerTimer / handleExpiredTimer)
    evict the activity state deterministically when the watermark passes
    last_ms + gap, and the same activity state ALSO carries a TTL
    (ttlDurationMs = gap) as the processing-time belt-and-suspenders for
    keys the watermark never advances past (an idle source). Both
    eviction routes are safe for the same reason: a forgotten last_ms is
    indistinguishable from a gap-expired one (see _user_sessions_state).
    The totals state carries no TTL — it IS the answer. Fake-handle twin
    drive in tests/test_streaming.py locks both bodies emitting
    identically across an input/expire/input schedule and the expired
    timer actually CLEARING the state."""
    from pyspark.sql.streaming import StatefulProcessor

    class _UserSessionsProcessor(StatefulProcessor):
        def init(self, handle) -> None:
            self._handle = handle
            self._last = handle.getValueState(
                "last_seen",
                T.StructType([T.StructField("last_ms", T.LongType())]),
                ttlDurationMs=_SESSION_GAP_MS,
            )
            self._totals = handle.getValueState(
                "totals",
                T.StructType(
                    [
                        T.StructField("n_sessions", T.LongType()),
                        T.StructField("n_events", T.LongType()),
                    ]
                ),
            )

        def handleInputRows(self, key, rows, timerValues):
            last_ms = (
                self._last.get()[0] if self._last.exists() else None
            )
            n_sessions, n_events = (
                self._totals.get() if self._totals.exists() else (0, 0)
            )
            ts = _batch_ts_ms(rows)
            last_ms, n_sessions, n_events = _count_sessions(
                ts, last_ms, n_sessions, n_events
            )
            if last_ms is not None:
                self._last.update((last_ms,))
                self._handle.registerTimer(last_ms + _SESSION_GAP_MS)
            self._totals.update((n_sessions, n_events))
            yield _session_row(key[0], n_sessions, n_events)

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            # watermark passed last_ms + gap: drop the activity state
            # (the totals stay — they're the answer, not bookkeeping)
            self._last.clear()
            return iter(())

        def close(self) -> None:
            pass

    return _UserSessionsProcessor()


@query(
    "stream_tws_session_gap",
    oracle="""
    WITH x AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
    marked AS (
      SELECT user_id,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       IS NULL
                       OR ts - lag(ts) OVER (PARTITION BY user_id
                                             ORDER BY ts)
                          > INTERVAL 10 MINUTE
                  THEN 1 ELSE 0 END AS is_new
      FROM x)
    SELECT user_id,
           CAST(sum(is_new) AS BIGINT) AS n_sessions,
           CAST(count(*) AS BIGINT) AS n_events
    FROM marked
    GROUP BY user_id
    """,
    tags=("streaming", "stateful", "spark4", "timers"),
)
def stream_tws_session_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user gap-session COUNTS as a custom stateful operator with
    state eviction — the timers/TTL face of the Spark 4 stateful API
    (r10 verdict Next #7), env-dispatched exactly like
    stream_transform_with_state: with google.protobuf present the real
    transformWithStateInPandas path runs (timeMode='EventTime', an
    event-time timer per key evicting the activity state, TTL on the
    same state as the processing-time belt); without it the legacy
    applyInPandasWithState body with EventTimeTimeout carries identical
    semantics. State per user is (last_ms, n_sessions, n_events) — the
    activity half evicted one gap past last activity, so live state
    tracks users active within the gap window, not all users ever seen:
    the difference between O(active) and O(lifetime) state at 100 TB.

    Oracle: the batch lag/gap cumsum derivation of the same counts.
    Update mode + availableNow single-batch drain = one row per user
    (same determinism contract as stream_custom_state); the multi-batch
    and eviction paths are locked by tests/test_streaming.py."""
    events = read_events_stream(spark, sf_dir).withWatermark(
        "ts", "10 minutes"
    )
    return spark.table(
        _run_to_memory(_session_gap_stateful(events), "update")
    )


def _session_gap_stateful(events: DataFrame) -> DataFrame:
    """The session-gap stateful transform shared by stream_tws_session_gap
    and its RocksDB-provider twin: watermarked events -> per-user gap
    session counts via the TWS/legacy dispatch (see stream_tws_session_gap
    for the dispatch contract)."""
    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("n_sessions", T.LongType()),
            T.StructField("n_events", T.LongType()),
        ]
    )
    grouped = events.select("user_id", "ts").groupBy("user_id")
    if transform_with_state_available():
        return grouped.transformWithStateInPandas(
            _make_user_sessions_processor(),
            outputStructType=out_schema,
            outputMode="Update",
            timeMode="EventTime",
        )
    return grouped.applyInPandasWithState(
        _user_sessions_state,
        outputStructType=out_schema,
        stateStructType=T.StructType(
            [
                T.StructField("last_ms", T.LongType()),
                T.StructField("n_sessions", T.LongType()),
                T.StructField("n_events", T.LongType()),
            ]
        ),
        outputMode="update",
        timeoutConf="EventTimeTimeout",
    )


_ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
_PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"
_CHANGELOG_CONF = (
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
)


def _split_events_source(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """Build (once per fixture content) a time-split two-part derived
    events source: ``lo/`` holds every event at or below the min/max
    midpoint timestamp, ``hi/`` the rest — so a stream that drains lo
    first can never see hi rows fall behind the checkpointed watermark
    (watermark after lo = max(ts_lo) - 10min < every hi ts). Content-
    addressed like the events4 split (stream_incremental_mv): the scale
    probe rebuilds fixtures in place, so path-keyed caches go stale."""
    sf_tag = sf_dir.strip("/").replace("/", "_")
    tag = sf_tag + "_" + _events_fingerprint(sf_dir)
    root = f"/tmp/ocs_stream_src/rocks2_{tag}"
    lo_dir, hi_dir = f"{root}/lo", f"{root}/hi"
    if not (
        os.path.exists(f"{lo_dir}/_SUCCESS")
        and os.path.exists(f"{hi_dir}/_SUCCESS")
    ):
        from ocs_duckdb_runner_spark.registry import vacuum_cache_siblings

        vacuum_cache_siblings(
            "/tmp/ocs_stream_src", f"rocks2_{sf_tag}", f"rocks2_{tag}"
        )
        ev = load_table(spark, sf_dir, "events")
        bounds = ev.agg(
            F.min("ts").alias("lo"), F.max("ts").alias("hi")
        ).collect()[0]
        mid = bounds["lo"] + (bounds["hi"] - bounds["lo"]) / 2
        ev.filter(F.col("ts") <= F.lit(mid)).write.mode("overwrite").parquet(
            lo_dir
        )
        ev.filter(F.col("ts") > F.lit(mid)).write.mode("overwrite").parquet(
            hi_dir
        )
    return lo_dir, hi_dir


def _link_parts(src_dir: str, dst_dir: str) -> None:
    """Hardlink a written parquet directory's part files into a live
    stream-source directory (no byte copy; names stay unique because
    Spark part files carry a per-write uuid)."""
    os.makedirs(dst_dir, exist_ok=True)
    for name in sorted(os.listdir(src_dir)):
        if not name.endswith(".parquet"):
            continue
        try:
            os.link(f"{src_dir}/{name}", f"{dst_dir}/{name}")
        except OSError:
            import shutil

            shutil.copy2(f"{src_dir}/{name}", f"{dst_dir}/{name}")


@query(
    "stream_tws_rocksdb",
    oracle="""
    WITH x AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
    marked AS (
      SELECT user_id,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       IS NULL
                       OR ts - lag(ts) OVER (PARTITION BY user_id
                                             ORDER BY ts)
                          > INTERVAL 10 MINUTE
                  THEN 1 ELSE 0 END AS is_new
      FROM x)
    SELECT user_id,
           CAST(sum(is_new) AS BIGINT) AS n_sessions,
           CAST(count(*) AS BIGINT) AS n_events
    FROM marked
    GROUP BY user_id
    """,
    tags=("streaming", "stateful", "rocksdb", "spark4"),
)
def stream_tws_rocksdb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The session-gap stateful operator under the RocksDB state store
    provider with CHANGELOG CHECKPOINTING, across a real query restart —
    the round-11 verdict's Next #4: at 100 TB the keyed-state lever is
    not the operator but the store (RocksDB spills keyed state to local
    SSD instead of executor heap, and changelog checkpointing uploads
    per-batch deltas instead of full snapshots), and local[32]'s default
    HDFS-backed provider hides every state-size cliff.

    Same semantics and ORACLE as stream_tws_session_gap; what's new is
    the harness around it: (1) set-with-restore of the provider +
    changelog confs (the fn_time_type try/finally pattern — both are
    per-query runtime confs read at stream start); (2) the fixture is
    drained in TWO phases against ONE checkpoint — phase 1 streams the
    early time-half, the query STOPS, phase 2 starts a NEW query from
    the same checkpoint over the late half — so every user active in
    both halves proves their (last_ms, totals) state survived a RocksDB
    commit -> changelog upload -> restart -> replay round-trip (the
    time-split keeps hi rows ahead of the checkpointed watermark, see
    _split_events_source); (3) the query SELF-ASSERTS the provider took
    effect by requiring ``*.changelog`` files in the checkpoint's state
    directory — only the RocksDB provider with changelog checkpointing
    writes those, so a silent fallback to the default provider fails the
    CORRECTNESS row instead of passing vacuously. Per-user totals are
    max() across both phases' update-mode emissions (n_sessions and
    n_events are monotone nondecreasing)."""
    prior_provider = spark.conf.get(_PROVIDER_CONF, None)
    prior_changelog = spark.conf.get(_CHANGELOG_CONF, None)
    lo_dir, hi_dir = _split_events_source(spark, sf_dir)
    base = _stream_scratch("_rocksdb")
    src, ck, out = f"{base}/src", f"{base}/ckpt", f"{base}/out"
    schema = spark.read.parquet(lo_dir).schema

    # memory sinks refuse checkpoint recovery (they are not fault
    # tolerant), and update-mode stateful output can't go to a plain
    # parquet sink — foreachBatch is the restart-safe way to land the
    # per-batch update rows (same sink pattern as stream_incremental_mv)
    def _land_updates(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(out)

    spark.conf.set(_PROVIDER_CONF, _ROCKSDB_PROVIDER)
    spark.conf.set(_CHANGELOG_CONF, "true")
    try:
        # NO width scoping here: this is the PYTHON-stateful family
        # (_session_gap_stateful / applyInPandasWithState), whose per-row
        # cost is the Python worker — narrowing to the state-store-
        # optimal width serializes the Python work and LOSES (measured:
        # 13.7s -> 140s at the 10x probe with width 1). RocksDB instance
        # count follows the session compute width, like the other
        # Python-stateful drains.
        for phase_dir in (lo_dir, hi_dir):
            _link_parts(phase_dir, src)
            events = (
                spark.readStream.schema(schema)
                .parquet(src)
                .withWatermark("ts", "10 minutes")
            )
            q = (
                _session_gap_stateful(events)
                .writeStream.outputMode("update")
                .foreachBatch(_land_updates)
                .option("checkpointLocation", ck)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
    finally:
        if prior_provider is None:
            spark.conf.unset(_PROVIDER_CONF)
        else:
            spark.conf.set(_PROVIDER_CONF, prior_provider)
        if prior_changelog is None:
            spark.conf.unset(_CHANGELOG_CONF)
        else:
            spark.conf.set(_CHANGELOG_CONF, prior_changelog)
    n_changelog = sum(
        1
        for _root, _dirs, files in os.walk(f"{ck}/state")
        for f in files
        if f.endswith(".changelog")
    )
    if n_changelog == 0:
        raise RuntimeError(
            "RocksDB changelog checkpointing left no *.changelog files — "
            "the state store fell back to a different provider"
        )
    both = spark.read.parquet(out)
    return both.groupBy("user_id").agg(
        F.max("n_sessions").cast("long").alias("n_sessions"),
        F.max("n_events").cast("long").alias("n_events"),
    )


@query(
    "stream_dedup_wm",
    oracle="""
    SELECT event_id, user_id, event_type, value FROM events
    """,
    tags=("streaming", "dedup"),
)
def stream_dedup_wm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup with watermark-bounded state
    (dropDuplicatesWithinWatermark on event_id) — the streaming face of the
    dedup family: state for an id is kept only one watermark interval, so
    memory is bounded at any scale.

    Oracle determinism: event_id is a KEY of the events fixture at every
    scale (asserted true of sf0.001/0.01/0.1 and the scale probe, whose
    striking re-keys event ids), so the survivor set is the full
    projection and the oracle is an honest same-input identity check. On
    data with real duplicate ids the survivor per id is first-seen
    (arrival-order-dependent) and this check would revert to rows-only —
    the watermark-eviction semantics for that case are locked by the
    multi-batch unit test in tests/test_streaming.py instead."""
    events = read_events_stream(spark, sf_dir).withWatermark("ts", "10 minutes")
    deduped = events.dropDuplicatesWithinWatermark(["event_id"]).select(
        "event_id", "user_id", "event_type", "value"
    )
    return spark.table(_run_to_memory(deduped, "append", sf_dir))


@query(
    "stream_sessionize",
    oracle="""
    WITH x AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
    marked AS (
      SELECT user_id, ts,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                       OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                          > INTERVAL 10 MINUTE
                  THEN 1 ELSE 0 END AS is_new
      FROM x),
    sessions AS (
      SELECT user_id, ts,
             sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                               ROWS UNBOUNDED PRECEDING) AS sid
      FROM marked)
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 10 MINUTE AS session_end,
           CAST(count(*) AS BIGINT) AS n_events
    FROM sessions
    GROUP BY user_id, sid
    """,
    tags=("streaming", "session"),
)
def stream_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming gap-based sessionization: session_window aggregation under
    a watermark — the streaming twin of event_sessionize (which carries the
    same oracle: lag + gap-flag cumsum derives identical sessions from
    first principles). State per (user, open session), closed and evicted
    once the watermark passes the gap — bounded memory at any scale.
    Complete mode re-emits all sessions on the final micro-batch, so the
    drained result equals the batch session_window aggregate
    deterministically."""
    events = read_events_stream(spark, sf_dir).withWatermark("ts", "10 minutes")
    agg = (
        events.groupBy(
            "user_id", F.session_window("ts", "10 minutes").alias("w")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
    return spark.table(_run_to_memory(agg, "complete", sf_dir))


@query(
    "stream_static_join",
    oracle=f"""
    SELECT CAST(user_id % 3 AS INTEGER) AS tier,
           CAST(count(*) AS BIGINT) AS n,
           {sql_fx_sum('value')} AS sum_value_c
    FROM events
    GROUP BY 1
    """,
    tags=("streaming", "join"),
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream–static join: the streaming events enriched against a static
    batch dimension (per-user tier derived from the same fixture) — the
    standard enrichment topology (stream ⋈ slowly-changing dim). The
    static side is planned per micro-batch as a broadcast hash join; no
    stream-side state is kept. Aggregated per tier in complete mode, so
    the drained result is the batch aggregate regardless of batch split —
    the oracle inlines the dimension derivation (tier = user_id % 3; the
    dim join is lossless because the dim is built from the same table's
    distinct user ids)."""
    from ocs_duckdb_runner_spark.registry import load_table

    dim = (
        load_table(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .withColumn("tier", (F.col("user_id") % 3).cast("int"))
    )
    events = read_events_stream(spark, sf_dir)
    enriched = events.join(F.broadcast(dim), "user_id")
    agg = enriched.groupBy("tier").agg(
        F.count(F.lit(1)).alias("n"), fx_sum("value").alias("sum_value_c")
    )
    return spark.table(_run_to_memory(agg, "complete", sf_dir))


@query(
    "stream_foreach_batch",
    oracle=f"""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           {sql_fx_sum('value')} AS sum_value_c,
           CAST(0 AS BIGINT) AS batch_id
    FROM events
    GROUP BY 1
    """,
    tags=("streaming", "sink"),
)
def stream_foreach_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch sink — the escape hatch for sinks Structured Streaming
    doesn't ship natively (JDBC upserts, MERGE INTO, multi-table writes):
    each micro-batch arrives as a regular DataFrame with a batch id, and
    arbitrary batch logic runs exactly-once per epoch (checkpoint-fenced).
    Here each batch is aggregated per event_type and appended to a parquet
    sink; the returned DataFrame re-reads the sink — so the ORACLE check
    covers the whole write-then-read loop. Determinism: with
    maxFilesPerTrigger unset, availableNow drains the listing in one
    epoch (batch_id 0) for both fixture layouts — a multi-batch drain
    would emit extra (event_type, batch_id) rows and fail the row-count
    check loudly. stream_incremental_mv exercises the multi-batch
    foreachBatch path explicitly."""
    out = _stream_scratch()

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        (
            batch_df.groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"), fx_sum("value").alias("sum_value_c"))
            .withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(out)
        )

    events = read_events_stream(spark, sf_dir)
    q = (
        events.writeStream.foreachBatch(write_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", f"{out}_ckpt")
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out)


@query(
    "stream_stream_join",
    oracle="""
    WITH e AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_type, value
               FROM events)
    SELECT l.user_id AS l_user, l.ts AS l_ts, r.ts AS r_ts,
           CAST(round(l.value * 100) AS BIGINT) AS purchase_c
    FROM e l JOIN e r
      ON r.user_id = l.user_id
     AND r.ts <= l.ts
     AND r.ts >= l.ts - INTERVAL 1 HOUR
    WHERE l.event_type = 'purchase' AND r.event_type = 'click'
    """,
    tags=("streaming", "join"),
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream–stream interval join: each 'purchase' event matched to the
    same user's 'click' events from the preceding hour — both sides
    watermarked so the join state is RANGE-BOUNDED: a buffered click can
    be evicted once the watermark passes its ts + 1 hour, which is what
    keeps state finite on an unbounded stream (the defining constraint of
    streaming joins; an un-watermarked side would buffer forever).

    Oracle determinism: over a drained finite input the emitted append-
    mode pairs are exactly the batch interval join — provided no match
    is lost to state eviction mid-drain, which holds under the single-
    micro-batch default (maxFilesPerTrigger unset; watermark eviction
    only runs BETWEEN batches). The batch twin of this shape is
    join_asof/window_range_frame."""
    left = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("l_user"),
            F.col("ts").alias("l_ts"),
            F.col("value").alias("l_value"),
        )
        .withWatermark("l_ts", "10 minutes")
    )
    right = (
        read_events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("r_user"),
            F.col("ts").alias("r_ts"),
        )
        .withWatermark("r_ts", "10 minutes")
    )
    joined = left.join(
        right,
        (F.col("l_user") == F.col("r_user"))
        & (F.col("r_ts") <= F.col("l_ts"))
        & (F.col("r_ts") >= F.col("l_ts") - F.expr("INTERVAL 1 HOUR")),
    )
    pairs = joined.select(
        "l_user",
        "l_ts",
        "r_ts",
        F.round(F.col("l_value") * 100).cast("long").alias("purchase_c"),
    )
    # stream-stream joins emit in APPEND mode only (matched rows flow out
    # as soon as both sides arrive; the watermark governs state eviction,
    # not emission, for inner joins)
    return spark.table(_run_to_memory(pairs, "append", sf_dir))


def _mv_latest_version(state_root: str, below: int | None = None) -> int | None:
    """Highest COMPLETE (``_SUCCESS``-marked) state version under
    ``state_root``, optionally restricted to versions strictly below a
    batch id (what a merge reads as its predecessor)."""
    if not os.path.isdir(state_root):
        return None
    best = None
    for name in os.listdir(state_root):
        if not name.startswith("v"):
            continue
        try:
            vid = int(name[1:])
        except ValueError:
            continue
        if below is not None and vid >= below:
            continue
        if not os.path.exists(os.path.join(state_root, name, "_SUCCESS")):
            continue
        if best is None or vid > best:
            best = vid
    return best


def _mv_merge_batch(state_root: str, batch_df: DataFrame, batch_id: int) -> None:
    """Idempotent algebraic MV merge for one foreachBatch epoch.

    foreachBatch is exactly-once only if the batch write is IDEMPOTENT
    keyed by batch_id: after a crash between a completed write and the
    checkpoint commit, Structured Streaming REPLAYS that batch, and a
    bare read-merge-swap double-counts it (an earlier revision had
    exactly that hazard — and a swap also has a lose-the-state window
    between the delete and the rename). The state is therefore
    VERSIONED, the Delta-commit pattern in miniature: epoch N merges
    the latest complete version BELOW N with its own partials and
    writes ``v{N}`` (overwrite). A replayed epoch rewrites the same
    version with identical content from the same inputs; prior
    versions are never touched, so a crash at ANY point leaves only a
    partial ``v{N}`` that the replay overwrites. Readers take the
    highest ``_SUCCESS``-complete version. Old versions are the vacuum
    story, same as any MVCC table (cf. sink_vacuum_retention).
    Crash-recovery is exercised deterministically (injected failure +
    restart from the same checkpoint) in tests/test_streaming.py."""
    part = batch_df.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), fx_sum("value").alias("sum_value_c")
    )
    prev_v = _mv_latest_version(state_root, below=batch_id)
    if prev_v is None:
        merged = part
    else:
        prev = batch_df.sparkSession.read.parquet(
            f"{state_root}/v{prev_v}"
        )
        merged = (
            prev.unionAll(part)
            .groupBy("event_type")
            .agg(
                F.sum("n").cast("long").alias("n"),
                F.sum("sum_value_c").cast("long").alias("sum_value_c"),
            )
        )
    merged.write.mode("overwrite").parquet(f"{state_root}/v{batch_id}")


@query(
    "stream_incremental_mv",
    oracle=f"""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           {sql_fx_sum('value')} AS sum_value_c
    FROM events
    GROUP BY event_type
    """,
    tags=("streaming", "mv", "sink"),
)
def stream_incremental_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming incremental materialized-view maintenance — the streaming
    leg of mv_incremental_refresh: each micro-batch's per-event-type
    partials MERGE into a persistent MV state via the algebraic rule
    (sum-of-counts, sum-of-sums) inside foreachBatch, exactly-once per
    epoch. After the stream drains, the MV must equal the batch aggregate
    over all events — asserted HERE by the oracle (the merge rule is
    algebraically exact: integer partial sums commute, so the 4-batch
    drain reproduces the one-shot aggregate bit-for-bit) and against the
    batch twin in tests/test_streaming.py. This is the production pattern
    for keeping a dashboard aggregate fresh without ever rescanning the
    table: state size is the GROUP-KEY space, not the stream.

    Multi-batch on purpose: events is split into 4 parquet files (once
    per sf_dir) and the SOURCE carries maxFilesPerTrigger=1 — a file-
    source (readStream) option that is silently ignored on the sink,
    where an earlier revision set it (ADVICE r5) — so availableNow
    drains in 4 micro-batches and the state+delta merge path runs on
    every batch after the bootstrap, not just the empty-state branch."""
    base = _stream_scratch("_mv")
    state_dir = f"{base}/state"
    # content-addressed cache key: path alone is NOT enough — the scale
    # probe rebuilds its fixtures in place, and a split source keyed only
    # by sf_dir would silently stream the STALE copy (found at the r8 10x
    # probe: the cached split predated the events striking, so the MV
    # summed 100k rows against a 1M-row oracle)
    sf_tag = sf_dir.strip("/").replace("/", "_")
    tag = sf_tag + "_" + _events_fingerprint(sf_dir)
    src_dir = f"/tmp/ocs_stream_src/events4_{tag}"
    if not os.path.exists(f"{src_dir}/_SUCCESS"):
        from ocs_duckdb_runner_spark.registry import vacuum_cache_siblings

        vacuum_cache_siblings(
            "/tmp/ocs_stream_src", f"events4_{sf_tag}", f"events4_{tag}"
        )
        load_table(spark, sf_dir, "events").repartition(4).write.mode(
            "overwrite"
        ).parquet(src_dir)

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        _mv_merge_batch(state_dir, batch_df, batch_id)

    # split source already carries batch-loader ts normalization, so the
    # stream schema is exactly the written footer schema
    events = (
        spark.readStream.schema(spark.read.parquet(src_dir).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    q = (
        events.writeStream.foreachBatch(merge_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", f"{base}/ckpt")
        .start()
    )
    q.awaitTermination()
    final_v = _mv_latest_version(state_dir)
    return (
        spark.read.parquet(f"{state_dir}/v{final_v}")
        .select("event_type", "n", "sum_value_c")
        .orderBy("event_type")
    )


@query(
    "stream_state_reader",
    oracle=f"""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           {sql_fx_sum('value')} AS sum_value_c
    FROM events
    GROUP BY event_type
    """,
    tags=("streaming", "statestore", "spark4"),
)
def stream_state_reader(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 State Data Source: run a stateful streaming aggregation to
    a checkpoint, then read the state store BACK as a batch DataFrame
    (spark.read.format('statestore').load(ckpt)) — the state-debugging /
    state-migration surface: inspect what a production stream believes
    without stopping it, audit skewed state keys, or bootstrap a new
    pipeline from an old one's checkpoint. The returned frame is the
    STATE, not the sink — so the oracle (the batch twin aggregate)
    proves the checkpointed state itself is exactly the batch answer,
    end-to-end through commit and recovery metadata.

    Scale shape: the state source plans one input split per state-store
    partition (shuffle partition), so a 10k-partition production
    checkpoint reads as a 10k-task scan with no shuffle — state never
    funnels through the driver."""
    ck = _stream_scratch("_state_ckpt")
    events = read_events_stream(spark, sf_dir)
    agg = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), fx_sum("value").alias("sum_value_c")
    )
    _COUNTER["n"] += 1
    # input-derived stateful width: the state source below plans one
    # input split per state partition, so the narrow checkpoint also
    # reads back in width tasks instead of 32 near-empty ones
    with _scoped_stream_shuffle(spark, sf_dir):
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(f"stream_state_src_{_COUNTER['n']}")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.read.format("statestore").load(ck).select(
        F.col("key.event_type").alias("event_type"),
        F.col("value.count").cast("long").alias("n"),
        F.col("value.sum").cast("long").alias("sum_value_c"),
    )


@query(
    "stream_observe_metrics",
    oracle=f"""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           {sql_fx_sum('value')} AS value_c,
           CAST(count(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT)
               AS n_errors,
           CAST(count(CASE WHEN value IS NULL THEN 1 END) AS BIGINT)
               AS n_value_null
    FROM events
    """,
    tags=("streaming", "observe", "monitoring"),
)
def stream_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming data-quality observation — `observe()` on a STREAMING
    frame (table_observe_metrics is the batch sibling): the counters
    ride along inside each micro-batch's execution as a CollectMetrics
    node and surface in the query progress as `observedMetrics`, so a
    production job gets row counts / error rates / null rates per batch
    WITHOUT a second aggregation over the stream. Totals here are the
    per-batch metrics SUMMED across the drain — count/fixed-point-sum/
    conditional-count are all associative integers, so the totals are
    exact regardless of how the trigger splits the input, which is what
    lets a DuckDB batch aggregate oracle the streaming path end-to-end.

    Metrics retrieval: recentProgress after the availableNow drain
    (maxFilesPerTrigger unset => the listing drains in one micro-batch,
    far inside recentProgress's 100-entry ring; a long-lived production
    job uses the push-based StreamingQueryListener instead — same
    `observedMetrics` payload, no ring limit).

    Plan at 100 TB: CollectMetrics is a map-side accumulator on the
    stream the sink was already consuming — zero extra scan, zero extra
    shuffle; the observation cost is four integer updates per row."""
    events = read_events_stream(spark, sf_dir)
    observed = events.observe(
        "dq_stream",
        F.count(F.lit(1)).alias("n_rows"),
        fx_sum("value").alias("value_c"),
        F.count(F.when(F.col("event_type") == "error", 1)).alias("n_errors"),
        F.count(F.when(F.col("value").isNull(), 1)).alias("n_value_null"),
    )
    q = (
        observed.writeStream.format("noop")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    totals = {"n_rows": 0, "value_c": 0, "n_errors": 0, "n_value_null": 0}
    for p in q.recentProgress:
        row = (p.observedMetrics or {}).get("dq_stream")
        if row is not None:
            for k in totals:
                totals[k] += row[k] or 0
    return spark.createDataFrame(
        [tuple(totals[k] for k in totals)],
        "n_rows long, value_c long, n_errors long, n_value_null long",
    )
