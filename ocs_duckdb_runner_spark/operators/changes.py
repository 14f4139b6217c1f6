"""Change-data operators: MERGE-style upsert and SCD type-2 history.

The reference never mutates data (each parquet object is queried read-only,
/root/reference/runner.cc:176-180), but any engine claiming its query surface
plus warehouse breadth needs the two canonical change-application shapes:

- **MERGE / upsert**: apply a change batch (updates + deletes + inserts) to a
  snapshot in one pass. Spark has no MERGE INTO statement without a table
  format that supports it, so the engine-level formulation IS the operator: a
  single full-outer join on the key, with the merged row decided by CASE —
  exactly the join MERGE compiles to in warehouse engines.
- **SCD2**: turn a change log (events ordered per entity) into validity
  intervals [valid_from, valid_to) — the gaps-and-islands window composition.

Both are pure DataFrame ops (one shuffle each, on the natural key), both
oracle-checked. The change batch is DERIVED deterministically from the
snapshot itself (mod-class of the key) so both engines construct identical
inputs with no side files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ocs_duckdb_runner_spark.registry import load_table, query


@query(
    "merge_upsert",
    oracle="""
    WITH changes AS (
        SELECT c_custkey AS k, 'U' AS op,
               round(c_acctbal + 100.0, 2) AS new_bal
        FROM customer WHERE c_custkey % 7 = 0
        UNION ALL
        SELECT c_custkey, 'D', NULL FROM customer WHERE c_custkey % 7 = 3
        UNION ALL
        -- halved balance in exact integer cents: round(x/2, 2) lands on
        -- true half-cent ties where the engines' rounding modes differ
        SELECT c_custkey + 1000000, 'I',
               (CAST(round(c_acctbal * 100) AS BIGINT) // 2) / 100.0
        FROM customer WHERE c_custkey % 7 = 5
    )
    SELECT coalesce(t.c_custkey, s.k) AS c_custkey,
           CASE WHEN s.op = 'U' THEN s.new_bal
                WHEN s.op = 'I' THEN s.new_bal
                ELSE round(t.c_acctbal, 2) END AS c_acctbal,
           coalesce(t.c_mktsegment, 'NEW') AS c_mktsegment,
           CASE WHEN s.op = 'U' THEN 'updated'
                WHEN s.op = 'I' THEN 'inserted'
                ELSE 'kept' END AS merge_action
    FROM customer t FULL JOIN changes s ON t.c_custkey = s.k
    WHERE s.op IS NULL OR s.op <> 'D'
    """,
    tags=("changes", "merge", "upsert"),
)
def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO as an engine primitive: snapshot FULL OUTER JOIN change
    batch on the key, merged row decided per-branch (update / delete /
    insert / keep). One hash shuffle on the key; at 100 TB the snapshot
    side is bucketed on the key (see join_bucketed) so only the (small)
    change batch shuffles — the standard CDC-apply layout. Deletes are a
    post-join filter, i.e. MERGE ... WHEN MATCHED AND op='D' THEN DELETE.

    The change batch is derived from `customer` by key mod-class:
    %7==0 → balance update, %7==3 → delete, %7==5 → insert under a new
    key — both engines build byte-identical batches from the shared view.
    """
    t = load_table(spark, sf_dir, "customer")
    upd = t.filter(F.col("c_custkey") % 7 == 0).select(
        F.col("c_custkey").alias("k"),
        F.lit("U").alias("op"),
        F.round(F.col("c_acctbal") + 100.0, 2).alias("new_bal"),
    )
    dele = t.filter(F.col("c_custkey") % 7 == 3).select(
        F.col("c_custkey").alias("k"),
        F.lit("D").alias("op"),
        F.lit(None).cast("double").alias("new_bal"),
    )
    ins = t.filter(F.col("c_custkey") % 7 == 5).select(
        (F.col("c_custkey") + 1000000).alias("k"),
        F.lit("I").alias("op"),
        (F.expr("cast(round(c_acctbal * 100) as bigint) div 2") / 100.0).alias(
            "new_bal"
        ),
    )
    changes = upd.unionAll(dele).unionAll(ins)
    merged = t.join(changes, t.c_custkey == changes.k, "full")
    return merged.filter(F.col("op").isNull() | (F.col("op") != "D")).select(
        F.coalesce(t.c_custkey, changes.k).alias("c_custkey"),
        F.when(F.col("op").isin("U", "I"), F.col("new_bal"))
        .otherwise(F.round(t.c_acctbal, 2))
        .alias("c_acctbal"),
        F.coalesce(t.c_mktsegment, F.lit("NEW")).alias("c_mktsegment"),
        F.when(F.col("op") == "U", "updated")
        .when(F.col("op") == "I", "inserted")
        .otherwise("kept")
        .alias("merge_action"),
    )


@query(
    "scd2_history",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type,
               epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id,
               lag(event_type) OVER w AS prev_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY
                     epoch_us(CAST(ts AS TIMESTAMP)), event_id)
    ), changes AS (
        SELECT user_id, event_type, us, event_id
        FROM ordered
        WHERE prev_type IS NULL OR prev_type <> event_type
    )
    SELECT user_id, event_type AS state,
           us AS valid_from_us,
           lead(us) OVER w2 AS valid_to_us,
           CAST(row_number() OVER w2 AS BIGINT) AS version
    FROM changes
    WINDOW w2 AS (PARTITION BY user_id ORDER BY us, event_id)
    """,
    tags=("changes", "scd2", "window"),
)
def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 from a change log: per user, the
    event stream is collapsed to state-transition rows (event_type change
    points — the gaps-and-islands step) and each gets a validity interval
    [valid_from, valid_to) via lead(), plus a version number. Open
    intervals (current state) carry NULL valid_to.

    Both windows share the same partitioning (user_id), so Catalyst plans
    ONE exchange and sorts once — the lag-filter-lead composition stays a
    single shuffle regardless of corpus size; at 100 TB the natural key
    partitioning means each entity's history builds independently.
    Intervals are integer epoch-µs on both engines (events.ts is parquet
    ns — see registry.load_table)."""
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts")).alias("us"),
        "event_id",
    )
    changes = (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(
            F.col("prev_type").isNull()
            | (F.col("prev_type") != F.col("event_type"))
        )
        .drop("prev_type")
    )
    return changes.select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("us").alias("valid_from_us"),
        F.lead("us").over(w).alias("valid_to_us"),
        F.row_number().over(w).cast("long").alias("version"),
    )


@query(
    "mv_incremental_refresh",
    oracle="""
    SELECT o_orderstatus,
           date_trunc('month', CAST(o_orderdate AS TIMESTAMP)) AS month,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM orders
    GROUP BY 1, 2
    """,
    tags=("mv", "incremental", "agg"),
)
def mv_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance (IVM): the revenue MV
    grouped by (status, month) is refreshed by combining the EXISTING
    materialized state with the aggregate of only the NEW batch —
    count/sum are algebraic aggregates, so refresh = group-wise addition
    of partials, never a rescan of the 100 TB base. The base/delta split
    is derived deterministically (o_orderkey mod 10) so both engines see
    identical inputs; the oracle is the full recompute, which the
    incremental result must equal EXACTLY — the correctness contract of
    every IVM system.

    Plan: delta aggregate scans ~10% of the fact; the MV state is a
    grouped frame a few rows per (status, month); the merge is a
    key-only outer-join-free unionAll + re-aggregate on the tiny MV key
    space. At scale the delta scan dominates and the base is never
    touched — which is the point."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderstatus",
        F.date_trunc("month", F.col("o_orderdate")).alias("month"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("price_c"),
    )

    def agg(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderstatus", "month").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("price_c").cast("long").alias("revenue_cents"),
        )

    mv_state = agg(o.filter(F.col("o_orderkey") % 10 != 0))
    delta = agg(o.filter(F.col("o_orderkey") % 10 == 0))
    return (
        mv_state.unionAll(delta)
        .groupBy("o_orderstatus", "month")
        .agg(
            F.sum("n_orders").cast("long").alias("n_orders"),
            F.sum("revenue_cents").cast("long").alias("revenue_cents"),
        )
    )


# AS-OF snapshot instant: midpoint of the fixture's time range (2024-01-15)
_ASOF_US = 1_705_276_800_000_000  # epoch µs of 2024-01-15 00:00:00 UTC


@query(
    "scd2_asof_snapshot",
    oracle=f"""
    WITH ordered AS (
        SELECT user_id, event_type,
               epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id,
               lag(event_type) OVER w AS prev_type
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY
                     epoch_us(CAST(ts AS TIMESTAMP)), event_id)
    ), changes AS (
        SELECT user_id, event_type, us, event_id
        FROM ordered
        WHERE prev_type IS NULL OR prev_type <> event_type
    ), hist AS (
        SELECT user_id, event_type AS state,
               us AS valid_from_us,
               lead(us) OVER w2 AS valid_to_us
        FROM changes
        WINDOW w2 AS (PARTITION BY user_id ORDER BY us, event_id)
    )
    SELECT user_id, state, valid_from_us
    FROM hist
    WHERE valid_from_us <= {_ASOF_US}
      AND (valid_to_us IS NULL OR valid_to_us > {_ASOF_US})
    """,
    tags=("changes", "scd2", "temporal"),
)
def scd2_asof_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal-table AS-OF read — the query leg scd2_history's write leg
    exists for: reconstruct every entity's state at one instant by
    selecting the validity interval containing it (valid_from ≤ t <
    valid_to, open intervals = current). This is `FOR SYSTEM_TIME AS OF`
    reduced to a filter over intervals — O(1) per entity version, no
    event replay, which is the entire point of maintaining SCD2 at
    100 TB (the alternative reconstructs state by scanning every event
    before t).

    Plan: identical single (user_id) exchange as scd2_history; the AS-OF
    gate is a map-side filter on the interval columns."""
    hist = scd2_history(spark, sf_dir)
    return hist.filter(
        (F.col("valid_from_us") <= _ASOF_US)
        & (F.col("valid_to_us").isNull() | (F.col("valid_to_us") > _ASOF_US))
    ).select("user_id", "state", "valid_from_us")
