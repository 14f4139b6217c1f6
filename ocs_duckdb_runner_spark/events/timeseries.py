"""Time-series operators beyond plain windows: gap filling (dense time
grids) and time-range window frames — the hypertable-ish surface a
monitoring/feature pipeline needs over the events table.

Timestamp discipline matches events/windows.py: events.ts is ns-precision
parquet, truncated to µs by the loader and CAST on the oracle side; range
frames are expressed over integer epoch-µs on BOTH engines so frame
membership is exact integer arithmetic, not interval semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ocs_duckdb_runner_spark.exactness import fx_sum, sql_fx_sum
from ocs_duckdb_runner_spark.registry import load_table, query


@query(
    "event_gap_fill",
    oracle=f"""
    WITH e AS (SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
                      event_type, value
               FROM events),
    b AS (SELECT min(hour) AS lo, max(hour) AS hi FROM e),
    hours AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
              FROM b),
    types AS (SELECT DISTINCT event_type FROM e),
    grid AS (SELECT hour, event_type FROM hours, types),
    c AS (SELECT hour, event_type,
                 CAST(count(*) AS BIGINT) AS n,
                 {sql_fx_sum('value')} AS sum_value_c
          FROM e GROUP BY 1, 2)
    SELECT g.hour, g.event_type,
           COALESCE(c.n, 0) AS n,
           COALESCE(c.sum_value_c, 0) AS sum_value_c
    FROM grid g LEFT JOIN c ON c.hour = g.hour AND c.event_type = g.event_type
    """,
    tags=("events", "timeseries", "gapfill"),
)
def event_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap filling: a DENSE hour × event_type grid (empty buckets emitted
    as zero rows) — what dashboards and feature windows need, and what a
    plain group-by can't produce. The grid is generated from the observed
    min/max hour (sequence + explode over a 1-row aggregate — broadcast,
    trivially small at any data scale: grid size grows with time span,
    not event count), then left-joined with the hourly aggregate."""
    e = load_table(spark, sf_dir, "events").select(
        F.date_trunc("hour", F.col("ts")).alias("hour"), "event_type", "value"
    )
    bounds = e.agg(F.min("hour").alias("lo"), F.max("hour").alias("hi"))
    hours = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 hour)")).alias("hour")
    )
    types = e.select("event_type").distinct()
    grid = hours.crossJoin(types)
    counts = e.groupBy("hour", "event_type").agg(
        F.count(F.lit(1)).alias("n"), fx_sum("value").alias("sum_value_c")
    )
    return grid.join(counts, ["hour", "event_type"], "left").select(
        "hour",
        "event_type",
        F.coalesce(F.col("n"), F.lit(0)).alias("n"),
        F.coalesce(F.col("sum_value_c"), F.lit(0)).alias("sum_value_c"),
    )


@query(
    "window_range_frame",
    oracle="""
    WITH x AS (SELECT user_id, event_id,
                      epoch_us(CAST(ts AS TIMESTAMP)) AS us,
                      CAST(round(value * 100) AS BIGINT) AS cents
               FROM events)
    SELECT user_id, event_id, us,
           CAST(count(*) OVER win AS BIGINT) AS n_1h,
           CAST(sum(cents) OVER win AS BIGINT) AS sum_c_1h
    FROM x
    WINDOW win AS (PARTITION BY user_id ORDER BY us
                   RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
    tags=("events", "timeseries", "window"),
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame: per user, events and value-cents in the
    trailing hour of each event — the sliding-by-event (not by-bucket)
    rate counter. RANGE over integer epoch-µs makes frame boundaries exact
    and peer handling (same-timestamp rows) identical in both engines;
    one shuffle on user_id, sorted within partition, single pass."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts")).alias("us"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    win = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-3_600_000_000, 0)
    )
    return e.select(
        "user_id",
        "event_id",
        "us",
        F.count(F.lit(1)).over(win).alias("n_1h"),
        F.sum("cents").over(win).alias("sum_c_1h"),
    )


@query(
    "event_funnel",
    oracle="""
    WITH per_user AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'signup'
                      THEN CAST(ts AS TIMESTAMP) END) AS first_signup,
             min(CASE WHEN event_type = 'purchase'
                      THEN CAST(ts AS TIMESTAMP) END) AS first_purchase
      FROM events GROUP BY user_id)
    SELECT CAST(count(*) AS BIGINT) AS n_users,
           CAST(count(first_signup) AS BIGINT) AS n_signed_up,
           CAST(count(CASE WHEN first_purchase > first_signup
                           THEN 1 END) AS BIGINT) AS n_converted,
           CAST(min(CASE WHEN first_purchase > first_signup
                THEN epoch_us(first_purchase) - epoch_us(first_signup) END)
                AS BIGINT) AS min_conversion_us
    FROM per_user
    """,
    tags=("events", "funnel"),
)
def event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel analysis: of users who signed up, how many purchased AFTER
    their first signup, and how fast — the conversion query every product
    analytics stack runs. One conditional-min aggregate per user (map-side
    partial, single shuffle on user_id), then a global conditional count;
    no joins, no windows. Exact µs arithmetic keeps the latency metric
    oracle-checked."""
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias(
            "first_signup"
        ),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "first_purchase"
        ),
    )
    converted = F.col("first_purchase") > F.col("first_signup")
    return per_user.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.count("first_signup").alias("n_signed_up"),
        F.count(F.when(converted, F.lit(1))).alias("n_converted"),
        F.min(
            F.when(
                converted,
                F.unix_micros(F.col("first_purchase"))
                - F.unix_micros(F.col("first_signup")),
            )
        ).alias("min_conversion_us"),
    )


@query(
    "event_cumulative_users",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             date_trunc('day', min(CAST(ts AS TIMESTAMP))) AS first_day
      FROM events GROUP BY user_id),
    per_day AS (SELECT first_day AS day, CAST(count(*) AS BIGINT) AS new_users
                FROM firsts GROUP BY first_day)
    SELECT day, new_users,
           CAST(sum(new_users) OVER (ORDER BY day
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumulative_users
    FROM per_day
    """,
    tags=("events", "timeseries", "growth"),
)
def event_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Growth accounting: new users per day (first-seen day) and the
    cumulative user count — the standard DAU/retention denominator. A
    naive per-day countDistinct over expanding windows is quadratic;
    first-seen day + running sum is two tiny aggregates and one window
    over days (days ≪ events — driver-safe at any scale)."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("day")
    )
    per_day = firsts.groupBy("day").agg(F.count(F.lit(1)).alias("new_users"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return per_day.select(
        "day", "new_users", F.sum("new_users").over(w).alias("cumulative_users")
    )


@query(
    "event_retention_cohort",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             date_trunc('hour', min(CAST(ts AS TIMESTAMP))) AS cohort
      FROM events GROUP BY user_id),
    activity AS (
      SELECT DISTINCT user_id,
             date_trunc('hour', CAST(ts AS TIMESTAMP)) AS active_hour
      FROM events)
    SELECT f.cohort,
           CAST((epoch_us(a.active_hour) - epoch_us(f.cohort))
                / 3600000000 AS BIGINT) AS hours_since,
           CAST(count(*) AS BIGINT) AS active_users
    FROM firsts f JOIN activity a ON a.user_id = f.user_id
    GROUP BY 1, 2
    """,
    tags=("events", "retention", "cohort"),
)
def event_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen hour (the
    cohort), counted in each subsequent hour they were active — the
    triangle chart behind every retention dashboard. Two aggregates (first
    touch per user; distinct user-hours) and one join on user_id; the
    distinct collapses to per-(user, hour) BEFORE the join, so the join
    input is bounded by users × active-hours, not raw events."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("hour", F.min("ts")).alias("cohort")
    )
    activity = e.select(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("active_hour")
    ).distinct()
    hours_since = (
        (F.unix_micros(F.col("active_hour")) - F.unix_micros(F.col("cohort")))
        / 3_600_000_000
    ).cast("long")
    return (
        firsts.join(activity, "user_id")
        .groupBy("cohort", hours_since.alias("hours_since"))
        .agg(F.count(F.lit(1)).alias("active_users"))
    )


@query(
    "event_interval_join",
    oracle="""
    WITH err AS (
        SELECT event_id AS error_id, user_id,
               epoch_us(CAST(ts AS TIMESTAMP)) AS eus
        FROM events WHERE event_type = 'error'
    ), pur AS (
        SELECT event_id AS purchase_id, user_id,
               epoch_us(CAST(ts AS TIMESTAMP)) AS pus
        FROM events WHERE event_type = 'purchase'
    )
    SELECT e.error_id, p.purchase_id, p.pus - e.eus AS lag_us
    FROM err e JOIN pur p
      ON e.user_id = p.user_id
     AND p.pus > e.eus AND p.pus <= e.eus + 600000000
    """,
    tags=("events", "join", "interval"),
)
def event_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join — each error event matched to the same user's purchase
    events in the following 10 minutes — via the BUCKETED equi-join
    formulation: both sides get a 10-minute time bucket, the probe side
    (errors) explodes to buckets [b, b+1] (a match within 10 min can only
    land in the error's own bucket or the next), the join is a plain hash
    equi-join on (user_id, bucket), and the exact range predicate filters
    the candidates. Each qualifying pair matches in EXACTLY one bucket —
    the purchase's — so no dedup pass is needed.

    This is the 100 TB shape for time-interval joins: a naive range-only
    join degenerates to BroadcastNestedLoop/cartesian per user, while the
    bucket key gives Catalyst a hash-partitionable equi-condition whose
    shuffle scales with the data, at the cost of a bounded 2x row
    amplification on the probe side (join_theta_range keeps the didactic
    non-equi form)."""
    bucket_us = 600_000_000  # 10 minutes in µs
    e = load_table(spark, sf_dir, "events")
    err = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        "user_id",
        F.unix_micros(F.col("ts")).alias("eus"),
    )
    pur = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user_id"),
        F.unix_micros(F.col("ts")).alias("pus"),
        # integer div, not float /: bucket boundaries must be exact
        F.expr(f"unix_micros(ts) div {bucket_us}").alias("bucket"),
    )
    b = F.expr(f"eus div {bucket_us}")
    probe = err.select(
        "error_id",
        "user_id",
        "eus",
        F.explode(F.array(b, b + 1)).alias("bucket"),
    )
    return (
        probe.join(
            pur,
            (probe.user_id == pur.p_user_id) & (probe.bucket == pur.bucket),
        )
        .filter(
            (F.col("pus") > F.col("eus"))
            & (F.col("pus") <= F.col("eus") + bucket_us)
        )
        .select("error_id", "purchase_id", (F.col("pus") - F.col("eus")).alias("lag_us"))
    )


@query(
    "event_anomaly_zscore",
    oracle="""
    WITH hc AS (
      SELECT user_id, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2),
    stats AS (
      SELECT user_id,
             CAST(count(*) AS BIGINT) AS n_hours,
             CAST(sum(n) AS BIGINT) AS s1,
             CAST(sum(n * n) AS BIGINT) AS s2
      FROM hc GROUP BY user_id)
    SELECT h.user_id, h.hour, h.n,
           (h.n - CAST(s.s1 AS DOUBLE) / s.n_hours)
             / sqrt((s.n_hours * CAST(s.s2 AS DOUBLE) - CAST(s.s1 AS DOUBLE) * s.s1)
                    / (CAST(s.n_hours AS DOUBLE) * s.n_hours)) AS zscore
    FROM hc h JOIN stats s USING (user_id)
    WHERE s.n_hours >= 3
      AND s.n_hours * s.s2 > s1 * s1
      AND (h.n - CAST(s.s1 AS DOUBLE) / s.n_hours)
          / sqrt((s.n_hours * CAST(s.s2 AS DOUBLE) - CAST(s.s1 AS DOUBLE) * s.s1)
                 / (CAST(s.n_hours AS DOUBLE) * s.n_hours)) >= 2.0
    """,
    tags=("events", "timeseries", "anomaly"),
)
def event_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user activity anomaly detection: hourly event counts vs the
    user's own hourly distribution, flagging hours >= 2 population
    z-scores above the mean — the monitoring primitive behind rate-spike
    and abuse detection.

    Exactness: the moments are integer (count, sum, sum-of-squares), so
    mean and population variance derive from exact BIGINTs through the
    identical double expressions on both engines — no stddev_samp() call,
    whose float accumulation order differs per engine/partitioning. The
    degenerate cases are excluded structurally: users with < 3 active
    hours (no meaningful distribution) and zero-variance users (every
    hour identical — z undefined).

    Plan: two hash aggregates on (user_id[, hour]) — the second reuses
    the first's partitioning — and a user-keyed equi-join of a stats
    frame that holds 3 integers per user. Shuffles carry counts, never
    events. Skew-safe: hot users produce many (user, hour) groups but
    the per-group state is one long."""
    e = load_table(spark, sf_dir, "events")
    hc = e.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(F.count(F.lit(1)).alias("n"))
    stats = hc.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.sum("n").alias("s1"),
        F.sum(F.col("n") * F.col("n")).alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n_hours")
    var = (
        F.col("n_hours") * F.col("s2").cast("double")
        - F.col("s1").cast("double") * F.col("s1")
    ) / (F.col("n_hours").cast("double") * F.col("n_hours"))
    z = (F.col("n") - mean) / F.sqrt(var)
    return (
        hc.join(stats, "user_id")
        .filter(
            (F.col("n_hours") >= 3)
            & (F.col("n_hours") * F.col("s2") > F.col("s1") * F.col("s1"))
        )
        .select("user_id", "hour", "n", z.alias("zscore"))
        .filter(F.col("zscore") >= 2.0)
    )


@query(
    "event_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events)
    SELECT event_type, next_type, CAST(count(*) AS BIGINT) AS n
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    """,
    tags=("events", "sequence", "markov"),
)
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-type transition counts (the Markov matrix of user
    behavior): for each user's time-ordered event stream, count each
    (event_type -> next event_type) step — session-path mining's basic
    statistic. Ties on ts are broken by event_id so the sequence is
    deterministic on both engines.

    Plan: ONE (user_id) exchange for the lead() window, then a partial
    (map-side) count on the tiny type x type key space — the transition
    matrix aggregate adds ~|types|^2 rows per map task, not a second
    event-sized shuffle. Per-user ordering is in-partition sort, which at
    100 TB is the same plan sessionization already pays."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
    )
    return (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "event_locf",
    oracle="""
    WITH x AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
             CASE WHEN event_type = 'purchase'
                  THEN CAST(round(value * 100) AS BIGINT) END AS pv
      FROM events)
    SELECT event_id, user_id, ts,
           last_value(pv IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS UNBOUNDED PRECEDING) AS last_purchase_c
    FROM x
    """,
    tags=("events", "timeseries", "locf"),
)
def event_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward: every event annotated with the
    user's most recent purchase amount at that moment (NULL before the
    first purchase) — the forward-fill that turns sparse observations
    into a dense feature column, the feature-engineering staple for
    sessionized training data. Amounts are integer cents (exact); order
    is (ts, event_id) so ties can't flip the carried value between
    engines.

    Plan: ONE (user_id) exchange + in-partition sort; last(ignorenulls)
    over a running frame is O(1) per row. At 100 TB this is the same
    shuffle sessionization pays — no extra pass for the fill."""
    e = load_table(spark, sf_dir, "events")
    pv = F.when(
        F.col("event_type") == "purchase",
        F.round(F.col("value") * 100).cast("long"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "event_id",
        "user_id",
        "ts",
        F.last(pv, ignorenulls=True).over(w).alias("last_purchase_c"),
    )


@query(
    "event_ewma",
    oracle="""
    WITH w AS (
        SELECT user_id, event_id, value,
               array_agg(value) OVER (
                 PARTITION BY user_id
                 ORDER BY CAST(ts AS TIMESTAMP), event_id
                 ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS vals
        FROM events
    )
    SELECT user_id, event_id,
           round(list_reduce(vals, (a, b) -> (a + b) / 2), 9) AS ewma
    FROM w
    WHERE user_id % 20 = 0
    """,
    tags=("events", "timeseries", "window"),
)
def event_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average per user (α=½, 8-event
    horizon) — the denoised activity feature behind rate limiting and
    anomaly baselines. α=½ is chosen deliberately: the recurrence
    s←(s+x)/2 is a power-of-two scaling, so every step is EXACT IEEE
    arithmetic and both engines fold the identical value sequence to the
    identical double — a recursive statistic made oracle-exact without
    fixed-point tricks. The recurrence is seeded with the window's oldest
    value (reduce semantics, mirrored on both sides).

    Plan: one (user_id) window exchange; the 8-row trailing frame rides
    the same sort; the fold is a codegen higher-order aggregate over an
    8-element array — O(1) per row, no second shuffle. The user_id%20
    output gate keeps the checked result compact without changing the
    window math (it filters AFTER the frame builds)."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-7, 0)
    )
    vals = F.collect_list("value").over(w)
    frame = e.select("user_id", "event_id", vals.alias("vals"))
    # reduce == seed with head, fold tail: aggregate(tail, head, step)
    ewma = F.aggregate(
        F.slice(F.col("vals"), 2, F.greatest(F.size("vals") - 1, F.lit(0))),
        F.element_at(F.col("vals"), 1),
        lambda acc, x: (acc + x) / 2,
    )
    return (
        frame.filter(F.col("user_id") % 20 == 0)
        .select("user_id", "event_id", F.round(ewma, 9).alias("ewma"))
    )


@query(
    "event_outlier_mad",
    oracle="""
    WITH med AS (
        SELECT user_id, median(value) AS m
        FROM events GROUP BY user_id
    ),
    dev AS (
        SELECT e.user_id, e.event_id, e.value, med.m,
               abs(e.value - med.m) AS ad
        FROM events e JOIN med USING (user_id)
    ),
    mad AS (
        SELECT user_id, median(ad) AS mad FROM dev GROUP BY user_id
    )
    SELECT d.event_id, d.user_id,
           round(d.value, 9) AS value,
           round(d.m, 9) AS user_median,
           round(m2.mad, 9) AS user_mad,
           (m2.mad > 0 AND abs(d.value - d.m) > 5 * m2.mad) AS is_outlier
    FROM dev d JOIN mad m2 USING (user_id)
    WHERE d.user_id % 50 = 0
    """,
    tags=("events", "robust-stats", "outlier"),
)
def event_outlier_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection via median absolute deviation — the
    anomaly gate that survives heavy-tailed value distributions where
    event_anomaly_zscore's mean/stddev get dragged by the outliers they
    should catch: flag |x − median| > 5·MAD per user. Exact medians on
    both engines (Spark percentile(0.5) and DuckDB median both average
    the two middle values); 9-digit rounding absorbs the interpolation's
    last-ulp.

    Plan: two grouped exact medians (each one key-only exchange on
    user_id, second over the deviations) + broadcast-sized joins back.
    At 100 TB exact per-group medians are the honest cost of robust
    stats; approx_percentile drops the second shuffle when tolerance
    allows."""
    e = load_table(spark, sf_dir, "events")
    med = e.groupBy("user_id").agg(
        F.expr("percentile(value, 0.5)").alias("m")
    )
    dev = e.join(med, "user_id").select(
        "user_id", "event_id", "value", "m",
        F.abs(F.col("value") - F.col("m")).alias("ad"),
    )
    mad = dev.groupBy("user_id").agg(
        F.expr("percentile(ad, 0.5)").alias("mad")
    )
    return (
        dev.join(mad, "user_id")
        .filter(F.col("user_id") % 50 == 0)
        .select(
            "event_id",
            "user_id",
            F.round("value", 9).alias("value"),
            F.round("m", 9).alias("user_median"),
            F.round("mad", 9).alias("user_mad"),
            (
                (F.col("mad") > 0)
                & (F.abs(F.col("value") - F.col("m")) > 5 * F.col("mad"))
            ).alias("is_outlier"),
        )
    )


_LTTB_BUCKETS = 10


@query(
    "event_downsample_lttb",
    oracle=f"""
    WITH e AS (
        SELECT user_id, event_id,
               epoch_us(CAST(ts AS TIMESTAMP)) AS x,
               CAST(round(value * 100) AS BIGINT) AS y
        FROM events
    ),
    bounds AS (
        SELECT user_id, min(x) AS mn, max(x) AS mx FROM e GROUP BY user_id
    ),
    pts AS (
        SELECT e.user_id, e.event_id, (e.x - b.mn) // 1000000 AS xs, e.y,
               CAST(least({_LTTB_BUCKETS - 1},
                    ((e.x - b.mn) * {_LTTB_BUCKETS}) // (b.mx - b.mn + 1))
                 AS BIGINT) AS bkt
        FROM e JOIN bounds b USING (user_id)
    ),
    bm AS (
        SELECT user_id, bkt, CAST(sum(xs) AS BIGINT) AS sx,
               CAST(sum(y) AS BIGINT) AS sy, CAST(count(*) AS BIGINT) AS n
        FROM pts GROUP BY user_id, bkt
    ),
    ctx AS (
        SELECT user_id, bkt, sx, sy, n,
               lag(sx) OVER w AS sxp, lag(sy) OVER w AS syp,
               lag(n) OVER w AS np,
               lead(sx) OVER w AS sxn, lead(sy) OVER w AS syn,
               lead(n) OVER w AS nn
        FROM bm WINDOW w AS (PARTITION BY user_id ORDER BY bkt)
    ),
    area AS (
        SELECT p.user_id, p.bkt, p.event_id,
               abs(CAST(c.sxp * c.nn - c.sxn * c.np AS DOUBLE)
                     * CAST(p.y * c.np - c.syp AS DOUBLE)
                   - CAST(c.sxp - p.xs * c.np AS DOUBLE)
                     * CAST(c.syn * c.np - c.syp * c.nn AS DOUBLE)) AS a
        FROM pts p JOIN ctx c ON p.user_id = c.user_id AND p.bkt = c.bkt
        WHERE c.np IS NOT NULL AND c.nn IS NOT NULL
    )
    SELECT user_id, CAST(bkt AS BIGINT) AS bkt, event_id,
           round(a, 3) AS area
    FROM (SELECT *, row_number() OVER (PARTITION BY user_id, bkt
                                       ORDER BY a DESC, event_id) AS rk
          FROM area)
    WHERE rk = 1 AND user_id % 25 = 0
    """,
    tags=("events", "timeseries", "downsample"),
)
def event_downsample_lttb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LTTB-style time-series downsampling (largest-triangle, bucket-mean
    anchors): each user's series splits into {_LTTB_BUCKETS} time buckets
    and each interior bucket keeps the ONE point maximizing the triangle
    area against the previous and next buckets' mean points — the
    shape-preserving decimation dashboards and cold-storage rollups use
    (vs naive avg/first, which flattens peaks; classic LTTB chains the
    previously SELECTED point — a sequential dependency — so the standard
    parallel variant anchors on bucket means, as here). Exactness: time
    is integer seconds-from-user-start, values integer cents, bucket
    means kept as exact (sum, n) pairs with denominators CLEARED from the
    area formula — each area is products/differences of exact sub-2^53
    integers in fixed order, so the float argmax is deterministic and
    both engines pick the same point.

    Plan: bounds + bucket means are two key-only aggregates; the
    prev/next context is a lag/lead window over ≤{_LTTB_BUCKETS} rows per
    user; argmax is one WindowGroupLimit-able rank over (user, bucket) —
    everything shuffles on user_id only."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts")).alias("x"),
        F.round(F.col("value") * 100).cast("long").alias("y"),
    )
    bounds = e.groupBy("user_id").agg(
        F.min("x").alias("mn"), F.max("x").alias("mx")
    )
    pts = e.join(bounds, "user_id").select(
        "user_id",
        "event_id",
        F.expr("(x - mn) div 1000000").alias("xs"),
        "y",
        # `div`, not floor(/): float division + floor can flip at an
        # exactly-representable integer quotient; div is true int division
        F.least(
            F.lit(_LTTB_BUCKETS - 1),
            F.expr(f"((x - mn) * {_LTTB_BUCKETS}) div (mx - mn + 1)"),
        ).cast("long").alias("bkt"),
    )
    bm = pts.groupBy("user_id", "bkt").agg(
        F.sum("xs").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.count(F.lit(1)).alias("n"),
    )
    wb = Window.partitionBy("user_id").orderBy("bkt")
    ctx = bm.select(
        "user_id",
        "bkt",
        F.lag("sx").over(wb).alias("sxp"),
        F.lag("sy").over(wb).alias("syp"),
        F.lag("n").over(wb).alias("np"),
        F.lead("sx").over(wb).alias("sxn"),
        F.lead("sy").over(wb).alias("syn"),
        F.lead("n").over(wb).alias("nn"),
    )
    j = pts.join(ctx, ["user_id", "bkt"]).filter(
        F.col("np").isNotNull() & F.col("nn").isNotNull()
    )
    area = F.abs(
        (F.col("sxp") * F.col("nn") - F.col("sxn") * F.col("np")).cast("double")
        * (F.col("y") * F.col("np") - F.col("syp")).cast("double")
        - (F.col("sxp") - F.col("xs") * F.col("np")).cast("double")
        * (F.col("syn") * F.col("np") - F.col("syp") * F.col("nn")).cast("double")
    )
    wr = Window.partitionBy("user_id", "bkt").orderBy(
        F.col("a").desc(), "event_id"
    )
    return (
        j.select("user_id", "bkt", "event_id", area.alias("a"))
        .withColumn("rk", F.row_number().over(wr))
        .filter((F.col("rk") == 1) & (F.col("user_id") % 25 == 0))
        .select("user_id", "bkt", "event_id", F.round("a", 3).alias("area"))
    )


@query(
    "event_trend_regression",
    oracle="""
    WITH e AS (
        SELECT user_id,
               epoch_us(CAST(ts AS TIMESTAMP)) AS xus,
               CAST(round(value * 100) AS BIGINT) AS y
        FROM events
    ),
    b AS (SELECT user_id, min(xus) AS mn FROM e GROUP BY user_id),
    p AS (
        SELECT e.user_id, (e.xus - b.mn) // 1000000 AS x, e.y
        FROM e JOIN b USING (user_id)
    ),
    m AS (
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx,
               CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * y) AS BIGINT) AS sxy,
               CAST(sum(x * x) AS BIGINT) AS sxx
        FROM p GROUP BY user_id
    )
    SELECT user_id, n,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / (n * sxx - sx * sx), 12) AS slope_c_per_s,
           round((CAST(sy AS DOUBLE)
                  - CAST(n * sxy - sx * sy AS DOUBLE)
                    / (n * sxx - sx * sx) * sx) / n, 9) AS intercept_c
    FROM m
    WHERE n >= 2 AND n * sxx - sx * sx > 0 AND user_id % 10 = 0
    """,
    tags=("events", "timeseries", "regression"),
)
def event_trend_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user linear trend (OLS slope/intercept of value over time) —
    the drift detector behind engagement decay and metric forecasting.
    Computed from INTEGER moments, not the builtin regr_slope: Σx, Σy,
    Σxy, Σx² over (seconds-from-user-start, cents) are exact BIGINTs at
    any partitioning/order (sub-2^63: x≤3e7 s, x²≤9e14, ×1e4 rows ≈
    1e19-safe at the declared scales via the per-user origin shift), and
    slope = (nΣxy − ΣxΣy)/(nΣxx − Σx²) is then a single double division
    of exact integers — so the regression is oracle-exact, where the
    builtin's internal running double sums are order-dependent.

    Plan: one origin-shift join (key-only aggregate + broadcast-scale
    join back) + ONE partial-aggregated moments exchange on user_id —
    the same shape at 100 TB."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("xus"),
        F.round(F.col("value") * 100).cast("long").alias("y"),
    )
    b = e.groupBy("user_id").agg(F.min("xus").alias("mn"))
    p = e.join(b, "user_id").select(
        "user_id",
        F.expr("(xus - mn) div 1000000").alias("x"),
        "y",
    )
    m = p.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = num / den
    return (
        m.filter(
            (F.col("n") >= 2) & (den > 0) & (F.col("user_id") % 10 == 0)
        )
        .select(
            "user_id",
            "n",
            F.round(slope, 12).alias("slope_c_per_s"),
            F.round(
                (F.col("sy").cast("double") - slope * F.col("sx")) / F.col("n"),
                9,
            ).alias("intercept_c"),
        )
    )


@query(
    "event_running_median",
    oracle="""
    SELECT user_id, event_id,
           round(median(value) OVER (
             PARTITION BY user_id
             ORDER BY CAST(ts AS TIMESTAMP), event_id
             ROWS BETWEEN 7 PRECEDING AND CURRENT ROW), 9) AS med8
    FROM events
    WHERE user_id % 20 = 0
    """,
    tags=("events", "timeseries", "window", "robust-stats"),
)
def event_running_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing running median (8-event frame per user) — event_ewma's
    robust sibling: the smoother that ignores spikes entirely instead of
    exponentially discounting them, the standard baseline for
    rate-limiting and health dashboards. Exact percentile over the
    window frame on both engines (both average the two middle values;
    9-digit rounding absorbs the interpolation's last-ulp).

    Plan: one (user_id) window exchange; the frame median re-sorts only
    8 values per row — O(k log k) per row with NO second shuffle. The
    user_id gate bounds checked output, not the window math."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-7, 0)
    )
    return (
        e.filter(F.col("user_id") % 20 == 0)
        .select(
            "user_id",
            "event_id",
            F.round(F.expr("percentile(value, 0.5)").over(w), 9).alias("med8"),
        )
    )


@query(
    "event_mom_growth",
    oracle="""
    WITH m AS (
        SELECT event_type,
               date_trunc('month', CAST(ts AS TIMESTAMP)) AS month,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                 AS rev_c
        FROM events GROUP BY 1, 2
    )
    SELECT event_type, month, n, rev_c,
           CAST(n - lag(n) OVER w AS BIGINT) AS n_delta,
           round((CAST(n AS DOUBLE) / lag(n) OVER w - 1) * 100, 9)
             AS n_growth_pct,
           round((CAST(rev_c AS DOUBLE) / nullif(lag(rev_c) OVER w, 0) - 1)
                 * 100, 9) AS rev_growth_pct
    FROM m
    WINDOW w AS (PARTITION BY event_type ORDER BY month)
    """,
    tags=("events", "timeseries", "reporting"),
)
def event_mom_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month growth reporting — the period-comparison shape
    every metrics dashboard runs: per (type, month) counts and exact
    revenue cents, plus deltas and growth percentages against the
    previous month (NULL for firsts, NULL-guarded zero denominators).
    Growth is one double division of exact integers, rounded on both
    sides.

    Plan: one coarse (type, month) aggregate — partial-aggregated, tiny
    key space — then a lag window over ≤ months-per-type rows. The 100 TB
    cost is the first aggregate's map-side collapse; the window is
    free."""
    e = load_table(spark, sf_dir, "events")
    m = e.groupBy(
        "event_type", F.date_trunc("month", F.col("ts")).alias("month")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.round(F.col("value") * 100).cast("long")).cast("long").alias(
            "rev_c"
        ),
    )
    w = Window.partitionBy("event_type").orderBy("month")
    return m.select(
        "event_type",
        "month",
        "n",
        "rev_c",
        (F.col("n") - F.lag("n").over(w)).cast("long").alias("n_delta"),
        F.round(
            (F.col("n").cast("double") / F.lag("n").over(w) - 1) * 100, 9
        ).alias("n_growth_pct"),
        F.round(
            (
                F.col("rev_c").cast("double")
                / F.nullif(F.lag("rev_c").over(w), F.lit(0))
                - 1
            )
            * 100,
            9,
        ).alias("rev_growth_pct"),
    )


@query(
    "event_survival_km",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               min(epoch_us(CAST(ts AS TIMESTAMP))) AS first_us,
               min(CASE WHEN event_type = 'purchase'
                        THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS buy_us,
               max(epoch_us(CAST(ts AS TIMESTAMP))) AS last_us
        FROM events GROUP BY user_id
    ),
    spells AS (
        SELECT user_id,
               CASE WHEN buy_us IS NOT NULL
                    THEN (buy_us - first_us) // 86400000000
                    ELSE (last_us - first_us) // 86400000000 END AS t_days,
               (buy_us IS NOT NULL) AS converted
        FROM per_user
    ),
    agg AS (
        SELECT t_days,
               CAST(count(*) FILTER (converted) AS BIGINT) AS d,
               CAST(count(*) AS BIGINT) AS leaving
        FROM spells GROUP BY t_days
    ),
    risk AS (
        SELECT t_days, d,
               CAST(sum(leaving) OVER (ORDER BY t_days DESC
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_at_risk
        FROM agg
    )
    SELECT t_days, d, n_at_risk,
           round(exp(sum(round(ln(CAST(n_at_risk - d AS DOUBLE) / n_at_risk),
                               12))
                     OVER (ORDER BY t_days ROWS UNBOUNDED PRECEDING)), 9)
             AS survival
    FROM risk
    WHERE d > 0 AND n_at_risk > d
    ORDER BY t_days
    """,
    tags=("events", "stats", "survival"),
)
def event_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan–Meier survival curve for time-to-first-purchase WITH
    censoring — the estimator conversion/churn analytics actually needs
    (naive conversion rates throw away every user still 'alive'): users
    who never purchase are censored at their last observed day and
    leave the risk set without counting as events. S(t) = Π(1 − dᵢ/nᵢ)
    over event days ≤ t, computed as exp of a running sum of
    ln((n−d)/n) — each factor is one ln of an exact integer ratio, the
    cumulative sum runs in the SAME deterministic day order on both
    engines (12-digit factor rounding pins the grid), so even this
    product-form estimator hash-matches.

    Plan: per-user spells = one (user_id) aggregate; the day-level risk
    table is tiny (≤ observation span); both windows order a
    constant-size frame. One fact pass at any scale."""
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    per_user = e.groupBy("user_id").agg(
        F.min(us).alias("first_us"),
        F.min(F.when(F.col("event_type") == "purchase", us)).alias("buy_us"),
        F.max(us).alias("last_us"),
    )
    spells = per_user.select(
        F.when(
            F.col("buy_us").isNotNull(),
            F.expr("(buy_us - first_us) div 86400000000"),
        )
        .otherwise(F.expr("(last_us - first_us) div 86400000000"))
        .alias("t_days"),
        F.col("buy_us").isNotNull().alias("converted"),
    )
    agg = spells.groupBy("t_days").agg(
        F.sum(F.col("converted").cast("long")).cast("long").alias("d"),
        F.count(F.lit(1)).alias("leaving"),
    )
    w_desc = Window.orderBy(F.col("t_days").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = agg.select(
        "t_days", "d", F.sum("leaving").over(w_desc).cast("long").alias("n_at_risk")
    )
    w_asc = Window.orderBy("t_days").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ln_factor = F.round(
        F.log((F.col("n_at_risk") - F.col("d")).cast("double") / F.col("n_at_risk")),
        12,
    )
    return (
        risk.select(
            "t_days",
            "d",
            "n_at_risk",
            F.round(F.exp(F.sum(ln_factor).over(w_asc)), 9).alias("survival"),
        )
        .filter((F.col("d") > 0) & (F.col("n_at_risk") > F.col("d")))
        .orderBy("t_days")
    )


@query(
    "event_cohort_ltv",
    oracle="""
    WITH firsts AS (
        SELECT user_id,
               date_trunc('week', min(CAST(ts AS TIMESTAMP))) AS cohort
        FROM events GROUP BY user_id
    ),
    rev AS (
        SELECT f.cohort,
               CAST(date_diff('week', f.cohort,
                    date_trunc('week', CAST(e.ts AS TIMESTAMP))) AS BIGINT)
                 AS age_w,
               CAST(sum(CASE WHEN e.event_type = 'purchase'
                        THEN CAST(round(e.value * 100) AS BIGINT)
                        ELSE 0 END) AS BIGINT) AS rev_c
        FROM events e JOIN firsts f USING (user_id)
        GROUP BY 1, 2
    ),
    size_ AS (
        SELECT cohort, CAST(count(*) AS BIGINT) AS n_users
        FROM firsts GROUP BY cohort
    )
    SELECT r.cohort, r.age_w, s.n_users,
           CAST(sum(r.rev_c) OVER (PARTITION BY r.cohort ORDER BY r.age_w
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_rev_c,
           round(CAST(sum(r.rev_c) OVER (PARTITION BY r.cohort
                      ORDER BY r.age_w ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                 / s.n_users, 6) AS ltv_per_user_c
    FROM rev r JOIN size_ s USING (cohort)
    ORDER BY r.cohort, r.age_w
    """,
    tags=("events", "timeseries", "cohort"),
)
def event_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves — the growth-analytics table behind
    payback-period decisions: users grouped by first-seen week, revenue
    accumulated by cohort age (weeks since joining), normalized per
    cohort user. The running cumulative is exact integer cents; LTV per
    user is one division, rounded. Complements event_retention_cohort
    (activity) with the revenue dimension.

    Plan: first-seen = one (user_id) aggregate; revenue re-keys once to
    (cohort, age) — a tiny space; the cumulative window orders ≤
    weeks-of-history rows per cohort. Two key-only shuffles total."""
    e = load_table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort")
    )
    rev = (
        e.join(firsts, "user_id")
        .groupBy(
            "cohort",
            F.floor(
                F.datediff(
                    F.date_trunc("week", F.col("ts")).cast("date"),
                    F.col("cohort").cast("date"),
                )
                / 7
            ).cast("long").alias("age_w"),
        )
        .agg(
            F.sum(
                F.when(
                    F.col("event_type") == "purchase",
                    F.round(F.col("value") * 100).cast("long"),
                ).otherwise(F.lit(0))
            ).cast("long").alias("rev_c")
        )
    )
    size_ = firsts.groupBy("cohort").agg(F.count(F.lit(1)).alias("n_users"))
    w = Window.partitionBy("cohort").orderBy("age_w").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        rev.join(size_, "cohort")
        .select(
            "cohort",
            "age_w",
            F.col("n_users").cast("long").alias("n_users"),
            F.sum("rev_c").over(w).cast("long").alias("cum_rev_c"),
            F.round(
                F.sum("rev_c").over(w).cast("double") / F.col("n_users"), 6
            ).alias("ltv_per_user_c"),
        )
        .orderBy("cohort", "age_w")
    )


@query(
    "event_peak_detection",
    oracle="""
    WITH hourly AS (
        SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1
    ),
    ctx AS (
        SELECT h, n,
               lag(n) OVER w AS prev_n,
               lead(n) OVER w AS next_n,
               avg(n) OVER (w ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
                 AS local_avg
        FROM hourly WINDOW w AS (ORDER BY h)
    )
    SELECT h, n, prev_n, next_n,
           round(CAST(n AS DOUBLE) / local_avg, 9) AS prominence
    FROM ctx
    WHERE prev_n IS NOT NULL AND next_n IS NOT NULL
      AND n > prev_n AND n > next_n
      AND CAST(n AS DOUBLE) / local_avg >= 1.2
    ORDER BY h
    """,
    tags=("events", "timeseries", "peaks"),
)
def event_peak_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak detection over the hourly activity series — strict local
    maxima (above both neighbors) with a prominence gate (≥1.2× the
    ±3-hour local mean), the alerting primitive between raw thresholds
    (noisy) and z-scores (need a distribution): a point is a peak
    because of its SHAPE. Prominence is one division of an exact count
    by a 7-term exact-integer mean — deterministic on both engines.

    Plan: the hourly rollup partial-aggregates map-side into a tiny
    series; lag/lead/centered-frame ride ONE ordered window over it.
    The series length is hours-of-history, not events — constant-ish at
    any data scale."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(F.date_trunc("hour", F.col("ts")).alias("h")).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.orderBy("h")
    wavg = Window.orderBy("h").rowsBetween(-3, 3)
    ctx = hourly.select(
        "h",
        "n",
        F.lag("n").over(w).alias("prev_n"),
        F.lead("n").over(w).alias("next_n"),
        F.avg("n").over(wavg).alias("local_avg"),
    )
    return (
        ctx.filter(
            F.col("prev_n").isNotNull()
            & F.col("next_n").isNotNull()
            & (F.col("n") > F.col("prev_n"))
            & (F.col("n") > F.col("next_n"))
            & (F.col("n").cast("double") / F.col("local_avg") >= 1.2)
        )
        .select(
            "h",
            "n",
            "prev_n",
            "next_n",
            F.round(F.col("n").cast("double") / F.col("local_avg"), 9).alias(
                "prominence"
            ),
        )
        .orderBy("h")
    )


@query(
    "event_forecast_snaive",
    oracle="""
    WITH hourly AS (
        SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1
    ),
    joined AS (
        SELECT a.h, a.n, b.n AS pred
        FROM hourly a JOIN hourly b
          ON b.h = a.h - INTERVAL 24 HOUR
    )
    SELECT CAST(count(*) AS BIGINT) AS n_backtest_points,
           CAST(sum(abs(n - pred)) AS BIGINT) AS sum_abs_err,
           round(CAST(sum(abs(n - pred)) AS DOUBLE) / count(*), 9) AS mae,
           round(CAST(sum(abs(n - pred)) AS DOUBLE) / sum(n) * 100, 9)
             AS wape_pct
    FROM joined
    """,
    tags=("events", "timeseries", "forecast"),
)
def event_forecast_snaive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive forecast BACKTEST — the baseline every forecasting
    system must beat before it earns complexity (predict each hour by
    the same hour yesterday), evaluated in-sample as MAE and WAPE. The
    self-join on h = h−24h is an equi-join on the truncated hour; errors
    are exact integer counts, the two error rates one division each —
    the whole backtest hash-matches.

    Plan: hourly rollup partial-aggregates map-side; the lag join and
    the error aggregate run over the tiny series. One fact pass."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(F.date_trunc("hour", F.col("ts")).alias("h")).agg(
        F.count(F.lit(1)).alias("n")
    )
    b = hourly.select(
        (F.col("h") + F.expr("INTERVAL 24 HOURS")).alias("h2"),
        F.col("n").alias("pred"),
    )
    joined = hourly.join(b, hourly.h == b.h2)
    err = F.abs(F.col("n") - F.col("pred"))
    return joined.agg(
        F.count(F.lit(1)).alias("n_backtest_points"),
        F.sum(err).cast("long").alias("sum_abs_err"),
        F.round(F.sum(err).cast("double") / F.count(F.lit(1)), 9).alias("mae"),
        F.round(F.sum(err).cast("double") / F.sum("n") * 100, 9).alias(
            "wape_pct"
        ),
    )


@query(
    "event_autocorr_daily",
    oracle="""
    WITH hourly AS (
        SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1
    ),
    pairs AS (
        SELECT a.n AS x, b.n AS y
        FROM hourly a JOIN hourly b ON b.h = a.h + INTERVAL 24 HOUR
    ),
    m AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
               CAST(sum(x * y) AS BIGINT) AS sxy,
               CAST(sum(x * x) AS BIGINT) AS sxx,
               CAST(sum(y * y) AS BIGINT) AS syy
        FROM pairs
    )
    SELECT n AS n_pairs,
           round(CAST(n * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                 / sqrt(CAST(n * syy - sy * sy AS DOUBLE)), 9)
             AS autocorr_24h
    FROM m
    """,
    tags=("events", "timeseries", "seasonality"),
)
def event_autocorr_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-seasonality strength: Pearson autocorrelation of the hourly
    series at lag 24 h — the single number that says whether the
    seasonal-naive baseline (event_forecast_snaive) has signal to
    exploit (≈1: strong daily cycle; ≈0: don't bother). Same integer-
    moment exactness recipe as event_trend_regression/agg_ab_welch_t:
    all five moments are exact BIGINTs, the correlation is a fixed
    IEEE sequence on them — a seasonality DIAGNOSTIC that hash-matches.

    Plan: hourly rollup map-side; the lag-24 pairing is an equi-join on
    the tiny series; moments are a 1-row aggregate."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(F.date_trunc("hour", F.col("ts")).alias("h")).agg(
        F.count(F.lit(1)).alias("n")
    )
    b = hourly.select(
        (F.col("h") - F.expr("INTERVAL 24 HOURS")).alias("h2"),
        F.col("n").alias("y"),
    )
    pairs = hourly.join(b, hourly.h == b.h2).select(
        F.col("n").alias("x"), "y"
    )
    m = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
    )
    return m.select(
        F.col("n").alias("n_pairs"),
        F.round(
            (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
            / F.sqrt((F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"))
            / F.sqrt((F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")),
            9,
        ).alias("autocorr_24h"),
    )


@query(
    "event_ks_exponential",
    oracle="""
    WITH gaps AS (
        SELECT (us - lag(us) OVER (PARTITION BY user_id
                                   ORDER BY us, event_id)) AS g
        FROM (SELECT user_id, event_id,
                     epoch_us(CAST(ts AS TIMESTAMP)) AS us FROM events)
    ),
    g2 AS (SELECT g FROM gaps WHERE g IS NOT NULL AND g > 0),
    m AS (SELECT CAST(count(*) AS BIGINT) AS n,
                 CAST(sum(g) AS BIGINT) AS s FROM g2),
    ranked AS (
        SELECT g, CAST(row_number() OVER (ORDER BY g) AS BIGINT) AS r,
               m.n, m.s
        FROM g2 CROSS JOIN m
    ),
    dev AS (
        SELECT round(greatest(
                 abs(CAST(r AS DOUBLE) / n
                     - (1 - exp(-(CAST(g AS DOUBLE) * n / s)))),
                 abs(CAST(r - 1 AS DOUBLE) / n
                     - (1 - exp(-(CAST(g AS DOUBLE) * n / s))))), 12) AS d,
               n
        FROM ranked
    )
    SELECT CAST(any_value(n) AS BIGINT) AS n_gaps,
           round(max(d), 9) AS ks_stat
    FROM dev
    """,
    tags=("events", "stats", "distribution-fit"),
)
def event_ks_exponential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kolmogorov–Smirnov goodness-of-fit of inter-arrival gaps against
    the exponential distribution — the Poisson-process check behind
    queueing models and synthetic-load validation: λ is fit as n/Σg
    (exact integer moments), and the KS statistic is the max over
    sorted gaps of |F_emp − (1−e^{−λg})| evaluated at both step edges
    (the two-sided step-function deviation). Every input to the exp is
    a ratio of exact integers; deviations are rounded to a fixed grid
    before the order-insensitive max — hash-exact.

    Plan: gaps = one (user_id) window; the global sort ranks gaps once
    (at 100 TB: bucket the CDF into quantile bins, same statistic
    within bin width); the deviation is map-side; the answer is a
    1-row max."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros(F.col("ts")).alias("us")
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    gaps = e.select((F.col("us") - F.lag("us").over(w)).alias("g")).filter(
        F.col("g").isNotNull() & (F.col("g") > 0)
    )
    m = gaps.agg(
        F.count(F.lit(1)).alias("n"), F.sum("g").cast("long").alias("s")
    )
    ranked = gaps.crossJoin(F.broadcast(m)).select(
        "g",
        F.row_number().over(Window.orderBy("g")).cast("long").alias("r"),
        "n",
        "s",
    )
    cdf = 1 - F.exp(-(F.col("g").cast("double") * F.col("n") / F.col("s")))
    d = F.round(
        F.greatest(
            F.abs(F.col("r").cast("double") / F.col("n") - cdf),
            F.abs((F.col("r") - 1).cast("double") / F.col("n") - cdf),
        ),
        12,
    )
    return ranked.select(d.alias("d"), "n").agg(
        F.max("n").cast("long").alias("n_gaps"),
        F.round(F.max("d"), 9).alias("ks_stat"),
    )


@query(
    "event_max_drawdown",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               date_trunc('day', CAST(ts AS TIMESTAMP)) AS d,
               CAST(sum(CAST(round(value * 100) AS BIGINT))
                    - 15000 * count(*) AS BIGINT) AS net_c
        FROM events GROUP BY 1, 2
    ),
    cums AS (
        SELECT event_type, d,
               sum(net_c) OVER (PARTITION BY event_type ORDER BY d
                                ROWS UNBOUNDED PRECEDING) AS cum
        FROM daily
    ),
    curve AS (
        SELECT event_type, cum,
               max(cum) OVER (PARTITION BY event_type ORDER BY d
                              ROWS UNBOUNDED PRECEDING) AS peak
        FROM cums
    )
    SELECT event_type,
           CAST(max(peak - cum) AS BIGINT) AS max_drawdown_c,
           CAST(min(cum) AS BIGINT) AS min_cum_c,
           CAST(max(cum) AS BIGINT) AS max_cum_c
    FROM curve GROUP BY event_type
    """,
    tags=("events", "timeseries", "finance"),
)
def event_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown of the cumulative net-value curve per event type
    — the risk metric for anything cumulative (P&L, credits balance,
    error budgets): the largest peak-to-trough fall, max over t of
    (running-peak − running-value). The net series is exact integer
    cents (a fixed per-event cost keeps the curve signed, so drawdowns
    exist); running sum, running max OVER the running sum, and the
    final max are all integer window/aggregate ops — hash-exact with
    no float anywhere.

    Plan: daily rollup map-side; BOTH nested windows share one
    (event_type, d-ordered) exchange; final max is key-only."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(
        (
            F.sum(F.round(F.col("value") * 100).cast("long"))
            - 15000 * F.count(F.lit(1))
        ).cast("long").alias("net_c")
    )
    w = Window.partitionBy("event_type").orderBy("d").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    curve = (
        daily.select("event_type", "d", "net_c")
        .withColumn("cum", F.sum("net_c").over(w))
        .withColumn("peak", F.max("cum").over(w))
    )
    return curve.groupBy("event_type").agg(
        F.max(F.col("peak") - F.col("cum")).cast("long").alias("max_drawdown_c"),
        F.min("cum").cast("long").alias("min_cum_c"),
        F.max("cum").cast("long").alias("max_cum_c"),
    )


@query(
    "event_entropy_rate",
    oracle="""
    WITH seq AS (
        SELECT event_type AS cur,
               lead(event_type) OVER (PARTITION BY user_id
                 ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id) AS nxt
        FROM events
    ),
    trans AS (
        SELECT cur, nxt, CAST(count(*) AS BIGINT) AS c
        FROM seq WHERE nxt IS NOT NULL GROUP BY cur, nxt
    ),
    marg AS (SELECT cur, CAST(sum(c) AS BIGINT) AS n FROM trans GROUP BY cur),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS g FROM trans),
    contrib AS (
        SELECT round(-(CAST(t.c AS DOUBLE) / o.g)
                     * ln(CAST(t.c AS DOUBLE) / m.n), 12) AS term
        FROM trans t JOIN marg m USING (cur) CROSS JOIN tot o
    )
    SELECT round(sum(term), 6) AS entropy_rate_nats,
           (SELECT CAST(count(*) AS BIGINT) FROM trans) AS n_transitions_kinds
    FROM contrib
    """,
    tags=("events", "timeseries", "markov", "entropy"),
)
def event_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entropy RATE of the behavioral Markov chain — H(next | current) =
    −Σ p(a,b)·ln p(b|a) over event_transitions' matrix: the single
    number for how PREDICTABLE user behavior is (0: deterministic flows
    worth a next-action model; ln K: uniform noise — don't bother).
    Probabilities are ratios of exact transition counts; per-cell terms
    round to the 12-digit grid before the order-insensitive sum
    (corpus_lang_entropy's recipe).

    Plan: the transition count is event_transitions' one (user_id)
    window + type²-keyed aggregate; everything after is K²-bounded."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.unix_micros(F.col("ts")), "event_id"
    )
    seq = e.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).filter(F.col("nxt").isNotNull())
    trans = seq.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("c"))
    marg = trans.groupBy("cur").agg(F.sum("c").cast("long").alias("n"))
    tot = trans.agg(F.sum("c").cast("long").alias("g"))
    # the kind count rides along as a broadcast 1-row aggregate, NOT a
    # driver-side trans.count() — an eager count here ran a full Spark
    # job at plan-construction time and recomputed the transition
    # aggregate when the returned frame executed (ADVICE r5); this is
    # the agg_chi2_independence / event_ks_exponential scalar pattern
    kinds = trans.agg(
        F.count(F.lit(1)).cast("long").alias("n_transitions_kinds")
    )
    term = F.round(
        -(F.col("c").cast("double") / F.col("g"))
        * F.log(F.col("c").cast("double") / F.col("n")),
        12,
    )
    return (
        trans.join(marg, "cur")
        .crossJoin(F.broadcast(tot))
        .select(term.alias("term"))
        .agg(F.round(F.sum("term"), 6).alias("entropy_rate_nats"))
        .crossJoin(F.broadcast(kinds))
    )


@query(
    "event_changepoint_cusum",
    oracle=f"""
    WITH daily AS (
        SELECT event_type, date_trunc('day', CAST(ts AS TIMESTAMP)) AS d,
               {sql_fx_sum('value')} AS x_c
        FROM events GROUP BY 1, 2
    ),
    stats AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(x_c) AS BIGINT) AS total_c
        FROM daily GROUP BY 1
    ),
    cusum AS (
        SELECT d.event_type, d.d,
               CAST(s.n * sum(d.x_c) OVER (
                      PARTITION BY d.event_type ORDER BY d.d)
                    - (row_number() OVER (
                         PARTITION BY d.event_type ORDER BY d.d)) * s.total_c
                    AS BIGINT) AS cusum_scaled_c
        FROM daily d JOIN stats s USING (event_type)
    )
    SELECT event_type,
           strftime((min({{'neg': -abs(cusum_scaled_c), 'd': d}})).d,
                    '%Y-%m-%d') AS change_day,
           CAST(max(abs(cusum_scaled_c)) AS BIGINT) AS max_cusum_scaled_c
    FROM cusum
    GROUP BY event_type
    ORDER BY event_type
    """,
    tags=("events", "timeseries", "changepoint"),
)
def event_changepoint_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection per event type: the day where the
    cumulative deviation of the daily value series from its global mean
    peaks — the classic mean-shift locator (monitoring: 'when did this
    metric's level change?'). The textbook statistic is
    CUSUM_t = Σ_{{i≤t}}(x_i − x̄); multiplying through by n gives
    n·Σx_i − t·total, ALL integers on the fixed-point cent grid — no
    float ever enters, so the argmax day is bit-exact cross-engine (ties
    break to the earliest day).

    Plan: one day-grain aggregate of the fact scan; per-type n/total as
    a broadcast-size join; the prefix sum is one window over ~30 rows
    per type; the argmax is a min-struct aggregate over the same."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.date_trunc("day", F.col("ts")).alias("d")
    ).agg(fx_sum("value").alias("x_c"))
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x_c").cast("long").alias("total_c"),
    )
    w = Window.partitionBy("event_type").orderBy("d")
    cusum = (
        daily.join(stats, "event_type")
        .select(
            "event_type",
            "d",
            (
                F.col("n") * F.sum("x_c").over(w)
                - F.row_number().over(w) * F.col("total_c")
            ).cast("long").alias("cusum_scaled_c"),
        )
    )
    pick = F.min(
        F.struct(
            (-F.abs(F.col("cusum_scaled_c"))).alias("neg"),
            F.col("d").alias("d"),
        )
    )
    return (
        cusum.groupBy("event_type")
        .agg(
            F.date_format(pick.getField("d"), "yyyy-MM-dd").alias("change_day"),
            F.max(F.abs(F.col("cusum_scaled_c"))).cast("long")
            .alias("max_cusum_scaled_c"),
        )
        .orderBy("event_type")
    )


@query(
    "event_seasonal_indices",
    oracle=f"""
    WITH e AS (
        SELECT event_type,
               dayofweek(CAST(ts AS TIMESTAMP)) AS dow,
               value
        FROM events
    ),
    per_dow AS (
        SELECT event_type, CAST(dow AS BIGINT) AS dow,
               {sql_fx_sum('value')} AS sum_c,
               CAST(count(*) AS BIGINT) AS n
        FROM e GROUP BY 1, 2
    ),
    overall AS (
        SELECT event_type,
               CAST(sum(sum_c) AS BIGINT) AS tot_c,
               CAST(sum(n) AS BIGINT) AS tot_n
        FROM per_dow GROUP BY 1
    )
    SELECT p.event_type, p.dow, p.n,
           round((CAST(p.sum_c AS DOUBLE) / p.n)
                 / (CAST(o.tot_c AS DOUBLE) / o.tot_n), 9) AS seasonal_index
    FROM per_dow p JOIN overall o USING (event_type)
    ORDER BY event_type, dow
    """,
    tags=("events", "timeseries", "seasonality"),
)
def event_seasonal_indices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly seasonality decomposition: per event type and day-of-week,
    the seasonal index = dow-mean / overall-mean — the multiplicative
    seasonal component a forecast divides out before trend fitting
    (capacity planning: 'Mondays run 1.3× baseline'). Both means are
    ratios of exact integers, so the index is two double divisions on
    identical operands, rounded to a shared 9-digit grid.

    Day-of-week convention: DuckDB's dayofweek() is 0=Sunday..6; Spark's
    dayofweek() is 1=Sunday..7 — the Spark side subtracts 1 so the codes
    agree.

    Plan: one (type, dow) aggregate — 5×7 groups — then a broadcast
    join against the per-type rollup. Nothing after the first exchange
    exceeds dimension size."""
    e = load_table(spark, sf_dir, "events")
    per_dow = e.groupBy(
        "event_type",
        (F.dayofweek("ts") - 1).cast("long").alias("dow"),
    ).agg(
        fx_sum("value").alias("sum_c"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    overall = per_dow.groupBy(F.col("event_type").alias("o_type")).agg(
        F.sum("sum_c").cast("long").alias("tot_c"),
        F.sum("n").cast("long").alias("tot_n"),
    )
    return (
        per_dow.join(
            F.broadcast(overall), F.col("event_type") == F.col("o_type")
        )
        .select(
            "event_type",
            "dow",
            "n",
            F.round(
                (F.col("sum_c").cast("double") / F.col("n"))
                / (F.col("tot_c").cast("double") / F.col("tot_n")),
                9,
            ).alias("seasonal_index"),
        )
        .orderBy("event_type", "dow")
    )


_SAX_SEG_DAYS = 7
# 4-symbol alphabet: equiprobable N(0,1) breakpoints (z quartiles)
_SAX_BREAKS = (-0.6745, 0.0, 0.6745)


@query(
    "event_sax_symbolic",
    oracle=f"""
    WITH daily AS (
        SELECT event_type, date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s
        FROM events GROUP BY 1, 2
    ),
    d0 AS (SELECT min(day) AS day0 FROM daily),
    stats AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS d_days,
               CAST(sum(s) AS BIGINT) AS s1,
               CAST(sum(s * s) AS BIGINT) AS s2
        FROM daily GROUP BY event_type
    ),
    segs AS (
        SELECT d.event_type,
               CAST(date_diff('day', d0.day0, d.day) AS BIGINT)
                   // {_SAX_SEG_DAYS} AS seg,
               CAST(sum(d.s) AS BIGINT) AS seg_sum,
               CAST(count(*) AS BIGINT) AS seg_days
        FROM daily d, d0 GROUP BY 1, 2
    ),
    z AS (
        SELECT g.event_type, g.seg,
               (CAST(g.seg_sum AS DOUBLE) / g.seg_days
                - CAST(t.s1 AS DOUBLE) / t.d_days)
               / sqrt((t.d_days * CAST(t.s2 AS DOUBLE)
                       - CAST(t.s1 AS DOUBLE) * CAST(t.s1 AS DOUBLE))
                      / (CAST(t.d_days AS DOUBLE)
                         * (t.d_days - 1))) AS zval
        FROM segs g JOIN stats t ON t.event_type = g.event_type
    )
    SELECT event_type,
           string_agg(CASE WHEN zval < {_SAX_BREAKS[0]} THEN 'a'
                           WHEN zval < {_SAX_BREAKS[1]} THEN 'b'
                           WHEN zval < {_SAX_BREAKS[2]} THEN 'c'
                           ELSE 'd' END, '' ORDER BY seg) AS sax_word,
           CAST(count(*) AS BIGINT) AS n_segments
    FROM z GROUP BY event_type ORDER BY event_type
    """,
    tags=("events", "timeseries", "sax"),
)
def event_sax_symbolic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX symbolization (Lin et al. 2003) of each event type's daily
    value series: z-normalize per type, PAA-average over 7-day calendar
    segments, then map each segment to one of 4 symbols at the
    equiprobable N(0,1) breakpoints — the time-series-mining primitive
    behind motif discovery and symbolic indexing. Exactness: daily totals
    are integer cents; segment means and the per-type mean are integer
    ratios (identical doubles); variance is computed from the integer
    (D, Σx, Σx²) triple cast to double — every arithmetic step then runs
    on bit-identical operands in both engines, so the z-comparisons at
    the breakpoints agree exactly. Because PAA is affine in the daily
    totals, segment z-means are computed from segment INTEGER sums — no
    order-dependent double summation anywhere. Σx² stays under 2^63
    through the 10× probe; beyond that the sum moves to decimal(38)
    (documented, same policy as fx_sum).

    Plan: one (type, day) aggregate off the scan (partial map-side), a
    5-row per-type stats frame broadcast back, and a vocabulary-sized
    ordered string_agg. At 100 TB the only data-sized exchange is the
    daily rollup, which carries integer partial sums — the raw events
    never shuffle."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "event_type", F.date_trunc("day", F.col("ts")).alias("day")
        )
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("s"))
    )
    day0 = daily.agg(F.min("day").alias("day0"))
    stats = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("d_days"),
        F.sum("s").alias("s1"),
        F.sum(F.col("s") * F.col("s")).alias("s2"),
    )
    segs = (
        daily.crossJoin(F.broadcast(day0))
        .withColumn(
            "seg",
            F.expr(f"CAST(datediff(day, day0) AS BIGINT) DIV {_SAX_SEG_DAYS}"),
        )
        .groupBy("event_type", "seg")
        .agg(
            F.sum("s").alias("seg_sum"),
            F.count(F.lit(1)).alias("seg_days"),
        )
    )
    st = stats.toDF("stype", "d_days", "s1", "s2")
    mu = F.col("s1").cast("double") / F.col("d_days")
    sigma = F.sqrt(
        (
            F.col("d_days") * F.col("s2").cast("double")
            - F.col("s1").cast("double") * F.col("s1").cast("double")
        )
        / (F.col("d_days").cast("double") * (F.col("d_days") - 1))
    )
    z = (
        segs.join(F.broadcast(st), segs.event_type == st.stype)
        .withColumn(
            "zval",
            (F.col("seg_sum").cast("double") / F.col("seg_days") - mu) / sigma,
        )
    )
    sym = (
        F.when(F.col("zval") < _SAX_BREAKS[0], F.lit("a"))
        .when(F.col("zval") < _SAX_BREAKS[1], F.lit("b"))
        .when(F.col("zval") < _SAX_BREAKS[2], F.lit("c"))
        .otherwise(F.lit("d"))
    )
    return (
        z.withColumn("sym", sym)
        .groupBy("event_type")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("seg", "sym"))),
                    lambda x: x.sym,
                ),
                "",
            ).alias("sax_word"),
            F.count(F.lit(1)).alias("n_segments"),
        )
        .orderBy("event_type")
    )


_ATTR_LOOKBACK_H = 24
_ATTR_UNIT = 1_000_000  # integer micro-credits per conversion


@query(
    "event_attribution_touch",
    oracle=f"""
    WITH conv AS (
        SELECT event_id AS conv_id, user_id, CAST(ts AS TIMESTAMP) AS cts
        FROM events WHERE event_type = 'purchase'
    ),
    touch AS (
        SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS tts, event_type
        FROM events WHERE event_type IN ('click', 'view', 'signup')
    ),
    j AS (
        SELECT c.conv_id, t.event_id, t.event_type,
               row_number() OVER (PARTITION BY c.conv_id
                                  ORDER BY t.tts, t.event_id) AS rn,
               count(*) OVER (PARTITION BY c.conv_id) AS n
        FROM conv c JOIN touch t
          ON t.user_id = c.user_id
         AND t.tts < c.cts
         AND t.tts >= c.cts - INTERVAL {_ATTR_LOOKBACK_H} HOUR
    ),
    credit AS (
        SELECT event_type,
               CASE WHEN rn = 1 THEN {_ATTR_UNIT} ELSE 0 END AS first_u,
               CASE WHEN rn = n THEN {_ATTR_UNIT} ELSE 0 END AS last_u,
               {_ATTR_UNIT} // n
                 + CASE WHEN rn = n
                        THEN {_ATTR_UNIT} % n ELSE 0 END AS linear_u
        FROM j
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_touches,
           CAST(sum(first_u) AS BIGINT) AS first_touch_credit_u,
           CAST(sum(last_u) AS BIGINT) AS last_touch_credit_u,
           CAST(sum(linear_u) AS BIGINT) AS linear_credit_u
    FROM credit GROUP BY event_type ORDER BY event_type
    """,
    tags=("events", "attribution"),
)
def event_attribution_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch conversion attribution — every purchase distributes 1e6
    integer micro-credits over the same user's click/view/signup touches
    in the preceding 24 h, under the three standard models at once:
    first-touch, last-touch, and linear (floor split with the remainder
    pinned to the LAST touch, so each conversion's credits sum to exactly
    1e6 — integer arithmetic end to end, no float shares to drift).
    Report: credit totals by touch channel.

    Plan: conversions and touches are two pushed-down scans of the same
    source; the touch window is an EQUI-join on user_id with the time
    range as a post-join filter — per-user touch lists bound the fan-out,
    the join never becomes a time-range cross product. Ranking within
    each conversion is one (conv_id)-keyed window; the final rollup is
    channel-sized key-only aggregation. At 100 TB the user-keyed join is
    the same shape as event_sessionize and salts the same way if one
    user is pathological."""
    ev = load_table(spark, sf_dir, "events")
    conv = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("conv_id"),
        F.col("user_id").alias("cuser"),
        F.col("ts").alias("cts"),
    )
    touch = ev.filter(
        F.col("event_type").isin("click", "view", "signup")
    ).select("event_id", "user_id", F.col("ts").alias("tts"), "event_type")
    j = (
        conv.join(touch, conv.cuser == touch.user_id)
        .filter(
            (F.col("tts") < F.col("cts"))
            & (
                F.col("tts")
                >= F.col("cts") - F.expr(f"INTERVAL {_ATTR_LOOKBACK_H} HOURS")
            )
        )
        .select("conv_id", "event_id", "event_type", "tts")
    )
    w = Window.partitionBy("conv_id")
    ranked = j.withColumn(
        "rn",
        F.row_number().over(w.orderBy(F.col("tts").asc(), F.col("event_id").asc())),
    ).withColumn("n", F.count(F.lit(1)).over(w))
    unit = F.lit(_ATTR_UNIT)
    credit = ranked.select(
        "event_type",
        F.when(F.col("rn") == 1, unit).otherwise(F.lit(0)).alias("first_u"),
        F.when(F.col("rn") == F.col("n"), unit).otherwise(F.lit(0)).alias("last_u"),
        (
            F.expr(f"{_ATTR_UNIT} DIV n")
            + F.when(
                F.col("rn") == F.col("n"), F.expr(f"{_ATTR_UNIT} % n")
            ).otherwise(F.lit(0))
        ).alias("linear_u"),
    )
    return (
        credit.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.sum("first_u").cast("long").alias("first_touch_credit_u"),
            F.sum("last_u").cast("long").alias("last_touch_credit_u"),
            F.sum("linear_u").cast("long").alias("linear_credit_u"),
        )
        .orderBy("event_type")
    )


@query(
    "event_active_users_rolling",
    oracle="""
    WITH user_days AS (
        SELECT DISTINCT user_id,
               CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day
        FROM events
    ),
    days AS (SELECT DISTINCT day FROM user_days),
    dau AS (
        SELECT day, CAST(count(*) AS BIGINT) AS dau FROM user_days GROUP BY day
    ),
    wau AS (
        SELECT d.day, CAST(count(DISTINCT u.user_id) AS BIGINT) AS wau
        FROM days d JOIN user_days u
          ON u.day BETWEEN d.day - 6 AND d.day
        GROUP BY d.day
    )
    SELECT CAST(dau.day AS TIMESTAMP) AS day, dau.dau AS dau, wau.wau AS wau,
           CAST((dau.dau * 1000000) // wau.wau AS BIGINT) AS stickiness_micro
    FROM dau JOIN wau ON wau.day = dau.day
    ORDER BY day
    """,
    tags=("events", "engagement"),
)
def event_active_users_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-7-day WAU / stickiness (DAU÷WAU on the integer
    micro grid) per calendar day — the engagement dashboard every
    product team runs. The scale trick is the FIRST aggregate: the raw
    event stream collapses to distinct (user, day) pairs before any
    window math, so the rolling-distinct problem operates on at most
    users×days rows, not events. The trailing-window distinct is then a
    bounded-fanout join of user-days against the (tiny, broadcast)
    day spine — each user-day lands in at most 7 window rows.

    At 100 TB: events→user_days is one (user, day)-keyed map-side
    distinct (the only corpus-sized exchange); everything after is
    user_days-sized. The alternative — approx_count_distinct over a
    RANGE window — trades exactness for one less join and is the sketch
    variant agg_approx_distinct demonstrates."""
    ev = load_table(spark, sf_dir, "events")
    user_days = ev.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    days = user_days.select("day").distinct()
    dau = user_days.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    d = days.toDF("wday")
    wau = (
        user_days.join(
            F.broadcast(d),
            (F.col("day") >= F.date_sub(F.col("wday"), 6))
            & (F.col("day") <= F.col("wday")),
        )
        .groupBy("wday")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    return (
        dau.join(wau, dau.day == wau.wday)
        .select(
            # DATE round-trips differently through the two engines'
            # canonical forms; a UTC midnight timestamp is type-stable
            F.col("day").cast("timestamp").alias("day"),
            "dau",
            "wau",
            F.expr("dau * 1000000 DIV wau").alias("stickiness_micro"),
        )
        .orderBy("day")
    )


@query(
    "event_time_weighted_avg",
    oracle="""
    WITH s AS (
        SELECT event_type,
               CAST(round(value * 100) AS BIGINT) AS cents,
               epoch_us(CAST(ts AS TIMESTAMP)) AS us,
               lead(epoch_us(CAST(ts AS TIMESTAMP)))
                   OVER (PARTITION BY event_type
                         ORDER BY epoch_us(CAST(ts AS TIMESTAMP)), event_id)
                   AS next_us
        FROM events
    ),
    held AS (SELECT event_type, cents, next_us - us AS dur_us
             FROM s WHERE next_us IS NOT NULL)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_intervals,
           CAST(sum(dur_us) AS BIGINT) AS span_us,
           round(CAST(sum(CAST(cents AS HUGEINT) * dur_us) AS DOUBLE)
                 / CAST(sum(dur_us) AS DOUBLE) / 100, 9) AS twap
    FROM held GROUP BY event_type ORDER BY event_type
    """,
    tags=("events", "timeseries", "twap"),
)
def event_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per event type — the TWAP / LOCF-mean
    every metrics store exposes (TimescaleDB time_weight, kdb twap):
    each observation holds until the next one, so its weight is the µs
    gap to the successor, not 1. An arithmetic mean over irregular
    samples over-weights bursts; the time-weighted form is the honest
    "average level" of a step function.

    Exactness: weights are exact integer µs (lead() over the per-type
    timeline, event_id tie-break), values exact cents; Σcents·dur widens
    to 128-bit integers BEFORE summing (decimal(38,0) / HUGEINT — cents
    ~1e4 × gaps ~1e11 µs × 1e8 rows passes BIGINT range), and the final
    division is one identical double op in both engines.

    Plan: one shuffle on event_type for the lead() window, then a
    partial-aggregated sum on the same key — the sort is per-type within
    partitions, never global. At 100 TB the type key is low-cardinality
    but each group is independent; a per-(type, day) tiling with
    boundary-gap stitching is the standard refinement when a single
    type's timeline outgrows an executor (same pattern the sessionize
    operators document)."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("us", "event_id")
    s = e.select(
        "event_type",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        F.unix_micros(F.col("ts")).alias("us"),
    ).withColumn("next_us", F.lead("us").over(w))
    held = s.filter(F.col("next_us").isNotNull()).select(
        "event_type",
        "cents",
        (F.col("next_us") - F.col("us")).alias("dur_us"),
    )
    return (
        held.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.sum("dur_us").cast("long").alias("span_us"),
            F.round(
                F.sum(
                    (F.col("cents") * F.col("dur_us")).cast("decimal(38,0)")
                ).cast("double")
                / F.sum("dur_us").cast("double")
                / 100,
                9,
            ).alias("twap"),
        )
        .orderBy("event_type")
    )


def _holt_coeffs(k: int) -> tuple[int, list[int]]:
    """Closed-form Holt (alpha=beta=1/2) one-step forecast over a k-point
    window as ONE exact dyadic linear combination: unroll l' = (x+l+b)/2,
    b' = ((l'-l)+b)/2 symbolically (init l=x1, b=x1-x0) and clear the
    power-of-two denominator. Returns (den, integer coefficients over
    x0..x_{k-1}); coefficients sum to den (level-invariance) and
    reproduce exact linear extrapolation on a linear series — both
    properties pinned in tests."""
    from fractions import Fraction as Fr
    from math import lcm

    level = [Fr(0)] * k
    trend = [Fr(0)] * k
    level[1] = Fr(1)
    trend[0], trend[1] = Fr(-1), Fr(1)
    for t in range(2, k):
        lp = [(level[i] + trend[i]) / 2 for i in range(k)]
        lp[t] += Fr(1, 2)
        trend = [(lp[i] - level[i]) / 2 + trend[i] / 2 for i in range(k)]
        level = lp
    f = [level[i] + trend[i] for i in range(k)]
    den = lcm(*[c.denominator for c in f])
    return den, [int(c * den) for c in f]


_HOLT_W = 8  # trailing window (same horizon as event_ewma)
_HOLT_TABLE = {k: _holt_coeffs(k) for k in range(2, _HOLT_W + 1)}


def _holt_case(vals: str, spark_dialect: bool) -> str:
    """SQL CASE for the k-point dyadic combination of the cents array
    `vals`, presented back in value units as one identical double
    division. Window of 1 -> naive carry-forward. The only dialect split
    is 1-based element access: Spark's bracket operator is 0-based (and
    ANSI-throws out of range), so it uses element_at; DuckDB brackets
    are 1-based."""
    if spark_dialect:
        def at(i: int) -> str:
            return f"element_at({vals}, {i})"
    else:
        def at(i: int) -> str:
            return f"{vals}[{i}]"

    size = "size" if spark_dialect else "len"
    arms = []
    for k in range(2, _HOLT_W + 1):
        den, cs = _HOLT_TABLE[k]
        comb = " + ".join(f"({c}) * {at(i + 1)}" for i, c in enumerate(cs))
        arms.append(f"WHEN {k} THEN CAST({comb} AS DOUBLE) / {den}.0")
    return (
        f"CASE {size}({vals}) WHEN 1 THEN CAST({at(1)} AS DOUBLE) "
        + " ".join(arms)
        + " END"
    )


@query(
    "event_holt_forecast",
    oracle=f"""
    WITH w AS (
        SELECT user_id, event_id,
               array_agg(CAST(round(value * 100) AS BIGINT)) OVER (
                 PARTITION BY user_id
                 ORDER BY CAST(ts AS TIMESTAMP), event_id
                 ROWS BETWEEN {_HOLT_W - 1} PRECEDING AND CURRENT ROW) AS vals
        FROM events
    )
    SELECT user_id, event_id,
           {_holt_case('vals', spark_dialect=False)} AS holt_forecast_c
    FROM w WHERE user_id % 20 = 0
    """,
    tags=("events", "timeseries", "forecast", "window"),
)
def event_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double-exponential-smoothing one-step forecast per user
    (alpha=beta=1/2, 8-event trailing horizon) — event_ewma's sibling
    with a TREND state, the baseline for drifting series where EWMA
    systematically lags. The coupled (level, trend) recurrence is
    unrolled SYMBOLICALLY at import into one dyadic linear combination
    per window size (_holt_coeffs), so a recursive two-state smoother
    becomes a single exact integer dot product over the cents window —
    no per-row recursion, no float accumulation. The forecast is emitted
    in CENTS as comb/2^m — a dyadic rational below 2^53, so the double
    is EXACT on both engines with no rounding step anywhere (a round(x,9)
    presentation hit exact decimal ties where Spark HALF_UP and DuckDB
    half-even disagree — measured on this very query).

    Plan: identical to event_ewma — one (user_id) window exchange, the
    8-element trailing array rides the sort, and the combination is a
    constant-folded CASE over array literals (whole-stage codegen).
    O(1) per row at any scale; the %20 output gate filters after the
    frame builds."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(_HOLT_W - 1), 0)
    )
    cents = F.round(F.col("value") * 100).cast("long")
    frame = e.select(
        "user_id",
        "event_id",
        F.collect_list(cents).over(w).alias("vals"),
    )
    return frame.filter(F.col("user_id") % 20 == 0).select(
        "user_id",
        "event_id",
        F.expr(_holt_case("vals", spark_dialect=True)).alias("holt_forecast_c"),
    )


@query(
    "event_pattern_vshape",
    oracle="""
    WITH s AS (
        SELECT user_id,
               CAST(round(value * 100) AS BIGINT) AS v,
               lag(CAST(round(value * 100) AS BIGINT), 2)
                   OVER w AS v2,
               lag(CAST(round(value * 100) AS BIGINT), 1)
                   OVER w AS v1
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_points,
           CAST(sum(CASE WHEN v2 > v1 AND v1 < v THEN 1 ELSE 0 END)
                AS BIGINT) AS n_vshapes
    FROM s GROUP BY user_id
    HAVING sum(CASE WHEN v2 > v1 AND v1 < v THEN 1 ELSE 0 END) >= 3
    """,
    tags=("events", "pattern", "sequence"),
)
def event_pattern_vshape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential pattern detection (MATCH_RECOGNIZE-lite): count strict
    V-shapes (down, then up: v[t-2] > v[t-1] < v[t]) in each user's
    value sequence and keep users with >= 3 — the dip-and-recover motif
    behind bounce detection, cart-abandon-return, and sensor glitch
    screens. Spark has no MATCH_RECOGNIZE; two lag() taps over one
    ordered window express the fixed-length pattern exactly, and values
    compare on the integer cent grid so both engines see identical
    strict inequalities (ties break the pattern identically).

    Plan: ONE (user_id) window exchange — per-user partitions, never a
    global sort — then the same partitioning feeds the count aggregate;
    at 100 TB this is the bounded-per-key window every sessionization
    query already pays, with two extra lag registers."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    v = F.round(F.col("value") * 100).cast("long")
    s = e.select(
        "user_id",
        v.alias("v"),
        F.lag(v, 2).over(w).alias("v2"),
        F.lag(v, 1).over(w).alias("v1"),
    )
    hit = F.when(
        (F.col("v2") > F.col("v1")) & (F.col("v1") < F.col("v")), 1
    ).otherwise(0)
    return (
        s.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.sum(hit).cast("long").alias("n_vshapes"),
        )
        .filter(F.col("n_vshapes") >= 3)
    )


@query(
    "event_spc_control_chart",
    oracle="""
    WITH daily AS (
        SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
                   AS day,
               CAST(count(*) AS BIGINT) AS n
        FROM events GROUP BY 1),
    lim AS (
        SELECT CAST(count(*) AS BIGINT) AS k,
               CAST(sum(n) AS BIGINT) AS s1,
               CAST(sum(n * n) AS BIGINT) AS s2
        FROM daily),
    z AS (
        SELECT d.day, d.n,
               (d.n - CAST(l.s1 AS DOUBLE) / l.k)
               / sqrt((l.k * CAST(l.s2 AS DOUBLE) - CAST(l.s1 AS DOUBLE) * l.s1)
                      / (CAST(l.k AS DOUBLE) * (l.k - 1))) AS zz
        FROM daily d CROSS JOIN lim l),
    runs AS (
        SELECT day, n, zz,
               CAST(sum(CASE WHEN zz > 0 THEN 0 ELSE 1 END)
                    OVER (ORDER BY day
                          ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)
                    AS BIGINT) AS brk8
        FROM z)
    SELECT day, n,
           round(zz, 9) AS zscore,
           abs(zz) > 3 AS rule1_beyond_3sigma,
           (brk8 = 0 AND row_number() OVER (ORDER BY day) >= 8)
               AS rule4_run8_above
    FROM runs
    ORDER BY day
    """,
    tags=("events", "spc", "anomaly"),
)
def event_spc_control_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical-process-control chart over the daily event rate — the
    ops-monitoring classic: z-score each day against the whole-series
    mean/σ (Shewhart), flag Rule 1 (beyond 3σ) and the Western-Electric
    Rule 4 run test (8 consecutive points above the centerline — drift
    a 3σ gate never fires on). Moments are exact integer (k, Σn, Σn²)
    so the z denominators are identical doubles per engine (the
    embed_norm_outliers lesson applied pre-emptively); the run test is
    an integer window count.

    Plan: the daily rollup is one hash aggregate (map-side combined);
    limits are a 1-row broadcast; the z pass and the 8-point run window
    ride one tiny day-keyed frame (hundreds of rows per YEAR of data —
    the window is over the AGGREGATE, never the events)."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.groupBy(
            F.date_trunc("day", F.col("ts").cast("timestamp")).alias("day")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    lim = daily.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").cast("long").alias("s1"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("s2"),
    )
    z = daily.crossJoin(F.broadcast(lim)).withColumn(
        "zz",
        (F.col("n") - F.col("s1").cast("double") / F.col("k"))
        / F.sqrt(
            (F.col("k") * F.col("s2").cast("double")
             - F.col("s1").cast("double") * F.col("s1"))
            / (F.col("k").cast("double") * (F.col("k") - 1))
        ),
    )
    w8 = Window.orderBy("day").rowsBetween(-7, 0)
    wr = Window.orderBy("day")
    runs = z.withColumn(
        "brk8",
        F.sum(F.when(F.col("zz") > 0, 0).otherwise(1)).over(w8),
    ).withColumn("rn", F.row_number().over(wr))
    return runs.select(
        "day",
        "n",
        F.round("zz", 9).alias("zscore"),
        (F.abs(F.col("zz")) > 3).alias("rule1_beyond_3sigma"),
        ((F.col("brk8") == 0) & (F.col("rn") >= 8)).alias("rule4_run8_above"),
    ).orderBy("day")


_SLO_TARGET_PPM = 10_000  # SLO: <= 1% of events may be errors (ppm scale)


@query(
    "event_error_budget_burn",
    oracle=f"""
    WITH hourly AS (
        SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                    AS BIGINT) AS errs
        FROM events GROUP BY 1),
    rolled AS (
        SELECT h, n, errs,
               CAST(sum(n) OVER w6 AS BIGINT) AS n6,
               CAST(sum(errs) OVER w6 AS BIGINT) AS e6
        FROM hourly
        WINDOW w6 AS (ORDER BY h ROWS BETWEEN 5 PRECEDING AND CURRENT ROW))
    SELECT h AS hour, n, errs,
           round(CAST(e6 AS DOUBLE) * 1000000 / n6, 6) AS rate_ppm_6h,
           round(CAST(e6 AS DOUBLE) * 1000000 / n6 / {_SLO_TARGET_PPM}, 6)
               AS burn_rate_6h,
           e6 * 1000000 > CAST({_SLO_TARGET_PPM} AS BIGINT) * n6 * 2
               AS page_fast_burn
    FROM rolled ORDER BY hour
    """,
    tags=("events", "slo", "sre"),
)
def event_error_budget_burn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLO error-budget burn rate — the multiwindow-burn-alert input SRE
    runbooks page on: hourly error share over a trailing 6-hour window,
    expressed as a multiple of the 1% SLO (burn rate 1.0 = budget spent
    exactly on schedule; the page gate fires at 2x). The paging
    comparison is INTEGER cross-multiplied (e6*1e6 > slo*n6*2), so the
    alert boundary cannot drift between engines even when the reported
    double rate rounds.

    Plan: one hash aggregate onto hour keys (map-side combined), one
    6-row trailing window over the tiny hourly frame — the events table
    is touched exactly once, and everything after is calendar-bounded."""
    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.groupBy(
            F.date_trunc("hour", F.col("ts").cast("timestamp")).alias("h")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("event_type") == "error", 1).otherwise(0)
            ).cast("long").alias("errs"),
        )
    )
    w6 = Window.orderBy("h").rowsBetween(-5, 0)
    rolled = hourly.select(
        "h",
        "n",
        "errs",
        F.sum("n").over(w6).cast("long").alias("n6"),
        F.sum("errs").over(w6).cast("long").alias("e6"),
    )
    rate = F.col("e6").cast("double") * 1000000 / F.col("n6")
    return rolled.select(
        F.col("h").alias("hour"),
        "n",
        "errs",
        F.round(rate, 6).alias("rate_ppm_6h"),
        F.round(rate / _SLO_TARGET_PPM, 6).alias("burn_rate_6h"),
        (
            F.col("e6") * 1000000
            > F.lit(_SLO_TARGET_PPM).cast("long") * F.col("n6") * 2
        ).alias("page_fast_burn"),
    ).orderBy("hour")


_DID_CUTOVER = "2024-01-16 00:00:00"  # treatment ships mid-series


@query(
    "event_did_incrementality",
    oracle=f"""
    WITH cells AS (
        SELECT CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)),
                                        1, 8)) AS BIGINT) % 2 AS arm,
               CASE WHEN CAST(ts AS TIMESTAMP)
                         >= TIMESTAMP '{_DID_CUTOVER}'
                    THEN 1 ELSE 0 END AS post,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                   AS s_c
        FROM events WHERE event_type = 'purchase'
        GROUP BY 1, 2
    ),
    m AS (
        SELECT arm, post, n, s_c,
               CAST(s_c AS DOUBLE) / n AS mean_c
        FROM cells
    )
    SELECT t1.mean_c AS treat_post, t0.mean_c AS treat_pre,
           c1.mean_c AS ctrl_post, c0.mean_c AS ctrl_pre,
           t1.n + t0.n + c1.n + c0.n AS n_total,
           round((t1.mean_c - t0.mean_c) - (c1.mean_c - c0.mean_c), 9)
               AS did_estimate_c
    FROM m t1, m t0, m c1, m c0
    WHERE t1.arm = 1 AND t1.post = 1 AND t0.arm = 1 AND t0.post = 0
      AND c1.arm = 0 AND c1.post = 1 AND c0.arm = 0 AND c0.post = 0
    """,
    tags=("events", "causal", "ab-test"),
)
def event_did_incrementality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences incrementality estimate — the causal
    workhorse when a clean A/B is impossible: users hash into
    treatment/control arms (same sticky md5 rule as
    sample_ab_assignment), a mid-series cutover splits pre/post, and
    the treatment effect on purchase value is (ΔT) − (ΔC) — the
    parallel-trends-adjusted lift that subtracts seasonality both arms
    share. All four cell means come from exact integer (n, Σcents)
    pairs, so the estimate is one deterministic double expression.

    Plan: ONE filtered scan folds into a 4-cell hash aggregate
    (map-side combined — the shuffle carries 4 rows per partition);
    the DiD combination is a driver-free 4-way join of a 4-row frame.
    At 100 TB this is a single linear pass, the cheapest causal
    readout there is."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    arm = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
        ).cast("long")
        % 2
    )
    post = F.when(
        F.col("ts").cast("timestamp") >= F.lit(_DID_CUTOVER).cast("timestamp"),
        1,
    ).otherwise(0)
    cells = (
        e.select(arm.alias("arm"), post.alias("post"), "value")
        .groupBy("arm", "post")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long"))
            .cast("long")
            .alias("s_c"),
        )
        .withColumn("mean_c", F.col("s_c").cast("double") / F.col("n"))
    )

    def cell(a: int, p: int, name: str):
        return cells.filter(
            (F.col("arm") == a) & (F.col("post") == p)
        ).select(
            F.col("mean_c").alias(f"{name}"), F.col("n").alias(f"n_{name}")
        )

    t1, t0 = cell(1, 1, "treat_post"), cell(1, 0, "treat_pre")
    c1, c0 = cell(0, 1, "ctrl_post"), cell(0, 0, "ctrl_pre")
    return (
        t1.crossJoin(t0)
        .crossJoin(c1)
        .crossJoin(c0)
        .select(
            "treat_post",
            "treat_pre",
            "ctrl_post",
            "ctrl_pre",
            (
                F.col("n_treat_post")
                + F.col("n_treat_pre")
                + F.col("n_ctrl_post")
                + F.col("n_ctrl_pre")
            ).alias("n_total"),
            F.round(
                (F.col("treat_post") - F.col("treat_pre"))
                - (F.col("ctrl_post") - F.col("ctrl_pre")),
                9,
            ).alias("did_estimate_c"),
        )
    )


# SPRT parameters: H0 p=0.18 vs H1 p=0.22 purchase share, alpha=beta=0.05.
# The per-observation log-likelihood increments are CONSTANTS, folded to
# the integer micro-nat grid once here and embedded as literals on both
# engines — no runtime ln() can drift.
import math as _math

_SPRT_P0, _SPRT_P1 = 0.18, 0.22
_SPRT_C1_U = round(_math.log(_SPRT_P1 / _SPRT_P0) * 1_000_000)  # success
_SPRT_C2_U = round(
    _math.log((1 - _SPRT_P1) / (1 - _SPRT_P0)) * 1_000_000
)  # failure
_SPRT_BOUND_U = round(_math.log(19.0) * 1_000_000)  # ln((1-b)/a), a=b=.05


@query(
    "event_sprt_sequential",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
                   AS day,
               CAST(count(*) AS BIGINT) AS trials,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS successes
        FROM events
        WHERE CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                   AS BIGINT) % 2 = 1
        GROUP BY 1),
    llr AS (
        SELECT day, trials, successes,
               CAST(sum(successes * ({_SPRT_C1_U})
                        + (trials - successes) * ({_SPRT_C2_U}))
                    OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS cum_llr_u
        FROM daily)
    SELECT day, trials, successes, cum_llr_u,
           CASE WHEN cum_llr_u >= {_SPRT_BOUND_U} THEN 'accept_h1'
                WHEN cum_llr_u <= -{_SPRT_BOUND_U} THEN 'accept_h0'
                ELSE 'continue' END AS decision
    FROM llr ORDER BY day
    """,
    tags=("events", "sequential-test", "ab-test"),
)
def event_sprt_sequential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential probability ratio test over the treatment arm's daily
    purchase share — Wald's SPRT, the always-valid alternative to the
    fixed-horizon t-test that lets an experiment STOP the day the
    evidence clears the bound instead of waiting out the calendar.
    Cumulative LLR = Σ (s·ln(p1/p0) + f·ln(q1/q0)); both per-observation
    increments are constants, folded to the integer micro-nat grid at
    DEFINITION time and embedded as literals in both engines, so the
    running sum is pure integer arithmetic and the accept/continue
    decision boundaries cannot drift cross-engine.

    Plan: one filtered scan → daily (trials, successes) hash aggregate
    (map-side combined), one cumulative window over the tiny day frame —
    the sequential test costs the same linear pass as any daily rollup."""
    e = load_table(spark, sf_dir, "events")
    arm = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
        ).cast("long")
        % 2
    )
    daily = (
        e.filter(arm == 1)
        .groupBy(
            F.date_trunc("day", F.col("ts").cast("timestamp")).alias("day")
        )
        .agg(
            F.count(F.lit(1)).alias("trials"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).cast("long").alias("successes"),
        )
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    llr = daily.select(
        "day",
        "trials",
        "successes",
        F.sum(
            F.col("successes") * F.lit(_SPRT_C1_U)
            + (F.col("trials") - F.col("successes")) * F.lit(_SPRT_C2_U)
        ).over(w).cast("long").alias("cum_llr_u"),
    )
    return llr.select(
        "day",
        "trials",
        "successes",
        "cum_llr_u",
        F.when(F.col("cum_llr_u") >= _SPRT_BOUND_U, "accept_h1")
        .when(F.col("cum_llr_u") <= -_SPRT_BOUND_U, "accept_h0")
        .otherwise("continue")
        .alias("decision"),
    ).orderBy("day")


_BOT_MIN_EVENTS = 40  # volume gate
_BOT_CV2_PPM = 200_000  # flag if var/mean^2 of gaps < 0.2 (too regular)


@query(
    "event_bot_regularity",
    oracle=f"""
    WITH g AS (
        SELECT user_id,
               epoch_us(CAST(ts AS TIMESTAMP))
               - lag(epoch_us(CAST(ts AS TIMESTAMP)))
                 OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap
        FROM events),
    m AS (
        SELECT user_id,
               CAST(count(*) AS BIGINT) AS n_gaps,
               CAST(sum(gap) AS BIGINT) AS s1,
               CAST(sum(CAST(gap AS HUGEINT) * gap) AS DOUBLE) AS s2
        FROM g WHERE gap IS NOT NULL
        GROUP BY user_id
        HAVING count(*) >= {_BOT_MIN_EVENTS})
    SELECT user_id, n_gaps,
           CAST(s1 // n_gaps AS BIGINT) AS mean_gap_us,
           round((CAST(n_gaps AS DOUBLE) * s2
                  - CAST(s1 AS DOUBLE) * s1)
                 / (CAST(s1 AS DOUBLE) * s1), 9) AS cv2,
           (CAST(n_gaps AS DOUBLE) * s2 - CAST(s1 AS DOUBLE) * s1)
               * 1000000 < {_BOT_CV2_PPM} * CAST(s1 AS DOUBLE) * s1
               AS is_bot_like
    FROM m ORDER BY user_id
    """,
    tags=("events", "bot", "curation"),
)
def event_bot_regularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bot/automation detection by inter-event regularity — the traffic-
    filtering stage every behavioral dataset (and every pretraining
    pipeline ingesting logs) runs: humans have bursty, heavy-tailed
    inter-event gaps; schedulers tick. Per user with >= {_BOT_MIN_EVENTS}
    gaps, the squared coefficient of variation cv² = n·Σg² / (Σg)² − 1
    of the µs gap sequence; cv² below 0.2 flags metronomic traffic. The
    flag comparison is cross-multiplied so the boundary is one
    deterministic double product per engine, and both moments are exact
    integers (HUGEINT/decimal second moment — the embed_norm_outliers
    policy).

    Plan: one (user_id) window for the lag gaps, then a key-only
    moments aggregate riding the same partitioning — one exchange
    total; per-user windows are the bounded kind sessionization
    already pays."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    g = e.select(
        "user_id", (us - F.lag(us).over(w)).alias("gap")
    ).filter(F.col("gap").isNotNull())
    gd = F.col("gap").cast("decimal(38,0)")
    m = (
        g.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.sum("gap").cast("long").alias("s1"),
            F.sum(gd * F.col("gap")).cast("double").alias("s2"),
        )
        .filter(F.col("n_gaps") >= _BOT_MIN_EVENTS)
    )
    var_num = (
        F.col("n_gaps").cast("double") * F.col("s2")
        - F.col("s1").cast("double") * F.col("s1")
    )
    s1sq = F.col("s1").cast("double") * F.col("s1")
    return m.select(
        "user_id",
        "n_gaps",
        F.expr("s1 div n_gaps").alias("mean_gap_us"),
        F.round(var_num / s1sq, 9).alias("cv2"),
        (var_num * 1000000 < F.lit(_BOT_CV2_PPM) * s1sq).alias("is_bot_like"),
    ).orderBy("user_id")


@query(
    "event_new_vs_returning",
    oracle="""
    WITH days AS (
        SELECT user_id,
               CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
                   AS day
        FROM events),
    first_seen AS (
        SELECT user_id, min(day) AS f FROM days GROUP BY user_id),
    tagged AS (
        SELECT d.day, d.user_id, d.day = fs.f AS is_new
        FROM (SELECT DISTINCT user_id, day FROM days) d
        JOIN first_seen fs USING (user_id))
    SELECT day,
           CAST(sum(CASE WHEN is_new THEN 1 ELSE 0 END) AS BIGINT)
               AS new_users,
           CAST(sum(CASE WHEN is_new THEN 0 ELSE 1 END) AS BIGINT)
               AS returning_users,
           round(CAST(sum(CASE WHEN is_new THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 9) AS new_share
    FROM tagged GROUP BY day ORDER BY day
    """,
    tags=("events", "growth", "retention"),
)
def event_new_vs_returning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New-vs-returning daily active users — the growth-accounting split
    every product dashboard leads with: a user's first-seen day tags
    them 'new' exactly once; every later active day counts as
    returning. Complements event_retention_cohort (which follows
    cohorts forward) by reading the same facts as a daily composition.

    Plan: distinct (user, day) map-side, one key-only min aggregate for
    first-seen, one user-keyed equi-join back, and a day-keyed
    composition aggregate — three key-only exchanges, no windows, no
    per-day scans."""
    e = load_table(spark, sf_dir, "events")
    days = e.select(
        "user_id",
        F.date_trunc("day", F.col("ts").cast("timestamp")).alias("day"),
    ).distinct()
    first_seen = days.groupBy("user_id").agg(F.min("day").alias("f"))
    tagged = days.join(first_seen, "user_id").select(
        "day", (F.col("day") == F.col("f")).alias("is_new")
    )
    new_c = F.sum(F.when(F.col("is_new"), 1).otherwise(0))
    return (
        tagged.groupBy("day")
        .agg(
            new_c.cast("long").alias("new_users"),
            F.sum(F.when(F.col("is_new"), 0).otherwise(1))
            .cast("long")
            .alias("returning_users"),
            F.round(new_c.cast("double") / F.count(F.lit(1)), 9).alias(
                "new_share"
            ),
        )
        .orderBy("day")
    )


# two-sided alpha=0.05, power=0.80: z constants folded to micro grid once
_PWR_ZA_U = 1_959_964  # z_{0.975}
_PWR_ZB_U = 841_621  # z_{0.80}


@query(
    "event_power_analysis_mde",
    oracle=f"""
    WITH arms AS (
        SELECT CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)),
                                        1, 8)) AS BIGINT) % 2 AS arm,
               CAST(round(value * 100) AS BIGINT) AS v
        FROM events WHERE event_type = 'purchase'),
    m AS (
        SELECT arm, CAST(count(*) AS BIGINT) AS n,
               CAST(sum(v) AS BIGINT) AS s1,
               CAST(sum(CAST(v AS HUGEINT) * v) AS DOUBLE) AS s2
        FROM arms GROUP BY arm),
    pooled AS (
        SELECT CAST(sum(n) AS BIGINT) AS n_tot,
               CAST(min(n) AS BIGINT) AS n_min,
               (CAST(sum(n) AS DOUBLE) * sum(s2)
                - CAST(sum(s1) AS DOUBLE) * sum(s1))
               / (CAST(sum(n) AS DOUBLE) * (sum(n) - 1)) AS var_c
        FROM m)
    SELECT n_tot, n_min,
           round(sqrt(var_c), 9) AS sd_c,
           round(CAST({_PWR_ZA_U} + {_PWR_ZB_U} AS DOUBLE) / 1000000
                 * sqrt(2 * var_c / n_min), 9) AS mde_c,
           round(CAST({_PWR_ZA_U} + {_PWR_ZB_U} AS DOUBLE) / 1000000
                 * sqrt(2 * var_c / n_min)
                 / (CAST((SELECT sum(s1) FROM m) AS DOUBLE)
                    / (SELECT sum(n) FROM m)) * 100, 9) AS mde_pct
    FROM pooled
    """,
    tags=("events", "power", "ab-test"),
)
def event_power_analysis_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment power analysis — the minimum detectable effect at
    alpha=0.05 / power=0.80 for the purchase-value metric under the
    current arm sizes: MDE = (z_a+z_b)*sqrt(2 sigma^2 / n_min), the
    go/no-go number every experiment review asks for BEFORE launch
    (completes the toolkit: sample_ab_assignment -> this ->
    event_sprt_sequential / agg_ab_welch_t -> event_did_incrementality).
    The z constants fold to the micro grid at definition time; the
    pooled variance comes from exact integer (n, sum, HUGEINT sum-sq)
    moments so the whole readout is deterministic double expressions
    over identical operands.

    Plan: one filtered scan -> 2-cell moments aggregate -> 1-row
    combine; linear in the fact table, nothing else."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    arm = (
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
        ).cast("long")
        % 2
    )
    v = F.round(F.col("value") * 100).cast("long")
    m = e.select(arm.alias("arm"), v.alias("v")).groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").cast("long").alias("s1"),
        F.sum(F.col("v").cast("decimal(38,0)") * F.col("v"))
        .cast("double")
        .alias("s2"),
    )
    pooled = m.agg(
        F.sum("n").cast("long").alias("n_tot"),
        F.min("n").cast("long").alias("n_min"),
        F.sum("s1").cast("long").alias("s1t"),
        F.sum("s2").alias("s2t"),
    ).select(
        "n_tot",
        "n_min",
        "s1t",
        (
            (F.col("n_tot").cast("double") * F.col("s2t")
             - F.col("s1t").cast("double") * F.col("s1t"))
            / (F.col("n_tot").cast("double") * (F.col("n_tot") - 1))
        ).alias("var_c"),
    )
    z = F.lit(_PWR_ZA_U + _PWR_ZB_U).cast("double") / 1000000
    mde = z * F.sqrt(2 * F.col("var_c") / F.col("n_min"))
    mean_c = F.col("s1t").cast("double") / F.col("n_tot")
    return pooled.select(
        "n_tot",
        "n_min",
        F.round(F.sqrt("var_c"), 9).alias("sd_c"),
        F.round(mde, 9).alias("mde_c"),
        F.round(mde / mean_c * 100, 9).alias("mde_pct"),
    )


@query(
    "event_rolling_correlation",
    oracle="""
    WITH daily AS (
        SELECT CAST(date_trunc('day', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
                   AS day,
               CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                    AS BIGINT) AS x,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS y
        FROM events GROUP BY 1),
    w AS (
        SELECT day, x, y,
               CAST(count(*) OVER win AS BIGINT) AS k,
               CAST(sum(x) OVER win AS BIGINT) AS sx,
               CAST(sum(y) OVER win AS BIGINT) AS sy,
               CAST(sum(x * y) OVER win AS BIGINT) AS sxy,
               CAST(sum(x * x) OVER win AS BIGINT) AS sxx,
               CAST(sum(y * y) OVER win AS BIGINT) AS syy
        FROM daily
        WINDOW win AS (ORDER BY day ROWS BETWEEN 6 PRECEDING
                       AND CURRENT ROW))
    SELECT day, x AS views, y AS purchases,
           CASE WHEN k >= 7 THEN
             round((CAST(k AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                   / sqrt((CAST(k AS DOUBLE) * sxx
                           - CAST(sx AS DOUBLE) * sx)
                        * (CAST(k AS DOUBLE) * syy
                           - CAST(sy AS DOUBLE) * sy)), 9)
           END AS corr_7d
    FROM w ORDER BY day
    """,
    tags=("events", "correlation", "rolling"),
)
def event_rolling_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day Pearson correlation between the view and purchase
    daily series — the relationship-stability monitor behind funnel
    health ('did purchases decouple from traffic this week?'), the
    windowed sibling of event_autocorr_daily. All five window moments
    are exact integer sums over the trailing frame, so the correlation
    is one deterministic double expression per day; partial windows
    (< 7 days) report NULL rather than an unstable estimate.

    Plan: one hash aggregate onto day keys, then five integer window
    registers over the tiny daily frame share ONE window spec — the
    fact table is touched once, everything after is calendar-bounded."""
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.groupBy(
            F.date_trunc("day", F.col("ts").cast("timestamp")).alias("day")
        )
        .agg(
            F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
            .cast("long")
            .alias("x"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).cast("long").alias("y"),
        )
    )
    win = Window.orderBy("day").rowsBetween(-6, 0)
    w = daily.select(
        "day",
        "x",
        "y",
        F.count(F.lit(1)).over(win).cast("long").alias("k"),
        F.sum("x").over(win).cast("long").alias("sx"),
        F.sum("y").over(win).cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(win).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(win).cast("long").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(win).cast("long").alias("syy"),
    )
    kd = F.col("k").cast("double")
    corr = (kd * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")) / F.sqrt(
        (kd * F.col("sxx") - F.col("sx").cast("double") * F.col("sx"))
        * (kd * F.col("syy") - F.col("sy").cast("double") * F.col("sy"))
    )
    return w.select(
        "day",
        F.col("x").alias("views"),
        F.col("y").alias("purchases"),
        F.when(F.col("k") >= 7, F.round(corr, 9)).alias("corr_7d"),
    ).orderBy("day")


@query(
    "event_conversion_lag",
    oracle="""
    WITH firsts AS (
        SELECT user_id,
               min(CASE WHEN event_type = 'view'
                        THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS v_us,
               min(CASE WHEN event_type = 'purchase'
                        THEN epoch_us(CAST(ts AS TIMESTAMP)) END) AS p_us
        FROM events GROUP BY user_id),
    lags AS (
        SELECT user_id, p_us - v_us AS lag_us
        FROM firsts
        WHERE v_us IS NOT NULL AND p_us IS NOT NULL AND p_us >= v_us),
    b AS (
        SELECT CAST(floor(log2(1 + lag_us // 1000000)) AS BIGINT)
                   AS lag_bucket_log2s,
               lag_us
        FROM lags)
    SELECT lag_bucket_log2s,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(min(lag_us) AS BIGINT) AS min_lag_us,
           CAST(max(lag_us) AS BIGINT) AS max_lag_us
    FROM b GROUP BY lag_bucket_log2s ORDER BY lag_bucket_log2s
    """,
    tags=("events", "funnel", "latency"),
)
def event_conversion_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-view → first-purchase conversion lag, log2-bucketed — the
    funnel-latency distribution behind attribution-window and retention-
    bucket choices (how long does intent take to convert: seconds,
    hours, or days — a linear histogram can't hold all three regimes).
    Lags are exact integer µs; the log2 second-scale bucket is one
    deterministic double per user (the floor(log2(1+s)) fixed-grid
    rule), so bucket membership cannot drift cross-engine.

    Plan: ONE conditional-min aggregate per user (map-side combined —
    the 'first event of each type' pattern without a window), a
    map-side lag + bucket projection, and a bucket-keyed rollup — two
    key-only exchanges, no windows, no joins."""
    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    firsts = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", us)).alias("v_us"),
        F.min(F.when(F.col("event_type") == "purchase", us)).alias("p_us"),
    )
    lags = firsts.filter(
        F.col("v_us").isNotNull()
        & F.col("p_us").isNotNull()
        & (F.col("p_us") >= F.col("v_us"))
    ).select((F.col("p_us") - F.col("v_us")).alias("lag_us"))
    bucket = F.floor(
        F.log2(1 + F.expr("lag_us div 1000000"))
    ).cast("long")
    return (
        lags.select(bucket.alias("lag_bucket_log2s"), "lag_us")
        .groupBy("lag_bucket_log2s")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.min("lag_us").cast("long").alias("min_lag_us"),
            F.max("lag_us").cast("long").alias("max_lag_us"),
        )
        .orderBy("lag_bucket_log2s")
    )


@query(
    "monitor_psi_drift",
    oracle="""
    WITH b AS (
      SELECT least(CAST(floor(value / 50.0) AS BIGINT), 9) AS bucket,
             CASE WHEN CAST(ts AS TIMESTAMP) < TIMESTAMP '2024-01-16 00:00:00'
                  THEN 1 ELSE 0 END AS is_ref
      FROM events
      WHERE value IS NOT NULL
    ), c AS (
      SELECT bucket,
             CAST(sum(is_ref) AS BIGINT) AS n_ref,
             CAST(sum(1 - is_ref) AS BIGINT) AS n_cur
      FROM b GROUP BY bucket
    ), t AS (
      SELECT CAST(sum(n_ref) AS BIGINT) AS tot_ref,
             CAST(sum(n_cur) AS BIGINT) AS tot_cur,
             CAST(count(*) AS BIGINT) AS k
      FROM c
    ), terms AS (
      SELECT bucket, n_ref, n_cur,
             CAST(round(
               ((n_cur + 1.0) / (tot_cur + k) - (n_ref + 1.0) / (tot_ref + k))
               * ln(((n_cur + 1.0) / (tot_cur + k))
                    / ((n_ref + 1.0) / (tot_ref + k)))
               * 1000000000) AS BIGINT) AS psi_term_nano
      FROM c, t
    )
    SELECT bucket, n_ref, n_cur, psi_term_nano,
           CAST(sum(psi_term_nano) OVER () AS BIGINT) AS psi_total_nano
    FROM terms
    """,
    tags=("events", "monitoring", "drift"),
)
def monitor_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index between a reference window (first half
    of the month) and the current window over fixed-width value buckets
    — the standard "did the feature distribution move under me" monitor
    a training pipeline runs per ingest batch (monitor_embedding_drift
    is the vector-space sibling; this is the scalar-feature one).

    Exactness: bucket ids are floor-division of doubles by an exact
    constant (identical IEEE result both engines); counts are integers;
    Laplace add-one proportions are rationals of those integers; each
    PSI term is fixed-pointed to an INTEGER nano-nat per bucket
    (round(x*1e9) on bit-identical doubles — the quality_dsir_weights
    recipe) and the headline psi_total_nano is a SUM OF THOSE INTEGERS,
    never a rounded float sum. Buckets come from the data (both engines
    derive the same set), so absent buckets can't diverge.

    Log-ulp margin (r11 ADVICE, measured): java.lang.Math.log tolerates
    1 ulp vs libm's ln, which propagates to the pre-round term at most
    ~1e-9 of a nano-nat unit; the nearest any fixture bucket's term
    lands to a .5-rounding boundary is 2.47e-3 units (sf0.01; 9.58e-3
    at sf0.001, 4.21e-3 at sf0.1 — scripts in SCALING.md §Round-12), a
    ~1e6x safety factor. Same margin class as the regr_* family's
    documented 6dp headroom.

    Plan at 100 TB: ONE pruned scan -> map-side partial count into a
    <=10-row hash aggregate; totals, PSI terms, and the grand total are
    all unpartitioned-window passes over those 10 rows in one task (an
    agg+crossJoin formulation re-scanned the fact table for the totals
    — pinned away in tests/test_plans.py). Per-batch cost is a single
    scan regardless of table size."""
    e = load_table(spark, sf_dir, "events")
    # NULL values are excluded EXPLICITLY on both sides (r11 ADVICE):
    # both engines' least() skip NULLs, which would silently route a NULL
    # value into bucket 9 — and DuckDB only adopted that null-skipping
    # semantic in 1.1, so the implicit behavior is engine-version-
    # dependent. An explicit IS NOT NULL makes the contract visible and
    # pins the hash across engine versions.
    b = e.filter(F.col("value").isNotNull()).select(
        F.least(
            F.floor(F.col("value") / 50.0).cast("long"), F.lit(9).cast("long")
        ).alias("bucket"),
        F.when(
            F.col("ts") < F.lit("2024-01-16 00:00:00").cast("timestamp"), 1
        )
        .otherwise(0)
        .alias("is_ref"),
    )
    c = b.groupBy("bucket").agg(
        F.sum("is_ref").cast("long").alias("n_ref"),
        F.sum(1 - F.col("is_ref")).cast("long").alias("n_cur"),
    )
    w = Window.partitionBy()
    totals = c.select(
        "bucket",
        "n_ref",
        "n_cur",
        F.sum("n_ref").over(w).cast("long").alias("tot_ref"),
        F.sum("n_cur").over(w).cast("long").alias("tot_cur"),
        F.count(F.lit(1)).over(w).cast("long").alias("k"),
    )
    p_cur = (F.col("n_cur") + 1.0) / (F.col("tot_cur") + F.col("k"))
    p_ref = (F.col("n_ref") + 1.0) / (F.col("tot_ref") + F.col("k"))
    terms = totals.select(
        "bucket",
        "n_ref",
        "n_cur",
        F.round((p_cur - p_ref) * F.log(p_cur / p_ref) * 1e9)
        .cast("long")
        .alias("psi_term_nano"),
    )
    return terms.select(
        "bucket",
        "n_ref",
        "n_cur",
        "psi_term_nano",
        F.sum("psi_term_nano").over(w).cast("long").alias("psi_total_nano"),
    )


@query(
    "event_mann_kendall_trend",
    oracle="""
    WITH daily AS (
      SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS d,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS m
      FROM events WHERE value IS NOT NULL GROUP BY 1),
    pairs AS (
      SELECT CASE WHEN b.m > a.m THEN 1
                  WHEN b.m < a.m THEN -1 ELSE 0 END AS sgn
      FROM daily a JOIN daily b ON a.d < b.d),
    ties AS (
      SELECT CAST(coalesce(sum(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
                 AS tie_term
      FROM (SELECT CAST(count(*) AS BIGINT) AS t FROM daily GROUP BY m)
      WHERE t > 1),
    s AS (
      SELECT CAST(sum(sgn) AS BIGINT) AS s_stat,
             (SELECT CAST(count(*) AS BIGINT) FROM daily) AS n,
             (SELECT tie_term FROM ties) AS tie_term
      FROM pairs)
    SELECT n, s_stat,
           round((s_stat - CASE WHEN s_stat > 0 THEN 1
                                WHEN s_stat < 0 THEN -1 ELSE 0 END)
                 / sqrt((CAST(n AS DOUBLE) * (n - 1) * (2 * n + 5)
                         - tie_term) / 18), 9) AS z
    FROM s
    """,
    tags=("events", "timeseries", "trend", "nonparametric"),
)
def event_mann_kendall_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Kendall trend test on the daily revenue series — the
    nonparametric "is this metric drifting" monitor (no linearity or
    normality assumption, robust to outliers; event_trend_regression is
    the parametric sibling). S sums the signs of all C(n,2) pairwise
    day comparisons of EXACT integer cent totals, the tie-corrected
    variance and continuity-corrected z follow the standard formulas on
    doubles cast from those integers (9 dp, the welch_t margin class).

    The day-pair join is quadratic IN DAYS, which is the point: days
    are bounded (30 here, ~36.5k for a century of daily data), so after
    the one real pass — the daily integer rollup, map-side combined —
    the pair stage is a broadcast self-join of a tiny frame. The
    pattern to AVOID at 100 TB is pairing raw events; pairing bounded
    period aggregates is how seasonal/trend stats stay one-scan."""
    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    daily = e.groupBy(
        F.date_trunc("day", F.col("ts").cast("timestamp")).alias("d")
    ).agg(
        F.sum(F.round(F.col("value") * 100).cast("long"))
        .cast("long")
        .alias("m")
    )
    a, b = daily.alias("a"), daily.alias("b")
    pairs = a.join(F.broadcast(b), F.col("a.d") < F.col("b.d")).select(
        F.when(F.col("b.m") > F.col("a.m"), 1)
        .when(F.col("b.m") < F.col("a.m"), -1)
        .otherwise(0)
        .alias("sgn")
    )
    ties = (
        daily.groupBy("m")
        .agg(F.count(F.lit(1)).cast("long").alias("t"))
        .filter(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(
                    F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("tie_term")
        )
    )
    n_df = daily.agg(F.count(F.lit(1)).cast("long").alias("n"))
    s = (
        pairs.agg(F.sum("sgn").cast("long").alias("s_stat"))
        .crossJoin(F.broadcast(n_df))
        .crossJoin(F.broadcast(ties))
    )
    cc = (
        F.when(F.col("s_stat") > 0, 1)
        .when(F.col("s_stat") < 0, -1)
        .otherwise(0)
    )
    var = (
        F.col("n").cast("double")
        * (F.col("n") - 1)
        * (2 * F.col("n") + 5)
        - F.col("tie_term")
    ) / 18
    return s.select(
        "n",
        "s_stat",
        F.round((F.col("s_stat") - cc) / F.sqrt(var), 9).alias("z"),
    )
