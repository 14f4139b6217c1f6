"""Deterministic sampling operators — the training-data-pipeline primitives
for carving reproducible subsets out of a 100 TB corpus.

Engine-RNG sampling (``df.sample``, DuckDB ``USING SAMPLE``) is
cluster-layout-dependent and cross-engine incomparable, so every operator
here derives its randomness from md5 of a row key instead: the "random"
order/threshold is a pure function of the data, bit-identical in Spark and
DuckDB (both emit 32-char lowercase hex), reproducible at any partition
count, and embarrassingly parallel — a map-side filter with NO shuffle and
no RNG state, which is exactly what you want when sampling a 100 TB table
(the rejected 90% never leaves the scan stage). The reference itself uses
seeded determinism for its one stochastic choice (task order shuffle,
seed 1, /root/reference/runner.cc:392) — same philosophy.

Hex-threshold math: the first 4 md5 hex chars are uniform on [0, 0x10000);
a lexicographic compare against a hex literal selects an exact fraction
(e.g. < '1999' ⇒ 0x1999/0x10000 ≈ 10.0%).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ocs_duckdb_runner_spark.registry import load_table, query

# per-row key unique across lineitem: (l_orderkey, l_linenumber)
_KEY_SQL = "md5(CAST(l_orderkey AS VARCHAR) || '_' || CAST(l_linenumber AS VARCHAR))"


def _key_col() -> F.Column:
    return F.md5(
        F.concat_ws("_", F.col("l_orderkey").cast("string"),
                    F.col("l_linenumber").cast("string"))
    )


@query(
    "sample_hash_bernoulli",
    oracle=f"""
    SELECT l_orderkey, l_linenumber, l_returnflag,
           CAST(round(l_extendedprice * 100) AS BIGINT) AS price_c
    FROM lineitem
    WHERE substr({_KEY_SQL}, 1, 4) < '1999'
    """,
    tags=("sampling", "llm"),
)
def sample_hash_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~10% Bernoulli sample by hash threshold — the reproducible
    train/held-out split: membership is a pure function of the row key, so
    the same rows are selected on any cluster, any partitioning, any day.
    Map-side filter only; at 100 TB nothing but the survivors is shuffled
    or materialized."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(F.substring(_key_col(), 1, 4) < "1999").select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("price_c"),
    )


@query(
    "sample_stratified",
    oracle=f"""
    WITH s AS (
      SELECT l_returnflag, substr({_KEY_SQL}, 1, 4) AS h
      FROM lineitem
    )
    SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_sampled
    FROM s
    WHERE h < (CASE l_returnflag WHEN 'R' THEN '8000'
                                 WHEN 'A' THEN '4000'
                                 ELSE '0ccc' END)
    GROUP BY l_returnflag
    """,
    tags=("sampling", "llm"),
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling with per-stratum rates (the deterministic twin
    of ``df.sampleBy``): returned lines kept at 50%, A-flag at 25%, the
    rest at 5% — the class-rebalancing pattern for skewed training data.
    The rate lookup is a CASE on the stratum column: still a pure map-side
    filter, no shuffle, no per-stratum passes."""
    li = load_table(spark, sf_dir, "lineitem")
    h = F.substring(_key_col(), 1, 4)
    thresh = (
        F.when(F.col("l_returnflag") == "R", "8000")
        .when(F.col("l_returnflag") == "A", "4000")
        .otherwise("0ccc")
    )
    return (
        li.filter(h < thresh)
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
    )


@query(
    "sample_uniform_k",
    oracle="""
    SELECT o_orderkey, md5(CAST(o_orderkey AS VARCHAR)) AS h
    FROM orders
    ORDER BY h, o_orderkey
    LIMIT 100
    """,
    tags=("sampling", "llm", "topk"),
)
def sample_uniform_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k uniform sample: order by md5(key) and take the first k —
    a deterministic stand-in for reservoir sampling (every row is equally
    likely under the hash's uniform order, and re-runs pick the identical
    set). Physically TakeOrderedAndProject: per-partition k-heaps merged on
    the driver, NOT a global sort — O(k) memory per task at any scale."""
    o = load_table(spark, sf_dir, "orders")
    h = F.md5(F.col("o_orderkey").cast("string")).alias("h")
    return (
        o.select("o_orderkey", h)
        .orderBy("h", "o_orderkey")
        .limit(100)
    )


SAMPLE_K_PER_GROUP = 5


@query(
    "sample_k_per_group",
    oracle=f"""
    SELECT lang, doc_id, CAST(rk AS BIGINT) AS rk
    FROM (SELECT lang, doc_id,
                 row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
          FROM documents)
    WHERE rk <= {SAMPLE_K_PER_GROUP}
    """,
    tags=("sampling", "llm"),
)
def sample_k_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k-per-group sampling (k=5 docs per language) — the
    balanced-subset primitive behind eval-set construction and per-domain
    inspection samples: every group contributes min(k, n) rows, chosen by
    md5 order so the pick is a pure function of the data (same rows on any
    cluster/partitioning — see module docstring).

    Plan: one window over (lang) with the rank ≤ k predicate pushed into
    the sort as a WindowGroupLimit — each partition keeps a k-row heap
    per group instead of fully sorting, so at 100 TB the exchange carries
    only ~k rows per group per map partition."""
    d = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    return (
        d.select("lang", "doc_id", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= SAMPLE_K_PER_GROUP)
        .select("lang", "doc_id", F.col("rk").cast("long").alias("rk"))
    )


SAMPLE_WEIGHTED_K = 20


@query(
    "sample_weighted_k",
    oracle=f"""
    WITH keyed AS (
        SELECT doc_id, n_chars,
               (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))
                     AS BIGINT) + 0.5) / 281474976710656.0 AS u
        FROM documents WHERE n_chars > 0
    )
    SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
           round(ln(u) / n_chars, 12) AS es_key
    FROM keyed
    ORDER BY es_key DESC, doc_id
    LIMIT {SAMPLE_WEIGHTED_K}
    """,
    tags=("sampling", "llm", "weighted"),
)
def sample_weighted_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement, exactly-k (Efraimidis–
    Spirakis A-ES): each row draws u∈(0,1) and ranks by u^(1/w) —
    equivalently ln(u)/w, monotone and overflow-free — so the top-k is a
    weighted-without-replacement sample (here weight = n_chars: longer
    docs proportionally likelier). The uniform is DERIVED, not drawn:
    u = (first 12 md5 hex chars + ½)/16^12, a pure function of doc_id —
    the deterministic-randomness policy of this module, which is what
    makes a 'random' weighted sample reproducible across engines,
    partitionings, and reruns, and lets the oracle check it EXACTLY
    (same integer, same division, same libm ln on both sides).

    Plan: map-side key computation + TakeOrderedAndProject — at 100 TB
    each partition keeps a k-row heap; no shuffle of non-winners. The
    classic distributed-reservoir merge (per-partition top-k then global
    top-k) is exactly what Spark's physical operator does."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    v = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12), 16, 10
    ).cast("long")
    u = (v.cast("double") + 0.5) / F.lit(float(1 << 48))
    es_key = F.log(u) / F.col("n_chars")
    return (
        d.select(
            "doc_id",
            F.col("n_chars").cast("long").alias("weight"),
            F.round(es_key, 12).alias("es_key"),
        )
        .orderBy(F.col("es_key").desc(), "doc_id")
        .limit(SAMPLE_WEIGHTED_K)
    )


# Poisson(1) inverse-CDF thresholds (cumulative), shared literals so both
# engines bucket the identical uniform into the identical count.
_POIS_CDF = (
    "0.36787944117144233",
    "0.7357588823428847",
    "0.9196986029286058",
    "0.9810118431238462",
    "0.9963401531726563",
    "0.9994058151824183",
)
_BOOT_REPLICATES = 4


@query(
    "sample_poisson_bootstrap",
    oracle=f"""
    WITH reps AS (
        SELECT d.doc_id, CAST(d.n_chars AS BIGINT) AS x, t.r,
               (CAST(('0x' || substr(md5(CAST(t.r AS VARCHAR) || '|' ||
                                     CAST(d.doc_id AS VARCHAR)), 1, 12))
                     AS BIGINT) + 0.5) / 281474976710656.0 AS u
        FROM documents d,
             unnest(generate_series(0, {_BOOT_REPLICATES - 1})) AS t(r)
    ),
    k AS (
        SELECT r, x,
               CASE {' '.join(f"WHEN u < {c} THEN {i}" for i, c in enumerate(_POIS_CDF))}
                    ELSE 6 END AS k
        FROM reps
    )
    SELECT CAST(r AS BIGINT) AS replicate,
           CAST(sum(k) AS BIGINT) AS n_drawn,
           CAST(sum(k * x) AS BIGINT) AS total_chars
    FROM k GROUP BY r
    """,
    tags=("sampling", "bootstrap", "stats"),
)
def sample_poisson_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson bootstrap — THE bootstrap that works at 100 TB: classic
    resampling draws n items WITH replacement (a global operation), but
    Poisson(1) replicate counts per row are independent — each row
    locally draws k_r ~ Poisson(1) per replicate and contributes k_r
    copies, no coordination, one pass for ALL replicates. Replicate
    totals' spread then estimates the statistic's sampling variance.
    The draw is hash-derived (md5 of replicate|doc_id through the shared
    inverse-CDF thresholds), so every k, and therefore every replicate
    total, is reproducible and oracle-EXACT — a bootstrap you can
    hash-verify across engines.

    Plan: the replicate expansion is a map-side Generate ({_BOOT_REPLICATES}
    rows/doc), partial-aggregated into {_BOOT_REPLICATES} cells before one
    tiny exchange."""
    d = load_table(spark, sf_dir, "documents")
    reps = d.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("x"),
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_REPLICATES - 1))).alias("r"),
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        "|", F.col("r").cast("string"),
                        F.col("doc_id").cast("string"),
                    )
                ),
                1,
                12,
            ),
            16,
            10,
        ).cast("long").cast("double")
        + 0.5
    ) / F.lit(float(1 << 48))
    k = F.lit(6)
    for i in range(len(_POIS_CDF) - 1, -1, -1):
        k = F.when(u < float(_POIS_CDF[i]), F.lit(i)).otherwise(k)
    return (
        reps.select("r", "x", k.alias("k"))
        .groupBy(F.col("r").cast("long").alias("replicate"))
        .agg(
            F.sum("k").cast("long").alias("n_drawn"),
            F.sum(F.col("k") * F.col("x")).cast("long").alias("total_chars"),
        )
    )


_AB_ARMS = 2  # 50/50 experiment split


@query(
    "sample_ab_assignment",
    oracle=f"""
    WITH arms AS (
        SELECT o_custkey,
               CAST(concat('0x', substr(md5(CAST(o_custkey AS VARCHAR)),
                                        1, 8)) AS BIGINT) % {_AB_ARMS} AS arm
        FROM (SELECT DISTINCT o_custkey FROM orders)
    ),
    counts AS (
        SELECT arm, CAST(count(*) AS BIGINT) AS n FROM arms GROUP BY arm
    ),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM counts)
    SELECT c.arm, c.n,
           round(CAST(c.n AS DOUBLE) / t.t, 9) AS share,
           round(power(c.n - CAST(t.t AS DOUBLE) / {_AB_ARMS}, 2)
                 / (CAST(t.t AS DOUBLE) / {_AB_ARMS}), 9) AS chi2_term
    FROM counts c CROSS JOIN tot t
    ORDER BY c.arm
    """,
    tags=("sampling", "experiment", "ab-test"),
)
def sample_ab_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic experiment bucketing + sample-ratio-mismatch check:
    each customer hashes to one of {_AB_ARMS} arms via the engine-neutral
    md5-prefix rule (sticky across runs, clusters, and days — the property
    an A/B platform cannot live without), and the report carries each
    arm's count, share, and chi-square SRM term against the intended
    uniform split (sum the terms, compare to the chi2 critical value:
    an imbalanced randomizer is the most common silent experiment
    killer).

    Plan: one distinct on the unit key (key-only exchange), one
    {_AB_ARMS}-key aggregate, one broadcast total — unit count never
    matters; the assignment column itself is a map-side expression any
    downstream query can reuse without a join."""
    o = load_table(spark, sf_dir, "orders")
    units = o.select("o_custkey").distinct()
    arm = (
        F.conv(
            F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 8),
            16,
            10,
        ).cast("long")
        % _AB_ARMS
    )
    counts = units.select(arm.alias("arm")).groupBy("arm").agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = counts.agg(F.sum("n").cast("long").alias("t"))
    exp = F.col("t").cast("double") / _AB_ARMS
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "arm",
            "n",
            F.round(F.col("n").cast("double") / F.col("t"), 9).alias("share"),
            F.round(
                F.pow(F.col("n") - exp, 2) / exp, 9
            ).alias("chi2_term"),
        )
        .orderBy("arm")
    )


@query(
    "sample_neyman_allocation",
    oracle="""
    WITH x AS (
      SELECT event_type AS stratum, event_id,
             CAST(round(value * 100) AS BIGINT) AS vc
      FROM events WHERE value IS NOT NULL),
    m AS (
      SELECT stratum,
             CAST(count(*) AS BIGINT) AS n_h,
             CAST(sum(vc) AS BIGINT) AS s,
             CAST(sum(vc * vc) AS BIGINT) AS ss
      FROM x GROUP BY stratum),
    wgt AS (
      SELECT stratum, n_h,
             CAST(round(n_h * sqrt((CAST(ss AS DOUBLE)
                                    - CAST(s AS DOUBLE) * s / n_h)
                                   / (n_h - 1)) * 1000000) AS BIGINT)
                 AS w_fx
      FROM m),
    alloc AS (
      SELECT stratum, n_h, w_fx,
             CAST(round(1000.0 * w_fx / (SELECT sum(w_fx) FROM wgt))
                  AS BIGINT) AS n_alloc
      FROM wgt),
    ranked AS (
      SELECT x.stratum, x.vc,
             row_number() OVER (PARTITION BY x.stratum
                                ORDER BY md5(CAST(x.event_id AS VARCHAR)),
                                         x.event_id) AS rn
      FROM x),
    taken AS (
      SELECT r.stratum,
             CAST(count(*) AS BIGINT) AS n_taken,
             CAST(sum(r.vc) AS BIGINT) AS sampled_sum_c
      FROM ranked r JOIN alloc a USING (stratum)
      WHERE r.rn <= a.n_alloc
      GROUP BY r.stratum)
    SELECT a.stratum, a.n_h, a.w_fx, a.n_alloc, t.n_taken, t.sampled_sum_c
    FROM alloc a JOIN taken t USING (stratum)
    """,
    tags=("sampling", "stratified", "neyman"),
)
def sample_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Neyman-optimal stratified allocation (the survey-sampling
    optimum, and the right way to subsample a corpus for eval): a fixed
    budget of 1000 rows is split across strata proportional to
    N_h·σ_h — high-variance strata get more of the budget, minimizing
    the estimator's variance at fixed cost — then each stratum's
    allocation is DRAWN deterministically (md5 order on event_id, the
    sample_* family's convention) so both engines take the same rows.

    Exactness discipline: σ_h comes from integer moments through the
    DOUBLE-form variance (ss − s²/n)/(n−1) — the integer cross-term
    n·ss − s² overflows int64 at the 100x strike where DuckDB widens to
    HUGEINT and Spark ANSI-errors (caught live by the probe); the weight
    N_h·σ_h is fixed-pointed to an integer (round ×1e6) BEFORE the
    cross-strata sum, because a sum of raw doubles would be
    order-dependent; the allocation rounds ONE double
    product/quotient mirrored on both engines (an integer 1000·w_fx
    overflows int64 at the 100x strike — also probe-caught).

    Plan at 100 TB: one moments pass (map-side combine into |strata|
    rows), one broadcast of the |strata|-row allocation, one per-stratum
    top-n_h window. The window partitions by stratum — with few giant
    strata the production variant switches to the hash-threshold draw
    (sample_hash_bernoulli's trick, n_h/N_h as a bound then exact-trim),
    documented here, exercised via row_number because the oracle needs
    the exact draw."""
    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    x = e.select(
        F.col("event_type").alias("stratum"),
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("vc"),
    )
    m = x.groupBy("stratum").agg(
        F.count(F.lit(1)).cast("long").alias("n_h"),
        F.sum("vc").cast("long").alias("s"),
        F.sum(F.col("vc") * F.col("vc")).cast("long").alias("ss"),
    )
    wgt = m.select(
        "stratum",
        "n_h",
        # variance in DOUBLE form (ss - s^2/n)/(n-1): the integer form
        # n*ss - s*s overflows int64 at the 100x strike (~1e20) where
        # DuckDB silently widens to HUGEINT and Spark ANSI-errors —
        # found live by the 100x probe; both engines now run the same
        # IEEE sequence on sums that are exact in double range
        F.round(
            F.col("n_h")
            * F.sqrt(
                (
                    F.col("ss").cast("double")
                    - F.col("s").cast("double") * F.col("s") / F.col("n_h")
                )
                / (F.col("n_h") - 1)
            )
            * 1000000
        )
        .cast("long")
        .alias("w_fx"),
    )
    tot = wgt.agg(F.sum("w_fx").cast("long").alias("tw"))
    alloc = wgt.crossJoin(F.broadcast(tot)).selectExpr(
        "stratum",
        "n_h",
        "w_fx",
        # double round, not integer div: 1000*w_fx overflows int64 at
        # the 100x strike (10M events -> w_fx ~3e16); the double product
        # and division are the same IEEE values in both engines because
        # the inputs are identical integers
        "cast(round(1000.0 * w_fx / tw) as bigint) AS n_alloc",
    )
    wrn = Window.partitionBy("stratum").orderBy(
        F.md5(F.col("event_id").cast("string")), "event_id"
    )
    ranked = x.select(
        "stratum", "vc", F.row_number().over(wrn).alias("rn")
    )
    taken = (
        ranked.join(F.broadcast(alloc.select("stratum", "n_alloc")), "stratum")
        .filter(F.col("rn") <= F.col("n_alloc"))
        .groupBy("stratum")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_taken"),
            F.sum("vc").cast("long").alias("sampled_sum_c"),
        )
    )
    return alloc.join(taken, "stratum").select(
        "stratum", "n_h", "w_fx", "n_alloc", "n_taken", "sampled_sum_c"
    )
