"""Join surface (SURVEY.md §2c EXT): every join kind the engine supports.

The reference never joins (its one query is single-table,
/root/reference/runner.cc:174-182); this is the extended relational surface,
expressed declaratively so Catalyst + AQE pick the physical strategy:
broadcast-hash for dim tables (explicitly hinted where we know the side is
small), sort-merge for fact⋈fact, and runtime skew-splitting via AQE. At
100 TB the fact tables shuffle on the join key once; dimension joins never
shuffle the fact side at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ocs_duckdb_runner_spark.registry import load_table, query


@query(
    "join_inner",
    oracle="""
    SELECT o.o_orderkey, o.o_totalprice, c.c_custkey, c.c_name, c.c_mktsegment
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING'
    """,
    tags=("join",),
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join orders⋈customer. customer is orders/10 in size, so
    AQE converts the shuffle join to broadcast-hash at runtime when the
    built side fits; the segment filter is pushed below the join."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "o_totalprice", "c_custkey", "c_name", "c_mktsegment"
    )


@query(
    "join_left",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM customer c LEFT JOIN orders o
      ON c.c_custkey = o.o_custkey AND o.o_totalprice > 150000
    """,
    tags=("join",),
)
def join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join with an extra non-key condition in the ON clause —
    the condition filters the right side pre-join, never drops left rows."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    cond = (c.c_custkey == o.o_custkey) & (o.o_totalprice > 150000)
    return c.join(o, cond, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@query(
    "join_right",
    oracle="""
    SELECT n.n_nationkey, n.n_name, c.c_custkey, c.c_acctbal
    FROM customer c RIGHT JOIN nation n ON c.c_nationkey = n.n_nationkey
    """,
    tags=("join",),
)
def join_right(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join — nations with no customers survive with NULLs."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return c.join(n, c.c_nationkey == n.n_nationkey, "right").select(
        "n_nationkey", "n_name", "c_custkey", "c_acctbal"
    )


@query(
    "join_full",
    oracle="""
    WITH hi_cust AS (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 7000),
         hi_ord AS (SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders
                    FROM orders WHERE o_totalprice > 150000 GROUP BY o_custkey)
    SELECT h.c_custkey, h.c_acctbal, o.o_custkey, o.n_orders
    FROM hi_cust h FULL JOIN hi_ord o ON h.c_custkey = o.o_custkey
    """,
    tags=("join",),
)
def join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two filtered/aggregated sides — rows unique to
    either side survive with NULLs on the other."""
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 7000)
        .select("c_custkey", "c_acctbal")
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 150000)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    return c.join(o, c.c_custkey == o.o_custkey, "full").select(
        "c_custkey", "c_acctbal", "o_custkey", "n_orders"
    )


@query(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
    """,
    tags=("join",),
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): emits each matching left row once — no
    row multiplication, and only the left side's columns survive."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 200000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@query(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
    tags=("join",),
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers who never ordered."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@query(
    "join_broadcast",
    oracle="""
    SELECT r.r_name, n.n_name, CAST(count(*) AS BIGINT) AS n_customers
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name, n.n_name
    """,
    tags=("join", "broadcast"),
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-side dimension joins: region (5 rows) and nation (25 rows) are
    explicitly broadcast, so the customer fact table is joined without any
    shuffle — the pattern that matters most at 100 TB (a shuffle of the
    fact table for a 25-row dim would dominate the whole query)."""
    c = load_table(spark, sf_dir, "customer")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region"))
    return (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "join_theta_range",
    oracle="""
    SELECT s.s_suppkey, s.s_name, c.c_custkey
    FROM supplier s JOIN customer c
      ON c.c_acctbal > s.s_acctbal - 50 AND c.c_acctbal < s.s_acctbal + 50
    """,
    tags=("join", "theta"),
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi (theta/range) join — no hashable key, so Spark uses
    BroadcastNestedLoopJoin with the small supplier side broadcast; the
    band predicate is evaluated in codegen. At scale the fix is banding:
    join_range_banded computes the SAME result (same oracle) as a bucket
    equi-join + filter, the plan that holds when neither side fits in
    memory."""
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    c = load_table(spark, sf_dir, "customer")
    cond = (c.c_acctbal > s.s_acctbal - 50) & (c.c_acctbal < s.s_acctbal + 50)
    return s.join(c, cond).select("s_suppkey", "s_name", "c_custkey")


@query(
    "join_range_banded",
    oracle="""
    SELECT s.s_suppkey, s.s_name, c.c_custkey
    FROM supplier s JOIN customer c
      ON c.c_acctbal > s.s_acctbal - 50 AND c.c_acctbal < s.s_acctbal + 50
    """,
    tags=("join", "theta", "banded"),
)
def join_range_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME band-join semantics as join_theta_range (same oracle), via
    the plan that survives 100 TB: BANDING. Each side is assigned a coarse
    bucket = floor(acctbal_cents / band_width); the band width equals the
    bucket width, so a matching pair's buckets differ by at most 1 — the
    supplier side is replicated into buckets b-1, b, b+1 (a fixed 3×
    lateral, map-side), the join becomes a hashable EQUI-join on the
    bucket key, and the exact band predicate filters the candidates.

    Correctness notes: cents = round(acctbal·100) is exact for 2-decimal
    money; each customer row has exactly ONE bucket, so a pair can match
    in only one replicated slot — no dedup needed. The final filter uses
    the identical double comparison as the oracle (x − 50 is exact in
    binary64 for these magnitudes since 50 is an integer multiple of any
    ulp), so the boundary can't drift.

    Scale: replaces join_theta_range's BroadcastNestedLoopJoin (which
    needs one side to fit in memory and evaluates |S|·|C| predicates)
    with a shuffle on a uniform synthetic key — cost is the candidate
    pairs within ±1 bucket, not the cross product."""
    band = 5000  # cents = $50, matching the oracle's band
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    s_b = F.floor(F.round(F.col("s_acctbal") * 100).cast("long") / band)
    c_b = F.floor(F.round(F.col("c_acctbal") * 100).cast("long") / band)
    s_exp = s.select(
        "s_suppkey",
        "s_name",
        "s_acctbal",
        F.explode(F.array(s_b - 1, s_b, s_b + 1)).alias("bucket"),
    )
    c_k = c.select("c_custkey", "c_acctbal", c_b.alias("bucket"))
    cond = (F.col("c_acctbal") > F.col("s_acctbal") - 50) & (
        F.col("c_acctbal") < F.col("s_acctbal") + 50
    )
    return (
        s_exp.join(c_k, "bucket")
        .filter(cond)
        .select("s_suppkey", "s_name", "c_custkey")
    )


@query(
    "join_part_promo",
    oracle="""
    SELECT p.p_brand,
           CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000)
                    AS BIGINT)) AS BIGINT) AS revenue_e4,
           CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 10000)
                    AS BIGINT)) FILTER (WHERE p.p_type LIKE 'PROMO%')
                AS BIGINT) AS promo_revenue_e4,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
    tags=("join", "tpch"),
)
def join_part_promo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: lineitem⋈part with conditional (promo-type) revenue
    per brand — fact⋈dim with conditional fixed-point aggregate and zero
    fact-side shuffle before the final group-by. part grows with SF, so no
    forced broadcast hint: the planner/AQE broadcasts it while it fits and
    falls back to a key shuffle beyond threshold (a forced hint on a
    100 TB-scale part OOMs executors)."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand", "p_type"
    )
    rev = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
    ).cast("long")
    promo = F.col("p_type").like("PROMO%")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.sum(rev).alias("revenue_e4"),
            F.sum(F.when(promo, rev)).alias("promo_revenue_e4"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@query(
    "join_skew_salted",
    oracle="""
    WITH skewed AS (
      SELECT l_orderkey,
             CASE WHEN l_orderkey % 10 < 9 THEN 0 ELSE l_orderkey END AS hot_key,
             l_extendedprice
      FROM lineitem),
    dim AS (SELECT DISTINCT
              CASE WHEN o_orderkey % 10 < 9 THEN 0 ELSE o_orderkey END AS hot_key,
              CASE WHEN o_orderkey % 10 < 9 THEN 'hot' ELSE 'cold' END AS bucket
            FROM orders)
    SELECT d.bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(s.l_extendedprice * 100) AS BIGINT)) AS BIGINT)
             AS sum_price_c
    FROM skewed s JOIN dim d ON s.hot_key = d.hot_key
    GROUP BY d.bucket
    """,
    tags=("join", "skew"),
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resilient join via explicit salting: ~90% of fact rows share
    one hot key (constructed), which would pile a naive hash join onto a
    single task. The fact side appends salt = pmod(hash(row), N); the dim
    side explodes ×N over all salts; the join key becomes (key, salt), so
    the hot key spreads over N tasks. Semantically identical to the plain
    join the oracle runs — AQE's skew-join split is the automatic cousin,
    this is the portable manual technique."""
    n_salt = 8
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        F.when(F.col("l_orderkey") % 10 < 9, F.lit(0))
        .otherwise(F.col("l_orderkey"))
        .alias("hot_key"),
        "l_extendedprice",
    )
    fact = li.withColumn(
        "salt", F.pmod(F.xxhash64("l_orderkey", "l_extendedprice"), F.lit(n_salt))
    )
    o = load_table(spark, sf_dir, "orders")
    dim = (
        o.select(
            F.when(F.col("o_orderkey") % 10 < 9, F.lit(0))
            .otherwise(F.col("o_orderkey"))
            .alias("hot_key"),
            F.when(F.col("o_orderkey") % 10 < 9, F.lit("hot"))
            .otherwise(F.lit("cold"))
            .alias("bucket"),
        )
        .distinct()
        .withColumn("salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)])))
    )
    return (
        fact.join(dim, ["hot_key", "salt"])
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("l_extendedprice") * 100).cast("long")).alias(
                "sum_price_c"
            ),
        )
    )


@query(
    "join_asof",
    oracle="""
    WITH ord_d AS (
      SELECT o_custkey, o_orderdate,
             max(o_orderkey) AS o_orderkey,
             arg_max(o_totalprice, o_orderkey) AS o_totalprice
      FROM orders GROUP BY o_custkey, o_orderdate),
    e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events)
    SELECT e.event_id, e.user_id, e.ts,
           o.o_orderkey AS asof_orderkey,
           o.o_totalprice AS asof_totalprice
    FROM e ASOF LEFT JOIN ord_d o
      ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
    tags=("join", "asof"),
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join — for each event, the most recent order (same key,
    o_orderdate ≤ ts). Spark has no native ASOF operator; the scalable
    formulation is union + last(ignorenulls) over a time-ordered window:
    one shuffle on the key, no range-join blowup, no per-group pandas.
    The oracle is DuckDB's native ASOF JOIN — two entirely different
    algorithms, same rows. Orders are first deduped to one per
    (key, time) with a deterministic keeper (max orderkey), since the
    as-of tie among equal timestamps is otherwise engine-defined."""
    o = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(
            F.max("o_orderkey").alias("o_orderkey"),
            F.max_by("o_totalprice", "o_orderkey").alias("o_totalprice"),
        )
    )
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    ev = e.select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        "event_id",
        F.lit(None).cast("long").alias("o_orderkey"),
        F.lit(None).cast("double").alias("o_totalprice"),
        F.lit(1).alias("is_event"),
    )
    od = o.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("t"),
        F.lit(None).cast("long").alias("event_id"),
        "o_orderkey",
        "o_totalprice",
        F.lit(0).alias("is_event"),
    )
    # orders sort before events at equal t (is_event asc) so same-instant
    # orders are visible to the event — matching ASOF's >= semantics
    w = (
        Window.partitionBy("k")
        .orderBy("t", "is_event", F.coalesce("o_orderkey", F.lit(-1)))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = ev.unionAll(od).select(
        "k",
        "t",
        "event_id",
        "is_event",
        F.last("o_orderkey", ignorenulls=True).over(w).alias("asof_orderkey"),
        F.last("o_totalprice", ignorenulls=True).over(w).alias("asof_totalprice"),
    )
    return merged.filter(F.col("is_event") == 1).select(
        "event_id",
        F.col("k").alias("user_id"),
        F.col("t").alias("ts"),
        "asof_orderkey",
        "asof_totalprice",
    )


@query(
    "join_multiway",
    oracle="""
    SELECT r.r_name, CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_c
    FROM region r
    JOIN nation n ON n.n_regionkey = r.r_regionkey
    JOIN customer c ON c.c_nationkey = n.n_nationkey
    JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY r.r_name
    """,
    tags=("join", "star"),
)
def join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-table star join region→nation→customer→orders. Dim sides are
    broadcast (explicit for region/nation, AQE-chosen for customer), so the
    orders fact flows through the whole join tree with zero shuffles until
    the final aggregation."""
    from ocs_duckdb_runner_spark.exactness import fx_sum

    r = F.broadcast(load_table(spark, sf_dir, "region"))
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            fx_sum("o_totalprice").alias("sum_price_c"),
        )
    )


@query(
    "join_null_safe",
    oracle="""
    WITH l AS (SELECT o_orderkey,
                      CASE WHEN o_orderkey % 7 = 0 THEN NULL
                           ELSE o_orderkey % 5 END AS grp
               FROM orders),
    r AS (SELECT DISTINCT CASE WHEN o_orderkey % 7 = 0 THEN NULL
                               ELSE o_orderkey % 5 END AS grp,
                 CASE WHEN o_orderkey % 7 = 0 THEN 'null-grp'
                      ELSE 'grp-' || CAST(o_orderkey % 5 AS VARCHAR) END AS tag
          FROM orders)
    SELECT l.o_orderkey, r.tag
    FROM l JOIN r ON l.grp IS NOT DISTINCT FROM r.grp
    """,
    tags=("join", "null-safe"),
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi join (<=> / IS NOT DISTINCT FROM): NULL keys MATCH
    each other instead of vanishing — the semantics you need when joining
    on nullable dimensions (unknown-bucket to unknown-bucket). Spark still
    plans a hash join on the null-safe key, so NULLs form one hash group
    rather than falling out of the join."""
    o = load_table(spark, sf_dir, "orders")
    grp = F.when(F.col("o_orderkey") % 7 == 0, F.lit(None).cast("long")).otherwise(
        F.col("o_orderkey") % 5
    )
    left = o.select("o_orderkey", grp.alias("grp"))
    tag = F.when(F.col("o_orderkey") % 7 == 0, F.lit("null-grp")).otherwise(
        F.concat(F.lit("grp-"), (F.col("o_orderkey") % 5).cast("string"))
    )
    right = o.select(grp.alias("rgrp"), tag.alias("tag")).distinct()
    return left.join(
        right, left.grp.eqNullSafe(right.rgrp)
    ).select("o_orderkey", "tag")


# ---- runtime Bloom-filter join (semi-join reduction before the shuffle) ----

_BLOOM_M = 1 << 18  # 256k bits -> 4k 64-bit words (~32 KB broadcast)
_BLOOM_K = 3


def _bloom_position(key: F.Column, i: int) -> F.Column:
    """Bit position for hash function i: xxhash64 seeded by i, mod M."""
    return F.pmod(F.xxhash64(F.lit(i), key), F.lit(_BLOOM_M))


@query(
    "join_bloom_prefilter",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS revenue_cents
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY o.o_orderpriority
    """,
    tags=("join", "bloom", "runtime-filter"),
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime Bloom-filter join: build a Bloom bitmap from the FILTERED
    dim side's join keys (customer ∩ BUILDING), broadcast the ~32 KB
    bitmap, and drop fact rows map-side BEFORE the join shuffle. This is
    the semi-join reduction that makes a 100 TB fact ⋈ too-big-to-broadcast
    dim affordable: the dim itself may need a shuffle join, but its Bloom
    always fits in a broadcast, and every fact row that cannot match dies
    at the scan. Spark's own `runtime.bloomFilter` optimization plans the
    same shape; building it explicitly keeps the reduction observable and
    engine-portable.

    Exactness: Bloom filters have NO false negatives and the real join
    runs after the prefilter, removing any false positives — so the result
    is bit-identical to the plain join and the oracle needs no Bloom model
    at all (the sketch is semantically transparent, unlike
    `agg_bloom_filter` which reports the sketch itself and is rows-only).

    Plan: bitmap build = one bit_or aggregate over ≤4k words on the small
    side; probe = 3 broadcast-hash word lookups + a bitwise test, all
    map-side on the fact (zero fact shuffle added); then the exact join +
    a fixed-point revenue aggregate."""
    o = load_table(spark, sf_dir, "orders")
    dim = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )

    members = dim.select(
        F.explode(
            F.array(*[_bloom_position(F.col("c_custkey"), i)
                      for i in range(_BLOOM_K)])
        ).alias("pos")
    )
    bitmap = (
        members.select(
            (F.col("pos") / 64).cast("long").alias("word"),
            F.expr("shiftleft(1L, CAST(pos % 64 AS INT))").alias("bit"),
        )
        .groupBy("word")
        .agg(F.bit_or("bit").alias("bits"))
    )

    probe = o
    for i in range(_BLOOM_K):
        probe = (
            probe.withColumn(f"pos{i}", _bloom_position(F.col("o_custkey"), i))
            .withColumn(f"w{i}", (F.col(f"pos{i}") / 64).cast("long"))
            .withColumn(
                f"b{i}",
                F.expr(f"shiftleft(1L, CAST(pos{i} % 64 AS INT))"),
            )
            .join(
                F.broadcast(
                    bitmap.select(
                        F.col("word").alias(f"word{i}"),
                        F.col("bits").alias(f"bits{i}"),
                    )
                ),
                F.col(f"w{i}") == F.col(f"word{i}"),
                "left",
            )
            .filter(
                F.coalesce(F.col(f"bits{i}"), F.lit(0)).bitwiseAND(
                    F.col(f"b{i}")
                ) != 0
            )
        )

    survivors = probe.select("o_orderkey", "o_custkey", "o_orderpriority",
                             "o_totalprice")
    joined = survivors.join(dim, survivors.o_custkey == dim.c_custkey, "inner")
    return joined.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("revenue_cents"),
    )


PIT_STALENESS_DAYS = 90


@query(
    "join_pit_staleness",
    oracle=f"""
    WITH o AS (
        SELECT o_custkey,
               CAST(o_orderdate AS TIMESTAMP) AS odate,
               max(o_orderkey) AS o_orderkey
        FROM orders GROUP BY o_custkey, CAST(o_orderdate AS TIMESTAMP)
    ), m AS (
        SELECT e.event_id, e.user_id, CAST(e.ts AS TIMESTAMP) AS ts,
               o.o_orderkey, o.odate
        FROM (SELECT * FROM events WHERE user_id % 20 = 0) e
        ASOF LEFT JOIN o
          ON e.user_id = o.o_custkey AND CAST(e.ts AS TIMESTAMP) >= o.odate
    )
    SELECT event_id, user_id,
           CASE WHEN odate >= ts - INTERVAL {PIT_STALENESS_DAYS} DAY
                THEN o_orderkey END AS feat_orderkey,
           CASE WHEN odate >= ts - INTERVAL {PIT_STALENESS_DAYS} DAY
                THEN CAST(date_diff('day', odate, ts) AS BIGINT) END
             AS feat_age_days
    FROM m
    """,
    tags=("join", "asof", "feature-store"),
)
def join_pit_staleness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time feature join with a staleness bound — the
    training-set construction rule of every feature store: each event
    (the label row) is enriched with the most recent order feature AS OF
    its timestamp (no leakage from the future), but only if that feature
    is fresher than {PIT_STALENESS_DAYS} days (stale features are worse
    than missing ones). join_asof's scalable union + last(ignorenulls)
    window carries the matched feature's own timestamp alongside, so the
    staleness gate is one map-side comparison after the window — still
    exactly one (key) shuffle, no range-join blowup. The oracle is
    DuckDB's native ASOF LEFT JOIN + the same gate: two different
    algorithms, identical rows."""
    o = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") % 20 == 0)
        .select("event_id", "user_id", "ts")
    )
    ev = e.select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        "event_id",
        F.lit(None).cast("long").alias("o_orderkey"),
        F.lit(None).cast("timestamp").alias("odate"),
        F.lit(1).alias("is_event"),
    )
    od = o.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("t"),
        F.lit(None).cast("long").alias("event_id"),
        "o_orderkey",
        F.col("o_orderdate").alias("odate"),
        F.lit(0).alias("is_event"),
    )
    w = (
        Window.partitionBy("k")
        .orderBy("t", "is_event", F.coalesce("o_orderkey", F.lit(-1)))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = ev.unionAll(od).select(
        "k",
        "t",
        "event_id",
        "is_event",
        F.last("o_orderkey", ignorenulls=True).over(w).alias("m_orderkey"),
        F.last("odate", ignorenulls=True).over(w).alias("m_odate"),
    )
    fresh = F.col("m_odate") >= (
        F.col("t") - F.expr(f"INTERVAL {PIT_STALENESS_DAYS} DAY")
    )
    return merged.filter(F.col("is_event") == 1).select(
        "event_id",
        F.col("k").alias("user_id"),
        F.when(fresh, F.col("m_orderkey")).alias("feat_orderkey"),
        F.when(
            fresh, F.datediff(F.col("t").cast("date"), F.col("m_odate").cast("date"))
        ).cast("long").alias("feat_age_days"),
    )


@query(
    "join_entity_resolution",
    oracle="""
    WITH probes AS (
        -- deterministically mangled names: drop one interior character
        SELECT c_custkey AS probe_id,
               substr(c_name, 1, 5 + CAST(c_custkey % 8 AS INTEGER))
               || substr(c_name, 7 + CAST(c_custkey % 8 AS INTEGER))
                 AS probe_name
        FROM customer WHERE c_custkey % 7 = 0
    )
    SELECT p.probe_id, p.probe_name, c.c_custkey AS matched_key,
           CAST(levenshtein(p.probe_name, c.c_name) AS BIGINT) AS dist
    FROM probes p JOIN customer c
      ON right(p.probe_name, 4) = right(c.c_name, 4)
     AND levenshtein(p.probe_name, c.c_name) <= 1
    """,
    tags=("join", "fuzzy", "entity-resolution"),
)
def join_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution fuzzy JOIN — dedup_fuzzy_levenshtein's
    cross-table sibling and the classic record-linkage shape: a probe
    set of corrupted names (one interior character dropped,
    deterministically) matched back to the master table by BLOCKING on
    the trailing 4 characters + an edit-distance ≤ 1 gate. The block key
    must be DISCRIMINATIVE: every name shares the 'Customer#' prefix, so
    a leading-prefix block is degenerate — one bucket holding the whole
    table, i.e. the cross product back again (measured ~100 s vs ~3 s at
    the 10× probe); the trailing digits split the table into ~10⁴
    buckets, and the drop position never reaches them, so the block
    loses no true match. Blocking is what makes
    fuzzy matching a JOIN instead of a cross product: candidates are
    only pairs agreeing on the block key (an equi-join Catalyst hash-
    partitions), and the expensive levenshtein runs per candidate, not
    per pair. Both engines implement the same Wagner–Fischer distance,
    so matches and distances are oracle-exact.

    Plan: one equi-join on the trailing-4-char block key; the edit distance
    is a post-join codegen filter. At 100 TB block-key skew is the
    watch item — the salting treatment (join_skew_salted) composes
    directly."""
    c = load_table(spark, sf_dir, "customer")
    cut = (F.lit(5) + (F.col("c_custkey") % 8)).cast("int")
    probes = c.filter(F.col("c_custkey") % 7 == 0).select(
        F.col("c_custkey").alias("probe_id"),
        F.concat(
            F.expr("substr(c_name, 1, 5 + CAST(c_custkey % 8 AS INT))"),
            F.expr("substr(c_name, 7 + CAST(c_custkey % 8 AS INT))"),
        ).alias("probe_name"),
    )
    return (
        probes.join(
            c,
            (
                F.expr("right(probe_name, 4)") == F.expr("right(c_name, 4)")
            )
            & (F.levenshtein(F.col("probe_name"), F.col("c_name")) <= 1),
        )
        .select(
            "probe_id",
            "probe_name",
            F.col("c_custkey").alias("matched_key"),
            F.levenshtein(F.col("probe_name"), F.col("c_name"))
            .cast("long")
            .alias("dist"),
        )
    )


# --- grid-bucketed spatial self-join ------------------------------------
# Synthetic 2-D point set: coordinates are Knuth multiplicative hashes of
# p_partkey — pure integer arithmetic, bit-identical in both engines (no
# hex parsing, no floats). Domain 1000x1000, cell = radius = 50 so any
# Chebyshev-within-radius pair lies in the same or an adjacent cell.
_SPG_DOMAIN = 1000
_SPG_R = 50
_SQL_SPG_POINTS = f"""
    pts AS (
        SELECT p_partkey AS k,
               (p_partkey * 2654435761) % 4294967296 % {_SPG_DOMAIN} AS x,
               (p_partkey * 40503 + 1013904223) % 4294967296
                   % {_SPG_DOMAIN} AS y
        FROM part
    ),
    cells AS (
        SELECT k, x, y, x // {_SPG_R} AS cx, y // {_SPG_R} AS cy FROM pts
    )
"""


@query(
    "join_spatial_grid",
    oracle=f"""
    WITH {_SQL_SPG_POINTS},
    cand AS (
        SELECT a.k AS ak, b.k AS bk, a.x AS ax, a.y AS ay,
               b.x AS bx, b.y AS by_, o.dx AS dx, o.dy AS dy
        FROM cells a
        JOIN (VALUES (0, 0), (0, 1), (1, -1), (1, 0), (1, 1)) AS o(dx, dy)
          ON true
        JOIN cells b
          ON b.cx = a.cx + o.dx AND b.cy = a.cy + o.dy
        WHERE (o.dx <> 0 OR o.dy <> 0) OR a.k < b.k
    )
    SELECT CAST(least(ak, bk) AS BIGINT) AS a_key,
           CAST(greatest(ak, bk) AS BIGINT) AS b_key,
           CAST((ax - bx) * (ax - bx) + (ay - by_) * (ay - by_) AS BIGINT)
               AS dist2
    FROM cand
    WHERE abs(ax - bx) <= {_SPG_R} AND abs(ay - by_) <= {_SPG_R}
    ORDER BY dist2 ASC, a_key ASC, b_key ASC LIMIT 20
    """,
    tags=("join", "spatial", "grid"),
)
def join_spatial_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-bucketed spatial self-join — all point pairs within Chebyshev
    radius 50 on a synthetic 1000×1000 point set, top-20 closest by
    squared Euclidean distance. The scale pattern is the point: cell size
    = radius means every qualifying pair shares a cell or touches an
    adjacent one, so candidates come from an EQUI-join on cell ids —
    never an all-pairs distance cross-join. The half-neighborhood trick
    cuts the candidate fan-out further: of each ±offset pair only one
    direction is probed ((0,1),(1,-1),(1,0),(1,1) + same-cell), so every
    cross-cell pair is generated exactly once (cell adjacency is
    antisymmetric under the offset set) and same-cell pairs are ordered
    by key — 5 probe offsets instead of 9. Coordinates are integer
    multiplicative hashes, so distances are exact BIGINTs.

    Plan: one scan builds the (key, x, y, cell) frame; the 5-offset
    expansion is a map-side Generate on the probe side; candidates come
    from ONE equi-join keyed on the 2-int cell id, then the exact radius
    test and a TakeOrderedAndProject top-20. At 100 TB cell occupancy is
    what bounds the join (domain/R² cells hold N points → N·9·density
    candidates), the same argument as the LSH band join — and a skewed
    hot cell salts exactly like any hot join key."""
    p = load_table(spark, sf_dir, "part").select("p_partkey")
    pts = p.select(
        F.col("p_partkey").cast("long").alias("k"),
        ((F.col("p_partkey").cast("long") * 2654435761) % 4294967296
         % _SPG_DOMAIN).alias("x"),
        ((F.col("p_partkey").cast("long") * 40503 + 1013904223) % 4294967296
         % _SPG_DOMAIN).alias("y"),
    )
    cells = pts.select(
        "k", "x", "y",
        F.expr(f"x DIV {_SPG_R}").alias("cx"),
        F.expr(f"y DIV {_SPG_R}").alias("cy"),
    )
    offsets = F.array(
        *[
            F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
            for dx, dy in ((0, 0), (0, 1), (1, -1), (1, 0), (1, 1))
        ]
    )
    probe = cells.select(
        F.col("k").alias("ak"), F.col("x").alias("ax"), F.col("y").alias("ay"),
        "cx", "cy", F.explode(offsets).alias("o"),
    ).select(
        "ak", "ax", "ay",
        (F.col("cx") + F.col("o.dx")).alias("tcx"),
        (F.col("cy") + F.col("o.dy")).alias("tcy"),
        "o.dx", "o.dy",
    )
    build = cells.select(
        F.col("k").alias("bk"), F.col("x").alias("bx"), F.col("y").alias("by_"),
        F.col("cx").alias("bcx"), F.col("cy").alias("bcy"),
    )
    cand = probe.join(
        build, (probe.tcx == build.bcx) & (probe.tcy == build.bcy)
    ).filter(
        ((F.col("dx") != 0) | (F.col("dy") != 0)) | (F.col("ak") < F.col("bk"))
    )
    within = cand.filter(
        (F.abs(F.col("ax") - F.col("bx")) <= _SPG_R)
        & (F.abs(F.col("ay") - F.col("by_")) <= _SPG_R)
    )
    d2 = (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx")) + (
        F.col("ay") - F.col("by_")
    ) * (F.col("ay") - F.col("by_"))
    return (
        within.select(
            F.least("ak", "bk").alias("a_key"),
            F.greatest("ak", "bk").alias("b_key"),
            d2.cast("long").alias("dist2"),
        )
        .orderBy(F.col("dist2").asc(), F.col("a_key").asc(), F.col("b_key").asc())
        .limit(20)
    )


@query(
    "join_asof_nearest",
    oracle="""
    WITH ord_d AS (
      SELECT o_custkey, o_orderdate,
             max(o_orderkey) AS o_orderkey
      FROM orders GROUP BY o_custkey, o_orderdate),
    e AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
    bk AS (SELECT e.event_id, o.o_orderkey AS k2, o.o_orderdate AS t2
           FROM e ASOF LEFT JOIN ord_d o
             ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate),
    fw AS (SELECT e.event_id, o.o_orderkey AS k2, o.o_orderdate AS t2
           FROM e ASOF LEFT JOIN ord_d o
             ON e.user_id = o.o_custkey AND e.ts < o.o_orderdate)
    SELECT e.event_id, e.user_id, e.ts,
           CASE WHEN bk.k2 IS NOT NULL AND (fw.k2 IS NULL
                     OR epoch_us(e.ts) - epoch_us(bk.t2)
                        <= epoch_us(fw.t2) - epoch_us(e.ts))
                THEN bk.k2 ELSE fw.k2 END AS nearest_orderkey,
           CASE WHEN bk.k2 IS NOT NULL AND (fw.k2 IS NULL
                     OR epoch_us(e.ts) - epoch_us(bk.t2)
                        <= epoch_us(fw.t2) - epoch_us(e.ts))
                THEN epoch_us(e.ts) - epoch_us(bk.t2)
                WHEN fw.k2 IS NOT NULL
                THEN epoch_us(fw.t2) - epoch_us(e.ts) END AS dist_us
    FROM e
    LEFT JOIN bk USING (event_id)
    LEFT JOIN fw USING (event_id)
    """,
    tags=("join", "asof", "nearest"),
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-match as-of join — each event pairs with the closest order
    in time on EITHER side (ties to the earlier order), the sensor-
    alignment / feature-matching variant of join_asof's backward-only
    rule. Spark has no native ASOF; the scalable formulation runs the
    union + window trick twice over ONE key exchange: an ascending pass
    carries the most recent earlier order forward (backward candidate),
    a descending pass carries the earliest later order backward (forward
    candidate, same-instant orders excluded — they belong to the
    backward side), and a map-side CASE picks the smaller µs distance.
    The oracle is two native DuckDB ASOF joins + the same CASE — two
    different algorithms, same rows. No range-join blowup, no pandas:
    at 100 TB the cost is one user-keyed shuffle and two sorted window
    passes over it."""
    o = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    ev = e.select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        "event_id",
        F.lit(None).cast("long").alias("okey"),
        F.lit(1).alias("is_event"),
    )
    od = o.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("t"),
        F.lit(None).cast("long").alias("event_id"),
        F.col("o_orderkey").alias("okey"),
        F.lit(0).alias("is_event"),
    )
    merged = ev.unionAll(od)
    # backward: orders sort BEFORE events at equal t (>= semantics)
    w_bk = (
        Window.partitionBy("k")
        .orderBy("t", "is_event")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # forward: walk time downward; events sort before orders at equal t
    # in the reversed order, so same-instant orders stay backward-only
    w_fw = (
        Window.partitionBy("k")
        .orderBy(F.col("t").desc(), F.col("is_event").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    us = F.unix_micros(F.col("t").cast("timestamp"))
    ann = merged.select(
        "k",
        "t",
        "event_id",
        "is_event",
        F.last("okey", ignorenulls=True).over(w_bk).alias("bk_key"),
        F.last(F.when(F.col("okey").isNotNull(), us), ignorenulls=True)
        .over(w_bk)
        .alias("bk_us"),
        F.last("okey", ignorenulls=True).over(w_fw).alias("fw_key"),
        F.last(F.when(F.col("okey").isNotNull(), us), ignorenulls=True)
        .over(w_fw)
        .alias("fw_us"),
    )
    ev_us = F.unix_micros(F.col("t").cast("timestamp"))
    bk_d = ev_us - F.col("bk_us")
    fw_d = F.col("fw_us") - ev_us
    take_bk = F.col("bk_key").isNotNull() & (
        F.col("fw_key").isNull() | (bk_d <= fw_d)
    )
    return ann.filter(F.col("is_event") == 1).select(
        "event_id",
        F.col("k").alias("user_id"),
        F.col("t").alias("ts"),
        F.when(take_bk, F.col("bk_key"))
        .otherwise(F.col("fw_key"))
        .alias("nearest_orderkey"),
        F.when(take_bk, bk_d)
        .when(F.col("fw_key").isNotNull(), fw_d)
        .alias("dist_us"),
    )
