"""Semantic tests for similarity search: planted near-identical embeddings
must land in the same LSH bucket and rank first in cosine top-k; the ANN
probe must agree with brute force on planted structure."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from ocs_duckdb_runner_spark.llm.similarity import (
    DIM,
    cosine,
    fp_vec,
    lsh_bucket,
)


@pytest.fixture(scope="module")
def vecs(spark):
    rng = random.Random(123)
    base = [rng.uniform(-1, 1) for _ in range(DIM)]
    near = list(base)
    near[0] += 0.01  # tiny perturbation → cosine ≈ 1
    anti = [-x for x in base]  # cosine = -1
    ortho = [rng.uniform(-1, 1) for _ in range(DIM)]
    rows = [(0, base), (1, near), (2, anti), (3, ortho)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _cos_py(a, b):
    dot = sum(x * y for x, y in zip(a, b))
    return dot / math.sqrt(sum(x * x for x in a)) / math.sqrt(sum(y * y for y in b))


def test_fixed_point_cosine_matches_python(vecs):
    rows = vecs.collect()
    emb = {r.vec_id: list(r.embedding) for r in rows}
    q = vecs.filter(F.col("vec_id") == 0).select(
        fp_vec(F.col("embedding")).alias("qv")
    )
    got = {
        r.vec_id: r.cos
        for r in vecs.select("vec_id", fp_vec(F.col("embedding")).alias("ev"))
        .crossJoin(F.broadcast(q))
        .select("vec_id", cosine(F.col("ev"), F.col("qv")).alias("cos"))
        .collect()
    }
    for vid, e in emb.items():
        assert abs(got[vid] - _cos_py(emb[0], e)) < 1e-6
    assert got[1] > 0.999
    assert got[2] < -0.999


def test_lsh_bucket_groups_near_vectors(vecs):
    buckets = {
        r.vec_id: r.bucket
        for r in vecs.select(
            "vec_id", lsh_bucket(fp_vec(F.col("embedding")), 8).alias("bucket")
        ).collect()
    }
    assert buckets[0] == buckets[1]  # near-identical vectors share bucket
    # antipodal vector flips every plane sign → complementary bucket
    assert buckets[2] == (~buckets[0]) & 0xFF


def test_n_planes_scales_with_corpus_size():
    """The r6 verdict's fixed-constant hazard: plane count must GROW with
    N so per-bucket pairs stay bounded — bucket count ≈ N/TARGET, i.e.
    total candidate-pair work ~N·TARGET, linear in N."""
    from ocs_duckdb_runner_spark.llm.similarity import (
        LSH_TARGET_BUCKET,
        MAX_PLANES,
        MIN_PLANES,
        n_planes_for,
    )

    assert n_planes_for(1) == MIN_PLANES
    assert n_planes_for(500) == 5  # sf0.01 embeddings → 32 buckets
    assert n_planes_for(2000) == 7  # sf0.1 (10× probe) → 128 buckets
    # monotone non-decreasing, and bucket size stays near TARGET
    prev = 0
    for n in (10, 100, 10_000, 10_000_000, 10_000_000_000):
        p = n_planes_for(n)
        assert p >= prev
        prev = p
        if p < MAX_PLANES:
            assert n / (1 << p) <= LSH_TARGET_BUCKET
    assert n_planes_for(10**12) == MAX_PLANES  # clamped, never unbounded


def test_sql_np_cte_matches_python(duck):
    """The oracle's CASE chain must agree with n_planes_for on every
    corpus size — the cross-engine contract behind dynamic plane count."""
    from ocs_duckdb_runner_spark.llm.similarity import _SQL_NP_CTE, n_planes_for

    for n in (1, 15, 16, 17, 500, 2000, 65_536, 10**9):
        sql = (
            "WITH embeddings AS (SELECT * FROM range(%d)), %s SELECT np FROM par"
            % (n, _SQL_NP_CTE)
        )
        got = duck.sql(sql).fetchone()[0]
        assert got == n_planes_for(n), n
