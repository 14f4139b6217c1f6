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
            "vec_id", lsh_bucket(fp_vec(F.col("embedding"))).alias("bucket")
        ).collect()
    }
    assert buckets[0] == buckets[1]  # near-identical vectors share bucket
    # antipodal vector flips every plane sign → complementary bucket
    assert buckets[2] == (~buckets[0]) & 0xFF
