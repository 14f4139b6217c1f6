"""Round-8 locks: the size-gated HITS driver path must agree bit-for-bit
with the distributed (over-gate) loop it stands in for, and the gate must
collect only the collapsed edge list, never fact-table-sized data."""

from __future__ import annotations

import ocs_duckdb_runner_spark.operators.graph as G
from tests.conftest import SF_DIR


def test_hits_driver_and_distributed_paths_agree(spark, monkeypatch):
    gated = G.graph_hits(spark, SF_DIR).collect()
    # force the distributed loop (gate of 0 edges)
    monkeypatch.setattr(G, "DRIVER_GRAPH_MAX_EDGES", 0)
    dist = G.graph_hits(spark, SF_DIR).collect()
    key = lambda r: (r["nationkey"], r["auth_micro"], r["hub_micro"])
    assert sorted(map(key, gated)) == sorted(map(key, dist))
    assert len(gated) == 25


def test_pagerank_driver_and_distributed_paths_agree(spark, monkeypatch):
    gated = G.graph_pagerank(spark, SF_DIR).collect()
    monkeypatch.setattr(G, "DRIVER_GRAPH_MAX_EDGES", 0)
    dist = G.graph_pagerank(spark, SF_DIR).collect()
    key = lambda r: (r["nationkey"], r["pr_micro"])
    assert sorted(map(key, gated)) == sorted(map(key, dist))
    assert len(gated) == 25


def test_prefix_truncation_planted_pairs(spark):
    """Planted truncated copies are found directionally; a hot shared
    head beyond PREFIX_BUCKET_CAP is dropped from candidate generation."""
    import ocs_duckdb_runner_spark.llm.dedup as D

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 4
    rows = [
        (0, base),                      # full doc
        (1, base[:80]),                 # truncated copy of 0
        (2, base[:120]),                # longer truncation of 0
        (3, "x" * 60),                  # unrelated, no partner
        (4, base[:80]),                 # exact dup of 1 -> NOT a pair
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["short_doc_id"], r["long_doc_id"])
        for r in D._prefix_truncation_pairs(df).collect()
    }
    assert got == {(1, 0), (2, 0), (1, 2), (4, 0), (4, 2)}

    # hot-head bucket: CAP+2 docs share the first PREFIX_P chars; the
    # whole bucket must produce zero candidates
    head = "h " * (D.PREFIX_P // 2)
    hot = [(100 + i, head + f"tail {i} " * 3) for i in range(D.PREFIX_BUCKET_CAP + 2)]
    hot_df = spark.createDataFrame(hot, ["doc_id", "text"])
    assert D._prefix_truncation_pairs(hot_df).count() == 0


def test_prefix_truncation_random_corpus_vs_bruteforce(spark):
    """Seeded random corpus: the distributed pair-finder must equal a
    Python brute-force over all ordered pairs (strict-prefix relation,
    head-bucket cap applied identically)."""
    import hashlib
    import random

    import ocs_duckdb_runner_spark.llm.dedup as D

    rng = random.Random(8)
    words = [f"w{i}" for i in range(30)]
    docs = []
    for i in range(120):
        n = rng.randint(15, 60)
        docs.append((i, " ".join(rng.choice(words) for _ in range(n))))
    # plant truncations and shared heads
    for i in range(120, 150):
        src = rng.randrange(120)
        cut = rng.randint(D.PREFIX_P, max(D.PREFIX_P, len(docs[src][1]) - 1))
        docs.append((i, docs[src][1][:cut]))

    def brute():
        buckets: dict[str, list[tuple[int, str]]] = {}
        for did, text in docs:
            key = hashlib.md5(text[: D.PREFIX_P].encode()).hexdigest()
            buckets.setdefault(key, []).append((did, text))
        pairs = set()
        for members in buckets.values():
            if len(members) > D.PREFIX_BUCKET_CAP:
                continue
            for a, ta in members:
                for b, tb in members:
                    if len(ta) < len(tb) and tb.startswith(ta):
                        pairs.add((a, b))
        return pairs

    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        (r["short_doc_id"], r["long_doc_id"])
        for r in D._prefix_truncation_pairs(df).collect()
    }
    expected = brute()
    assert got == expected
    assert expected, "seed must produce at least one pair"


def test_python_datasource_partition_parallelism(spark):
    """The custom Python source must plan ONE task per InputPartition —
    the property that gives a bespoke format real executor parallelism
    instead of a single-threaded driver read (the 100 TB point of the
    DataSource API)."""
    from ocs_duckdb_runner_spark.registry import get_query
    from ocs_duckdb_runner_spark.sources.python_datasource import N_PARTS

    df = get_query("src_python_datasource").fn(spark, "")
    assert df.rdd.getNumPartitions() == N_PARTS
    # shard boundaries land where the partition plan says they should
    assert df.count() == 10_000


def test_python_sink_commit_protocol(spark, tmp_path):
    """Drive the custom sink's writer protocol directly: an ABORTED
    attempt's part files are removed, an orphan file from a zombie task
    is never listed, and commit() publishes exactly the committed parts.
    (Local mode can't exercise real task retries — maxFailures=1 — so
    the protocol is locked at the unit level; the oracle checks the
    integrated path.)"""
    import json
    import os

    from pyspark.sql import Row

    from ocs_duckdb_runner_spark.sources.python_datasource import (
        _make_sink_source,
    )

    src = _make_sink_source()(options={"path": str(tmp_path)})
    w = src.writer("a bigint", overwrite=False)

    ok = w.write(iter([Row(a=1), Row(a=2)]))
    # a second attempt of the same task succeeds too, then one aborts
    dup = w.write(iter([Row(a=1), Row(a=2)]))
    w.abort([dup])
    assert not os.path.exists(os.path.join(str(tmp_path), dup.name))
    # zombie-task orphan: written but never committed
    zombie = w.write(iter([Row(a=99)]))
    w.commit([ok])
    with open(os.path.join(str(tmp_path), "_manifest.json")) as fh:
        manifest = json.load(fh)
    assert manifest == [ok.name]
    assert zombie.name not in manifest
    # reader side trusts the manifest: only committed rows are visible
    rows = []
    for p in manifest:
        with open(os.path.join(str(tmp_path), p)) as fh:
            rows += [json.loads(line)["a"] for line in fh]
    assert sorted(rows) == [1, 2]


def test_python_stream_sink_epoch_commit_is_idempotent(spark, tmp_path):
    """A replayed epoch (crash between sink commit and checkpoint commit)
    re-runs commit(messages, batchId) with the same batch id — the
    manifest for that id is overwritten with identical content, never
    double-published under a new name."""
    import json
    import os

    from pyspark.sql import Row

    from ocs_duckdb_runner_spark.sources.python_datasource import (
        _make_stream_sink_source,
    )

    src = _make_stream_sink_source()(options={"path": str(tmp_path)})
    w = src.streamWriter("a bigint", overwrite=False)
    m1 = w.write(iter([Row(a=1)]))
    w.commit([m1], batchId=0)
    # replay of epoch 0 with a fresh attempt's part
    m1b = w.write(iter([Row(a=1)]))
    w.commit([m1b], batchId=0)
    manifests = [
        f for f in os.listdir(str(tmp_path)) if f.startswith("_manifest-")
    ]
    assert manifests == ["_manifest-0.json"]
    with open(os.path.join(str(tmp_path), "_manifest-0.json")) as fh:
        listed = json.load(fh)
    # exactly ONE part listed for the epoch; its content is the epoch's rows
    assert len(listed) == 1
    with open(os.path.join(str(tmp_path), listed[0])) as fh:
        assert [json.loads(line)["a"] for line in fh] == [1]
