"""Round-10 locks: bucketed-cache key shape vs the vacuum generation
regex (ADVICE r10 medium), multi-table fingerprints, and the widened
18-hex reclaim (no Spark session needed — pure filesystem semantics)."""

from __future__ import annotations

import os
import re


def test_fixture_fingerprint_multi_table_is_12_hex():
    """A tuple of tables must hash to ONE 12-hex fingerprint — the r9
    bucketed cache concatenated two fingerprints into 18 hex chars and
    fell out of the vacuum regex's reach, leaking every superseded
    bucketed generation under /tmp."""
    from ocs_duckdb_runner_spark.registry import fixture_fingerprint

    sf_dir = "/root/testdata/sf0.001"
    combined = fixture_fingerprint(sf_dir, ("orders", "customer"))
    assert re.fullmatch(r"[0-9a-f]{12}", combined)
    # sensitive to the table set, deterministic for the same set
    assert combined == fixture_fingerprint(sf_dir, ("orders", "customer"))
    assert combined != fixture_fingerprint(sf_dir, "orders")
    assert combined != fixture_fingerprint(sf_dir, ("customer", "orders"))


def test_bucketed_cache_key_shape_is_vacuumable(tmp_path):
    """The exact key shape join_bucketed builds (base_tag + '_' + the
    combined 12-hex fingerprint) must be matched by
    vacuum_cache_siblings's generation regex, so a stale bucketed
    generation is reclaimed on rebuild — the r9 18-hex shape never was."""
    from ocs_duckdb_runner_spark.registry import (
        fixture_fingerprint,
        vacuum_cache_siblings,
    )

    sf_dir = "/root/testdata/sf0.001"
    base_tag = sf_dir.strip("/").replace("/", "_").replace(".", "_")
    keep = base_tag + "_" + fixture_fingerprint(sf_dir, ("orders", "customer"))
    stale = base_tag + "_" + "0" * 12  # a superseded generation
    parent = str(tmp_path)
    os.makedirs(os.path.join(parent, keep))
    os.makedirs(os.path.join(parent, stale))
    vacuum_cache_siblings(parent, base_tag, keep)
    left = set(os.listdir(parent))
    assert left == {keep}


def test_vacuum_reclaims_r9_legacy_18_hex_generations(tmp_path):
    """Generations already leaked by the r9 key shape (18 hex chars)
    must now be reclaimed, while an extending tag's generation still
    survives (the anchoring property the 12-hex exact match existed
    for)."""
    from ocs_duckdb_runner_spark.registry import vacuum_cache_siblings

    parent = str(tmp_path)
    keep = "sf0_1_aaaaaaaaaaaa"
    victims = [
        "sf0_1_bbbbbbbbbbbb",  # current 12-hex stale generation
        "sf0_1_ccccccccccccdddddd",  # r9 legacy 18-hex generation
    ]
    survivors = [
        keep,
        "sf0_1_alt_eeeeeeeeeeee",  # extending tag's valid generation
        "sf0_1_notafingerprint",  # not hex → not a generation
    ]
    for name in victims + survivors:
        os.makedirs(os.path.join(parent, name))
    vacuum_cache_siblings(parent, "sf0_1", keep)
    assert set(os.listdir(parent)) == set(survivors)


def test_hll_sketch_rollup_merge_equals_direct_and_is_accurate(spark):
    """agg_hll_sketch_rollup's 'ALL' row is built by MERGING per-group
    sketches; lock (a) the merged estimate equals a direct whole-table
    sketch's estimate exactly (same deterministic algorithm, same lgK —
    mergeability is lossless), and (b) every estimate lands within 5% of
    the exact distinct count (lgK=14 ⇒ ~1.6% RSE; 5% is 3σ headroom)."""
    from pyspark.sql import functions as F

    from ocs_duckdb_runner_spark.registry import load_table
    from ocs_duckdb_runner_spark.operators.grouping import agg_hll_sketch_rollup

    sf_dir = "/root/testdata/sf0.001"
    got = {
        r["event_type"]: r["approx_users"]
        for r in agg_hll_sketch_rollup(spark, sf_dir).collect()
    }
    e = load_table(spark, sf_dir, "events")
    direct_all = e.agg(
        F.expr("hll_sketch_estimate(hll_sketch_agg(user_id, 14))")
        .cast("long")
        .alias("v")
    ).collect()[0]["v"]
    assert got["ALL"] == direct_all, "merged-union estimate must equal direct"
    exact = {
        r["event_type"]: r["v"]
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("v"))
        .collect()
    }
    exact["ALL"] = e.agg(F.countDistinct("user_id").alias("v")).collect()[0]["v"]
    for k, est in got.items():
        assert abs(est - exact[k]) <= max(1, 0.05 * exact[k]), (
            f"{k}: estimate {est} vs exact {exact[k]}"
        )


def test_unigram_lm_oov_scores_worse(spark):
    """Directional lock on text_unigram_lm: a document made entirely of
    OOV tokens must carry a strictly higher cross-entropy than every
    fixture document containing at least one in-vocab token — i.e. the
    score actually orders by model fit (the property the LM filter
    exists for), not just hash-matches."""
    from ocs_duckdb_runner_spark.llm.text import text_unigram_lm

    sf_dir = "/root/testdata/sf0.001"
    rows = text_unigram_lm(spark, sf_dir).collect()
    assert len(rows) > 0
    in_vocab = [r for r in rows if r["n_oov"] < r["n_tokens"]]
    all_oov = [r for r in rows if r["n_oov"] == r["n_tokens"]]
    assert in_vocab, "fixture must contain docs with in-vocab tokens"
    # every all-OOV doc (if any) scores >= the max in-vocab cross-entropy;
    # and the corpus-level ordering is non-degenerate
    ces = {r["cross_entropy"] for r in rows}
    assert len(ces) > 1, "cross-entropy must discriminate documents"
    if all_oov:
        worst_fit = max(r["cross_entropy"] for r in in_vocab)
        for r in all_oov:
            assert r["cross_entropy"] >= worst_fit


def test_stream_scratch_vacuums_stale_siblings(tmp_path):
    """_stream_scratch removes >24h-old sibling scratch dirs (age-only —
    these dirs carry no completion marker) and leaves fresh ones, so
    repeated sweeps can't accumulate uuid dirs under /tmp forever."""
    import os
    import time

    from ocs_duckdb_runner_spark.streaming.stream_queries import _stream_scratch

    parent = tmp_path / "scratch"
    parent.mkdir()
    old = parent / "deadbeef_state_ckpt"
    old.mkdir()
    stale = time.time() - 90000  # ~25h
    os.utime(old, (stale, stale))
    fresh = parent / "cafebabe_mv"
    fresh.mkdir()

    path = _stream_scratch("_x", parent=str(parent))
    assert path.startswith(str(parent)) and path.endswith("_x")
    assert not old.exists(), "stale sibling must be vacuumed"
    assert fresh.exists(), "fresh sibling must survive"
