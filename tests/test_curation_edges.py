"""Edge-case unit tests for the curation operators: degenerate documents
(single-token, exactly-one-window, stride-boundary lengths) that the
fixture corpus may not contain. These lock the guards that are easy to
break silently — especially Spark's sequence(), which counts DOWN when
start > stop, so an unguarded `sequence(1, n-1)` on a 1-token doc emits
[1, 0] instead of nothing."""

from __future__ import annotations

import os

import pytest

from ocs_duckdb_runner_spark.registry import get_query


@pytest.fixture(scope="module")
def edge_dir(spark, tmp_path_factory):
    """A tiny documents table with adversarial token counts: 1 token (the
    sequence-guard case), exactly one chunk window (64), one past the
    stride boundary (65), a stride multiple (96), and a normal doc."""
    out = str(tmp_path_factory.mktemp("edges"))
    rows = [
        (1, "solo", "en", "srcA", 4),
        (2, " ".join(f"t{i}" for i in range(64)), "en", "srcA", 0),
        (3, " ".join(f"u{i}" for i in range(65)), "en", "srcB", 0),
        (4, " ".join(f"v{i}" for i in range(96)), "de", "srcB", 0),
        (5, "alpha beta gamma delta epsilon", "de", "srcC", 0),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    return out


def test_chunk_documents_degenerate_lengths(spark, edge_dir):
    got = {
        (r.doc_id, r.chunk_idx): r.n_tokens
        for r in get_query("chunk_documents").fn(spark, edge_dir).collect()
    }
    # 1 token -> exactly one 1-token chunk
    assert got[(1, 0)] == 1 and (1, 1) not in got
    # exactly W tokens -> one full chunk, no ragged tail
    assert got[(2, 0)] == 64 and (2, 1) not in got
    # W+1 tokens -> second chunk holds the 17 tokens from start=48
    assert got[(3, 0)] == 64 and got[(3, 1)] == 17 and (3, 2) not in got
    # 2*stride tokens -> two chunks: 64 then 48
    assert got[(4, 0)] == 64 and got[(4, 1)] == 48 and (4, 2) not in got


def test_text_ngram_stats_single_token_doc_emits_no_bigrams(spark, edge_dir):
    rows = get_query("text_ngram_stats").fn(spark, edge_dir).collect()
    # doc 1 ("solo") contributes nothing; en bigrams come from docs 2/3 only
    assert all(" " in r.bigram for r in rows)
    assert not any("solo" in r.bigram for r in rows)
    # ranks are 1..<=5 per lang, dense
    by_lang: dict[str, list[int]] = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r.rank)
    for ranks in by_lang.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))


def test_text_boilerplate_unique_docs_have_zero_boiler(spark, edge_dir):
    rows = {
        r.doc_id: r for r in get_query("text_boilerplate").fn(spark, edge_dir).collect()
    }
    # all five docs are pairwise distinct -> nothing reaches the >=3-doc bar
    assert all(r.n_boiler == 0 for r in rows.values())
    # kept_tokens equals the doc's token count (no segment dropped)
    assert rows[1].kept_tokens == 1
    assert rows[2].kept_tokens == 64
    assert rows[5].kept_tokens == 5


def test_corpus_token_budget_keeps_boundary_doc(spark, edge_dir):
    rows = {
        r.source: r
        for r in get_query("corpus_token_budget").fn(spark, edge_dir).collect()
    }
    # every source here is far under the 2000-token budget: all docs kept
    assert rows["srcA"].docs_kept == 2 and rows["srcA"].tokens_kept == 65
    assert rows["srcB"].docs_kept == 2 and rows["srcB"].tokens_kept == 161
    assert rows["srcC"].docs_kept == 1 and rows["srcC"].tokens_kept == 5


def test_chunk_fingerprints_are_chunk_local(spark, edge_dir):
    """Two docs sharing a 64-token prefix window must produce the same
    chunk_fp for that window — the property downstream chunk-level dedup
    relies on."""
    import pyspark.sql.functions as F

    out = str(tmp := os.path.join(edge_dir, "twin"))
    spark.createDataFrame(
        [
            (10, " ".join(f"t{i}" for i in range(64)), "en", "s", 0),
            (11, " ".join(f"t{i}" for i in range(64)) + " extra", "en", "s", 0),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(f"{out}/documents.parquet")
    rows = get_query("chunk_documents").fn(spark, out).collect()
    fp0 = {r.chunk_idx: r.chunk_fp for r in rows if r.doc_id == 10}
    fp1 = {r.chunk_idx: r.chunk_fp for r in rows if r.doc_id == 11}
    assert fp0[0] == fp1[0]  # identical first window
    assert 1 in fp1 and fp1[1] != fp0[0]  # the ragged tail differs
