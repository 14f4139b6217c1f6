"""Semantic tests for the oracle-exempt dedup operators: planted
near-duplicates must be found, unrelated documents must not pair up."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ocs_duckdb_runner_spark.llm.dedup import (
    minhash_candidates,
    shingles,
    simhash_fingerprints,
)


@pytest.fixture(scope="module")
def planted(spark):
    base = (
        "the quick brown fox jumps over the lazy dog while the cat watches "
        "from the warm window sill and the birds sing in the garden trees"
    )
    near = base.replace("warm", "cold")  # one-token edit → high jaccard
    other = (
        "completely different content about spark shuffle partitions and "
        "broadcast hash joins running on large distributed clusters today"
    )
    rows = [(1, base), (2, near), (3, other), (4, base)]  # 4 = exact dup of 1
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_finds_planted_near_dups(planted):
    docs = planted.select(
        "doc_id", shingles(F.split(F.col("text"), " ")).alias("sh")
    )
    pairs = {
        (r.doc_a, r.doc_b) for r in minhash_candidates(docs).collect()
    }
    assert (1, 4) in pairs  # exact dup always collides
    assert (1, 2) in pairs or (2, 4) in pairs  # near-dup caught by LSH
    assert not any(3 in p for p in pairs)  # unrelated doc never pairs


def test_simhash_hamming_close_for_near_dups(planted):
    fps = {
        r.doc_id: r.fp
        for r in simhash_fingerprints(
            planted, F.split(F.col("text"), " ")
        ).collect()
    }
    ham = lambda a, b: bin((a ^ b) & (2**64 - 1)).count("1")  # noqa: E731
    assert fps[1] == fps[4]  # identical text → identical fingerprint
    assert ham(fps[1], fps[2]) <= 6  # one-token edit → few bits flip
    assert ham(fps[1], fps[3]) > 10  # unrelated text → far fingerprint


def test_minhash_deterministic_across_runs(planted):
    docs = planted.select(
        "doc_id", shingles(F.split(F.col("text"), " ")).alias("sh")
    )
    a = sorted(map(tuple, minhash_candidates(docs).collect()))
    b = sorted(map(tuple, minhash_candidates(docs).collect()))
    assert a == b


def test_cluster_transitivity(spark, tmp_path):
    """A∼B and B∼C (but A≁C directly) must land in ONE cluster with one
    keeper — the property pair-level dedup can't deliver."""
    words = [f"w{i}" for i in range(30)]
    a = " ".join(words)
    b = " ".join(words[:24] + [f"x{i}" for i in range(6)])   # ~0.57 jaccard vs a
    c = " ".join(words[18:24] + [f"x{i}" for i in range(6)]
                 + [f"y{i}" for i in range(12)])             # overlaps b, not a enough
    lone = " ".join(f"z{i}" for i in range(30))
    rows = [(1, a, "en", "s", len(a)), (2, b, "en", "s", len(b)),
            (3, c, "en", "s", len(c)), (9, lone, "en", "s", len(lone))]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path / "docs")
    df.coalesce(1).write.parquet(f"{d}/documents.parquet")

    from ocs_duckdb_runner_spark.llm.dedup import (
        dedup_clusters,
        dedup_ngram_jaccard,
    )

    pairs = {(r.doc_a, r.doc_b) for r in
             dedup_ngram_jaccard(spark, d).select("doc_a", "doc_b").collect()}
    assert (1, 2) in pairs and (2, 3) in pairs
    assert (1, 3) not in pairs  # a and c are NOT directly similar

    got = {r.doc_id: (r.cluster, r.is_keeper)
           for r in dedup_clusters(spark, d).collect()}
    assert got[1] == (1, True)
    assert got[2] == (1, False)
    assert got[3] == (1, False)  # transitive closure pulled c into 1
    assert got[9] == (9, True)   # singleton keeps itself


def test_union_find_min_root():
    """Driver-side CC labels every node with the MINIMUM id in its
    component regardless of edge order (union by arbitrary root does not
    guarantee this without the re-root pass)."""
    from ocs_duckdb_runner_spark.llm.dedup import _union_find_labels

    # chain presented max-first, plus a separate component
    lbl = _union_find_labels([(9, 7), (7, 5), (5, 3), (3, 1), (20, 10)])
    assert lbl == {9: 1, 7: 1, 5: 1, 3: 1, 1: 1, 20: 10, 10: 10}


def test_propagate_min_label_matches_union_find(spark):
    """The distributed fix-point path (used above DRIVER_CC_MAX_EDGES)
    agrees with driver union-find on a multi-hop chain — a graph whose
    diameter forces several propagation rounds."""
    from ocs_duckdb_runner_spark.llm.dedup import (
        _propagate_min_label,
        _union_find_labels,
    )
    from pyspark.sql import functions as F

    pairs = [(i, i + 1) for i in range(1, 8)] + [(100, 101), (101, 102)]
    und = spark.createDataFrame(pairs, "src long, dst long")
    edges = und.union(und.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    got = {r.doc_id: r.lbl for r in _propagate_min_label(edges, width=2).collect()}
    assert got == _union_find_labels(pairs)


def test_fuzzy_hot_block_bounded(spark, tmp_path):
    """A boilerplate prefix shared by a pile of same-length docs must NOT
    recreate O(b^2) pairs (the block is dropped as non-discriminative),
    while genuine near-dups elsewhere — including a pair straddling a
    length-bucket boundary — are still found."""
    from ocs_duckdb_runner_spark.llm.dedup import (
        FUZZY_LEN_BUCKET,
        FUZZY_MAX_BLOCK,
        dedup_fuzzy_levenshtein,
    )

    boiler = "COMMON-HEADER-XY"  # 16 chars: one shared prefix block
    assert len(boiler) == 16
    rows = []
    # hot block: FUZZY_MAX_BLOCK+20 docs, same prefix, same length bucket
    for i in range(FUZZY_MAX_BLOCK + 20):
        t = boiler + f" body {i:04d} " + "z" * 40
        rows.append((i, t, "en", "s", len(t)))
    # genuine near-dup pair, rare prefix, same bucket
    a = "RARE-PREFIX-ONE! " + "q" * 50
    b = a[:-1] + "r"  # 1 edit
    rows += [(1000, a, "en", "s", len(a)), (1001, b, "en", "s", len(b))]
    # near-dup pair straddling a length-bucket boundary: lengths K*16-1
    # and K*16+2 land in adjacent buckets; heads differ by 3 edits
    base = "BOUNDARY-PAIR-AB " + "m" * 100
    c = base[: 6 * FUZZY_LEN_BUCKET - 1]
    d = (base + "mmm")[: 6 * FUZZY_LEN_BUCKET + 2]
    assert len(c) // FUZZY_LEN_BUCKET + 1 == len(d) // FUZZY_LEN_BUCKET
    rows += [(2000, c, "en", "s", len(c)), (2001, d, "en", "s", len(d))]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    p = str(tmp_path / "docs")
    df.coalesce(1).write.parquet(f"{p}/documents.parquet")

    got = {(r.doc_a, r.doc_b) for r in dedup_fuzzy_levenshtein(spark, p).collect()}
    assert (1000, 1001) in got        # rare-prefix pair found
    assert (2000, 2001) in got        # adjacency probe caught the straddle
    assert all(x >= 1000 for pair in got for x in pair)  # hot block: 0 pairs


def test_df_cap_bounds_hot_shingle_pairs(spark):
    # SHINGLE_DF_CAP contract: a shingle hotter than the cap contributes
    # ZERO candidate pairs (it leaves the representation entirely — the
    # n_sh denominators shrink with it), while sub-cap shingles behave
    # exactly as uncapped. 50 docs sharing one viral shingle would emit
    # C(50,2)=1225 pairs uncapped — the quadratic straggler the cap kills.
    from ocs_duckdb_runner_spark.llm.dedup import _jaccard_pairs_from_sh

    rows = []
    for i in range(50):
        rows.append((i, 777))        # the hot shingle, df=50
        rows.append((i, 1000 + i))   # one unique shingle per doc
    # a legitimate near-dup pair below the cap: docs 100/101 share 2 of 3
    rows += [(100, 1), (100, 2), (100, 3), (101, 1), (101, 2), (101, 9)]
    sh = spark.createDataFrame(rows, "doc_id long, shingle long")

    uncapped = _jaccard_pairs_from_sh(sh, df_cap=10**9).collect()
    assert len(uncapped) == 1225 + 1  # hot block all-pairs + planted pair

    capped = _jaccard_pairs_from_sh(sh, df_cap=10).collect()
    got = {(r.doc_a, r.doc_b): (r.shared, r.jaccard) for r in capped}
    assert got == {(100, 101): (2, 0.5)}  # hot block gone, planted intact


def test_propagate_min_label_converges_past_30_rounds(spark):
    """A 40-link chain has diameter beyond the old fixed 30-round cap,
    which fell through SILENTLY with unconverged labels (duplicates
    retained, oracle diverged); propagation now iterates to convergence,
    so every node must carry the chain head's label."""
    from ocs_duckdb_runner_spark.llm.dedup import _propagate_min_label

    und = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "src long, dst long"
    )
    edges = und.union(und.selectExpr("dst as src", "src as dst"))
    got = {
        r.doc_id: r.lbl
        for r in _propagate_min_label(edges, width=2).collect()
    }
    assert len(got) == 41
    assert set(got.values()) == {0}


def test_propagate_min_label_releases_per_round_checkpoints(spark):
    """Each round's localCheckpoint blocks must be explicitly released
    once superseded (ADVICE r10): a diameter-40 run makes ~41 rounds, so
    without the release executor storage holds ~41 pinned label frames
    until driver GC. After the run, the loop may leave at most the FINAL
    labels checkpoint pinned beyond what was pinned before."""
    from ocs_duckdb_runner_spark.llm.dedup import _propagate_min_label

    sc = spark.sparkContext

    def pinned_ids():
        return {i.id() for i in sc._jsc.sc().getRDDStorageInfo()}

    before = pinned_ids()
    und = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "src long, dst long"
    )
    edges = und.union(und.selectExpr("dst as src", "src as dst"))
    out = _propagate_min_label(edges, width=2)
    assert out.count() == 41  # materialized, still readable post-release
    leftover = pinned_ids() - before
    # ≤ 1 new pinned RDD: the final labels checkpoint the caller consumes
    assert len(leftover) <= 1, (
        f"{len(leftover)} checkpoint RDDs leaked from the CC loop"
    )


def test_release_local_checkpoint_frees_blocks_and_is_safe_on_plain_df(
    spark,
):
    """release_local_checkpoint must drop a checkpointed frame's storage
    deterministically, and degrade to a no-op on a non-checkpointed
    frame (best-effort contract)."""
    from pyspark.sql import functions as F

    from ocs_duckdb_runner_spark.registry import release_local_checkpoint

    sc = spark.sparkContext

    def pinned_ids():
        return {i.id() for i in sc._jsc.sc().getRDDStorageInfo()}

    before = pinned_ids()
    df = (
        spark.range(1000)
        .select("id", (F.col("id") % 7).alias("k"))
        .localCheckpoint(eager=True)
    )
    assert pinned_ids() - before  # the checkpoint pinned something
    release_local_checkpoint(df)
    assert pinned_ids() == before  # ...and the release freed it
    release_local_checkpoint(spark.range(5))  # plain frame: no-op, no raise


def test_one_pass_normalize_is_byte_identical_to_two_pass(spark):
    """The r10 normalize rewrite (one regex pass replacing maximal
    non-alphanumeric runs) must produce byte-identical output to the
    original strip-[^a-z0-9 ]-then-collapse-' +' form — that identity is
    what keeps pipeline_dedup_end2end/text_normalize hash-parity with
    the DuckDB oracle, which deliberately keeps the two-pass spelling.
    Exercised on adversarial strings: unicode runs, tabs/newlines,
    leading/trailing junk, digit boundaries, all-junk, empty."""
    from pyspark.sql import functions as F

    cases = [
        "Hello, World!",
        "  a.b..c...d  ",
        "tabs\tand\nnewlines\r\nmixed",
        "émoji 🎉 and ünïcode—dashes",
        "UPPER lower 123 mixed42case",
        "!!!@@@###",
        "",
        " ",
        "a",
        "7",
        "trailing junk!!!",
        "???leading junk",
        "a  b   c    d",
        "digits123.456separate",
        " nbsp emsp​zwsp",
    ]
    df = spark.createDataFrame([(c,) for c in cases], "text string")
    one = F.trim(F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", " "))
    two = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9 ]", " "),
            " +",
            " ",
        )
    )
    rows = df.select(one.alias("one"), two.alias("two")).collect()
    for case, r in zip(cases, rows):
        assert r.one == r.two, f"divergence on {case!r}: {r.one!r} != {r.two!r}"


def test_minhash_bands_rejects_non_tiling_geometry(spark):
    """n_bands must tile the signature: the old implementation indexed
    with the module-global rows-per-band regardless of n_bands, reading
    past the signature (ANSI array error) or silently dropping slots."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from ocs_duckdb_runner_spark.llm.dedup import minhash_bands

    with _pytest.raises(ValueError, match="must divide"):
        minhash_bands(F.col("sig"), n_bands=5)
    # a valid non-default geometry builds without touching ROWS_PER_BAND
    minhash_bands(F.col("sig"), n_bands=8, n_hashes=16)
