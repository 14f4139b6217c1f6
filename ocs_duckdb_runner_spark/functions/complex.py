"""Complex-type and advanced scalar function surface: struct/map
construction + field access, exact percentiles, bitwise ops, regex
extraction — rounding out SURVEY.md §2c's scalar-function rows beyond
functions/scalar.py.

Dialect notes baked into the oracles: DuckDB's ``^`` is exponentiation
(XOR is ``xor()``), ``MAP{..}[key]`` yields a one-element LIST (hence
``[1]``), and ``bit_count`` returns TINYINT (hence the CASTs). All of these
are map-side scalar expressions — whole-stage-codegen'd, no shuffle beyond
the declared aggregates."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ocs_duckdb_runner_spark.registry import load_table, query


@query(
    "fn_map_struct",
    oracle="""
    WITH x AS (
      SELECT event_id,
             struct_pack(t := event_type, u := user_id) AS s,
             MAP {'type': event_type,
                  'uid': CAST(user_id AS VARCHAR)} AS m
      FROM events
    )
    SELECT event_id,
           s.t AS s_type,
           CAST(s.u AS BIGINT) AS s_uid,
           m['type'][1] AS m_type,
           m['uid'][1] AS m_uid,
           CAST(len(map_keys(m)) AS INTEGER) AS n_keys,
           array_to_string(list_sort(map_keys(m)), ',') AS keys_csv
    FROM x
    """,
    tags=("function", "struct", "map"),
)
def fn_map_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct and map surface: build nested values map-side, then project
    fields back out — the pattern for carrying typed metadata (multimodal
    sidecars, feature bundles) through a pipeline without flattening. All
    scalar expressions; Catalyst collapses build+access into direct column
    references (no nested materialization in the plan)."""
    e = load_table(spark, sf_dir, "events")
    x = e.select(
        "event_id",
        F.struct(
            F.col("event_type").alias("t"), F.col("user_id").alias("u")
        ).alias("s"),
        F.create_map(
            F.lit("type"), F.col("event_type"),
            F.lit("uid"), F.col("user_id").cast("string"),
        ).alias("m"),
    )
    return x.select(
        "event_id",
        F.col("s").getField("t").alias("s_type"),
        F.col("s").getField("u").alias("s_uid"),
        F.element_at(F.col("m"), "type").alias("m_type"),
        F.element_at(F.col("m"), "uid").alias("m_uid"),
        F.size(F.map_keys(F.col("m"))).alias("n_keys"),
        F.array_join(F.array_sort(F.map_keys(F.col("m"))), ",").alias("keys_csv"),
    )


@query(
    "fn_percentile",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.25), 6) AS qty_p25,
           round(quantile_cont(l_quantity, 0.50), 6) AS qty_p50,
           round(quantile_cont(l_quantity, 0.75), 6) AS qty_p75,
           round(median(l_extendedprice), 6) AS price_med,
           CAST(count(*) AS BIGINT) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
    tags=("function", "agg", "percentile"),
)
def fn_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous percentiles (quartiles + median) per group —
    Spark's ``percentile`` against DuckDB's ``quantile_cont``; both use
    the same (n-1)·p linear interpolation, so values agree to the rounded
    digit. Exact percentile sorts per group; at 100 TB prefer
    approx_percentile (t-digest, mergeable map-side) — covered rows-only
    in agg_approx_distinct."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.percentile("l_quantity", F.lit(0.25)), 6).alias("qty_p25"),
        F.round(F.percentile("l_quantity", F.lit(0.50)), 6).alias("qty_p50"),
        F.round(F.percentile("l_quantity", F.lit(0.75)), 6).alias("qty_p75"),
        F.round(F.median("l_extendedprice"), 6).alias("price_med"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "fn_bitwise",
    oracle="""
    SELECT event_id,
           CAST(user_id & 255 AS BIGINT) AS b_and,
           CAST(user_id | 4096 AS BIGINT) AS b_or,
           CAST(xor(user_id, 1365) AS BIGINT) AS b_xor,
           CAST(user_id << 3 AS BIGINT) AS b_shl,
           CAST(user_id >> 2 AS BIGINT) AS b_shr,
           CAST(bit_count(CAST(user_id AS BIGINT)) AS INTEGER) AS b_pop
    FROM events
    """,
    tags=("function", "bitwise"),
)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise surface: AND/OR/XOR, shifts, popcount — the primitives
    under hash partitioning, bloom filters, and the SimHash/LSH operators
    (llm/dedup.py builds on exactly these)."""
    e = load_table(spark, sf_dir, "events")
    u = F.col("user_id")
    return e.select(
        "event_id",
        u.bitwiseAND(F.lit(255)).alias("b_and"),
        u.bitwiseOR(F.lit(4096)).alias("b_or"),
        u.bitwiseXOR(F.lit(1365)).alias("b_xor"),
        F.expr("shiftleft(user_id, 3)").alias("b_shl"),
        F.expr("shiftright(user_id, 2)").alias("b_shr"),
        F.bit_count(u).alias("b_pop"),
    )


@query(
    "fn_regex",
    oracle="""
    SELECT doc_id,
           regexp_extract(text, '^([a-z]+)', 1) AS first_word,
           CAST(len(regexp_extract_all(text, '[a-z]+')) AS INTEGER) AS n_words,
           CAST(len(regexp_extract_all(text, 'a[a-z]*')) AS INTEGER) AS n_a_runs,
           CAST(regexp_matches(text, 'spark') AS INTEGER) AS has_spark,
           regexp_replace(text, '[aeiou]', '_', 'g') AS devoweled_head
    FROM (SELECT doc_id, substr(text, 1, 40) AS text FROM documents) t
    """,
    tags=("function", "regex", "text"),
)
def fn_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex surface: group extraction, extract-all + count, boolean match,
    global replace — on a 40-char prefix so the oracle row stays readable.
    Patterns restricted to the RE2 ∩ java.util.regex common subset (no
    backrefs/lookarounds), the discipline that keeps a corpus-scale regex
    pipeline portable across engines."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.substring("text", 1, 40).alias("text")
    )
    t = F.col("text")
    return d.select(
        "doc_id",
        F.regexp_extract(t, "^([a-z]+)", 1).alias("first_word"),
        F.size(F.regexp_extract_all(t, F.lit("[a-z]+"), 0)).alias("n_words"),
        F.size(F.regexp_extract_all(t, F.lit("a[a-z]*"), 0)).alias("n_a_runs"),
        t.rlike("spark").cast("int").alias("has_spark"),
        F.regexp_replace(t, "[aeiou]", "_").alias("devoweled_head"),
    )


@query(
    "fn_hash",
    oracle="""
    SELECT doc_id,
           md5(text) AS h_md5,
           sha256(text) AS h_sha256,
           CAST(length(md5(text)) AS INTEGER) AS md5_len
    FROM documents
    """,
    tags=("function", "hash"),
)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic hash surface (md5, sha-256) — the content-addressing
    primitives under dedup fingerprints and dataset versioning; both
    engines emit lowercase hex, compared byte-for-byte. (xxhash64 is used
    throughout the dedup ops but is seed/engine-specific, so the portable
    digests are the oracle-checked ones.)"""
    d = load_table(spark, sf_dir, "documents")
    blob = F.col("text").cast("binary")
    return d.select(
        "doc_id",
        F.md5(blob).alias("h_md5"),
        F.sha2(blob, 256).alias("h_sha256"),
        F.length(F.md5(blob)).alias("md5_len"),
    )


@query(
    "fn_higher_order",
    oracle="""
    SELECT vec_id,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_pos,
           CAST(CAST(list_sum(list_transform(embedding,
                x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT)))
                AS BIGINT) AS BIGINT) AS sum_u,
           CAST(len(list_filter(embedding, x -> x > 3.0)) > 0
                AS INTEGER) AS any_big,
           CAST(CAST(list_sum(list_transform(list_zip(embedding,
                  list_reverse(embedding)),
                t -> CAST(round(CAST(t[1] AS DOUBLE) * 1e6) AS BIGINT)
                   * CAST(round(CAST(t[2] AS DOUBLE) * 1e6) AS BIGINT)))
                AS BIGINT) AS BIGINT) AS rev_dot_u
    FROM embeddings
    """,
    tags=("function", "array", "higher-order"),
)
def fn_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions as a first-class surface — transform,
    filter, aggregate(fold), exists, zip_with — the JVM-side machinery the
    dedup/similarity operators are built from (no UDF, no explode: one
    codegen'd pass per row). Folds run in fixed-point micro-units so sums
    are order-independent; the zip_with dot-product against the reversed
    vector exercises two-array lambdas."""
    e = load_table(spark, sf_dir, "embeddings")
    v = F.col("embedding")
    fx = lambda c: F.round(c.cast("double") * 1e6).cast("long")  # noqa: E731
    return e.select(
        "vec_id",
        F.size(F.filter(v, lambda x: x > 0)).alias("n_pos"),
        F.aggregate(
            F.transform(v, lambda x: fx(x)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("sum_u"),
        F.exists(v, lambda x: x > 3.0).cast("int").alias("any_big"),
        F.aggregate(
            F.zip_with(v, F.reverse(v), lambda a, b: fx(a) * fx(b)),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        ).alias("rev_dot_u"),
    )


@query(
    "fn_url",
    oracle="""
    WITH u AS (
      SELECT doc_id,
             'https://' || source || '.example.com/docs/'
               || CAST(doc_id AS VARCHAR) || '?lang=' || lang || '&v=2' AS url
      FROM documents)
    SELECT doc_id,
           regexp_extract(url, '^[a-z]+://([^/]+)', 1) AS host,
           regexp_extract(url, '^[a-z]+://[^/]+(/[^?]*)', 1) AS path,
           regexp_extract(url, '\\?(.*)$', 1) AS query,
           regexp_extract(url, '[?&]lang=([^&]*)', 1) AS lang_param,
           regexp_extract(url, '^([a-z]+)://', 1) AS protocol
    FROM u
    """,
    tags=("function", "url", "text"),
)
def fn_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL parsing — host/path/query/param/protocol extraction, the
    first step of any web-corpus pipeline (domain filtering, dedup by
    canonical URL, robots scoping). Spark's native parse_url does the
    splitting; the oracle reproduces each component with regexes, so the
    check pins parse_url's exact component semantics. URLs are
    synthesized deterministically from doc metadata."""
    d = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"), F.lit("?lang="), F.col("lang"),
        F.lit("&v=2"),
    )
    u = d.select("doc_id", url.alias("url"))
    return u.select(
        "doc_id",
        F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        F.parse_url(F.col("url"), F.lit("PATH")).alias("path"),
        F.parse_url(F.col("url"), F.lit("QUERY")).alias("query"),
        F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("lang")).alias(
            "lang_param"
        ),
        F.parse_url(F.col("url"), F.lit("PROTOCOL")).alias("protocol"),
    )


@query(
    "fn_encode",
    oracle="""
    SELECT doc_id,
           to_base64(encode(substr(text, 1, 24))) AS b64,
           decode(from_base64(to_base64(encode(substr(text, 1, 24))))) AS b64_rt,
           lower(hex(encode(substr(text, 1, 8)))) AS hx,
           decode(unhex(hex(encode(substr(text, 1, 8))))) AS hx_rt
    FROM documents
    """,
    tags=("function", "encode"),
)
def fn_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary encode/decode surface: base64 and hex, each round-tripped
    back to the original text — the transport encodings multimodal
    payloads and fingerprints travel in. Round-trip-equality inside the
    query means a single corrupted byte fails the value hash."""
    d = load_table(spark, sf_dir, "documents")
    t24 = F.substring("text", 1, 24).cast("binary")
    t8 = F.substring("text", 1, 8).cast("binary")
    return d.select(
        "doc_id",
        F.base64(t24).alias("b64"),
        F.unbase64(F.base64(t24)).cast("string").alias("b64_rt"),
        F.lower(F.hex(t8)).alias("hx"),
        F.unhex(F.hex(t8)).cast("string").alias("hx_rt"),
    )


@query(
    "fn_crypto_roundtrip",
    oracle="""
    SELECT doc_id,
           substr(text, 1, 32) AS plain_rt,
           CAST(length(substr(text, 1, 32)) AS INTEGER) AS n_plain
    FROM documents
    """,
    tags=("function", "crypto"),
)
def fn_crypto_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-level encryption surface: aes_encrypt → aes_decrypt round
    trip (GCM, random IV per row — so the CIPHERTEXT is nondeterministic
    but the round trip is exact). The oracle pins the decrypted output to
    the original bytes: a pass proves encrypt and decrypt are true
    inverses under the session key, which is the property a
    pseudonymization / at-rest-encryption pipeline depends on."""
    d = load_table(spark, sf_dir, "documents")
    key = F.lit("0123456789abcdef")  # 16-byte AES-128 key (fixture secret)
    plain = F.substring("text", 1, 32)
    rt = F.aes_decrypt(F.aes_encrypt(plain.cast("binary"), key.cast("binary")), key.cast("binary"))
    return d.select(
        "doc_id",
        rt.cast("string").alias("plain_rt"),
        F.length(rt.cast("string")).alias("n_plain"),
    )


@query(
    "fn_math_ext",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(sin(l_quantity), 6) AS q_sin,
           round(cos(l_quantity), 6) AS q_cos,
           round(atan2(l_quantity, l_extendedprice / 1000), 6) AS q_atan2,
           round(degrees(l_discount), 6) AS d_deg,
           round(radians(l_quantity), 6) AS q_rad,
           CAST(sign(l_discount - 0.05) AS DOUBLE) AS d_sign,
           round(log2(l_extendedprice), 6) AS p_log2,
           round(log10(l_extendedprice), 6) AS p_log10,
           round(cbrt(l_extendedprice), 6) AS p_cbrt
    FROM lineitem
    """,
    tags=("function", "math"),
)
def fn_math_ext(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended math surface: trigonometry, angle conversion, sign, and
    the log/root family beyond fn_math. Transcendentals differ in the
    last ulp across libm implementations, so every float output is
    rounded to 6 digits on both sides — the same drift discipline
    exactness.py applies to aggregation order."""
    li = load_table(spark, sf_dir, "lineitem")
    q, p, dd = F.col("l_quantity"), F.col("l_extendedprice"), F.col("l_discount")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sin(q), 6).alias("q_sin"),
        F.round(F.cos(q), 6).alias("q_cos"),
        F.round(F.atan2(q, p / 1000), 6).alias("q_atan2"),
        F.round(F.degrees(dd), 6).alias("d_deg"),
        F.round(F.radians(q), 6).alias("q_rad"),
        F.signum(dd - 0.05).alias("d_sign"),
        F.round(F.log2(p), 6).alias("p_log2"),
        F.round(F.log10(p), 6).alias("p_log10"),
        F.round(F.cbrt(p), 6).alias("p_cbrt"),
    )


@query(
    "fn_string_ext",
    oracle="""
    WITH t AS (SELECT doc_id, substr(text, 1, 20) AS s FROM documents)
    SELECT doc_id,
           translate(s, 'aeiou', '01234') AS tr,
           lpad(s, 24, '.') AS lp,
           rpad(s, 24, '.') AS rp,
           repeat(substr(s, 1, 3), 3) AS rep,
           reverse(s) AS rev,
           CAST(ascii(s) AS INTEGER) AS first_code,
           chr(97 + CAST(doc_id % 26 AS INTEGER)) AS rot_char,
           CAST(strpos(s, 'a') AS INTEGER) AS a_pos,
           left(s, 5) AS l5,
           right(s, 5) AS r5,
           split_part(s, ' ', 2) AS word2
    FROM t
    """,
    tags=("function", "string"),
)
def fn_string_ext(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended string surface beyond fn_string: translate, padding,
    repeat, reverse, ascii/chr, substring position, left/right, and
    split_part — the per-field cleanup toolkit of ingestion pipelines.
    All map-side codegen'd expressions."""
    d = load_table(spark, sf_dir, "documents")
    s = F.substring("text", 1, 20)
    t = d.select("doc_id", s.alias("s"))
    sc = F.col("s")
    return t.select(
        "doc_id",
        F.translate(sc, "aeiou", "01234").alias("tr"),
        F.lpad(sc, 24, ".").alias("lp"),
        F.rpad(sc, 24, ".").alias("rp"),
        F.repeat(F.substring(sc, 1, 3), 3).alias("rep"),
        F.reverse(sc).alias("rev"),
        F.ascii(sc).alias("first_code"),
        F.chr(F.lit(97) + (F.col("doc_id") % 26).cast("int")).alias("rot_char"),
        F.instr(sc, "a").alias("a_pos"),
        F.substring(sc, 1, 5).alias("l5"),
        sc.substr(F.length(sc) - 4, F.lit(5)).alias("r5"),
        F.split_part(sc, F.lit(" "), F.lit(2)).alias("word2"),
    )


@query(
    "fn_xml_roundtrip",
    oracle="""
    SELECT o_orderkey,
           o_orderstatus AS status_back,
           CAST(round(o_totalprice * 100) AS BIGINT) AS price_c_back,
           CAST(strftime(o_orderdate, '%Y-%m-%d') AS VARCHAR) AS date_back
    FROM orders
    WHERE o_orderkey % 50 = 0
    """,
    tags=("function", "xml"),
)
def fn_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML surface as a lossless round-trip (the src_csv_roundtrip recipe
    applied to the remaining wire format): each order serializes to an
    XML fragment JVM-side, then BOTH from_xml (schema-based parse into a
    struct) and xpath_string (path query on the raw string) extract the
    fields back; the oracle states the identity, so any parse/escape
    drift breaks the hash. DuckDB has no XML type — the round trip making
    the check engine-neutral is the point (same policy as the binary
    codecs in llm/multimodal.py).

    Plan: serialization and both parses are per-row JVM expressions in
    one whole-stage-codegen projection — no shuffle, no Python."""
    e = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 50 == 0)
    xml = F.concat(
        F.lit("<order><key>"),
        F.col("o_orderkey").cast("string"),
        F.lit("</key><status>"),
        F.col("o_orderstatus"),
        F.lit("</status><price>"),
        F.round(F.col("o_totalprice") * 100).cast("long").cast("string"),
        F.lit("</price><date>"),
        F.date_format(F.col("o_orderdate"), "yyyy-MM-dd"),
        F.lit("</date></order>"),
    )
    doc = e.select("o_orderkey", xml.alias("xml"))
    return doc.select(
        F.from_xml(
            F.col("xml"),
            "STRUCT<key: BIGINT, status: STRING, price: BIGINT, date: STRING>",
        ).alias("p"),
        F.xpath_string(F.col("xml"), F.lit("/order/date")).alias("xp_date"),
    ).select(
        F.col("p.key").alias("o_orderkey"),
        F.col("p.status").alias("status_back"),
        F.col("p.price").alias("price_c_back"),
        F.col("xp_date").alias("date_back"),
    )


@query(
    "fn_array_construct",
    oracle="""
    SELECT o_orderkey,
           array_to_string(generate_series(1, CAST(o_orderkey % 4 AS BIGINT) + 1),
                           ',') AS seq_csv,
           array_to_string(list_transform(generate_series(1, 3),
                                          i -> o_orderstatus), ',') AS rep_csv,
           array_to_string(flatten([[CAST(o_orderkey % 3 AS BIGINT)],
                                    [CAST(o_orderkey % 5 AS BIGINT),
                                     CAST(o_orderkey % 7 AS BIGINT)]]), ',')
             AS flat_csv,
           array_to_string(list_transform(generate_series(1, 2),
               i -> CAST([CAST(o_orderkey % 3 AS BIGINT),
                          CAST(o_orderkey % 5 AS BIGINT)][i] AS VARCHAR)
                    || ':' ||
                    CAST([CAST(o_orderkey % 7 AS BIGINT),
                          CAST(o_orderkey % 11 AS BIGINT)][i] AS VARCHAR)),
             ',') AS zip_csv
    FROM orders WHERE o_orderkey % 200 = 0
    """,
    tags=("function", "array"),
)
def fn_array_construct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array CONSTRUCTION surface — the generators fn_array (access) and
    fn_higher_order (folds) leave out: sequence() ranges, array_repeat,
    flatten of nested arrays, and arrays_zip pairing. Array-valued
    results serialize to CSV (the harness canonicalizer contract, as
    embed_quantize) so element order and values are both pinned."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 200 == 0)
    join_csv = lambda c: F.concat_ws(",", F.transform(c, lambda x: x.cast("string")))  # noqa: E731
    zipped = F.arrays_zip(
        F.array((F.col("o_orderkey") % 3), (F.col("o_orderkey") % 5)).alias("a"),
        F.array((F.col("o_orderkey") % 7), (F.col("o_orderkey") % 11)).alias("b"),
    )
    return o.select(
        "o_orderkey",
        join_csv(
            F.sequence(F.lit(1), (F.col("o_orderkey") % 4 + 1).cast("long"))
        ).alias("seq_csv"),
        join_csv(F.array_repeat(F.col("o_orderstatus"), 3)).alias("rep_csv"),
        join_csv(
            F.flatten(
                F.array(
                    F.array((F.col("o_orderkey") % 3)),
                    F.array(
                        (F.col("o_orderkey") % 5), (F.col("o_orderkey") % 7)
                    ),
                )
            )
        ).alias("flat_csv"),
        F.concat_ws(
            ",",
            F.transform(
                zipped,
                lambda s: F.concat_ws(":", s["a"].cast("string"),
                                      s["b"].cast("string")),
            ),
        ).alias("zip_csv"),
    )


@query(
    "fn_generators",
    oracle="""
    SELECT n_nationkey, 'seq' AS part,
           CAST(i - n_regionkey AS VARCHAR) AS k, CAST(i AS BIGINT) AS v
    FROM (SELECT n_nationkey, n_regionkey,
                 unnest(generate_series(n_regionkey, n_regionkey + 3)) AS i
          FROM nation)
    UNION ALL
    SELECT n_nationkey, 'stack', 'name_len',
           CAST(length(n_name) AS BIGINT) FROM nation
    UNION ALL
    SELECT n_nationkey, 'stack', 'key_mod',
           CAST(n_nationkey % 5 AS BIGINT) FROM nation
    UNION ALL
    SELECT n_nationkey, 'inline', concat('f', j),
           CAST(n_regionkey * j AS BIGINT)
    FROM (SELECT n_nationkey, n_regionkey, unnest([1, 2]) AS j FROM nation)
    """,
    tags=("function", "generator", "lateral"),
)
def fn_generators(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-generator surface — the three table-generating functions a
    SQL user reaches for beyond plain explode: sequence() + posexplode
    (numeric range fan-out WITH the ordinal position, DuckDB's
    generate_series), stack() (the inline k-row unpivot literal —
    contrast the UNPIVOT relational operator in unpivot_measures), and
    inline() (explode an array-of-structs straight into columns, no
    intermediate struct column). One unified (key, part, k, v) schema
    so all three generators hash into one comparable result.

    All three are Generate nodes evaluated MAP-SIDE in whole-stage
    codegen over the 25-row dim — fan-out happens inside the scan
    stage, no shuffle, no join; at 100 TB the same shapes fan out
    facts (sequence for date spines, stack for measure unpivots,
    inline for nested-struct flattening) with output-batched codegen
    rather than a per-row UDTF crossing."""
    n = load_table(spark, sf_dir, "nation")
    seq = n.select(
        "n_nationkey",
        F.posexplode(
            F.sequence(F.col("n_regionkey"), F.col("n_regionkey") + 3)
        ).alias("pos", "i"),
    ).select(
        "n_nationkey",
        F.lit("seq").alias("part"),
        F.col("pos").cast("string").alias("k"),
        F.col("i").cast("long").alias("v"),
    )
    stacked = n.select(
        "n_nationkey",
        F.stack(
            F.lit(2),
            F.lit("name_len"),
            F.length("n_name").cast("long"),
            F.lit("key_mod"),
            (F.col("n_nationkey") % 5).cast("long"),
        ).alias("k", "v"),
    ).select("n_nationkey", F.lit("stack").alias("part"), "k", "v")
    inlined = n.select(
        "n_nationkey",
        F.inline(
            F.transform(
                F.sequence(F.lit(1), F.lit(2)),
                lambda j: F.struct(
                    F.concat(F.lit("f"), j.cast("string")).alias("k"),
                    (F.col("n_regionkey") * j).cast("long").alias("v"),
                ),
            )
        ),
    ).select("n_nationkey", F.lit("inline").alias("part"), "k", "v")
    return seq.unionByName(stacked).unionByName(inlined)
