"""Scalar functions: string / date / math / array / map / json
(SURVEY.md §2.9).

The reference's own scalar work is meta-plane only (timestamp→string
cast at ``api.py:65``, JSON round-trip at ``api.py:67``); the driver
tables require the full set. Everything here is a built-in Catalyst
expression — codegen'd, JVM-side, no Python in the row loop.

Oracle-parity: no transcendentals whose last-ulp rounding may differ
between libm and the JVM (sqrt IS exact per IEEE-754, so it's safe);
array reductions accumulate on an integer grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from delta_lake_play_spark.registry import register
from delta_lake_play_spark.sources.catalog import load_table

# --- fn_string_basic ----------------------------------------------------

_STR_ORACLE = """
SELECT p_partkey,
       lower(p_name) AS name_lower,
       upper(p_brand) AS brand_upper,
       length(p_name) AS name_len,
       substring(p_name, 1, 5) AS name_pfx,
       concat_ws('-', p_brand, p_type) AS brand_type,
       trim('  ' || p_name || ' ') AS name_trim
FROM part
"""


@register("fn_string_basic", oracle=_STR_ORACLE)
def fn_string_basic(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.upper("p_brand").alias("brand_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 5).alias("name_pfx"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit(" "))).alias("name_trim"),
    )


# --- fn_string_split_tokens ----------------------------------------------

_SPLIT_ORACLE = """
SELECT doc_id,
       len(string_split(text, ' ')) AS n_tokens,
       string_split(text, ' ')[1] AS first_token,
       string_split(text, ' ')[-1] AS last_token
FROM documents
"""


@register("fn_string_split_tokens", oracle=_SPLIT_ORACLE)
def fn_string_split_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.element_at(toks, 1).alias("first_token"),
        F.element_at(toks, -1).alias("last_token"),
    )


# --- fn_string_regex --------------------------------------------------------

_REGEX_ORACLE = r"""
SELECT c_custkey,
       CAST(regexp_extract(c_name, 'Customer#(\d+)', 1) AS BIGINT) AS cust_num,
       regexp_replace(c_name, '0+', '', 'g') AS name_nozeros,
       regexp_matches(c_mktsegment, '^(BU|MA)') AS seg_bm
FROM customer
"""


@register("fn_string_regex", oracle=_REGEX_ORACLE)
def fn_string_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.regexp_extract("c_name", r"Customer#(\d+)", 1).cast("bigint").alias("cust_num"),
        F.regexp_replace("c_name", "0+", "").alias("name_nozeros"),
        F.col("c_mktsegment").rlike("^(BU|MA)").alias("seg_bm"),
    )


# --- fn_date_trunc_extract ----------------------------------------------------

_DATE_ORACLE = """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS INTEGER) AS yr,
       CAST(month(o_orderdate) AS INTEGER) AS mo,
       CAST(day(o_orderdate) AS INTEGER) AS dy,
       CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
       date_trunc('month', o_orderdate) AS month_start
FROM orders WHERE o_orderkey < 1000
"""


@register("fn_date_trunc_extract", oracle=_DATE_ORACLE)
def fn_date_trunc_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dy"),
        F.quarter("o_orderdate").alias("qtr"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
    )


# --- fn_date_arith ---------------------------------------------------------------

_DATE_ARITH_ORACLE = """
SELECT o_orderkey,
       o_orderdate + INTERVAL 30 DAY AS due_date,
       CAST(datediff('day', TIMESTAMP '1995-01-01', o_orderdate) AS BIGINT) AS days_since_epoch_start,
       o_orderdate - INTERVAL 1 WEEK AS week_before
FROM orders WHERE o_orderkey < 1000
"""


@register("fn_date_arith", oracle=_DATE_ARITH_ORACLE)
def fn_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 1000)
    return o.select(
        "o_orderkey",
        (F.col("o_orderdate") + F.expr("INTERVAL 30 DAY")).alias("due_date"),
        F.datediff("o_orderdate", F.lit("1995-01-01 00:00:00").cast("timestamp"))
        .cast("bigint")
        .alias("days_since_epoch_start"),
        (F.col("o_orderdate") - F.expr("INTERVAL 1 WEEK")).alias("week_before"),
    )


# --- fn_timestamp_cast_fmt: the api.py:65 cast --------------------------------------

_TS_FMT_ORACLE = """
SELECT event_id,
       strftime(ts::TIMESTAMP, '%Y-%m-%d %H:%M:%S') AS ts_fmt,
       CAST(date_trunc('second', ts::TIMESTAMP) AS VARCHAR) AS ts_str,
       strftime(ts::TIMESTAMP, '%Y-%m-%d') AS ts_date
FROM events WHERE event_id < 500
"""


@register("fn_timestamp_cast_fmt", oracle=_TS_FMT_ORACLE)
def fn_timestamp_cast_fmt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp→string rendering, as the reference's history endpoint
    does (``api.py:65`` — ``str(row["timestamp"])``)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    return ev.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_fmt"),
        F.date_trunc("second", F.col("ts")).cast("string").alias("ts_str"),
        F.date_format("ts", "yyyy-MM-dd").alias("ts_date"),
    )


# --- fn_math ---------------------------------------------------------------------------

_MATH_ORACLE = """
SELECT l_orderkey, l_linenumber,
       CAST((CAST(round(l_extendedprice * 100) AS BIGINT)
             * (100 - CAST(round(l_discount * 100) AS BIGINT)) + 500) // 1000
            AS DOUBLE) / 10.0 AS net_1dp,
       abs(l_quantity - 25) AS qty_dev,
       sqrt(l_quantity) AS qty_sqrt,
       l_quantity * l_quantity AS qty_sq,
       CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_kbucket,
       CAST(l_orderkey % 7 AS BIGINT) AS key_mod
FROM lineitem WHERE l_orderkey < 500
"""


@register("fn_math", oracle=_MATH_ORACLE)
def fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sqrt is IEEE-exact (safe for hashing); transcendentals
    (ln/exp/pow) are excluded from oracle-checked output because JVM
    vs libm may differ in the last ulp.

    ``net_1dp`` deliberately avoids ``round(double, 1)``: Spark rounds
    the exact binary value (BigDecimal HALF_UP) while DuckDB rounds the
    shortest decimal, so products landing just under an .x5 tie
    (e.g. 855.94999999999993) diverge. Instead both engines compute the
    1-dp value on the exact integer grid — price-cents × (100 −
    discount-hundredths) is an exact BIGINT on a 1e-4 grid; half-up to
    tenths is pure integer arithmetic ((x + 500) DIV 1000), identical
    everywhere; the final /10.0 is one deterministic IEEE op.

    ``price_kbucket``: Spark's ``F.floor`` returns BIGINT while
    DuckDB's ``floor()`` returns DOUBLE, so the oracle casts its floor
    to BIGINT — a type-faithful value hash sees ``21`` vs ``21.0`` as
    different even when every value matches (the r2/r3 driver fail)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 500)
    cents = F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")
    disc_h = F.round(F.col("l_discount") * 100, 0).cast("bigint")
    net_e4 = cents * (F.lit(100).cast("bigint") - disc_h)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (F.floor((net_e4 + 500) / 1000).cast("double") / 10.0).alias("net_1dp"),
        F.abs(F.col("l_quantity") - 25).alias("qty_dev"),
        F.sqrt("l_quantity").alias("qty_sqrt"),
        (F.col("l_quantity") * F.col("l_quantity")).alias("qty_sq"),
        F.floor(F.col("l_extendedprice") / 1000).alias("price_kbucket"),
        (F.col("l_orderkey") % 7).alias("key_mod"),
    )


# --- fn_cond_case -------------------------------------------------------------------------

_CASE_ORACLE = """
SELECT o_orderkey,
       CASE WHEN o_totalprice >= 300000 THEN 'large'
            WHEN o_totalprice >= 100000 THEN 'medium'
            ELSE 'small' END AS size_class,
       CASE WHEN o_orderstatus = 'O' AND o_orderpriority LIKE '1-%' THEN 'open_urgent'
            WHEN o_orderstatus = 'O' THEN 'open'
            ELSE 'closed_or_partial' END AS status_class
FROM orders
"""


@register("fn_cond_case", oracle=_CASE_ORACLE)
def fn_cond_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") >= 300000, "large")
        .when(F.col("o_totalprice") >= 100000, "medium")
        .otherwise("small")
        .alias("size_class"),
        F.when(
            (F.col("o_orderstatus") == "O") & F.col("o_orderpriority").like("1-%"),
            "open_urgent",
        )
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("closed_or_partial")
        .alias("status_class"),
    )


# --- fn_array_ops ----------------------------------------------------------------------------

_ARR_ORACLE = """
SELECT vec_id,
       len(embedding) AS dim,
       embedding[1] AS e0,
       list_min(embedding) AS e_min,
       list_max(embedding) AS e_max,
       len(list_filter(embedding, x -> x > 0)) AS n_pos
FROM embeddings
"""


@register("fn_array_ops", oracle=_ARR_ORACLE)
def fn_array_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.element_at("embedding", 1).alias("e0"),
        F.array_min("embedding").alias("e_min"),
        F.array_max("embedding").alias("e_max"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_pos"),
    )


# --- fn_array_hof: map/filter/reduce (the dot-product primitive) --------------------------------
# Reduction accumulates round(x²·1e6) as BIGINT so the array fold is
# exact and order-independent across engines.

_HOF_ORACLE = """
SELECT vec_id,
       CAST(list_sum(list_transform(embedding,
                x -> CAST(round(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) * 1000000) AS BIGINT)))
            AS BIGINT) AS sq_norm_scaled,
       len(list_filter(embedding, x -> abs(x) > 0.1)) AS n_strong,
       CAST(list_sum(list_transform(embedding, x -> CASE WHEN x > 0 THEN 1 ELSE 0 END))
            AS BIGINT) AS n_pos
FROM embeddings
"""


@register("fn_array_hof", oracle=_HOF_ORACLE)
def fn_array_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    demb = F.col("embedding").cast("array<double>")
    sq_scaled = F.aggregate(
        F.transform(demb, lambda x: F.round(x * x * 1000000, 0).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    n_pos = F.aggregate(
        F.transform(demb, lambda x: F.when(x > 0, 1).otherwise(0).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    return e.select(
        "vec_id",
        sq_scaled.alias("sq_norm_scaled"),
        F.size(F.filter(demb, lambda x: F.abs(x) > 0.1)).alias("n_strong"),
        n_pos.alias("n_pos"),
    )


# --- fn_explode: array → rows ---------------------------------------------------------------------

_EXPLODE_ORACLE = """
SELECT doc_id, unnest(string_split(text, ' ')) AS token
FROM documents WHERE doc_id < 50
"""


@register("fn_explode", oracle=_EXPLODE_ORACLE)
def fn_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    return d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))


# --- fn_map_json: props parsing (events.props, TESTDATA.md:13) -------------------------------------

_MAP_JSON_ORACLE = """
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
       array_to_string(json_keys(props), ',') AS prop_keys
FROM events WHERE event_id < 500
"""


@register("fn_map_json", oracle=_MAP_JSON_ORACLE)
def fn_map_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    parsed = F.from_json("props", "map<string,int>")
    # concat_ws never returns NULL (all-null args → ''), but the
    # oracle's array_to_string(NULL) does — gate on the parsed map so
    # a NULL props row is NULL on both engines.
    keys = F.when(parsed.isNotNull(), F.concat_ws(",", F.map_keys(parsed)))
    return ev.select(
        "event_id",
        F.from_json("props", "k INT").getField("k").alias("k"),
        keys.alias("prop_keys"),
    )


# --- fn_hash: stable 64-bit hashing (hash families differ → rows-only) -------------------------------


@register("fn_hash", oracle=None)
def fn_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """xxhash64/md5/crc32 for dedup bucketing — rows-only check since
    DuckDB's hash families differ from Spark's."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.xxhash64("text").alias("h_xx64"),
        F.md5("text").alias("h_md5"),
        F.crc32("text").alias("h_crc32"),
        F.hash("text", "lang").alias("h_multi"),
    )


# --- fn_bitwise -----------------------------------------------------------

_BITWISE_ORACLE = """
SELECT event_id,
       event_id & 255 AS low_byte,
       event_id >> 8 AS high_bits,
       xor(event_id, 12345) AS xored,
       bit_count(CAST(event_id AS BIGINT)) AS popcount
FROM events WHERE event_id < 1000
"""


@register("fn_bitwise", oracle=_BITWISE_ORACLE)
def fn_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise and/shift/xor/popcount — the bucket/flag arithmetic
    layer (well-defined on non-negative int64 in every engine)."""
    ev = load_table(spark, sf_dir, "events").where(F.col("event_id") < 1000)
    return ev.select(
        "event_id",
        F.col("event_id").bitwiseAND(F.lit(255)).alias("low_byte"),
        F.shiftright("event_id", 8).alias("high_bits"),
        F.col("event_id").bitwiseXOR(F.lit(12345)).alias("xored"),
        F.bit_count("event_id").alias("popcount"),
    )


# --- fn_interval_arith ----------------------------------------------------

_INTERVAL_ORACLE = """
SELECT event_id,
       ts + INTERVAL 90 MINUTE AS ts_plus,
       ts - INTERVAL 1 DAY AS ts_minus,
       CAST(CAST(ts AS DATE) + 7 AS TIMESTAMP) AS week_later
FROM events WHERE event_id < 1000
"""


@register("fn_interval_arith", oracle=_INTERVAL_ORACLE)
def fn_interval_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Timestamp ± INTERVAL and date offset arithmetic."""
    ev = load_table(spark, sf_dir, "events").where(F.col("event_id") < 1000)
    return ev.select(
        "event_id",
        (F.col("ts") + F.expr("INTERVAL 90 MINUTES")).alias("ts_plus"),
        (F.col("ts") - F.expr("INTERVAL 1 DAY")).alias("ts_minus"),
        F.date_add(F.col("ts").cast("date"), 7).cast("timestamp").alias("week_later"),
    )


# --- fn_string_pad_translate ----------------------------------------------

_PAD_ORACLE = """
SELECT p_partkey,
       lpad(CAST(p_partkey AS VARCHAR), 10, '0') AS key_padded,
       translate(p_brand, '#', '-') AS brand_dashed,
       replace(p_type, ' ', '_') AS type_snake,
       reverse(p_name) AS name_rev
FROM part
"""


@register("fn_string_pad_translate", oracle=_PAD_ORACLE)
def fn_string_pad_translate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lpad/translate/replace/reverse — the key-formatting layer."""
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.lpad(F.col("p_partkey").cast("string"), 10, "0").alias("key_padded"),
        F.translate("p_brand", "#", "-").alias("brand_dashed"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.reverse("p_name").alias("name_rev"),
    )


# --- fn_greatest_least ----------------------------------------------------

_GL_ORACLE = """
SELECT l_orderkey, l_linenumber,
       greatest(l_quantity, l_discount * 100, l_linenumber) AS g,
       least(l_quantity, l_tax * 100, l_linenumber) AS l
FROM lineitem WHERE l_orderkey < 200
"""


@register("fn_greatest_least", oracle=_GL_ORACLE)
def fn_greatest_least(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 200)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.greatest("l_quantity", F.col("l_discount") * 100, "l_linenumber").alias("g"),
        F.least("l_quantity", F.col("l_tax") * 100, "l_linenumber").alias("l"),
    )


# --- fn_try_arith: error-safe arithmetic / casts --------------------------
# Spark's try_* family returns NULL instead of raising (ANSI-safe
# pipelines). DuckDB has TRY_CAST but errors on arithmetic overflow,
# so the oracle guards with NULLIF / CASE — same values, no error
# path. 2^62 * l_linenumber overflows int64 for l_linenumber >= 2.

_TRY_ORACLE = """
SELECT l_orderkey, l_linenumber,
       l_extendedprice / NULLIF(l_quantity - 26, 0) AS safe_ratio,
       TRY_CAST(CASE WHEN l_linenumber > 3 THEN CAST(l_linenumber AS VARCHAR)
                     ELSE l_returnflag END AS INTEGER) AS parsed_int,
       CASE WHEN l_linenumber >= 2 THEN NULL
            ELSE 4611686018427387904 * l_linenumber END AS big_mul
FROM lineitem WHERE l_orderkey < 400
"""


@register("fn_try_arith", oracle=_TRY_ORACLE)
def fn_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """try_divide / try_cast / try_multiply: NULL-on-error semantics.

    All narrow codegen expressions — the point is semantic parity of
    the error path (divide-by-zero, bad cast, int64 overflow), not
    plan shape."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_orderkey") < 400)
    parse_src = F.when(
        F.col("l_linenumber") > 3, F.col("l_linenumber").cast("string")
    ).otherwise(F.col("l_returnflag"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide("l_extendedprice", F.col("l_quantity") - 26).alias("safe_ratio"),
        parse_src.try_cast("int").alias("parsed_int"),
        F.try_multiply(F.lit(4611686018427387904), F.col("l_linenumber")).alias(
            "big_mul"
        ),
    )


# --- fn_struct_ops: named_struct / getField / struct ordering -------------

_STRUCT_ORACLE = """
SELECT o_orderkey,
       struct_pack(d := o_orderdate, p := o_totalprice).d AS od,
       struct_pack(d := o_orderdate, p := o_totalprice).p AS op,
       struct_pack(status := o_orderstatus,
                   prio := struct_pack(name := o_orderpriority)
                  ).prio.name AS prio_name
FROM orders
ORDER BY struct_pack(p := COALESCE(o_totalprice, CAST('-infinity' AS DOUBLE)),
                     k := o_orderkey) DESC
LIMIT 10
"""


@register("fn_struct_ops", oracle=_STRUCT_ORACLE)
def fn_struct_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct construction, nested field access, and ordering BY a
    struct (lexicographic by field position — identical comparison
    semantics in Spark and DuckDB). Structs are Tungsten-inlined:
    building and field-extracting them is free codegen projection,
    and the ORDER BY struct compiles to TakeOrderedAndProject."""
    o = load_table(spark, sf_dir, "orders")
    dp = F.struct(
        F.col("o_orderdate").alias("d"), F.col("o_totalprice").alias("p")
    )
    nested = F.struct(
        F.col("o_orderstatus").alias("status"),
        F.struct(F.col("o_orderpriority").alias("name")).alias("prio"),
    )
    # NULL placement inside a struct comparison differs between the
    # engines under DESC — pin it by coalescing the nullable field to
    # -inf (sorts last DESC on both; non-null data unaffected).
    sort_key = F.struct(
        F.coalesce(F.col("o_totalprice"), F.lit(float("-inf"))).alias("p"),
        F.col("o_orderkey").alias("k"),
    )
    return (
        o.select(
            "o_orderkey",
            dp.getField("d").alias("od"),
            dp.getField("p").alias("op"),
            nested.getField("prio").getField("name").alias("prio_name"),
            sort_key.alias("_sk"),
        )
        .orderBy(F.col("_sk").desc())
        .limit(10)
        .drop("_sk")
    )


# --- fn_url_parse ---------------------------------------------------------
# Spark's parse_url vs a regex twin in DuckDB (which has no URL
# parser). URLs are synthesized well-formed, where the two
# extraction methods provably agree.

_URL_ORACLE = """
WITH u AS (
  SELECT c_custkey,
         'https://' || lower(replace(c_mktsegment, ' ', '')) ||
         '.example.com/cust/' || CAST(c_custkey AS VARCHAR) ||
         '?nation=' || CAST(c_nationkey AS VARCHAR) || '&v=2' AS url
  FROM customer WHERE c_custkey % 50 = 0
)
SELECT c_custkey, url,
       regexp_extract(url, '^https://([^/]+)', 1) AS host,
       regexp_extract(url, '^https://[^/]+(/[^?]*)', 1) AS path,
       regexp_extract(url, 'nation=([0-9]+)', 1) AS nation_param
FROM u
"""


@register("fn_url_parse", oracle=_URL_ORACLE)
def fn_url_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parse_url(HOST/PATH/QUERY key) — the log-pipeline staple.
    Narrow codegen projection; no shuffle."""
    c = load_table(spark, sf_dir, "customer").where(F.col("c_custkey") % 50 == 0)
    url = F.concat(
        F.lit("https://"),
        F.lower(F.replace(F.col("c_mktsegment"), F.lit(" "), F.lit(""))),
        F.lit(".example.com/cust/"),
        F.col("c_custkey").cast("string"),
        F.lit("?nation="),
        F.col("c_nationkey").cast("string"),
        F.lit("&v=2"),
    )
    return c.select(
        "c_custkey",
        url.alias("url"),
        F.parse_url(url, F.lit("HOST")).alias("host"),
        F.parse_url(url, F.lit("PATH")).alias("path"),
        F.parse_url(url, F.lit("QUERY"), F.lit("nation")).alias("nation_param"),
    )


# --- fn_variant_json: Spark 4 VARIANT ingestion ---------------------------
# parse_json -> VARIANT is the open-ended semi-structured path (no
# declared schema, binary-encoded, field access without re-parsing).
# DuckDB twin uses its JSON extraction; outputs are projected to
# concrete types so the comparison is type-stable.

_VARIANT_ORACLE = """
SELECT event_id,
       CAST(json_extract(props, '$.k') AS INTEGER) AS k,
       CAST(json_extract(props, '$.k') AS INTEGER) % 10 AS k_mod,
       CASE WHEN props IS NULL THEN NULL
            ELSE 'OBJECT<k: BIGINT>' END AS variant_schema
FROM events WHERE event_id % 100 = 0
"""


@register("fn_variant_json", oracle=_VARIANT_ORACLE)
def fn_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT ingest + typed field extraction + schema_of_variant.
    At 100 TB, VARIANT beats from_json-with-declared-schema when the
    payload shape drifts: the binary encoding parses once at ingest
    and every later access is a cheap path lookup, not a re-parse."""
    ev = load_table(spark, sf_dir, "events").where(F.col("event_id") % 100 == 0)
    v = F.parse_json("props")
    return ev.select(
        "event_id",
        F.variant_get(v, "$.k", "int").alias("k"),
        (F.variant_get(v, "$.k", "int") % 10).alias("k_mod"),
        F.schema_of_variant(v).alias("variant_schema"),
    )


# --- fn_map_hof: map higher-order functions --------------------------------
# map_filter / transform_values / map_zip_with over a per-row map.
# DuckDB has no map lambdas, so the oracle rebuilds the same scalars
# from a list-of-structs pipeline — the key checks semantics, the
# Spark side exercises the real map HOFs.

_MAP_HOF_ORACLE = """
SELECT l_orderkey, l_linenumber,
       CAST(l_quantity AS INTEGER) * 2 AS qty_doubled,
       COALESCE(array_to_string(list_sort(list_transform(list_filter([
           {'k': 'qty',      'v': CAST(l_quantity AS INTEGER)},
           {'k': 'disc_pct', 'v': CAST(floor(l_discount*100 + 0.5) AS INTEGER)},
           {'k': 'tax_pct',  'v': CAST(floor(l_tax*100 + 0.5) AS INTEGER)}
         ], x -> x.v >= 5), x -> x.k)), ','), '') AS big_keys,
       CAST(3 * (CAST(l_quantity AS INTEGER)
                 + CAST(floor(l_discount*100 + 0.5) AS INTEGER)
                 + CAST(floor(l_tax*100 + 0.5) AS INTEGER)) AS BIGINT) AS sum_zipped
FROM lineitem WHERE l_orderkey < 300
"""


@register("fn_map_hof", oracle=_MAP_HOF_ORACLE)
def fn_map_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """map_filter + transform_values + map_zip_with: build a 3-entry
    int map per row, double it, filter it, zip original+doubled
    (= 3×), and fold the zipped values. All JVM-side map expressions;
    the tiny fixed map size keeps the interpreted-HOF cost nil."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 300)
    pct = lambda c: F.floor(F.col(c) * 100 + F.lit(0.5)).cast("int")  # noqa: E731
    m = F.map_from_arrays(
        F.array(F.lit("qty"), F.lit("disc_pct"), F.lit("tax_pct")),
        F.array(F.col("l_quantity").cast("int"), pct("l_discount"), pct("l_tax")),
    )
    doubled = F.transform_values(m, lambda k, v: v * 2)
    big = F.map_filter(m, lambda k, v: v >= 5)
    zipped = F.map_zip_with(m, doubled, lambda k, a, b: a + b)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.element_at(doubled, "qty").alias("qty_doubled"),
        F.concat_ws(",", F.array_sort(F.map_keys(big))).alias("big_keys"),
        F.aggregate(
            F.map_values(zipped),
            F.lit(0).cast("bigint"),
            lambda acc, x: acc + x,
        ).alias("sum_zipped"),
    )


# --- fn_date_spine_fill ---------------------------------------------------

# Time-series gap filling: a generated per-user date spine LEFT-joined
# to actual daily activity, zero-filling silent days. sequence() +
# explode is the Spark-native date spine (no driver loop, no recursive
# CTE); at 100 TB the spine is proportional to users x days, not
# events, and the daily aggregate is map-side combined before its one
# shuffle.

_SPINE_ORACLE = """
WITH span AS (
  SELECT user_id,
         min(date_trunc('day', ts)) AS d0,
         max(date_trunc('day', ts)) AS d1
  FROM events WHERE user_id < 30 GROUP BY user_id
),
spine AS (
  SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
  FROM span
),
daily AS (
  SELECT user_id, date_trunc('day', ts) AS day,
         CAST(count(*) AS BIGINT) AS n,
         CAST(SUM(CAST(round((value) * 100) AS BIGINT)) / 100.0 AS DOUBLE) AS v
  FROM events WHERE user_id < 30 GROUP BY 1, 2
)
SELECT s.user_id, s.day,
       CAST(COALESCE(d.n, 0) AS BIGINT) AS n_events,
       CAST(COALESCE(d.v, 0.0) AS DOUBLE) AS value_sum
FROM spine s LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
"""


@register("fn_date_spine_fill", oracle=_SPINE_ORACLE)
def fn_date_spine_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily activity with zero-filled gaps: generate each
    user's [first_day, last_day] spine with sequence()/explode, left
    join the daily aggregate, coalesce missing days to zero. The
    exact-grid value sum keeps the join's float output hash-stable."""
    from delta_lake_play_spark.functions.exact import dsum

    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 30)
    day = F.date_trunc("day", F.col("ts"))
    span = ev.groupBy("user_id").agg(
        F.min(day).alias("d0"), F.max(day).alias("d1")
    )
    spine = span.select(
        "user_id",
        F.explode(
            F.sequence("d0", "d1", F.expr("INTERVAL 1 DAY"))
        ).alias("day"),
    )
    daily = ev.groupBy("user_id", day.alias("day")).agg(
        F.count("*").alias("n"), dsum("value", 2).alias("v")
    )
    return spine.join(daily, ["user_id", "day"], "left").select(
        "user_id",
        "day",
        F.coalesce("n", F.lit(0)).cast("bigint").alias("n_events"),
        F.coalesce("v", F.lit(0.0)).cast("double").alias("value_sum"),
    )


# --- fn_stack_unpivot -----------------------------------------------------

# Wide->long reshaping (melt): one row per (key, metric) via the
# stack() generator — the Spark-native unpivot (also surfaced as
# DataFrame.unpivot/melt in Spark 3.4+). A pure narrow generator: no
# shuffle, output rows = input rows x metrics.

_UNPIVOT_ORACLE = """
SELECT o_orderkey, metric, val
FROM (
  SELECT o_orderkey,
         unnest(['totalprice', 'custkey', 'year']) AS metric,
         unnest([o_totalprice,
                 CAST(o_custkey AS DOUBLE),
                 CAST(EXTRACT(year FROM o_orderdate) AS DOUBLE)]) AS val
  FROM orders WHERE o_orderkey < 500
) t
"""


@register("fn_stack_unpivot", oracle=_UNPIVOT_ORACLE)
def fn_stack_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot three per-order measures into (metric, val) rows with
    the stack() generator — the inverse of agg_pivot. Narrow map,
    codegen'd, zero shuffle."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 500)
    return o.select(
        "o_orderkey",
        F.expr(
            "stack(3, 'totalprice', o_totalprice,"
            " 'custkey', CAST(o_custkey AS DOUBLE),"
            " 'year', CAST(year(o_orderdate) AS DOUBLE)) AS (metric, val)"
        ),
    )


# --- fn_levenshtein -------------------------------------------------------

# Edit distance against a broadcast probe — the verify stage of
# fuzzy entity resolution (candidate pairs come from blocking/LSH at
# scale, never all-pairs). Both engines implement classic
# Wagner-Fischer, so the distances agree exactly.

_LEV_PROBE = "Customer#000000042"

_LEV_ORACLE = f"""
SELECT c_custkey, c_name,
       CAST(levenshtein(c_name, '{_LEV_PROBE}') AS BIGINT) AS edit_dist
FROM customer
WHERE levenshtein(c_name, '{_LEV_PROBE}') <= 3
"""


@register("fn_levenshtein", oracle=_LEV_ORACLE)
def fn_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers whose name is within edit distance 3 of a probe
    string. Narrow map over the dimension — the fuzzy-match primitive
    used by dedup verify stages; Spark 3.5+'s bounded form
    (``levenshtein(l, r, threshold)``) can short-circuit the DP when
    only the cutoff matters."""
    c = load_table(spark, sf_dir, "customer")
    dist = F.levenshtein(F.col("c_name"), F.lit(_LEV_PROBE))
    return (
        c.select(
            "c_custkey", "c_name", dist.cast("bigint").alias("edit_dist")
        )
        .where(F.col("edit_dist") <= 3)
    )


# --- fn_explode_outer -----------------------------------------------------

# Outer generator semantics: a row whose array is empty (or NULL)
# must SURVIVE the explosion with a NULL element — plain explode
# silently drops it, which in a tokenize-then-join pipeline loses
# every empty document. DuckDB has no unnest-outer; the oracle
# emulates it by substituting [NULL] for NULL and empty arrays alike
# (Spark's explode_outer emits one (doc_id, NULL) row for both, while
# DuckDB's unnest(NULL) would emit nothing — FIXTURES.md declares the
# text column nullable, so both cases must agree).

_EXPLODE_OUTER_ORACLE = """
SELECT doc_id, tok
FROM (
  SELECT doc_id,
         CASE WHEN toks IS NULL OR len(toks) = 0 THEN [NULL]
              ELSE toks END AS toks2
  FROM (
    SELECT doc_id,
           list_filter(string_split(text, ' '), x -> len(x) > 6) AS toks
    FROM documents WHERE doc_id < 200
  )
), unnest(toks2) AS u(tok)
"""


@register("fn_explode_outer", oracle=_EXPLODE_OUTER_ORACLE)
def fn_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode_outer over a filtered token array: documents with no
    token longer than 6 chars keep one (doc_id, NULL) row instead of
    vanishing — the LEFT JOIN LATERAL semantic plain explode lacks."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 200)
    toks = F.filter(F.split("text", " "), lambda x: F.length(x) > 6)
    return d.select("doc_id", F.explode_outer(toks).alias("tok"))


# --- fn_date_trunc_week_quarter -------------------------------------------

# Reporting-calendar truncations: week (both engines start Monday)
# and quarter, plus the ISO week-of-year / quarter extracts — the
# buckets fiscal reporting groups by, distinct from the day/hour
# truncation in fn_date_trunc_extract.

_WQ_ORACLE = """
SELECT o_orderkey,
       date_trunc('week', o_orderdate) AS week_start,
       date_trunc('quarter', o_orderdate) AS quarter_start,
       CAST(EXTRACT(week FROM o_orderdate) AS BIGINT) AS iso_week,
       CAST(EXTRACT(quarter FROM o_orderdate) AS BIGINT) AS quarter
FROM orders WHERE o_orderkey < 400
"""


@register("fn_date_trunc_week_quarter", oracle=_WQ_ORACLE)
def fn_date_trunc_week_quarter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week/quarter truncation and extraction (Monday-start weeks on
    both engines; weekofyear is ISO-8601 on both)."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderkey") < 400)
    return o.select(
        "o_orderkey",
        F.date_trunc("week", "o_orderdate").alias("week_start"),
        F.date_trunc("quarter", "o_orderdate").alias("quarter_start"),
        F.weekofyear("o_orderdate").cast("bigint").alias("iso_week"),
        F.quarter("o_orderdate").cast("bigint").alias("quarter"),
    )


# --- fn_posexplode: array → (position, element) rows ------------------------

_POSEXPLODE_ORACLE = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS tk
  FROM documents WHERE doc_id < 40 AND text IS NOT NULL
)
SELECT doc_id,
       CAST(i - 1 AS INTEGER) AS pos,
       tk[i] AS token
FROM t, unnest(range(1, len(tk) + 1)) AS u(i)
"""


@register("fn_posexplode", oracle=_POSEXPLODE_ORACLE)
def fn_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: element position rides the generator output (the
    order-preserving expansion sequence packing and n-gram windows
    build on) — zero-based like Spark; the oracle derives it from a
    1-based range. NULL text is excluded on both sides (explode skips
    a NULL array; the driver fixtures may carry NULL text)."""
    d = (
        load_table(spark, sf_dir, "documents")
        .filter((F.col("doc_id") < 40) & F.col("text").isNotNull())
    )
    return d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "token")
    )


# --- fn_xml_parse ----------------------------------------------------------
#
# Spark 4 native XML (`from_xml`, SQL XML joined the builtin source
# set in 4.0): rows render to XML with entity-escaped text, the
# parser turns them back into typed columns — entity round-tripping
# (& < >) is exactly what naive string extraction gets wrong, so the
# oracle checks the parsed values equal the original columns. DuckDB
# has no XML parser; the oracle states the round-trip identity
# directly (parse(render(x)) == x), which is the contract.

_XML_ORACLE = """
SELECT s_suppkey, s_name AS name, s_nationkey AS nation, s_acctbal AS bal
FROM supplier
"""


@register("fn_xml_parse", oracle=_XML_ORACLE)
def fn_xml_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Render supplier rows to XML (entity-escaped), parse back with
    from_xml, return the typed fields — a lossless round trip."""
    s = load_table(spark, sf_dir, "supplier")

    def esc(c):
        out = F.regexp_replace(F.col(c).cast("string"), "&", "&amp;")
        out = F.regexp_replace(out, "<", "&lt;")
        return F.regexp_replace(out, ">", "&gt;")

    def elem(tag, col):
        # NULL fields OMIT their element (a missing element parses
        # back to NULL; a NULL inside concat would null the whole doc)
        return F.coalesce(
            F.concat(F.lit(f"<{tag}>"), col, F.lit(f"</{tag}>")), F.lit("")
        )

    xml = s.select(
        "s_suppkey",
        F.concat(
            F.lit("<supplier>"),
            elem("name", esc("s_name")),
            elem("nation", F.col("s_nationkey").cast("string")),
            elem("bal", F.col("s_acctbal").cast("string")),
            F.lit("</supplier>"),
        ).alias("doc"),
    )
    parsed = xml.select(
        "s_suppkey",
        F.from_xml(
            "doc", "name STRING, nation INT, bal DOUBLE"
        ).alias("p"),
    )
    return parsed.select(
        "s_suppkey",
        F.col("p.name").alias("name"),
        F.col("p.nation").alias("nation"),
        F.col("p.bal").alias("bal"),
    )


# --- fn_printf_format --------------------------------------------------------

# C-style formatting (Spark format_string == DuckDB printf — both
# delegate to printf semantics, so zero-padding, width, precision and
# hex render byte-identically). The report-rendering scalar path.

_PRINTF_ORACLE = """
SELECT s_suppkey,
       printf('%05d|%09.2f|%x', s_suppkey, s_acctbal, s_nationkey) AS line
FROM supplier WHERE s_acctbal IS NOT NULL AND s_nationkey IS NOT NULL
"""


@register("fn_printf_format", oracle=_PRINTF_ORACLE)
def fn_printf_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Render supplier rows through C-style format specifiers
    (zero-pad, fixed decimals, hex) — byte-identical across engines."""
    s = load_table(spark, sf_dir, "supplier").where(
        F.col("s_acctbal").isNotNull() & F.col("s_nationkey").isNotNull()
    )
    return s.select(
        "s_suppkey",
        F.format_string(
            "%05d|%09.2f|%x",
            F.col("s_suppkey"),
            F.col("s_acctbal"),
            F.col("s_nationkey"),
        ).alias("line"),
    )


# --- fn_ip_cidr ---------------------------------------------------------------

# IPv4 arithmetic from scratch (the telemetry enrichment shape, no
# udf, no library): render a deterministic address per user, parse it
# back to a uint32 with split + shifts, and test CIDR membership with
# a mask — all whole-stage-codegen integer ops on both engines.

_IP_ORACLE = """
WITH t AS (
  SELECT user_id,
         '10.' || (user_id % 256) || '.' || ((user_id // 256) % 256)
              || '.' || (user_id % 250 + 1) AS ip
  FROM (SELECT DISTINCT user_id FROM events)
),
p AS (
  SELECT user_id, ip, string_split(ip, '.') AS o FROM t
),
n AS (
  SELECT user_id, ip,
         CAST(o[1] AS BIGINT) * 16777216 + CAST(o[2] AS BIGINT) * 65536
         + CAST(o[3] AS BIGINT) * 256 + CAST(o[4] AS BIGINT) AS ip_num
  FROM p
)
SELECT user_id, ip, ip_num,
       (ip_num // 65536) = (CAST(10 AS BIGINT) * 65536 + 7)
         AS in_10_7_slash16
FROM n
"""


@register("fn_ip_cidr", oracle=_IP_ORACLE)
def fn_ip_cidr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse dotted-quad IPv4 to uint32 and test 10.7.0.0/16
    membership with integer math only."""
    ev = load_table(spark, sf_dir, "events").select("user_id").distinct()
    ip = F.concat(
        F.lit("10."),
        (F.col("user_id") % 256).cast("string"),
        F.lit("."),
        ((F.col("user_id") / 256).cast("long") % 256).cast("string"),
        F.lit("."),
        (F.col("user_id") % 250 + 1).cast("string"),
    )
    t = ev.select("user_id", ip.alias("ip"))
    o = F.split(F.col("ip"), r"\.")
    ip_num = (
        F.element_at(o, 1).cast("long") * 16777216
        + F.element_at(o, 2).cast("long") * 65536
        + F.element_at(o, 3).cast("long") * 256
        + F.element_at(o, 4).cast("long")
    )
    n = t.select("user_id", "ip", ip_num.alias("ip_num"))
    return n.select(
        "user_id",
        "ip",
        "ip_num",
        (
            (F.col("ip_num") / 65536).cast("long")
            == F.lit(10 * 65536 + 7).cast("long")
        ).alias("in_10_7_slash16"),
    )


# --- fn_collation_group: Spark 4 collation surface -------------------------
# Case-insensitive GROUP BY through a COLLATED expression
# (UTF8_LCASE), not through lower() rewriting — the Spark 4 collation
# protocol keeps the original strings and changes only comparison
# semantics, which is what lets indexes/stats survive on the stored
# column. The oracle expresses the same grouping with lower() (exact
# equivalence for this ASCII domain); outputs are normalized to
# deterministic representatives (lower key + binary-min variant) so
# the hash is engine-independent.

_COLLATION_ORACLE = """
SELECT lower(seg_mixed) AS seg,
       CAST(COUNT(*) AS BIGINT) AS n,
       min(seg_mixed) AS first_variant
FROM (
  SELECT CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
              ELSE lower(c_mktsegment) END AS seg_mixed
  FROM customer
)
GROUP BY lower(seg_mixed)
"""


@register("fn_collation_group", oracle=_COLLATION_ORACLE)
def fn_collation_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixed-case segment labels grouped case-insensitively via
    ``collate(x, 'UTF8_LCASE')``: both case variants of each segment
    land in one group. The group key value under a collation is an
    arbitrary member, so the output key is normalized with lower()
    and the deterministic witness is the binary min variant."""
    c = load_table(spark, sf_dir, "customer")
    mixed = F.when(
        F.col("c_custkey") % 2 == 0, F.upper("c_mktsegment")
    ).otherwise(F.lower("c_mktsegment"))
    df = c.select(mixed.alias("seg_mixed"))
    return (
        df.groupBy(F.expr("collate(seg_mixed, 'UTF8_LCASE')").alias("k"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("seg_mixed").alias("first_variant"),
        )
        .select(
            F.lower(F.col("k")).cast("string").alias("seg"),
            "n",
            "first_variant",
        )
    )


# --- fn_variant_extract (Spark 4 VARIANT: parse_json / variant_get) --------
# The open-format semi-structured type (Spark 4 + Delta variantType):
# parse once into VARIANT, extract typed paths without re-parsing per
# field. At 100 TB the win over from_json-per-field is one parse per
# row and binary-encoded shredded access; here the surface is proven
# against a plain-JSON oracle. Outputs are plain typed columns — the
# VARIANT itself never reaches the hash-checked schema.

_VARIANT_ORACLE = """
SELECT event_id,
       CAST(json_extract(props, '$.k') AS BIGINT) AS k,
       CAST(json_extract_string(props, '$.absent') AS VARCHAR) AS missing,
       CASE WHEN props IS NULL THEN NULL ELSE 'OBJECT<k: BIGINT>' END
         AS vschema
FROM events
WHERE COALESCE(CAST(json_extract(props, '$.k') AS BIGINT), -1) >= 50
"""


@register("fn_variant_extract", oracle=_VARIANT_ORACLE)
def fn_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``parse_json(props)`` → VARIANT, then typed path extraction
    (``variant_get`` with a target type), a missing-path probe
    (``try_variant_get`` → NULL, never an error), and
    ``schema_of_variant`` — the Spark 4 semi-structured surface the
    ``from_json``-with-declared-schema keys cannot express (no schema
    is declared anywhere here). The filter runs ON the variant
    extraction, proving predicates compose with it."""
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    return (
        ev.select(
            "event_id",
            F.variant_get(v, "$.k", "bigint").alias("k"),
            F.try_variant_get(v, "$.absent", "string").alias("missing"),
            F.schema_of_variant(v).alias("vschema"),
        )
        .where(F.coalesce(F.col("k"), F.lit(-1)) >= 50)
    )


# --- fn_transpose (Spark 4 DataFrame.transpose) -----------------------------

# Rows→columns flip (Spark 4.0): the first column's VALUES become the
# output column names; every remaining column becomes one output row
# keyed by its name. Inherently driver-bounded — the output width IS
# the input row count — so the right input is always a small
# aggregate (here: 5 regions), never a raw table; that bound is the
# scale contract. The TPC-H region names are part of the declared
# fixture contract (the standard 5-constant list), so the oracle can
# name the transposed columns literally; a renamed region would fail
# LOUDLY as a missing column, not silently mis-hash.

_TRANSPOSE_ORACLE = """
WITH per AS (
  SELECT r_name,
         CAST(COUNT(*) AS BIGINT) AS n_custs,
         CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
           AS sum_bal_cents
  FROM customer
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY r_name
)
SELECT 'n_custs' AS key,
       (SELECT n_custs FROM per WHERE r_name = 'AFRICA') AS "AFRICA",
       (SELECT n_custs FROM per WHERE r_name = 'AMERICA') AS "AMERICA",
       (SELECT n_custs FROM per WHERE r_name = 'ASIA') AS "ASIA",
       (SELECT n_custs FROM per WHERE r_name = 'EUROPE') AS "EUROPE",
       (SELECT n_custs FROM per WHERE r_name = 'MIDDLE EAST') AS "MIDDLE EAST"
UNION ALL
SELECT 'sum_bal_cents',
       (SELECT sum_bal_cents FROM per WHERE r_name = 'AFRICA'),
       (SELECT sum_bal_cents FROM per WHERE r_name = 'AMERICA'),
       (SELECT sum_bal_cents FROM per WHERE r_name = 'ASIA'),
       (SELECT sum_bal_cents FROM per WHERE r_name = 'EUROPE'),
       (SELECT sum_bal_cents FROM per WHERE r_name = 'MIDDLE EAST')
"""


@register("fn_transpose", oracle=_TRANSPOSE_ORACLE)
def fn_transpose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-region customer stats flipped rows→columns via
    DataFrame.transpose (region becomes the header row)."""
    c = load_table(spark, sf_dir, "customer")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(load_table(spark, sf_dir, "region"))
    per = (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.sum(F.round(F.col("c_acctbal") * 100).cast("long"))
            .cast("long")
            .alias("sum_bal_cents"),
        )
    )
    return per.transpose()


# --- fn_digest_codec --------------------------------------------------------
# Cryptographic digests and binary codecs over part names. Unlike
# fn_hash (rows-only by design: Spark's xxhash64/murmur3 families
# have no DuckDB counterpart), MD5, SHA-256, base64 and hex are
# standardized byte-level algorithms — every engine must produce the
# same octets — so this key is fully hash-checked. The row-level
# roundtrip flag (unbase64∘base64 = identity) pins the decoder too.
# Scale shape: a pure narrow map over the scan, no shuffle at all;
# digest UDFs are JVM intrinsics inside WholeStageCodegen, the exact
# pattern for content-addressing / dedup-keying 100 TB of documents.

_DIGEST_ORACLE = """
SELECT p_partkey,
       md5(p_name) AS name_md5,
       sha256(p_name) AS name_sha256,
       to_base64(encode(p_name)) AS name_b64,
       hex(encode(p_name)) AS name_hex,
       decode(from_base64(to_base64(encode(p_name)))) = p_name AS roundtrip_ok
FROM part
"""


@register("fn_digest_codec", oracle=_DIGEST_ORACLE)
def fn_digest_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MD5 / SHA-256 digests and base64 / hex codecs of p_name, with
    a base64 decode-roundtrip check (all standardized byte-level
    algorithms, so the DuckDB oracle hash-matches octet-for-octet)."""
    p = load_table(spark, sf_dir, "part")
    name_bin = F.col("p_name").cast("binary")
    return p.select(
        "p_partkey",
        F.md5(name_bin).alias("name_md5"),
        F.sha2(name_bin, 256).alias("name_sha256"),
        F.base64(name_bin).alias("name_b64"),
        F.hex(name_bin).alias("name_hex"),
        (F.unbase64(F.base64(name_bin)).cast("string") == F.col("p_name")).alias(
            "roundtrip_ok"
        ),
    )
