"""Projection / filter / predicates (SURVEY.md §2.2).

The reference's predicates are an equality join condition
(``api.py:94``) and an ``id IN (...)`` delete target built unsafely
by f-string (``api.py:107`` — renders ``(7,)`` for single ids and is
injection-prone). Here every predicate is a parameterized Column
expression, so Catalyst pushes it into the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from delta_lake_play_spark.registry import register
from delta_lake_play_spark.sources.catalog import load_table

# --- project_columns: fixed column set/order (api.py:23-26,86) --------

_PROJECT_ORACLE = "SELECT c_custkey, c_name, c_mktsegment FROM customer"


@register("project_columns", oracle=_PROJECT_ORACLE)
def project_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


# --- filter_in_list: the api.py:107 predicate, done safely ------------

_IDS = [1, 7, 42, 99, 123]

_IN_ORACLE = f"""
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
WHERE o_custkey IN ({', '.join(map(str, _IDS))})
"""


@register("filter_in_list", oracle=_IN_ORACLE)
def filter_in_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`Column.isin` instead of the reference's f-string SQL — same
    semantics, no single-element/empty-tuple hazard, pushdown-able."""
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey").isin(_IDS))
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


# --- filter_equality (api.py:94 shape) ---------------------------------

_EQ_ORACLE = """
SELECT event_id, user_id, value FROM events WHERE event_type = 'error'
"""


@register("filter_equality", oracle=_EQ_ORACLE)
def filter_equality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "error")
        .select("event_id", "user_id", "value")
    )


# --- filter_range: numeric + date range predicates ---------------------

_RANGE_ORACLE = """
SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register("filter_range", oracle=_RANGE_ORACLE)
def filter_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")


# --- filter_null_handling: three-valued logic ---------------------------
# The testdata has no physical nulls, so nulls are introduced with
# NULLIF and then exercised with IS NULL / COALESCE on both sides.

_NULL_ORACLE = """
SELECT c_custkey,
       NULLIF(c_mktsegment, 'BUILDING') AS seg_or_null,
       COALESCE(NULLIF(c_mktsegment, 'BUILDING'), '(redacted)') AS seg_filled
FROM customer
WHERE NULLIF(c_mktsegment, 'BUILDING') IS NULL OR c_acctbal < 0
"""


@register("filter_null_handling", oracle=_NULL_ORACLE)
def filter_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    seg_or_null = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    return c.select(
        "c_custkey",
        seg_or_null.alias("seg_or_null"),
        F.coalesce(seg_or_null, F.lit("(redacted)")).alias("seg_filled"),
        "c_acctbal",
    ).filter(seg_or_null.isNull() | (F.col("c_acctbal") < 0)).drop("c_acctbal")


# --- filter_like: string pattern predicates -----------------------------

_LIKE_ORACLE = """
SELECT p_partkey, p_name, p_brand FROM part
WHERE p_name LIKE '%widget%' AND p_brand LIKE 'Brand#1%'
"""


@register("filter_like", oracle=_LIKE_ORACLE)
def filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_name").like("%widget%") & F.col("p_brand").like("Brand#1%")
    ).select("p_partkey", "p_name", "p_brand")


# --- sample_hash_mod (deterministic, cross-engine) ------------------------

_HASHSAMPLE_ORACLE = """
SELECT l_orderkey, l_linenumber, l_quantity
FROM lineitem
WHERE (l_orderkey * 2654435761 + l_linenumber * 40503) % 1000 < 100
"""


@register("sample_hash_mod", oracle=_HASHSAMPLE_ORACLE)
def sample_hash_mod(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible ~10% sample by hash-mod on the row key — the
    training-data sampling pattern that survives reruns, engine
    changes, and repartitioning (unlike rand()-based sampling, the
    same rows are selected everywhere, which also makes held-out
    splits stable). Pure int64 arithmetic, no shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    keep = (
        (F.col("l_orderkey") * F.lit(2654435761) + F.col("l_linenumber") * F.lit(40503))
        % 1000
        < 100
    )
    return li.where(keep).select("l_orderkey", "l_linenumber", "l_quantity")


# --- sample_bernoulli (rows-only: RNG differs across engines) -------------


@register("sample_bernoulli")
def sample_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded Bernoulli row sampling (`df.sample`) — deterministic
    within Spark for a fixed seed and partitioning, but the RNG
    stream is engine-specific, hence rows-only."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.sample(fraction=0.1, seed=42).select(
        "l_orderkey", "l_linenumber", "l_quantity"
    )


# --- filter_null_safe_eq --------------------------------------------------

_NULLSAFE_ORACLE = """
SELECT e1.event_id AS id_a, e2.event_id AS id_b
FROM events e1 JOIN events e2
  ON json_extract_string(e1.props, '$.k') IS NOT DISTINCT FROM
     json_extract_string(e2.props, '$.k')
 AND e1.event_id < e2.event_id
WHERE e1.event_id < 50 AND e2.event_id < 50
"""


@register("filter_null_safe_eq", oracle=_NULLSAFE_ORACLE)
def filter_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality (`<=>` / IS NOT DISTINCT FROM): the join
    predicate where NULL must match NULL — e.g. grouping events by an
    optional JSON property. A plain `=` silently drops every
    NULL-keyed row."""
    ev = load_table(spark, sf_dir, "events").where(F.col("event_id") < 50)
    k = F.get_json_object("props", "$.k")
    a = ev.select(F.col("event_id").alias("id_a"), k.alias("k_a"))
    b = ev.select(F.col("event_id").alias("id_b"), k.alias("k_b"))
    return (
        a.join(b, F.col("k_a").eqNullSafe(F.col("k_b")) & (F.col("id_a") < F.col("id_b")))
        .select("id_a", "id_b")
    )


# --- sample_stratified_topn (exact N per stratum) -------------------------

_STRAT_N = 50

_STRAT_ORACLE = f"""
SELECT event_type, event_id, user_id, value FROM (
  SELECT event_type, event_id, user_id, value,
         row_number() OVER (
           PARTITION BY event_type
           ORDER BY (event_id * 2654435761 + 40503) % 1000000007, event_id
         ) AS rn
  FROM events
) WHERE rn <= {_STRAT_N}
"""


@register("sample_stratified_topn", oracle=_STRAT_ORACLE)
def sample_stratified_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-size stratified sample: exactly N rows per stratum,
    chosen by ranking a deterministic per-row hash inside each group
    (a seeded shuffle that is stable across engines, reruns, and
    partitioning — rand() is none of those). One shuffle on the
    stratum key; per-group state is the running top-N. This is the
    balanced-eval-split / per-source-quota primitive a data-mix
    pipeline needs when proportional sampling would starve small
    strata."""
    ev = load_table(spark, sf_dir, "events")
    shuffle_key = (F.col("event_id") * F.lit(2654435761) + F.lit(40503)) % F.lit(
        1000000007
    )
    w = Window.partitionBy("event_type").orderBy(shuffle_key, "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _STRAT_N)
        .select("event_type", "event_id", "user_id", "value")
    )


# --- sample_data_mix (per-source rates, one pass) -------------------------

_MIX_RATES = {"src0": 1000, "src1": 500, "src2": 250}  # per-mille keep rates
_MIX_DEFAULT = 100


def _mix_oracle() -> str:
    cases = " ".join(
        f"WHEN source = '{s}' THEN {r}" for s, r in sorted(_MIX_RATES.items())
    )
    return f"""
SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
       CAST(SUM(n_chars) AS BIGINT) AS kept_chars
FROM documents
WHERE (doc_id * 2654435761 + 97) % 1000 < (CASE {cases} ELSE {_MIX_DEFAULT} END)
GROUP BY source
"""


@register("sample_data_mix", oracle=_mix_oracle())
def sample_data_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data mixing: keep each source at its configured rate
    (100% src0, 50% src1, 25% src2, 10% everything else) with one
    deterministic hash-threshold predicate — a single narrow pass,
    no shuffle until the audit aggregate. The same upweight/
    downweight table drives corpus composition at 100 TB; hash-based
    selection keeps every rerun and engine picking identical rows."""
    d = load_table(spark, sf_dir, "documents")
    rate = F.lit(_MIX_DEFAULT)
    for s, r in sorted(_MIX_RATES.items()):
        rate = F.when(F.col("source") == s, F.lit(r)).otherwise(rate)
    keep = (F.col("doc_id") * F.lit(2654435761) + F.lit(97)) % 1000 < rate
    return (
        d.where(keep)
        .groupBy("source")
        .agg(F.count("*").alias("n_kept"), F.sum("n_chars").alias("kept_chars"))
    )


# --- sample_token_budget_mix (exact token budgets per source) --------------
# Real pretraining mixes are specified as TOKEN BUDGETS per domain
# ("40% web, 30% code, ..." of a fixed total), not keep-rates: the
# mix owner fixes a total token count B, splits it across sources by
# weight with EXACT integer arithmetic (largest-remainder rounding,
# so the per-source budgets sum to B precisely), and each source
# contributes documents in a deterministic hash order until its
# budget is exhausted. Compare `sample_data_mix` (rate-based, one
# narrow pass) — budget-based mixing needs one shuffle on the source
# key for the per-source running token total.

_BUDGET_DIVISOR = 5  # B = total corpus tokens / 5


def _token_budget_oracle() -> str:
    return f"""
WITH docs AS (
  SELECT doc_id, source, len(string_split(text, ' ')) AS toks
  FROM documents WHERE text IS NOT NULL
),
srcs AS (
  SELECT source,
         1 + (COALESCE(TRY_CAST(regexp_extract(source, '[0-9]+') AS BIGINT), 0) % 4) AS w,
         CAST(SUM(toks) AS BIGINT) AS src_toks
  FROM docs GROUP BY source
),
tot AS (SELECT SUM(src_toks) // {_BUDGET_DIVISOR} AS b, SUM(w) AS tw FROM srcs),
alloc AS (
  SELECT s.source, s.w, (t.b * s.w) // t.tw AS fl, (t.b * s.w) % t.tw AS rem, t.b AS b
  FROM srcs s, tot t
),
alloc2 AS (
  SELECT source, w, fl, b - SUM(fl) OVER () AS extra,
         row_number() OVER (ORDER BY rem DESC, source) AS rk
  FROM alloc
),
budgets AS (
  SELECT source, w, fl + CASE WHEN rk <= extra THEN 1 ELSE 0 END AS budget
  FROM alloc2
),
ranked AS (
  SELECT d.source, d.toks, b.budget,
         SUM(d.toks) OVER (
           PARTITION BY d.source
           ORDER BY (d.doc_id * 2654435761 + 40503) % 1000000007, d.doc_id
           ROWS UNBOUNDED PRECEDING) AS cum
  FROM docs d JOIN budgets b USING (source)
),
kept AS (
  SELECT source, CAST(count(*) AS BIGINT) AS kept_docs,
         CAST(SUM(toks) AS BIGINT) AS kept_tokens
  FROM ranked WHERE cum <= budget GROUP BY source
)
SELECT b.source, CAST(b.w AS BIGINT) AS weight,
       CAST(b.budget AS BIGINT) AS budget_tokens,
       CAST(COALESCE(k.kept_docs, 0) AS BIGINT) AS kept_docs,
       CAST(COALESCE(k.kept_tokens, 0) AS BIGINT) AS kept_tokens
FROM budgets b LEFT JOIN kept k USING (source)
"""


@register("sample_token_budget_mix", oracle=_token_budget_oracle())
def sample_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget data mixing: split an exact global token budget
    B = corpus_tokens/5 across sources by weight (weight derived
    from the source name so it is data-driven on every fixture),
    with largest-remainder rounding so the integer per-source
    budgets sum to B exactly; then each source contributes docs in
    deterministic hash order until its budget is spent (a doc is
    kept iff its running total fits entirely). Output is the
    source-level audit: weight, budget, kept docs/tokens.

    Scale shape: one corpus pass for per-doc token counts, one
    map-side-combined aggregate to source level (budget arithmetic
    runs on the #sources-row aggregate — windows there are
    aggregate-sized), one broadcast of the budget table back onto
    the corpus, and ONE shuffle on the source key for the running
    token total. At 100 TB the per-source sort is the cost; a real
    deployment first estimates each source's hash cutoff from a
    token-count quantile sketch and exact-sorts only the ~budget
    prefix, which this plan's shape admits without change."""
    d = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    docs = d.select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("toks"),
    )
    srcs = docs.groupBy("source").agg(
        F.sum("toks").alias("src_toks"),
    ).select(
        "source",
        "src_toks",
        (
            F.lit(1)
            + F.coalesce(
                # try_cast: a digit-free source name extracts '' and
                # must weight 1, not throw under ANSI cast
                F.regexp_extract("source", "[0-9]+", 0).try_cast("bigint"),
                F.lit(0),
            )
            % 4
        ).alias("w"),
    )
    all_w = Window.partitionBy()  # aggregate-sized table: #sources rows
    b = F.expr(f"sum(src_toks) over () div {_BUDGET_DIVISOR}")
    tw = F.sum("w").over(all_w)
    alloc = srcs.select(
        "source", "w", b.alias("b"), tw.alias("tw")
    ).select(
        "source",
        "w",
        # integer div/% exactly as the oracle's // and % on BIGINT
        F.expr("b * w div tw").alias("fl"),
        F.expr("(b * w) % tw").alias("rem"),
        "b",
    )
    rk = F.row_number().over(
        Window.partitionBy().orderBy(F.col("rem").desc(), "source")
    )
    extra = F.col("b") - F.sum("fl").over(all_w)
    budgets = alloc.select(
        "source",
        "w",
        (
            F.col("fl")
            + F.when(rk <= extra, F.lit(1)).otherwise(F.lit(0))
        ).alias("budget"),
    ).localCheckpoint()  # #sources rows; both consumers (the
    # broadcast onto the corpus and the final audit join) reuse the
    # materialized table instead of re-running the corpus aggregate
    cum_w = (
        Window.partitionBy("source")
        .orderBy(
            (F.col("doc_id") * F.lit(2654435761) + F.lit(40503))
            % F.lit(1000000007),
            "doc_id",
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    kept = (
        docs.join(F.broadcast(budgets.select("source", "budget")), "source")
        .withColumn("cum", F.sum("toks").over(cum_w))
        .where(F.col("cum") <= F.col("budget"))
        .groupBy("source")
        .agg(
            F.count("*").alias("kept_docs"),
            F.sum("toks").alias("kept_tokens"),
        )
    )
    return budgets.join(kept, "source", "left").select(
        "source",
        F.col("w").alias("weight"),
        F.col("budget").alias("budget_tokens"),
        F.coalesce("kept_docs", F.lit(0)).alias("kept_docs"),
        F.coalesce("kept_tokens", F.lit(0)).alias("kept_tokens"),
    )
