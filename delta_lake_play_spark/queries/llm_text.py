"""Text-analysis operators over ``documents`` (SURVEY.md §2.12):
corpus stats, quality filtering, language-ID, fingerprinting.

All pure-Catalyst column expressions from
``delta_lake_play_spark/llm/text.py`` — per-document narrow work
inside whole-stage codegen, so throughput scales linearly with
executors; the only shuffle in this module is the stats groupBy
(low-cardinality key, map-side partial agg).

Oracle-parity: every aggregate is an int64 sum or a single IEEE
division of exact integers — order-independent, bit-identical in
DuckDB (see ``text.py`` module docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from delta_lake_play_spark.llm import ngrams as ng
from delta_lake_play_spark.llm import text as tx
from delta_lake_play_spark.registry import register
from delta_lake_play_spark.sources.catalog import load_table

# --- llm_text_stats -------------------------------------------------------

_STATS_ORACLE = """
SELECT lang, source,
       count(*) AS n_docs,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
       CAST(SUM(len(string_split(text, ' '))) AS DOUBLE) / count(*) AS avg_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       CAST(SUM(len(list_distinct(string_split(text, ' ')))) AS BIGINT)
         AS total_distinct_tokens
FROM documents
GROUP BY lang, source
"""


@register("llm_text_stats", oracle=_STATS_ORACLE)
def llm_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(lang, source) corpus statistics: doc/token/char counts.

    Integer sums only (order-independent); the mean is one exact-int
    division. One shuffle on a tiny key space."""
    d = load_table(spark, sf_dir, "documents")
    n_tok = tx.token_count("text")
    return d.groupBy("lang", "source").agg(
        F.count("*").alias("n_docs"),
        F.sum(n_tok).alias("total_tokens"),
        (F.sum(n_tok).cast("double") / F.count("*")).alias("avg_tokens"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(F.size(tx.distinct_tokens("text"))).alias("total_distinct_tokens"),
    )


# --- llm_doc_quality_filter -----------------------------------------------

_QUALITY_ORACLE = """
WITH q AS (
  SELECT doc_id, lang,
         len(string_split(text, ' ')) AS n_tokens,
         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
           / len(string_split(text, ' ')) AS distinct_ratio,
         CAST(n_chars - (len(string_split(text, ' ')) - 1) AS DOUBLE)
           / len(string_split(text, ' ')) AS mean_token_len
  FROM documents
)
SELECT doc_id, lang, n_tokens, distinct_ratio, mean_token_len
FROM q
WHERE n_tokens >= 40 AND distinct_ratio >= 0.25 AND mean_token_len BETWEEN 2 AND 8
"""


@register("llm_doc_quality_filter", oracle=_QUALITY_ORACLE)
def llm_doc_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality gate: token count, lexical diversity, mean
    token length — the classic cheap filters a corpus pipeline runs
    before any model-based scoring. Pure narrow filter: predicate
    evaluates per-row in codegen, no shuffle at all."""
    d = load_table(spark, sf_dir, "documents")
    q = d.select(
        "doc_id",
        "lang",
        tx.token_count("text").alias("n_tokens"),
        (F.size(tx.distinct_tokens("text")).cast("double") / tx.token_count("text")).alias(
            "distinct_ratio"
        ),
        ((F.col("n_chars") - (tx.token_count("text") - F.lit(1))).cast("double")
         / tx.token_count("text")).alias("mean_token_len"),
    )
    return q.where(
        (F.col("n_tokens") >= 40)
        & (F.col("distinct_ratio") >= 0.25)
        & F.col("mean_token_len").between(2, 8)
    )


# --- llm_text_lang_id -----------------------------------------------------

_LANGID_ORACLE = f"""
SELECT doc_id, lang AS actual_lang,
       {tx.sql_lang_id("text")} AS pred_lang
FROM documents
"""


@register("llm_text_lang_id", oracle=_LANGID_ORACLE)
def llm_text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-dictionary language-ID per document (argmax of per-
    language marker hits, deterministic tie-break). The operator
    shape — array filter + CASE ladder, zero shuffles — is exactly
    where a fastText-style Pandas-UDF scorer would slot in."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.col("lang").alias("actual_lang"),
        tx.lang_id("text").alias("pred_lang"),
    )


# --- llm_text_fingerprint -------------------------------------------------

_FP_ORACLE = f"""
SELECT doc_id, {tx.sql_fingerprint("text")} AS fingerprint
FROM documents
"""


@register("llm_text_fingerprint", oracle=_FP_ORACLE)
def llm_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive rolling-hash document fingerprint (mod-prime
    polynomial fold) — the content-addressable ID exact dedup and
    change detection key on. Bit-identical across engines; at 100 TB
    you'd swap in ``xxhash64`` (see ``fn_hash``) for speed."""
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", tx.fingerprint("text").alias("fingerprint"))


# --- llm_text_token_bpe ---------------------------------------------------

# BPE-ish pre-tokenization: letter runs, digit runs, single other
# glyphs — the GPT-2-style split that precedes merge rules. The same
# regex evaluates identically in Java (Spark) and DuckDB's engine
# because it uses only literal classes and alternation.
_BPE_PATTERN = "[a-z]+|[0-9]+|[^a-z0-9 ]"

_BPE_ORACLE = f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{_BPE_PATTERN}')) AS n_bpe_tokens,
       len(string_split(text, ' ')) AS n_ws_tokens,
       regexp_extract_all(text, '{_BPE_PATTERN}')[1] AS first_bpe_token
FROM documents
"""


@register("llm_text_token_bpe", oracle=_BPE_ORACLE)
def llm_text_token_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting under a BPE-ish regex pre-tokenizer vs plain
    whitespace — the cost model every training-data pipeline needs
    (budget is measured in model tokens, not words). Pure codegen:
    one regex pass per document, no shuffle."""
    d = load_table(spark, sf_dir, "documents")
    bpe = F.regexp_extract_all("text", F.lit(_BPE_PATTERN), 0)
    return d.select(
        "doc_id",
        F.size(bpe).alias("n_bpe_tokens"),
        tx.token_count("text").alias("n_ws_tokens"),
        # try_element_at: DuckDB's list[1] on an empty list is NULL;
        # ANSI element_at raises on the empty/whitespace-only doc
        F.try_element_at(bpe, F.lit(1)).alias("first_bpe_token"),
    )


# --- llm_decontaminate ----------------------------------------------------

_DECON_N = 3        # n-gram width for containment
_DECON_STRIDE = 97  # doc_id % 97 == 0 → deterministic "benchmark" set


def _decon_grams_sql(tk: str) -> str:
    gram = " || ' ' || ".join(f"{tk}[i+{d}]" for d in range(_DECON_N))
    return (
        f"list_distinct(list_transform("
        f"range(1, greatest(len({tk}) - {_DECON_N - 1}, 0) + 1), i -> {gram}))"
    )


_DECON_ORACLE = f"""
WITH tk AS (
  SELECT doc_id, list_filter(string_split(text, ' '), x -> len(x) > 0) AS t
  FROM documents
),
g AS (SELECT doc_id, {_decon_grams_sql('t')} AS gs FROM tk),
bg AS (SELECT DISTINCT unnest(gs) AS gram FROM g WHERE doc_id % {_DECON_STRIDE} = 0),
dg AS (SELECT doc_id, unnest(gs) AS gram FROM g WHERE doc_id % {_DECON_STRIDE} <> 0)
SELECT dg.doc_id, CAST(count(*) AS BIGINT) AS n_hits
FROM dg JOIN bg USING (gram)
GROUP BY dg.doc_id
"""


@register("llm_decontaminate", oracle=_DECON_ORACLE)
def llm_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag every training document that
    contains any word 3-gram of the held-out benchmark set (here a
    deterministic doc_id-stride slice standing in for the eval
    suite), with the count of distinct contaminated n-grams per doc.

    Shape at 100 TB: the benchmark n-gram set is small and fixed →
    distinct + broadcast; each corpus doc explodes its distinct
    3-grams (narrow) and the containment check is a broadcast-hash
    semi-join — the corpus is never shuffled. (Hash the grams to
    xxhash64 in production to shrink the broadcast; raw strings here
    keep the oracle byte-exact.)"""
    d = load_table(spark, sf_dir, "documents")
    # Tokenize ONCE and persist: referencing the split/filter subtree
    # from every element_at in the gram lambda lets CollapseProject
    # inline it per reference, re-splitting each text ~300× (measured
    # 11× slower at bench scale).
    tok = d.select(
        "doc_id",
        F.filter(F.split("text", " "), lambda x: F.length(x) > 0).alias("t"),
    ).persist()
    tk = F.col("t")
    n = F.greatest(F.size(tk) - (_DECON_N - 1), F.lit(0))
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(tk, i + d) for d in range(_DECON_N)]
    )
    # sequence(1, 0) would DESCEND in Spark — guard the short-doc case
    grams = F.array_distinct(
        F.when(n >= 1, F.transform(F.sequence(F.lit(1), n), gram))
        .otherwise(F.array().cast("array<string>"))
    )
    g = tok.select("doc_id", grams.alias("gs"))
    bench = (
        g.where(F.col("doc_id") % _DECON_STRIDE == 0)
        .select(F.explode("gs").alias("gram"))
        .distinct()
    )
    corpus = g.where(F.col("doc_id") % _DECON_STRIDE != 0).select(
        "doc_id", F.explode("gs").alias("gram")
    )
    return (
        corpus.join(F.broadcast(bench), "gram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )


# --- llm_tfidf_topterms ---------------------------------------------------
# TF-IDF-style distinctive-term extraction with a LINEAR idf
# (N / df) instead of ln(N / df): division and multiplication are
# correctly-rounded IEEE ops so the score is bit-identical across
# engines, while libm ln() implementations are not guaranteed to
# agree in the last ulp (hash-parity trap). Production would swap in
# F.log — a one-line change that does not alter the plan.

_TFIDF_ORACLE = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM tok GROUP BY doc_id, term
), dfreq AS (
  SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
  FROM tok GROUP BY term
), n AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents
), scored AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
         CAST(tf.tf AS DOUBLE) * (n.n_docs / dfreq.df) AS score
  FROM tf JOIN dfreq USING (term), n
)
SELECT doc_id, term, tf, df, score FROM (
  SELECT *, row_number() OVER (
      PARTITION BY doc_id ORDER BY score DESC, term) AS rn
  FROM scored
) WHERE rn <= 3
"""


@register("llm_tfidf_topterms", oracle=_TFIDF_ORACLE)
def llm_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 distinctive terms per document by tf-idf score.

    Scale shape: explode -> two partial-agg shuffles (term freq per
    doc; doc freq per term over the distinct pairs), a term-keyed
    join (vocabulary-sized right side — sort-merge at 100 TB, and
    Zipf's law means the hot head of the vocabulary is exactly where
    AQE's skew-join split earns its keep), a broadcast of the 1-row
    corpus count, and a per-doc top-k window. Nothing is ever
    all-pairs and no stage holds more than a vocabulary in memory."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tx.tokens("text")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tok.distinct().groupBy("term").agg(F.count("*").alias("df"))
    n = d.agg(F.count("*").cast("double").alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score", F.col("tf").cast("double") * (F.col("n_docs") / F.col("df"))
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("doc_id", "term", "tf", "df", "score")
    )


# --- llm_pii_redact -------------------------------------------------------
# Regex-based PII scrubbing — the pass every training corpus runs
# before anything else. The synthetic documents have no real PII, so
# the operator plants deterministic email/phone-shaped spans in a few
# docs and then scrubs them — exercising detection counts + masking
# replacement end-to-end. Patterns use only RE2-safe syntax (no
# backrefs/lookahead) so Spark's Java regex and DuckDB's RE2 agree.

_EMAIL_RE = r"[a-z0-9._]+@[a-z0-9.-]+\.[a-z]+"
_PHONE_RE = r"\+[0-9]{2}-[0-9]{3}-[0-9]{4}"

_PII_ORACLE = f"""
WITH planted AS (
  SELECT doc_id,
         CASE WHEN doc_id % 11 = 0
              THEN text || ' contact user' || doc_id || '@mail.example.com or +01-555-' ||
                   lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              ELSE text END AS text
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{_PHONE_RE}')) AS BIGINT) AS n_phones,
       regexp_replace(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                      '{_PHONE_RE}', '<PHONE>', 'g') AS clean_text
FROM planted
WHERE len(regexp_extract_all(text, '{_EMAIL_RE}')) > 0
   OR len(regexp_extract_all(text, '{_PHONE_RE}')) > 0
"""


@register("llm_pii_redact", oracle=_PII_ORACLE)
def llm_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detect-and-mask PII spans (emails, phone numbers) with span
    counts per document. Pure narrow regexp codegen — no shuffle at
    all; at 100 TB this runs at scan speed. Production swaps in the
    full pattern battery (SSNs, IBANs, addresses) and an allowlist;
    the plan shape is identical."""
    d = load_table(spark, sf_dir, "documents")
    planted = F.when(
        F.col("doc_id") % 11 == 0,
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.example.com or +01-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ),
    ).otherwise(F.col("text"))
    n_emails = F.regexp_count(planted, F.lit(_EMAIL_RE))
    n_phones = F.regexp_count(planted, F.lit(_PHONE_RE))
    clean = F.regexp_replace(
        F.regexp_replace(planted, _EMAIL_RE, "<EMAIL>"), _PHONE_RE, "<PHONE>"
    )
    return (
        d.select(
            "doc_id",
            n_emails.alias("n_emails"),
            n_phones.alias("n_phones"),
            clean.alias("clean_text"),
        )
        .where((F.col("n_emails") > 0) | (F.col("n_phones") > 0))
    )


# --- llm_repetition_filter ------------------------------------------------
# Gopher-style repetition rule (Rae et al. 2021, public): documents
# whose most frequent bigram covers too much of the text are
# boilerplate/spam. Fraction = two exact integer counts + one IEEE
# division — bit-identical across engines.

_REP_THRESHOLD = 0.18

_REP_ORACLE = f"""
WITH {ng.sql_bigram_hashes_ctes()},
counts AS (
  SELECT doc_id, bigram, CAST(count(*) AS BIGINT) AS c
  FROM bg GROUP BY doc_id, bigram
)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS n_bigrams,
       CAST(MAX(c) AS BIGINT) AS top_count,
       CAST(MAX(c) AS DOUBLE) / SUM(c) AS rep_ratio,
       (CAST(MAX(c) AS DOUBLE) / SUM(c)) > {_REP_THRESHOLD} AS flagged
FROM counts GROUP BY doc_id
"""


@register("llm_repetition_filter", oracle=_REP_ORACLE)
def llm_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-bigram repetition ratio per document with a Gopher-style
    flag. Computed ENTIRELY MAP-SIDE (optimization r11): every
    statistic is within one document, so the per-doc bigram array
    (``llm/ngrams.py::doc_bigram_arrays`` — int64 hashes, not
    ~40-byte strings) is sorted and the longest equal run counted
    with one ``aggregate`` HOF — zero shuffles, zero joins, the plan
    is scan → project. Replaces the two shuffles (doc,bigram)+(doc)
    of the aggregate shape; per-doc cost is O(n log n) on an int64
    array, n = token count. The production battery adds the 2-4-gram
    and duplicate-line variants of the same shape."""
    d = load_table(spark, sf_dir, "documents")
    arr = ng.doc_bigram_arrays(d).where(F.size("bigrams") >= 1)
    # max multiplicity == longest equal run of the sorted array
    srt = F.array_sort("bigrams")
    top = F.aggregate(
        srt,
        F.struct(
            F.lit(None).cast("bigint").alias("prev"),
            F.lit(0).cast("bigint").alias("run"),
            F.lit(0).cast("bigint").alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(acc.prev == x, acc.run + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc.best,
                F.when(acc.prev == x, acc.run + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc.best,
    )
    n = F.size("bigrams").cast("bigint")
    sel = arr.select(
        "doc_id",
        n.alias("n_bigrams"),
        top.alias("top_count"),
    )
    ratio = F.col("top_count").cast("double") / F.col("n_bigrams")
    return sel.select(
        "doc_id",
        "n_bigrams",
        "top_count",
        ratio.alias("rep_ratio"),
        (ratio > _REP_THRESHOLD).alias("flagged"),
    )


# --- llm_pack_sequences ----------------------------------------------------
# Greedy sequential packing of documents into fixed token budgets —
# the batch-construction step of a training pipeline. Packing is done
# PER SOURCE SHARD (window partitioned by source), which is the shape
# that scales: a global running sum would serialize onto one
# partition, while per-shard packing is embarrassingly parallel and
# matches how corpora are sharded on disk.

_PACK_BUDGET = 2048

_PACK_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
), packed AS (
  SELECT source, n_tokens,
         CAST(floor((SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     - n_tokens) * 1.0 / {_PACK_BUDGET}) AS BIGINT) AS bin_id
  FROM toks
)
SELECT source, bin_id,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
FROM packed GROUP BY source, bin_id
"""


@register("llm_pack_sequences", oracle=_PACK_ORACLE)
def llm_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign each document to a training-batch bin by the running
    token count within its source shard (bin = where the doc STARTS
    in the token stream). One window + one aggregate, both
    partitioned on source — no global ordering anywhere, so shards
    pack in parallel at any corpus size."""
    d = load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    bin_id = F.floor(
        (F.sum("n_tokens").over(w) - F.col("n_tokens"))
        * F.lit(1.0)
        / F.lit(_PACK_BUDGET)
    ).cast("bigint")
    return (
        toks.withColumn("bin_id", bin_id)
        .groupBy("source", "bin_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        )
    )


# --- llm_context_chunking --------------------------------------------------
# RAG-style fixed-window chunking with overlap: 500-char windows on a
# 400-char stride. sequence() + explode is pure Catalyst — chunking
# 100 TB of text is a narrow map with no shuffle at all until the
# optional per-doc count.

_CHUNK_LEN = 500
_CHUNK_STRIDE = 400

_CHUNK_ORACLE = f"""
SELECT doc_id,
       CAST((pos - 1) / {_CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
       substr(text, pos, {_CHUNK_LEN}) AS chunk,
       CAST(length(substr(text, pos, {_CHUNK_LEN})) AS BIGINT) AS chunk_len
FROM (
  SELECT doc_id, text,
         unnest(generate_series(1, length(text), {_CHUNK_STRIDE})) AS pos
  FROM documents WHERE doc_id < 120
)
"""


@register("llm_context_chunking", oracle=_CHUNK_ORACLE)
def llm_context_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping character windows per document (500 long, 400
    stride). sequence()/explode/substring are all codegen'd JVM
    expressions — a pure narrow map over the corpus."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 120)
    # Guard the empty doc: Spark's sequence(1, 0, step=400) raises on
    # illegal boundaries where generate_series(1, 0, 400) is empty;
    # when-null explodes to no rows, matching the oracle.
    starts = F.when(
        F.length("text") >= 1,
        F.sequence(F.lit(1), F.length("text"), F.lit(_CHUNK_STRIDE)),
    )
    return (
        d.select("doc_id", "text", F.explode(starts).alias("pos"))
        .select(
            "doc_id",
            ((F.col("pos") - 1) / _CHUNK_STRIDE).cast("bigint").alias("chunk_idx"),
            F.substring(F.col("text"), F.col("pos"), F.lit(_CHUNK_LEN)).alias("chunk"),
            F.length(
                F.substring(F.col("text"), F.col("pos"), F.lit(_CHUNK_LEN))
            ).cast("bigint").alias("chunk_len"),
        )
    )


# --- llm_quality_score_linear ---------------------------------------------

# Fixed linear model over engineered per-doc features — the "model-
# based quality filter" stage of a training-data pipeline (a learned
# fastText/logreg scorer at production; weights here are literals).
# Every feature and the score are single IEEE expressions over exact
# integers with identical op trees in Spark and DuckDB, so the hash
# matches without any rounding.

_QSCORE_ORACLE = """
SELECT doc_id, lang,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(distinct_tokens AS DOUBLE) / n_tokens AS ttr,
       CAST(n_chars - (n_tokens - 1) AS DOUBLE) / n_tokens AS avg_tok_len,
       2.0::DOUBLE + 0.01::DOUBLE * n_tokens
           + 3.0::DOUBLE * (CAST(distinct_tokens AS DOUBLE) / n_tokens)
           - 0.5::DOUBLE * (CAST(n_chars - (n_tokens - 1) AS DOUBLE) / n_tokens)
         AS quality_score,
       (2.0::DOUBLE + 0.01::DOUBLE * n_tokens
            + 3.0::DOUBLE * (CAST(distinct_tokens AS DOUBLE) / n_tokens)
            - 0.5::DOUBLE * (CAST(n_chars - (n_tokens - 1) AS DOUBLE) / n_tokens))
         > 2.5 AS keep
FROM (
  SELECT doc_id, lang, n_chars,
         len(string_split(text, ' ')) AS n_tokens,
         len(list_distinct(string_split(text, ' '))) AS distinct_tokens
  FROM documents
) f
"""


@register("llm_quality_score_linear", oracle=_QSCORE_ORACLE)
def llm_quality_score_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear quality model: score = w·[n_tokens, type-token ratio,
    avg token length] + b, keep = score > τ. Pure narrow Catalyst
    map — at 100 TB this is scan-bound with zero shuffle; swapping in
    learned weights (or a Pandas-UDF model) changes only the
    expression, not the plan."""
    d = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.col("text"), " "))
    distinct_tokens = F.size(F.array_distinct(F.split(F.col("text"), " ")))
    f = d.select(
        "doc_id",
        "lang",
        "n_chars",
        n_tokens.alias("n_tokens"),
        distinct_tokens.alias("distinct_tokens"),
    )
    ttr = F.col("distinct_tokens").cast("double") / F.col("n_tokens")
    avg_tok_len = (
        (F.col("n_chars") - (F.col("n_tokens") - 1)).cast("double")
        / F.col("n_tokens")
    )
    score = (
        F.lit(2.0)
        + F.lit(0.01) * F.col("n_tokens")
        + F.lit(3.0) * ttr
        - F.lit(0.5) * avg_tok_len
    )
    return f.select(
        "doc_id",
        "lang",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        ttr.alias("ttr"),
        avg_tok_len.alias("avg_tok_len"),
        score.alias("quality_score"),
        (score > 2.5).alias("keep"),
    )


# --- llm_langid_confusion -------------------------------------------------

# In-engine evaluation of the language-ID heuristic: the full
# (actual, predicted) confusion matrix with per-cell counts and the
# cell's share of its actual-language row — the eval artifact that
# decides whether a classifier stage is shippable, computed over the
# whole corpus instead of a notebook sample (same philosophy as
# llm_ann_recall).

_CONFUSION_ORACLE = f"""
WITH pred AS (
  SELECT lang AS actual_lang, {tx.sql_lang_id("text")} AS pred_lang
  FROM documents
)
SELECT actual_lang, pred_lang,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(*) AS DOUBLE)
         / SUM(count(*)) OVER (PARTITION BY actual_lang) AS row_share
FROM pred GROUP BY actual_lang, pred_lang
"""


@register("llm_langid_confusion", oracle=_CONFUSION_ORACLE)
def llm_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the marker-dictionary language-ID against
    document labels: one narrow classify pass, one tiny-key
    aggregate, one window for row normalization."""
    d = load_table(spark, sf_dir, "documents")
    pred = d.select(
        F.col("lang").alias("actual_lang"), tx.lang_id("text").alias("pred_lang")
    )
    counts = pred.groupBy("actual_lang", "pred_lang").agg(F.count("*").alias("n"))
    w = Window.partitionBy("actual_lang")
    return counts.select(
        "actual_lang",
        "pred_lang",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(w)).alias("row_share"),
    )


# --- llm_importance_resample ----------------------------------------------

# Temperature-style importance resampling: each document is accepted
# with probability proportional to its quality weight, but the coin
# flip is a DETERMINISTIC hash of the doc id (Knuth multiplicative
# hash mod 1000 — plain int64 arithmetic both engines share), so the
# sample is reproducible run-to-run and machine-to-machine. This is
# how a curation pipeline upsamples high-quality sources without an
# RNG whose stream depends on partitioning.

_RESAMPLE_ORACLE = """
SELECT doc_id, source, weight_millis
FROM (
  SELECT doc_id, source,
         CAST(least(900, greatest(100, n_chars // 2)) AS BIGINT)
           AS weight_millis,
         (doc_id * 2654435761) % 1000 AS coin
  FROM documents
) d
WHERE coin < weight_millis
"""


@register("llm_importance_resample", oracle=_RESAMPLE_ORACLE)
def llm_importance_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic importance resampling by document quality: the
    acceptance weight rises with document length (clamped to
    [0.1, 0.9]), the coin is a multiplicative hash of doc_id on the
    exact integer grid. A narrow map + filter — no shuffle, no RNG,
    pushdown-friendly; at 100 TB the sample is one streaming pass."""
    d = load_table(spark, sf_dir, "documents")
    weight = F.least(
        F.lit(900), F.greatest(F.lit(100), F.expr("n_chars div 2"))
    ).cast("bigint")
    coin = (F.col("doc_id") * F.lit(2654435761)) % 1000
    return (
        d.select(
            "doc_id",
            "source",
            weight.alias("weight_millis"),
            coin.alias("coin"),
        )
        .where(F.col("coin") < F.col("weight_millis"))
        .drop("coin")
    )


# --- llm_train_val_split ---------------------------------------------------

# Deterministic train/val/test split: the bucket is a multiplicative
# hash of doc_id on the exact integer grid (both engines share int64
# arithmetic; the multiplier keeps doc_id * m far from overflow at any
# realistic corpus size), so the split is stable run-to-run,
# machine-to-machine, and partition-layout-independent — the property
# a training pipeline needs so val never leaks into train between
# re-runs. 80/10/10.

_SPLIT_ORACLE = """
SELECT split, lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM (
  SELECT lang, n_chars,
         CASE WHEN (doc_id * 1103515245 + 12345) % 1000 < 800 THEN 'train'
              WHEN (doc_id * 1103515245 + 12345) % 1000 < 900 THEN 'val'
              ELSE 'test' END AS split
  FROM documents
) d
GROUP BY split, lang
"""


@register("llm_train_val_split", oracle=_SPLIT_ORACLE)
def llm_train_val_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-deterministic 80/10/10 corpus split with per-(split, lang)
    size accounting. A narrow map plus one tiny-key aggregate: at
    100 TB this is a single streaming pass, and the assignment never
    depends on row order or partitioning."""
    d = load_table(spark, sf_dir, "documents")
    bucket = (F.col("doc_id") * F.lit(1103515245) + F.lit(12345)) % 1000
    split = (
        F.when(bucket < 800, F.lit("train"))
        .when(bucket < 900, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        d.select(split.alias("split"), "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


# --- llm_global_shuffle ----------------------------------------------------

# Training-order shuffle + sharding: every document gets a shard and a
# position within that shard, both derived from a doc-id hash rather
# than an RNG, so the "shuffled" order is reproducible and resumable
# (restarting a training job re-derives the same order). The small
# multiplier keeps the product inside int64 on both engines (DuckDB
# promotes overflow to HUGEINT, Spark wraps — avoid the divergence by
# never overflowing).

_SHUFFLE_ORACLE = """
SELECT doc_id, shard,
       CAST(ROW_NUMBER() OVER (
         PARTITION BY shard ORDER BY h, doc_id) AS BIGINT) AS pos
FROM (
  SELECT doc_id,
         (doc_id * 40503 + 7919) % 65536 AS h,
         ((doc_id * 40503 + 7919) % 65536) % 16 AS shard
  FROM documents
) d
"""


@register("llm_global_shuffle", oracle=_SHUFFLE_ORACLE)
def llm_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle into 16 training shards: shard =
    hash % 16, position = rank of the hash within the shard (doc_id
    tiebreak).

    The rank is computed TWO-LEVEL so no single task ever holds a
    whole shard (a plain Window over shard would): each shard splits
    into 16 range-aligned subshards (h div 4096 — contiguous in h, so
    subshard order IS hash order), the window ranks within
    (shard, subshard), and a broadcast cumulative-count table shifts
    each subshard by the rows in the subshards below it. At 100 TB
    the sort granule is shard/256th of the corpus and the offset
    table stays at shards x subshards rows — the distributed form of
    zipWithIndex without any global sort or driver pass."""
    d = load_table(spark, sf_dir, "documents")
    h = (F.col("doc_id") * F.lit(40503) + F.lit(7919)) % 65536
    base = d.select(
        "doc_id",
        h.alias("h"),
        (h % 16).alias("shard"),
        (h / 4096).cast("int").alias("subshard"),
    )
    # O(shards x subshards) offset table: rows in lower subshards of
    # the same shard. Tiny — broadcasts.
    counts = base.groupBy("shard", "subshard").agg(F.count("*").alias("n"))
    w_off = (
        Window.partitionBy("shard")
        .orderBy("subshard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = counts.select(
        "shard",
        "subshard",
        F.coalesce(F.sum("n").over(w_off), F.lit(0)).alias("offset"),
    )
    w = Window.partitionBy("shard", "subshard").orderBy("h", "doc_id")
    return (
        base.withColumn("r", F.row_number().over(w))
        .join(F.broadcast(offsets), ["shard", "subshard"])
        .select(
            "doc_id",
            "shard",
            (F.col("offset") + F.col("r")).cast("bigint").alias("pos"),
        )
    )


# --- llm_ngram_lm_score ----------------------------------------------------

# Count-based language-model scoring: train a bigram frequency table
# over the corpus in one aggregate, then score every document by the
# average corpus frequency of its bigrams. This is the integer-exact
# core of perplexity filtering (a real LM replaces "frequency" with a
# smoothed log-probability; the plan shape — train a model table,
# join it back to score — is identical), so the whole chain stays
# hash-checkable: int64 sums plus one IEEE division.

_LM_ORACLE = f"""
WITH {ng.sql_bigram_hashes_ctes()},
model AS (
  SELECT bigram, COUNT(*) AS freq FROM bg GROUP BY bigram
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(freq) AS BIGINT) AS total_freq,
       CAST(SUM(freq) AS DOUBLE) / COUNT(*) AS avg_freq
FROM bg JOIN model USING (bigram)
GROUP BY doc_id
"""


@register("llm_ngram_lm_score", oracle=_LM_ORACLE)
def llm_ngram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-frequency LM scoring: the shared hashed-bigram relation
    (``llm/ngrams.py`` — int64 keys) builds the training stream, a
    map-side-combined aggregate pre-combines to distinct (doc,
    bigram) pairs, and the model count attaches as an UNBOUNDED
    WINDOW SUM partitioned by bigram-hash instead of a
    model-aggregate + self-join (optimization r11): the join shape
    re-ran the whole scan+aggregate subtree for the model branch
    once the token relation stopped being persisted — the window
    computes the same corpus frequency over the SAME exchange's
    partitions, so the plan is one scan and three int64-keyed
    exchanges, no join, no cache. At 100 TB every shuffle carries
    distinct (doc,bigram) pairs — no broadcast assumption, no driver
    materialization. sf1 measured 37.7 s (string keys, r10) → ~5 s."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    ex = ng.doc_bigram_hashes(d)
    perdoc = ex.groupBy("doc_id", "bigram").agg(F.count("*").alias("c"))
    freq = F.sum("c").over(Window.partitionBy("bigram"))
    return (
        perdoc.withColumn("freq", freq)
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_bigrams"),
            F.sum(F.col("c") * F.col("freq")).alias("total_freq"),
            (
                F.sum(F.col("c") * F.col("freq")).cast("double") / F.sum("c")
            ).alias("avg_freq"),
        )
    )


# --- llm_line_dedup --------------------------------------------------------

# CCNet-style sub-document dedup: documents are cut into fixed
# 16-token chunks, each distinct chunk text is owned by its smallest
# doc_id, and every other occurrence is dropped; the per-document
# report shows how much text survives. (CCNet does this per line /
# paragraph; this corpus has no newlines, so the fixed token window
# stands in for the line boundary.)

_LINE_DEDUP_ORACLE = """
WITH c AS (
  SELECT doc_id, c AS chunk_idx,
         array_to_string(list_slice(toks, c * 16 + 1, c * 16 + 16), ' ')
           AS chunk
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) t,
       UNNEST(generate_series(0, CAST((len(toks) + 15) // 16 AS INT) - 1))
         AS u(c)
), owners AS (
  SELECT chunk, MIN(doc_id) AS owner FROM c GROUP BY chunk
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(SUM(CASE WHEN doc_id = owner THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept,
       CAST(SUM(CASE WHEN doc_id = owner THEN len(chunk) ELSE 0 END)
         AS BIGINT) AS kept_chars
FROM c JOIN owners USING (chunk)
GROUP BY doc_id
"""


@register("llm_line_dedup", oracle=_LINE_DEDUP_ORACLE)
def llm_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-granular dedup with survival accounting: explode 16-token
    chunks, claim each distinct chunk for its min-doc_id owner (one
    map-side-combined min aggregate keyed by chunk text), join the
    ownership back, and re-aggregate per document. Two shuffles, both
    on high-cardinality keys; chunk texts never collect anywhere. At
    100 TB swap the chunk string for its xxhash to shrink the shuffle
    to 8 bytes/chunk — kept as text here so the oracle can see it."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n_chunks = F.floor((F.size(toks) + 15) / 16).cast("int")
    # Guard zero-token docs: sequence(0, -1) descends to [0, -1] in
    # Spark (phantom chunks) where generate_series(0, -1) is empty.
    chunks = F.when(
        F.size(toks) >= 1,
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda c: F.array_join(F.slice(toks, c * 16 + 1, 16), " "),
        ),
    )
    c = d.select("doc_id", F.explode(chunks).alias("chunk"))
    # owner attaches as a window MIN over the chunk partition, not a
    # min-aggregate + join back onto c (optimization r11): the join
    # shape exchanged the chunk relation TWICE (aggregate build +
    # sort-merge probe); the window computes the same owner on one
    # chunk exchange. Identical rows: every c row survives either way.
    owner = F.min("doc_id").over(Window.partitionBy("chunk"))
    kept = F.col("doc_id") == F.col("owner")
    return (
        c.withColumn("owner", owner)
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(F.when(kept, 1).otherwise(0)).alias("n_kept"),
            F.sum(F.when(kept, F.length("chunk")).otherwise(0)).alias(
                "kept_chars"
            ),
        )
    )


# --- llm_domain_filter -----------------------------------------------------

# Source-level (domain-level) filtering: score every SOURCE by the
# mean lexical diversity of its documents, then keep only documents
# from sources clearing the bar — the web-crawl move of dropping whole
# domains (content farms) rather than individual pages. The mean is
# an exact-int ratio sum? No — it is a sum of per-doc IEEE ratios, so
# the aggregate is made order-independent by summing the two integer
# legs separately and dividing once.

_DOMAIN_ORACLE = """
WITH perdoc AS (
  SELECT source,
         len(list_distinct(string_split(text, ' '))) AS n_distinct,
         len(string_split(text, ' ')) AS n_tokens
  FROM documents
), persrc AS (
  SELECT source,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_distinct) AS DOUBLE) / SUM(n_tokens) AS src_diversity
  FROM perdoc GROUP BY source
)
SELECT source, n_docs, src_diversity
FROM persrc
WHERE src_diversity >= 0.31
"""


@register("llm_domain_filter", oracle=_DOMAIN_ORACLE)
def llm_domain_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-level quality gate: aggregate token-diversity per source
    (both legs as exact int64 sums, one division at the end), keep
    sources above the corpus-level bar. The aggregate is map-side
    combined on a low-cardinality key; the surviving-source list is
    dimension-sized, so the follow-on 'filter the corpus' step (shown
    by llm_doc_quality_filter-style composition) is a broadcast semi
    join, never a shuffle of the corpus."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    persrc = (
        d.select(
            "source",
            F.size(F.array_distinct(toks)).alias("n_distinct"),
            F.size(toks).alias("n_tokens"),
        )
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            (F.sum("n_distinct").cast("double") / F.sum("n_tokens")).alias(
                "src_diversity"
            ),
        )
    )
    return persrc.where(F.col("src_diversity") >= 0.31)


# --- llm_bm25_search ------------------------------------------------------
# BM25 keyword retrieval (the lexical-search baseline a RAG/data-
# curation stack runs next to ANN): k1=1.2, b=0.75, with the
# ln-free Robertson idf RATIO ((2N-2df+1)/(2df+1)) for the same
# reason as llm_tfidf_topterms — division is a correctly-rounded
# IEEE op, libm ln() is not. Each per-term partial score is floored
# to integer micros BEFORE the per-doc sum, so the aggregate is an
# exact BIGINT sum (order-independent) and the hash cannot drift.

_BM25_TERMS = ("table", "query", "spark")

_BM25_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), dl AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM tok GROUP BY doc_id
), stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(dl) AS BIGINT) AS total_tok
  FROM dl
), tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM tok WHERE term IN {_BM25_TERMS!r}
  GROUP BY doc_id, term
), dfreq AS (
  SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM tf GROUP BY term
), scored AS (
  SELECT tf.doc_id, tf.term,
         CAST(floor(
           ((CAST(2 * s.n_docs - 2 * dfreq.df + 1 AS DOUBLE)
             / CAST(2 * dfreq.df + 1 AS DOUBLE))
            * (CAST(tf.tf AS DOUBLE) * 2.2)
            / (CAST(tf.tf AS DOUBLE)
               + 1.2 * (0.25 + 0.75 * (CAST(dl.dl AS DOUBLE)
                                       / (CAST(s.total_tok AS DOUBLE)
                                          / CAST(s.n_docs AS DOUBLE))))))
           * 1000000.0) AS BIGINT) AS s_micro
  FROM tf
  JOIN dfreq USING (term)
  JOIN dl USING (doc_id), stats s
)
SELECT doc_id, score_micro, n_terms_hit FROM (
  SELECT doc_id,
         CAST(sum(s_micro) AS BIGINT) AS score_micro,
         CAST(count(*) AS BIGINT) AS n_terms_hit,
         row_number() OVER (
           ORDER BY CAST(sum(s_micro) AS BIGINT) DESC, doc_id) AS rn
  FROM scored GROUP BY doc_id
) WHERE rn <= 10
"""


@register("llm_bm25_search", oracle=_BM25_ORACLE)
def llm_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 for a fixed keyword query.

    Scale shape: the tf aggregation filters to the query's terms AT
    the explode (predicate on the generator output, so the shuffle
    carries query-term rows only — a handful per doc, not the
    corpus's token stream); dl is the familiar per-doc count; df,
    N, and total-token stats are term- or corpus-cardinality
    aggregates that broadcast; the final per-doc sum is one shuffle
    on matched docs only, then a global top-10 TakeOrdered. Scores:
    every float step is the identical correctly-rounded IEEE
    expression on both engines, floored to micros per term, summed
    as BIGINT — order-independent and hash-stable.
    """
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tx.tokens("text")).alias("term"))
    dl = tok.groupBy("doc_id").agg(F.count("*").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.sum("dl").alias("total_tok")
    )
    tf = (
        tok.where(F.col("term").isin(*_BM25_TERMS))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.expr(
                "CAST(floor("
                "((CAST(2 * n_docs - 2 * df + 1 AS DOUBLE)"
                "  / CAST(2 * df + 1 AS DOUBLE))"
                " * (CAST(tf AS DOUBLE) * 2.2)"
                " / (CAST(tf AS DOUBLE)"
                "    + 1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE)"
                "                            / (CAST(total_tok AS DOUBLE)"
                "                               / CAST(n_docs AS DOUBLE))))))"
                " * 1000000.0) AS BIGINT)"
            ).alias("s_micro"),
        )
    )
    agg = scored.groupBy("doc_id").agg(
        F.sum("s_micro").alias("score_micro"),
        F.count("*").alias("n_terms_hit"),
    )
    w = Window.orderBy(F.col("score_micro").desc(), F.col("doc_id"))
    return (
        agg.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 10)
        .select("doc_id", "score_micro", "n_terms_hit")
    )


# --- llm_leakage_report ----------------------------------------------------
# Cross-split contamination audit: after the deterministic 80/10/10
# split, how much of val/test is textually reachable from train via
# shared 16-token chunks? This is the report a data lead signs off on
# before a training run — decontamination (llm_decontaminate) REMOVES
# leakage against an external eval set; this MEASURES residual
# train→heldout leakage inside the corpus itself.

_LEAK_ORACLE = """
WITH d AS (
  SELECT doc_id,
         CASE WHEN (doc_id * 1103515245 + 12345) % 1000 < 800 THEN 'train'
              WHEN (doc_id * 1103515245 + 12345) % 1000 < 900 THEN 'val'
              ELSE 'test' END AS split,
         list_filter(string_split(text, ' '), x -> len(x) > 0) AS tk
  FROM documents WHERE text IS NOT NULL
),
c AS (
  SELECT doc_id, split,
         unnest(list_transform(
           range(0, CAST(ceil(len(tk) / 16.0) AS BIGINT)),
           i -> array_to_string(tk[i*16 + 1 : i*16 + 16], ' '))) AS chunk
  FROM d
),
train_chunks AS (SELECT DISTINCT chunk FROM c WHERE split = 'train'),
held AS (
  SELECT c.split, c.doc_id, c.chunk,
         c.chunk IN (SELECT chunk FROM train_chunks) AS leaked
  FROM c WHERE c.split <> 'train'
)
SELECT split,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(*) AS BIGINT) AS n_chunks,
       CAST(SUM(CASE WHEN leaked THEN 1 ELSE 0 END) AS BIGINT) AS n_chunks_leaked,
       CAST(COUNT(DISTINCT CASE WHEN leaked THEN doc_id END) AS BIGINT) AS n_docs_affected
FROM held GROUP BY split
"""


@register("llm_leakage_report", oracle=_LEAK_ORACLE)
def llm_leakage_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Residual train→val/test leakage by shared 16-token chunks.

    Scale shape: chunking is a per-doc sequence/slice expression (no
    Python); the train chunk set and the held-out chunk stream meet
    in ONE left-semi-style hash join keyed on the chunk (at 100 TB,
    on xxhash64(chunk) — 8-byte keys); the report is a tiny
    per-split aggregate. Nothing is ever all-pairs."""
    d = (
        load_table(spark, sf_dir, "documents")
        .where(F.col("text").isNotNull())
        .select(
            "doc_id",
            F.filter(F.split("text", " "), lambda x: F.length(x) > 0).alias("tk"),
        )
    )
    bucket = (F.col("doc_id") * F.lit(1103515245) + F.lit(12345)) % 1000
    split = (
        F.when(bucket < 800, F.lit("train"))
        .when(bucket < 900, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    n_chunks = F.ceil(F.size("tk") / 16.0).cast("long")
    # Guard zero-token docs: sequence(0, -1) descends to [0, -1] in
    # Spark (phantom empty chunks) where generate_series is empty.
    chunks = F.when(
        F.size("tk") >= 1,
        F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.array_join(F.slice(F.col("tk"), i * 16 + 1, 16), " "),
        ),
    )
    c = d.select(
        "doc_id", split.alias("split"), F.explode(chunks).alias("chunk")
    )
    train_chunks = c.where(F.col("split") == "train").select("chunk").distinct()
    held = c.where(F.col("split") != "train")
    leaked = held.join(
        train_chunks.withColumn("__leak", F.lit(True)), "chunk", "left"
    ).select(
        "split", "doc_id", F.coalesce(F.col("__leak"), F.lit(False)).alias("leaked")
    )
    return leaked.groupBy("split").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count("*").alias("n_chunks"),
        F.sum(F.when(F.col("leaked"), 1).otherwise(0)).alias("n_chunks_leaked"),
        F.countDistinct(F.when(F.col("leaked"), F.col("doc_id"))).alias(
            "n_docs_affected"
        ),
    )


# --- llm_mad_outlier_filter -------------------------------------------------
# Robust document-length cleaning: median + MAD instead of mean + σ
# (one 10M-char page shifts a mean; it cannot shift a median). Both
# medians run on exact integer n_chars, so parity holds (agg_median
# proves the engines' medians agree on int64 input); the survivor
# band is pure integer comparison.

_MAD_K = 1  # tight demo band: median ± 1·MAD (production uses 3-5)

_MAD_ORACLE = f"""
WITH m AS (SELECT median(n_chars) AS med FROM documents),
d AS (
  SELECT doc_id, lang, n_chars,
         CAST(FLOOR(abs(n_chars - (SELECT med FROM m))) AS BIGINT) AS dev
  FROM documents
),
s AS (SELECT median(dev) AS mad FROM d)
SELECT doc_id, lang, n_chars
FROM d, s
WHERE dev <= {_MAD_K} * GREATEST(s.mad, 1)
"""


@register("llm_mad_outlier_filter", oracle=_MAD_ORACLE)
def llm_mad_outlier_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docs within median ± 1·MAD of character length (tight band so
    the filter demonstrably removes the length tails; production
    pipelines run 3-5·MAD).

    Scale shape: two scalar aggregates (median, then MAD of the
    deviations) broadcast as one-row joins around a single corpus
    scan each — never a global sort of the corpus. Exact medians
    need the sorted column; the 100 TB substitute is the mergeable
    KLL/histogram sketch (``agg_sketch_quantile``) feeding the same
    band filter."""
    d = load_table(spark, sf_dir, "documents")
    med = d.agg(F.median("n_chars").alias("med"))
    dev = d.crossJoin(F.broadcast(med)).select(
        "doc_id",
        "lang",
        "n_chars",
        # Explicit floor on BOTH sides: an even doc count makes the
        # median fractional and every deviation ends in .5 — DuckDB's
        # CAST(x AS BIGINT) rounds-to-nearest there while Spark's
        # cast('long') truncates. floor == truncate for the
        # non-negative dev, so floor-then-cast agrees everywhere.
        F.floor(F.abs(F.col("n_chars") - F.col("med"))).cast("long").alias("dev"),
    )
    mad = dev.agg(F.median("dev").alias("mad"))
    return (
        dev.crossJoin(F.broadcast(mad))
        .where(F.col("dev") <= _MAD_K * F.greatest(F.col("mad"), F.lit(1)))
        .select("doc_id", "lang", "n_chars")
    )


# --- llm_gopher_rules ------------------------------------------------------
#
# The Gopher repetition-free quality rules (Rae et al. 2021, "Scaling
# Language Models: ... Gopher", §A1.1 — public paper): word-count
# bounds, mean-word-length band, minimum fraction of words containing
# an alphabetic character, and a stopword-presence floor. The
# canonical pretraining heuristic filter battery; every rule is a
# per-doc expression over one split of the text, so the whole battery
# is a single narrow projection — no shuffle, no UDF, fully
# whole-stage-codegen at any corpus size.

_STOPWORDS = ("the", "and", "of", "to", "a", "in")

_GOPHER_ORACLE = f"""
WITH w AS (
  SELECT doc_id,
         list_filter(string_split(COALESCE(text, ''), ' '),
                     x -> len(x) > 0) AS t
  FROM documents
),
m AS (
  SELECT doc_id,
         len(t) AS n_words,
         CAST(list_sum(list_transform(t, x -> len(x))) AS DOUBLE)
           / len(t) AS mean_word_len,
         CAST(len(list_filter(t, x -> regexp_matches(x, '[a-zA-Z]')))
              AS DOUBLE) / len(t) AS frac_alpha,
         len(list_filter({list(_STOPWORDS)},
                         s -> list_contains(t, s))) AS n_stop
  FROM w
  WHERE len(t) > 0
)
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       mean_word_len,
       frac_alpha,
       CAST(n_stop AS BIGINT) AS n_stopwords,
       (n_words BETWEEN 50 AND 100000
        AND mean_word_len BETWEEN 3 AND 10
        AND frac_alpha >= 0.8
        AND n_stop >= 2) AS keep
FROM m
"""


@register("llm_gopher_rules", oracle=_GOPHER_ORACLE)
def llm_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher rule battery per doc: word count in [50, 100k], mean
    word length in [3, 10], >= 80% of words contain a letter, >= 2
    distinct stopwords present. Emits the metrics plus the combined
    ``keep`` verdict so downstream can both filter and audit."""
    d = load_table(spark, sf_dir, "documents")
    t = F.filter(
        F.split(F.coalesce(F.col("text"), F.lit("")), " "),
        lambda x: F.length(x) > 0,
    )
    base = d.select("doc_id", t.alias("t")).where(F.size("t") > 0)
    n_words = F.size("t")
    sum_len = F.aggregate(
        "t", F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    n_alpha = F.size(F.filter("t", lambda x: x.rlike("[a-zA-Z]")))
    n_stop = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in _STOPWORDS]),
            lambda s: F.array_contains("t", s),
        )
    )
    m = base.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        (sum_len.cast("double") / n_words).alias("mean_word_len"),
        (n_alpha.cast("double") / n_words).alias("frac_alpha"),
        n_stop.cast("long").alias("n_stopwords"),
    )
    keep = (
        F.col("n_words").between(50, 100000)
        & F.col("mean_word_len").between(3.0, 10.0)
        & (F.col("frac_alpha") >= 0.8)
        & (F.col("n_stopwords") >= 2)
    )
    return m.select("*", keep.alias("keep"))


# --- llm_dataset_card -------------------------------------------------------
#
# The per-source "dataset card" report a curation run publishes: doc
# and language counts, exact token totals and medians (integer token
# counts — F.median on int64 matches DuckDB's median including the
# even-n midpoint), exact-dup and null rates as single guarded
# divisions. ONE corpus scan, one map-side-combined shuffle on
# source; the distinct-text dup count rides the same aggregate as
# approx-free count(DISTINCT text) per group (Spark plans it as a
# two-phase expand — still keyed by source, never global).

_DATASET_CARD_ORACLE = """
WITH t AS (
  SELECT source, lang, text,
         CASE WHEN text IS NOT NULL THEN
           len(list_filter(string_split(text, ' '), x -> len(x) > 0))
         END AS n_tok
  FROM documents
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
       CAST(median(n_tok) AS DOUBLE) AS median_tokens,
       CASE WHEN COUNT(text) > 0 THEN
         1.0 - CAST(COUNT(DISTINCT text) AS DOUBLE) / COUNT(text)
       END AS dup_rate,
       CAST(COUNT(*) - COUNT(text) AS DOUBLE) / COUNT(*) AS null_rate
FROM t GROUP BY source
"""


@register("llm_dataset_card", oracle=_DATASET_CARD_ORACLE)
def llm_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dataset card: counts, exact token stats, dup/null
    rates — one scan, one source-keyed aggregate."""
    d = load_table(spark, sf_dir, "documents")
    n_tok = F.when(
        F.col("text").isNotNull(),
        F.size(F.filter(F.split("text", " "), lambda x: F.length(x) > 0)),
    ).cast("long")
    t = d.select("source", "lang", "text", n_tok.alias("n_tok"))
    n_text = F.count("text")
    return t.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("lang").alias("n_langs"),
        F.sum("n_tok").alias("total_tokens"),
        F.median("n_tok").cast("double").alias("median_tokens"),
        F.when(
            n_text > 0,
            F.lit(1.0)
            - F.count_distinct("text").cast("double") / n_text,
        ).alias("dup_rate"),
        (
            (F.count(F.lit(1)) - n_text).cast("double") / F.count(F.lit(1))
        ).alias("null_rate"),
    )


# --- llm_ngram_novelty ------------------------------------------------------
# First-occurrence n-gram novelty: for each document, the fraction of
# its DISTINCT bigrams whose first corpus occurrence (minimum doc_id)
# is this document — the freshness signal curation pipelines use to
# rank late-crawled pages against the existing corpus (a cheap,
# exact complement to near-dup flags: a doc can be 0% novel without
# being a near-dup of any single doc). Docs with fewer than two
# tokens have no bigrams and are absent on both sides; NULL text is
# filtered identically on both sides.
#
# Scale shape: ONE scan -> explode -> distinct (doc_id, bigram) ->
# first_doc as a bigram-partitioned window MIN (no self-join: the
# agg+join-back formulation re-reads the corpus twice, visible as a
# doubled Scan/Generate subtree in the formatted plan) -> per-doc
# count aggregate. Three key-partitioned shuffles, nothing all-pairs;
# the single division per doc is the only float.
#
# Shuffle key (r11, VERDICT r10 ask #4): the three shuffles carry an
# int64 bigram hash, not the ~40-byte bigram string — the shared
# hashed-bigram relation (llm/ngrams.py: vocabulary-level polynomial
# signing, injective h1*P + h2 pair combine, engine-identical SQL
# twin) feeds this key, llm_repetition_filter and llm_ngram_lm_score.

_NOVELTY_ORACLE = f"""
WITH {ng.sql_bigram_hashes_ctes()},
bgd AS (SELECT DISTINCT doc_id, bigram FROM bg),
firsts AS (
  SELECT bigram, MIN(doc_id) AS first_doc FROM bgd GROUP BY bigram
)
SELECT CAST(bgd.doc_id AS BIGINT) AS doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(CASE WHEN f.first_doc = bgd.doc_id THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel,
       CAST(SUM(CASE WHEN f.first_doc = bgd.doc_id THEN 1 ELSE 0 END)
            AS DOUBLE) / COUNT(*) AS novelty
FROM bgd JOIN firsts f USING (bigram)
GROUP BY bgd.doc_id
"""


@register("llm_ngram_novelty", oracle=_NOVELTY_ORACLE)
def llm_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc fraction of distinct bigrams first seen in that doc.

    Bigram keys come from the shared hashed-bigram relation
    (``llm/ngrams.py::doc_bigram_hashes`` — map-side int64 pair
    chains; sf1 measured 28.0 s with string keys in r10 → ~5 s).
    The (doc, bigram) DISTINCT is per-document by construction, so
    it runs as ``array_distinct`` inside the map (optimization r11):
    the plan's first exchange is the bigram-partitioned window, not
    a corpus-wide distinct aggregate — one exchange fewer."""
    d = load_table(spark, sf_dir, "documents")
    bg = ng.doc_bigram_hashes(d, unique_within_doc=True)
    firsts = bg.withColumn(
        "first_doc", F.min("doc_id").over(Window.partitionBy("bigram"))
    )
    novel = F.sum(
        (F.col("first_doc") == F.col("doc_id")).cast("long")
    )
    return (
        firsts.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            novel.alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "n_novel",
            (
                F.col("n_novel").cast("double") / F.col("n_bigrams")
            ).alias("novelty"),
        )
    )


# --- llm_tokenizer_fertility ------------------------------------------------
# Tokenizer fertility (bytes per token) per (source, lang) stratum —
# the standard health metric for tokenizer/corpus fit (a stratum
# whose fertility spikes is either non-linguistic content or a
# tokenizer mismatch). Whitespace tokens stand in for the trained
# tokenizer exactly as in llm_text_stats; both legs of the ratio are
# exact int64 sums, divided once.
#
# Scale shape: one scan → one map-side-combined aggregate keyed on
# the (source, lang) grid (bounded: sources × langs rows). No joins,
# no windows, nothing corpus-sized leaves the scan stage.

_FERTILITY_ORACLE = """
SELECT source, lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes,
       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
       CAST(SUM(octet_length(encode(text))) AS DOUBLE)
         / SUM(len(string_split(text, ' '))) AS bytes_per_token
FROM documents
WHERE text IS NOT NULL
GROUP BY source, lang
"""


@register("llm_tokenizer_fertility", oracle=_FERTILITY_ORACLE)
def llm_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bytes-per-token fertility per (source, lang) stratum."""
    d = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    t = d.select(
        "source",
        "lang",
        F.octet_length("text").cast("long").alias("nb"),
        F.size(F.split("text", " ")).cast("long").alias("nt"),
    )
    return t.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("nb").alias("total_bytes"),
        F.sum("nt").alias("total_tokens"),
        (F.sum("nb").cast("double") / F.sum("nt")).alias("bytes_per_token"),
    )


# --- llm_zipf_head_coverage ---------------------------------------------
# Zipf head coverage: how much of the corpus' bigram mass the top-K
# most frequent bigrams carry — the curation signal for boilerplate
# saturation (a natural corpus follows a Zipf curve; a template-heavy
# crawl front-loads it). Keys ride the shared hashed-bigram relation
# (llm/ngrams.py), so the count table is vocabulary-sized with int64
# keys and the top-K is a bounded-K TakeOrdered, never a global sort.
# cum_share is exact-int cumulative sums divided by the exact total —
# one IEEE division per output row.

_ZIPF_K = 100

_ZIPF_ORACLE = f"""
WITH {ng.sql_bigram_hashes_ctes()},
counts AS (
  SELECT bigram, CAST(COUNT(*) AS BIGINT) AS c FROM bg GROUP BY bigram
),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS total FROM counts),
top AS (
  SELECT bigram, c,
         CAST(row_number() OVER (ORDER BY c DESC, bigram) AS BIGINT) AS rank
  FROM counts
  QUALIFY rank <= {_ZIPF_K}
)
SELECT rank, bigram, c,
       CAST(SUM(c) OVER (ORDER BY rank ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS cum_c,
       CAST(SUM(c) OVER (ORDER BY rank ROWS UNBOUNDED PRECEDING) AS DOUBLE)
         / total AS cum_share
FROM top, tot
"""


@register("llm_zipf_head_coverage", oracle=_ZIPF_ORACLE)
def llm_zipf_head_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative corpus-mass share of the top-K bigrams."""
    d = load_table(spark, sf_dir, "documents")
    counts = (
        ng.doc_bigram_hashes(d).groupBy("bigram").agg(F.count("*").alias("c"))
    )
    tot = counts.agg(F.sum("c").alias("total"))  # 1 row
    top = counts.orderBy(F.col("c").desc(), "bigram").limit(_ZIPF_K)
    # rank/cumsum windows run over the bounded K-row relation only —
    # the single-partition window is K-sized by construction, never
    # vocabulary- or corpus-sized.
    wrank = Window.orderBy(F.col("c").desc(), "bigram")
    wcum = wrank.rowsBetween(Window.unboundedPreceding, 0)
    return (
        top.crossJoin(F.broadcast(tot))  # broadcast-bounded 1-row scalar
        .select(
            F.row_number().over(wrank).cast("long").alias("rank"),
            "bigram",
            "c",
            F.sum("c").over(wcum).alias("cum_c"),
            (F.sum("c").over(wcum).cast("double") / F.col("total")).alias(
                "cum_share"
            ),
        )
    )


# --- llm_source_token_shift -------------------------------------------------
# Distribution shift per source: L1 distance between the source's
# unigram distribution and the corpus unigram distribution — the
# data-mixing diagnostic for "which source is lexically unlike the
# rest" (feeds sampling-weight decisions). Exact arithmetic: for the
# source's own vocabulary the per-term |n_st*N - n_t*N_s| numerators
# are exact int64 (products < 2^63 up to ~sf100 corpus sizes; the
# docstringed limit), summed in DECIMAL(38,0) so the total cannot
# overflow, converted to DOUBLE once; tokens absent from the source
# contribute (N - Σ_{t∈vocab_s} n_t) / N in closed form — no
# per-term float sums anywhere, so the result is
# accumulation-order-independent and engine-identical.
#
# Scale shape: occurrence explode → (source, token)-keyed aggregate
# (map-side combined) → vocabulary-keyed join of the per-token corpus
# counts → source-keyed final aggregate. The per-source and corpus
# totals are #sources-row / 1-row broadcasts. Unigram keys stay
# strings here: they are ~7 bytes and the count table is
# vocabulary-sized, so the bigram-hash trick buys nothing.

_TOKEN_SHIFT_ORACLE = """
WITH t AS (
  SELECT source, unnest(string_split(text, ' ')) AS tok
  FROM documents WHERE text IS NOT NULL
),
nst AS (
  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS n_st
  FROM t GROUP BY source, tok
),
nt AS (SELECT tok, CAST(SUM(n_st) AS BIGINT) AS n_t FROM nst GROUP BY tok),
ns AS (SELECT source, CAST(SUM(n_st) AS BIGINT) AS n_s FROM nst GROUP BY source),
ntot AS (SELECT CAST(SUM(n_st) AS BIGINT) AS n_tot FROM nst),
per AS (
  SELECT nst.source, ns.n_s, ntot.n_tot,
         SUM(CAST(abs(nst.n_st * ntot.n_tot - nt.n_t * ns.n_s)
                  AS DECIMAL(38,0))) AS sd,
         CAST(SUM(nt.n_t) AS BIGINT) AS cov,
         CAST(COUNT(*) AS BIGINT) AS vocab
  FROM nst
  JOIN nt USING (tok)
  JOIN ns USING (source)
  CROSS JOIN ntot
  GROUP BY nst.source, ns.n_s, ntot.n_tot
)
SELECT source,
       n_s AS n_tokens,
       vocab,
       CAST(sd AS DOUBLE) / CAST(n_s * n_tot AS DOUBLE)
         + CAST(n_tot - cov AS DOUBLE) / CAST(n_tot AS DOUBLE) AS l1_shift
FROM per
"""


@register("llm_source_token_shift", oracle=_TOKEN_SHIFT_ORACLE)
def llm_source_token_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source L1 unigram-distribution distance from the corpus."""
    d = load_table(spark, sf_dir, "documents").where(F.col("text").isNotNull())
    t = d.select("source", F.explode(F.split("text", " ")).alias("tok"))
    nst = t.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("n_st"))
    nt = nst.groupBy("tok").agg(F.sum("n_st").alias("n_t"))
    ns = nst.groupBy("source").agg(F.sum("n_st").alias("n_s"))
    ntot = nst.agg(F.sum("n_st").alias("n_tot"))  # 1 row
    j = (
        nst.join(nt, "tok")
        .join(F.broadcast(ns), "source")
        .crossJoin(F.broadcast(ntot))  # broadcast-bounded 1-row scalar
    )
    term = F.abs(
        F.col("n_st") * F.col("n_tot") - F.col("n_t") * F.col("n_s")
    )
    per = j.groupBy("source", "n_s", "n_tot").agg(
        F.sum(term.cast("decimal(38,0)")).alias("sd"),
        F.sum("n_t").alias("cov"),
        F.count(F.lit(1)).alias("vocab"),
    )
    return per.select(
        "source",
        F.col("n_s").alias("n_tokens"),
        "vocab",
        (
            F.col("sd").cast("double")
            / (F.col("n_s") * F.col("n_tot")).cast("double")
            + (F.col("n_tot") - F.col("cov")).cast("double")
            / F.col("n_tot").cast("double")
        ).alias("l1_shift"),
    )


# --- llm_decontaminate_bloom ------------------------------------------------
# Bloom-filter decontamination: the constant-memory scale path for
# the same benchmark-containment question llm_decontaminate answers
# with an exact gram join. The benchmark's word-trigram hashes set
# k=2 positions each in an m-bit array; a corpus shingle is flagged
# when BOTH its positions are set. The filter is m rows at most —
# INDEPENDENT of corpus size — so at 100 TB the probe is a broadcast
# of a few KB against a narrow map, where the exact join must ship
# (or at least broadcast) the full benchmark gram set. The price is
# false positives, and the key measures them honestly: it runs the
# exact containment check alongside and reports per-source
# bloom-vs-exact shingle and document counts (bloom ⊇ exact always —
# no false negatives by construction). m is fixed small here so the
# FP mechanism is actually exercised at fixture scale; production
# sizes m ≈ 10× the benchmark gram count (the plan shape is
# unchanged). All arithmetic is int64 mod-prime (shared
# llm/minhash.py polynomial; trigram combine stays < 2^63), so the
# DuckDB oracle is value-exact.

_BLOOM_M = 4096      # bits in the filter (kept small: see above)
_BLOOM_A2 = 131      # second position: ((t*131 + 7) % P) % m
_BLOOM_B2 = 7


def _bloom_trigram_sql() -> str:
    from delta_lake_play_spark.llm import minhash as mh

    comb = (
        f"((h[CAST(i AS INT)] * 31 + h[CAST(i + 1 AS INT)]) % {mh.P} * 37"
        f" + h[CAST(i + 2 AS INT)]) % {mh.P}"
    )
    return (
        f"list_distinct(list_transform("
        f"range(1, greatest(len(h) - 2, 0) + 1), i -> {comb}))"
    )


def _bloom_oracle() -> str:
    from delta_lake_play_spark.llm import minhash as mh

    hashes = mh.sql_token_hashes(
        "list_filter(string_split(text, ' '), x -> len(x) > 0)"
    )
    m, a2, b2, p = _BLOOM_M, _BLOOM_A2, _BLOOM_B2, mh.P
    return f"""
WITH hs AS (
  SELECT doc_id, source, {hashes} AS h
  FROM documents WHERE text IS NOT NULL
),
tg AS (SELECT doc_id, source, {_bloom_trigram_sql()} AS tgs FROM hs),
ev AS (SELECT DISTINCT unnest(tgs) AS t FROM tg WHERE doc_id % {_DECON_STRIDE} = 0),
bits AS (
  SELECT DISTINCT pos FROM (
    SELECT t % {m} AS pos FROM ev
    UNION ALL
    SELECT ((t * {a2} + {b2}) % {p}) % {m} AS pos FROM ev
  )
),
pr AS (
  SELECT doc_id, source, unnest(tgs) AS t
  FROM tg WHERE doc_id % {_DECON_STRIDE} <> 0
),
fl AS (
  SELECT doc_id, source,
         CAST(t % {m} IN (SELECT pos FROM bits)
              AND ((t * {a2} + {b2}) % {p}) % {m} IN (SELECT pos FROM bits)
              AS INT) AS bloom_hit,
         CAST(t IN (SELECT t FROM ev) AS INT) AS exact_hit
  FROM pr
),
pd AS (
  SELECT source, doc_id,
         CAST(count(*) AS BIGINT) AS n_sh,
         CAST(SUM(bloom_hit) AS BIGINT) AS bh,
         CAST(SUM(exact_hit) AS BIGINT) AS eh
  FROM fl GROUP BY source, doc_id
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_sh) AS BIGINT) AS n_shingles,
       CAST(SUM(bh) AS BIGINT) AS bloom_hit_shingles,
       CAST(SUM(eh) AS BIGINT) AS exact_hit_shingles,
       CAST(SUM(bh) - SUM(eh) AS BIGINT) AS false_positive_shingles,
       CAST(SUM(CASE WHEN bh > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS bloom_flagged_docs,
       CAST(SUM(CASE WHEN eh > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS exact_flagged_docs
FROM pd GROUP BY source
"""


@register("llm_decontaminate_bloom", oracle=_bloom_oracle())
def llm_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter benchmark decontamination with measured false
    positives against the exact containment join (see the comment
    above the oracle builder for the scale argument)."""
    from delta_lake_play_spark.llm import minhash as mh

    from delta_lake_play_spark.functions.fanout import fan_out

    m, a2, b2, p = _BLOOM_M, _BLOOM_A2, _BLOOM_B2, mh.P
    d = load_table(spark, sf_dir, "documents")
    # Trigram chains built MAP-SIDE (optimization r11): per-doc
    # token→hash lookup map (mh.char_hash_map — own projection, must
    # not inline) + zip_with over three slices replaces the token
    # posexplode → distinct-vocabulary broadcast join → two window
    # leads, whose exchange + sort preceded every downstream stage.
    # array_distinct makes per-doc trigrams unique by construction
    # (doc_id is unique, source is constant per doc), replacing the
    # corpus-wide 3-column distinct.
    base = fan_out(
        d.where(F.col("text").isNotNull()).select("doc_id", "source", "text"),
        "doc_id",
    )
    toks = base.select(
        "doc_id",
        "source",
        F.filter(F.split("text", " "), lambda x: F.length(x) > 0).alias("tks"),
        mh.char_hash_map(F.col("text")).alias("__m"),
    )
    hs = toks.select(
        "doc_id",
        "source",
        F.transform(
            F.col("tks"), lambda t: F.element_at(F.col("__m"), t)
        ).alias("h"),
    )
    n_t = F.greatest(F.size("h") - 2, F.lit(0))
    tri_arr = F.zip_with(
        F.zip_with(
            F.slice("h", 1, n_t),
            F.slice(F.col("h"), 2, n_t),
            lambda a, b: (a * 31 + b) % F.lit(p),
        ),
        F.slice(F.col("h"), 3, n_t),
        lambda ab, c: (ab * 37 + c) % F.lit(p),
    )
    # Persisted: tg feeds the benchmark branch (ev → bits/evf) AND the
    # corpus probe — same contract as llm/ngrams.py (CacheManager
    # dedups by logical plan; bench.py clears caches between keys).
    tg = (
        hs.select(
            "doc_id",
            "source",
            F.explode(F.array_distinct(tri_arr)).alias("t"),
        )
        .persist()
    )
    ev = tg.where(F.col("doc_id") % _DECON_STRIDE == 0).select("t").distinct()
    bits = F.broadcast(
        ev.select(
            F.explode(
                F.array(F.col("t") % m, ((F.col("t") * a2 + b2) % p) % m)
            ).alias("pos")
        ).distinct()
    )
    pr = tg.where(F.col("doc_id") % _DECON_STRIDE != 0)
    b1 = bits.select(F.col("pos").alias("pos1"), F.lit(1).alias("hit1"))
    b2_rel = bits.select(F.col("pos").alias("pos2"), F.lit(1).alias("hit2"))
    evf = F.broadcast(ev.select(F.col("t").alias("ev_t"), F.lit(1).alias("ex")))
    fl = (
        pr.withColumn("pos1", F.col("t") % m)
        .withColumn("pos2", ((F.col("t") * a2 + b2) % p) % m)
        .join(b1, "pos1", "left")
        .join(b2_rel, "pos2", "left")
        .join(evf, F.col("t") == F.col("ev_t"), "left")
        .select(
            "doc_id",
            "source",
            (F.col("hit1").isNotNull() & F.col("hit2").isNotNull())
            .cast("int")
            .alias("bloom_hit"),
            F.col("ex").isNotNull().cast("int").alias("exact_hit"),
        )
    )
    pd_ = fl.groupBy("source", "doc_id").agg(
        F.count(F.lit(1)).alias("n_sh"),
        F.sum("bloom_hit").alias("bh"),
        F.sum("exact_hit").alias("eh"),
    )
    return pd_.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_sh").alias("n_shingles"),
        F.sum("bh").alias("bloom_hit_shingles"),
        F.sum("eh").alias("exact_hit_shingles"),
        (F.sum("bh") - F.sum("eh")).alias("false_positive_shingles"),
        F.sum((F.col("bh") > 0).cast("long")).alias("bloom_flagged_docs"),
        F.sum((F.col("eh") > 0).cast("long")).alias("exact_flagged_docs"),
    )


# --- llm_collocation_lift ---------------------------------------------------
#
# Collocation mining for tokenizer/phrase-vocabulary prep: rank
# consecutive token pairs by LIFT = P(ab) / (P(a)·P(b)) — computed as
# the exact integer ratio n_ab·T / (n_a·n_b), the monotone equivalent
# of PMI without the cross-engine ln() hazard (see the tf-idf note at
# the top of this file). Counting keys on the injective int64 pair
# hash (llm/ngrams.py design: vocabulary-level signing, h1·P + h2),
# so the aggregate shuffles fixed-width ints; the human-readable
# token strings are joined back ONLY for the top-K rows (the K-row
# side is broadcast against the vocabulary — at 100 TB the vocabulary
# outgrows an executor, the top-K never does). The top-K boundary is
# a total order (support, lift, then the two hashes), so the cut is
# deterministic in both engines.

_COLL_TOPK = 30
_COLL_MIN_SUPPORT = 3


def _collocation_oracle() -> str:
    from delta_lake_play_spark.llm import minhash as mh

    hashes = mh.sql_token_hashes(
        "list_filter(string_split(text, ' '), x -> len(x) > 0)"
    )
    return f"""
WITH hs AS (
  SELECT doc_id, {hashes} AS h,
         list_filter(string_split(text, ' '), x -> len(x) > 0) AS tks
  FROM documents WHERE text IS NOT NULL
),
uni AS (
  SELECT unnest(h) AS hu FROM hs
),
uc AS (SELECT hu, CAST(COUNT(*) AS BIGINT) AS n FROM uni GROUP BY hu),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM uni),
tr AS (
  SELECT h[CAST(i AS INT)] AS h1, h[CAST(i + 1 AS INT)] AS h2
  FROM hs, UNNEST(range(1, greatest(len(h) - 1, 0) + 1)) AS u(i)
),
bc AS (
  SELECT h1, h2, CAST(COUNT(*) AS BIGINT) AS n_ab
  FROM tr GROUP BY h1, h2 HAVING COUNT(*) >= {_COLL_MIN_SUPPORT}
),
vocab AS (
  SELECT tk, {mh.sql_char_hash('tk')} AS hv
  FROM (SELECT DISTINCT unnest(tks) AS tk FROM hs)
),
top AS (
  SELECT bc.h1, bc.h2, bc.n_ab, a.n AS n_a, b.n AS n_b,
         CAST(bc.n_ab AS DOUBLE) * CAST(tot.t AS DOUBLE)
           / (CAST(a.n AS DOUBLE) * CAST(b.n AS DOUBLE)) AS lift
  FROM bc JOIN uc a ON bc.h1 = a.hu JOIN uc b ON bc.h2 = b.hu, tot
  ORDER BY bc.n_ab DESC, lift DESC, bc.h1, bc.h2
  LIMIT {_COLL_TOPK}
)
SELECT va.tk || ' ' || vb.tk AS bigram, top.n_ab, top.n_a, top.n_b, top.lift
FROM top JOIN vocab va ON top.h1 = va.hv JOIN vocab vb ON top.h2 = vb.hv
"""


@register("llm_collocation_lift", oracle=_collocation_oracle())
def llm_collocation_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-30 collocations by exact integer lift over int64 pair
    hashes; token strings joined back for the K-row result only."""
    from delta_lake_play_spark.llm import minhash as mh

    d = load_table(spark, sf_dir, "documents")
    tok = (
        d.where(F.col("text").isNotNull())
        .select(
            "doc_id",
            F.posexplode(F.split("text", " ")).alias("pos", "tk"),
        )
        .where(F.length("tk") > 0)
        .persist()  # feeds vocabulary, unigram counts, and transitions
    )
    vocab = F.broadcast(
        tok.select("tk").distinct().select("tk", mh.char_hash(F.col("tk")).alias("hv"))
    )
    th = tok.join(vocab, "tk").select("doc_id", "pos", F.col("hv").alias("h"))
    uc = th.groupBy(F.col("h").alias("hu")).agg(F.count(F.lit(1)).alias("n"))
    tot = th.agg(F.count(F.lit(1)).alias("t"))
    wseq = Window.partitionBy("doc_id").orderBy("pos")
    tr = th.select(
        F.col("h").alias("h1"), F.lead("h", 1).over(wseq).alias("h2")
    ).where(F.col("h2").isNotNull())
    bc = (
        tr.groupBy("h1", "h2")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= _COLL_MIN_SUPPORT)
    )
    top = (
        bc.join(uc.select(F.col("hu").alias("h1"), F.col("n").alias("n_a")), "h1")
        .join(uc.select(F.col("hu").alias("h2"), F.col("n").alias("n_b")), "h2")
        .crossJoin(F.broadcast(tot))  # broadcast-bounded 1-row scalar
        .select(
            "h1",
            "h2",
            "n_ab",
            "n_a",
            "n_b",
            (
                F.col("n_ab").cast("double") * F.col("t").cast("double")
                / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
            ).alias("lift"),
        )
        .orderBy(F.col("n_ab").desc(), F.col("lift").desc(), "h1", "h2")
        .limit(_COLL_TOPK)
    )
    va = vocab.select(F.col("tk").alias("tk_a"), F.col("hv").alias("h1"))
    vb = vocab.select(F.col("tk").alias("tk_b"), F.col("hv").alias("h2"))
    # the K-row side broadcasts; the vocabulary streams
    return (
        va.join(F.broadcast(top), "h1")
        .join(vb, "h2")
        .select(
            F.concat_ws(" ", "tk_a", "tk_b").alias("bigram"),
            "n_ab",
            "n_a",
            "n_b",
            "lift",
        )
    )
