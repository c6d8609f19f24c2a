"""UDF / UDAF / UDTF surface (SURVEY.md §2.11).

The reference defines no UDFs; policy here is built-ins first (all of
§2.9 is pure Catalyst). These entries demonstrate the escape hatches
for when Spark lacks a primitive, in preference order: Arrow-
vectorized pandas UDF ≫ grouped applyInPandas ≫ row-at-a-time Python
UDF (shown once, deliberately on a small projection).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from delta_lake_play_spark.registry import register
from delta_lake_play_spark.sources.catalog import load_table

# --- udf_python_scalar: row-at-a-time UDF (the slow path, shown once) ----


@F.udf(T.StringType())
def _normalize_name(name):  # no type hints: pyspark tries (and fails) to infer
    # an eval type from them, emitting a UserWarning at import
    # Customer#000000042 -> CUST-42
    return "CUST-" + str(int(name.split("#")[1]))


_PYUDF_ORACLE = r"""
SELECT c_custkey,
       'CUST-' || CAST(CAST(regexp_extract(c_name, 'Customer#(\d+)', 1) AS BIGINT) AS VARCHAR)
         AS cust_code
FROM customer
"""


@register("udf_python_scalar", oracle=_PYUDF_ORACLE)
def udf_python_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    return c.select("c_custkey", _normalize_name("c_name").alias("cust_code"))


# --- udf_pandas_vectorized: Arrow-batched scalar UDF ----------------------


@F.pandas_udf(T.DoubleType())
def _engagement_score(value: pd.Series) -> pd.Series:
    # Plain IEEE arithmetic → bit-identical to the SQL formulation.
    return (value * 2 + 1) / 3


_PDUDF_ORACLE = """
SELECT event_id, (value * 2 + 1) / 3 AS score
FROM events WHERE event_type = 'purchase'
"""


@register("udf_pandas_vectorized", oracle=_PDUDF_ORACLE)
def udf_pandas_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow transfers columnar batches; numpy does the math — the
    10-100× faster Python path when one is unavoidable."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    return ev.select("event_id", _engagement_score("value").alias("score"))


# --- udaf_pandas_grouped: applyInPandas custom aggregate -------------------

_UDAF_SCHEMA = "event_type string, n bigint, sum_value double, value_span double"


def _per_type_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    # exact grid math; NULL values are skipped like SQL aggregates
    # (an int64 astype would crash on NaN), and an all-NULL group
    # sums to NULL, not 0
    cents = (pdf["value"] * 100).round().dropna()
    return pd.DataFrame(
        {
            "event_type": [pdf["event_type"].iloc[0]],
            "n": [len(pdf)],
            "sum_value": [
                int(cents.sum()) / 100.0 if len(cents) else None
            ],
            "value_span": [pdf["value"].max() - pdf["value"].min()],
        }
    )


_UDAF_ORACLE = """
SELECT event_type,
       COUNT(*) AS n,
       SUM(CAST(round(value * 100) AS BIGINT)) / 100.0 AS sum_value,
       max(value) - min(value) AS value_span
FROM events GROUP BY event_type
"""


@register("udaf_pandas_grouped", oracle=_UDAF_ORACLE)
def udaf_pandas_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group pandas aggregation (UDAF shape). Grouped on a
    low-cardinality key here; at scale the group count, not row
    count, bounds the pandas memory per task."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").applyInPandas(_per_type_stats, _UDAF_SCHEMA)


# --- udtf_explode_ngrams: text → n-gram rows (pure Catalyst, no UDTF needed) --

_NGRAM_ORACLE = """
SELECT doc_id, unnest([t[i] || ' ' || t[i+1] for i in range(1, len(t))]) AS bigram
FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents WHERE doc_id < 30)
"""


@register("udtf_explode_ngrams", oracle=_NGRAM_ORACLE)
def udtf_explode_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram expansion as transform(sequence)+explode — the UDTF
    shape without leaving codegen."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 30)
    # Guard the 1-token doc: sequence(1, 0) DESCENDS in Spark and
    # element_at(toks, 0) errors; DuckDB's range(1, 1) is empty.
    # when-null explodes to no rows, matching the oracle.
    bigrams = F.expr(
        "CASE WHEN size(split(text, ' ')) >= 2 THEN "
        "transform(sequence(1, size(split(text, ' ')) - 1), "
        "i -> concat(element_at(split(text, ' '), i), ' ', element_at(split(text, ' '), i + 1)))"
        " END"
    )
    return d.select("doc_id", F.explode(bigrams).alias("bigram"))


# --- udtf_python_offsets: a REAL Python UDTF (Spark 3.5+ @udtf) -----------
# udtf_explode_ngrams shows the preferred pure-Catalyst expansion;
# this key exercises the actual Python UDTF surface — a table
# function with per-row generator state (cumulative char offsets),
# invoked through a SQL LATERAL join. Python-per-row is the cost of
# the API: use it for logic that genuinely needs imperative state,
# never where explode/transform can express the expansion.

_UDTF_OFF_ORACLE = """
WITH tok AS (
  SELECT doc_id, CAST(u['pos'] AS INTEGER) AS pos, u['term'] AS term FROM (
    SELECT doc_id,
           unnest([{'pos': i - 1, 'term': t[i]} for i in range(1, len(t) + 1)]) AS u
    FROM (SELECT doc_id, string_split(text, ' ') AS t
          FROM documents WHERE doc_id % 25 = 0)
  )
)
SELECT doc_id, pos, term,
       CAST(coalesce(SUM(len(term) + 1) OVER (
              PARTITION BY doc_id ORDER BY pos
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS INTEGER)
         AS start
FROM tok
"""


@register("udtf_python_offsets", oracle=_UDTF_OFF_ORACLE)
def udtf_python_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, term string, start int")
    class SplitOffsets:
        def eval(self, text: str):
            off = 0
            for i, tkn in enumerate(text.split(" ")):
                yield i, tkn, off
                off += len(tkn) + 1

    spark.udtf.register("split_offsets", SplitOffsets)
    load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % 25 == 0
    ).createOrReplaceTempView("udtf_docs")
    return spark.sql(
        "SELECT doc_id, s.pos, s.term, s.start "
        "FROM udtf_docs, LATERAL split_offsets(text) s"
    )


# --- udtf_polymorphic_split: Spark 4 UDTF analyze() (dynamic schema) ------
# The POLYMORPHIC half of the UDTF surface: no static returnType —
# the output schema is computed at PLAN time by a static ``analyze``
# from the call's literal arguments (here: n leading tokens → n
# string columns t0..t{n-1}). This is Spark 4's table-function
# protocol for schema-on-call operators (CSV-ish splitters, pivoting
# expanders) where a fixed declaration can't express the shape.

_UDTF_POLY_N = 3

_UDTF_POLY_ORACLE = f"""
SELECT doc_id,
       {", ".join(f"t[{i + 1}] AS t{i}" for i in range(_UDTF_POLY_N))}
FROM (
  SELECT doc_id,
         list_transform(string_split(text, ' ')[1:{_UDTF_POLY_N}], x -> lower(x)) AS t
  FROM documents WHERE doc_id % 25 = 0
)
"""


@register("udtf_polymorphic_split", oracle=_UDTF_POLY_ORACLE)
def udtf_polymorphic_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leading-token expansion through a polymorphic Python UDTF:
    ``split_fixed(text, 3)`` plans a 3-column schema via
    ``analyze()`` (AnalyzeResult from the foldable literal), then
    eval pads/truncates each row to exactly those columns. The same
    call with another literal plans a different schema — the part a
    static returnType cannot do."""
    from pyspark.sql.functions import udtf
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class SplitFixed:
        @staticmethod
        def analyze(text: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            k = int(n.value)
            return AnalyzeResult(
                T.StructType(
                    [T.StructField(f"t{i}", T.StringType()) for i in range(k)]
                )
            )

        def eval(self, text: str, n: int):
            toks = (text or "").split(" ")
            yield tuple(
                toks[i].lower() if i < len(toks) else None for i in range(n)
            )

    spark.udtf.register("split_fixed", udtf(SplitFixed))
    load_table(spark, sf_dir, "documents").where(
        F.col("doc_id") % 25 == 0
    ).createOrReplaceTempView("udtf_poly_docs")
    cols = ", ".join(f"s.t{i}" for i in range(_UDTF_POLY_N))
    return spark.sql(
        f"SELECT doc_id, {cols} "
        f"FROM udtf_poly_docs, LATERAL split_fixed(text, {_UDTF_POLY_N}) s"
    )


# --- udf_arrow_batch: mapInArrow (zero-copy RecordBatch surface) ----------

# The fourth escape hatch: pyarrow RecordBatches straight through
# Python with no pandas materialization — the right shape when the
# per-batch work is itself Arrow-native (compute kernels, Arrow IPC
# to another process, GPU transfer). Logic is mirrored in SQL so the
# oracle hash-checks the whole path.

_ARROW_ORACLE = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
FROM documents
"""


@register("udf_arrow_batch", oracle=_ARROW_ORACLE)
def udf_arrow_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow stage computing byte and token counts with pyarrow
    compute kernels on the RecordBatch itself — no pandas conversion,
    no per-row Python. Same scaling story as mapInPandas (per-batch
    memory, narrow map), minus the pandas copy."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def batch_stats(batches):
        for batch in batches:
            text = batch.column("text")
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    pc.cast(pc.binary_length(pc.cast(text, pa.binary())), pa.int64()),
                    pc.cast(
                        pc.list_value_length(pc.split_pattern(text, " ")), pa.int64()
                    ),
                ],
                ["doc_id", "n_bytes", "n_tokens"],
            )

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return d.mapInArrow(batch_stats, schema="doc_id bigint, n_bytes bigint, n_tokens bigint")


# --- udaf_arrow_grouped: groupBy().applyInArrow (Spark 4) -------------------

# The grouped twin of mapInArrow (Spark 4.0+): each group arrives as
# ONE pyarrow.Table in the Python worker — no pandas materialization
# — and the function returns a Table. Same shuffle/scale story as
# applyInPandas (state bounded by the largest single group, groups
# processed independently per partition), minus the pandas copy; the
# arithmetic stays on the exact cent grid so the oracle hash-checks
# bit-for-bit.

_ARROW_GROUPED_ORACLE = """
SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS n_custs,
       CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
         AS sum_bal_cents,
       CAST(MAX(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
         AS max_bal_cents
FROM customer GROUP BY c_mktsegment
"""


@register("udaf_arrow_grouped", oracle=_ARROW_GROUPED_ORACLE)
def udaf_arrow_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment exact stats computed with pyarrow compute kernels
    inside applyInArrow."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def seg_stats(table: "pa.Table") -> "pa.Table":
        cents = pc.cast(pc.round(pc.multiply(table.column("c_acctbal"), 100)), pa.int64())
        return pa.table(
            {
                "c_mktsegment": [table.column("c_mktsegment")[0].as_py()],
                "n_custs": [table.num_rows],
                "sum_bal_cents": [pc.sum(cents).as_py()],
                "max_bal_cents": [pc.max(cents).as_py()],
            },
            schema=pa.schema(
                [
                    ("c_mktsegment", pa.string()),
                    ("n_custs", pa.int64()),
                    ("sum_bal_cents", pa.int64()),
                    ("max_bal_cents", pa.int64()),
                ]
            ),
        )

    c = load_table(spark, sf_dir, "customer").select("c_mktsegment", "c_acctbal")
    return c.groupBy("c_mktsegment").applyInArrow(
        seg_stats,
        schema=(
            "c_mktsegment string, n_custs bigint, "
            "sum_bal_cents bigint, max_bal_cents bigint"
        ),
    )
