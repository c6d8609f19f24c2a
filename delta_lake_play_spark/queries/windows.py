"""Window functions (SURVEY.md §2.5).

None exist in the reference (its only "windowing" is pandas
``set_index("version")`` at ``api.py:67``); these are the north-star
analytical surface and the building blocks for as-of join, top-k per
group and sessionization.

Determinism rules used throughout:
- every ORDER BY carries a unique tiebreaker (event_id / *_orderkey);
- running/moving SUM/AVG go through integer cents (DuckDB evaluates
  sliding frames with a segment tree whose double addition order
  differs from Spark's running accumulation — bigint is exact);
- event-time arithmetic is integer microseconds (``unix_micros`` /
  ``epoch_us``), never double epoch seconds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from delta_lake_play_spark.registry import register
from delta_lake_play_spark.sources.catalog import load_table

# --- win_row_number_topk_per_group ---------------------------------------

_TOPK_ORACLE = """
SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders)
WHERE rn <= 3
"""


@register("win_row_number_topk_per_group", oracle=_TOPK_ORACLE)
def win_row_number_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer: one shuffle on the group key; AQE
    handles skewed customers. (A global sort would be wrong at scale.)"""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


# --- win_rank_dense_rank ---------------------------------------------------

_RANK_ORACLE = """
SELECT p_partkey, p_type, p_retailprice,
       rank()       OVER (PARTITION BY p_type ORDER BY p_retailprice DESC) AS rnk,
       dense_rank() OVER (PARTITION BY p_type ORDER BY p_retailprice DESC) AS drnk
FROM part
"""


@register("win_rank_dense_rank", oracle=_RANK_ORACLE)
def win_rank_dense_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_type").orderBy(F.col("p_retailprice").desc())
    return p.select(
        "p_partkey",
        "p_type",
        "p_retailprice",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


# --- win_lag_lead_delta ------------------------------------------------------

_LAG_ORACLE = """
SELECT event_id, user_id, value,
       lag(value)  OVER w AS prev_value,
       lead(value) OVER w AS next_value,
       value - lag(value) OVER w AS delta
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


@register("win_lag_lead_delta", oracle=_LAG_ORACLE)
def win_lag_lead_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("value").over(w)
    return ev.select(
        "event_id",
        "user_id",
        "value",
        prev.alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        (F.col("value") - prev).alias("delta"),
    )


# --- win_running_sum_frame ----------------------------------------------------

_RUNSUM_ORACLE = """
SELECT o_custkey, o_orderkey, o_totalprice,
       SUM(CAST(round(o_totalprice * 100) AS BIGINT))
         OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0
         AS running_spend
FROM orders
"""


@register("win_running_sum_frame", oracle=_RUNSUM_ORACLE)
def win_running_sum_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        (F.sum(cents).over(w) / F.lit(100.0)).alias("running_spend"),
    )


# --- win_range_frame_moving_avg -------------------------------------------------

_MOVAVG_ORACLE = """
SELECT event_id, user_id, epoch_s,
       (SUM(cents) OVER w / 100.0) / COUNT(cents) OVER w AS moving_avg_1h
FROM (
  SELECT event_id, user_id,
         epoch_us(ts::TIMESTAMP) // 1000000 AS epoch_s,
         CAST(round(value * 100) AS BIGINT) AS cents
  FROM events)
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_s
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
"""


@register("win_range_frame_moving_avg", oracle=_MOVAVG_ORACLE)
def win_range_frame_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour trailing average per user. RANGE frames are tie-safe:
    all rows in the value range are peers, so no tiebreak is needed."""
    ev = load_table(spark, sf_dir, "events")
    base = ev.select(
        "event_id",
        "user_id",
        (F.unix_micros("ts") / F.lit(1000000)).cast("bigint").alias("epoch_s"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("epoch_s")
        .rangeBetween(-3600, Window.currentRow)
    )
    return base.select(
        "event_id",
        "user_id",
        "epoch_s",
        ((F.sum("cents").over(w) / F.lit(100.0)) / F.count("cents").over(w)).alias(
            "moving_avg_1h"
        ),
    )


# --- win_ntile ---------------------------------------------------------------------

_NTILE_ORACLE = """
SELECT c_custkey, c_acctbal,
       ntile(4) OVER (ORDER BY c_acctbal DESC, c_custkey) AS wealth_quartile
FROM customer
"""


@register("win_ntile", oracle=_NTILE_ORACLE)
def win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    w = Window.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return c.select(
        "c_custkey", "c_acctbal", F.ntile(4).over(w).alias("wealth_quartile")
    )


# --- win_session_id: gap-based sessionization (batch form) ---------------------------

_SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes in microseconds

_SESSION_ORACLE = f"""
SELECT event_id, user_id, ts,
       CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS session_id
FROM (
  SELECT event_id, user_id, ts::TIMESTAMP AS ts,
         CASE WHEN epoch_us(ts::TIMESTAMP)
                   - lag(epoch_us(ts::TIMESTAMP))
                     OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > {_SESSION_GAP_US}
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events)
"""


@register("win_session_id", oracle=_SESSION_ORACLE)
def win_session_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New session when the per-user gap exceeds 30 min; session_id is
    the running count of session starts. Integer-µs math throughout."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros("ts")
    prev_us = F.lag(us).over(w)
    is_new = F.when(
        prev_us.isNull() | ((us - prev_us) > _SESSION_GAP_US), 1
    ).otherwise(0)
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.sum(is_new).over(run).alias("session_id"),
    )


# --- win_first_last_nth ---------------------------------------------------

_FLN_ORACLE = """
SELECT o_orderkey, o_custkey, o_totalprice,
       first_value(o_orderkey) OVER w AS first_order,
       last_value(o_orderkey) OVER w AS latest_order,
       nth_value(o_orderkey, 2) OVER w AS second_order
FROM orders
WINDOW w AS (
  PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
)
"""


@register("win_first_last_nth", oracle=_FLN_ORACLE)
def win_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first/last/nth_value with an explicit full-partition frame —
    last_value under the default frame is the classic silent bug
    (it returns the CURRENT row), so the frame is always spelled
    out. Unique tiebreak column keeps ordering deterministic."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.first("o_orderkey").over(w).alias("first_order"),
        F.last("o_orderkey").over(w).alias("latest_order"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_order"),
    )


# --- win_percent_rank_cume_dist -------------------------------------------

_PRCD_ORACLE = """
SELECT o_orderkey, o_custkey,
       percent_rank() OVER w AS pr,
       cume_dist() OVER w AS cd
FROM orders
WINDOW w AS (PARTITION BY o_custkey
             ORDER BY o_totalprice NULLS FIRST, o_orderkey)
"""


@register("win_percent_rank_cume_dist", oracle=_PRCD_ORACLE)
def win_percent_rank_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-position window functions (both are exact rational
    divisions of row counts — bit-identical across engines)."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )


# --- win_count_distinct: running distinct count ---------------------------
# Spark does not support DISTINCT aggregates over a window frame.
# The scalable identity: a user contributes 1 exactly at their first
# occurrence, so running-distinct-count == running SUM of a
# first-occurrence flag (row_number()==1 over (event_type, user_id)).
# Two window passes, no per-row set state — at 100 TB the collect_set
# alternative would hold the whole distinct set per ROW; this holds
# one integer. DuckDB supports the DISTINCT window aggregate
# natively, which is the oracle.

_WCD_ORACLE = """
SELECT event_id, event_type, ts::TIMESTAMP AS ts,
       CAST(count(DISTINCT user_id) OVER (
         PARTITION BY event_type ORDER BY ts::TIMESTAMP, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS distinct_users_so_far
FROM events
"""


@register("win_count_distinct", oracle=_WCD_ORACLE)
def win_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w_first = Window.partitionBy("event_type", "user_id").orderBy("ts", "event_id")
    w_run = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_new = (F.row_number().over(w_first) == 1).cast("long")
    return ev.select(
        "event_id",
        "event_type",
        "ts",
        F.sum(is_new).over(w_run).alias("distinct_users_so_far"),
    )


# --- win_funnel_pattern: sequential-pattern detection ---------------------
# MATCH_RECOGNIZE-style funnel (view -> click -> purchase, each hop
# within 24 hours -- sized to this corpus's ~2 events/user/day density) with NO self-joins: two stacked window passes
# over the same (user, time) ordering carry "latest qualifying
# previous stage" forward as running maxima. One shuffle total, state
# per row is two timestamps — the shape survives any event volume,
# where the naive 3-way self-join explodes quadratically per user.
# Running MAX of a CASE (not last+ignorenulls) keeps both engines'
# semantics trivially identical under the total (ts, event_id) order.

_HOP_US = 24 * 3600 * 1_000_000

_FUNNEL_ORACLE = f"""
WITH e AS (
  SELECT event_id, user_id, event_type, ts::TIMESTAMP AS ts,
         epoch_us(ts::TIMESTAMP) AS us
  FROM events
), w1 AS (
  SELECT *, max(CASE WHEN event_type = 'view' THEN us END) OVER
    (PARTITION BY user_id ORDER BY us, event_id
     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v_us
  FROM e
), w2 AS (
  SELECT *, max(CASE WHEN event_type = 'click' AND v_us IS NOT NULL
                      AND us - v_us <= {_HOP_US} THEN us END) OVER
    (PARTITION BY user_id ORDER BY us, event_id
     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c_us
  FROM w1
)
SELECT event_id, user_id, ts, CAST(c_us AS BIGINT) AS click_us
FROM w2
WHERE event_type = 'purchase' AND c_us IS NOT NULL AND us - c_us <= {_HOP_US}
"""


@register("win_funnel_pattern", oracle=_FUNNEL_ORACLE)
def win_funnel_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts", F.unix_micros("ts").alias("us")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    v_us = F.max(F.when(F.col("event_type") == "view", F.col("us"))).over(w)
    w1 = ev.withColumn("v_us", v_us)
    c_us = F.max(
        F.when(
            (F.col("event_type") == "click")
            & F.col("v_us").isNotNull()
            & (F.col("us") - F.col("v_us") <= _HOP_US),
            F.col("us"),
        )
    ).over(w)
    w2 = w1.withColumn("c_us", c_us)
    return w2.where(
        (F.col("event_type") == "purchase")
        & F.col("c_us").isNotNull()
        & (F.col("us") - F.col("c_us") <= _HOP_US)
    ).select("event_id", "user_id", "ts", F.col("c_us").alias("click_us"))


# --- win_gap_islands: consecutive-day activity runs -----------------------
# Classic gaps-and-islands: one row per maximal run of consecutive
# active days per user. The (day - row_number) group key turns each
# run into a constant — two window-free-shuffle-compatible stages
# (distinct days, then a per-user window + re-group), no self-join.

_ISLANDS_ORACLE = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
  FROM events WHERE event_type = 'error'
), keyed AS (
  SELECT user_id, day,
         day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day) AS INTEGER)
           AS grp
  FROM days
)
SELECT user_id,
       CAST(MIN(day) AS TIMESTAMP) AS island_start,
       CAST(MAX(day) AS TIMESTAMP) AS island_end,
       CAST(COUNT(*) AS BIGINT) AS n_days
FROM keyed GROUP BY user_id, grp
"""


@register("win_gap_islands", oracle=_ISLANDS_ORACLE)
def win_gap_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal consecutive-day runs of per-user error activity. The
    distinct + window + re-aggregate all hash-partition on user_id, so
    AQE reuses one exchange; no join appears anywhere. Date arithmetic
    is integer-exact on both engines."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "error")
    days = ev.select("user_id", F.to_date("ts").alias("day")).distinct()
    rn = F.row_number().over(Window.partitionBy("user_id").orderBy("day"))
    keyed = days.select(
        "user_id", "day", F.date_sub(F.col("day"), rn).alias("grp")
    )
    return keyed.groupBy("user_id", "grp").agg(
        F.min("day").cast("timestamp").alias("island_start"),
        F.max("day").cast("timestamp").alias("island_end"),
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
    ).drop("grp")


# --- win_interval_range_frame ---------------------------------------------

# Native INTERVAL range frame on timestamp ordering — the trailing
# one-hour event count/sum per user without converting time to epoch
# integers (win_range_frame_moving_avg shows the epoch form). RANGE
# frames include ts-peers on both engines, so the frame contents are
# deterministic even on duplicate timestamps.

_IVL_FRAME = (
    "OVER (PARTITION BY user_id ORDER BY ts "
    "RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)"
)

_IVL_ORACLE = f"""
SELECT event_id, user_id, ts,
       CAST(count(*) {_IVL_FRAME} AS BIGINT) AS n_trailing_1h,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) {_IVL_FRAME} / 100.0
            AS DOUBLE) AS sum_trailing_1h
FROM events
"""


@register("win_interval_range_frame", oracle=_IVL_ORACLE)
def win_interval_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-hour activity per user via RANGE BETWEEN INTERVAL —
    the time-native frame (no epoch arithmetic). The cent-grid sum
    keeps the frame aggregate order-independent inside each frame."""
    ev = load_table(spark, sf_dir, "events")
    ev.createOrReplaceTempView("win_ivl_events")
    return spark.sql(f"""
        SELECT event_id, user_id, ts,
               CAST(count(*) {_IVL_FRAME} AS BIGINT) AS n_trailing_1h,
               CAST(SUM(CAST(round(value * 100, 0) AS BIGINT)) {_IVL_FRAME} / 100.0
                    AS DOUBLE) AS sum_trailing_1h
        FROM win_ivl_events
    """)


# --- win_moving_median -----------------------------------------------------

# Spark has no median over a window FRAME (AnalysisException on any
# frame spec), so the moving median is composed from frame-scoped
# collect_list + array_sort — all codegen'd JVM expressions, O(frame
# log frame) per row on a BOUNDED frame. DuckDB runs its native
# windowed median. Parity holds because both sides take the middle of
# the same sorted 2-dp-grid values; the even-count average (a+b)/2 is
# an exact half-cent, one IEEE op on each engine.

_MOVMED_ORACLE = """
SELECT event_id, user_id,
       median(value) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN 4 PRECEDING AND CURRENT ROW
       ) AS moving_median
FROM events WHERE event_id < 10000
"""


@register("win_moving_median", oracle=_MOVMED_ORACLE)
def win_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user trailing moving median of the event value over the
    last 5 events — the robust-trend window primitive (a moving MEAN
    chases outliers; ops dashboards want the median)."""
    ev = load_table(spark, sf_dir, "events").where(F.col("event_id") < 10000)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    arr = F.array_sort(F.collect_list("value").over(w))
    n = F.size(arr)
    mid = (n / 2).cast("int")
    # collect_list drops NULLs (as DuckDB's median ignores them); an
    # all-NULL frame leaves an empty array → median NULL, and the
    # even-count branch must not probe index 0.
    med = (
        F.when(n == 0, F.lit(None).cast("double"))
        .when(n % 2 == 1, F.element_at(arr, mid + 1))
        .otherwise((F.element_at(arr, mid) + F.element_at(arr, mid + 1)) / 2.0)
    )
    return ev.select("event_id", "user_id", med.alias("moving_median"))


# --- win_interpolate_linear -----------------------------------------------
#
# Time-series resample + LINEAR interpolation (the timeseries-DB
# `interpolate()` / pandas `interpolate(method="time")` semantics,
# which zero-fill `fn_date_spine_fill` deliberately does not cover):
# each user's hourly spine left-joins the observed hourly sums, then
# gaps take pv + (nv - pv) * Δt/Δtotal from the bracketing
# observations. The bracketing values come from two
# last/first-IGNORE-NULLS window passes over the spine — per-user
# keyed shuffle only, frames evaluated in one pass; no self-join of
# the spine against observations, which is the naive quadratic form.
# Time deltas are integer hour counts (never double epoch), and the
# observed sums ride the exact integer-cents grid, so the single
# IEEE multiply-add per gap row is bit-stable across engines.

_INTERP_ORACLE = """
WITH obs AS (
  SELECT user_id, time_bucket(INTERVAL 1 HOUR, ts) AS hr,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) / 100.0 AS DOUBLE) AS v
  FROM events WHERE user_id < 20 GROUP BY 1, 2
),
span AS (
  SELECT user_id, MIN(hr) AS d0, MAX(hr) AS d1 FROM obs GROUP BY user_id
),
spine AS (
  SELECT user_id, unnest(generate_series(d0, d1, INTERVAL 1 HOUR)) AS hr
  FROM span
),
j AS (
  SELECT s.user_id, s.hr, o.v FROM spine s
  LEFT JOIN obs o ON s.user_id = o.user_id AND s.hr = o.hr
),
b AS (
  SELECT user_id, hr, v,
         last_value(v IGNORE NULLS) OVER w_back AS pv,
         last_value(CASE WHEN v IS NOT NULL THEN hr END IGNORE NULLS)
           OVER w_back AS ph,
         first_value(v IGNORE NULLS) OVER w_fwd AS nv,
         first_value(CASE WHEN v IS NOT NULL THEN hr END IGNORE NULLS)
           OVER w_fwd AS nh
  FROM j
  WINDOW
    w_back AS (PARTITION BY user_id ORDER BY hr
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
    w_fwd AS (PARTITION BY user_id ORDER BY hr
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT user_id, hr,
       v AS v_obs,
       CASE WHEN v IS NOT NULL THEN v
            WHEN pv IS NULL THEN nv
            WHEN nv IS NULL THEN pv
            ELSE pv + (nv - pv)
                 * (CAST(date_diff('hour', ph, hr) AS DOUBLE)
                    / date_diff('hour', ph, nh)) END AS v_interp,
       (v IS NULL) AS is_interpolated
FROM b
"""


@register("win_interpolate_linear", oracle=_INTERP_ORACLE)
def win_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly spine per user with linear interpolation across gaps
    from the bracketing observations (IGNORE NULLS window passes)."""
    from delta_lake_play_spark.functions.exact import dsum

    ev = load_table(spark, sf_dir, "events").where(F.col("user_id") < 20)
    hr = F.date_trunc("hour", F.col("ts"))
    obs = ev.groupBy("user_id", hr.alias("hr")).agg(dsum("value", 2).alias("v"))
    span = obs.groupBy("user_id").agg(
        F.min("hr").alias("d0"), F.max("hr").alias("d1")
    )
    spine = span.select(
        "user_id",
        F.explode(
            F.sequence("d0", "d1", F.expr("INTERVAL 1 HOUR"))
        ).alias("hr"),
    )
    j = spine.join(obs, ["user_id", "hr"], "left")
    w_back = (
        Window.partitionBy("user_id")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy("hr")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_hr = F.when(F.col("v").isNotNull(), F.col("hr"))
    b = j.select(
        "user_id",
        "hr",
        "v",
        F.last("v", ignorenulls=True).over(w_back).alias("pv"),
        F.last(obs_hr, ignorenulls=True).over(w_back).alias("ph"),
        F.first("v", ignorenulls=True).over(w_fwd).alias("nv"),
        F.first(obs_hr, ignorenulls=True).over(w_fwd).alias("nh"),
    )
    hours = lambda a, z: (  # noqa: E731 — integer hour delta
        (F.unix_timestamp(z) - F.unix_timestamp(a)) / 3600
    ).cast("long")
    interp = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * (
                hours("ph", "hr").cast("double")
                / hours("ph", "nh")
            )
        )
    )
    return b.select(
        "user_id",
        "hr",
        F.col("v").alias("v_obs"),
        interp.alias("v_interp"),
        F.col("v").isNull().alias("is_interpolated"),
    )


# --- win_resample_ohlc ----------------------------------------------------
#
# OHLC bar resampling (the financial/timeseries-DB `candlestick()` /
# pandas `resample().ohlc()` shape): per (user, hour) bucket, the
# FIRST and LAST observation by event time plus min/max/volume. One
# hash shuffle on the bucket key; open/close come from two
# row_number passes over the SAME partitioning (Catalyst reuses the
# exchange — window partition keys == groupBy keys), so no second
# shuffle and no self-join. Every output except volume is a single
# selected element (no FP accumulation); volume rides the exact
# integer-cents grid. ORDER BY carries event_id as the unique
# tiebreaker — first/last are deterministic at any parallelism.

_OHLC_ORACLE = """
WITH b AS (
  SELECT user_id, time_bucket(INTERVAL 1 HOUR, ts) AS hr, value,
         row_number() OVER (PARTITION BY user_id, time_bucket(INTERVAL 1 HOUR, ts)
                            ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (PARTITION BY user_id, time_bucket(INTERVAL 1 HOUR, ts)
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM events
)
SELECT user_id, hr,
       MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
       MAX(value) AS high,
       MIN(value) AS low,
       MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
       CAST(COUNT(*) AS BIGINT) AS n_obs,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) / 100.0 AS DOUBLE) AS volume
FROM b GROUP BY user_id, hr
"""


@register("win_resample_ohlc", oracle=_OHLC_ORACLE)
def win_resample_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars per user: open/close via row_number over the
    bucket partitioning, high/low/count/volume in the same keyed
    aggregation — one shuffle total."""
    from delta_lake_play_spark.functions.exact import dsum

    ev = load_table(spark, sf_dir, "events")
    b = ev.select(
        "user_id",
        F.date_trunc("hour", F.col("ts")).alias("hr"),
        "value",
        "ts",
        "event_id",
    )
    part = Window.partitionBy("user_id", "hr")
    rn_a = F.row_number().over(part.orderBy(F.asc("ts"), F.asc("event_id")))
    rn_d = F.row_number().over(part.orderBy(F.desc("ts"), F.desc("event_id")))
    return (
        b.withColumn("rn_a", rn_a)
        .withColumn("rn_d", rn_d)
        .groupBy("user_id", "hr")
        .agg(
            F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
            F.count(F.lit(1)).alias("n_obs"),
            dsum("value", 2).alias("volume"),
        )
    )


# --- win_ewma -------------------------------------------------------------
#
# Truncated exponentially-weighted moving average over each user's
# observed hourly series (pandas `ewm(alpha=.25, adjust=False)` up to
# the K-point truncation): the recursion e_t = (1-a)e_{t-1} + a·x_t
# is inherently sequential, so the SCALE form bounds the lookback at
# K=24 points — the dropped tail carries weight (1-a)^24 ≈ 1e-3 —
# making every row independent: one keyed shuffle, bounded frame,
# no cross-row state. Bit-stability across engines: both sides fold
# the SAME ordered list with the SAME seed through the SAME IEEE
# multiply-add sequence (Spark `aggregate` == DuckDB `list_reduce`
# with the seed prepended), alpha=0.25 is exactly representable, and
# the inputs are exact-grid doubles.

_EWMA_ORACLE = """
WITH obs AS (
  SELECT user_id, time_bucket(INTERVAL 1 HOUR, ts) AS hr,
         CAST(SUM(CAST(round(value * 100) AS BIGINT)) / 100.0 AS DOUBLE) AS v
  FROM events GROUP BY 1, 2
  -- all-NULL buckets carry no observation: drop them on BOTH sides
  -- (Spark's collect_list skips NULLs, DuckDB's list() keeps them)
  HAVING v IS NOT NULL
),
w AS (
  SELECT user_id, hr, v,
         list(v) OVER (PARTITION BY user_id ORDER BY hr
                       ROWS BETWEEN 23 PRECEDING AND CURRENT ROW) AS arr
  FROM obs
)
SELECT user_id, hr, v,
       list_reduce(list_prepend(CAST(0.0 AS DOUBLE), arr),
                   (acc, x) -> acc * 0.75 + 0.25 * x) AS ewma
FROM w
"""


@register("win_ewma", oracle=_EWMA_ORACLE)
def win_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA (alpha=0.25) over each user's hourly sums with a 24-point
    truncated lookback: collect the ordered frame, fold it with one
    deterministic multiply-add chain."""
    from delta_lake_play_spark.functions.exact import dsum

    ev = load_table(spark, sf_dir, "events")
    obs = ev.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("hr")
    ).agg(dsum("value", 2).alias("v")).where(F.col("v").isNotNull())
    frame = (
        Window.partitionBy("user_id")
        .orderBy("hr")
        .rowsBetween(-23, Window.currentRow)
    )
    arr = F.collect_list("v").over(frame)
    ewma = F.aggregate(
        arr,
        F.lit(0.0),
        lambda acc, x: acc * F.lit(0.75) + F.lit(0.25) * x,
    )
    return obs.select("user_id", "hr", "v", ewma.alias("ewma"))


# --- win_anomaly_zscore ---------------------------------------------------
#
# Rolling z-score anomaly detection (the monitoring-pipeline shape):
# each hourly observation scored against the trailing 24-point mean
# and sample stddev of its own series. All moments come from TWO
# exact integer window sums (Σc, Σc² over bigint cents — order
# independent at any parallelism), and the float math is one
# identical expression tree on both engines, so the hash is stable
# without any tolerance. n<2 and zero-variance rows yield NULL
# scores by explicit guard (never NaN/inf leakage).

_ZSCORE_ORACLE = """
WITH obs AS (
  SELECT user_id, time_bucket(INTERVAL 1 HOUR, ts) AS hr,
         SUM(CAST(round(value * 100) AS BIGINT)) AS c
  FROM events GROUP BY 1, 2
),
w AS (
  SELECT user_id, hr, c,
         CAST(COUNT(*) OVER fr AS BIGINT) AS n,
         SUM(c) OVER fr AS s1,
         SUM(c * c) OVER fr AS s2
  FROM obs
  WINDOW fr AS (PARTITION BY user_id ORDER BY hr
                ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
),
m AS (
  SELECT user_id, hr, c, n,
         CAST(s1 AS DOUBLE) / n AS mean_c,
         CASE WHEN n >= 2 THEN
           (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
           / (n - 1) END AS var_c
  FROM w
)
SELECT user_id, hr,
       CAST(c AS DOUBLE) / 100.0 AS v,
       CASE WHEN var_c > 0 THEN (CAST(c AS DOUBLE) - mean_c) / sqrt(var_c)
            END AS zscore,
       coalesce(abs(CASE WHEN var_c > 0
                         THEN (CAST(c AS DOUBLE) - mean_c) / sqrt(var_c)
                    END) > 3.0, FALSE) AS is_anomaly
FROM m
"""


@register("win_anomaly_zscore", oracle=_ZSCORE_ORACLE)
def win_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-24-point rolling z-score per user-hour from exact
    integer moment sums; |z| > 3 flags anomalies."""
    ev = load_table(spark, sf_dir, "events")
    obs = ev.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("hr")
    ).agg(F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias("c"))
    fr = (
        Window.partitionBy("user_id")
        .orderBy("hr")
        .rowsBetween(-23, Window.currentRow)
    )
    w = obs.select(
        "user_id",
        "hr",
        "c",
        F.count(F.lit(1)).over(fr).alias("n"),
        F.sum("c").over(fr).alias("s1"),
        F.sum(F.col("c") * F.col("c")).over(fr).alias("s2"),
    )
    s1d = F.col("s1").cast("double")
    mean_c = (s1d / F.col("n")).alias("mean_c")
    var_c = F.when(
        F.col("n") >= 2,
        (F.col("s2").cast("double") - s1d * s1d / F.col("n"))
        / (F.col("n") - 1),
    ).alias("var_c")
    m = w.select("user_id", "hr", "c", "n", mean_c, var_c)
    z = F.when(
        F.col("var_c") > 0,
        (F.col("c").cast("double") - F.col("mean_c")) / F.sqrt("var_c"),
    )
    return m.select(
        "user_id",
        "hr",
        (F.col("c").cast("double") / 100.0).alias("v"),
        z.alias("zscore"),
        F.coalesce(F.abs(z) > 3.0, F.lit(False)).alias("is_anomaly"),
    )


# --- win_twap -------------------------------------------------------------
#
# Time-weighted average price (the irregular-sampling aggregate OHLC
# deliberately isn't): each observation holds its value until the
# next one, so TWAP over a user-day = Σ cᵢ·Δtᵢ / ΣΔtᵢ with Δt from
# lead(ts) — the unweighted mean over-counts bursts of ticks. All
# weights are integer microseconds and all values integer cents, so
# the two accumulating sums are exact bigints at any parallelism
# (c·Δt ≈ 2e3·9e10 ≈ 2e14 per term — thousands of terms stay far
# inside int64); the single double division happens once per group
# in the same order on both engines. Single-observation days have no
# holding interval → NULL by guard, never 0/0.

_TWAP_ORACLE = """
WITH t AS (
  SELECT user_id, time_bucket(INTERVAL 1 DAY, ts) AS day,
         CAST(round(value * 100) AS BIGINT) AS c,
         epoch_us(lead(ts) OVER w) - epoch_us(ts) AS dt_us
  FROM events
  WINDOW w AS (PARTITION BY user_id, time_bucket(INTERVAL 1 DAY, ts)
               ORDER BY ts, event_id)
)
SELECT user_id, day,
       CAST(COUNT(*) AS BIGINT) AS n_obs,
       CASE WHEN SUM(dt_us) > 0 THEN
         CAST(SUM(c * dt_us) AS DOUBLE) / SUM(dt_us) / 100.0 END AS twap
FROM t GROUP BY user_id, day
"""


@register("win_twap", oracle=_TWAP_ORACLE)
def win_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per user-day time-weighted average from exact integer
    cent × microsecond products; lead(ts) defines each tick's
    holding interval."""
    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts"))
    w = Window.partitionBy("user_id", day.alias("day")).orderBy(
        "ts", "event_id"
    )
    t = ev.select(
        "user_id",
        day.alias("day"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("c"),
        (
            F.unix_micros(F.lead("ts").over(
                Window.partitionBy("user_id", day).orderBy("ts", "event_id")
            ))
            - F.unix_micros(F.col("ts"))
        ).alias("dt_us"),
    )
    return t.groupBy("user_id", "day").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.when(
            F.sum("dt_us") > 0,
            F.sum(F.col("c") * F.col("dt_us")).cast("double")
            / F.sum("dt_us")
            / 100.0,
        ).alias("twap"),
    )


# --- win_rolling_corr -------------------------------------------------------
#
# Rolling Pearson correlation between each user's hourly spend and
# hourly activity count over the trailing 24 observations — the
# quant/monitoring pair-stats shape. Every moment (Σx Σy Σxy Σx² Σy²
# n) is an exact int64 window sum (cents ≤ ~1e6, counts ≤ 1e4 keep
# every product and 24-term sum far inside int64), so the numerator
# and both variance terms are exact integers; the two sqrt's and one
# division are the only float ops, in the same order on both
# engines. Zero variance on either side → NULL by guard.

_ROLLCORR_ORACLE = """
WITH obs AS (
  SELECT user_id, time_bucket(INTERVAL 1 HOUR, ts) AS hr,
         SUM(CAST(round(value * 100) AS BIGINT)) AS x,
         CAST(COUNT(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
),
w AS (
  SELECT user_id, hr,
         CAST(COUNT(*) OVER fr AS BIGINT) AS n,
         SUM(x) OVER fr AS sx, SUM(y) OVER fr AS sy,
         SUM(x * y) OVER fr AS sxy,
         SUM(x * x) OVER fr AS sxx, SUM(y * y) OVER fr AS syy
  FROM obs
  WINDOW fr AS (PARTITION BY user_id ORDER BY hr
                ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
)
SELECT user_id, hr, n,
       CASE WHEN n >= 2 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
            THEN CAST(n * sxy - sx * sy AS DOUBLE)
                 / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                    * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
       END AS rolling_corr
FROM w
"""


@register("win_rolling_corr", oracle=_ROLLCORR_ORACLE)
def win_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-24-point spend/activity correlation per user-hour from
    exact integer moment sums."""
    ev = load_table(spark, sf_dir, "events")
    obs = ev.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("hr")
    ).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias("x"),
        F.count(F.lit(1)).alias("y"),
    )
    fr = (
        Window.partitionBy("user_id")
        .orderBy("hr")
        .rowsBetween(-23, Window.currentRow)
    )
    w = obs.select(
        "user_id",
        "hr",
        F.count(F.lit(1)).over(fr).alias("n"),
        F.sum("x").over(fr).alias("sx"),
        F.sum("y").over(fr).alias("sy"),
        F.sum(F.col("x") * F.col("y")).over(fr).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).over(fr).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(fr).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    vx = n * F.col("sxx") - sx * sx
    vy = n * F.col("syy") - sy * sy
    corr = F.when(
        (n >= 2) & (vx > 0) & (vy > 0),
        (n * F.col("sxy") - sx * sy).cast("double")
        / (F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double"))),
    )
    return w.select("user_id", "hr", "n", corr.alias("rolling_corr"))
