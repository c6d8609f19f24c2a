#!/usr/bin/env python3
"""Benchmark harness (driver contract).

Runs every registered query from ``__spark_entry__.queries()`` at
``$SPARK_GRAFT_SF_DIR`` (default ``/root/testdata/sf0.1``) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line::

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Execution is forced with the ``noop`` DataSource-V2 sink (full
computation of every output column, zero driver transfer) rather than
``count()`` (which lets Catalyst prune the whole projection) or
``toPandas()`` (which measures Arrow transfer, not the engine).

The session is warmed with one throwaway action first so JVM/codegen
startup is not attributed to the first query. Per-key figures are the
MEDIAN of up to 3 runs (BASELINE.md protocol; heavy keys >10s run
once); ``bench_full.json`` keeps every sample under ``run_detail``.

Self-adjudication (VERDICT r9 ask #1 — three rounds of driver-record
drift each needed an after-the-fact environment explanation):

- a PINNED CALIBRATION PROBE — a fixed CPU+shuffle microbench that
  never changes with the query code — runs at suite start, middle,
  and end; its three samples ride in the JSON (``calib``), so machine
  state and within-run drift are visible inside the artifact itself.
- the headline set gets a SECOND PASS at suite end (``headline_sum``
  vs ``headline_repass_sum``). Interpretation, calibrated on the r10
  close runs: repass ≈ first pass on a short suite; after a full
  300+-key session the repass reads ~1.5-1.7× UNIFORMLY across key
  types while the calibration probe stays flat — that is in-SESSION
  aging (catalog/listener growth, old-gen pressure on complex
  plans), not machine state and not code. So: calib moves → machine;
  repass moves with flat calib → session age; per-key medians move
  with both flat → code. The first-pass ``headline_norm`` is the
  cross-round comparator.
- ``headline_norm`` = first-pass headline sum × (CALIB_REF /
  median(calib)) — the headline figure normalized to the pinned
  reference machine state, comparable across rounds without prose.
  CALIB_REF was measured on a quiet VM when the probe landed (r10)
  and must NOT be re-tuned afterwards.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)


#: Calibration-probe wall-clock on this VM, quiet state, local[32]
#: (median of 5, measured 2026-08-16 when the probe was introduced:
#: [0.403, 0.453, 0.460, 0.467, 0.531]). Pinned forever — re-tuning
#: it would defeat cross-round comparison.
CALIB_REF = 0.46


def _calibration(spark) -> float:
    """Fixed CPU+shuffle microbench, independent of all query code:
    20M-row range → modulo key → 200-group hash aggregate, forced
    through the noop sink. Exercises codegen, whole-stage CPU, and
    one shuffle — the same resources the suite contends for."""
    from pyspark.sql import functions as F

    t0 = time.perf_counter()
    (
        spark.range(0, 20_000_000, 1, 32)
        .withColumn("k", F.col("id") % 200)
        .withColumn("v", (F.col("id") * 2654435761) % 1_000_003)
        .groupBy("k")
        .agg(F.sum("v").alias("s"), F.count("*").alias("n"), F.max("v").alias("m"))
        .write.mode("overwrite")
        .format("noop")
        .save()
    )
    return round(time.perf_counter() - t0, 4)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    only = [k for k in os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").split(",") if k]

    from delta_lake_play_spark.registry import all_queries
    from delta_lake_play_spark.session import get_spark

    spark = get_spark("delta_lake_play_spark-bench", cpus=cpus)
    queries = all_queries()
    # The two LSH-heavy keys run first, right after warmup: even with
    # the enlarged code cache, ~180 preceding codegen'd queries leave
    # enough JVM state that their in-suite time varied 8->24s run to
    # run; measured first they match their isolated times.
    heavy_first = [k for k in ("llm_dedup_near_minhash", "llm_dedup_simhash") if k in queries]
    keys = only or heavy_first + sorted(k for k in queries if k not in heavy_first)

    # Warm-up: JVM, codegen, parquet footer cache for the big table.
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    _calibration(spark)  # its own codegen warm-up, never measured
    calib = [_calibration(spark)]
    mid_at = len(keys) // 2

    # BASELINE.md protocol: median of 3. VM timer noise ran ±2x on
    # sub-second keys in rounds 1-2 (SURVEY §10), so single-run
    # round-over-round comparison was polluted. Each key runs up to 3
    # times — stopping early when one run already cost >10s (heavy
    # keys are proportionally less noise-sensitive and 3x-ing them
    # would triple total bench time) or when the whole bench is over
    # its soft time budget.
    runs_per_key = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    soft_budget_s = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET", "480"))
    bench_start = time.perf_counter()

    timings: dict[str, float] = {}
    run_detail: dict[str, dict] = {}
    failures: dict[str, str] = {}
    for key_i, key in enumerate(keys):
        if key_i == mid_at:
            calib.append(_calibration(spark))
        samples: list[float] = []
        for _ in range(max(1, runs_per_key)):
            t0 = time.perf_counter()
            try:
                df = queries[key](spark, sf_dir)
                df.write.mode("overwrite").format("noop").save()
            except Exception as exc:  # keep benching; surface at the end
                failures[key] = f"{type(exc).__name__}: {exc}"[:200]
                break
            samples.append(round(time.perf_counter() - t0, 4))
            # Drop caches persisted inside query builders (LSH
            # signature stages etc.) — across 100+ queries in one JVM
            # the leaked storage memory otherwise compounds into GC
            # pressure that can double late-query timings (measured).
            spark.catalog.clearCache()
            if samples[-1] > 5.0:
                # A heavy query leaves the old gen full of dead shuffle
                # and broadcast blocks; a forced full GC here costs <1s
                # and prevents the creep that inflated late heavy keys
                # 2-2.5x over their isolated times (measured).
                spark._jvm.System.gc()
            # Heavy keys get TWO samples, never one: single-sample
            # timings on the LSH keys varied 9->64s JVM-to-JVM (r3
            # measurement; first run carries compilation + cold cache),
            # so one unlucky sample poisons the round comparison. Two
            # runs + lower-median reads through the cold-start tail.
            if sum(samples) > 10.0 and len(samples) >= 2:
                break
            if time.perf_counter() - bench_start > soft_budget_s:
                break
        if samples:
            # lower median: unbiased for odd counts, and for the
            # two-sample heavy-key case it reads the warmed run rather
            # than the cold one.
            med = sorted(samples)[(len(samples) - 1) // 2]
            timings[key] = med
            run_detail[key] = {
                "median_s": med,
                "runs": len(samples),
                "all_runs": samples,
            }

    calib.append(_calibration(spark))

    # End-of-suite second pass over the headline set: one run per key
    # (the JVM is as warm as it will ever be), so first-pass-vs-repass
    # separates in-run machine state from code cost.
    repass: dict[str, float] = {}
    if not only and os.environ.get("SPARK_GRAFT_BENCH_REPASS", "1") != "0":
        # SAME ordering + GC discipline as the first pass (LSH keys
        # first, forced full GC after heavy keys): the r10 close run
        # showed the repass reading 1.5x high purely because the LSH
        # keys ran at the END of a 327-key-old JVM in headline order.
        repass_keys = heavy_first + [
            k for k in _HEADLINE if k in timings and k not in heavy_first
        ]
        spark._jvm.System.gc()
        for key in repass_keys:
            if key not in timings:
                continue
            if time.perf_counter() - bench_start > soft_budget_s * 1.5:
                break  # never let the repass blow the suite's wall budget
            t0 = time.perf_counter()
            try:
                queries[key](spark, sf_dir).write.mode("overwrite").format(
                    "noop"
                ).save()
            except Exception:
                continue  # first-pass failure already recorded
            repass[key] = round(time.perf_counter() - t0, 4)
            spark.catalog.clearCache()
            if repass[key] > 5.0:
                spark._jvm.System.gc()
        calib.append(_calibration(spark))

    import statistics

    calib_med = statistics.median(calib)  # true median (4-sample path
    # after the repass: mean of the middle two, not the upper-middle —
    # the post-repass sample is typically the warmest and would bias
    # a positional pick)
    if only:
        # partial runs aren't comparable: suppress the headline block
        # rather than emit a number that LOOKS like a full-suite one
        headline_sum = repass_sum = headline_norm = None
    else:
        headline_sum = round(
            sum(timings[k] for k in _HEADLINE if k in timings), 3
        )
        repass_sum = round(sum(repass.values()), 3) if repass else None
        headline_norm = round(headline_sum * (CALIB_REF / calib_med), 3)

    sf_name = os.path.basename(os.path.normpath(sf_dir))
    try:
        sf = float(sf_name.replace("sf", ""))
    except ValueError:
        sf = sf_name

    # The driver captures only the last ~2000 chars of output, so the
    # stdout JSON line must stay well under that or it is truncated
    # mid-line and unparseable (this is what happened in round 1: 123
    # per-query entries ≈ 4.5 KB).  stdout carries the headline
    # queries; the full per-query map goes to stderr and a sidecar
    # file for local analysis.
    full = {
        "metric": "total_wall_clock_all_queries",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,  # per-key MEDIAN seconds
        "protocol": "median_of_up_to_3_runs",
        "run_detail": run_detail,  # per-key {median_s, runs, all_runs}
        "sf": sf,
        "n_queries": len(timings),
        "calib": calib,  # pinned probe at suite start/middle/end[/post-repass]
        "calib_ref": CALIB_REF,
        "headline_sum": headline_sum,
        "headline_repass": repass,  # per-key end-of-suite second pass
        "headline_repass_sum": repass_sum,
        "headline_norm": headline_norm,  # headline_sum × CALIB_REF/median(calib)
    }
    if failures:
        full["failures"] = failures
    with open(os.path.join(_REPO_DIR, "bench_full.json"), "w") as fh:
        json.dump(full, fh)
    print(json.dumps(full), file=sys.stderr)

    headline = [k for k in _HEADLINE if k in timings]
    compact = {
        "metric": "total_wall_clock_all_queries",
        "value": full["value"],
        "unit": "sec",
        "queries": {k: round(timings[k], 2) for k in headline},
        "sf": sf,
        "n_queries": len(timings),
        "n_failures": len(failures),
        "calib": [round(c, 2) for c in calib],
        "calib_ref": CALIB_REF,
        "headline_sum": headline_sum,
        "headline_repass_sum": repass_sum,
        "headline_norm": headline_norm,
    }
    print(json.dumps(compact, separators=(",", ":")))


#: One representative per SURVEY.md §2 family plus every
#: LLM-pipeline operator — the queries the JSON line reports
#: per-key.  `value` still totals ALL registered queries.
_HEADLINE = [
    "agg_group_sum_avg_count",   # flagship TPC-H Q1 shape
    "join_region_revenue",       # TPC-H Q5 shape, 6-table star
    "join_volume_shipping",      # TPC-H Q7 shape, nation-pair
    "join_returned_topcust",     # TPC-H Q10 shape, top-20
    "join_disjunctive_pred",     # TPC-H Q19 shape, OR-of-ANDs
    "join_multiway_star",
    "join_asof_last_event",
    "join_bucketed_colocated",
    "win_row_number_topk_per_group",
    "topk_global",
    "agg_grouping_sets",
    "agg_percentile",
    "filter_range",
    "scan_data_skipping",
    "dml_merge_upsert",
    "dml_delete_where",
    "time_travel_version",
    "set_except_snapshot_diff",
    "fn_array_hof",
    "fn_map_json",
    "stream_tumbling_window",
    "stream_foreachBatch_upsert",
    "udf_pandas_vectorized",
    "udaf_pandas_grouped",
    "llm_dedup_exact",
    "llm_dedup_near_minhash",
    "llm_dedup_simhash",
    "llm_dedup_ngram_jaccard",
    "llm_dedup_embedding_cosine",
    "llm_dedup_clusters",
    "llm_decontaminate",
    "llm_similarity_topk",
    "llm_similarity_ivf",
    "llm_similarity_lsh",
    "llm_text_stats",
    "llm_text_token_bpe",
    "llm_doc_quality_filter",
    "llm_multimodal_decode",
    "llm_embedding_quantize",
]


if __name__ == "__main__":
    main()
