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
startup is not attributed to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    only = [k for k in os.environ.get("SPARK_GRAFT_BENCH_ONLY", "").split(",") if k]

    from delta_lake_play_spark.registry import all_queries
    from delta_lake_play_spark.session import get_spark

    spark = get_spark("delta_lake_play_spark-bench", cpus=cpus)
    queries = all_queries()
    keys = only or sorted(queries)

    # Warm-up: JVM, codegen, parquet footer cache for the big table.
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    timings: dict[str, float] = {}
    failures: dict[str, str] = {}
    for key in keys:
        t0 = time.perf_counter()
        try:
            df = queries[key](spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
        except Exception as exc:  # keep benching; surface at the end
            failures[key] = f"{type(exc).__name__}: {exc}"[:200]
            continue
        timings[key] = round(time.perf_counter() - t0, 4)
        # Drop caches persisted inside query builders (LSH signature
        # stages etc.) — across 100+ queries in one JVM the leaked
        # storage memory otherwise compounds into GC pressure that
        # can double late-query timings (measured).
        spark.catalog.clearCache()

    sf_name = os.path.basename(os.path.normpath(sf_dir))
    try:
        sf = float(sf_name.replace("sf", ""))
    except ValueError:
        sf = sf_name
    result = {
        "metric": "total_wall_clock_all_queries",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_queries": len(timings),
    }
    if failures:
        result["failures"] = failures
    print(json.dumps(result))


if __name__ == "__main__":
    main()
