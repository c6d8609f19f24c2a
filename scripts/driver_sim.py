"""Simulate the spark-graft driver: import __spark_entry__ from the repo
root, smoke-run entry(spark), then run every queries() key at sf0.01 and
hash-compare against oracle_sql() via DuckDB (order-insensitive).

Usage: python scripts/driver_sim.py [sf_dir] [key ...]
"""

import hashlib
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import duckdb  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as mod  # noqa: E402

sys.path.insert(0, os.path.join(REPO, "tests"))
from parity import canonical_rows  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

spark = (
    SparkSession.builder.master("local[8]")
    .appName("driver-sim")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

con = duckdb.connect()
for name in ("region nation customer supplier part orders lineitem events documents embeddings").split():
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{SF_DIR}/{name}.parquet')")

# t1 smoke
t0 = time.time()
edf = mod.entry(spark)
erows = edf.collect()
print(f"t1 smoke: entry() -> {len(erows)} rows, schema={[f.name for f in edf.schema]}  ({time.time()-t0:.1f}s)")
assert len(erows) > 0

queries, oracles = mod.queries(), mod.oracle_sql()
results = {}
for key in sorted(queries):
    if ONLY and key not in ONLY:
        continue
    t0 = time.time()
    try:
        spdf = queries[key](spark, SF_DIR).toPandas()
        if key in oracles:
            ddf = con.execute(oracles[key]).fetchdf()
            ok_cols = sorted(spdf.columns) == sorted(ddf.columns)
            ok_rows = len(spdf) == len(ddf)
            sh = hashlib.sha256(repr(canonical_rows(spdf)).encode()).hexdigest()[:12]
            dh = hashlib.sha256(repr(canonical_rows(ddf)).encode()).hexdigest()[:12]
            status = "MATCH" if (ok_cols and ok_rows and sh == dh) else "MISMATCH"
            results[key] = {"status": status, "rows": len(spdf), "sec": round(time.time() - t0, 2)}
            print(f"{status:8s} {key:36s} rows={len(spdf):<7d} hash {sh}{'==' if sh==dh else '!='}{dh} ({results[key]['sec']}s)")
        else:
            status = "ROWS_OK" if len(spdf) > 0 else "EMPTY"
            results[key] = {"status": status, "rows": len(spdf), "sec": round(time.time() - t0, 2)}
            print(f"{status:8s} {key:36s} rows={len(spdf):<7d} (rows-only) ({results[key]['sec']}s)")
    except Exception as e:
        results[key] = {"status": "ERROR", "error": str(e)[:200]}
        print(f"ERROR    {key:36s} {str(e)[:160]}")

bad = {k: v for k, v in results.items() if v["status"] not in ("MATCH", "ROWS_OK")}
print(json.dumps({"total": len(results), "bad": len(bad), "bad_keys": sorted(bad)}))
sys.exit(1 if bad else 0)
