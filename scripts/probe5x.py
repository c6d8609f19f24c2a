"""5x scale probe (SURVEY §10/§14.11 protocol): time the given
registry keys on alt-seed sf0.1 and sf0.5, min-of-2 runs each, and
print the ratio table. A key whose ratio is super-linear in the 5x
data growth needs a named story or a fix before it ships.

Usage: python scripts/probe5x.py key [key ...]
       (fixtures from scripts/gen_altdata.py at /tmp/altdata/sf0.{1,5})
"""

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession  # noqa: E402

from delta_lake_play_spark.registry import all_queries  # noqa: E402

KEYS = sys.argv[1:]
assert KEYS, "usage: probe5x.py key [key ...]"

spark = (
    SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    .appName("probe5x")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.driver.memory", os.environ.get("PROBE_DRIVER_MEM", "8g"))
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

queries = all_queries()


def run(key: str, sf_dir: str) -> tuple[float, int]:
    best = float("inf")
    for _ in range(2):  # min-of-2: absorbs JIT/fixture-build jitter
        t0 = time.time()
        df = queries[key](spark, sf_dir)
        n = df.count()
        best = min(best, time.time() - t0)
    return best, n


print(f"{'key':36s} {'sf0.1':>8s} {'sf0.5':>8s} {'ratio':>6s} rows@0.5")
for key in KEYS:
    t1, _ = run(key, "/tmp/altdata/sf0.1")
    t5, n5 = run(key, "/tmp/altdata/sf0.5")
    print(f"{key:36s} {t1:8.2f} {t5:8.2f} {t5 / t1:6.2f} {n5}")
