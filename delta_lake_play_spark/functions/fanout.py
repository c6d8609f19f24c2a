"""Scale-adaptive parallelism restore for map-heavy pipelines.

The r11 optimization round moved several per-document computations
(minhash/simhash signatures, bigram chains, k-means quantization)
MAP-SIDE — no exchange before the first real aggregate. The trap
that surfaced immediately (guide §1.1: the "ideal" plan is usually
slower at first because of some gotcha): a narrow map INHERITS the
scan's partitioning, and a local single-file parquet scan is ONE
partition — so the pipeline's most expensive stage ran on one core
while 31 idled (interleaved A/B: near_dup_pairs 7.2 s old vs 35.9 s
map-side, every heavy stage showing ``(0 + 1) / 1``). The old
shapes' vocabulary/aggregate exchanges had been providing
parallelism as a SIDE EFFECT.

:func:`fan_out` restores the width conditionally: if the planned
input partition count is already >= the session's default
parallelism (any real multi-split table at scale), it is a NO-OP —
no exchange, the map-side win stands untouched. Only when the input
is narrower (the local single-file case, or a heavily coalesced
upstream) does it hash-repartition to the session width. The
partition count comes from ``sparkContext.defaultParallelism``, so
the driver's lower-core bench runs adapt with it — nothing is tuned
to local[32].

Hash-repartition on the id column, never round-robin: keyless
``repartition(n)`` pays a sort-before-repartition of its input
(SPARK-23207) and a deterministic key keeps task retries safe
(guide §2.5).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fan_out(df: DataFrame, key: str) -> DataFrame:
    """Hash-repartition ``df`` by ``key`` to the session's default
    parallelism IFF its planned partitioning is narrower — a no-op
    on any input that already arrives in enough splits."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, F.col(key))
