"""Quantized Lloyd k-means over an embedding column.

The iterative-training shape the reference's pipeline lacks: each
iteration is one streaming pass — the k-row centroid table (already
driver-resident: that collect is the textbook Lloyd loop, not a data
collect) ships back as a LITERAL array expression, the per-vector
argmin is a per-row ``array_min`` over it (no join, no exchange —
optimization r11: the earlier crossJoin + groupBy(vid) argmin
shuffled every vector's qv array once per iteration), and the
centroid update aggregates k×d cells map-side-combined. At 100 TB
the per-iteration cost is that single pass; no vector-sized shuffle
exists anywhere in the loop.

Determinism contract (what makes the key hash-checkable against
DuckDB): embeddings are quantized to a 1e-3 integer grid with
``floor(x*1000 + 0.5)`` (floor is exact; the scale/add are single
IEEE ops, identical in both engines — avoids round()'s engine-specific
midpoint modes). On that grid every distance is an exact int64, the
argmin tie-breaks on centroid id, and centroid updates re-quantize
with the same floor trick, so both engines walk bit-identical
iterations. Clusters that lose all members drop out (documented; k
stays ≥1 because every vector has a nearest centroid).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _quantize(vec_col: str, grid: int) -> F.Column:
    return F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * float(grid) + F.lit(0.5)).cast("bigint"),
    )


def _sq_dist(a: str | F.Column, b: str | F.Column) -> F.Column:
    """Exact squared L2 distance between two int64-grid arrays."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(ca, cb, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


def _lit_centroid_arrays(
    centroids: list[tuple[int, list[int]]],
) -> tuple[F.Column, F.Column]:
    """The k-row centroid table as TWO parallel nested-list literal
    columns ``(ids array<bigint>, vectors array<array<bigint>>)``.
    The Lloyd driver loop already holds the centroids in Python (that
    collect IS the algorithm), so shipping them back as literals
    instead of a broadcast DataFrame lets the argmin run per-row with
    no join and no exchange. Each literal is ONE Literal node —
    building the same table from per-value ``F.lit`` + ``F.struct``
    composition produced a ~4,000-node expression tree whose
    ANALYSIS alone cost ~1.2 s per iteration query (measured; the
    whole point of the rewrite is to spend that nowhere)."""
    ids = F.lit([cl for cl, _ in centroids]).cast("array<bigint>")
    vecs = F.lit([cv for _, cv in centroids]).cast("array<array<bigint>>")
    return ids, vecs


def kmeans_train(
    spark: SparkSession,
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 3,
    grid: int = 1000,
) -> DataFrame:
    """Train quantized k-means; return (centroid_id, n_members, wss).

    Init = the k vectors with the smallest ids (deterministic, matches
    the oracle's ``WHERE vec_id < k``). ``wss`` is the exact-integer
    within-cluster sum of squared grid distances after the final
    assignment.
    """
    final = kmeans_assignments(
        spark, vectors, id_col, vec_col, k=k, iters=iters, grid=grid
    )
    return final.groupBy(F.col("cl").alias("centroid_id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_members"),
        F.sum("dist").cast("bigint").alias("wss"),
    )


def kmeans_assignments(
    spark: SparkSession,
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 3,
    grid: int = 1000,
) -> DataFrame:
    """Train quantized k-means and return the FINAL per-vector
    assignment ``(vid, cl, dist, qv)`` — the building block for
    cluster-aware curation operators (SemDeDup-style dedup, stratified
    refresh). Same determinism contract as :func:`kmeans_train`."""
    from delta_lake_play_spark.functions.fanout import fan_out

    # fan_out BEFORE the quantize/argmin maps: with the assignment
    # fully map-side, a single-file local scan would otherwise run
    # every Lloyd pass on one core (functions/fanout.py; no-op on
    # multi-split inputs).
    q = (
        fan_out(
            vectors.select(F.col(id_col).alias("vid"), F.col(vec_col)),
            "vid",
        )
        .select("vid", _quantize(vec_col, grid).alias("qv"))
        .persist()
    )

    centroids = [
        (int(r["vid"]), list(r["qv"]))
        for r in q.filter(F.col("vid") < k).collect()
    ]

    def assign(cents: list[tuple[int, list[int]]]) -> DataFrame:
        # Per-row argmin over the k centroids as a LITERAL array
        # expression (optimization r11): the previous crossJoin +
        # groupBy(vid).agg(min(struct(dist, cl, qv))) shuffled the
        # ENTIRE corpus — k rows per vector, each carrying the full
        # d-dim qv array — once per Lloyd iteration plus once for the
        # final assignment, only to merge candidates that were never
        # split across partitions in the first place. array_min over
        # struct(dist, cl) is the identical (dist, then cl) tie-break
        # with zero exchanges.
        ids, vecs = _lit_centroid_arrays(cents)
        best = F.array_min(
            F.zip_with(
                vecs,
                ids,
                lambda cv, cl: F.struct(
                    _sq_dist(F.col("qv"), cv).alias("dist"),
                    cl.alias("cl"),
                ),
            )
        )
        return q.withColumn("b", best).select(
            "vid",
            F.col("b.cl").alias("cl"),
            F.col("b.dist").alias("dist"),
            "qv",
        )

    for _ in range(iters):
        assigned = assign(centroids)
        cells = (
            assigned.select("cl", F.posexplode("qv").alias("d", "val"))
            .groupBy("cl", "d")
            .agg(
                F.floor(
                    F.sum("val") * F.lit(1.0) / F.count(F.lit(1)) + F.lit(0.5)
                )
                .cast("bigint")
                .alias("c")
            )
            .collect()
        )
        by_cl: dict[int, dict[int, int]] = {}
        for r in cells:
            by_cl.setdefault(int(r["cl"]), {})[int(r["d"])] = int(r["c"])
        centroids = [
            (cl, [dims[d] for d in sorted(dims)]) for cl, dims in sorted(by_cl.items())
        ]

    final = assign(centroids)
    q.unpersist()
    return final
