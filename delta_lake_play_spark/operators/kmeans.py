"""Quantized Lloyd k-means over an embedding column.

The iterative-training shape the reference's pipeline lacks: each
iteration is one broadcast join + one map-side-combined aggregate over
the vectors; only the k×d centroid matrix ever reaches the driver
(that collect is the textbook Lloyd loop, not a data collect). At
100 TB the per-iteration cost is a single streaming pass — no
vector-sized shuffle: the k-row centroid table broadcasts, the
per-vector argmin partials combine map-side, and the centroid update
aggregates k×d cells.

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
from pyspark.sql import types as T


def _quantize(vec_col: str, grid: int) -> F.Column:
    return F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * float(grid) + F.lit(0.5)).cast("bigint"),
    )


def _sq_dist(a: str, b: str) -> F.Column:
    """Exact squared L2 distance between two int64-grid arrays."""
    return F.aggregate(
        F.zip_with(F.col(a), F.col(b), lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )


_CENTROID_SCHEMA = T.StructType(
    [
        T.StructField("cl", T.LongType()),
        T.StructField("cv", T.ArrayType(T.LongType())),
    ]
)


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
    q = vectors.select(
        F.col(id_col).alias("vid"), _quantize(vec_col, grid).alias("qv")
    ).persist()

    centroids = [
        (int(r["vid"]), list(r["qv"]))
        for r in q.filter(F.col("vid") < k).collect()
    ]

    def assign(cdf: DataFrame) -> DataFrame:
        scored = q.crossJoin(F.broadcast(cdf)).withColumn(
            "dist", _sq_dist("qv", "cv")
        )
        best = scored.groupBy("vid").agg(
            F.min(F.struct(F.col("dist"), F.col("cl"), F.col("qv"))).alias("b")
        )
        return best.select(
            "vid",
            F.col("b.cl").alias("cl"),
            F.col("b.dist").alias("dist"),
            F.col("b.qv").alias("qv"),
        )

    for _ in range(iters):
        cdf = spark.createDataFrame(centroids, _CENTROID_SCHEMA)
        assigned = assign(cdf)
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

    final = assign(spark.createDataFrame(centroids, _CENTROID_SCHEMA))
    q.unpersist()
    return final
