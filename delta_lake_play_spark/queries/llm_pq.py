"""Product-quantization ANN (SURVEY.md §2 EXT — similarity search).

``llm_similarity_pq`` completes the engine's ANN ladder (brute-force
cosine → LSH buckets → IVF cells → PQ codes): compressed-domain search
where every corpus vector is 4 one-byte codes and query distances are
M table lookups. See ``operators/pq.py`` for the algorithm and the
100 TB shape; this module carries the registry key and the unrolled
DuckDB oracle (same exact-integer-grid discipline as
``llm_kmeans_train`` — the full train/encode/search pipeline is
hash-checked, not rows-only).

Fixture contract: embeddings are 64-dim (FIXTURES.md), split 4×16.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from delta_lake_play_spark.registry import register
from delta_lake_play_spark.sources.catalog import load_table

_M = 4
_SUBDIM = 16
_KSUB = 8
_ITERS = 2
_TOPK = 20


def _pq_oracle(
    m: int = _M,
    subdim: int = _SUBDIM,
    k: int = _KSUB,
    iters: int = _ITERS,
    topk: int = _TOPK,
) -> str:
    """Unrolled PQ train/encode/ADC as DuckDB CTEs: same grid, same
    init (the k smallest ids per subspace), same (dist, code) argmin
    tie-break, same floor-requantized centroid update, same ADC sum."""

    def dist(a: str, b: str) -> str:
        return (
            f"CAST(list_dot_product({a}, {a}) - 2*list_dot_product({a}, {b})"
            f" + list_dot_product({b}, {b}) AS BIGINT)"
        )

    sub_slices = " UNION ALL ".join(
        f"SELECT vec_id, {mi} AS m, qv[{mi * subdim + 1}:{(mi + 1) * subdim}] AS sv FROM q"
        for mi in range(m)
    )

    def assign(a: str, c: str) -> str:
        d = dist("s.sv", f"{c}.cv")
        return (
            f"{a} AS (SELECT vec_id, m, sv, cl, dist FROM ("
            f"SELECT s.vec_id, s.m, s.sv, {c}.cl, {d} AS dist, "
            f"row_number() OVER (PARTITION BY s.vec_id, s.m "
            f"ORDER BY {d}, {c}.cl) AS rn "
            f"FROM sub s JOIN {c} ON s.m = {c}.m) WHERE rn = 1)"
        )

    def update(c: str, a: str) -> str:
        return (
            f"{c} AS (SELECT m, cl, list(c ORDER BY d) AS cv FROM ("
            f"SELECT m, cl, d, CAST(floor(SUM(val)*1.0/COUNT(*) + 0.5) AS BIGINT) AS c "
            f"FROM (SELECT m, cl, unnest(sv) AS val, generate_subscripts(sv, 1) AS d "
            f"FROM {a}) GROUP BY m, cl, d) GROUP BY m, cl)"
        )

    ctes = [
        "q AS (SELECT vec_id, list_transform(embedding, "
        "x -> CAST(floor(CAST(x AS DOUBLE)*1000.0 + 0.5) AS BIGINT)) AS qv "
        "FROM embeddings)",
        f"sub AS ({sub_slices})",
        # seed = the k smallest ACTUAL ids (not `vec_id < k`), matching
        # operators/pq.py — robust to filtered / non-zero-based corpora
        f"c0 AS (SELECT m, vec_id AS cl, sv AS cv FROM sub "
        f"WHERE vec_id IN (SELECT vec_id FROM q ORDER BY vec_id LIMIT {k}))",
    ]
    for i in range(iters):
        ctes.append(assign(f"a{i + 1}", f"c{i}"))
        ctes.append(update(f"c{i + 1}", f"a{i + 1}"))
    ctes.append(assign("enc", f"c{iters}"))
    ctes.append(
        "qsub AS (SELECT m, sv FROM sub "
        "WHERE vec_id = (SELECT min(vec_id) FROM q))"
    )
    ctes.append(
        f"lut AS (SELECT c.m, c.cl, {dist('qsub.sv', 'c.cv')} AS pdist "
        f"FROM c{iters} c JOIN qsub ON c.m = qsub.m)"
    )
    ctes.append(
        "adist AS (SELECT e.vec_id, CAST(SUM(l.pdist) AS BIGINT) AS adist "
        "FROM enc e JOIN lut l ON e.m = l.m AND e.cl = l.cl GROUP BY e.vec_id)"
    )
    return (
        "WITH " + ",\n".join(ctes) + "\n"
        "SELECT vec_id, adist, CAST(row_number() OVER "
        "(ORDER BY adist, vec_id) AS INTEGER) AS rnk "
        f"FROM adist ORDER BY adist, vec_id LIMIT {topk}"
    )


@register("llm_similarity_pq", oracle=_pq_oracle())
def llm_similarity_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ-compressed ANN: train 4×8 codebooks (2 Lloyd rounds, all
    subspaces in one pass per round), encode the corpus to 4 codes
    per vector, ADC-search against the min-id query vector via a
    broadcast 32-row lookup table, return the approximate top-20."""
    from delta_lake_play_spark.operators.pq import pq_adc_topk

    e = load_table(spark, sf_dir, "embeddings")
    return pq_adc_topk(
        spark,
        e,
        "vec_id",
        "embedding",
        n_sub=_M,
        ksub=_KSUB,
        iters=_ITERS,
        topk=_TOPK,
        dim=_M * _SUBDIM,  # fixed by the fixture schema (64) — skips
        # the one-row driver action the None fallback pays (§7.3)
    )
