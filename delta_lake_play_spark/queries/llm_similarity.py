"""Similarity search over the ``embeddings`` table (SURVEY.md §2.12):
embedding-cosine near-dup pairs, brute-force top-k ANN baseline, and
an IVF-style cell-restricted variant as the scale path.

All vector math is JVM-side (``zip_with`` + ``aggregate`` folds from
``functions/vectors.py``) in double precision, so cosines are
bit-identical to DuckDB's ``list_reduce`` twin: both engines fold the
same doubles left-to-right with the same IEEE ops. That makes even
the top-k *ranking* oracle-checkable (ties broken by vec_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from delta_lake_play_spark.functions.vectors import cosine_sim
from delta_lake_play_spark.registry import register
from delta_lake_play_spark.sources.catalog import load_table


def _sql_cos(da: str, db: str) -> str:
    """DuckDB cosine twin of ``vectors.cosine_sim`` (same fold order:
    left-to-right over the arrays, accumulate in double)."""
    dot = (
        f"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(range(1, len({da})+1), i -> {da}[i]*{db}[i])), (acc,x) -> acc+x)"
    )
    norm_a = f"sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform({da}, x -> x*x)), (acc,x) -> acc+x))"
    norm_b = f"sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform({db}, x -> x*x)), (acc,x) -> acc+x))"
    return f"({dot} / ({norm_a} * {norm_b}))"


# --- llm_dedup_embedding_cosine -------------------------------------------

_COS_THRESHOLD = 0.3

# Composite blocking key (r8, VERDICT r7 "What's wrong #2"): label
# alone is a FIXED 10-value key, so block population grows ∝ n and
# within-block pair enumeration ∝ n² (sf1 measured 329× wall for 10×
# data). The second component is a hyperplane-sign bucket whose plane
# count p follows an integer ladder on the corpus size (p = min one
# with n ≤ base·2^p, capped), so the composite cardinality grows with
# n and expected block population stays in [base/2, base] by
# construction. Bucket assignment is a narrow per-row map of p
# dot-products — O(n·log n), never the O(n·cells) assign that made a
# linearly-grown IVF centroid set quadratic (the r7 lesson). At the
# driver fixtures (n ≤ 5000) p = 0 and the pair set is byte-identical
# to the label-only blocking. Missed cross-bucket pairs are the
# standard LSH recall trade: two vectors at angle θ share all p signs
# with probability (1 − θ/π)^p.
_EMB_BLOCK_BASE = 5000
_EMB_MAX_PLANES = 16
_EMB_DIMS = 64


def _emb_bucket_ladder_sql(cnt_expr: str, base: int = _EMB_BLOCK_BASE) -> str:
    """Integer CASE ladder mirroring ``scaled_sign_planes`` exactly —
    no floating log2 on either engine."""
    arms = []
    cap = base
    for p in range(_EMB_MAX_PLANES + 1):
        arms.append(f"WHEN {cnt_expr} <= {cap} THEN {p}")
        cap *= 2
    return "CASE " + " ".join(arms) + f" ELSE {_EMB_MAX_PLANES} END"


def _sign_bucket_ctes(
    base: int = _EMB_BLOCK_BASE,
    vb_cols: str = "v.vec_id, v.label, v.de",
    cnt_source: str = "embeddings",
) -> str:
    """Shared SQL CTE fragment ``np, pl, buckets, vb`` computing the
    corpus-scaled hyperplane-sign bucket per vector; expects a prior
    CTE ``v`` carrying at least ``vec_id`` and ``de``. Mirrors
    ``with_emb_bucket`` / ``knn_join``'s bucket assignment exactly
    (same ladder, same planes, same fold order); composed by the
    embedding-cosine, dedup-clusters, keep-best, knn-join and
    hard-negative oracles so one definition can never drift from
    another."""
    from delta_lake_play_spark.operators.similarity import lsh_planes

    planes = lsh_planes(_EMB_DIMS, _EMB_MAX_PLANES)
    plane_rows = ", ".join(
        f"({p}, [{', '.join(repr(x) for x in w)}]::DOUBLE[])"
        for p, w in enumerate(planes)
    )
    dot = (
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(range(1, {_EMB_DIMS}+1), i -> v.de[i] * pl.w[i])), "
        "(acc, x) -> acc + x)"
    )
    ladder = _emb_bucket_ladder_sql(f"(SELECT count(*) FROM {cnt_source})", base)
    return f"""np AS (SELECT {ladder} AS n_planes),
pl(p, w) AS (VALUES {plane_rows}),
buckets AS (
  SELECT v.vec_id,
         CAST(SUM(CASE WHEN pl.p < (SELECT n_planes FROM np) AND {dot} > 0
                       THEN (1 << pl.p) ELSE 0 END) AS BIGINT) AS bucket
  FROM v CROSS JOIN pl
  GROUP BY v.vec_id
),
vb AS (SELECT {vb_cols}, b.bucket
       FROM v JOIN buckets b USING (vec_id))"""


def _emb_bucket_ctes() -> str:
    """Label-composite variant of :func:`_sign_bucket_ctes` (the
    historical name its three oracles compose)."""
    return _sign_bucket_ctes()


def with_emb_bucket(e: DataFrame) -> DataFrame:
    """Spark twin of ``_emb_bucket_ctes``: adds the corpus-scaled
    sign-bucket column ``__bkt`` (one parquet-footer ``count()`` picks
    the plane count; the assignment is a narrow per-row map)."""
    from delta_lake_play_spark.operators.similarity import (
        hyperplane_bucket,
        lsh_planes,
        scaled_sign_planes,
    )

    p = scaled_sign_planes(e.count(), _EMB_BLOCK_BASE, _EMB_MAX_PLANES)
    bucket = (
        hyperplane_bucket("embedding", lsh_planes(_EMB_DIMS, p))
        if p
        else F.lit(0).cast("long")
    )
    return e.withColumn("__bkt", bucket)


def _emb_dedup_oracle() -> str:
    return f"""
WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS de FROM embeddings),
{_emb_bucket_ctes()}
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label,
       {_sql_cos('a.de', 'b.de')} AS cos_sim
FROM vb a JOIN vb b
  ON a.label = b.label AND a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE {_sql_cos('a.de', 'b.de')} >= {_COS_THRESHOLD}
"""


@register("llm_dedup_embedding_cosine", oracle=_emb_dedup_oracle())
def llm_dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs: cosine ≥ threshold within a
    COMPOSITE blocking key — the precomputed cluster label × a
    corpus-scaled hyperplane-sign bucket. The self-join shuffles on
    the composite key; because the bucket count grows with n (see
    ``_EMB_BLOCK_BASE`` ladder above), within-block pair enumeration
    is bounded per block and total work stays linear in the corpus —
    the shape that keeps this tractable at 10⁹ vectors. One
    parquet-footer ``count()`` picks the plane count; the assignment
    itself is a narrow per-row map (no join, no shuffle, no window).

    Library form: ``operators/similarity.py::blocked_pairs`` +
    ``scaled_sign_planes`` + ``hyperplane_bucket``."""
    from delta_lake_play_spark.operators.similarity import blocked_pairs

    e = load_table(spark, sf_dir, "embeddings")
    e2 = with_emb_bucket(e)
    return blocked_pairs(
        e2, "vec_id", "embedding", ["label", "__bkt"], _COS_THRESHOLD
    ).select(
        F.col("__a").alias("vec_a"),
        F.col("__b").alias("vec_b"),
        F.col("label"),
        F.col("__cos").alias("cos_sim"),
    )


# --- llm_similarity_topk (brute-force baseline) ---------------------------

_N_QUERIES = 10
_TOP_K = 3

_TOPK_ORACLE = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS de FROM embeddings),
q AS (SELECT vec_id AS query_id, de AS dq FROM v WHERE vec_id < {_N_QUERIES}),
c AS (SELECT vec_id AS neighbor_id, de AS dc FROM v WHERE vec_id >= {_N_QUERIES}),
scored AS (
  SELECT query_id, neighbor_id, {_sql_cos('dq', 'dc')} AS cos_sim
  FROM q CROSS JOIN c
)
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT query_id, neighbor_id, cos_sim,
         row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= {_TOP_K}
"""


@register("llm_similarity_topk", oracle=_TOPK_ORACLE)
def llm_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k per query vector — the exact-recall
    ANN baseline. The small query set broadcasts, so the candidate
    side streams through one scan with no shuffle of the big table;
    ranking is a per-query-partition window (k rows kept per query).
    Scale path: ``llm_similarity_ivf`` restricts candidates to the
    query's cell.

    Library form: ``operators/similarity.py::cosine_topk``."""
    from delta_lake_play_spark.operators.similarity import cosine_topk

    e = load_table(spark, sf_dir, "embeddings")
    return cosine_topk(
        corpus=e.where(F.col("vec_id") >= _N_QUERIES),
        queries=e.where(F.col("vec_id") < _N_QUERIES),
        id_col="vec_id",
        vec_col="embedding",
        k=_TOP_K,
    )


# --- llm_similarity_ivf (cell-restricted scale path) ----------------------

# Deterministic centroid set: every stride-th vec_id, where
# stride = max(50, ceil(n/100)) — i.e. the cell COUNT caps at ~100
# regardless of corpus size. The r7 sf1 anchor caught the original
# fixed stride (50) growing the centroid set LINEARLY with the
# corpus, which makes the broadcast assign O(n·cells·dim) = O(n²)
# — 121× wall for 10× data. A capped nlist keeps assign and probe
# both linear; at the driver fixtures (n ≤ 5000) the stride floor
# reproduces the original cell layout exactly.
_IVF_MIN_STRIDE = 50
_IVF_MAX_CELLS = 100
_IVF_STRIDE_SQL = (
    f"(SELECT GREATEST({_IVF_MIN_STRIDE}, "
    f"CAST(ceil(count(*) / {_IVF_MAX_CELLS}.0) AS BIGINT)) FROM v)"
)


def _ivf_stride(df: DataFrame) -> int:
    """max(50, ceil(n/100)) — the Spark twin of ``_IVF_STRIDE_SQL``.
    One parquet-footer count; the result is a plan literal."""
    n = df.count()
    return max(_IVF_MIN_STRIDE, -(-n // _IVF_MAX_CELLS))


_IVF_ORACLE = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS de FROM embeddings),
cent AS (SELECT vec_id AS centroid_id, de AS dcent FROM v WHERE vec_id % {_IVF_STRIDE_SQL} = 0),
assign AS (
  SELECT vec_id, centroid_id FROM (
    SELECT v.vec_id, cent.centroid_id,
           row_number() OVER (
             PARTITION BY v.vec_id
             ORDER BY {_sql_cos('v.de', 'cent.dcent')} DESC, cent.centroid_id
           ) AS rn
    FROM v CROSS JOIN cent
  ) WHERE rn = 1
),
q AS (SELECT v.vec_id AS query_id, v.de AS dq, a.centroid_id
      FROM v JOIN assign a ON v.vec_id = a.vec_id WHERE v.vec_id < {_N_QUERIES}),
c AS (SELECT v.vec_id AS neighbor_id, v.de AS dc, a.centroid_id
      FROM v JOIN assign a ON v.vec_id = a.vec_id WHERE v.vec_id >= {_N_QUERIES}),
scored AS (
  SELECT q.query_id, c.neighbor_id, q.centroid_id, {_sql_cos('q.dq', 'c.dc')} AS cos_sim
  FROM q JOIN c ON q.centroid_id = c.centroid_id
)
SELECT query_id, neighbor_id, centroid_id, cos_sim, rank FROM (
  SELECT query_id, neighbor_id, centroid_id, cos_sim,
         row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= {_TOP_K}
"""


@register("llm_similarity_ivf", oracle=_IVF_ORACLE)
def llm_similarity_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style approximate top-k: assign every vector to its
    nearest centroid as a narrow per-row fold over the literal
    centroid array (no join, no window, no Exchange — see
    ``operators/similarity.py::ivf_assign``), then search only the
    query's cell.

    Per-query work drops from O(n) to O(n / cells); recall is
    traded for that speedup exactly as in a FAISS IVF index. The
    cell join shuffles on centroid_id — at scale you'd pre-partition
    (bucket) the corpus by cell so probes are shuffle-free.

    Library form: ``operators/similarity.py::ivf_topk``."""
    from delta_lake_play_spark.operators.similarity import ivf_topk

    e = load_table(spark, sf_dir, "embeddings")
    return ivf_topk(
        corpus=e.where(F.col("vec_id") >= _N_QUERIES),
        queries=e.where(F.col("vec_id") < _N_QUERIES),
        centroids=e.where(F.col("vec_id") % _ivf_stride(e) == 0),
        id_col="vec_id",
        vec_col="embedding",
        k=_TOP_K,
    )


# --- llm_similarity_lsh (hyperplane-sign bucketed scale path) --------------

_LSH_PLANES = 6
_LSH_DIMS = 64  # embeddings.embedding is fixed 64-dim across SFs


def _lsh_oracle() -> str:
    from delta_lake_play_spark.operators.similarity import lsh_planes

    planes = lsh_planes(_LSH_DIMS, _LSH_PLANES)
    plane_rows = ", ".join(
        f"({p}, [{', '.join(repr(x) for x in w)}]::DOUBLE[])"
        for p, w in enumerate(planes)
    )
    dot = (
        "list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
        f"list_transform(range(1, {_LSH_DIMS}+1), i -> v.de[i] * pl.w[i])), "
        "(acc, x) -> acc + x)"
    )
    return f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS de FROM embeddings),
pl(p, w) AS (VALUES {plane_rows}),
dots AS (SELECT v.vec_id, pl.p, {dot} AS d FROM v CROSS JOIN pl),
buckets AS (
  SELECT vec_id, CAST(SUM(CASE WHEN d > 0 THEN (1 << p) ELSE 0 END) AS BIGINT) AS bucket
  FROM dots GROUP BY vec_id
),
q AS (SELECT v.vec_id AS query_id, v.de AS dq, b.bucket
      FROM v JOIN buckets b USING (vec_id) WHERE vec_id < {_N_QUERIES}),
c AS (SELECT v.vec_id AS neighbor_id, v.de AS dc, b.bucket
      FROM v JOIN buckets b USING (vec_id) WHERE vec_id >= {_N_QUERIES}),
scored AS (
  SELECT q.query_id, c.neighbor_id, q.bucket, {_sql_cos('q.dq', 'c.dc')} AS cos_sim
  FROM q JOIN c ON q.bucket = c.bucket
)
SELECT query_id, neighbor_id, bucket, cos_sim, rank FROM (
  SELECT query_id, neighbor_id, bucket, cos_sim,
         row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= {_TOP_K}
"""


@register("llm_similarity_lsh", oracle=_lsh_oracle())
def llm_similarity_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-sign LSH approximate top-k — the trainingless
    sibling of ``llm_similarity_ivf``: 6 deterministic hyperplanes
    give a 64-bucket key as a narrow per-row map (no centroid set,
    no assignment pass), and exact cosine ranking runs only inside
    the query's bucket. Candidate volume per query is
    O(n / 2^planes); the bucket join shuffles the corpus once on the
    bucket key.

    Library form: ``operators/similarity.py::lsh_topk``."""
    from delta_lake_play_spark.operators.similarity import lsh_topk

    e = load_table(spark, sf_dir, "embeddings")
    return lsh_topk(
        corpus=e.where(F.col("vec_id") >= _N_QUERIES),
        queries=e.where(F.col("vec_id") < _N_QUERIES),
        id_col="vec_id",
        vec_col="embedding",
        n_planes=_LSH_PLANES,
        k=_TOP_K,
        dims=_LSH_DIMS,  # fixed by the fixture schema — skips the
        # one-row driver action the None fallback pays (guide §7.3)
    )


# --- llm_embedding_quantize -----------------------------------------------

_QUANT_LEVELS = 64  # floor-quantize to [-64, 64] — floor is the only
# rounding both engines define identically at .5 boundaries

_QUANT_ORACLE = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS de FROM embeddings),
m AS (
  SELECT vec_id, de,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(de, x -> abs(x))),
                     (acc, x) -> greatest(acc, x)) AS max_abs
  FROM v
)
SELECT vec_id, max_abs,
       array_to_string(
         list_transform(de, x -> coalesce(
           CAST(CAST(floor(x * {_QUANT_LEVELS} / max_abs) AS BIGINT) AS VARCHAR),
           'null')),
         ',') AS q
FROM m
"""


@register("llm_embedding_quantize", oracle=_QUANT_ORACLE)
def llm_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8-style embedding quantization: per-vector max-abs scale,
    floor to [-LEVELS, LEVELS] — 4× smaller vectors for the ANN index
    with recall traded per the usual quantization curve. Floor (not
    round) so both engines agree at .5 boundaries; the scale factor
    is an exact fold, so quantized codes are bit-identical.

    The code list is rendered to a CSV string (repo convention,
    queries/aggregates.py collect_list) because the driver's value
    hash cannot canonicalize raw array columns — the r5 ERR. A NULL
    code (zero-norm vector via try_divide) renders as the literal
    'null' on both engines so nothing is silently skipped by the
    joiner."""
    e = load_table(spark, sf_dir, "embeddings")
    de = F.col("embedding").cast("array<double>")
    max_abs = F.aggregate(
        F.transform(de, lambda x: F.abs(x)),
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, x),
    )
    base = e.select("vec_id", de.alias("de"), max_abs.alias("max_abs"))
    # try_divide: a zero vector has max_abs = 0; DuckDB's x/0 is NULL
    # (→ all-NULL codes) while ANSI Spark would raise DIVIDE_BY_ZERO.
    # F.floor on DOUBLE yields LONG, matching the oracle's BIGINT cast,
    # so both engines stringify codes identically ("-64", not "-64.0").
    q = F.concat_ws(
        ",",
        F.transform(
            F.col("de"),
            lambda x: F.coalesce(
                F.floor(F.try_divide(x * _QUANT_LEVELS, F.col("max_abs")))
                .cast("string"),
                F.lit("null"),
            ),
        ),
    )
    return base.select("vec_id", "max_abs", q.alias("q"))


# --- llm_kmeans_train (iterative Lloyd on the exact integer grid) ---------

_KMEANS_K = 8
_KMEANS_ITERS = 3


def _kmeans_cte_prefix(k: int, iters: int) -> str:
    """Unrolled Lloyd iterations as a DuckDB ``WITH`` prefix ending in
    CTE ``fin`` = final per-vector assignment (vec_id, qv, cl, dist).
    Same arithmetic as the Spark side: 1e-3 floor-quantized grid,
    exact int64 distances via the dot-product identity, argmin
    tie-broken on centroid id, centroid update re-quantized with the
    same floor(x+0.5). Shared by the kmeans and semdedup oracles."""

    def assign(a: str, c: str) -> str:
        dist = (
            f"CAST(list_dot_product(q.qv, q.qv) - 2*list_dot_product(q.qv, {c}.cv)"
            f" + list_dot_product({c}.cv, {c}.cv) AS BIGINT)"
        )
        return (
            f"{a} AS (SELECT vec_id, qv, cl, dist FROM ("
            f"SELECT q.vec_id, q.qv, {c}.cl, {dist} AS dist, "
            f"row_number() OVER (PARTITION BY q.vec_id ORDER BY {dist}, {c}.cl) AS rn "
            f"FROM q, {c}) WHERE rn = 1)"
        )

    def update(c: str, a: str) -> str:
        return (
            f"{c} AS (SELECT cl, list(c ORDER BY d) AS cv FROM ("
            f"SELECT cl, d, CAST(floor(SUM(val)*1.0/COUNT(*) + 0.5) AS BIGINT) AS c "
            f"FROM (SELECT cl, unnest(qv) AS val, generate_subscripts(qv, 1) AS d FROM {a}) "
            f"GROUP BY cl, d) GROUP BY cl)"
        )

    ctes = [
        "q AS (SELECT vec_id, list_transform(embedding, "
        "x -> CAST(floor(CAST(x AS DOUBLE)*1000.0 + 0.5) AS BIGINT)) AS qv FROM embeddings)",
        f"c0 AS (SELECT vec_id AS cl, qv AS cv FROM q WHERE vec_id < {k})",
    ]
    for i in range(iters):
        ctes.append(assign(f"a{i + 1}", f"c{i}"))
        ctes.append(update(f"c{i + 1}", f"a{i + 1}"))
    ctes.append(assign("fin", f"c{iters}"))
    return "WITH " + ",\n".join(ctes) + "\n"


def _kmeans_oracle(k: int = _KMEANS_K, iters: int = _KMEANS_ITERS) -> str:
    return (
        _kmeans_cte_prefix(k, iters)
        + "SELECT cl AS centroid_id, CAST(COUNT(*) AS BIGINT) AS n_members, "
        "CAST(SUM(dist) AS BIGINT) AS wss FROM fin GROUP BY cl"
    )


@register("llm_kmeans_train", oracle=_kmeans_oracle())
def llm_kmeans_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative k-means training (3 Lloyd rounds, k=8) over the
    embedding corpus — the iterative-algorithm class: per iteration
    one broadcast of the k-row centroid table, one streaming
    assignment pass with a map-side-combined argmin, one k×d-cell
    centroid aggregate; only the centroid matrix is collected
    (O(k·d), the Lloyd driver loop). Exact-integer grid arithmetic
    makes every iteration bit-identical to the unrolled DuckDB CTE
    oracle — a hash-checked iterative algorithm, not rows-only."""
    from delta_lake_play_spark.operators.kmeans import kmeans_train

    e = load_table(spark, sf_dir, "embeddings")
    return kmeans_train(
        spark, e, "vec_id", "embedding", k=_KMEANS_K, iters=_KMEANS_ITERS
    )


# --- llm_semdedup (cluster-then-drop-near-representative dedup) -----------

# SemDeDup shape (Abbas et al. 2023, arXiv:2303.09540): cluster the
# embedding space, keep one representative per cluster, and drop the
# members semantically CLOSE to it — cheap O(n·k) clustering replaces
# the O(n²) pairwise sweep, and the per-cluster compare is against one
# representative, not all pairs.
_SEMDEDUP_TAU = 1_600_000  # squared 1e-3-grid distance; see docstring


def _semdedup_oracle(
    k: int = _KMEANS_K, iters: int = _KMEANS_ITERS, tau: int = _SEMDEDUP_TAU
) -> str:
    return (
        _kmeans_cte_prefix(k, iters)
        + f"""
, ranked AS (
  SELECT vec_id, qv, cl, dist,
         row_number() OVER (PARTITION BY cl ORDER BY dist, vec_id) AS rn
  FROM fin
),
reps AS (
  SELECT cl, vec_id AS rep_id, qv AS rep_qv FROM ranked WHERE rn = 1
)
SELECT r.vec_id, r.cl AS centroid_id, reps.rep_id,
       CAST(list_dot_product(r.qv, r.qv)
            - 2*list_dot_product(r.qv, reps.rep_qv)
            + list_dot_product(reps.rep_qv, reps.rep_qv) AS BIGINT)
         AS dist_to_rep,
       (r.rn = 1 OR
        CAST(list_dot_product(r.qv, r.qv)
             - 2*list_dot_product(r.qv, reps.rep_qv)
             + list_dot_product(reps.rep_qv, reps.rep_qv) AS BIGINT)
          > {tau}) AS kept
FROM ranked r JOIN reps ON r.cl = reps.cl
"""
    )


@register("llm_semdedup", oracle=_semdedup_oracle())
def llm_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup: k-means the embeddings (same
    deterministic quantized Lloyd as ``llm_kmeans_train``), pick the
    centroid-closest vector as each cluster's representative
    (tie-broken on vec_id), and drop every member whose exact-grid
    squared distance to ITS representative is ≤ tau. Keeps the
    representative and the far-from-representative members — the
    "semantic duplicates" near the representative go.

    Scale shape: clustering is O(n·k) streaming passes; the rep
    compare is one broadcast join of k rows; nothing pairwise. The
    whole chain stays on the 1e-3 integer grid, so Spark and the
    unrolled DuckDB CTE oracle are bit-identical — a hash-checked
    end-to-end curation composite."""
    from delta_lake_play_spark.operators.kmeans import (
        _sq_dist,
        kmeans_assignments,
    )

    e = load_table(spark, sf_dir, "embeddings")
    # persisted: the assignment pass feeds both the representative
    # aggregate and the member join below — unpersisted it would run
    # the whole final Lloyd assignment twice (optimization r12).
    fin = kmeans_assignments(
        spark, e, "vec_id", "embedding", k=_KMEANS_K, iters=_KMEANS_ITERS
    ).persist()
    # Representative per cluster as a K-ROW map-side-combined
    # aggregate instead of a corpus-wide row_number window
    # (optimization r12: the window cost a full (cl) exchange + sort
    # of every member row to extract k winners). min over
    # struct(dist IS NULL, dist, vid, qv) is the identical ordering:
    # the leading boolean reproduces asc_nulls_last (a NULL-embedding
    # vector must not become the representative — Spark's window
    # default is NULLS FIRST, DuckDB's is NULLS LAST), ties fall to
    # vid, and qv can never decide (vid is unique) — it just rides
    # along so no join-back is needed.
    rep_rank = F.struct(
        F.col("dist").isNull().alias("dn"),
        F.col("dist").alias("dist"),
        F.col("vid").alias("vid"),
        F.col("qv").alias("qv"),
    )
    reps = fin.groupBy(F.col("cl").alias("rep_cl")).agg(
        F.min(rep_rank).alias("r")
    ).select(
        "rep_cl",
        F.col("r.vid").alias("rep_id"),
        F.col("r.qv").alias("rep_qv"),
    )
    joined = fin.join(
        F.broadcast(reps), fin.cl == reps.rep_cl
    ).withColumn("dist_to_rep", _sq_dist("qv", "rep_qv"))
    # kept: rn == 1 ⟺ this member IS the representative (vid unique)
    return joined.select(
        F.col("vid").alias("vec_id"),
        F.col("cl").alias("centroid_id"),
        "rep_id",
        "dist_to_rep",
        (
            (F.col("vid") == F.col("rep_id"))
            | (F.col("dist_to_rep") > F.lit(_SEMDEDUP_TAU))
        ).alias("kept"),
    )


# --- llm_knn_join (large x large blocked k-NN join) ------------------------
# The shape `llm_similarity_topk` cannot express: EVERY vector is a
# query, so neither side of the join fits in a broadcast at corpus
# scale. Blocking is the corpus-scaled hyperplane-sign bucket with a
# SMALL population target (expected bucket population in
# [base/2, base] by the `scaled_sign_planes` ladder), so candidate
# scoring is Theta(n*base) — linear in the corpus — and the per-query
# ranking window moves exactly the scored candidate set. Reference
# parity: the reference exposes no similarity ops (149-LoC DML demo,
# api.py:55-107); this is a BASELINE.json:6 north-star extension.

_KNN_BLOCK_BASE = 250
_KNN_K = 3
_KNN_BUCKET_CAP = 500  # skew guard: salt-split buckets over this pop


def _knn_salt_ctes() -> str:
    """Shared salt-split fragment (mirrors ``knn_join``'s skew
    guard): per-bucket salt count s = ceil(pop/cap) by integer
    arithmetic, each row salted on vec_id % s. s = 1 at every driver
    fixture (pops ≤ cap), so the fixture pair set is the un-salted
    one."""
    return f"""salts AS (
  SELECT bucket, (count(*) + {_KNN_BUCKET_CAP - 1}) // {_KNN_BUCKET_CAP} AS s
  FROM vb GROUP BY bucket
),
vbs AS (
  SELECT vb.*, vb.vec_id % salts.s AS salt
  FROM vb JOIN salts USING (bucket)
)"""


def _knn_join_oracle(pred: str = "TRUE") -> str:
    """The knn-join oracle, optionally over a scoped slice (the
    recall harness bounds its exact-truth comparison); the plane
    ladder counts the SCOPED corpus, mirroring knn_join counting the
    DataFrame it is handed."""
    return f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS de FROM embeddings WHERE {pred}),
{_sign_bucket_ctes(_KNN_BLOCK_BASE, "v.vec_id, v.de", "v")},
{_knn_salt_ctes()},
scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
         {_sql_cos('a.de', 'b.de')} AS cos_sim
  FROM vbs a JOIN vbs b
    ON a.bucket = b.bucket AND a.salt = b.salt AND a.vec_id <> b.vec_id
)
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT query_id, neighbor_id, cos_sim,
         row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id) AS rank
  FROM scored
) WHERE rank <= {_KNN_K}
"""


@register("llm_knn_join", oracle=_knn_join_oracle())
def llm_knn_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate all-pairs k-NN join: every vector's top-k cosine
    neighbors within its corpus-scaled sign bucket — the SemDeDup /
    duplicate-graph / embedding-clustering front-end that needs
    neighbors for the WHOLE corpus, not a broadcast query set.

    Scale shape: bucket count grows with n (population bounded by the
    integer ladder), the self-join shuffles on the bucket id, and
    total scored candidates are Theta(n*base). Missed cross-bucket
    neighbors are the standard random-hyperplane recall trade,
    measured honestly by `llm_ann_recall`'s pattern.

    Library form: ``operators/similarity.py::knn_join``."""
    from delta_lake_play_spark.operators.similarity import knn_join

    e = load_table(spark, sf_dir, "embeddings")
    return knn_join(
        e, "vec_id", "embedding", k=_KNN_K, dims=_EMB_DIMS,
        block_base=_KNN_BLOCK_BASE, bucket_cap=_KNN_BUCKET_CAP,
    )


# --- llm_hard_negatives (retrieval-training negative mining) ---------------
# For training retrieval / reranker models: per query vector, the
# top-k most-similar vectors whose ground-truth label DIFFERS — the
# "hard negatives" that teach the model the decision boundary (random
# negatives are too easy). Same bucket blocking as the k-NN join, so
# mining the whole corpus stays linear; the label filter runs inside
# the block before ranking.

_NEG_K = 2


def _hard_negatives_oracle() -> str:
    return f"""
WITH v AS (SELECT vec_id, label, embedding::DOUBLE[] AS de FROM embeddings),
{_sign_bucket_ctes(_KNN_BLOCK_BASE, "v.vec_id, v.label, v.de")},
{_knn_salt_ctes()},
scored AS (
  SELECT a.vec_id AS query_id, a.label AS query_label,
         b.vec_id AS negative_id, b.label AS negative_label,
         {_sql_cos('a.de', 'b.de')} AS cos_sim
  FROM vbs a JOIN vbs b
    ON a.bucket = b.bucket AND a.salt = b.salt AND a.label <> b.label
)
SELECT query_id, query_label, negative_id, negative_label, cos_sim, rank FROM (
  SELECT query_id, query_label, negative_id, negative_label, cos_sim,
         row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, negative_id) AS rank
  FROM scored
) WHERE rank <= {_NEG_K}
"""


@register("llm_hard_negatives", oracle=_hard_negatives_oracle())
def llm_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for retrieval training data: per query,
    the top-k highest-cosine DIFFERENT-label vectors in its sign
    bucket (similar-but-not-relevant — the examples that move a
    contrastive loss). NULL labels never satisfy the inequality on
    either engine, so unlabeled rows produce no negatives.

    One call to the generalized ``knn_join`` (same bucket blocking,
    skew salt, under-split guard): the label rides along as a carry
    column and the inequality is a pre-rank pair filter, so no
    post-ranking re-filter can under-fill the k slots."""
    from delta_lake_play_spark.operators.similarity import knn_join

    e = load_table(spark, sf_dir, "embeddings")
    return knn_join(
        e,
        "vec_id",
        "embedding",
        k=_NEG_K,
        dims=_EMB_DIMS,
        block_base=_KNN_BLOCK_BASE,
        bucket_cap=_KNN_BUCKET_CAP,
        carry=("label",),
        pair_filter="query_label <> neighbor_label",
    ).select(
        "query_id",
        "query_label",
        F.col("neighbor_id").alias("negative_id"),
        F.col("neighbor_label").alias("negative_label"),
        "cos_sim",
        "rank",
    )
