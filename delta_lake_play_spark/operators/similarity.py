"""Similarity search as reusable, parameterized operators.

Library form of the judged ``llm_similarity_*`` queries: cosine top-k
(exact) and IVF-style cell-restricted top-k (approximate) over any
``(id, array<float>)`` DataFrame.

All vector math is the JVM-side double-precision fold from
``functions/vectors.py`` — no Python in the scan loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from delta_lake_play_spark.functions.fanout import fan_out
from delta_lake_play_spark.functions.vectors import cosine_sim, dot, l2_norm

# Pair-scoring discipline (guide §2.3/§4: do per-ROW work once, not
# per PAIR): every join below pre-casts the vector to array<double>
# and precomputes its l2 norm in the per-side projection, so the
# per-pair expression is one dot fold + one multiply/divide instead
# of three interpreted HOF folds (dot + both norms) and two array
# casts. Bit-exact: the norm is a deterministic function of the
# vector, and the fold order inside dot/l2_norm is unchanged, so
# cos_sim produces the identical double (measured 2x on the scoring
# stage; oracle hashes unchanged).


def _cos_pre(va: str, vb: str, na: str, nb: str):
    """Cosine from a per-pair dot and two PREcomputed norms."""
    return F.try_divide(dot(va, vb), F.col(na) * F.col(nb))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
) -> DataFrame:
    """Exact top-k neighbors per query vector (brute force).

    The query set is broadcast, so the corpus streams through one
    scan with no shuffle of the big side; per-query ranking keeps k
    rows via a window. Returns (query_id, neighbor_id, cos_sim, rank).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("__emb_q"),
        l2_norm(vec_col).alias("__nq"),
    )
    # same under-split-scan guard as ivf_assign/knn_join: the n×|q|
    # scoring is the map stage; a single-file local scan would run
    # it on one core (no-op on multi-split inputs). Keyed fan_out —
    # not keyless repartition (sort-before-repartition, SPARK-23207)
    # — applied BELOW the cast/norm projection so the conditional
    # exchange moves the narrow float rows, not the widened doubles.
    c = fan_out(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col)),
        "neighbor_id",
    ).select(
        "neighbor_id",
        F.col(vec_col).cast("array<double>").alias("__emb_c"),
        l2_norm(vec_col).alias("__nc"),
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "neighbor_id",
        _cos_pre("__emb_q", "__emb_c", "__nq", "__nc").alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def ivf_assign(
    vectors: DataFrame, centroids: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """Assign each vector to its max-cosine centroid: broadcast the
    (tiny, O(√n)) centroid set, score in the map stage, and take the
    per-vector argmax with a ``max(struct(cos_sim, -cid))`` AGGREGATE
    — ties to the lowest centroid id, matching
    ``ORDER BY cos DESC, centroid_id``. The partial (map-side)
    aggregation collapses each vector's C scored rows before any
    exchange, so the shuffle carries n rows — NOT the n×C rows a
    row_number window would move (10¹¹ at 10⁹ vectors × 100
    centroids). No data-sized shuffle, no window, one streaming pass
    over the corpus. (Two per-row alternatives were measured and
    rejected: a fold over a literal centroid array runs interpreted
    — outside whole-stage codegen — and an unrolled-arithmetic
    argmax blows the plan up to thousands of nodes; the broadcast
    score + partial-max aggregate beats both and keeps the plan
    size independent of C.)

    Returns the vectors with an added ``centroid_id`` column."""
    cent = centroids.select(
        F.col(id_col).alias("__cid"),
        F.col(vec_col).cast("array<double>").alias("__cvec"),
        l2_norm(vec_col).alias("__cnorm"),
    )
    # The n×C scoring is CPU-bound interpreted HOF work, so the input
    # partition count — not data volume — caps throughput. A small
    # corpus arriving as one parquet file yields 1-2 splits and
    # serializes the whole assignment on 2 cores (measured: a 25k×500
    # assignment ran >10 min on 2 tasks, ~40 s spread over 32). Only
    # repartition when the scan is under-split; at real scale the
    # file count already exceeds the core count and this is a no-op.
    spark = vectors.sparkSession
    want = spark.sparkContext.defaultParallelism
    if vectors.rdd.getNumPartitions() < want:
        vectors = vectors.repartition(want)
    row_cols = list(vectors.columns)
    # per-ROW projection: vector cast + norm once, reused across all
    # C centroid scorings of that row
    pre = vectors.select(
        "*",
        F.col(vec_col).cast("array<double>").alias("__vd"),
        l2_norm(vec_col).alias("__vnorm"),
    )
    scored = pre.crossJoin(F.broadcast(cent)).select(
        F.col(id_col).alias("__vid"),
        F.struct(*row_cols).alias("__row"),
        F.struct(
            _cos_pre("__vd", "__cvec", "__vnorm", "__cnorm").alias("sim"),
            (-F.col("__cid")).alias("ncid"),
        ).alias("__scored"),
    )
    best = scored.groupBy("__vid").agg(
        F.max("__scored").alias("__best"), F.first("__row").alias("__row")
    )
    return best.select("__row.*", (-F.col("__best.ncid")).alias("centroid_id"))


def blocked_pairs(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    block_col: str | list[str],
    min_cos: float,
    broadcast_hints: bool | None = None,
) -> DataFrame:
    """Within-block near-dup pairs: cosine ≥ ``min_cos`` for every
    ``a < b`` pair sharing ``block_col`` (the IVF-cell / LSH-bucket /
    precomputed-label blocking pattern). A list of columns forms a
    COMPOSITE block key (pairs must match on every column); pass one
    whose combined cardinality grows with the corpus — a fixed-
    cardinality key makes block population, and therefore within-
    block pair enumeration, grow with n (see ``scaled_sign_planes``).

    With ``broadcast_hints=True`` (default) the right side is
    broadcast un-replicated and the left side is repartitioned to the
    core count when its scan is under-split, so pair scoring runs
    map-side across every core with NO dependence on block-key
    cardinality. That matters because the scoring is interpreted HOF
    CPU, not I/O: left to the planner, a small corpus in one parquet
    file gets 2 input splits, array-column size inflation pushes the
    join to sort-merge, and a 10-value block key then caps useful
    tasks at 10 — measured >7 min for a 25 k-vector corpus vs tens of
    seconds map-side.

    ``F.broadcast`` is a HARD hint, not a heuristic: a corpus past
    the 8 GB broadcast-relation limit (or past driver memory) FAILS
    the job rather than degrading. Pass ``broadcast_hints=False``
    for such corpora: the join runs as a plain shuffle join on the
    block key — there the block key IS high-cardinality (IVF cell /
    LSH bucket) so it parallelizes fine. The flag only changes
    physical strategy, never the pair set (pinned by
    ``tests/test_operators.py::test_blocked_pairs_hint_off_same_pairs``).
    The ``None`` default auto-resolves from the catalyst size estimate
    of the input (operators/dedup.py::_resolve_hints) so the 100 TB
    degradation is automatic, not opt-in."""
    from delta_lake_play_spark.operators.dedup import _resolve_hints

    broadcast_hints = _resolve_hints(vectors, broadcast_hints)
    spark = vectors.sparkSession
    want = spark.sparkContext.defaultParallelism
    blocks = [block_col] if isinstance(block_col, str) else list(block_col)
    blk_aliases = [f"__blk{i}" for i in range(len(blocks))]
    a = vectors.select(
        F.col(id_col).alias("__a"),
        *[F.col(c).alias(al) for c, al in zip(blocks, blk_aliases)],
        F.col(vec_col).cast("array<double>").alias("__va"),
        l2_norm(vec_col).alias("__na"),
    )
    if a.rdd.getNumPartitions() < want:
        a = a.repartition(want)
    b = vectors.select(
        F.col(id_col).alias("__b"),
        *[F.col(c).alias(al) for c, al in zip(blocks, blk_aliases)],
        F.col(vec_col).cast("array<double>").alias("__vb"),
        l2_norm(vec_col).alias("__nb"),
    )
    paired = (
        a.join(F.broadcast(b) if broadcast_hints else b, on=blk_aliases)
        .where(F.col("__a") < F.col("__b"))
        .select(
            "__a",
            "__b",
            # single-key callers keep the historical `__blk` name;
            # composite callers get back their own column names
            *(
                [F.col(blk_aliases[0]).alias("__blk")]
                if len(blocks) == 1
                else [F.col(al).alias(c) for c, al in zip(blocks, blk_aliases)]
            ),
            _cos_pre("__va", "__vb", "__na", "__nb").alias("__cos"),
        )
        .where(F.col("__cos") >= min_cos)
    )
    return paired


def knn_join(
    vectors: DataFrame,
    id_col: str,
    vec_col: str,
    k: int,
    dims: int,
    block_base: int = 250,
    max_planes: int = 16,
    broadcast_hints: bool | None = None,
    broadcast_max_rows: int = 1_000_000,
    bucket_cap: int = 500,
    carry: tuple[str, ...] = (),
    pair_filter: str | None = None,
) -> DataFrame:
    """Approximate all-pairs k-NN JOIN: every vector's top-k cosine
    neighbors among the vectors sharing its corpus-scaled
    hyperplane-sign bucket. This is the large×large shape
    ``cosine_topk`` (broadcast query set) cannot express — both
    "sides" are the whole corpus, so neither fits in a broadcast.

    Scale shape: bucket assignment is a narrow per-row map of p
    dot-products with p = ``scaled_sign_planes(n, block_base)``, so
    the 2^p bucket count grows with the corpus and expected bucket
    population stays in [block_base/2, block_base]. The self-join
    shuffles on the bucket id (high-cardinality by construction);
    candidate scoring is therefore Θ(n·block_base) — linear in n with
    a bounded constant — and the per-query ranking window moves
    exactly the scored candidate set, never n² rows. Missed
    cross-bucket neighbors are the standard random-hyperplane LSH
    recall trade: two vectors at angle θ co-bucket with probability
    (1 − θ/π)^p. Returns (query_id, neighbor_id, cos_sim, rank);
    vectors alone in their bucket yield no rows.

    ``bucket_cap`` is the skew guard: sign buckets are NOT balanced
    on clustered data (near-identical vectors co-bucket by design —
    an sf1 anchor measured one bucket holding 17% of its expected
    share ×22, inflating Σpop² to 8× the balanced ideal). Any bucket
    whose population exceeds the cap is salt-split into
    ``s = ceil(pop/cap)`` disjoint groups on ``vec_id % s``, so
    per-query candidates are ≤ cap and TOTAL scoring is ≤ n·cap —
    linear by construction no matter the skew. Inside a mega-bucket
    the members are near-duplicates of each other, so a 1/s sample
    still holds k strong neighbors (the recall trade is measured by
    the llm_ann_recall pattern). At populations ≤ cap, s = 1 and the
    pair set is exactly the un-salted one.

    ``carry`` columns ride along both sides as ``query_<c>`` /
    ``neighbor_<c>`` (e.g. a label for hard-negative mining);
    ``pair_filter`` is a SQL boolean over those names applied BEFORE
    ranking, so a filtered-out candidate can never under-fill the k
    slots.

    ``broadcast_hints``: unlike ``cosine_topk`` (one side is a small
    query set), BOTH sides here are corpus-sized, so a hard broadcast
    hint on a big corpus would fail the job at the 8 GB broadcast
    limit rather than degrade. The default (``None``) therefore
    auto-resolves from the corpus count the operator already takes:
    broadcast the neighbor side when ``n ≤ broadcast_max_rows``
    (map-side scoring on every core — the small/medium fast path),
    else fall back to a plain shuffle join on the bucket key, which
    parallelizes fine because the bucket key is high-cardinality by
    construction. Pass True/False to override; either way the row
    set is identical (pinned by
    ``tests/test_operators.py::test_knn_join_exact_within_bucket``)."""
    spark = vectors.sparkSession
    n = vectors.count()
    if broadcast_hints is None:
        broadcast_hints = n <= broadcast_max_rows
    p = scaled_sign_planes(n, block_base, max_planes)
    bucket = (
        hyperplane_bucket(vec_col, lsh_planes(dims, p))
        if p
        else F.lit(0).cast("long")
    )
    vb = vectors.withColumn("__bkt", bucket)
    # salt table: one row per bucket (≤ 2^p — broadcast-sized)
    salts = vb.groupBy("__bkt").agg(
        # integer ceil — exact on both engines, no float ceil involved
        F.expr(f"(count(*) + {bucket_cap - 1}) div {bucket_cap}")
        .cast("long")
        .alias("__s")
    )
    vb = vb.join(F.broadcast(salts), "__bkt").withColumn(
        "__salt", F.col(id_col) % F.col("__s")
    )
    q = vb.select(
        F.col(id_col).alias("query_id"),
        *[F.col(c).alias(f"query_{c}") for c in carry],
        "__bkt",
        "__salt",
        F.col(vec_col).cast("array<double>").alias("__vq"),
        l2_norm(vec_col).alias("__nq"),
    )
    want = spark.sparkContext.defaultParallelism
    if q.rdd.getNumPartitions() < want:
        q = q.repartition(want)
    c = vb.select(
        F.col(id_col).alias("neighbor_id"),
        *[F.col(col).alias(f"neighbor_{col}") for col in carry],
        "__bkt",
        "__salt",
        F.col(vec_col).cast("array<double>").alias("__vn"),
        l2_norm(vec_col).alias("__nn"),
    )
    carried = [f"query_{col}" for col in carry] + [
        f"neighbor_{col}" for col in carry
    ]
    scored = (
        q.join(
            F.broadcast(c) if broadcast_hints else c, on=["__bkt", "__salt"]
        )
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            *carried,
            _cos_pre("__vq", "__vn", "__nq", "__nn").alias("cos_sim"),
        )
    )
    if pair_filter is not None:
        scored = scored.where(F.expr(pair_filter))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), "neighbor_id"
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", *carried, "cos_sim", "rank")
    )


def scaled_sign_planes(n_rows: int, base: int = 5000, max_planes: int = 16) -> int:
    """Corpus-scaled LSH plane count for a composite blocking key:
    the smallest p (≤ ``max_planes``) with ``n_rows ≤ base·2^p``.

    Used to keep blocked-pair enumeration LINEAR in the corpus: a
    fixed blocking key (e.g. a 10-value label) makes within-block
    population grow ∝ n and pair listing ∝ n²; intersecting it with
    a 2^p-bucket hyperplane-sign key whose p grows with log₂(n)
    pins expected block population to [base/2, base] by
    construction. Assignment stays a narrow per-row map of p
    dot-products — O(n·log n) total, never the O(n·cells) broadcast
    assign that makes linearly-grown IVF centroid sets quadratic
    (the r7 sf1 lesson). Integer ladder, no floating log2, so a SQL
    oracle reproduces it exactly with a CASE over count(*)."""
    p, cap = 0, base
    while n_rows > cap and p < max_planes:
        p += 1
        cap *= 2
    return p


def lsh_planes(dims: int, n_planes: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (no RNG — the judged
    oracle must rebuild the identical planes in SQL): component i of
    plane p is ``((4391·p + 613·i + 89) mod 10007)/10007 − 0.5``."""
    a, b, c, m = 4391, 613, 89, 10007
    return [
        [((a * p + b * i + c) % m) / m - 0.5 for i in range(dims)]
        for p in range(n_planes)
    ]


def hyperplane_bucket(vec_col: str, planes: list[list[float]]):
    """Signed-projection LSH bucket: bit p is set when the vector's
    dot product with plane p is positive; the n_planes bits form the
    bucket id. A narrow per-row map — no join, no shuffle; two
    vectors at a small angle land in the same bucket with probability
    (1 − θ/π)^n_planes (random-hyperplane LSH)."""
    dv = F.col(vec_col).cast("array<double>")
    bucket = F.lit(0).cast("long")
    for p, w in enumerate(planes):
        lit_w = F.array(*[F.lit(x) for x in w])
        dot = F.aggregate(
            F.zip_with(dv, lit_w, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bucket = bucket + F.when(dot > 0.0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    n_planes: int = 6,
    k: int = 10,
    dims: int | None = None,
) -> DataFrame:
    """LSH-bucketed approximate top-k: exact cosine ranking restricted
    to the query's hyperplane-sign bucket.

    The bucket id is a narrow map on both sides; the candidate join
    shuffles on the bucket key (2^n_planes buckets), so per-query
    work is O(n / 2^n_planes) — the sibling of :func:`ivf_topk` that
    needs NO centroid set or training pass. Multi-probe (flipping
    the lowest-margin bits) is the standard recall knob at scale.
    Returns (query_id, neighbor_id, bucket, cos_sim, rank).

    ``dims``: pass the (fixed) embedding width when the caller knows
    it; the ``None`` fallback derives it with a one-row driver action
    — a whole Spark job spent on a schema-level fact (guide §7.3
    driver-side fixed cost)."""
    if dims is None:
        dims = len(corpus.select(vec_col).first()[0])
    planes = lsh_planes(dims, n_planes)
    # under-split-scan guard (same as cosine_topk/ivf_assign): the
    # per-pair scoring below is the map stage of the bucket join;
    # fan_out below the projection so the conditional exchange moves
    # float rows and the bucket/norm map runs on every core.
    c = fan_out(
        corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col)),
        "neighbor_id",
    ).select(
        "neighbor_id",
        F.col(vec_col).cast("array<double>").alias("__emb_c"),
        l2_norm(vec_col).alias("__nc"),
        hyperplane_bucket(vec_col, planes).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("__emb_q"),
        l2_norm(vec_col).alias("__nq"),
        hyperplane_bucket(vec_col, planes).alias("bucket"),
    )
    scored = F.broadcast(q).join(c, on="bucket").select(
        "query_id", "neighbor_id", "bucket",
        _cos_pre("__emb_q", "__emb_c", "__nq", "__nc").alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "bucket", "cos_sim", "rank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 10,
) -> DataFrame:
    """IVF-style approximate top-k: search only the query's cell.

    Per-query work drops from O(n) to O(n / cells), trading recall
    exactly as a FAISS IVF index does. At scale, pre-partition
    (bucket) the corpus by ``centroid_id`` so probes are
    shuffle-free. Returns (query_id, neighbor_id, centroid_id,
    cos_sim, rank)."""
    c = ivf_assign(corpus, centroids, id_col, vec_col).select(
        F.col(id_col).alias("neighbor_id"), "centroid_id",
        F.col(vec_col).cast("array<double>").alias("__emb_c"),
        l2_norm(vec_col).alias("__nc"),
    )
    q = ivf_assign(queries, centroids, id_col, vec_col).select(
        F.col(id_col).alias("query_id"), "centroid_id",
        F.col(vec_col).cast("array<double>").alias("__emb_q"),
        l2_norm(vec_col).alias("__nq"),
    )
    scored = q.join(c, on="centroid_id").select(
        "query_id", "neighbor_id", "centroid_id",
        _cos_pre("__emb_q", "__emb_c", "__nq", "__nc").alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_sim").desc(), "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "centroid_id", "cos_sim", "rank")
    )
