"""Graph analytics over derived relationship tables (SURVEY.md §2
EXT — complements ``llm_pagerank_sources`` and the connected-
components machinery in ``operators/dedup.py``).

Reference scope note: the reference (nagi49000/delta-lake-play) has
no graph surface; this extends the engine the way its Spark runtime
would be used for relationship analysis at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from delta_lake_play_spark.registry import register
from delta_lake_play_spark.sources.catalog import load_table

# --- graph_triangle_count -------------------------------------------------
#
# Co-occurrence graph: users active in the same (event_type, hour)
# bucket are connected. Buckets are capped to their 10 smallest
# user_ids (deterministic) so a hot bucket contributes at most 45
# edges — the standard clique-cap that keeps co-occurrence graph
# construction output-bounded at any scale. Triangles are counted
# with the two-shuffle wedge-join: orient every edge small→large id,
# build wedges by joining edges on their lower endpoint, then
# semi-join wedges against edges (the MapReduce triangle algorithm —
# no vertex ever sees more than its own neighborhood).

_TRI_ORACLE = """
WITH b AS (
  SELECT event_type, hr, user_id,
         row_number() OVER (PARTITION BY event_type, hr ORDER BY user_id) AS rn
  FROM (SELECT DISTINCT event_type,
               time_bucket(INTERVAL 1 HOUR, ts) AS hr, user_id
        FROM events)
),
capped AS (SELECT * FROM b WHERE rn <= 10),
edges AS (
  SELECT DISTINCT a.user_id AS u, c.user_id AS v
  FROM capped a JOIN capped c
    ON a.event_type = c.event_type AND a.hr = c.hr AND a.user_id < c.user_id
),
wedges AS (
  SELECT e1.v AS a, e2.v AS b
  FROM edges e1 JOIN edges e2 ON e1.u = e2.u AND e1.v < e2.v
),
tri AS (
  SELECT COUNT(*) AS n FROM wedges w JOIN edges e ON w.a = e.u AND w.b = e.v
)
SELECT CAST((SELECT COUNT(DISTINCT u2) FROM (
         SELECT u AS u2 FROM edges UNION SELECT v FROM edges)) AS BIGINT)
         AS n_nodes,
       CAST((SELECT COUNT(*) FROM edges) AS BIGINT) AS n_edges,
       CAST((SELECT n FROM tri) AS BIGINT) AS n_triangles
"""


def cooccurrence_edges(events: DataFrame, cap: int = 10) -> DataFrame:
    """Deterministic capped co-occurrence edges (u < v).

    dense_rank over the RAW event rows caps to the ``cap`` smallest
    DISTINCT user_ids in one bucket-keyed shuffle; the residual
    distinct then runs on the capped (tiny) set. A separate
    3-column pre-distinct before the window was the single biggest
    cost of every graph key (measured 1.5-2× on the whole builder) —
    and the window's sort-based shuffle dedups just as exactly.
    (Measured note, optimization r11: a collect_set + slice + map-side
    pair expansion variant — the llm_source_overlap shape — LOST an
    interleaved A/B here ~2×: dense buckets make collect_set gather
    the FULL distinct user set per bucket before the cap slices it,
    where dense_rank caps during the sorted window pass. The window
    stays.)"""
    from pyspark.sql.window import Window

    base = events.select(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("hr"),
        "user_id",
    )
    w = Window.partitionBy("event_type", "hr").orderBy("user_id")
    capped = (
        base.withColumn("rn", F.dense_rank().over(w))
        .where(F.col("rn") <= cap)
        .drop("rn")
        .distinct()
    )
    other = capped.select(
        "event_type", "hr", F.col("user_id").alias("v_id")
    )
    return (
        capped.join(other, ["event_type", "hr"])
        .where(F.col("user_id") < F.col("v_id"))
        .select(F.col("user_id").alias("u"), F.col("v_id").alias("v"))
        .distinct()
    )


def _minute_edges(events: DataFrame, cap: int = 4) -> DataFrame:
    """Sparse co-occurrence edges: users active in the same
    (event_type, minute) bucket, capped to the ``cap`` smallest
    user_ids per bucket — at most cap·(cap-1)/2 edges per bucket, so
    edge count is O(#buckets) at any corpus size. Same window-capped
    shape as :func:`cooccurrence_edges` (and the same r11
    measured note: the collect_set variant lost)."""
    from pyspark.sql.window import Window

    base = events.select(
        "event_type",
        F.date_trunc("minute", F.col("ts")).alias("mi"),
        "user_id",
    )
    w = Window.partitionBy("event_type", "mi").orderBy("user_id")
    capped = (
        base.withColumn("rn", F.dense_rank().over(w))
        .where(F.col("rn") <= cap)
        .drop("rn")
        .distinct()
    )
    other = capped.select("event_type", "mi", F.col("user_id").alias("v_id"))
    return (
        capped.join(other, ["event_type", "mi"])
        .where(F.col("user_id") < F.col("v_id"))
        .select(F.col("user_id").alias("u"), F.col("v_id").alias("v"))
        .distinct()
    )


@register("graph_triangle_count", oracle=_TRI_ORACLE)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed triangle counting on the user co-occurrence graph:
    wedge join (edges ⋈ edges on the lower endpoint) then one
    edge-existence join — two keyed shuffles, never all-pairs. Edges
    are oriented low-degree → high-degree (ties by id), the classic
    O(m^1.5) bound: every wedge pivot fans out over its OUT-degree,
    which the orientation caps at ~√(2m) regardless of how skewed the
    raw degree distribution is (id-orientation leaves Σ out-deg²
    unbounded — one hub user appearing in many buckets dominates).
    The triangle COUNT is orientation-invariant, so the oracle's
    id-oriented closure counts the same set."""
    ev = load_table(spark, sf_dir, "events")
    # Both persists are in-query intermediates consumed by several
    # branches of ONE lazy plan (below); they stay alive until the
    # caller's single action has run — same discipline as the dedup
    # signature table (operators/dedup.py).
    edges = cooccurrence_edges(ev).persist()
    bi = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    deg = bi.groupBy("u").agg(F.count("*").alias("d")).select(
        F.col("u").alias("node"), "d"
    )
    e = (
        edges.join(deg.withColumnRenamed("d", "du"), edges.u == deg.node)
        .drop("node")
        .join(
            deg.withColumnRenamed("d", "dv").withColumnRenamed(
                "node", "node_v"
            ),
            edges.v == F.col("node_v"),
        )
        .drop("node_v")
    )
    u_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = e.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("src"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
        F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("ddst"),
    ).persist()
    # (Measured note, optimization r11: building per-pivot
    # adjacency arrays — groupBy(src).collect_list + map-side
    # ordered-pair expansion — LOST an interleaved A/B ~2× (10.4
    # vs 5.5 s): the codegen'd self-join generates wedge pairs
    # faster than interpreted struct-filter HOFs even paying its
    # second exchange. The join stays.)
    o2 = oriented.select(
        F.col("src").alias("src2"),
        F.col("dst").alias("b"),
        F.col("ddst").alias("db"),
    )
    # pair the pivot's out-neighbors in (deg, id) order so each
    # wedge is generated once and matches the closing edge's
    # orientation
    a_first = (F.col("ddst") < F.col("db")) | (
        (F.col("ddst") == F.col("db")) & (F.col("dst") < F.col("b"))
    )
    wedges = (
        oriented.join(o2, oriented.src == o2.src2)
        .where(F.col("dst") != F.col("b"))
        .where(a_first)
        .select(F.col("dst").alias("a"), "b")
    )
    closing = oriented.select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    )
    # Optimization r12 (guide §7.3 driver-side fixed cost / §2.6
    # idle-capacity): the three counts used to run as three
    # SEPARATE driver actions (tri .count(), nodes .count(), edges
    # .count()) feeding a createDataFrame of literals — three jobs'
    # scheduling fixed cost, run strictly one after another. As three
    # 1-row aggregates cross-joined into one lazy plan they execute
    # inside the caller's single action, the persisted edge/oriented
    # tables are shared, and the small node/edge branches back-fill
    # the big wedge join's straggler tail instead of waiting for it.
    tri_df = wedges.join(closing, ["a", "b"]).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    nodes_df = (
        edges.select(F.col("u").alias("n"))
        .union(edges.select("v"))
        .distinct()
        .agg(F.count(F.lit(1)).alias("n_nodes"))
    )
    edges_df = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    # explicit broadcast hints: the cross joins are 1-row scalar
    # attaches and must plan BroadcastNestedLoopJoin at ANY threshold
    # (the registry-wide anti-cartesian sweep pins exactly this).
    return nodes_df.crossJoin(F.broadcast(edges_df)).crossJoin(
        F.broadcast(tri_df)
    ).select(
        F.col("n_nodes").cast("long"),
        F.col("n_edges").cast("long"),
        F.col("n_triangles").cast("long"),
    )


# --- graph_connected_components -------------------------------------------
#
# Component-size histogram of the sparse (event_type, minute) user
# co-occurrence graph. The Spark side reuses the same two-path
# connected-components operator the dedup pipeline uses
# (operators/dedup.py::connected_components): union-find on the
# driver while the EDGE list fits (edges are output-sized, not
# corpus-sized), distributed min-label propagation with pointer
# jumping above that — O(log diameter) keyed shuffles, each round
# localCheckpoint-truncated. The oracle computes the same components
# via a recursive-CTE transitive closure (fine at oracle scale;
# closure is exactly what the distributed path must NOT do).

_CC_ORACLE = """
WITH RECURSIVE b AS (
  SELECT event_type, mi, user_id,
         row_number() OVER (PARTITION BY event_type, mi ORDER BY user_id) AS rn
  FROM (SELECT DISTINCT event_type,
               time_bucket(INTERVAL 1 MINUTE, ts) AS mi, user_id
        FROM events)
),
capped AS (SELECT * FROM b WHERE rn <= 4),
edges AS (
  SELECT DISTINCT a.user_id AS u, c.user_id AS v
  FROM capped a JOIN capped c
    ON a.event_type = c.event_type AND a.mi = c.mi AND a.user_id < c.user_id
),
bi AS (SELECT u, v FROM edges UNION ALL SELECT v, u FROM edges),
reach(node, r) AS (
  SELECT user_id, user_id FROM (SELECT DISTINCT user_id FROM events)
  UNION
  SELECT reach.node, bi.v FROM reach JOIN bi ON reach.r = bi.u
),
lbl AS (SELECT node, MIN(r) AS cluster FROM reach GROUP BY node),
sizes AS (SELECT cluster, COUNT(*) AS sz FROM lbl GROUP BY cluster)
SELECT CAST(sz AS BIGINT) AS component_size,
       CAST(COUNT(*) AS BIGINT) AS n_components
FROM sizes GROUP BY sz
"""


@register("graph_connected_components", oracle=_CC_ORACLE)
def graph_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Component-size histogram over the sparse co-occurrence graph.
    Isolated users are singleton components (nodes = ALL distinct
    users, not just edge endpoints)."""
    from delta_lake_play_spark.operators.dedup import connected_components

    ev = load_table(spark, sf_dir, "events")
    edges = _minute_edges(ev).select(
        F.col("u").alias("a"), F.col("v").alias("b")
    )
    nodes = ev.select(F.col("user_id").alias("node")).distinct()
    labels = connected_components(nodes, edges)
    return (
        labels.groupBy("cluster")
        .agg(F.count("*").alias("component_size"))
        .groupBy("component_size")
        .agg(F.count("*").alias("n_components"))
    )


# --- graph_common_neighbors -----------------------------------------------
#
# Link prediction by common-neighbor count over CAPPED neighborhoods:
# each node's adjacency is truncated to its 20 smallest neighbor ids
# before wedge generation, so wedge work is n·k² REGARDLESS of the
# degree distribution — the co-occurrence graph is degree-unbounded
# (a user active in many time buckets accumulates neighbors without
# limit; measured Σ deg² = 75 M wedges at sf0.1 against 411 k after
# the cap), and per-node neighbor truncation/sampling is the standard
# scale fix in production link prediction. Score of (a, b) =
# #{w : a, b ∈ N_k(w)}; adjacency is removed with a keyed anti-join
# and the >= 3 floor bounds output.

_CN_ORACLE = """
WITH b AS (
  SELECT event_type, hr, user_id,
         row_number() OVER (PARTITION BY event_type, hr ORDER BY user_id) AS rn
  FROM (SELECT DISTINCT event_type,
               time_bucket(INTERVAL 1 HOUR, ts) AS hr, user_id
        FROM events)
),
capped AS (SELECT * FROM b WHERE rn <= 10),
edges AS (
  SELECT DISTINCT a.user_id AS u, c.user_id AS v
  FROM capped a JOIN capped c
    ON a.event_type = c.event_type AND a.hr = c.hr AND a.user_id < c.user_id
),
bi AS (SELECT u, v FROM edges UNION ALL SELECT v, u FROM edges),
adj AS (
  SELECT u, v, row_number() OVER (PARTITION BY u ORDER BY v) AS rn FROM bi
),
nbr AS (SELECT u, v FROM adj WHERE rn <= 20),
wedge AS (
  SELECT e1.v AS a, e2.v AS b, e1.u AS via
  FROM nbr e1 JOIN nbr e2 ON e1.u = e2.u AND e1.v < e2.v
),
scored AS (
  SELECT a, b, COUNT(DISTINCT via) AS common_neighbors
  FROM wedge w
  WHERE NOT EXISTS (SELECT 1 FROM edges e WHERE e.u = w.a AND e.v = w.b)
  GROUP BY a, b
)
SELECT CAST(a AS BIGINT) AS u, CAST(b AS BIGINT) AS v,
       CAST(common_neighbors AS BIGINT) AS common_neighbors
FROM scored WHERE common_neighbors >= 3
"""

_NBR_CAP = 20


@register("graph_common_neighbors", oracle=_CN_ORACLE)
def graph_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capped-neighborhood common-neighbor link prediction: truncate
    each node's adjacency to its 20 smallest neighbors (one keyed
    window), wedge join on the shared endpoint (work n·k²), anti-join
    out existing edges, count distinct shared neighbors, floor at 3."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    edges = cooccurrence_edges(ev).persist()
    try:
        bi = edges.unionByName(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        wadj = Window.partitionBy("u").orderBy("v")
        nbr = (
            bi.withColumn("rn", F.row_number().over(wadj))
            .where(F.col("rn") <= _NBR_CAP)
            .drop("rn")
        )
        e2 = nbr.select(F.col("u").alias("u2"), F.col("v").alias("b"))
        wedges = (
            nbr.join(e2, nbr.u == e2.u2)
            .where(F.col("v") < F.col("b"))
            .select(F.col("v").alias("a"), "b", F.col("u").alias("via"))
        )
        non_adjacent = wedges.join(
            edges.select(F.col("u").alias("a"), F.col("v").alias("b")),
            ["a", "b"],
            "left_anti",
        )
        return (
            non_adjacent.groupBy("a", "b")
            .agg(F.count_distinct("via").alias("common_neighbors"))
            .where(F.col("common_neighbors") >= 3)
            .select(
                F.col("a").cast("long").alias("u"),
                F.col("b").cast("long").alias("v"),
                F.col("common_neighbors"),
            )
        )
    finally:
        edges.unpersist()


# --- graph_kcore ----------------------------------------------------------
#
# Bounded-round k-core peeling (k=3): repeatedly drop nodes with
# degree < k, up to _KCORE_ROUNDS rounds — the deterministic, scale-
# honest form of the iterative algorithm (production peels bound
# rounds too; each round is one map-side-combined degree count plus
# two keyed semi-joins, all edge-partitioned, nothing collected).
# The loop early-exits at fixpoint, which equals the fixed-round
# result because further peels are identity — so the DuckDB oracle
# can unroll exactly _KCORE_ROUNDS rounds as a CTE chain and the
# hash still proves the distributed loop correct. localCheckpoint
# truncates the growing lineage each round (the same discipline as
# the label-propagation fallback in operators/dedup.py).

_KCORE_K = 3
_KCORE_ROUNDS = 8

_EDGES_PRELUDE = """
WITH b AS (
  SELECT event_type, hr, user_id,
         row_number() OVER (PARTITION BY event_type, hr ORDER BY user_id) AS rn
  FROM (SELECT DISTINCT event_type,
               time_bucket(INTERVAL 1 HOUR, ts) AS hr, user_id
        FROM events)
),
capped AS (SELECT * FROM b WHERE rn <= 10),
edges AS (
  SELECT DISTINCT a.user_id AS u, c.user_id AS v
  FROM capped a JOIN capped c
    ON a.event_type = c.event_type AND a.hr = c.hr AND a.user_id < c.user_id
),
a0 AS MATERIALIZED (SELECT u, v FROM edges UNION ALL SELECT v, u FROM edges)
"""


def _kcore_oracle() -> str:
    parts = [_EDGES_PRELUDE.rstrip()]
    for r in range(_KCORE_ROUNDS):
        parts.append(
            f""",
s{r} AS MATERIALIZED (SELECT u FROM a{r} GROUP BY u HAVING COUNT(*) >= {_KCORE_K}),
a{r + 1} AS MATERIALIZED (
  SELECT a.u, a.v FROM a{r} a
  JOIN s{r} x ON a.u = x.u JOIN s{r} y ON a.v = y.u
)"""
        )
    parts.append(
        f"""
SELECT CAST(u AS BIGINT) AS node, CAST(COUNT(*) AS BIGINT) AS core_degree
FROM a{_KCORE_ROUNDS} GROUP BY u"""
    )
    return "".join(parts)


@register("graph_kcore", oracle=_kcore_oracle())
def graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nodes surviving an 8-round 3-core peel of the co-occurrence
    graph, with their within-core degree."""
    ev = load_table(spark, sf_dir, "events")
    edges = cooccurrence_edges(ev)
    alive = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint()
    n = alive.count()
    for _ in range(_KCORE_ROUNDS):
        surv = (
            alive.groupBy("u")
            .agg(F.count(F.lit(1)).alias("d"))
            .where(F.col("d") >= _KCORE_K)
            .select("u")
        )
        alive = (
            alive.join(surv, "u", "leftsemi")
            .join(surv.withColumnRenamed("u", "v"), "v", "leftsemi")
            .localCheckpoint()
        )
        n2 = alive.count()
        if n2 == n:  # fixpoint: remaining rounds are identity
            break
        n = n2
    return alive.groupBy("u").agg(
        F.count(F.lit(1)).alias("core_degree")
    ).select(
        F.col("u").cast("long").alias("node"),
        F.col("core_degree").cast("long").alias("core_degree"),
    )


# --- graph_bfs_distance -------------------------------------------------------
#
# Bounded-round BFS from a seed set (multi-source shortest hops on
# the co-occurrence graph): _BFS_ROUNDS frontier expansions, each one
# keyed join (frontier ⋈ edges) + one min-aggregate, localCheckpoint
# per round — the traversal twin of graph_kcore's peel. Early exit
# when an expansion adds no node equals the fixed-round result, so
# the oracle unrolls exactly _BFS_ROUNDS rounds as MATERIALIZED CTEs
# and hash-checks the distributed loop. Seeds: user_id % 50 == 0.

_BFS_ROUNDS = 4


def _bfs_oracle() -> str:
    parts = [
        _EDGES_PRELUDE.rstrip(),
        """,
d0 AS MATERIALIZED (
  SELECT DISTINCT u AS node, 0 AS dist FROM a0 WHERE u % 50 = 0
  UNION
  SELECT DISTINCT v, 0 FROM a0 WHERE v % 50 = 0
)""",
    ]
    for r in range(_BFS_ROUNDS):
        parts.append(
            f""",
d{r + 1} AS MATERIALIZED (
  SELECT node, MIN(dist) AS dist FROM (
    SELECT node, dist FROM d{r}
    UNION ALL
    SELECT e.v AS node, {r + 1} AS dist
    FROM d{r} f JOIN a0 e ON f.node = e.u WHERE f.dist = {r}
  ) GROUP BY node
)"""
        )
    parts.append(
        f"""
SELECT CAST(node AS BIGINT) AS node, CAST(dist AS BIGINT) AS dist
FROM d{_BFS_ROUNDS}"""
    )
    return "".join(parts)


@register("graph_bfs_distance", oracle=_bfs_oracle())
def graph_bfs_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hop distance (≤ 4) from the seed users to every reachable node
    of the co-occurrence graph."""
    ev = load_table(spark, sf_dir, "events")
    edges = cooccurrence_edges(ev)
    bi = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint()
    seeds = (
        bi.select(F.col("u").alias("node"))
        .where(F.col("node") % 50 == 0)
        .distinct()
        .select("node", F.lit(0).alias("dist"))
    )
    dist = seeds.localCheckpoint()
    n = dist.count()
    for r in range(_BFS_ROUNDS):
        frontier = dist.where(F.col("dist") == r)
        expanded = frontier.join(bi, frontier.node == bi.u).select(
            F.col("v").alias("node"), F.lit(r + 1).alias("dist")
        )
        dist = (
            dist.unionByName(expanded)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint()
        )
        n2 = dist.count()
        if n2 == n:  # no new node: remaining rounds are identity
            break
        n = n2
    return dist.select(
        F.col("node").cast("long").alias("node"),
        F.col("dist").cast("long").alias("dist"),
    )


# --- graph_label_propagation ------------------------------------------------
#
# Community detection by synchronous label propagation over the
# sparse minute-bucket co-occurrence graph (same capped edge builder
# as graph_connected_components): every node starts as its own
# label; each round it adopts the most frequent label among its
# neighbors (ties → smallest label, so every round is deterministic
# — vanilla LPA's random tie-break is exactly what a judged parity
# gate cannot allow). Three unrolled rounds: each is ONE keyed join
# (edges ⋈ labels on the neighbor end) + one count aggregate + one
# per-node argmax window — O(m) shuffle per round, the textbook
# distributed-LPA cost, with localCheckpoint truncating the lineage
# between rounds. The oracle unrolls the same three rounds as CTE
# layers (a recursive CTE cannot host the per-round aggregate).

_LPA_ROUNDS = 3


def _lpa_round_sql(i: int) -> str:
    return f"""
c{i + 1} AS (
  SELECT bi.u AS node, l{i}.lab, COUNT(*) AS c
  FROM bi JOIN l{i} ON bi.v = l{i}.node GROUP BY bi.u, l{i}.lab
),
l{i + 1} AS (
  SELECT node, lab FROM (
    SELECT node, lab,
           row_number() OVER (PARTITION BY node ORDER BY c DESC, lab) AS rn
    FROM c{i + 1})
  WHERE rn = 1
)"""


_LPA_ORACLE = f"""
WITH b AS (
  SELECT event_type, mi, user_id,
         row_number() OVER (PARTITION BY event_type, mi ORDER BY user_id) AS rn
  FROM (SELECT DISTINCT event_type,
               time_bucket(INTERVAL 1 MINUTE, ts) AS mi, user_id
        FROM events)
),
capped AS (SELECT * FROM b WHERE rn <= 4),
edges AS (
  SELECT DISTINCT a.user_id AS u, c.user_id AS v
  FROM capped a JOIN capped c
    ON a.event_type = c.event_type AND a.mi = c.mi AND a.user_id < c.user_id
),
bi AS (SELECT u, v FROM edges UNION ALL SELECT v, u FROM edges),
nodes AS (SELECT DISTINCT user_id AS node FROM events),
l0 AS (SELECT node, node AS lab FROM nodes),
{",".join(_lpa_round_sql(i) for i in range(_LPA_ROUNDS))}
SELECT CAST(n.node AS BIGINT) AS node,
       CAST(COALESCE(l.lab, n.node) AS BIGINT) AS community,
       CAST(COUNT(*) OVER (PARTITION BY COALESCE(l.lab, n.node)) AS BIGINT)
         AS community_size
FROM nodes n LEFT JOIN l{_LPA_ROUNDS} l ON n.node = l.node
"""


@register("graph_label_propagation", oracle=_LPA_ORACLE)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three deterministic LPA rounds (min-label argmax) over the
    capped minute-bucket co-occurrence graph; output is each node's
    community plus the community size."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    edges = _minute_edges(ev, 4)
    bi = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).localCheckpoint()
    nodes = ev.select(F.col("user_id").alias("node")).distinct()
    lab = nodes.select("node", F.col("node").alias("lab"))
    w_arg = Window.partitionBy("node").orderBy(F.col("c").desc(), "lab")
    # rounds relabel edge ENDPOINTS only (an isolated node has no
    # argmax row); the final left join restores singletons
    for _ in range(_LPA_ROUNDS):
        nb = bi.join(lab, bi.v == lab.node).select(
            F.col("u").alias("node"), "lab"
        )
        cnt = nb.groupBy("node", "lab").agg(F.count(F.lit(1)).alias("c"))
        lab = (
            cnt.withColumn("rn", F.row_number().over(w_arg))
            .where(F.col("rn") == 1)
            .select("node", "lab")
            .localCheckpoint()
        )
    com = F.coalesce(F.col("lab"), F.col("node"))
    w_sz = Window.partitionBy(com)
    return nodes.join(lab, "node", "left").select(
        F.col("node").cast("long").alias("node"),
        com.cast("long").alias("community"),
        F.count(F.lit(1)).over(w_sz).cast("long").alias("community_size"),
    )
