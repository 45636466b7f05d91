"""Stage 3 — transitive clustering via iterative connected components.

The reference computes weak components with an in-memory JUNG clusterer
(`baseline/RandomGraphWalk.java:340-346`) — fine for one document's graph,
impossible for 10^12 turns. We use the alternating large-star / small-star
algorithm (Kiveris et al. 2014, "Connected Components in MapReduce and
Beyond" — public paper), which converges in O(log² n) supersteps and keeps
every superstep a pair of groupBy/join DataFrame ops.

Node ids are the engine's sortable string rec_keys; the cluster id is the
lexicographic min member — the same convention the oracle's recursive-CTE
closure uses, so ids compare exactly.

Scale notes:
  * every superstep ends in `localCheckpoint()` — iteration over DataFrames
    otherwise builds an exponentially deep lineage that kills the planner
    (the one Spark failure mode the reference never had to face).
  * convergence check is a count of changed edges — an O(1)-ish aggregate,
    not a collect of the edge set.
  * on a cluster, `localCheckpoint` would be `checkpoint()` to HDFS/Iceberg
    so a lost executor doesn't force a full recompute (resume plumbing in
    plans/pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    """large-star: for every node u, connect all strictly-larger neighbors
    to m = min(N(u) ∪ {u}). Input/output: undirected edge list (u, v)."""
    nbrs = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    m = nbrs.groupBy("u").agg(F.min("v").alias("mn"))
    m = m.select("u", F.least("mn", "u").alias("m"))
    return (
        nbrs.join(m, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """small-star: orient edges to (big, small); for every node u connect
    all small neighbors and u itself to m = min(N≤(u) ∪ {u})."""
    oriented = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    m = oriented.groupBy("u").agg(F.min("v").alias("m"))
    moved = (
        oriented.join(m, "u")
        .filter(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    self_edge = m.select("u", F.col("m").alias("v"))
    return moved.union(self_edge).distinct()


def connected_components(
    edges: DataFrame, max_iter: int = 20, checkpoint: bool = True
) -> DataFrame:
    """edges(a_key, b_key) → (rec_key, cluster_id). Alternating large/small
    star until the edge set is a stable star forest. Only nodes that appear
    in an edge are returned; callers union singletons themselves."""
    e = (
        edges.select(F.col("a_key").alias("u"), F.col("b_key").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    if checkpoint:
        e = e.localCheckpoint()
    n_prev = e.count()
    for _ in range(max_iter):
        e2 = _small_star(_large_star(e))
        if checkpoint:
            e2 = e2.localCheckpoint()
        # two-tier convergence probe: a cheap count (scan of the fresh
        # checkpoint) screens most supersteps — unequal counts mean the
        # edge set certainly changed; only when counts match does the
        # exact set comparison (exceptAll, a co-shuffle job) run. Sound:
        # equal sets ⟹ equal counts.
        n2 = e2.count()
        changed = 1
        if n2 == n_prev:
            o1 = e.select(
                F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
            )
            changed = (
                e2.select(
                    F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
                )
                .exceptAll(o1)
                .limit(1)
                .count()
            )
        e = e2
        n_prev = n2
        if changed == 0:
            break
    # stable state: every edge is (member, root-min)
    members = e.select(F.col("u").alias("rec_key"), F.col("v").alias("cluster_id"))
    roots = e.select(F.col("v").alias("rec_key"), F.col("v").alias("cluster_id"))
    return members.union(roots).distinct()


def clusters_with_singletons(
    records: DataFrame, edges: DataFrame, max_iter: int = 20, checkpoint: bool = True
) -> DataFrame:
    """All records assigned a cluster: CC result where edges exist,
    rec_key itself for singletons."""
    cc = connected_components(edges, max_iter=max_iter, checkpoint=checkpoint)
    return (
        records.select("rec_key")
        .join(cc, "rec_key", "left")
        .select(
            "rec_key", F.coalesce("cluster_id", "rec_key").alias("cluster_id")
        )
    )


def clusters_sql(records_rel: str, edges_rel: str) -> str:
    """DuckDB oracle: transitive closure by recursive CTE, cluster id =
    min reachable node (small scale only — closure is O(Σ comp²))."""
    return f"""
    WITH RECURSIVE sym AS (
      SELECT a_key AS u, b_key AS v FROM ({edges_rel})
      UNION
      SELECT b_key AS u, a_key AS v FROM ({edges_rel})
    ),
    walk (u, v) AS (
      SELECT u, v FROM sym
      UNION
      SELECT w.u, s.v FROM walk w JOIN sym s ON w.v = s.u
    ),
    reach AS (
      SELECT u AS rec_key, least(u, min(v)) AS cluster_id FROM walk GROUP BY u
    )
    SELECT r.rec_key, coalesce(reach.cluster_id, r.rec_key) AS cluster_id
    FROM ({records_rel}) r LEFT JOIN reach ON r.rec_key = reach.rec_key
    """


def golden_records(records: DataFrame, clusters: DataFrame) -> DataFrame:
    """(cluster_id, n_members, n_convs, total_tokens, canonical_text):
    the GOLDEN RECORD a linkage pipeline ships — one canonical row per
    resolved entity, built by deterministic survivorship rules: the
    canonical text is the cluster's most frequent norm_text with ties to
    the lexicographically smallest (the standard most-frequent-value
    survivorship of MDM practice; the reference stops at cluster ids, so
    this is the natural next stage its users hand-roll).

    Scale shape: one rec_key equi-join + three partial-agg'd groupBys on
    cluster_id. The frequency argmax is deliberately NOT a per-cluster
    window: a hot cluster would put all its distinct texts in one task's
    sort (the `cap_blocks` lesson) — instead the (cluster, text) counts
    feed `min_by` over a composite (count-complement, text) key, which
    partial-aggregates map-side like any min."""
    j = records.join(clusters, "rec_key")
    stats = j.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.count_distinct(F.col("conv_id")).alias("n_convs"),
        F.sum(F.size("tokens")).cast("long").alias("total_tokens"),
    )
    counts = j.groupBy("cluster_id", "norm_text").agg(
        F.count(F.lit(1)).alias("c")
    )
    # composite order key: larger count first, then smaller text — as ONE
    # string so min_by/arg_min agree bit-for-bit across engines
    key = F.concat(
        F.lpad((F.lit(2147483647) - F.col("c")).cast("string"), 10, "0"),
        F.lit("|"),
        F.col("norm_text"),
    )
    canon = counts.groupBy("cluster_id").agg(
        F.min_by("norm_text", key).alias("canonical_text")
    )
    return stats.join(canon, "cluster_id")


def cluster_cohesion(clusters: DataFrame, features: DataFrame) -> DataFrame:
    """(cluster_id, n_members, n_edges, density_micro, min_jacc_micro,
    mean_jacc_micro, bridge_risk) for every non-singleton cluster — the
    post-clustering QUALITY AUDIT transitive closure demands: closure
    happily glues two real entities through one spurious edge, and this
    table is where that shows. `density_micro` = ⌊1e6·2E/(n(n−1))⌋;
    `min_jacc_micro` is the weakest glue edge's token-Jaccard;
    `bridge_risk` = 1 when the cluster is a TREE (E = n−1): every edge
    is a cut edge, so one bad judgment split-brains the entity. Review
    queues sort by (bridge_risk DESC, min_jacc_micro ASC).

    Inputs: cluster assignment + the *match-edge* feature rows
    (pair_features filtered by the match rule — the edges closure used).
    All-integer micro quantization, engine-portable.

    Scale shape: two rec_key equi-joins tag each edge with its endpoint
    clusters, then ONE partial-agg'd groupBy(cluster_id); member counts
    are a second groupBy on the assignment table. Nothing per-cluster is
    enumerated — a hot cluster costs its own edge count, never n²."""
    ca = clusters.select(
        F.col("rec_key").alias("a_key"), F.col("cluster_id").alias("a_cl")
    )
    cb = clusters.select(
        F.col("rec_key").alias("b_key"), F.col("cluster_id").alias("b_cl")
    )
    jacc = F.floor(
        (F.lit(1_000_000.0) * F.col("inter"))
        / F.greatest(F.col("uni"), F.lit(1)).cast("double")
    ).cast("long")
    intra = (
        features.join(ca, "a_key")
        .join(cb, "b_key")
        .filter(F.col("a_cl") == F.col("b_cl"))
        .select(F.col("a_cl").alias("cluster_id"), jacc.alias("jm"))
    )
    est = intra.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_edges"),
        F.min("jm").alias("min_jacc_micro"),
        F.expr("sum(jm) div count(*)").alias("mean_jacc_micro"),
    )
    sizes = (
        clusters.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .filter(F.col("n_members") >= 2)
    )
    dens = F.floor(
        (F.lit(1_000_000.0) * 2 * F.col("n_edges"))
        / (F.col("n_members").cast("double") * (F.col("n_members") - F.lit(1)))
    ).cast("long")
    return sizes.join(est, "cluster_id").select(
        "cluster_id",
        "n_members",
        "n_edges",
        dens.alias("density_micro"),
        "min_jacc_micro",
        "mean_jacc_micro",
        (F.col("n_edges") == F.col("n_members") - 1).cast("int").alias("bridge_risk"),
    )


def cluster_cohesion_sql(
    clusters_rel: str, features_rel: str, prefix_ctes: str = ""
) -> str:
    pre = f"{prefix_ctes}," if prefix_ctes else ""
    return f"""
    WITH {pre} ch_intra AS (
      SELECT ca.cluster_id,
             CAST(floor((1000000.0 * f.inter)
                  / CAST(greatest(f.uni, 1) AS DOUBLE)) AS BIGINT) AS jm
      FROM ({features_rel}) f
      JOIN ({clusters_rel}) ca ON f.a_key = ca.rec_key
      JOIN ({clusters_rel}) cb ON f.b_key = cb.rec_key
      WHERE ca.cluster_id = cb.cluster_id
    ),
    ch_est AS (
      SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_edges,
             min(jm) AS min_jacc_micro,
             CAST(sum(jm) // count(*) AS BIGINT) AS mean_jacc_micro
      FROM ch_intra GROUP BY cluster_id
    ),
    ch_sz AS (
      SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members
      FROM ({clusters_rel}) GROUP BY cluster_id HAVING count(*) >= 2
    )
    SELECT s.cluster_id, s.n_members, e.n_edges,
           CAST(floor((1000000.0 * 2 * e.n_edges)
                / (CAST(s.n_members AS DOUBLE) * (s.n_members - 1))) AS BIGINT)
             AS density_micro,
           e.min_jacc_micro, e.mean_jacc_micro,
           CAST(e.n_edges = s.n_members - 1 AS INTEGER) AS bridge_risk
    FROM ch_sz s JOIN ch_est e USING (cluster_id)
    """


def golden_records_sql(records_rel: str, clusters_rel: str) -> str:
    return f"""
    WITH gr_j AS (
      SELECT c.cluster_id, r.conv_id, r.norm_text, len(r.tokens) AS nt
      FROM ({records_rel}) r JOIN ({clusters_rel}) c USING (rec_key)
    ),
    gr_stats AS (
      SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_members,
             CAST(count(DISTINCT conv_id) AS BIGINT) AS n_convs,
             CAST(sum(nt) AS BIGINT) AS total_tokens
      FROM gr_j GROUP BY cluster_id
    ),
    gr_counts AS (
      SELECT cluster_id, norm_text, count(*) AS c
      FROM gr_j GROUP BY cluster_id, norm_text
    ),
    gr_canon AS (
      SELECT cluster_id,
             arg_min(norm_text,
                     lpad(CAST(2147483647 - c AS VARCHAR), 10, '0')
                       || '|' || norm_text) AS canonical_text
      FROM gr_counts GROUP BY cluster_id
    )
    SELECT s.cluster_id, s.n_members, s.n_convs, s.total_tokens,
           g.canonical_text
    FROM gr_stats s JOIN gr_canon g USING (cluster_id)
    """
