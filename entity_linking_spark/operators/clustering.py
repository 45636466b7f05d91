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
  * every superstep ends in a `persist()` materialized by the fused
    convergence aggregate (ONE job per superstep), with an eager
    `localCheckpoint()` every 4th round to truncate lineage — iteration
    over DataFrames otherwise builds an exponentially deep lineage that
    kills the planner (the one Spark failure mode the reference never
    had to face).
  * convergence is the exact star-forest test (no node both parent and
    child, no child with two parents), a one-row aggregate over each
    superstep's cached checkpoint — convergence is seen the moment the
    stable state FORMS, so the loop never pays the extra no-op
    superstep + exceptAll the set-equality probe needed; never a
    collect of the edge set.
  * on a cluster, `localCheckpoint` would be `checkpoint()` to HDFS/Iceberg
    so a lost executor doesn't force a full recompute (resume plumbing in
    plans/pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sym(edges: DataFrame) -> DataFrame:
    """Both orientations of every edge in ONE scan via explode — NOT a
    self-union. (A self-union here trips a Spark 4.1.2 constraint-
    propagation bug — `UnionBase.rewriteConstraints` dies with
    "key not found: u#…" when the union sits over a checkpointed
    LogicalRDD produced from certain caller plans, e.g. the incremental
    path's parquet-backed star-edges ∪ fresh-match-edges input. The
    explode form is also one scan instead of two.)"""
    return edges.select(
        F.explode(
            F.array(
                F.struct(F.col("u").alias("u"), F.col("v").alias("v")),
                F.struct(F.col("v").alias("u"), F.col("u").alias("v")),
            )
        ).alias("x")
    ).select("x.u", "x.v")


def _large_star(edges: DataFrame) -> DataFrame:
    """large-star: for every node u, connect all strictly-larger neighbors
    to m = min(N(u) ∪ {u}). Input/output: undirected edge list (u, v)."""
    nbrs = _sym(edges)
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
    all small neighbors and u itself to m = min(N≤(u) ∪ {u}).

    The (v→m) moves and the (u→m) self-edges are emitted from ONE
    explode over the oriented⋈m join (no self-union; see `_sym`): each
    joined row (u, v, m) yields candidate edges (v, m) and (u, m); the
    x.u != x.v filter drops the v = m case exactly as the old
    `moved.filter(v != m)` did, u != m always holds (m ≤ v < u), and the
    trailing distinct collapses the per-row duplication of (u, m) that
    the separate one-row-per-u `self_edge` table used to avoid."""
    oriented = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    )
    m = oriented.groupBy("u").agg(F.min("v").alias("m"))
    return (
        oriented.join(m, "u")
        .select(
            F.explode(
                F.array(
                    F.struct(F.col("v").alias("u"), F.col("m").alias("v")),
                    F.struct(F.col("u").alias("u"), F.col("m").alias("v")),
                )
            ).alias("x")
        )
        .select("x.u", "x.v")
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def connected_components(
    edges: DataFrame, max_iter: int = 20, checkpoint: bool = True
) -> DataFrame:
    """edges(a_key, b_key) → (rec_key, cluster_id). Alternating large/small
    star until the edge set is a stable star forest. Only nodes that appear
    in an edge are returned; callers union singletons themselves."""
    e0 = edges.select(F.col("a_key").alias("u"), F.col("b_key").alias("v")).filter(
        F.col("u") != F.col("v")
    )
    # min-neighbor CONTRACTION pre-pass (round 5): ER match-edge sets are
    # clique-heavy — every hot alias block emits O(cap²) intra-clique
    # edges, and profiling the 800k-turn bench corpus showed the star
    # loop's first superstep over the raw 7.4M-edge set was 60%+ of the
    # whole CC wall (the 372k-edge star forest it produces is 20×
    # smaller). One labeling pass m(u) = min(N(u) ∪ {u}) rewrites each
    # edge (u,v) into star edges (u,m(u)), (v,m(v)) and the contracted
    # cross edge (m(u),m(v)): a k-clique collapses to its final k−1-edge
    # star HERE, in one agg + one join, instead of inside the 6-shuffle
    # superstep. Exact: every node keeps an incident edge (mu ≤ its
    # neighbors, so either its own star edge or a neighbor's points at
    # it) and connectivity is preserved edge-by-edge, so components —
    # and their min members — are unchanged. This also subsumes the old
    # entry distinct (the contraction output is distinct-ed), saving one
    # full-edge-set shuffle.
    lbl = _sym(e0).groupBy("u").agg(F.min("v").alias("mn"))
    lbl = lbl.select("u", F.least("mn", "u").alias("m"))
    e = (
        e0.join(
            lbl.select(F.col("u").alias("_au"), F.col("m").alias("_mu")),
            F.col("u") == F.col("_au"),
        )
        .join(
            lbl.select(F.col("u").alias("_bv"), F.col("m").alias("_mv")),
            F.col("v") == F.col("_bv"),
        )
        .select(
            F.explode(
                F.array(
                    F.struct(F.col("u").alias("u"), F.col("_mu").alias("v")),
                    F.struct(F.col("v").alias("u"), F.col("_mv").alias("v")),
                    F.struct(F.col("_mu").alias("u"), F.col("_mv").alias("v")),
                )
            ).alias("x")
        )
        .select("x.u", "x.v")
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    if checkpoint:
        e = e.localCheckpoint()
    for it in range(max_iter):
        e2 = _small_star(_large_star(e))
        if checkpoint:
            # eager checkpoint: truncates lineage AND materializes, so
            # the convergence aggregate below runs over cached blocks.
            # (A lazy localCheckpoint(eager=False) — or persist() — that
            # would fuse materialization into the aggregate's job trips
            # an optimizer AttributeMap bug on Spark 4.1.2 for some
            # caller plans: "key not found: u#…"; the eager form is the
            # r4-proven path.)
            e2 = e2.localCheckpoint()
        # exact star-forest convergence test, one cheap aggregate job
        # over the fresh checkpoint: small_star output is always (child, parent)
        # with parent < child, and the stable states of small∘large are
        # precisely rooted star forests — every child has exactly ONE
        # parent and no parent is itself a child. Count violations with
        # one endpoint-exploded aggregate; zero violations ⟺ the edge
        # set is the final (member → min-root) star forest, which is
        # also exactly the form the extraction below assumes. Detects
        # convergence the moment the stable state FORMS — the r4
        # set-equality probe needed one further (no-op) superstep plus
        # an exceptAll to see it. Exact, not probabilistic: no hashes,
        # no count screens.
        deg = (
            e2.select(
                F.explode(
                    F.array(
                        F.struct(
                            F.col("u").alias("node"),
                            F.lit(1).alias("c"),
                            F.lit(0).alias("p"),
                        ),
                        F.struct(
                            F.col("v").alias("node"),
                            F.lit(0).alias("c"),
                            F.lit(1).alias("p"),
                        ),
                    )
                ).alias("x")
            )
            .groupBy("x.node")
            .agg(F.sum("x.c").alias("nc"), F.sum("x.p").alias("np"))
        )
        viol = deg.agg(
            F.coalesce(
                F.sum(
                    (
                        (F.col("nc") > 1)
                        | ((F.col("nc") > 0) & (F.col("np") > 0))
                    ).cast("long")
                ),
                F.lit(0),
            ).alias("viol")
        ).collect()[0]["viol"]
        e = e2
        if viol == 0:
            break
    # stable state: every edge is (member, root-min); members and roots
    # come out of one explode scan (no self-union — see _sym)
    return (
        e.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("u").alias("rec_key"),
                        F.col("v").alias("cluster_id"),
                    ),
                    F.struct(
                        F.col("v").alias("rec_key"),
                        F.col("v").alias("cluster_id"),
                    ),
                )
            ).alias("x")
        )
        .select("x.rec_key", "x.cluster_id")
        .distinct()
    )


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
    # LEFT join from sizes (ADVICE r4): when `features` is a SUBSET of
    # the edges the clustering consumed, a multi-member cluster can have
    # ZERO intra-cluster feature edges — precisely the worst-cohesion
    # cluster a review queue must surface, not silently omit. Such rows
    # get n_edges=0, density 0, NULL jaccard stats, bridge_risk 1.
    # bridge_risk generalizes from `== n-1` (tree) to `<= n-1`
    # (under-connected): identical on every input where features ⊇ the
    # clustering's edge set (intra edges ≥ n−1 by connectivity), so the
    # gated query's values are unchanged.
    ne = F.coalesce("n_edges", F.lit(0)).cast("long")
    dens = F.floor(
        (F.lit(1_000_000.0) * 2 * ne)
        / (F.col("n_members").cast("double") * (F.col("n_members") - F.lit(1)))
    ).cast("long")
    return sizes.join(est, "cluster_id", "left").select(
        "cluster_id",
        "n_members",
        ne.alias("n_edges"),
        dens.alias("density_micro"),
        "min_jacc_micro",
        "mean_jacc_micro",
        (ne <= F.col("n_members") - 1).cast("int").alias("bridge_risk"),
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
    SELECT s.cluster_id, s.n_members,
           coalesce(e.n_edges, 0) AS n_edges,
           CAST(floor((1000000.0 * 2 * coalesce(e.n_edges, 0))
                / (CAST(s.n_members AS DOUBLE) * (s.n_members - 1))) AS BIGINT)
             AS density_micro,
           e.min_jacc_micro, e.mean_jacc_micro,
           CAST(coalesce(e.n_edges, 0) <= s.n_members - 1 AS INTEGER) AS bridge_risk
    FROM ch_sz s LEFT JOIN ch_est e USING (cluster_id)
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
