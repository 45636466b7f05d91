"""Graph-walk scoring: PageRank over the match-edge graph.

Reference parity: `baseline/RandomGraphWalk.java` builds a referent graph
and runs JUNG `PageRankWithPriors` with α = 0.1
(`/root/reference/src/baseline/RandomGraphWalk.java:45,166-188`) to rank
candidate entities; weak components over the same graph feed its stats
(`:340-346`). Our engine's analog ranks records by stationary mass on the
undirected match-edge graph — a cluster-centrality signal (which record
is the best exemplar of its entity cluster), useful for picking canonical
records at dedup time.

Semantics (kept deliberately simple so the DuckDB oracle can replay it
exactly with K unrolled iterations):

  * graph = symmetrized match edges ∪ one self-loop per node (self-loops
    make every node non-dangling, so no rank mass leaks — the reference
    handles dangling mass inside JUNG; self-loops are the relational
    equivalent that needs no special case)
  * uniform out-weights 1/outdeg (the reference's referent graph uses
    normalized relatedness weights, `RandomGraphWalk.java:214-279`; with
    a weighted edge input the same code runs unchanged — weight column
    instead of 1/outdeg)
  * p₀ = 1/N;  p_{k+1} = α/N + (1-α)·Σ_in p_k/outdeg;  α = 0.1 per the
    reference (`RandomGraphWalk.java:45`)
  * K fixed iterations (driver loop; `localCheckpoint` every superstep —
    same lineage discipline as connected components)

Invariant (reference `RandomGraphWalk.java:89-98,281-320` G7 analog):
Σ p = 1 at every iteration; asserted in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ALPHA = 0.1  # damping, per reference RandomGraphWalk.java:45
DEFAULT_ITERS = 10


def _sym_edges_with_loops(edges: DataFrame, nodes: DataFrame) -> DataFrame:
    """(src, dst) symmetric closure of match edges plus one self-loop per
    node. nodes: (rec_key)."""
    sym = edges.select(
        F.col("a_key").alias("src"), F.col("b_key").alias("dst")
    ).union(edges.select(F.col("b_key").alias("src"), F.col("a_key").alias("dst")))
    loops = nodes.select(
        F.col("rec_key").alias("src"), F.col("rec_key").alias("dst")
    )
    return sym.union(loops).distinct()


def pagerank(
    nodes: DataFrame,
    edges: DataFrame,
    iters: int = DEFAULT_ITERS,
    alpha: float = ALPHA,
    checkpoint: bool = True,
) -> DataFrame:
    """(rec_key, rank): fixed-iteration PageRank, rank rounded to 6 dp.

    nodes: (rec_key); edges: (a_key, b_key) undirected match edges.
    Each superstep is one join + one groupBy — the standard two-shuffle
    PR step; out-degree is precomputed once and broadcast-joined."""
    g = _sym_edges_with_loops(edges, nodes)
    outdeg = g.groupBy("src").agg(F.count("*").alias("outdeg"))
    g = g.join(outdeg, "src")
    if checkpoint:
        g = g.localCheckpoint()
    n_nodes = nodes.count()  # scalar: fixed for the whole run
    p = nodes.select(
        F.col("rec_key").alias("node"), F.lit(1.0 / n_nodes).alias("p")
    )
    if checkpoint:
        p = p.localCheckpoint()
    for _ in range(iters):
        contrib = (
            g.join(p, g["src"] == p["node"])
            .select(F.col("dst").alias("node"), (F.col("p") / F.col("outdeg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        p = nodes.select(F.col("rec_key").alias("node")).join(
            contrib, "node", "left"
        ).select(
            "node",
            (
                F.lit(alpha / n_nodes)
                + F.lit(1.0 - alpha) * F.coalesce(F.col("inflow"), F.lit(0.0))
            ).alias("p"),
        )
        if checkpoint:
            p = p.localCheckpoint()
    return p.select(F.col("node").alias("rec_key"), F.round("p", 6).alias("rank"))


def pagerank_ctes(
    nodes_rel: str,
    edges_rel: str,
    iters: int = DEFAULT_ITERS,
    alpha: float = ALPHA,
) -> tuple[str, str]:
    """(cte_body, final_select) so callers can splice these CTEs after
    their own WITH clause (e.g. the linking-pipeline oracle chain).
    nodes_rel must yield (rec_key); edges_rel (a_key, b_key)."""
    # MATERIALIZED: DuckDB inlines plain CTEs at every reference site;
    # gd is referenced by all K iteration CTEs and itself embeds the full
    # upstream chain, so inlining is exponential in K without it.
    ctes = [
        f"""nodes_m AS MATERIALIZED (SELECT rec_key FROM ({nodes_rel})),
        g AS MATERIALIZED (
          SELECT src, dst FROM (
            SELECT a_key AS src, b_key AS dst FROM ({edges_rel})
            UNION
            SELECT b_key AS src, a_key AS dst FROM ({edges_rel})
            UNION
            SELECT rec_key AS src, rec_key AS dst FROM nodes_m
          )
        )""",
        "gd AS MATERIALIZED (SELECT g.src, g.dst, d.outdeg FROM g JOIN ("
        "SELECT src, count(*) AS outdeg FROM g GROUP BY src) d USING (src))",
        "nn AS MATERIALIZED (SELECT count(*) AS n FROM nodes_m)",
        "p0 AS (SELECT rec_key AS node, 1.0 / nn.n AS p FROM nodes_m CROSS JOIN nn)",
    ]
    for k in range(1, iters + 1):
        ctes.append(
            f"""p{k} AS MATERIALIZED (
              SELECT nd.node,
                     {alpha!r} / nn.n + {1.0 - alpha!r} * coalesce(i.inflow, 0.0) AS p
              FROM (SELECT rec_key AS node FROM nodes_m) nd
              CROSS JOIN nn
              LEFT JOIN (
                SELECT gd.dst AS node, sum(pp.p / gd.outdeg) AS inflow
                FROM gd JOIN p{k - 1} pp ON gd.src = pp.node
                GROUP BY gd.dst
              ) i ON nd.node = i.node
            )"""
        )
    body = ",\n".join(ctes)
    return body, f"SELECT node AS rec_key, round(p, 6) AS rank FROM p{iters}"


def pagerank_sql(
    nodes_rel: str,
    edges_rel: str,
    iters: int = DEFAULT_ITERS,
    alpha: float = ALPHA,
) -> str:
    body, final = pagerank_ctes(nodes_rel, edges_rel, iters, alpha)
    return f"WITH {body} {final}"


# ---------------------------------------------------------------------------
# G5 — personalized priors (PageRankWithPriors parity)
# ---------------------------------------------------------------------------


def pagerank_with_priors(
    nodes_prior: DataFrame,
    edges: DataFrame,
    iters: int = DEFAULT_ITERS,
    alpha: float = ALPHA,
    checkpoint: bool = True,
) -> DataFrame:
    """(rec_key, rank): PageRank with a personalized teleport vector —
    the reference runs JUNG `PageRankWithPriors` with priors proportional
    to mention importance and zero for entities
    (`/root/reference/src/baseline/RandomGraphWalk.java:45,166-188`,
    `baseline/Vertex.java:17-27`). `nodes_prior`: (rec_key, prior >= 0);
    teleport π = prior / Σprior, p₀ = π, p_{k+1} = α·π + (1-α)·inflow.
    Same two-shuffle superstep + localCheckpoint discipline as `pagerank`;
    Σp = 1 invariant holds (self-loops keep the chain dangling-free)."""
    nodes = nodes_prior.select("rec_key")
    g = _sym_edges_with_loops(edges, nodes)
    outdeg = g.groupBy("src").agg(F.count("*").alias("outdeg"))
    g = g.join(outdeg, "src")
    if checkpoint:
        g = g.localCheckpoint()
    psum = nodes_prior.agg(F.sum("prior").alias("s"))
    pi = (
        nodes_prior.crossJoin(F.broadcast(psum))
        .select(
            F.col("rec_key").alias("node"),
            (F.col("prior") / F.col("s")).alias("pi"),
        )
    )
    if checkpoint:
        pi = pi.localCheckpoint()
    p = pi.select("node", F.col("pi").alias("p"))
    for _ in range(iters):
        contrib = (
            g.join(p, g["src"] == p["node"])
            .select(F.col("dst").alias("node"), (F.col("p") / F.col("outdeg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        p = pi.join(contrib, "node", "left").select(
            "node",
            (
                F.lit(alpha) * F.col("pi")
                + F.lit(1.0 - alpha) * F.coalesce(F.col("inflow"), F.lit(0.0))
            ).alias("p"),
        )
        if checkpoint:
            p = p.localCheckpoint()
    return p.select(F.col("node").alias("rec_key"), F.round("p", 6).alias("rank"))


def pagerank_weighted(
    nodes: DataFrame,
    edges_w: DataFrame,
    iters: int = DEFAULT_ITERS,
    alpha: float = ALPHA,
    checkpoint: bool = True,
) -> DataFrame:
    """(rec_key, rank): PageRank over WEIGHTED edges — the reference's
    referent-graph G4 edge semantics. `RandomGraphWalk.java:214-279`
    normalizes entity-entity transition weights by relatedness/Σrelatedness
    and falls back to uniform 1/k when every weight on a node is zero
    (`:203-212`). Here: edges_w = (a_key, b_key, weight >= 0) undirected;
    the graph is symmetrized and every node gets a weight-0 self-loop, and
    per source the transition share is

        share = weight / Σ_out weight      if Σ_out weight > 0
              = 1 / outdeg                 otherwise (all-zero fallback)

    so Σ_out share = 1 always (the self-loop keeps isolated nodes
    dangling-free: their whole mass walks the loop). Teleport and
    iteration count match `pagerank`; invariant Σ rank = 1 per superstep
    (G7, asserted in tests). The share column is computed ONCE before the
    loop (one groupBy + one join), so each superstep stays the standard
    two-shuffle join+agg."""
    sym = edges_w.select(
        F.col("a_key").alias("src"), F.col("b_key").alias("dst"), "weight"
    ).union(
        edges_w.select(
            F.col("b_key").alias("src"), F.col("a_key").alias("dst"), "weight"
        )
    )
    loops = nodes.select(
        F.col("rec_key").alias("src"),
        F.col("rec_key").alias("dst"),
        F.lit(0.0).alias("weight"),
    )
    g = sym.union(loops).groupBy("src", "dst").agg(F.max("weight").alias("weight"))
    outw = g.groupBy("src").agg(
        F.sum("weight").alias("sw"), F.count("*").alias("outdeg")
    )
    g = g.join(outw, "src").select(
        "src",
        "dst",
        F.when(F.col("sw") > 0, F.col("weight") / F.col("sw"))
        .otherwise(F.lit(1.0) / F.col("outdeg"))
        .alias("share"),
    )
    if checkpoint:
        g = g.localCheckpoint()
    n_nodes = nodes.count()
    p = nodes.select(F.col("rec_key").alias("node"), F.lit(1.0 / n_nodes).alias("p"))
    if checkpoint:
        p = p.localCheckpoint()
    for _ in range(iters):
        contrib = (
            g.join(p, g["src"] == p["node"])
            .select(F.col("dst").alias("node"), (F.col("p") * F.col("share")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("inflow"))
        )
        p = nodes.select(F.col("rec_key").alias("node")).join(
            contrib, "node", "left"
        ).select(
            "node",
            (
                F.lit(alpha / n_nodes)
                + F.lit(1.0 - alpha) * F.coalesce(F.col("inflow"), F.lit(0.0))
            ).alias("p"),
        )
        if checkpoint:
            p = p.localCheckpoint()
    return p.select(F.col("node").alias("rec_key"), F.round("p", 6).alias("rank"))


def pagerank_weighted_ctes(
    nodes_rel: str,
    edges_w_rel: str,
    iters: int = DEFAULT_ITERS,
    alpha: float = ALPHA,
) -> tuple[str, str]:
    """DuckDB twin of `pagerank_weighted`. nodes_rel must yield (rec_key);
    edges_w_rel (a_key, b_key, weight)."""
    ctes = [
        f"""nodesw_m AS MATERIALIZED (SELECT rec_key FROM ({nodes_rel})),
        gw_raw AS MATERIALIZED (
          SELECT src, dst, max(weight) AS weight FROM (
            SELECT a_key AS src, b_key AS dst, weight FROM ({edges_w_rel})
            UNION ALL
            SELECT b_key AS src, a_key AS dst, weight FROM ({edges_w_rel})
            UNION ALL
            SELECT rec_key AS src, rec_key AS dst, 0.0 AS weight FROM nodesw_m
          ) GROUP BY src, dst
        )""",
        """gw AS MATERIALIZED (
          SELECT g.src, g.dst,
                 CASE WHEN o.sw > 0 THEN g.weight / o.sw
                      ELSE 1.0 / o.outdeg END AS share
          FROM gw_raw g JOIN (
            SELECT src, sum(weight) AS sw, count(*) AS outdeg
            FROM gw_raw GROUP BY src
          ) o USING (src)
        )""",
        "nnw AS MATERIALIZED (SELECT count(*) AS n FROM nodesw_m)",
        "pw0 AS (SELECT rec_key AS node, 1.0 / nnw.n AS p "
        "FROM nodesw_m CROSS JOIN nnw)",
    ]
    for k in range(1, iters + 1):
        ctes.append(
            f"""pw{k} AS MATERIALIZED (
              SELECT nd.node,
                     {alpha!r} / nnw.n + {1.0 - alpha!r} * coalesce(i.inflow, 0.0) AS p
              FROM (SELECT rec_key AS node FROM nodesw_m) nd
              CROSS JOIN nnw
              LEFT JOIN (
                SELECT gw.dst AS node, sum(pp.p * gw.share) AS inflow
                FROM gw JOIN pw{k - 1} pp ON gw.src = pp.node
                GROUP BY gw.dst
              ) i ON nd.node = i.node
            )"""
        )
    body = ",\n".join(ctes)
    return body, f"SELECT node AS rec_key, round(p, 6) AS rank FROM pw{iters}"


def pagerank_priors_ctes(
    nodes_rel: str,
    edges_rel: str,
    iters: int = DEFAULT_ITERS,
    alpha: float = ALPHA,
) -> tuple[str, str]:
    """DuckDB twin of `pagerank_with_priors`. nodes_rel must yield
    (rec_key, prior); edges_rel (a_key, b_key)."""
    ctes = [
        f"""nodesp_m AS MATERIALIZED (SELECT rec_key, prior FROM ({nodes_rel})),
        gp AS MATERIALIZED (
          SELECT src, dst FROM (
            SELECT a_key AS src, b_key AS dst FROM ({edges_rel})
            UNION
            SELECT b_key AS src, a_key AS dst FROM ({edges_rel})
            UNION
            SELECT rec_key AS src, rec_key AS dst FROM nodesp_m
          )
        )""",
        "gdp AS MATERIALIZED (SELECT gp.src, gp.dst, d.outdeg FROM gp JOIN ("
        "SELECT src, count(*) AS outdeg FROM gp GROUP BY src) d USING (src))",
        "psum AS MATERIALIZED (SELECT sum(prior) AS s FROM nodesp_m)",
        "piv AS MATERIALIZED (SELECT rec_key AS node, prior / psum.s AS pi "
        "FROM nodesp_m CROSS JOIN psum)",
        "pp0 AS (SELECT node, pi AS p FROM piv)",
    ]
    for k in range(1, iters + 1):
        ctes.append(
            f"""pp{k} AS MATERIALIZED (
              SELECT piv.node,
                     {alpha!r} * piv.pi + {1.0 - alpha!r} * coalesce(i.inflow, 0.0) AS p
              FROM piv
              LEFT JOIN (
                SELECT gdp.dst AS node, sum(pq.p / gdp.outdeg) AS inflow
                FROM gdp JOIN pp{k - 1} pq ON gdp.src = pq.node
                GROUP BY gdp.dst
              ) i ON piv.node = i.node
            )"""
        )
    body = ",\n".join(ctes)
    return body, f"SELECT node AS rec_key, round(p, 6) AS rank FROM pp{iters}"
