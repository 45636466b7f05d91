"""Meta-blocking — weighting and pruning the comparison graph
(Papadakis, Koutrika, Palpanas, Nejdl 2014, TKDE "Meta-Blocking: Taking
Entity Resolution to the Next Level").

Redundancy-positive blocking (our `blocking.token_blocks` /
`lsh_blocks`: one record appears in many blocks) carries a signal the
plain pair generator throws away: the MORE blocks two records share, the
likelier they match. Meta-blocking materializes the blocking graph's
edge weights and prunes low-evidence comparisons BEFORE the expensive
feature scorer runs — at 100 TB this is the difference between scoring
every co-occurring pair once and scoring only the pairs with real
co-occurrence evidence.

Weights (both exact-integer / micro-quantized, engine-portable):

  * CBS  — common-blocks scheme: the number of shared (capped) blocks.
  * JS   — Jaccard scheme: micro-floor of |shared| / (|Ba|+|Bb|−|shared|),
           one pinned double division per pair.

Pruning:

  * WEP  — weight-edge pruning: keep pairs with js_micro ≥ the global
           floor-mean weight (one scalar agg, broadcast back).
  * CNP  — cardinality-node pruning: keep a pair if it ranks in either
           endpoint's top-k by (js_micro, cbs, pair-key) — per-record
           windows, bounded by the record's own pair list.

100 TB shape: pair weights are ONE groupBy over the block self-join
(the same join `pairs.pairs_from_capped` already does, aggregated
instead of distinct-ed — partial-agg'd map-side); per-record block
counts are a groupBy on the capped table joined back twice; WEP's
threshold is a 1-row aggregate crossJoined (broadcast) onto the edge
list; CNP windows partition by rec_key. Everything inherits the block
cap's structural skew bound.

Reference analog: the 2%-frequency candidate cut
(`EntityMentionFrequencyIndexBuilder.java:138-167`) is frequency-based
comparison pruning at the dictionary level; meta-blocking is the
principled graph-level generalization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MICRO = 1_000_000
CNP_K = 10


def pair_block_weights(capped: DataFrame) -> DataFrame:
    """(a_key, b_key, cbs, js_micro) — the weighted comparison graph over
    a capped block table (rec_key, block_key). cbs = shared blocks;
    js_micro = floor(1e6 · cbs / (n_a + n_b − cbs))."""
    nb = capped.groupBy("rec_key").agg(F.count("*").alias("nb"))
    a, b = capped.alias("a"), capped.alias("b")
    cbs = (
        a.join(b, "block_key")
        .filter(F.col("a.rec_key") < F.col("b.rec_key"))
        .groupBy(
            F.col("a.rec_key").alias("a_key"), F.col("b.rec_key").alias("b_key")
        )
        .agg(F.count("*").alias("cbs"))
    )
    na = nb.select(F.col("rec_key").alias("a_key"), F.col("nb").alias("na"))
    nbb = nb.select(F.col("rec_key").alias("b_key"), F.col("nb").alias("nb"))
    js = F.floor(
        (F.lit(float(MICRO)) * F.col("cbs"))
        / (F.col("na") + F.col("nb") - F.col("cbs")).cast("double")
    ).cast("long")
    return (
        cbs.join(na, "a_key")
        .join(nbb, "b_key")
        .select("a_key", "b_key", "cbs", js.alias("js_micro"))
    )


def pair_block_weights_sql(capped_rel: str) -> str:
    return f"""
    SELECT c.a_key, c.b_key, c.cbs,
           CAST(floor(({MICRO}.0 * c.cbs)
                / CAST(na.nb + nbb.nb - c.cbs AS DOUBLE)) AS BIGINT) AS js_micro
    FROM (
      SELECT a.rec_key AS a_key, b.rec_key AS b_key, count(*) AS cbs
      FROM ({capped_rel}) a JOIN ({capped_rel}) b USING (block_key)
      WHERE a.rec_key < b.rec_key
      GROUP BY a.rec_key, b.rec_key
    ) c
    JOIN (SELECT rec_key, count(*) AS nb FROM ({capped_rel}) GROUP BY rec_key) na
      ON c.a_key = na.rec_key
    JOIN (SELECT rec_key, count(*) AS nb FROM ({capped_rel}) GROUP BY rec_key) nbb
      ON c.b_key = nbb.rec_key
    """


def wep_prune(weights: DataFrame) -> DataFrame:
    """Weight-edge pruning: keep pairs with js_micro ≥ the global
    floor-mean weight. The threshold is exact integer arithmetic
    (Σ js_micro // n over int64) on a 1-row aggregate broadcast back, so
    the edge list crosses no extra shuffle."""
    thr = weights.agg(F.expr("sum(js_micro) div count(*)").alias("thr"))
    return (
        weights.crossJoin(F.broadcast(thr))
        .filter(F.col("js_micro") >= F.col("thr"))
        .select("a_key", "b_key", "cbs", "js_micro")
    )


def wep_prune_sql(capped_rel: str, prefix_ctes: str = "") -> str:
    """`prefix_ctes` lets the caller prepend the pipeline CTE chain that
    defines `capped_rel` (SQL forbids stacking two WITH clauses)."""
    pre = f"{prefix_ctes}," if prefix_ctes else ""
    return f"""
    WITH {pre} mb_w AS MATERIALIZED ({pair_block_weights_sql(capped_rel)}),
    mb_thr AS (SELECT CAST(sum(js_micro) // count(*) AS BIGINT) AS thr FROM mb_w)
    SELECT w.a_key, w.b_key, w.cbs, w.js_micro
    FROM mb_w w CROSS JOIN mb_thr t
    WHERE w.js_micro >= t.thr
    """


def cnp_prune(weights: DataFrame, k: int = CNP_K) -> DataFrame:
    """Cardinality-node pruning: a pair survives if it is in the top-k of
    EITHER endpoint by (js_micro, cbs, partner-key) — the redefined-CNP
    union semantics. Per-record windows over each record's own pair
    list (bounded by its block memberships × cap), deterministic
    tie-break."""
    lhs = weights.select(
        F.col("a_key").alias("rec_key"), F.col("b_key").alias("other"),
        "a_key", "b_key", "cbs", "js_micro",
    )
    rhs = weights.select(
        F.col("b_key").alias("rec_key"), F.col("a_key").alias("other"),
        "a_key", "b_key", "cbs", "js_micro",
    )
    both = lhs.unionByName(rhs)
    w = Window.partitionBy("rec_key").orderBy(
        F.col("js_micro").desc(), F.col("cbs").desc(), F.col("other")
    )
    return (
        both.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("a_key", "b_key", "cbs", "js_micro")
        .distinct()
    )


def cnp_prune_sql(capped_rel: str, k: int = CNP_K, prefix_ctes: str = "") -> str:
    pre = f"{prefix_ctes}," if prefix_ctes else ""
    return f"""
    WITH {pre} mb_w AS MATERIALIZED ({pair_block_weights_sql(capped_rel)}),
    mb_dir AS (
      SELECT a_key AS rec_key, b_key AS other, a_key, b_key, cbs, js_micro FROM mb_w
      UNION ALL
      SELECT b_key AS rec_key, a_key AS other, a_key, b_key, cbs, js_micro FROM mb_w
    )
    SELECT DISTINCT a_key, b_key, cbs, js_micro
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY rec_key ORDER BY js_micro DESC, cbs DESC, other
      ) AS rk FROM mb_dir
    ) WHERE rk <= {int(k)}
    """


PROGRESSIVE_BUDGET = 2000


def progressive_pairs(
    weights: DataFrame, budget: int = PROGRESSIVE_BUDGET
) -> DataFrame:
    """The top-`budget` comparisons by meta-blocking evidence — progressive
    / pay-as-you-go ER (Whang, Marmaros, Garcia-Molina 2013, "Pay-as-you-go
    entity resolution"; Papenbrock et al. 2015): when the scoring budget
    can't cover every candidate, spend it on the pairs most likely to
    match FIRST, so resolution quality per dollar is maximized and the
    job can stop at any point with the best-available clustering.

    Ordering is (js_micro DESC, cbs DESC, a_key, b_key) — the same
    integer weights CNP/WEP use, with a total deterministic tie-break.

    Scale shape: orderBy+limit compiles to TakeOrderedAndProject — each
    task keeps a `budget`-sized heap, the driver merges K heaps; no
    global sort, no single-reducer window. Memory is O(budget) per task,
    which is exactly the operator's contract."""
    return weights.orderBy(
        F.col("js_micro").desc(), F.col("cbs").desc(), "a_key", "b_key"
    ).limit(budget)


def progressive_pairs_sql(
    capped_rel: str, budget: int = PROGRESSIVE_BUDGET, prefix_ctes: str = ""
) -> str:
    pre = f"WITH {prefix_ctes}, " if prefix_ctes else "WITH "
    return f"""
    {pre} mb_w AS MATERIALIZED ({pair_block_weights_sql(capped_rel)})
    SELECT a_key, b_key, cbs, js_micro FROM mb_w
    ORDER BY js_micro DESC, cbs DESC, a_key, b_key
    LIMIT {int(budget)}
    """
