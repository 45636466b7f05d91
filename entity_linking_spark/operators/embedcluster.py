"""Distributed Lloyd's k-means over embeddings + SemDeDup semantic dedup.

Two operators a training-data pipeline needs once embeddings exist:

  * ``kmeans_fit`` — Lloyd's iterations where the centroid table never
    touches a shuffle: centroids live on the driver (k × dim integers),
    each assignment pass is ONE full scan with the centroids inlined as
    literal expression trees (whole-stage codegen, zero joins), and each
    update is ONE partial-aggregated groupBy that reduces the corpus to
    k rows. Per iteration the corpus crosses zero exchanges — this is
    the canonical 100 TB k-means shape (the same broadcast-centroid
    scan the IVF quantizer in `simsearch.ann_ivf_topk` points at).
  * ``semdedup_drops`` — SemDeDup (Abbas et al. 2023, public): cluster
    the corpus, then look for near-duplicate pairs ONLY inside each
    cluster (cos ≥ τ). The within-cell comparison set is BOUNDED IN
    CODE, not by convention: members are ranked by exact integer
    distance to their cell's centroid (the paper's within-cluster
    sort — near-duplicates have near-equal centroid distance, so they
    land on adjacent ranks), and each member is compared only against
    the `window` members ranked immediately before it. The pairs are
    produced by an EQUI-join on (cell, rank) against each member's
    exploded predecessor-rank window, so the enumerated pair count is
    ≤ N·window BY PLAN SHAPE — a hot cell (boilerplate-heavy corpora
    concentrate near-identical embeddings into a few cells) costs
    O(cell·window), never O(cell²). Keeper rule: in every matching
    pair the EARLIER-rank member (closest to centroid; ties → lowest
    vec_id) is kept and the later-rank member is dropped — the
    paper's keep-the-representative rule, deterministic because the
    rank order is exact-integer.

Exactness discipline (the driver value-hashes against DuckDB): all
k-means arithmetic is INTEGER. Components are scaled by 1e6 and
floored to bigint once; distances are exact integer sums of squares
(|x| ≤ 2e6 → per-term ≤ 4e12 → 64-dim sum ≤ 2.6e14, well inside
int64); centroid updates are exact floor divisions (python `//` on the
driver, the `(s - ((s%n)+n)%n)/n` identity in the oracle). Ties in the
argmin break to the lowest cell id. Iterations are therefore
bit-reproducible across engines and partitionings — no float-sum
order-dependence anywhere. (At 10^12-row scale per-cell component sums
approach int64 range; promote the sums to decimal(38,0) there — the
topology is unchanged.) Only SemDeDup's final cosine is float, via the
same strict left-fold dot product as `simsearch` (round 6dp).

Reference analog: the reference has no vector clustering; this extends
its candidate-blocking idea (`index/MentionEntitiesFrequencyIndex.java`
groups by surface key) to embedding space, where the "blocking key" is
the learned cell id.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .simsearch import DIM, dot_col, dot_sql, norm_col, norm_sql

SCALE = 1_000_000
KM_K = 8
KM_ITERS = 3
SEMDEDUP_COS = 0.30
# bounded within-cell comparison window (ranks by distance-to-centroid):
# each member is compared against at most this many predecessors, so the
# pair count is ≤ N·window regardless of how hot any one cell runs
SEMDEDUP_WINDOW = 32


# ---------------------------------------------------------------------------
# integer quantization (Spark + DuckDB twins)
# ---------------------------------------------------------------------------


def scaled_col(emb: Column) -> Column:
    """array<bigint>: floor(1e6 · double(component)) — one exact
    quantization shared by every iteration."""
    return F.transform(
        emb, lambda x: F.floor(x.cast("double") * F.lit(float(SCALE))).cast("long")
    )


def _scaled_cols_sql(emb: str, dim: int = DIM) -> str:
    return ", ".join(
        f"CAST(floor(CAST({emb}[{i + 1}] AS DOUBLE) * {float(SCALE)!r}) AS BIGINT) AS x{i}"
        for i in range(dim)
    )


def _dist_to(x: Column, cent: list[int]) -> Column:
    """Exact integer squared L2 distance to one literal centroid: strict
    left fold, stays in codegen (no join, no UDF). The centroid is ONE
    array literal (F.lit on the list) — CreateArray of 64 lit nodes
    would be re-materialized per row per cell."""
    carr = F.lit([int(v) for v in cent]).cast("array<bigint>")
    sq = F.zip_with(x, carr, lambda a, b: (a - b) * (a - b))
    return F.aggregate(sq, F.lit(0).cast("long"), lambda acc, t: acc + t)


def assign_expr(cents: dict[int, list[int]]) -> Column:
    """argmin cell id over the driver-held centroids, ties → lowest cell.
    Struct array_min compares (distance, cell) lexicographically, so the
    tie rule is part of the expression — deterministic in one scan."""
    structs = [
        F.struct(
            _dist_to(F.col("x"), cents[cell]).alias("d"),
            F.lit(int(cell)).alias("cell"),
        )
        for cell in sorted(cents)
    ]
    return F.array_min(F.array(*structs))["cell"]


# ---------------------------------------------------------------------------
# Lloyd's iterations
# ---------------------------------------------------------------------------


def kmeans_fit(
    embeddings: DataFrame,
    k: int = KM_K,
    iters: int = KM_ITERS,
    dim: int = DIM,
) -> tuple[DataFrame, dict[int, list[int]]]:
    """Run `iters` assignment passes (centroids updated between passes,
    init = the first k vec_ids, the same deterministic seed the IVF
    quantizer uses). Returns (assignment DF (vec_id, x, cell) under the
    FINAL centroids, final centroids dict).

    Driver state is k × dim ints; the corpus is scanned once per pass
    with zero shuffles (the k-row groupBy partial-aggregates map-side).
    A cell that empties simply drops out of the dict — both engines
    share that semantic because both derive live cells from the same
    group-by."""
    scaled = embeddings.select(
        "vec_id", scaled_col(F.col("embedding")).alias("x")
    ).localCheckpoint()  # quantize once; every pass re-reads this, not parquet

    cents = {
        int(r["vec_id"]): [int(v) for v in r["x"]]
        for r in scaled.filter(F.col("vec_id") < k).collect()
    }
    assigned = scaled.withColumn("cell", assign_expr(cents))
    for _ in range(iters - 1):
        sums = assigned.groupBy("cell").agg(
            F.count("*").alias("n"),
            *[F.sum(F.col("x")[i]).alias(f"s{i}") for i in range(dim)],
        ).collect()
        cents = {
            int(r["cell"]): [int(r[f"s{i}"]) // int(r["n"]) for i in range(dim)]
            for r in sums
        }
        assigned = scaled.withColumn("cell", assign_expr(cents))
    return assigned, cents


def kmeans_stats(
    embeddings: DataFrame,
    k: int = KM_K,
    iters: int = KM_ITERS,
    dim: int = DIM,
    assigned: DataFrame | None = None,
    cents: dict[int, list[int]] | None = None,
) -> DataFrame:
    """(cell, n_members, c0..c3): per-cell membership + the first four
    centroid components (exact ints — the hashable audit surface)."""
    if assigned is None or cents is None:
        assigned, cents = kmeans_fit(embeddings, k=k, iters=iters, dim=dim)
    spark = embeddings.sparkSession
    cent_rows = [
        (int(cell), *[int(v) for v in vec[:4]]) for cell, vec in sorted(cents.items())
    ]
    cent_df = spark.createDataFrame(cent_rows, "cell int, c0 long, c1 long, c2 long, c3 long")
    counts = assigned.groupBy("cell").agg(F.count("*").alias("n_members"))
    return counts.join(F.broadcast(cent_df), "cell").select(
        "cell", "n_members", "c0", "c1", "c2", "c3"
    )


# ---------------------------------------------------------------------------
# SemDeDup
# ---------------------------------------------------------------------------


def min_dist_expr(cents: dict[int, list[int]]) -> Column:
    """Exact integer squared distance from `x` to its ASSIGNED (= argmin)
    centroid: the min over the same literal-centroid distance expressions
    `assign_expr` ranks — zero joins, pure scan."""
    return F.array_min(
        F.array(*[_dist_to(F.col("x"), cents[cell]) for cell in sorted(cents)])
    )


def _ranked_members(
    embeddings: DataFrame,
    assigned: DataFrame,
    cents: dict[int, list[int]],
    dim: int,
) -> DataFrame:
    """(vec_id, cell, rnk, emb, nrm): members ranked 1..|cell| within
    their cell by (distance-to-centroid ASC, vec_id ASC) — the SemDeDup
    within-cluster sort. The distance is an exact int64, so the order is
    deterministic and engine-independent. One shuffle (the per-cell
    window sort); cell sort size is O(cell), never O(cell²)."""
    from pyspark.sql import Window

    dist = assigned.select("vec_id", "cell", min_dist_expr(cents).alias("d"))
    w = Window.partitionBy("cell").orderBy(F.col("d").asc(), F.col("vec_id").asc())
    return (
        dist.withColumn("rnk", F.row_number().over(w))
        .join(
            embeddings.select(
                "vec_id",
                F.col("embedding").alias("emb"),
                norm_col(F.col("embedding"), dim).alias("nrm"),
            ),
            "vec_id",
        )
        .select("vec_id", "cell", "rnk", "emb", "nrm")
    )


def semdedup_pairs(
    embeddings: DataFrame,
    k: int = KM_K,
    iters: int = KM_ITERS,
    dim: int = DIM,
    window: int = SEMDEDUP_WINDOW,
    assigned: DataFrame | None = None,
    cents: dict[int, list[int]] | None = None,
) -> DataFrame:
    """(cell, a_id, b_id, cos): the BOUNDED comparison set — member at
    rank r is paired with ranks max(1, r−window)..r−1 of the same cell,
    via explode(predecessor ranks) + equi-join on (cell, rank). The
    enumerated pair count is Σ min(rnk−1, window) ≤ N·window by plan
    construction: no quadratic blow-up is reachable, however hot a cell
    runs (pinned by tests/test_embedcluster.py's planted-hot-cell
    bound)."""
    if assigned is None or cents is None:
        assigned, cents = kmeans_fit(embeddings, k=k, iters=iters, dim=dim)
    ranked = _ranked_members(embeddings, assigned, cents, dim)
    a = ranked.select(
        "cell",
        F.col("rnk").alias("a_rnk"),
        F.col("vec_id").alias("a_id"),
        F.col("emb").alias("a_emb"),
        F.col("nrm").alias("a_nrm"),
    )
    b = ranked.select(
        "cell",
        F.col("rnk").alias("b_rnk"),
        F.col("vec_id").alias("b_id"),
        F.col("emb").alias("b_emb"),
        F.col("nrm").alias("b_nrm"),
    ).withColumn(
        "a_rnk",
        # explode drops the null for rank-1 members (no predecessors);
        # greatest() floors the window at rank 1
        F.explode(
            F.when(
                F.col("b_rnk") > 1,
                F.sequence(
                    F.greatest(F.col("b_rnk") - window, F.lit(1)),
                    F.col("b_rnk") - 1,
                ),
            )
        ),
    )
    cos = F.round(
        dot_col(F.col("a_emb"), F.col("b_emb"), dim) / (F.col("a_nrm") * F.col("b_nrm")),
        6,
    )
    return a.join(b, ["cell", "a_rnk"]).select(
        "cell", "a_id", "b_id", cos.alias("cos")
    )


def semdedup_drops(
    embeddings: DataFrame,
    k: int = KM_K,
    iters: int = KM_ITERS,
    tau: float = SEMDEDUP_COS,
    dim: int = DIM,
    window: int = SEMDEDUP_WINDOW,
    assigned: DataFrame | None = None,
    cents: dict[int, list[int]] | None = None,
) -> DataFrame:
    """(vec_id, cell, is_dup): is_dup=1 iff some member of the same
    k-means cell ranked within the preceding `window` positions of the
    within-cell centroid-distance order has cosine ≥ τ with this vector.
    The kept representative of every matching pair is the EARLIER-rank
    member (closest to centroid, ties → lowest vec_id) — SemDeDup's
    keep-the-representative rule. The comparison set is bounded in code
    (≤ N·window pairs, see `semdedup_pairs`), so a hot cell costs
    O(cell·window), never O(cell²)."""
    if assigned is None or cents is None:
        assigned, cents = kmeans_fit(embeddings, k=k, iters=iters, dim=dim)
    dropped = (
        semdedup_pairs(
            embeddings, k=k, iters=iters, dim=dim, window=window,
            assigned=assigned, cents=cents,
        )
        .filter(F.col("cos") >= tau)
        .select(F.col("b_id").alias("vec_id"))
        .distinct()
        .withColumn("_dup", F.lit(1))
    )
    return (
        assigned.select("vec_id", "cell")
        .join(dropped, "vec_id", "left")
        .select(
            "vec_id", "cell", F.coalesce(F.col("_dup"), F.lit(0)).alias("is_dup")
        )
    )


# ---------------------------------------------------------------------------
# DuckDB oracle twins
# ---------------------------------------------------------------------------


def _dist_sql(xrel: str, crel: str, dim: int) -> str:
    return " + ".join(
        f"({xrel}.x{i} - {crel}.x{i}) * ({xrel}.x{i} - {crel}.x{i})" for i in range(dim)
    )


def _fdiv_sql(s: str, n: str) -> str:
    # exact floor division on bigints (matches python //): strip the
    # positive modulus, then the now-exact quotient survives the double
    # round-trip (|quotient| ≤ 2e6 ≪ 2^53)
    return f"CAST(({s} - ((({s}) % ({n})) + ({n})) % ({n})) / ({n}) AS BIGINT)"


def kmeans_chain_sql(
    embeddings_rel: str = "embeddings",
    k: int = KM_K,
    iters: int = KM_ITERS,
    dim: int = DIM,
) -> tuple[str, str, str]:
    """Returns (WITH-clause body, final-assignment rel, final-centroid
    rel): the unrolled Lloyd's iterations as CTEs — init from the first
    k vec_ids, argmin via a row_number over the cross join (ties →
    lowest cell), update via exact floor-divided integer means."""
    xs = ", ".join(f"x{i}" for i in range(dim))
    ctes = [
        f"km_scaled AS MATERIALIZED (SELECT vec_id, {_scaled_cols_sql('embedding', dim)} "
        f"FROM ({embeddings_rel}))",
        f"km_c0 AS (SELECT vec_id AS cell, {xs} FROM km_scaled WHERE vec_id < {k})",
    ]
    for it in range(iters):
        c = f"km_c{it}"
        a = f"km_a{it}"
        ctes.append(
            f"{a} AS (SELECT vec_id, {xs}, cell FROM ("
            f"SELECT s.vec_id, {', '.join(f's.x{i}' for i in range(dim))}, c.cell, "
            f"row_number() OVER (PARTITION BY s.vec_id "
            f"ORDER BY {_dist_sql('s', 'c', dim)} ASC, c.cell ASC) AS _r "
            f"FROM km_scaled s CROSS JOIN {c} c) WHERE _r = 1)"
        )
        if it < iters - 1:
            upd = ", ".join(
                _fdiv_sql(f"sum(x{i})", "count(*)") + f" AS x{i}" for i in range(dim)
            )
            ctes.append(
                f"km_c{it + 1} AS (SELECT cell, {upd} FROM {a} GROUP BY cell)"
            )
    return ",\n".join(ctes), f"km_a{iters - 1}", f"km_c{iters - 1}"


def kmeans_stats_sql(
    embeddings_rel: str = "embeddings",
    k: int = KM_K,
    iters: int = KM_ITERS,
    dim: int = DIM,
) -> str:
    chain, a_rel, c_rel = kmeans_chain_sql(embeddings_rel, k, iters, dim)
    return f"""
    WITH {chain}
    SELECT a.cell, a.n_members,
           c.x0 AS c0, c.x1 AS c1, c.x2 AS c2, c.x3 AS c3
    FROM (SELECT cell, count(*) AS n_members FROM {a_rel} GROUP BY cell) a
    JOIN {c_rel} c USING (cell)
    """


def semdedup_sql(
    embeddings_rel: str = "embeddings",
    k: int = KM_K,
    iters: int = KM_ITERS,
    tau: float = SEMDEDUP_COS,
    dim: int = DIM,
    window: int = SEMDEDUP_WINDOW,
) -> str:
    """Twin of the bounded-window `semdedup_drops`: identical integer
    centroid-distance ranking (ties → vec_id) and the same
    rank-difference-≤-window comparison set; the relational form states
    the window as `y.rnk − x.rnk BETWEEN 1 AND window` (the oracle runs
    at test scale, so the join-then-filter plan is fine here — the Spark
    side is the bounded explode+equi-join)."""
    chain, a_rel, c_rel = kmeans_chain_sql(embeddings_rel, k, iters, dim)
    return f"""
    WITH {chain},
    sd_ranked AS MATERIALIZED (
      SELECT a.vec_id, a.cell,
             row_number() OVER (
               PARTITION BY a.cell
               ORDER BY {_dist_sql('a', 'c', dim)} ASC, a.vec_id ASC
             ) AS rnk,
             e.embedding AS emb,
             {norm_sql('e.embedding', dim)} AS nrm
      FROM {a_rel} a
      JOIN {c_rel} c USING (cell)
      JOIN ({embeddings_rel}) e USING (vec_id)
    ),
    sd_dropped AS (
      SELECT DISTINCT b_id AS vec_id FROM (
        SELECT y.vec_id AS b_id,
               round({dot_sql('x.emb', 'y.emb', dim)} / (x.nrm * y.nrm), 6) AS cos
        FROM sd_ranked x JOIN sd_ranked y
          ON x.cell = y.cell AND y.rnk - x.rnk BETWEEN 1 AND {window}
      ) WHERE cos >= {tau!r}
    )
    SELECT m.vec_id, m.cell,
           CASE WHEN d.vec_id IS NULL THEN 0 ELSE 1 END AS is_dup
    FROM sd_ranked m LEFT JOIN sd_dropped d ON m.vec_id = d.vec_id
    """
