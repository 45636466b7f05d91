"""Embedding similarity search + embedding-cosine near-dedup.

Approximate-nearest-neighbor over the `embeddings` table
(vec_id, embedding float[64], label):

  * brute-force cosine top-k — the exactness baseline; O(|Q|·N) with the
    query side broadcast, so the corpus is scanned once with no shuffle.
  * random-hyperplane LSH (Charikar 2002 SimHash for angles) — the scale
    path: sign-bit signatures → banded buckets → block-local candidate
    join → exact cosine re-rank of candidates only.
  * embedding near-dup pairs — the dedup family's cosine variant: corpus
    self-join restricted to shared LSH buckets, keep cosine ≥ threshold.

Float-parity discipline (the driver value-hashes results against DuckDB):
every dot product / norm is an explicit left-to-right sum over
double-cast elements, so Spark and DuckDB execute the identical IEEE-754
operation sequence; only the final cosine is rounded (6 dp) for output.

Reference analog: the TF-IDF cosine local-compatibility scorer
(`/root/reference/src/md/MentionDetection.java:264-288`) — same math,
dense instead of sparse, batched instead of per-seek.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from . import pairs as P

DIM = 64
N_PLANES = 16
PLANE_BANDS = 4  # 4 bands × 4 bits
# near-dup cosine threshold. Real embedding dedup runs ~0.95; the synthetic
# testdata embeddings are near-orthogonal (max pairwise cos ≈ 0.48), so the
# default is set where the operator has work to do. Callers pass their own.
NEARDUP_COS = 0.35


# ---------------------------------------------------------------------------
# deterministic dot / norm expression builders (Spark + DuckDB twins)
# ---------------------------------------------------------------------------


def dot_col(a: Column, b: Column, dim: int = DIM) -> Column:
    """Left-to-right Σ a[i]·b[i] over double-cast elements. zip_with +
    aggregate is a strict left fold, so the IEEE-754 operation sequence is
    identical to the oracle's explicit `0.0 + t1 + t2 + …` chain — and it
    stays inside whole-stage codegen (an unrolled 64-term expression tree
    blows the JVM's 64KB method limit and falls back to interpreted)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, t: acc + t)


def dot_sql(a: str, b: str, dim: int = DIM) -> str:
    terms = " + ".join(
        f"CAST({a}[{i}] AS DOUBLE) * CAST({b}[{i}] AS DOUBLE)" for i in range(1, dim + 1)
    )
    return f"(0.0 + {terms})"


def norm_col(a: Column, dim: int = DIM) -> Column:
    return F.sqrt(dot_col(a, a, dim))


def norm_sql(a: str, dim: int = DIM) -> str:
    return f"sqrt({dot_sql(a, a, dim)})"


def plane_constants(
    n_planes: int = N_PLANES, dim: int = DIM, seed: int = 42
) -> list[list[float]]:
    """Seeded random hyperplanes; literals embedded identically in both
    engines (Python float repr round-trips exactly)."""
    rng = random.Random(seed)
    return [[rng.uniform(-1.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]


def _plane_dot_col(emb: Column, plane: list[float]) -> Column:
    # one array literal, not CreateArray of 64 lit nodes (the latter is
    # rebuilt per row per plane — same fix as embedcluster/dsir)
    plane_arr = F.lit([float(w) for w in plane])
    prods = F.zip_with(emb, plane_arr, lambda x, w: x.cast("double") * w)
    return F.aggregate(prods, F.lit(0.0), lambda acc, t: acc + t)


def _plane_dot_sql(emb: str, plane: list[float]) -> str:
    terms = " + ".join(
        f"CAST({emb}[{i}] AS DOUBLE) * {w!r}" for i, w in enumerate(plane, start=1)
    )
    return f"(0.0 + {terms})"


# ---------------------------------------------------------------------------
# hyperplane signatures + buckets
# ---------------------------------------------------------------------------


def hyperplane_signatures(
    embeddings: DataFrame,
    n_planes: int = N_PLANES,
    dim: int = DIM,
    seed: int = 42,
) -> DataFrame:
    """(vec_id, sig): sign-bit signature, bit i = 1 iff emb·plane_i >= 0.
    Narrow map-only projection — no shuffle; at 100 TB this is the cheap
    pass that makes the O(N²) search linear."""
    planes = plane_constants(n_planes, dim, seed)
    sig = None
    for i, p in enumerate(planes):
        bit = F.when(_plane_dot_col(F.col("embedding"), p) >= 0, F.lit(1)).otherwise(
            F.lit(0)
        ).cast("long")
        term = bit * F.lit(1 << i)
        sig = term if sig is None else sig + term
    return embeddings.select("vec_id", sig.alias("sig"))


def hyperplane_signatures_sql(
    embeddings_rel: str = "embeddings",
    n_planes: int = N_PLANES,
    dim: int = DIM,
    seed: int = 42,
) -> str:
    planes = plane_constants(n_planes, dim, seed)
    terms = " + ".join(
        f"(CASE WHEN {_plane_dot_sql('embedding', p)} >= 0 THEN 1 ELSE 0 END)::BIGINT * {1 << i}"
        for i, p in enumerate(planes)
    )
    return f"SELECT vec_id, {terms} AS sig FROM ({embeddings_rel})"


def _sig_buckets(signatures: DataFrame, n_planes: int, bands: int) -> DataFrame:
    """(rec_key, block_key): one bucket per signature band."""
    w = n_planes // bands
    mask = (1 << w) - 1
    band_cols = [
        F.concat(
            F.lit(f"hp{j}:"),
            F.shiftright(F.col("sig"), j * w).bitwiseAND(F.lit(mask)).cast("string"),
        )
        for j in range(bands)
    ]
    return signatures.select(
        F.lpad(F.col("vec_id").cast("string"), 12, "0").alias("rec_key"),
        F.explode(F.array(*band_cols)).alias("block_key"),
    )


def _sig_buckets_sql(signatures_rel: str, n_planes: int, bands: int) -> str:
    w = n_planes // bands
    mask = (1 << w) - 1
    band_exprs = ", ".join(
        f"'hp{j}:' || CAST((sig >> {j * w}) & {mask} AS VARCHAR)" for j in range(bands)
    )
    return f"""
    SELECT lpad(CAST(vec_id AS VARCHAR), 12, '0') AS rec_key,
           unnest([{band_exprs}]) AS block_key
    FROM ({signatures_rel})
    """


# ---------------------------------------------------------------------------
# brute-force cosine top-k (baseline)
# ---------------------------------------------------------------------------


def ann_bruteforce_topk(
    embeddings: DataFrame,
    n_queries: int = 8,
    k: int = 5,
    dim: int = DIM,
) -> DataFrame:
    """(q_id, vec_id, cos, rank): exact top-k by cosine for the first
    `n_queries` vectors (vec_id < n_queries) against the whole corpus.
    The query side is broadcast — corpus scanned once, zero shuffle before
    the final per-query top-k window."""
    corpus = embeddings.select(
        "vec_id",
        F.col("embedding").alias("emb"),
        norm_col(F.col("embedding"), dim).alias("nrm"),
    )
    queries = corpus.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"),
        F.col("emb").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    scored = corpus.join(F.broadcast(queries), F.col("vec_id") != F.col("q_id")).select(
        "q_id",
        "vec_id",
        F.round(
            dot_col(F.col("emb"), F.col("q_emb"), dim)
            / (F.col("nrm") * F.col("q_nrm")),
            6,
        ).alias("cos"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "vec_id", "cos", "rank")
    )


def ann_bruteforce_topk_sql(
    embeddings_rel: str = "embeddings",
    n_queries: int = 8,
    k: int = 5,
    dim: int = DIM,
) -> str:
    corpus = (
        f"SELECT vec_id, embedding AS emb, {norm_sql('embedding', dim)} AS nrm "
        f"FROM ({embeddings_rel})"
    )
    return f"""
    SELECT q_id, vec_id, cos, rank FROM (
      SELECT q_id, vec_id, cos,
             row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rank
      FROM (
        SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
               round({dot_sql('c.emb', 'q.emb', dim)} / (c.nrm * q.nrm), 6) AS cos
        FROM ({corpus}) c
        JOIN ({corpus}) q ON c.vec_id <> q.vec_id AND q.vec_id < {n_queries}
      )
    ) WHERE rank <= {k}
    """


# ---------------------------------------------------------------------------
# LSH-bucketed top-k (scale path)
# ---------------------------------------------------------------------------


def ann_lsh_topk(
    embeddings: DataFrame,
    n_queries: int = 8,
    k: int = 5,
    n_planes: int = N_PLANES,
    bands: int = PLANE_BANDS,
    dim: int = DIM,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: candidates = corpus vectors sharing ≥1 signature
    band with the query; exact cosine re-rank of candidates only. Same
    output shape as the brute-force baseline so recall is directly
    measurable."""
    sigs = hyperplane_signatures(embeddings, n_planes, dim, seed)
    buckets = _sig_buckets(sigs, n_planes, bands)
    corpus = embeddings.select(
        F.lpad(F.col("vec_id").cast("string"), 12, "0").alias("rec_key"),
        "vec_id",
        F.col("embedding").alias("emb"),
        norm_col(F.col("embedding"), dim).alias("nrm"),
    )
    qbuckets = buckets.join(
        corpus.filter(F.col("vec_id") < n_queries).select("rec_key"), "rec_key"
    ).select(F.col("rec_key").alias("q_key"), "block_key")
    cand = (
        buckets.join(qbuckets, "block_key")
        .filter(F.col("rec_key") != F.col("q_key"))
        .select("q_key", "rec_key")
        .distinct()
    )
    q = corpus.select(
        F.col("rec_key").alias("q_key"),
        F.col("vec_id").alias("q_id"),
        F.col("emb").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    scored = (
        cand.join(corpus, "rec_key")
        .join(F.broadcast(q), "q_key")
        .select(
            "q_id",
            "vec_id",
            F.round(
                dot_col(F.col("emb"), F.col("q_emb"), dim)
                / (F.col("nrm") * F.col("q_nrm")),
                6,
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "vec_id", "cos", "rank")
    )


def ann_lsh_topk_sql(
    embeddings_rel: str = "embeddings",
    n_queries: int = 8,
    k: int = 5,
    n_planes: int = N_PLANES,
    bands: int = PLANE_BANDS,
    dim: int = DIM,
    seed: int = 42,
) -> str:
    sigs = hyperplane_signatures_sql(embeddings_rel, n_planes, dim, seed)
    buckets = _sig_buckets_sql(sigs, n_planes, bands)
    corpus = (
        f"SELECT lpad(CAST(vec_id AS VARCHAR), 12, '0') AS rec_key, vec_id, "
        f"embedding AS emb, {norm_sql('embedding', dim)} AS nrm FROM ({embeddings_rel})"
    )
    return f"""
    SELECT q_id, vec_id, cos, rank FROM (
      SELECT q_id, vec_id, cos,
             row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rank
      FROM (
        SELECT q.vec_id AS q_id, c.vec_id AS vec_id,
               round({dot_sql('c.emb', 'q.emb', dim)} / (c.nrm * q.nrm), 6) AS cos
        FROM (
          SELECT DISTINCT qb.q_key, b.rec_key
          FROM ({buckets}) b
          JOIN (
            SELECT cc.rec_key AS q_key, bb.block_key
            FROM ({buckets}) bb
            JOIN ({corpus}) cc ON bb.rec_key = cc.rec_key
            WHERE cc.vec_id < {n_queries}
          ) qb ON b.block_key = qb.block_key
          WHERE b.rec_key <> qb.q_key
        ) cand
        JOIN ({corpus}) c ON cand.rec_key = c.rec_key
        JOIN ({corpus}) q ON cand.q_key = q.rec_key
      )
    ) WHERE rank <= {k}
    """


# ---------------------------------------------------------------------------
# embedding-cosine near-dup pairs (dedup family)
# ---------------------------------------------------------------------------


def embedding_neardup_pairs(
    embeddings: DataFrame,
    threshold: float = NEARDUP_COS,
    n_planes: int = N_PLANES,
    bands: int = PLANE_BANDS,
    dim: int = DIM,
    seed: int = 42,
    block_cap: int = 256,
) -> DataFrame:
    """(a_id, b_id, cos): corpus self-join restricted to shared LSH
    buckets (with the standard block cap as skew guard), keeping pairs
    with cosine ≥ threshold."""
    sigs = hyperplane_signatures(embeddings, n_planes, dim, seed)
    buckets = _sig_buckets(sigs, n_planes, bands)
    cand = P.block_pairs(buckets, block_cap)
    corpus = embeddings.select(
        F.lpad(F.col("vec_id").cast("string"), 12, "0").alias("rec_key"),
        F.col("vec_id"),
        F.col("embedding").alias("emb"),
        norm_col(F.col("embedding"), dim).alias("nrm"),
    )
    a = corpus.select(
        F.col("rec_key").alias("a_key"),
        F.col("vec_id").alias("a_id"),
        F.col("emb").alias("a_emb"),
        F.col("nrm").alias("a_nrm"),
    )
    b = corpus.select(
        F.col("rec_key").alias("b_key"),
        F.col("vec_id").alias("b_id"),
        F.col("emb").alias("b_emb"),
        F.col("nrm").alias("b_nrm"),
    )
    return (
        cand.join(a, "a_key")
        .join(b, "b_key")
        .select(
            "a_id",
            "b_id",
            F.round(
                dot_col(F.col("a_emb"), F.col("b_emb"), dim)
                / (F.col("a_nrm") * F.col("b_nrm")),
                6,
            ).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )


def embedding_neardup_pairs_sql(
    embeddings_rel: str = "embeddings",
    threshold: float = NEARDUP_COS,
    n_planes: int = N_PLANES,
    bands: int = PLANE_BANDS,
    dim: int = DIM,
    seed: int = 42,
    block_cap: int = 256,
) -> str:
    sigs = hyperplane_signatures_sql(embeddings_rel, n_planes, dim, seed)
    buckets = _sig_buckets_sql(sigs, n_planes, bands)
    cand = P.block_pairs_sql(buckets, block_cap)
    corpus = (
        f"SELECT lpad(CAST(vec_id AS VARCHAR), 12, '0') AS rec_key, vec_id, "
        f"embedding AS emb, {norm_sql('embedding', dim)} AS nrm FROM ({embeddings_rel})"
    )
    return f"""
    SELECT a_id, b_id, cos FROM (
      SELECT a.vec_id AS a_id, b.vec_id AS b_id,
             round({dot_sql('a.emb', 'b.emb', dim)} / (a.nrm * b.nrm), 6) AS cos
      FROM ({cand}) c
      JOIN ({corpus}) a ON c.a_key = a.rec_key
      JOIN ({corpus}) b ON c.b_key = b.rec_key
    ) WHERE cos >= {threshold!r}
    """


# ---------------------------------------------------------------------------
# IVF-bucketed top-k (coarse-quantizer scale path)
# ---------------------------------------------------------------------------

IVF_CELLS = 16
IVF_NPROBE = 4


def ann_ivf_topk(
    embeddings: DataFrame,
    n_queries: int = 8,
    k: int = 5,
    n_cells: int = IVF_CELLS,
    nprobe: int = IVF_NPROBE,
    dim: int = DIM,
) -> DataFrame:
    """(q_id, vec_id, cos, rank): IVF-style ANN — the inverted-file
    coarse-quantizer pattern (Jégou et al. 2011, public): assign every
    corpus vector to its nearest of `n_cells` centroids (build phase, one
    corpus scan against broadcast centroids), then search only the
    `nprobe` closest cells per query and exact-re-rank the candidates.

    Cost: O(N·C) build + O(|Q|·C + |Q|·N·nprobe/C) search versus the
    brute-force O(|Q|·N) — the standard recall/throughput dial. The
    quantizer here is deterministic (centroids = the first `n_cells`
    corpus vectors) so the DuckDB oracle replays it exactly; a production
    deployment plugs k-means centroids into the same assignment join."""
    corpus = embeddings.select(
        "vec_id",
        F.col("embedding").alias("emb"),
        norm_col(F.col("embedding"), dim).alias("nrm"),
    )
    cents = corpus.filter(F.col("vec_id") < n_cells).select(
        F.col("vec_id").alias("cell"),
        F.col("emb").alias("c_emb"),
        F.col("nrm").alias("c_nrm"),
    )
    sim_to_cell = F.round(
        dot_col(F.col("emb"), F.col("c_emb"), dim) / (F.col("nrm") * F.col("c_nrm")),
        6,
    )
    wassign = Window.partitionBy("vec_id").orderBy(F.desc("csim"), F.asc("cell"))
    assigned = (
        corpus.crossJoin(F.broadcast(cents))
        .select("vec_id", "emb", "nrm", "cell", sim_to_cell.alias("csim"))
        .withColumn("_r", F.row_number().over(wassign))
        .filter(F.col("_r") == 1)
        .select("vec_id", "emb", "nrm", "cell")
    )
    queries = corpus.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"),
        F.col("emb").alias("q_emb"),
        F.col("nrm").alias("q_nrm"),
    )
    q_sim = F.round(
        dot_col(F.col("q_emb"), F.col("c_emb"), dim) / (F.col("q_nrm") * F.col("c_nrm")),
        6,
    )
    wprobe = Window.partitionBy("q_id").orderBy(F.desc("qsim"), F.asc("cell"))
    probes = (
        queries.crossJoin(F.broadcast(cents))
        .select("q_id", "q_emb", "q_nrm", "cell", q_sim.alias("qsim"))
        .withColumn("_r", F.row_number().over(wprobe))
        .filter(F.col("_r") <= nprobe)
        .select("q_id", "q_emb", "q_nrm", "cell")
    )
    scored = (
        assigned.join(F.broadcast(probes), "cell")
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "vec_id",
            F.round(
                dot_col(F.col("emb"), F.col("q_emb"), dim)
                / (F.col("nrm") * F.col("q_nrm")),
                6,
            ).alias("cos"),
        )
        .distinct()
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "vec_id", "cos", "rank")
    )


def ann_ivf_topk_sql(
    embeddings_rel: str = "embeddings",
    n_queries: int = 8,
    k: int = 5,
    n_cells: int = IVF_CELLS,
    nprobe: int = IVF_NPROBE,
    dim: int = DIM,
) -> str:
    corpus = (
        f"SELECT vec_id, embedding AS emb, {norm_sql('embedding', dim)} AS nrm "
        f"FROM ({embeddings_rel})"
    )
    return f"""
    WITH ivf_corpus AS MATERIALIZED ({corpus}),
    ivf_cents AS (
      SELECT vec_id AS cell, emb AS c_emb, nrm AS c_nrm
      FROM ivf_corpus WHERE vec_id < {n_cells}
    ),
    ivf_assigned AS (
      SELECT vec_id, emb, nrm, cell FROM (
        SELECT c.vec_id, c.emb, c.nrm, ct.cell,
               row_number() OVER (PARTITION BY c.vec_id ORDER BY
                 round({dot_sql('c.emb', 'ct.c_emb', dim)} / (c.nrm * ct.c_nrm), 6) DESC,
                 ct.cell ASC) AS _r
        FROM ivf_corpus c CROSS JOIN ivf_cents ct
      ) WHERE _r = 1
    ),
    ivf_probes AS (
      SELECT q_id, q_emb, q_nrm, cell FROM (
        SELECT q.vec_id AS q_id, q.emb AS q_emb, q.nrm AS q_nrm, ct.cell,
               row_number() OVER (PARTITION BY q.vec_id ORDER BY
                 round({dot_sql('q.emb', 'ct.c_emb', dim)} / (q.nrm * ct.c_nrm), 6) DESC,
                 ct.cell ASC) AS _r
        FROM ivf_corpus q CROSS JOIN ivf_cents ct
        WHERE q.vec_id < {n_queries}
      ) WHERE _r <= {nprobe}
    )
    SELECT q_id, vec_id, cos, rank FROM (
      SELECT q_id, vec_id, cos,
             row_number() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id ASC) AS rank
      FROM (
        SELECT DISTINCT p.q_id, a.vec_id,
               round({dot_sql('a.emb', 'p.q_emb', dim)} / (a.nrm * p.q_nrm), 6) AS cos
        FROM ivf_assigned a JOIN ivf_probes p USING (cell)
        WHERE a.vec_id <> p.q_id
      )
    ) WHERE rank <= {k}
    """
