"""DSIR — data selection via importance resampling (Xie et al. 2023).

Scores every document by how much its hashed n-gram profile looks like a
TARGET subset (here: the English documents — the "high-quality corpus"
slot) versus the RAW corpus: the standard pretraining-data selection
signal. log-importance(doc) = Σ_features [ln p_target(b) − ln p_raw(b)]
over the doc's hashed feature buckets, with add-one smoothing.

100 TB shape — the corpus crosses ONE exchange total:

  * model build: explode features → groupBy(bucket) count, twice (raw +
    target). B buckets (512) means map-side partial aggregation reduces
    every partition to ≤B rows before the (only) shuffle; the grouped
    result is B rows, collected to the driver.
  * scoring: the per-bucket log-ratios are quantized to integer
    micronats and inlined as ONE literal array expression — the scoring
    pass is a pure per-row scan (element_at lookups + an integer left
    fold), zero joins, zero shuffles, whole-stage codegen. The same
    broadcast-as-literal trick as the Bloom filter words and the k-means
    centroids.

Exactness: scores are exact int64 sums of integer micronats — immune to
float-summation order. The only float step is the one-time model
quantization floor(1e6·ln(num/den)) where num/den are exact integer
products (< 2^53 here; promote to exact rationals beyond that): the
driver (CPython libm) and DuckDB (same libm) round ln identically, and
the floor makes a last-ulp disagreement matter only exactly at an
integer boundary.

Selection composes downstream: feed `dsir_score_micro` to
`sampling.stratified_cap` / threshold filters; the Gumbel-noise
resampling of the paper is a per-row expression away (hash60 as the
uniform source) and deliberately left to callers.

Reference analog: none (the reference predates LLM data curation); the
keyphraseness prior (`knowledgebase/KeyphrasenessIndexBuilder.java`) is
the closest corpus-statistic-as-score precedent.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import normalize as N
from ..functions import tokenize as Tk
from .sampling import hash60, hash60_sql

DSIR_BUCKETS = 512
DSIR_SEED = 77


# ---------------------------------------------------------------------------
# hashed features (unigrams + word bigrams)
# ---------------------------------------------------------------------------


def features_col(text: Column) -> Column:
    toks = Tk.tokens_col(N.normalize_text_col(text))
    return F.concat(toks, Tk.word_ngrams_col(toks, 2))


def features_sql(expr: str) -> str:
    norm = N.normalize_text_sql(expr)
    toks = Tk.tokens_sql(norm)
    return f"list_concat({toks}, {Tk.word_ngrams_sql(toks, 2)})"


def bucket_col(feat: Column, n_buckets: int = DSIR_BUCKETS, seed: int = DSIR_SEED,
               hash_mode: str = "portable") -> Column:
    return F.pmod(hash60(feat, seed, hash_mode), F.lit(n_buckets))


def bucket_sql(expr: str, n_buckets: int = DSIR_BUCKETS, seed: int = DSIR_SEED) -> str:
    return f"({hash60_sql(expr, seed)} % {n_buckets})"


# ---------------------------------------------------------------------------
# model build (driver-held, B integers)
# ---------------------------------------------------------------------------


def _bucket_counts(
    documents: DataFrame,
    n_buckets: int,
    seed: int,
    hash_mode: str,
) -> tuple[dict[int, int], int]:
    rows = (
        documents.select(
            F.explode(features_col(F.col("text"))).alias("feat")
        )
        .select(bucket_col(F.col("feat"), n_buckets, seed, hash_mode).alias("b"))
        .groupBy("b")
        .count()
        .collect()
    )
    counts = {int(r["b"]): int(r["count"]) for r in rows}
    return counts, sum(counts.values())


def _log_ratio_micro(ct: int, nt: int, cr: int, nr: int, n_buckets: int) -> int:
    """floor(1e6 · ln(p_target/p_raw)) with add-one smoothing, as the
    exact integer-product ratio — the identical operation sequence the
    oracle's `floor(ln(CAST(num AS DOUBLE)/den) * 1000000.0)` executes."""
    num = (ct + 1) * (nr + n_buckets)
    den = (cr + 1) * (nt + n_buckets)
    return math.floor(math.log(num / den) * 1_000_000.0)


def dsir_model(
    documents: DataFrame,
    target_pred: Column,
    n_buckets: int = DSIR_BUCKETS,
    seed: int = DSIR_SEED,
    hash_mode: str = "portable",
) -> list[int]:
    """Per-bucket integer micronat log-ratios (length n_buckets)."""
    raw, nr = _bucket_counts(documents, n_buckets, seed, hash_mode)
    tgt, nt = _bucket_counts(documents.filter(target_pred), n_buckets, seed, hash_mode)
    return [
        _log_ratio_micro(tgt.get(b, 0), nt, raw.get(b, 0), nr, n_buckets)
        for b in range(n_buckets)
    ]


# ---------------------------------------------------------------------------
# scoring (zero-shuffle scan)
# ---------------------------------------------------------------------------


def dsir_scores(
    documents: DataFrame,
    target_pred: Column | None = None,
    model: list[int] | None = None,
    n_buckets: int = DSIR_BUCKETS,
    seed: int = DSIR_SEED,
    hash_mode: str = "portable",
) -> DataFrame:
    """(doc_id, lang, n_feats, dsir_score_micro): exact integer
    log-importance in micronats. The model rides inside the expression
    tree as a literal array — scoring is one scan, no joins."""
    if model is None:
        if target_pred is None:
            target_pred = F.col("lang") == "en"
        model = dsir_model(documents, target_pred, n_buckets, seed, hash_mode)
    # ONE array literal (F.lit on the list), not CreateArray of 512 lit
    # nodes: the latter is re-materialized per evaluated element inside
    # the lambda (measured ~30µs/feature — 45s for a 1.5MB corpus); the
    # literal is a single constant the fold just indexes into.
    arr = F.lit([int(v) for v in model]).cast("array<bigint>")
    feats = features_col(F.col("text"))
    score = F.aggregate(
        F.transform(
            F.col("_feats"),
            lambda t: F.element_at(arr, (bucket_col(t, n_buckets, seed, hash_mode) + 1).cast("int")),
        ),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return documents.select(
        "doc_id", "lang", feats.alias("_feats")
    ).select(
        "doc_id",
        "lang",
        F.size("_feats").alias("n_feats"),
        score.alias("dsir_score_micro"),
    )


# ---------------------------------------------------------------------------
# DuckDB oracle twin (recomputes the model in SQL)
# ---------------------------------------------------------------------------


def dsir_scores_sql(
    documents_rel: str = "documents",
    target_where: str = "lang = 'en'",
    n_buckets: int = DSIR_BUCKETS,
    seed: int = DSIR_SEED,
) -> str:
    feats = features_sql("text")
    b = bucket_sql("feat", n_buckets, seed)
    return f"""
    WITH dsir_docs AS MATERIALIZED (
      SELECT doc_id, lang, {feats} AS feats FROM ({documents_rel})
    ),
    dsir_exploded AS MATERIALIZED (
      SELECT d.doc_id, d.lang, {b} AS b
      FROM dsir_docs d, unnest(d.feats) AS t(feat)
    ),
    dsir_raw AS (SELECT b, count(*) AS c FROM dsir_exploded GROUP BY b),
    dsir_tgt AS (SELECT b, count(*) AS c FROM dsir_exploded
                 WHERE {target_where} GROUP BY b),
    dsir_totals AS (
      SELECT (SELECT coalesce(sum(c), 0) FROM dsir_raw) AS nr,
             (SELECT coalesce(sum(c), 0) FROM dsir_tgt) AS nt
    ),
    dsir_model AS (
      SELECT s.b,
             CAST(floor(ln(
               CAST((coalesce(t.c, 0) + 1) * (tot.nr + {n_buckets}) AS DOUBLE)
               / CAST((coalesce(r.c, 0) + 1) * (tot.nt + {n_buckets}) AS DOUBLE)
             ) * 1000000.0) AS BIGINT) AS lr
      FROM (SELECT unnest(range({n_buckets})) AS b) s
      LEFT JOIN dsir_raw r ON s.b = r.b
      LEFT JOIN dsir_tgt t ON s.b = t.b
      CROSS JOIN dsir_totals tot
    )
    SELECT d.doc_id, any_value(d.lang) AS lang,
           CAST(any_value(len(d.feats)) AS INT) AS n_feats,
           CAST(coalesce(sum(m.lr), 0) AS BIGINT) AS dsir_score_micro
    FROM dsir_docs d
    LEFT JOIN dsir_exploded e ON d.doc_id = e.doc_id
    LEFT JOIN dsir_model m ON e.b = m.b
    GROUP BY d.doc_id
    """


# ---------------------------------------------------------------------------
# Gumbel top-k importance resampling
# ---------------------------------------------------------------------------

RESAMPLE_SEED = 101
RESAMPLE_K = 64


def dsir_resample(
    documents: DataFrame,
    k: int = RESAMPLE_K,
    target_pred: Column | None = None,
    model: list[int] | None = None,
    n_buckets: int = DSIR_BUCKETS,
    seed: int = DSIR_SEED,
    resample_seed: int = RESAMPLE_SEED,
    hash_mode: str = "portable",
) -> DataFrame:
    """(doc_id, lang, gumbel_key, rank): the DSIR paper's sampling step —
    k documents drawn WITHOUT replacement with probability ∝ exp(score)
    via the Gumbel-top-k trick (Kool et al. 2019, public): key_i =
    log-weight_i + Gumbel_i, take the k largest. The Gumbel noise is
    deterministic (hash60 of doc_id → uniform in (0,1] → -ln(-ln(u))),
    so the draw is reproducible under any partitioning and replayable by
    the oracle.

    Scale shape: scoring is the zero-shuffle scan above; the global
    top-k is a sort-limit (per-partition top-k, k rows to one reducer —
    never a full sort). Selection orders by the UNROUNDED key; only the
    output column is rounded."""
    scored = dsir_scores(
        documents, target_pred, model, n_buckets, seed, hash_mode
    )
    u = (hash60(F.col("doc_id"), resample_seed, hash_mode) + F.lit(1)) / F.lit(
        float(1 << 60)
    )
    key = F.col("dsir_score_micro") / F.lit(1_000_000.0) - F.log(-F.log(u))
    ranked = (
        scored.select("doc_id", "lang", key.alias("_key"))
        .orderBy(F.desc("_key"), F.asc("doc_id"))
        .limit(k)
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("_key"), F.asc("doc_id"))
    return ranked.select(
        "doc_id",
        "lang",
        F.round(F.col("_key"), 6).alias("gumbel_key"),
        F.row_number().over(w).alias("rank"),
    )


def dsir_resample_sql(
    documents_rel: str = "documents",
    k: int = RESAMPLE_K,
    target_where: str = "lang = 'en'",
    n_buckets: int = DSIR_BUCKETS,
    seed: int = DSIR_SEED,
    resample_seed: int = RESAMPLE_SEED,
) -> str:
    scores = dsir_scores_sql(documents_rel, target_where, n_buckets, seed)
    u = f"(({hash60_sql('doc_id', resample_seed)} + 1) / {float(1 << 60)!r})"
    key = f"(dsir_score_micro / 1000000.0 - ln(-ln({u})))"
    return f"""
    SELECT doc_id, lang, round(_key, 6) AS gumbel_key,
           CAST(row_number() OVER (ORDER BY _key DESC, doc_id ASC) AS INT) AS rank
    FROM (
      SELECT doc_id, lang, {key} AS _key
      FROM ({scores})
      ORDER BY _key DESC, doc_id ASC
      LIMIT {k}
    )
    """
