"""Document-level text analysis queries (training-data quality layer).

Thin operator layer binding functions/textstats.py to the `documents`
table: language-ID, quality features + score, token counts. Everything is
a narrow projection over the scan — no shuffle at all, so at 100 TB these
run at I/O speed with full column pruning (only `doc_id`, `text` read).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import normalize as N
from ..functions import textstats as TS
from ..functions import tokenize as Tk


def doc_text_stats(documents: DataFrame) -> DataFrame:
    """(doc_id, lang_id, n_chars, n_tokens, mean_token_len, stopword_ratio,
    punct_ratio, alpha_ratio, uniq_token_ratio, ws_tokens, bpe_tokens,
    quality): the full per-document quality record."""
    base = documents.select(
        "doc_id",
        F.col("text"),
        N.normalize_text_col(F.col("text")).alias("norm_text"),
    ).withColumn("tokens", Tk.tokens_col(F.col("norm_text")))
    feats = TS.quality_features_col(F.col("text"), F.col("tokens"))
    out = base.select(
        "doc_id",
        TS.lang_id_col(F.col("tokens")).alias("lang_id"),
        *[c.alias(name) for name, c in feats.items()],
        TS.whitespace_token_count_col(F.col("text")).alias("ws_tokens"),
        Tk.regex_token_count_col(F.col("text")).alias("bpe_tokens"),
        TS.quality_score_col(feats).alias("quality"),
    )
    return out


def doc_text_stats_sql(documents_rel: str = "documents") -> str:
    norm = N.normalize_text_sql("text")
    toks = Tk.tokens_sql(norm)
    base = (
        f"SELECT doc_id, text, {norm} AS norm_text, {toks} AS tokens "
        f"FROM ({documents_rel})"
    )
    f = TS.quality_features_sql("text", "tokens")
    feat_cols = ", ".join(f"{expr} AS {name}" for name, expr in f.items())
    return f"""
    SELECT doc_id,
           {TS.lang_id_sql('tokens')} AS lang_id,
           {feat_cols},
           {TS.whitespace_token_count_sql('text')} AS ws_tokens,
           {Tk.regex_token_count_sql('text')} AS bpe_tokens,
           {TS.quality_score_sql(f)} AS quality
    FROM ({base})
    """


def repetition_stats(
    records: DataFrame, ns: tuple[int, ...] = (2, 3)
) -> DataFrame:
    """(doc_id, n_grams_{n}, dup_ratio_{n}, top_share_{n} for each n):
    Gopher-style within-document repetition metrics (Rae et al. 2021,
    "Scaling Language Models", table A1) — the boilerplate signals a
    pretraining curation pass thresholds on:

      dup_ratio_n  = fraction of word n-grams that are repeats of an
                     earlier occurrence (1 - distinct/total),
      top_share_n  = share of the single most frequent n-gram.

    Input is `dedup.doc_records` output (doc_id, tokens). Scale shape per
    n: explode → groupBy(doc_id, gram) → groupBy(doc_id); both aggregates
    partial-combine map-side, and the second one's input is already one
    row per distinct (doc, gram). Docs with fewer than n tokens carry
    zero ratios (left join back to the doc spine). Ratios are single
    exact-integer divisions rounded to 6 — deterministic across engines.
    """
    spine = records.select("doc_id")
    out = spine
    for n in ns:
        grams = records.select(
            "doc_id", F.explode(Tk.word_ngrams_col(F.col("tokens"), n)).alias("gram")
        )
        per = grams.groupBy("doc_id", "gram").agg(F.count(F.lit(1)).alias("c"))
        stats = per.groupBy("doc_id").agg(
            F.sum("c").alias("total"),
            F.count(F.lit(1)).alias("uniq"),
            F.max("c").alias("maxc"),
        )
        out = out.join(stats, "doc_id", "left").select(
            *[F.col(c) for c in out.columns],
            F.coalesce(F.col("total"), F.lit(0)).alias(f"n_grams_{n}"),
            F.round(
                F.coalesce(
                    (F.col("total") - F.col("uniq")) / F.col("total"), F.lit(0.0)
                ),
                6,
            ).alias(f"dup_ratio_{n}"),
            F.round(
                F.coalesce(F.col("maxc") / F.col("total"), F.lit(0.0)), 6
            ).alias(f"top_share_{n}"),
        )
    return out


def repetition_stats_sql(records_rel: str, ns: tuple[int, ...] = (2, 3)) -> str:
    """Inline-subquery form (no top-level WITH) so callers can prefix
    their own CTE chain."""
    subs = []
    for n in ns:
        grams = (
            f"SELECT doc_id, unnest({Tk.word_ngrams_sql('tokens', n)}) AS gram "
            f"FROM ({records_rel})"
        )
        subs.append(
            f"""(
              SELECT doc_id, CAST(sum(c) AS BIGINT) AS total,
                     CAST(count(*) AS BIGINT) AS uniq,
                     CAST(max(c) AS BIGINT) AS maxc
              FROM (SELECT doc_id, gram, CAST(count(*) AS BIGINT) AS c
                    FROM ({grams}) GROUP BY doc_id, gram)
              GROUP BY doc_id
            ) s{n}"""
        )
    sel = ", ".join(
        f"coalesce(s{n}.total, 0) AS n_grams_{n}, "
        f"round(coalesce((s{n}.total - s{n}.uniq) / CAST(s{n}.total AS DOUBLE), 0.0), 6) AS dup_ratio_{n}, "
        f"round(coalesce(s{n}.maxc / CAST(s{n}.total AS DOUBLE), 0.0), 6) AS top_share_{n}"
        for n in ns
    )
    joins = " ".join(
        f"LEFT JOIN {sub} ON spine.doc_id = s{n}.doc_id"
        for n, sub in zip(ns, subs)
    )
    return f"""
    SELECT spine.doc_id, {sel}
    FROM (SELECT doc_id FROM ({records_rel})) spine {joins}
    """


def quality_filter(documents: DataFrame, min_quality: float = 0.5) -> DataFrame:
    """The filter a pretraining pipeline actually applies: keep documents
    whose quality score clears the bar. Composes with the dedup operators
    downstream; predicate is pushed into the scan projection."""
    stats = doc_text_stats(documents)
    return stats.filter(F.col("quality") >= min_quality).select(
        "doc_id", "lang_id", "quality"
    )


def quality_filter_sql(documents_rel: str = "documents", min_quality: float = 0.5) -> str:
    return (
        f"SELECT doc_id, lang_id, quality FROM ({doc_text_stats_sql(documents_rel)}) "
        f"WHERE quality >= {min_quality!r}"
    )


# ---------------------------------------------------------------------------
# unigram-LM document scoring
# ---------------------------------------------------------------------------

UNIGRAM_BUCKETS = 64


def unigram_vocab(records: DataFrame, top_v: int, n_buckets: int = UNIGRAM_BUCKETS) -> DataFrame:
    """(token, tok_count): the exact top-`top_v` corpus tokens by
    (count desc, token asc).

    Two-phase exact top-V so no task ever sorts the whole vocabulary
    (distinct tokens run to 10^8+ at web scale, and a single global
    `row_number()` window is the 1-reducer pathology): per-hash-bucket
    top-V windows over the partial-agg'd counts, then one bounded window
    over the <= n_buckets x top_v survivors. The bucket hash only shapes
    the plan — the selected set is the same for any bucketing, which is
    why the DuckDB twin can use a plain ORDER BY ... LIMIT.
    """
    from pyspark.sql import Window

    counts = (
        records.select(F.explode("tokens").alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("tok_count"))
    )
    local = Window.partitionBy("_b").orderBy(F.desc("tok_count"), "token")
    cand = (
        counts.withColumn("_b", F.pmod(F.hash("token"), F.lit(n_buckets)))
        .withColumn("_rn", F.row_number().over(local))
        .filter(F.col("_rn") <= top_v)
    )
    final = Window.orderBy(F.desc("tok_count"), "token")
    return (
        cand.withColumn("_rn2", F.row_number().over(final))
        .filter(F.col("_rn2") <= top_v)
        .select("token", "tok_count")
    )


def unigram_logprob(records: DataFrame, top_v: int = 4096) -> DataFrame:
    """(doc_id, n_tokens, avg_logprob, oov_ratio): every document scored
    under the corpus unigram language model — the CCNet-style LM quality
    signal (docs whose tokens are improbable under the corpus distribution
    are boilerplate/noise candidates), kept SQL-exact by using a unigram
    model instead of an external LM.

    In-vocabulary tokens score ln(count/N) with N the TOTAL corpus token
    count (including out-of-vocabulary mass, so probabilities are honest);
    tokens outside the top-`top_v` vocabulary score the floor ln(1/N).
    Documents with zero tokens contribute no rows.

    100 TB shape: the vocabulary (top_v rows) and the one-row total are
    both BROADCAST, so the exploded corpus crosses exactly one exchange —
    the final groupBy(doc_id). avg() is an order-dependent double sum,
    rounded to 6dp like the rest of the float surface (risk documented in
    `tfidf.py`).
    """
    toks = records.select("doc_id", F.explode("tokens").alias("token"))
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("tok_count"))
    totals = counts.agg(F.sum("tok_count").alias("n_total"))
    vocab_lp = (
        unigram_vocab(records, top_v)
        .crossJoin(F.broadcast(totals))
        .select(
            "token",
            F.log(F.col("tok_count") / F.col("n_total")).alias("lp"),
        )
    )
    scored = (
        toks.join(F.broadcast(vocab_lp), "token", "left")
        .crossJoin(
            F.broadcast(
                totals.select(F.log(F.lit(1.0) / F.col("n_total")).alias("unk_lp"))
            )
        )
        .select(
            "doc_id",
            F.coalesce(F.col("lp"), F.col("unk_lp")).alias("lp"),
            F.col("lp").isNull().cast("double").alias("oov"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.avg("lp"), 6).alias("avg_logprob"),
        F.round(F.avg("oov"), 6).alias("oov_ratio"),
    )


def unigram_logprob_sql(records_rel: str, top_v: int = 4096) -> str:
    return f"""
    WITH toks AS (SELECT doc_id, unnest(tokens) AS token FROM ({records_rel})),
    counts AS (SELECT token, CAST(count(*) AS BIGINT) AS tok_count
               FROM toks GROUP BY token),
    tot AS (SELECT CAST(sum(tok_count) AS BIGINT) AS n_total FROM counts),
    vocab AS (SELECT token, ln(tok_count / n_total) AS lp
              FROM counts, tot
              ORDER BY tok_count DESC, token LIMIT {top_v})
    SELECT t.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           round(avg(coalesce(v.lp, (SELECT ln(1.0 / n_total) FROM tot))), 6)
             AS avg_logprob,
           round(avg(CASE WHEN v.lp IS NULL THEN 1.0 ELSE 0.0 END), 6)
             AS oov_ratio
    FROM toks t LEFT JOIN vocab v USING (token)
    GROUP BY t.doc_id
    """
