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
